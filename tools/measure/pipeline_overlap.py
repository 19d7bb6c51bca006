"""Wall-clock benefit of the two-stage stream pipeline (VERDICT r2 #4).

Runs on the CPU backend: the XLA 'device' stage (own thread pool) and the
host codec stage genuinely overlap there. Compares compress_stream /
decompress_stream as shipped vs the same code with the worker pool forced
inline (a synchronous executor) — same work, no overlap.

On the TPU dev tunnel the h2d/d2h transfers dominate wall time in both
arrangements, so this CPU measurement is the demonstrable one; on
production-attached TPU hosts the overlap hides the host stage behind
device compute exactly as it does here.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))
import concurrent.futures
import io
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np

from dctz_tpu import stream
from dctz_tpu.config import CodecConfig


class _Inline:
    """Synchronous stand-in for ThreadPoolExecutor(1): no overlap."""

    def __init__(self, *_a, **_k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def submit(self, fn, *a, **k):
        f = concurrent.futures.Future()
        f.set_result(fn(*a, **k))
        return f


def main() -> None:
    n = 1 << 24  # 64 MB f32
    t = np.arange(n, dtype=np.float32)
    x = (np.sin(t * np.float32(0.001)) * 40 + np.sin(t * np.float32(0.137)) * 3
         + np.sin(t * np.float32(2.03)) * np.float32(0.3)).astype(np.float32)
    cfg = CodecConfig(mode="ec", error_bound=1e-3, container="v2",
                      ids_codec="rans", verify=False)
    seg = 1 << 21

    def run_compress():
        buf = io.BytesIO()
        stream.compress_stream(x, buf, config=cfg, segment_elems=seg)
        return buf.getvalue()

    blob = run_compress()  # warm compiles

    def timed(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    real_pool = concurrent.futures.ThreadPoolExecutor
    tc_pipe = timed(run_compress)
    td_pipe = timed(lambda: stream.decompress_stream_all(io.BytesIO(blob)))
    concurrent.futures.ThreadPoolExecutor = _Inline
    try:
        tc_seq = timed(run_compress)
        td_seq = timed(lambda: stream.decompress_stream_all(io.BytesIO(blob)))
    finally:
        concurrent.futures.ThreadPoolExecutor = real_pool
    print(f"compress  : pipelined {tc_pipe*1e3:7.1f} ms  sequential "
          f"{tc_seq*1e3:7.1f} ms  -> {tc_seq/tc_pipe:.2f}x")
    print(f"decompress: pipelined {td_pipe*1e3:7.1f} ms  sequential "
          f"{td_seq*1e3:7.1f} ms  -> {td_seq/td_pipe:.2f}x")


if __name__ == "__main__":
    main()
