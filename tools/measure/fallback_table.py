#!/usr/bin/env python
"""Measure what configs that fall OFF the fused TPU kernels actually cost
(docs/benchmarks.md fallback table; VERDICT round-3 #6). Each config runs
compress/decompress through the public API with a StageTimer; the reported
number is the non-transfer stage sum, best of 3. Every row carries the same
~25-30 ms tunnel round trip per synchronized stage, so the RELATIVE
fused-vs-fallback comparison is the signal.

Usage: python tools/measure/fallback_table.py [log2_n=24]
"""

import os
import pathlib
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"),
)

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import dctz_tpu  # noqa: E402
from dctz_tpu.config import CodecConfig  # noqa: E402
from dctz_tpu.utils.timing import StageTimer  # noqa: E402


def climate(n, dtype):
    t = np.arange(n, dtype=np.float32)
    x = (
        np.sin(t * np.float32(0.001)) * np.float32(40.0)
        + np.sin(t * np.float32(0.137)) * np.float32(3.0)
    )
    return x.astype(dtype)


def run(name, x, cfg, reps=3):
    import jax.numpy as jnp

    # pre-stage the input on device: the tunnel's ~0.02 GB/s h2d would
    # otherwise land inside the first timed device stage
    xd = jnp.asarray(x)
    float(xd.ravel()[0])
    best_c = best_d = float("inf")
    blob = None
    for _ in range(reps):
        ct = StageTimer(sync=True)
        blob = dctz_tpu.compress(xd, config=cfg, timer=ct)
        c = sum(v for k, v in ct.stages.items() if k != "transfer")
        dt = StageTimer(sync=True)
        y = dctz_tpu.decompress(blob, timer=dt)
        d = sum(v for k, v in dt.stages.items() if k != "transfer")
        best_c, best_d = min(best_c, c), min(best_d, d)
    tol = cfg.error_bound * (float(x.max()) - float(x.min())) * 1.01
    ok = bool(np.abs(y.astype(np.float64) - x.astype(np.float64)).max() <= tol)
    gb = x.nbytes / 1e9
    print(
        f"{name:38s} comp {best_c*1e3:7.1f} ms  dec {best_d*1e3:7.1f} ms  "
        f"ratio {x.nbytes/len(blob):5.2f}  bound_ok {ok}",
        flush=True,
    )


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 24)
    x32 = climate(n, np.float32)
    x64 = climate(n, np.float64)
    base = dict(mode="ec", error_bound=1e-3, verify=False, segment_elems=0)
    run("v2 f32 fused (reference point)", x32,
        CodecConfig(container="v2", **base))
    run("v1 f32 (fused front, v1 host zlib)", x32,
        CodecConfig(container="v1", **base))
    run("v2 f64 fast path (promoted f32)", x64,
        CodecConfig(container="v2", **base))
    run("v2 f64 full width (XLA chain, x64)", x64,
        CodecConfig(container="v2", internal_dtype="auto",
                    error_bound=1e-6, mode="ec", verify=False,
                    segment_elems=0))
    run("v2 f32 block_size=32 (XLA chain)", x32,
        CodecConfig(container="v2", block_size=32, **base))
    run("v2 f32 brsf=2 device-coded (fused)", x32,
        CodecConfig(container="v2", brsf=2.0, verify=True, mode="ec",
                    error_bound=1e-3, segment_elems=0))


if __name__ == "__main__":
    main()
