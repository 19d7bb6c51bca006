#!/usr/bin/env python
"""A/B the encode supertile factor (dpk_fuse.TPS) on the real chip.

Streams are bit-identical at every tps (tests/test_dpk_fuse.py); this
only moves wall time: fewer grid steps amortize the ~166 ns/step fixed
cost and interleave independent tiles' roll chains
(tools/measure/probe_primitives.py).

Usage: python tools/measure/ab_tps.py [log2_n=25]
"""

import os
import pathlib
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"),
)

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from dctz_tpu import api  # noqa: E402
from dctz_tpu.core.quantize import chunk_width  # noqa: E402
from dctz_tpu.ops import dpk_fuse, idpack  # noqa: E402
from dctz_tpu.ops.repair import _SLACK  # noqa: E402

AMORT_K = 64
EB = 1e-3


def _sync(arr):
    float(jnp.asarray(arr).ravel()[0])


def _amortized_s(call, *operands):
    @jax.jit
    def rep(z, *ops):
        def body(i, acc):
            return acc + call(acc * 1e-30, *ops) * 1e-30

        return jax.lax.fori_loop(0, AMORT_K, body, z)

    _sync(rep(jnp.float32(0), *operands))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(rep(jnp.float32(0), *operands))
        best = min(best, time.perf_counter() - t0)
    return best / AMORT_K


def climate(n):
    t = jnp.arange(n, dtype=jnp.float32)
    x = (
        jnp.sin(t * 0.001) * 40.0
        + jnp.sin(t * 0.137) * 3.0
        + jnp.sin(t * 2.03) * 0.3
    )
    spike = jnp.arange(n, dtype=jnp.int32) % 9973 == 0
    return jnp.where(spike, x * 8.0, x)


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 25)
    gb = n * 4 / 1e9
    x = jax.jit(climate, static_argnums=0)(n)
    _sync(x)
    cw = chunk_width(n, 64)
    cape = min(idpack.CAPE, cw)

    for tps in (1, 2, 4, 8):
        dpk_fuse.TPS = tps
        for verify in (False, True):

            def call(eps, x, _v=verify):
                arr = x + eps
                sf, mean = api._stats_device(arr, n, 1)
                tol = (jnp.max(arr) - jnp.min(arr)) * jnp.float32(EB) * _SLACK
                outs = dpk_fuse.encode_x_fused(
                    arr, sf, tol, n, EB, cape, cw, _v
                )
                acc = sf + mean
                for o in outs:
                    acc = acc + jnp.sum(o.astype(jnp.float32)) * 1e-30
                return acc.astype(jnp.float32)

            try:
                s = _amortized_s(call, x)
                print(
                    f"tps={tps} encode verify={verify}: {s*1e3:.2f} ms "
                    f"{gb/s:.1f} GB/s",
                    flush=True,
                )
            except Exception as e:  # VMEM overflow etc: report and move on
                print(f"tps={tps} verify={verify}: FAILED {type(e).__name__}:"
                      f" {str(e)[:200]}", flush=True)

    # decode at each tps, on the real container's device inputs
    from dctz_tpu.config import CodecConfig
    import numpy as np

    sf, _ = api._stats_device(x, n, 1)
    from dctz_tpu.ops.repair import _SLACK as _S2

    tol = (jnp.max(x) - jnp.min(x)) * jnp.float32(EB) * _S2
    dpk_fuse.TPS = 1
    (width, packed, exc_rows, exc_counts, ac_rows, ac_counts, dc,
     _ovf, _ok) = dpk_fuse.encode_x_fused(x, sf, tol, n, EB, cape, cw, False)
    peak_e = int(jnp.max(exc_counts))
    peak_a = int(jnp.max(ac_counts))
    tiers = [t for t in (32, 64, 128) if t < cw] + [cw]
    exc_p = exc_rows[:, : next(t for t in tiers if t >= min(peak_e, cw))]
    ac_p = ac_rows[:, : next(t for t in tiers if t >= min(peak_a, cw))]
    cfg = CodecConfig(mode="ec", error_bound=EB)
    y_ref = None
    for tps in (1, 2, 4, 8):
        dpk_fuse.TPS = tps

        def call_d(eps, width, packed, exc_p, ac_p, dc):
            y = dpk_fuse.decode_fused(
                width, packed, exc_p, ac_p + eps, dc, sf + eps, cfg, cw,
                None,
            )
            return y.ravel()[0].astype(jnp.float32)

        try:
            s = _amortized_s(call_d, width, packed, exc_p, ac_p, dc)
            y = dpk_fuse.decode_fused(
                width, packed, exc_p, ac_p, dc, sf, cfg, cw, None
            )[:n]
            if y_ref is None:
                y_ref = np.asarray(jax.device_get(y))
                same = True
            else:
                same = bool(np.array_equal(np.asarray(jax.device_get(y)), y_ref))
            print(
                f"tps={tps} decode: {s*1e3:.2f} ms {gb/s:.1f} GB/s "
                f"bitexact_vs_tps1={same}",
                flush=True,
            )
        except Exception as e:
            print(f"tps={tps} decode: FAILED {type(e).__name__}:"
                  f" {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
