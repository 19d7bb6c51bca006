#!/usr/bin/env python
"""A/B the DPK chunk width (compaction/routing width) on the real chip.

The unified butterfly compact is roll-bound (docs/scaling.md): stage count
is log2(cw) and each roll spans cw lanes (cw=512 rolls cross 4 vregs; 128
is a single-vreg rotate). cw is already a self-describing format parameter
(api._DPK_META_FMT), so narrowing it is a default change, not a format rev.
This measures the exact kernels the API dispatches at cw in {512,256,128}:

  * dpk_fuse.encode_x_fused (verify off/on)  [the device encode]
  * dpk_fuse.decode_fused                    [the device decode]
  * stream-size proxy: nc x capc tier storage for the AC/exc sections

Usage: python tools/measure/ab_cw.py [log2_n=25]
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
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from dctz_tpu import api  # noqa: E402
from dctz_tpu.ops import dpk_fuse  # noqa: E402
from dctz_tpu.ops import idpack  # noqa: E402
from dctz_tpu.ops.repair import _SLACK  # noqa: E402
from dctz_tpu.config import CodecConfig  # noqa: E402

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

    for cw in (512, 256, 128):
        cape = min(idpack.CAPE, cw)
        for verify in (False, True):

            def call(eps, x, _v=verify, _cw=cw, _cape=cape):
                arr = x + eps
                sf, mean = api._stats_device(arr, n, 1)
                xv_max = jnp.max(arr)
                xv_min = jnp.min(arr)
                tol = (xv_max - xv_min) * jnp.float32(EB) * _SLACK
                outs = dpk_fuse.encode_x_fused(
                    arr, sf, tol, n, EB, _cape, _cw, _v
                )
                acc = sf + mean
                for o in outs:
                    acc = acc + jnp.sum(o.astype(jnp.float32)) * 1e-30
                return acc.astype(jnp.float32)

            s = _amortized_s(call, x)
            print(
                f"cw={cw} encode verify={verify}: {s*1e3:.2f} ms "
                f"{gb/s:.1f} GB/s",
                flush=True,
            )

        # decode at this cw: run the encode once for real streams
        sf, _ = api._stats_device(x, n, 1)
        tol = (jnp.max(x) - jnp.min(x)) * jnp.float32(EB) * _SLACK
        (width, packed, exc_rows, exc_counts, ac_rows, ac_counts, dc,
         overflow, ok) = dpk_fuse.encode_x_fused(
            x, sf, tol, n, EB, cape, cw, True
        )
        peak_e = int(jnp.max(exc_counts))
        peak_a = int(jnp.max(ac_counts))
        tiers = [t for t in (32, 64, 128) if t < cw] + [cw]
        tier_e = next(t for t in tiers if t >= min(peak_e, cw))
        tier_a = next(t for t in tiers if t >= min(peak_a, cw))
        nc = exc_rows.shape[0]
        tot_e = int(jnp.sum(exc_counts))
        tot_a = int(jnp.sum(ac_counts))
        print(
            f"cw={cw} streams: nc={nc} peak_exc={peak_e} peak_ac={peak_a} "
            f"tier_exc={tier_e} tier_ac={tier_a} "
            f"store_exc={nc*tier_e} ({tot_e} live) "
            f"store_ac={nc*tier_a*4}B ({tot_a} live) overflow={bool(overflow)}",
            flush=True,
        )

        cfg = CodecConfig(mode="ec", error_bound=EB)
        exc_p = exc_rows[:, :tier_e]
        ac_p = ac_rows[:, :tier_a]

        def call_d(eps, width, packed, exc_p, ac_p, dc, _cw=cw):
            y = dpk_fuse.decode_fused(
                width, packed, exc_p, ac_p + eps, dc, sf + eps, cfg, _cw,
                None,
            )
            return y.ravel()[0].astype(jnp.float32)

        s = _amortized_s(
            jax.jit(call_d, static_argnums=()), width, packed, exc_p,
            ac_p, dc,
        )
        print(f"cw={cw} decode: {s*1e3:.2f} ms  {gb/s:.1f} GB/s", flush=True)

        # round-trip bound check at this cw
        y = dpk_fuse.decode_fused(
            width, packed, exc_p, ac_p, dc, sf, cfg, cw, None
        )[:n]
        tol_h = float(tol)
        err = float(jnp.max(jnp.abs(y - x)))
        print(
            f"cw={cw} bound: max_abs_err={err:.3e} tol={tol_h:.3e} "
            f"ok={err <= tol_h} verify_ok={bool(ok)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
