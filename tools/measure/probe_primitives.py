#!/usr/bin/env python
"""Primitive-cost probes for the encode kernel's stages (round 5).

Questions the cw A/B raised (tools/measure/ab_cw.py):
  * how much of the 1.85 ms DCT stage is MXU math vs grid-step overhead
    (8192 steps/128 MB)?  -> P_mm{1,2,4,8}: same total MACs, fewer steps.
  * what does one (cpt, cw) roll stage actually cost, and does width or
    supertiling change it?  -> P_roll*: 27 dependent roll+select stages.

Usage: python tools/measure/probe_primitives.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

N = 1 << 25  # 128 MB f32
AMORT_K = 32


def _sync(arr):
    float(jnp.asarray(arr).ravel()[0])


def _amortized_s(fn, *ops):
    @jax.jit
    def rep(z, *ops):
        def body(i, acc):
            return acc + fn(acc * 1e-30, *ops) * 1e-30

        return jax.lax.fori_loop(0, AMORT_K, body, z)

    _sync(rep(jnp.float32(0), *ops))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(rep(jnp.float32(0), *ops))
        best = min(best, time.perf_counter() - t0)
    return best / AMORT_K


def probe_mm(rows_per_step: int):
    """HIGHEST (rows,128)@(128,128) over the whole 128 MB."""
    grid = (N // 128) // rows_per_step

    def kernel(x_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(
            x_ref[:], b_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def run(eps, x, b):
        y = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((rows_per_step, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows_per_step, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        )(x + eps, b)
        return y.ravel()[0]

    x = jnp.ones((N // 128, 128), jnp.float32)
    b = jnp.ones((128, 128), jnp.float32)
    s = _amortized_s(run, x, b)
    print(f"mm rows/step={rows_per_step:4d} grid={grid:5d}: "
          f"{s*1e3:.2f} ms", flush=True)


def probe_roll(cpt: int, cw: int, stages: int, tiles_per_step: int = 1):
    """`stages` dependent roll+select stages on a (cpt*tps, cw) i32 grid,
    one grid step per (tiles_per_step) 16 Ki-element tiles."""
    t = N // 16384 // tiles_per_step
    r = cpt * tiles_per_step

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        k = 0
        s = 1
        for _ in range(stages):
            rl = pltpu.roll(a, cw - s, axis=1)
            tk = ((rl & (1 << k)) != 0) & (col < cw - s)
            a = jnp.where(tk, rl, a)
            k += 1
            s *= 2
            if s >= cw:
                s = 1
                k = 0
        o_ref[:] = a

    def run(eps, x):
        y = pl.pallas_call(
            kernel,
            grid=(t,),
            in_specs=[pl.BlockSpec((r, cw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, cw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t * r, cw), jnp.int32),
        )(x + eps.astype(jnp.int32))
        return y.ravel()[0].astype(jnp.float32)

    x = jnp.ones((t * r, cw), jnp.int32)
    s = _amortized_s(run, x)
    print(f"roll cpt={cpt} cw={cw} stages={stages} tps={tiles_per_step}: "
          f"{s*1e3:.2f} ms", flush=True)


def probe_sublane_roll(stages: int):
    """Same stage count but rolling along SUBLANES of a (512, 128) grid."""
    t = N // 16384 * 4  # keep step area 64 KB: (128, 128) i32
    r, cw = 128, 128

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        k = 0
        s = 1
        for _ in range(stages):
            rl = pltpu.roll(a, r - s, axis=0)
            tk = ((rl & (1 << k)) != 0) & (row < r - s)
            a = jnp.where(tk, rl, a)
            k += 1
            s *= 2
            if s >= r:
                s = 1
                k = 0
        o_ref[:] = a

    def run(eps, x):
        y = pl.pallas_call(
            kernel,
            grid=(t,),
            in_specs=[pl.BlockSpec((r, cw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, cw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t * r, cw), jnp.int32),
        )(x + eps.astype(jnp.int32))
        return y.ravel()[0].astype(jnp.float32)

    x = jnp.ones((t * r, cw), jnp.int32)
    s = _amortized_s(run, x)
    print(f"subl-roll (128,128) stages={stages}: {s*1e3:.2f} ms",
          flush=True)


def main():
    if "--mm" in sys.argv:
        for rows in (128, 256, 512, 1024):
            probe_mm(rows)
    probe_roll(32, 512, 27)
    probe_roll(32, 512, 27, tiles_per_step=2)
    probe_roll(32, 512, 27, tiles_per_step=8)
    probe_roll(64, 256, 24)
    probe_roll(128, 128, 21)
    probe_roll(32, 512, 9)
    probe_sublane_roll(21)
    probe_sublane_roll(27)


if __name__ == "__main__":
    main()
