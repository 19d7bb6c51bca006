#!/usr/bin/env python
"""Amortized device-kernel timings on the real chip (round-4 roofline work).

Measures the exact programs the public API dispatches:
  * fused_encode_pipeline_dpk_ec, verify on/off
  * decode_fused via api._decode_device_dpk

Usage: python tools/measure/dev_kernels.py [log2_n=25]
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
from dctz_tpu.config import CodecConfig  # noqa: E402
from dctz_tpu.ops import fused_encode as fe  # noqa: E402
from dctz_tpu.ops import idpack  # noqa: E402

AMORT_K = 64


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
    cfg = CodecConfig(
        mode="ec", error_bound=1e-3, container="v2", ids_codec="device"
    )

    for verify in (False, True):
        def call(eps, x, _v=verify):
            arr = x + eps
            sf, mean = api._stats_device(arr, n, cfg.sf_adj)
            outs = fe.fused_encode_pipeline_dpk_ec(
                arr, sf, cfg.error_bound, idpack.CAPE, n, _v
            )
            acc = sf + mean
            for o in outs:
                acc = acc + jnp.sum(o.astype(jnp.float32)) * 1e-30
            return acc.astype(jnp.float32)

        s = _amortized_s(call, x)
        print(
            f"encode verify={verify}: {s*1e3:.2f} ms  {gb/s:.1f} GB/s",
            flush=True,
        )

    # build a container for the decode inputs
    import dataclasses

    dcfg = dataclasses.replace(cfg, verify=False, segment_elems=None)
    blob = api.compress(np.asarray(jax.device_get(x)), config=dcfg)
    from dctz_tpu.core import container as ctn

    header, streams, qtable, _cb = ctn.parse_v2(blob)
    assert header.dpk
    host_arrays, (n_stream, tile_b, cw, cfg_h, ac_layout) = (
        api._dpk_decode_prep(header, streams)
    )
    dev = tuple(jnp.asarray(a) for a in host_arrays)
    for a in dev:
        _sync(a)
    sfv = jnp.asarray(header.scaling_factor, jnp.float32)
    dcfg2 = api._device_cfg(cfg_h)

    def call_d(eps, *dev):
        y = api._decode_device_dpk(
            dev[0], dev[1], dev[2], dev[3] + eps, dev[4],
            n_stream, dcfg2, "float32", ac_layout, tile_b, cw,
            sfv + eps, None, header.dcd,
        )
        return y.ravel()[0].astype(jnp.float32)

    s = _amortized_s(call_d, *dev)
    print(f"decode: {s*1e3:.2f} ms  {gb/s:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
