#!/usr/bin/env python
"""Decode-kernel cost split: time decode_fused against a stripped variant
with the butterfly expansions removed (exceptions/AC ignored — wrong
output, right traffic). The delta is the routing networks' share.

Usage: python tools/measure/decode_breakdown.py [log2_n=25]
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

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dctz_tpu import api  # noqa: E402
from dctz_tpu.config import CodecConfig  # noqa: E402
from dctz_tpu.core import constants as C  # noqa: E402
from dctz_tpu.ops import dpk_fuse  # noqa: E402

AMORT_K = 64
BS, TILE_B, TILE_N = dpk_fuse.BS, dpk_fuse.TILE_B, dpk_fuse.TILE_N


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


def make_noexpand_kernel(cw: int, cape: int, capc: int):
    """decode_fused's kernel body with the two route_expand networks
    replaced by 'use nib3 directly' — measurement-only."""
    g = cw // BS
    cpt = TILE_N // cw

    def kernel(sf_ref, geom_ref, w_ref, packed_ref, exc_ref, ac_ref,
               dc_ref, bd_ref, out_ref, scr):
        w_bin = geom_ref[0]
        byf = dpk_fuse._bf16(packed_ref[:].astype(jnp.int32))
        i128 = jax.lax.broadcasted_iota(jnp.int32, (128, TILE_B), 0)
        k256 = jax.lax.broadcasted_iota(jnp.int32, (128, TILE_B), 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, (BS, TILE_B), 1)

        def gsel(sel):
            return dpk_fuse._dg(
                byf, dpk_fuse._bf16(sel), ((1,), (0,))
            ).astype(jnp.int32)

        v4 = (gsel(i128 == k256 // 2) >> ((kk % 2) * 4)) & 15
        v2 = (gsel(i128 == k256 // 4) >> ((kk % 4) * 2)) & 3
        v1 = (gsel(i128 == k256 // 8) >> (kk % 8)) & 1
        a3 = gsel(i128 == (3 * k256) // 8)
        b3 = gsel(i128 == (3 * k256) // 8 + 1)
        s3 = (3 * kk) % 8
        v3 = ((a3 >> s3) | (b3 << (8 - s3))) & 7
        w_row = w_ref[0:1, :].astype(jnp.int32)
        eye_i = (
            jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 1)
        )
        wt = jnp.sum(
            jnp.broadcast_to(w_row, (BS, BS)) * eye_i.astype(jnp.int32),
            axis=1, keepdims=True,
        )
        nib_tm = jnp.where(wt == 1, v1, jnp.zeros_like(v1))
        nib_tm = jnp.where(wt == 2, v2, nib_tm)
        nib_tm = jnp.where(wt == 3, v3, nib_tm)
        nib_tm = jnp.where(wt == 4, v4, nib_tm)
        p = dpk_fuse._dg(
            dpk_fuse._bf16(nib_tm), dpk_fuse._bf16(eye_i), ((0,), (0,))
        )
        scr[:] = p.astype(jnp.int32)
        nib3 = jnp.concatenate([scr[i::g, :] for i in range(g)], axis=1)
        # consume exc/ac without the networks so their HBM loads stay
        touch = (
            jnp.sum(exc_ref[:].astype(jnp.int32).astype(jnp.float32))
            + jnp.sum(ac_ref[:])
        ) * 1e-30
        col3 = jax.lax.broadcasted_iota(jnp.int32, (cpt, cw), 1)
        ids3 = nib3
        dcpos = (col3 % BS) == 0
        k2 = ids3 // 2
        cent = jnp.where(ids3 % 2 == 1, k2 + 1, -k2).astype(
            jnp.float32
        ) * w_bin + touch
        co = cent
        idc = jax.lax.broadcasted_iota(jnp.int32, (g, cw), 0)
        qdc = jax.lax.broadcasted_iota(jnp.int32, (g, cw), 1)
        e_dc = (qdc == BS * idc).astype(jnp.float32)
        dcx = dpk_fuse._dg(
            dc_ref[:], e_dc, ((1,), (0,)), jax.lax.Precision.HIGHEST
        )
        co = jnp.where(dcpos, dcx, co)
        g128 = cw // 128
        stacked = jnp.concatenate(
            [co[:, 128 * k : 128 * (k + 1)] for k in range(g128)], axis=0
        )
        rr = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        qq = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        r_sel = (
            (qq % cpt == rr // g128) & (qq // cpt == rr % g128)
        ).astype(jnp.float32)
        c2 = dpk_fuse._dg(r_sel, stacked, ((1,), (0,)),
                          jax.lax.Precision.HIGHEST)
        x = jnp.dot(
            c2, bd_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[:] = x * sf_ref[0]

    return kernel


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 25)
    gb = n * 4 / 1e9
    t = jnp.arange(n, dtype=jnp.float32)
    x = jnp.sin(t * 0.001) * 40.0 + jnp.sin(t * 0.137) * 3.0
    spike = jnp.arange(n, dtype=jnp.int32) % 9973 == 0
    x = jnp.where(spike, x * 8.0, x)
    _sync(x)
    cfg = CodecConfig(
        mode="ec", error_bound=1e-3, container="v2", ids_codec="device",
        segment_elems=0,
    )
    blob = api.compress(np.asarray(jax.device_get(x)), config=cfg)
    from dctz_tpu.core import container as ctn
    from dctz_tpu.core.quantize import _geometry
    from dctz_tpu.core.transform import _blockdiag_np

    header, streams, qtable, _cb = ctn.parse_v2(blob)
    host_arrays, (n_stream, tile_b, cw, cfg_h, ac_layout) = (
        api._dpk_decode_prep(header, streams)
    )
    width, rows, exc_rows, dc, ac = [jnp.asarray(a) for a in host_arrays]
    for a in (width, rows, exc_rows, dc, ac):
        _sync(a)
    sfv = jnp.asarray(header.scaling_factor, jnp.float32)
    dcfg = api._device_cfg(cfg_h)

    def call_full(eps, *dev):
        y = api._decode_device_dpk(
            dev[0], dev[1], dev[2], dev[3] + eps, dev[4],
            n_stream, dcfg, "float32", ac_layout, tile_b, cw, sfv + eps,
            None,
        )
        return y.ravel()[0].astype(jnp.float32)

    s = _amortized_s(call_full, width, rows, exc_rows, dc, ac)
    print(f"decode full: {s*1e3:.2f} ms  {gb/s:.1f} GB/s", flush=True)

    # stripped variant
    tcnt = width.shape[0]
    g = cw // BS
    cpt = TILE_N // cw
    nc_pad = tcnt * cpt
    nc, cape = exc_rows.shape
    capc = ac.shape[1]
    cape_k = min(cw, -(-cape // 128) * 128)
    capc_k = min(cw, -(-capc // 128) * 128)
    exc = jnp.pad(exc_rows, ((0, nc_pad - nc), (0, cape_k - cape)))
    acp = jnp.pad(
        ac.astype(jnp.float32),
        ((0, nc_pad - ac.shape[0]), (0, capc_k - capc)),
    )
    dc3 = jnp.pad(
        dc.astype(jnp.float32), (0, tcnt * TILE_B - dc.shape[0])
    ).reshape(nc_pad, g)
    w_bin, rmin, rmax = _geometry(dcfg, np.dtype(np.float32))
    geom = jnp.stack([
        w_bin.astype(jnp.float32), rmin.astype(jnp.float32),
        rmax.astype(jnp.float32), jnp.asarray(1e-2, jnp.float32),
    ])
    bd = jnp.asarray(_blockdiag_np(BS, 128 // BS, False), jnp.float32)
    width8 = jnp.repeat(width.astype(jnp.uint8), 8, axis=0)
    kernel = make_noexpand_kernel(cw, cape_k, capc_k)

    def call_stripped(eps, w8, pk, e, a, d3, bdm):
        x2 = pl.pallas_call(
            kernel,
            grid=(tcnt,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((8, BS), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BS, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpt, cape_k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpt, capc_k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpt, g), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((tcnt * 128, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TILE_B, BS), jnp.int32)],
        )(sfv.reshape(1) + eps, geom, w8, pk, e, a, d3, bdm)
        return x2.ravel()[0].astype(jnp.float32)

    s2 = _amortized_s(call_stripped, width8, rows, exc, acp, dc3, bd)
    print(
        f"decode no-expand variant: {s2*1e3:.2f} ms  "
        f"(networks share ~{(s-s2)*1e3:.2f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
