"""Fused Pallas TPU kernel: scale -> block DCT -> quantize, one HBM pass.

Replaces the XLA encode front-end for the EC hot path. Per grid step a
(TILE_R, 128) tile (two 64-blocks per row) is processed entirely in VMEM:

  * scale by 1/sf (VPU)
  * DCT-II as a (TILE_R,128) @ (128,128) block-diagonal basis matmul (MXU)
  * closed-form zigzag bin ids + escape marks (VPU)
  * DC / escaped-coefficient extraction into one f32 output (VPU)

Outputs per tile:
  ids  (TILE_R, 128) uint8 — the bin_index stream (row-major == element
       order, since each row is two consecutive 64-blocks)
  dcac (TILE_R, 128) f32 — lane j%64==0: the block's DC coefficient;
       escaped positions: the coefficient; everything else 0

The variable-length AC stream is then compacted from `dcac` by the
chunk-local sort in ops/compaction.py (mask = escape marks in `ids`).

Design note: an in-kernel per-block slot compaction was prototyped and
rejected — DCT escapes are bimodal per block (a single spike in a block
pushes essentially ALL its 63 AC coefficients out of range, because the
spike spreads as ~|spike|*sqrt(2/64) into every coefficient), so any
per-block capacity below 63 overflows on exactly the blocks that matter.
Chunk-level sorting handles both regimes.

EC mode only: QT's pass-2 renormalization needs a global qtable reduction
between pass 1 and pass 2; QT uses the XLA path (quantize.encode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from ..core.transform import _blockdiag_np

TILE_R = 512  # rows (of 128 lanes) per grid step: 256 KB f32 in VMEM
LANES = 128
BS = 64  # block size (two blocks per row)


def _kernel(sf_ref, geom_ref, x_ref, bd_ref, ids_ref, dcac_ref):
    r = x_ref.shape[0]
    rmin = geom_ref[0]
    rmax = geom_ref[1]
    w = geom_ref[2]
    nbins = C.NBINS

    # divide (not multiply-by-reciprocal): the reference divides in place
    # (dctz-comp-lib.c:198) and reciprocal rounding would flip edge bins
    xs = x_ref[:] / sf_ref[0]
    # HIGHEST: full-f32 MXU passes — bf16 rounding here would inject ~1e-2
    # relative coefficient error and break the bound
    coef = jnp.dot(
        xs,
        bd_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    col = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    is_dc = (col % BS) == 0
    in_range = (coef >= rmin) & (coef <= rmax)
    lin = jnp.clip(((coef - rmin) / w).astype(jnp.int32), 0, nbins - 1)
    half = nbins // 2
    zz = jnp.where(lin <= half, 2 * (half - lin), 2 * (lin - half) - 1)
    ids_ref[:] = jnp.where(
        in_range & ~is_dc, zz, jnp.full_like(zz, C.ESCAPE)
    ).astype(jnp.uint8)

    keep = is_dc | ~in_range
    dcac_ref[:] = jnp.where(keep, coef, jnp.zeros_like(coef))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def fused_encode_ec(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    brsf: float = 1.0,
    interpret: bool = False,
):
    """Run the fused kernel over a flat f32 array; requires n % 128 == 0
    (the caller zero-pads — v2 containers carry padded streams natively).

    Returns (ids (nblk, 64) u8, dcac (nblk, 64) f32). DC lives in
    dcac[:, 0]; escaped coefficients at their positions; zeros elsewhere.
    """
    n = x.shape[0]
    # 8 sublanes x 128 lanes: tiles must be (8k, 128)
    assert n % (LANES * 8) == 0, n
    rows = n // LANES
    tile_r = next(t for t in (512, 256, 128, 64, 32, 16, 8) if rows % t == 0)
    grid = rows // tile_r

    half = C.NBINS // 2
    w = error_bound * 2.0 * brsf
    rmax = (half * 2 + 1) * (error_bound * brsf)
    geom = jnp.asarray([-rmax, rmax, w], jnp.float32)
    bd = jnp.asarray(_blockdiag_np(BS, LANES // BS, True), jnp.float32)

    ids, dcac = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sf (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # geom (3,)
            pl.BlockSpec(
                (tile_r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(sf.reshape(1).astype(jnp.float32), geom, x.reshape(rows, LANES), bd)

    nblk = n // BS
    return ids.reshape(nblk, BS), dcac.reshape(nblk, BS)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def fused_encode_pipeline(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    capc: int | None = None,
    interpret: bool = False,
):
    """Fused kernel + chunk-local AC compaction: the full EC device encode.

    Returns (ids (nblk,64) u8, dc (nblk,) f32, ac_chunks (nc,capc) f32,
    counts (nc,) i32, overflow bool)."""
    from ..core.quantize import chunk_width
    from . import compaction as cp

    ids, dcac = fused_encode_ec(x, sf, error_bound, 1.0, interpret)
    n = x.shape[0]
    dc = dcac[:, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1)
    esc = (ids == C.ESCAPE) & (col >= 1)
    cw = chunk_width(n, BS)
    ac_chunks, counts, overflow = cp.compact_chunked(
        esc.reshape(-1),
        dcac.reshape(-1),
        cw,
        min(capc or cp.CAPC, cw),
    )
    return ids, dc, ac_chunks, counts, overflow
