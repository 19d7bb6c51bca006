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

QT mode runs as TWO kernels with an XLA reduction between them (the qtable
must see pass-1 maxima from ALL blocks before pass 2 renormalizes,
dctz-comp-lib.c:355-398 vs :478-544):

  pass 1 (_kernel_qmax): scale + DCT + escape detection only; accumulates
      the per-lane max |escaped coefficient| into one (8, 128) VMEM block
      across grid steps (TPU grids run sequentially, so read-modify-write
      accumulation into a fixed output block is well-defined). Reads x once,
      writes 4 KB — no ids/dcac traffic.
  glue: fold (8, 128) -> (64,) position maxima, clamp >= 1.0
      (dctz-comp-lib.c:450-461); slot 0 is patched AFTER pass 2 with the
      last block's DC (the decoder never reads it).
  pass 2 (_kernel_qt): recompute coefficients (an extra MXU matmul is
      cheaper than round-tripping them through HBM), renormalize escapes
      through the qtable, re-bin renormalized values that land in range
      (faithful to dctz-comp-lib.c:494-533), emit ids + dcac exactly like
      the EC kernel.

Precision note: the renormalization runs in f32 on the TPU (the reference
mixes float with double error-bound arithmetic; the XLA path reproduces
that with f64 intermediates when x64 is enabled). Stored values can differ
from the C stream by 1 ulp with ~2^-29 probability per escape — documented
in docs/numerics.md.
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

# Test hook: force interpret mode for every kernel in this module (CPU CI
# drives the full fused dispatch paths through it; cf. ops/dpk_fuse.py)
_INTERPRET = False


def _fwd_dot(xs, bd, relaxed: bool):
    """The analysis-DCT matmul. Default HIGHEST: full-f32 MXU passes —
    single-pass bf16 rounding here would inject ~1e-2 relative coefficient
    error and break the bound. relaxed (cfg.dct_precision="high") runs the
    explicit 3-pass bf16x3 decomposition instead (~2^-21 relative; see
    docs/numerics.md)."""
    if relaxed:
        from .dpk_fuse import _dot_bf16x3

        return _dot_bf16x3(xs, bd)
    return jnp.dot(
        xs,
        bd,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.lru_cache(maxsize=None)
def _make_kernel(relaxed: bool):
    def _kernel(sf_ref, geom_ref, x_ref, bd_ref, ids_ref, dcac_ref):
        r = x_ref.shape[0]
        rmin = geom_ref[0]
        rmax = geom_ref[1]
        w = geom_ref[2]
        nbins = C.NBINS

        # divide (not multiply-by-reciprocal): the reference divides in
        # place (dctz-comp-lib.c:198); reciprocal rounding flips edge bins
        xs = x_ref[:] / sf_ref[0]
        coef = _fwd_dot(xs, bd_ref[:], relaxed)

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

    return _kernel


@functools.lru_cache(maxsize=None)
def _make_kernel_qmax(relaxed: bool):
    def _kernel_qmax(sf_ref, geom_ref, x_ref, bd_ref, qmax_ref):
        """QT pass 1: per-lane max |escaped coefficient|, accumulated
        across grid steps into one fixed (8, 128) output block."""
        r = x_ref.shape[0]
        rmin = geom_ref[0]
        rmax = geom_ref[1]

        xs = x_ref[:] / sf_ref[0]
        coef = _fwd_dot(xs, bd_ref[:], relaxed)
        col = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
        is_dc = (col % BS) == 0
        escape = ~((coef >= rmin) & (coef <= rmax)) & ~is_dc
        mag = jnp.where(escape, jnp.abs(coef), jnp.zeros_like(coef))
        tile_max = jnp.max(mag.reshape(r // 8, 8, LANES), axis=0)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            qmax_ref[:] = jnp.zeros_like(qmax_ref)

        qmax_ref[:] = jnp.maximum(qmax_ref[:], tile_max)

    return _kernel_qmax


@functools.lru_cache(maxsize=None)
def _make_kernel_qt(relaxed: bool):
    def _kernel_qt(sf_ref, geom_ref, x_ref, bd_ref, qt_ref, ids_ref, dcac_ref):
        """QT pass 2: renormalize escapes through the (replicated) qtable,
        re-bin values that land in range, emit ids + dcac like the EC
        kernel."""
        return _kernel_qt_body(
            sf_ref, geom_ref, x_ref, bd_ref, qt_ref, ids_ref, dcac_ref,
            relaxed,
        )

    return _kernel_qt


def _kernel_qt_body(
    sf_ref, geom_ref, x_ref, bd_ref, qt_ref, ids_ref, dcac_ref, relaxed
):
    r = x_ref.shape[0]
    rmin = geom_ref[0]
    rmax = geom_ref[1]
    w = geom_ref[2]
    eb = geom_ref[3]
    qtf = geom_ref[4]
    nbins = C.NBINS

    xs = x_ref[:] / sf_ref[0]
    coef = _fwd_dot(xs, bd_ref[:], relaxed)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    is_dc = (col % BS) == 0
    in_range = (coef >= rmin) & (coef <= rmax)
    escape = ~in_range & ~is_dc

    qrow = qt_ref[0:1, :]  # (1, 128) broadcasts over rows
    side = jnp.where(coef > rmax, rmax, rmin)
    # multiply by eb THEN qt_factor — the same rounding order as the C
    # expression (dctz-comp-lib.c:515) and the XLA path
    norm = ((coef / qrow) * eb) * qtf + side  # f32 (see module docstring)
    eff = jnp.where(escape, norm, coef)
    re_in = (eff >= rmin) & (eff <= rmax)  # original bins stay in range

    lin = jnp.clip(((eff - rmin) / w).astype(jnp.int32), 0, nbins - 1)
    half = nbins // 2
    zz = jnp.where(lin <= half, 2 * (half - lin), 2 * (lin - half) - 1)
    ids_ref[:] = jnp.where(
        re_in & ~is_dc, zz, jnp.full_like(zz, C.ESCAPE)
    ).astype(jnp.uint8)

    keep_exact = ~re_in & ~is_dc  # still-out-of-range after renorm
    dcac_ref[:] = jnp.where(
        is_dc, coef, jnp.where(keep_exact, norm, jnp.zeros_like(coef))
    )


def _qtable_pass(x2, sf1, geom, bd, tile_r, grid, interpret, relaxed=False):
    """QT pass 1 (see module docstring): per-position qtable, clamped >= 1.0
    (slot 0 is patched by the caller with the last block's DC)."""
    qmax = pl.pallas_call(
        _make_kernel_qmax(relaxed),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (tile_r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        interpret=interpret or _INTERPRET,
    )(sf1, geom, x2, bd)

    colmax = jnp.max(qmax, axis=0)
    col64 = jnp.maximum(colmax[:BS], colmax[BS:])
    return jnp.maximum(col64, jnp.float32(1.0))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def qtable_qmax(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    brsf: float = 1.0,
    dct_precision: str = "highest",
):
    """QT pass 1 alone: the clamped (>= 1.0) per-position max |escaped
    coefficient| of THIS array — slot 0 carries no meaning here (the
    caller patches it with the last block's DC, the reference quirk).
    The segmented stream writer max-reduces these across segments to the
    GLOBAL qtable (stream.compress_stream), mirroring the monolithic
    two-pass structure of /root/reference/dctz-comp-lib.c:355-398,450-461;
    max is associative, so the reduction equals the whole-array pass."""
    n = x.shape[0]
    assert n % (LANES * 8) == 0, n
    rows = n // LANES
    tile_r = next(t for t in (512, 256, 128, 64, 32, 16, 8) if rows % t == 0)
    grid = rows // tile_r
    half = C.NBINS // 2
    w = error_bound * 2.0 * brsf
    rmax = (half * 2 + 1) * (error_bound * brsf)
    qtf = 10.0 if C.NBINS == 255 else 2000.0
    geom = jnp.asarray([-rmax, rmax, w, error_bound, qtf], jnp.float32)
    bd = jnp.asarray(_blockdiag_np(BS, LANES // BS, True), jnp.float32)
    # the segment pipeline pairs this pass with dpk_fuse.encode_x_fused —
    # inherit its interpret hook so forced-CPU CI runs both interpreted
    from . import dpk_fuse as _df

    return _qtable_pass(
        x.reshape(rows, LANES), sf.reshape(1).astype(jnp.float32), geom,
        bd, tile_r, grid, _df._INTERPRET, dct_precision == "high",
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def fused_encode_qt(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    brsf: float = 1.0,
    interpret: bool = False,
    dct_precision: str = "highest",
):
    """Two-kernel QT encode; same contract as fused_encode_ec plus the
    (64,) qtable with slot 0 = the last block's DC (the reference quirk,
    dctz-comp-lib.c:355-360)."""
    n = x.shape[0]
    assert n % (LANES * 8) == 0, n
    rows = n // LANES
    tile_r = next(t for t in (512, 256, 128, 64, 32, 16, 8) if rows % t == 0)
    grid = rows // tile_r

    half = C.NBINS // 2
    w = error_bound * 2.0 * brsf
    rmax = (half * 2 + 1) * (error_bound * brsf)
    qtf = 10.0 if C.NBINS == 255 else 2000.0
    geom = jnp.asarray([-rmax, rmax, w, error_bound, qtf], jnp.float32)
    bd = jnp.asarray(_blockdiag_np(BS, LANES // BS, True), jnp.float32)
    x2 = x.reshape(rows, LANES)
    sf1 = sf.reshape(1).astype(jnp.float32)

    relaxed = dct_precision == "high"
    qtable = _qtable_pass(x2, sf1, geom, bd, tile_r, grid, interpret, relaxed)

    ids, dcac = pl.pallas_call(
        _make_kernel_qt(relaxed),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (tile_r, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
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
        interpret=interpret or _INTERPRET,
    )(
        sf1,
        geom,
        x2,
        bd,
        jnp.broadcast_to(jnp.concatenate([qtable, qtable])[None, :], (8, LANES)),
    )

    nblk = n // BS
    return ids.reshape(nblk, BS), dcac.reshape(nblk, BS), qtable


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def fused_encode_ec(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    brsf: float = 1.0,
    interpret: bool = False,
    dct_precision: str = "highest",
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
        _make_kernel(dct_precision == "high"),
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
        interpret=interpret or _INTERPRET,
    )(sf.reshape(1).astype(jnp.float32), geom, x.reshape(rows, LANES), bd)

    nblk = n // BS
    return ids.reshape(nblk, BS), dcac.reshape(nblk, BS)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def fused_encode_pipeline(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    capc: int | None = None,
    interpret: bool = False,
    dct_precision: str = "highest",
):
    """Fused kernel + chunk-local AC compaction: the full EC device encode.

    Returns (ids (nblk,64) u8, dc (nblk,) f32, ac_chunks (nc,capc) f32,
    counts (nc,) i32, overflow bool)."""
    from ..core.quantize import chunk_width
    from . import compaction as cp

    ids, dcac = fused_encode_ec(
        x, sf, error_bound, 1.0, interpret, dct_precision
    )
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


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def fused_encode_pipeline_dpk(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    cape: int,
    interpret: bool = False,
    dct_precision: str = "highest",
):
    """Fused kernel + single-sort DPK coding: the whole EC device encode in
    one program. The AC and exception compactions share one chunk sort
    (idpack.pack_ids_with_ac) — streams byte-identical to
    fused_encode_pipeline + idpack.pack_ids, at roughly half the device
    time (the two full-array sorts were the encode cost center).

    Returns (width, packed, exc_rows, exc_counts, ac_rows, ac_counts, dc,
    overflow)."""
    from . import idpack

    ids, dcac = fused_encode_ec(
        x, sf, error_bound, 1.0, interpret, dct_precision
    )
    return idpack.pack_ids_with_ac(
        ids, dcac, x.shape[0], idpack.B_DEFAULT, cape
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def fused_encode_pipeline_dpk_ec(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    cape: int,
    n_true: int,
    verify: bool,
    brsf: float = 1.0,
    dct_precision: str = "highest",
):
    """Single-kernel EC DPK encode (ops/dpk_fuse.encode_x_fused): DCT +
    quantize + optional in-kernel verify-repair + pack/compact in ONE
    Pallas program. Streams byte-identical to fused_encode_pipeline_dpk
    (verify=False) / pipeline+_repair_fused+pack (verify=True); the extra
    `ok` output is the verified-bound flag.

    Returns (width, packed, exc_rows, exc_counts, ac_rows, ac_counts, dc,
    overflow, ok)."""
    from ..core.quantize import chunk_width
    from ..ops.repair import _SLACK
    from . import dpk_fuse

    n_pad = x.shape[0]
    cw = chunk_width(n_pad, BS)
    flat_pos = jnp.arange(n_pad)
    xv_max = jnp.max(jnp.where(flat_pos < n_true, x, -jnp.inf))
    xv_min = jnp.min(jnp.where(flat_pos < n_true, x, jnp.inf))
    tol = (xv_max - xv_min) * jnp.asarray(error_bound, x.dtype) * _SLACK
    return dpk_fuse.encode_x_fused(
        x, sf, tol, n_true, error_bound, min(cape, cw), cw, verify,
        brsf=brsf, dct_precision=dct_precision,
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def fused_encode_pipeline_dpk_qt_v2(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    cape: int,
    n_true: int,
    verify: bool,
    brsf: float = 1.0,
    dct_precision: str = "highest",
):
    """QT twin of fused_encode_pipeline_dpk_ec: the qmax pass reduces the
    global qtable (pass 1), then ONE x-input kernel does the renormalizing
    quantization + optional in-kernel verify-repair + pack/compact
    (ops/dpk_fuse.encode_x_fused with a qtable input). Streams
    byte-identical to fused_encode_pipeline_dpk_qt / pipeline+repair+pack.

    Returns (width, packed, exc_rows, exc_counts, ac_rows, ac_counts, dc,
    overflow, ok, qtable) — qtable slot 0 already patched with the last
    block's DC (the reference quirk)."""
    from ..core.quantize import chunk_width
    from ..ops.repair import _SLACK
    from . import dpk_fuse

    n_pad = x.shape[0]
    assert n_pad % (LANES * 8) == 0, n_pad
    rows = n_pad // LANES
    tile_r = next(t for t in (512, 256, 128, 64, 32, 16, 8) if rows % t == 0)
    grid = rows // tile_r
    half = C.NBINS // 2
    w = error_bound * 2.0 * brsf
    rmax = (half * 2 + 1) * (error_bound * brsf)
    qtf = 10.0 if C.NBINS == 255 else 2000.0
    geom = jnp.asarray([-rmax, rmax, w, error_bound, qtf], jnp.float32)
    bd = jnp.asarray(_blockdiag_np(BS, LANES // BS, True), jnp.float32)
    sf1 = sf.reshape(1).astype(jnp.float32)
    # interpret follows the x-kernel's hook (dpk_fuse._INTERPRET): this
    # pass always precedes dpk_fuse.encode_x_fused in the same dispatch
    qtable = _qtable_pass(
        x.reshape(rows, LANES), sf1, geom, bd, tile_r, grid,
        dpk_fuse._INTERPRET, dct_precision == "high",
    )

    cw = chunk_width(n_pad, BS)
    flat_pos = jnp.arange(n_pad)
    xv_max = jnp.max(jnp.where(flat_pos < n_true, x, -jnp.inf))
    xv_min = jnp.min(jnp.where(flat_pos < n_true, x, jnp.inf))
    tol = (xv_max - xv_min) * jnp.asarray(error_bound, x.dtype) * _SLACK
    out = dpk_fuse.encode_x_fused(
        x, sf, tol, n_true, error_bound, min(cape, cw), cw, verify,
        qtable, qtf, brsf, dct_precision,
    )
    qtable = qtable.at[0].set(out[6][-1])
    return out + (qtable,)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def fused_encode_pipeline_dpk_qt(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    cape: int,
    interpret: bool = False,
    dct_precision: str = "highest",
):
    """QT twin of fused_encode_pipeline_dpk; appends the (64,) qtable
    (slot 0 already patched with the last block's DC)."""
    from . import idpack

    ids, dcac, qtable = fused_encode_qt(
        x, sf, error_bound, 1.0, interpret, dct_precision
    )
    out = idpack.pack_ids_with_ac(
        ids, dcac, x.shape[0], idpack.B_DEFAULT, cape
    )
    qtable = qtable.at[0].set(out[6][-1])
    return out + (qtable,)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def fused_encode_pipeline_qt(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    capc: int | None = None,
    interpret: bool = False,
    dct_precision: str = "highest",
):
    """QT twin of fused_encode_pipeline; adds the (64,) qtable output
    (slot 0 already patched with the last block's DC)."""
    from ..core.quantize import chunk_width
    from . import compaction as cp

    ids, dcac, qtable = fused_encode_qt(
        x, sf, error_bound, 1.0, interpret, dct_precision
    )
    n = x.shape[0]
    dc = dcac[:, 0]
    qtable = qtable.at[0].set(dc[-1])
    col = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1)
    esc = (ids == C.ESCAPE) & (col >= 1)
    cw = chunk_width(n, BS)
    ac_chunks, counts, overflow = cp.compact_chunked(
        esc.reshape(-1),
        dcac.reshape(-1),
        cw,
        min(capc or cp.CAPC, cw),
    )
    return ids, dc, ac_chunks, counts, overflow, qtable
