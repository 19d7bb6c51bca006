"""Fused Pallas TPU kernel: DPK unpack -> dequantize -> IDCT, one HBM pass.

Replaces the XLA device-decode chain for DPK containers (idpack.unpack_ids +
quantize.decode + transform.inverse — the mirror of the reference's
dctz-decomp-lib.c:389-483 plus our DPK unpacking, which the reference does
not have). The XLA chain costs ~71 ms per 128 MB on a v5e-class chip; the
dominant term is the two chunk-expansion one-hots (ops/compaction.py
expand_chunked), whose (nchunks, cw, capc) iota-compare operand XLA
materializes in HBM (~17 GB of traffic at bench shapes, measured 47 ms in
isolation). This kernel keeps every intermediate in VMEM. Per grid step a
slab of TPT DPK tiles (TPT * B blocks) flows through:

  * byte-gather unpack of the per-position packed rows at every candidate
    width via one constant one-hot matmul (MXU; Mosaic supports neither the
    minor-dim reshapes nor the strided slices a shift-based unpack needs).
    0/1-weight matmuls over bytes run at DEFAULT (bf16) precision — both
    operands are exact in bf16 and accumulation is f32, so the result is
    exact at single-pass speed.
  * per-position width select + exception-marker detection (VPU)
  * ONE int32 transpose per tile to block-major (the same single-transpose
    trick as ops/idpack.py — sub-word transposes are ~10x slower)
  * chunk-local rank = prefix-sum via two small triangular 0/1 matmuls
    (Mosaic has no cumsum lowering; counts <= cw are exact in f32)
  * exception + AC restore as a rank-3 one-hot contraction
    (jax.lax.dot_general contracting the capacity axis, no batch dims —
    lowers to one real (rows*bs, cap) @ (cap, nc) MXU matmul) followed by a
    per-row chunk-select reduce; each output element receives exactly one
    term, so f32 HIGHEST arithmetic is exact. The one-hot lives only in
    VMEM, one tile at a time.
  * closed-form zigzag centers, DC insert, IDCT as one batched
    (TPT*B, bs) @ (bs, bs) MXU matmul at HIGHEST precision, unscale (VPU)

Geometry requirements (else callers keep the XLA chain): bs == 64, f32
working dtype, chunk width cw | B*bs with cw % bs == 0, and both capacity
axes (exception cape, AC capc) <= 128 — decompress re-pads both streams to
the smallest {32, 64, 128} tier that fits, so this only excludes the
overflow-retry capacity cw. QT mode renormalizes in f32 — equal to the XLA
path when x64 is off (the TPU case); with x64 the XLA path uses f64
intermediates and streams can differ by 1 ulp (docs/numerics.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import constants as C

BS = 64  # DCT block size (container invariant)
TPT = 4  # tiles per grid step (amortizes per-step overhead; higher values
# inflate Mosaic compile time ~linearly — 8 measured > 5 min remote)
_HI = jax.lax.Precision.HIGHEST
_WIDTHS = (1, 2, 3, 4)

# Test hooks: _FORCE overrides the gate entirely; _INTERPRET runs the
# kernel in Pallas interpret mode (CPU).
_FORCE: bool | None = None
_INTERPRET: bool = False

# Measured on the real chip (32Mi climate f32, amortized 8-chained
# iterations): this kernel decodes 128 MB in ~144 ms vs ~33 ms for the XLA
# chain it was meant to replace (idpack.unpack_ids + quantize.decode +
# transform.inverse) — the hand scheduling loses to XLA's fusion of the
# same one-hot contractions at this geometry. Default OFF until a
# multi-tile/layout rework beats the chain; the kernel stays correct
# (interpret-mode stream-equality tests) and opt-in via _FORCE = True.
_DEFAULT_ON = False


def enabled() -> bool:
    """Dispatch gate: _FORCE override, else the measured default (see
    _DEFAULT_ON note) on TPU-like backends only."""
    if _FORCE is not None:
        return _FORCE
    if not _DEFAULT_ON:
        return False
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat not in ("cpu", "gpu")


def _gather_consts_np(b: int) -> tuple[np.ndarray, np.ndarray]:
    """Byte-gather one-hots + shift table for the in-kernel unpack.

    Returns (gat (b//2, 5*b) f32, sh (8, b) i32). Column layout of `gat`:
    4 blocks of b columns = byte (k*wb)//8 for wb in 1..4, then b columns =
    byte (k*3)//8 + 1 (the straddle byte — only width 3 crosses a byte
    boundary for <=4-bit fields). sh rows 0..3 hold (k*wb) % 8; rows 4..7
    pad the sublane tile."""
    cap = b // 2
    gat = np.zeros((cap, 5 * b), np.float32)
    sh = np.zeros((8, b), np.int32)
    k = np.arange(b)
    for wi, wb in enumerate(_WIDTHS):
        byte0 = (k * wb) // 8
        gat[byte0, wi * b + k] = 1.0
        sh[wi, :] = (k * wb) % 8
    byte1 = np.minimum((k * 3) // 8 + 1, cap - 1)
    gat[byte1, 4 * b + k] = 1.0
    return gat, sh


_LO = 16  # rank = hi*_LO + lo decomposition (cf. compaction.expand_chunked)


def _expand_tile(maskf, rows_h, ltri, utri, chsel, bs):
    """Chunk-compacted values back to the masked positions of one tile.

    maskf (b, bs) f32 0/1; rows_h = list of (nc, _LO) capacity-row slices,
    one per hi digit (rows_h[h][c, lo] = vals[c, h*_LO + lo]); chsel
    (b, nc) row->chunk selector. Returns (b, bs) f32, exact: rank = (#
    masked before, row-major, within the chunk) via two 0/1 tri matmuls;
    per hi digit, a 2D chunk-select matmul then ONE batched (b)x(bs,_LO)@
    (_LO,) contraction (the only dot_general forms Mosaic lowers — rank-3
    operands with two free dims or two contracted dims fail
    infer-vector-layout), selected by the hi one-hot on the VPU. The
    decomposition keeps every materialized one-hot _LO (not cap) columns
    wide — the full-capacity variant measured ~3.5x slower end-to-end."""
    b = maskf.shape[0]
    # counts are small integers: 0/1 x 0/1 products with f32 accumulation
    # are exact at DEFAULT (single-pass bf16) speed
    full = jnp.dot(ltri, maskf, preferred_element_type=jnp.float32)
    f = jnp.sum(full, axis=1, keepdims=True)  # (b, 1) rows-before count
    p = jnp.dot(maskf, utri, preferred_element_type=jnp.float32)
    rank = (f + p).astype(jnp.int32) - 1  # (b, bs)
    rank = jnp.where(maskf > 0, rank, -1)  # -1: lo digit 15 can match
    # spuriously but hi -1 (arithmetic shift) never does -> reads 0

    ohl = (
        (rank & (_LO - 1))[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (b, bs, _LO), 2)
    ).astype(jnp.float32)
    rh = rank >> 4
    out = jnp.zeros((b, bs), jnp.float32)
    for h, rows in enumerate(rows_h):
        rowsv = jnp.dot(chsel, rows, preferred_element_type=jnp.float32)
        t2 = jax.lax.dot_general(
            ohl, rowsv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (b, bs): exactly one lo term; valid only where rh == h
        out = out + jnp.where(rh == h, t2, 0.0)
    return out


def _kernel(
    sf_ref,
    geom_ref,
    wthr_ref,
    packed_ref,
    exc_ref,
    ac_ref,
    dc_ref,
    gat_ref,
    sh_ref,
    basis_ref,
    qt_ref,
    spl_e_ref,
    spl_c_ref,
    x_ref,
    *,
    b: int,
    cw: int,
    cape: int,
    capc: int,
    tpt: int,
    qt_mode: bool,
):
    bs = BS
    bpc = cw // bs  # blocks per compaction chunk
    nc = (b * bs) // cw  # chunks per tile
    rows = tpt * b  # blocks per grid step
    w_bin = geom_ref[0]
    rmin = geom_ref[1]
    rmax = geom_ref[2]
    eb = geom_ref[3]
    qtf = geom_ref[4]

    # --- unpack every candidate width for ALL tiles in the step at once
    # (u8 -> i32 -> f32: Mosaic has no direct u8->f32 cast)
    pk = packed_ref[:].astype(jnp.int32).astype(jnp.float32)  # (tpt*bs, b/2)
    wide = jnp.dot(pk, gat_ref[:], preferred_element_type=jnp.float32).astype(
        jnp.int32
    )  # (tpt*bs, 5b); bytes <= 255 and 0/1 weights are exact in bf16
    w_col = wthr_ref[:]  # (tpt*bs, 1) per-position widths
    nib = jnp.zeros((tpt * bs, b), jnp.int32)
    for wi, wb in enumerate(_WIDTHS):
        v = wide[:, wi * b : (wi + 1) * b]
        if wb == 3:  # the only width whose 3-bit fields straddle bytes
            v = v | (wide[:, 4 * b : 5 * b] << 8)
        cand = (v >> sh_ref[wi, :][None, :]) & ((1 << wb) - 1)
        nib = jnp.where(w_col == wb, cand, nib)

    # exception markers: value == (1<<w)-1 (w=0 tiles decode to all-zero)
    thr = jnp.where(w_col > 0, (1 << w_col) - 1, jnp.int32(-1))
    comb = nib | (jnp.where(nib == thr, 1, 0) << 8)

    # one int32 transpose per tile -> block-major (rows, bs)
    comb_bm = jnp.concatenate(
        [
            jnp.swapaxes(comb[ti * bs : (ti + 1) * bs, :], 0, 1)
            for ti in range(tpt)
        ],
        axis=0,
    )
    mask_exc = comb_bm >= 256
    nib_bm = comb_bm & 255

    # --- constant patterns (VPU-built each step; tiny)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    ltri = ((row_i // bpc == col_i // bpc) & (col_i < row_i)).astype(
        jnp.float32
    )
    cpre_r = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    cpre_c = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    utri = (cpre_r <= cpre_c).astype(jnp.float32)
    ch_r = jax.lax.broadcasted_iota(jnp.int32, (b, nc), 0)
    ch_c = jax.lax.broadcasted_iota(jnp.int32, (b, nc), 1)
    chsel = jnp.where(ch_r // bpc == ch_c, 1.0, 0.0)

    # --- per-tile expansions (VMEM-bounded), batched everything after
    excf = mask_exc.astype(jnp.float32)
    # pre-split the capacity rows by rank digit via one-term selector
    # matmuls (constant (cap, _LO) slices of the identity)
    exc_f = exc_ref[:].astype(jnp.int32).astype(jnp.float32)
    ac_f = ac_ref[:]
    he = cape // _LO
    hc = capc // _LO
    exc_h = [
        jnp.dot(exc_f, spl_e_ref[h], preferred_element_type=jnp.float32)
        for h in range(he)
    ]
    ac_h = [
        jnp.dot(ac_f, spl_c_ref[h], preferred_element_type=jnp.float32)
        for h in range(hc)
    ]
    ids_parts = []
    ac_parts = []
    colb_t = jax.lax.broadcasted_iota(jnp.int32, (b, bs), 1)
    for ti in range(tpt):
        rsl = slice(ti * b, (ti + 1) * b)
        csl = slice(ti * nc, (ti + 1) * nc)
        exc_val = _expand_tile(
            excf[rsl], [r[csl] for r in exc_h], ltri, utri, chsel, bs
        )  # id bytes <= 255: exact in f32
        ids_t = jnp.where(
            mask_exc[rsl], exc_val.astype(jnp.int32), nib_bm[rsl]
        )
        esc_t = (ids_t == C.ESCAPE) & (colb_t >= 1)
        ac_parts.append(
            _expand_tile(
                esc_t.astype(jnp.float32),
                [r[csl] for r in ac_h],
                ltri,
                utri,
                chsel,
                bs,
            )
        )
        ids_parts.append(ids_t)
    ids = jnp.concatenate(ids_parts, axis=0)  # (rows, bs)
    ac_val = jnp.concatenate(ac_parts, axis=0)

    colb = jax.lax.broadcasted_iota(jnp.int32, (rows, bs), 1)
    esc = (ids == C.ESCAPE) & (colb >= 1)
    if qt_mode:
        # invert the renormalization by stored-value sign
        # (dctz-decomp-lib.c:401-413); f32 — see module docstring
        qrow = qt_ref[:]  # (1, bs)
        side = jnp.where(ac_val > 0, rmax, rmin)
        ac_val = ((ac_val - side) / (eb * qtf)) * qrow

    # closed-form zigzag centers (core/binning.py:52-57)
    k = ids // 2
    tmp = jnp.where(ids % 2 == 1, k + 1, -k)
    centers = tmp.astype(jnp.float32) * w_bin
    coeffs = jnp.where(esc, ac_val, centers)
    coeffs = jnp.where(colb == 0, dc_ref[:], coeffs)  # dc_ref is (rows, 1)

    x = jnp.dot(
        coeffs, basis_ref[:], preferred_element_type=jnp.float32, precision=_HI
    )
    x_ref[:] = x * sf_ref[0]


def eligible(
    work_dtype, bs: int, b: int, cw: int, cape: int, capc: int
) -> bool:
    """Geometry gate — callers fall back to the XLA chain when False."""
    return (
        jnp.dtype(work_dtype) == jnp.float32
        and bs == BS
        and b % 2 == 0
        and cw % bs == 0
        and (b * bs) % cw == 0
        # capacity tiers are {32, 64, 128}: the hi/lo rank decomposition
        # needs a multiple of the 16-wide lo digit
        and 0 < cape <= 128
        and 0 < capc <= 128
        and cape % _LO == 0
        and capc % _LO == 0
    )


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 11))
def fused_decode_dpk(
    width: jax.Array,  # (T, bs) uint8/int32 per-tile-position widths
    packed: jax.Array,  # (T*bs, b//2) uint8 capacity rows
    exc_rows: jax.Array,  # (nchunks, cape) uint8, zero-padded rows ok
    dc: jax.Array,  # (nblk,) f32
    ac_rows: jax.Array,  # (nchunks, capc) f32
    sf: jax.Array,  # scalar f32
    n_stream: int,
    b: int,
    cw: int,
    cfg,
    qtable: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Full fused device decode of a DPK id stream -> flat (n_stream,) f32.

    Pads the width/packed/chunk/dc arrays to whole grid steps (zero-width
    padding tiles decode to zeros and select nothing); the caller slices
    [:n]. Mirrors _decode_device_dpk's XLA chain exactly (stream-equality
    tested in tests/test_fused_decode.py)."""
    bs = BS
    t = width.shape[0]
    nblk = n_stream // bs
    assert n_stream % bs == 0, n_stream
    nc_t = (b * bs) // cw
    cape = exc_rows.shape[1]
    capc = ac_rows.shape[1]
    assert eligible(jnp.float32, bs, b, cw, cape, capc)

    tpt = TPT
    while t % tpt:
        tpt //= 2
    grid = t // tpt

    rows_needed = t * nc_t
    if exc_rows.shape[0] != rows_needed:
        exc_rows = jnp.pad(
            exc_rows, ((0, rows_needed - exc_rows.shape[0]), (0, 0))
        )
    if ac_rows.shape[0] != rows_needed:
        ac_rows = jnp.pad(
            ac_rows, ((0, rows_needed - ac_rows.shape[0]), (0, 0))
        )
    dc2 = dc.astype(jnp.float32)
    if dc2.shape[0] != t * b:
        dc2 = jnp.pad(dc2, (0, t * b - dc2.shape[0]))
    # column layouts: (rows, 1) blocks satisfy the (8k, 128|full) tile rule
    dc2 = dc2.reshape(t * b, 1)
    wcol = width.astype(jnp.int32).reshape(t * bs, 1)

    half = C.NBINS // 2
    eb = float(cfg.error_bound)
    w_bin = eb * 2.0 * cfg.brsf
    rmax = (half * 2 + 1) * (eb * cfg.brsf)
    qt_mode = cfg.mode == "qt" and qtable is not None
    geom = jnp.asarray(
        [w_bin, -rmax, rmax, eb, C.qt_factor(C.NBINS)], jnp.float32
    )
    gat_np, sh_np = _gather_consts_np(b)
    qt_in = (
        qtable.astype(jnp.float32).reshape(1, bs)
        if qt_mode
        else jnp.zeros((1, bs), jnp.float32)
    )
    spl_e = jnp.asarray(_split_const_np(cape))
    spl_c = jnp.asarray(_split_const_np(capc))

    x = pl.pallas_call(
        functools.partial(
            _kernel,
            b=b,
            cw=cw,
            cape=cape,
            capc=capc,
            tpt=tpt,
            qt_mode=qt_mode,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sf (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # geom (5,)
            pl.BlockSpec(
                (tpt * bs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tpt * bs, b // 2), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tpt * nc_t, cape), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tpt * nc_t, capc), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tpt * b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b // 2, 5 * b), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, bs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (cape // _LO, cape, _LO),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (capc // _LO, capc, _LO),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tpt * b, bs), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t * b, bs), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        sf.reshape(1).astype(jnp.float32),
        geom,
        wcol,
        packed,
        exc_rows,
        ac_rows.astype(jnp.float32),
        dc2,
        jnp.asarray(gat_np),
        jnp.asarray(sh_np),
        jnp.asarray(_idct_basis_np(), jnp.float32),
        qt_in,
        spl_e,
        spl_c,
    )
    return x.reshape(-1)[:n_stream]


def _split_const_np(cap: int) -> np.ndarray:
    """(cap//_LO, cap, _LO) selector stack: m[h][s, lo] = (s == h*_LO+lo).
    Indexed per hi digit in the kernel (leading-dim ref slicing)."""
    m = np.zeros((cap // _LO, cap, _LO), np.float32)
    s = np.arange(cap)
    m[s >> 4, s, s & (_LO - 1)] = 1.0
    return m


def _idct_basis_np() -> np.ndarray:
    from ...core.transform import _blockdiag_np

    return _blockdiag_np(BS, 1, False)
