"""Fully-fused Pallas TPU encode for DPK containers: one HBM pass from raw
samples to coded streams (design-note Candidate C, docs/device-entropy-design.md).

Replaces the three-program device encode chain (fused_encode kernel ->
compact_chunked sort -> pack_ids transpose/pack) for the EC + DPK default
path. That chain writes and re-reads the full ids (1 B/elem) and dcac
(4 B/elem) arrays in HBM and pays a 512-wide bitonic sort; this kernel
reads x once and writes only the coded outputs (~0.4 B/elem). Per grid
step one DPK tile (B=256 blocks = 128 rows x 128 lanes) flows through:

  * scale + DCT-II block-diagonal matmul (MXU, HIGHEST — bf16 rounding
    would break the error bound; cf. ops/fused_encode.py)
  * zigzag bin ids + escape marks (VPU) — same closed forms as the XLA
    path (core/quantize.py), stream-equality tested
  * DC extraction as a (128, 2) matmul against a 2-column selector
    (lane slicing at offset 64 would force a relayout)
  * chunk-local rank for the escape/exception streams via triangular
    0/1 matmuls (no sort, no scatter: each chunk holds 4 consecutive
    rows, counts <= 512 exact in f32)
  * value compaction into (nc, capc) rows as a rank-decomposed one-hot
    contraction: out_r[r, lo, hi] = sum_j onehot_lo * (val*onehot_hi),
    chunk-reduced with a 0/1 selector matmul, then re-laid to slot order
    with a constant (16, 8, capc) one-term contraction. ranks >= capc
    simply drop (the counts overflow check triggers the caller's retry).
  * DPK width selection + packing in the transposed (position, block)
    layout: ONE int32 transpose per tile; packing is a constant-weight
    matmul per candidate width and block parity (byte m = sum of its
    fields shifted — every sum <= 255, exact in f32 with bf16-exact
    operands). Width-3 fields straddle bytes, so they pack via 24-bit
    group words (<= 2^24 - 1, f32-exact) scattered to byte columns with
    three constant selector matmuls.
  * exception bytes (original ids wherever nibble >= the tile marker)
    ride the same rank/contraction machinery in block-major order —
    byte-identical to ops/idpack.pack_ids.

Geometry: B=256 (idpack.B_DEFAULT), bs=64, cw=512 (compaction.CHUNK_W),
capc=cape=128. Anything else falls back to the unfused chain. Mirrors the
stream layout of the reference's three-pthread zlib stage replacement
(/root/reference/dctz-comp-lib.c:620-732) as coded by ops/idpack.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import constants as C
from ...core.transform import _blockdiag_np

BS = 64
B = 256  # blocks per DPK tile (idpack.B_DEFAULT)
LANES = 128
ROWS = B * BS // LANES  # 128 rows per tile (two blocks per row)
CW = 512  # compaction chunk width (4 rows)
NC = B * BS // CW  # 32 chunks per tile
CAP = 128  # capc == cape == 128 (the default tiers)
LO, HI_N = 16, CAP // 16
_HP = jax.lax.Precision.HIGHEST
_INF = 1 << 30

# Test hooks, mirroring ops/fused_decode.py: _FORCE overrides the gate
# entirely; _INTERPRET runs the kernel in Pallas interpret mode (CPU).
_FORCE: bool | None = None
_INTERPRET: bool = False

# Measured on the real chip (32Mi climate f32, amortized 8-chained
# iterations): 128 MB encodes in ~115 ms here vs ~32 ms for the
# three-program XLA chain (fused_encode_pipeline + compact + pack_ids) —
# the per-tile grid (2048 steps) and the scatter/pack matmul chains lose
# to XLA's fusion despite the lower HBM traffic. Default OFF until a
# rework beats the chain; correctness stays pinned by the interpret-mode
# stream-equality tests and the kernel is opt-in via _FORCE = True.
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


def _pack_consts_np() -> dict[str, np.ndarray]:
    """Constant operands for the in-kernel packing matmuls.

    we_/wo_[w]: (ROWS, LANES) byte weights for even/odd pair-parity blocks
    at width w in {1,2,4}: W[r, m] = 2^((k*w)%8) if (k*w)//8 == m (k = 2r
    or 2r+1). ge/go: the width-3 analogs onto 24-bit group words
    (W[r, g] = 2^((3k)%24) if k//8 == g). p0/p1/p2: (ROWS, LANES) byte-
    column scatter for the three bytes of each group (m = 3g + i)."""
    out = {}
    r = np.arange(ROWS)
    for w in (1, 2, 4):
        for name, k in (("we_%d" % w, 2 * r), ("wo_%d" % w, 2 * r + 1)):
            m = (k * w) // 8
            mat = np.zeros((ROWS, LANES), np.float32)
            mat[r, m] = 2.0 ** ((k * w) % 8)
            out[name] = mat
    for name, k in (("ge", 2 * r), ("go", 2 * r + 1)):
        g = k // 8
        mat = np.zeros((ROWS, LANES), np.float32)
        mat[r, g] = 2.0 ** ((3 * k) % 24)
        out[name] = mat
    g = np.arange(B * 3 // 24)  # 32 groups
    for i in range(3):
        mat = np.zeros((ROWS, LANES), np.float32)
        mat[g, 3 * g + i] = 1.0
        out["p%d" % i] = mat
    return out


def _slot_merge_np() -> np.ndarray:
    """(HI_N, LO, CAP) selector stack: m[h][lo, s] = (s == h*LO + lo).
    Applied per hi digit (Mosaic lowers only 2D and batched-3D dot_generals
    — see ops/fused_decode.py)."""
    m = np.zeros((HI_N, LO, CAP), np.float32)
    for hi in range(HI_N):
        for lo in range(LO):
            m[hi, lo, hi * LO + lo] = 1.0
    return m


def _tri_consts_np() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """ltri (ROWS, ROWS): same-chunk strictly-earlier rows; utri (LANES,
    LANES) inclusive in-row prefix; chunksel (NC, ROWS); dcsel (LANES, 2)."""
    r = np.arange(ROWS)
    ltri = ((r[None, :] // 4 == r[:, None] // 4) & (r[None, :] < r[:, None]))
    utri = (np.arange(LANES)[:, None] <= np.arange(LANES)[None, :])
    chunksel = (np.arange(ROWS)[None, :] // 4 == np.arange(NC)[:, None])
    dcsel = np.zeros((LANES, 2), np.float32)
    dcsel[0, 0] = 1.0
    dcsel[BS, 1] = 1.0
    return (
        ltri.astype(np.float32),
        utri.astype(np.float32),
        chunksel.astype(np.float32),
        dcsel,
    )


def _rank(maskf, ltri, utri):
    """Chunk-local rank of masked positions, block-major (ROWS, LANES)."""
    rs = jnp.sum(maskf, axis=1, keepdims=True)  # (ROWS, 1)
    f = jnp.dot(ltri, rs, preferred_element_type=jnp.float32)
    p = jnp.dot(maskf, utri, preferred_element_type=jnp.float32)
    rank = (f + p).astype(jnp.int32) - 1
    return jnp.where(maskf > 0, rank, -1), rs


def _scatter(rank, vals, chunksel, merge):
    """Compacted (NC, CAP) rows: chunk c's k-th masked value (row-major)
    lands in slot k. ranks >= CAP drop (counts flag the overflow). Every
    contraction is one-term (ranks unique per chunk) -> exact f32."""
    rl = rank & (LO - 1)
    rh = rank >> 4  # arithmetic: rank -1 -> hi -1, matches nothing
    ohl = (
        rl[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES, LO), 2)
    ).astype(jnp.float32)
    vh = jnp.where(
        rh[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES, HI_N), 2),
        vals[:, :, None],
        0.0,
    )
    # batch r, contract j -> (ROWS, HI_N, LO); <=1 real term per (hi, lo)
    out_r = jax.lax.dot_general(
        vh, ohl, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # chunk-reduce + slot re-lay per hi digit (2D matmuls only)
    out = jnp.zeros((NC, CAP), jnp.float32)
    for h in range(HI_N):
        slab = out_r[:, h, :].reshape(ROWS, LO)  # sublane slice
        out3_h = jnp.dot(
            chunksel, slab, preferred_element_type=jnp.float32
        )  # (NC, LO)
        out = out + jnp.dot(
            out3_h, merge[h], preferred_element_type=jnp.float32
        )
    return out


def _kernel(
    sf_ref,
    geom_ref,
    x_ref,
    bd_ref,
    tri_ref,  # (ROWS, ROWS) ltri
    utri_ref,  # (LANES, LANES)
    csel_ref,  # (NC, ROWS)
    dcsel_ref,  # (LANES, 2)
    merge_ref,  # (LO, HI_N, CAP)
    pk_ref,  # (11, ROWS, LANES) stacked packing consts
    width_ref,  # out (BS, 1) i32
    packed_ref,  # out (BS, LANES) i32
    exc_ref,  # out (NC, CAP) i32
    excn_ref,  # out (NC, 1) i32
    ac_ref,  # out (NC, CAP) f32
    acn_ref,  # out (NC, 1) i32
    dc_ref,  # out (ROWS, 2) f32
):
    rmin = geom_ref[0]
    rmax = geom_ref[1]
    w_bin = geom_ref[2]
    nbins = C.NBINS

    xs = x_ref[:] / sf_ref[0]
    coef = jnp.dot(xs, bd_ref[:], preferred_element_type=jnp.float32, precision=_HP)

    col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    is_dc = (col % BS) == 0
    in_range = (coef >= rmin) & (coef <= rmax)
    lin = jnp.clip(((coef - rmin) / w_bin).astype(jnp.int32), 0, nbins - 1)
    half = nbins // 2
    zz = jnp.where(lin <= half, 2 * (half - lin), 2 * (lin - half) - 1)
    ids = jnp.where(in_range & ~is_dc, zz, jnp.full_like(zz, C.ESCAPE))

    dc_ref[:] = jnp.dot(coef, dcsel_ref[:], preferred_element_type=jnp.float32, precision=_HP)

    # --- AC stream (escaped coefficients), chunk-compacted
    escape = ~in_range & ~is_dc
    ltri = tri_ref[:]
    utri = utri_ref[:]
    csel = csel_ref[:]
    merge = merge_ref[:]
    rank_ac, rs_ac = _rank(escape.astype(jnp.float32), ltri, utri)
    ac_ref[:] = _scatter(
        rank_ac, jnp.where(escape, coef, 0.0), csel, merge
    )
    acn_ref[:] = jnp.dot(
        csel, rs_ac, preferred_element_type=jnp.float32
    ).astype(jnp.int32)

    # --- DPK id packing (mirrors ops/idpack.pack_ids bit for bit)
    nib = jnp.where(is_dc, 0, jnp.minimum(ids, 15))
    nibT = jnp.swapaxes(nib, 0, 1)  # (pos*parity, pair) int32
    top = nibT[:BS]  # even blocks of each pair
    bot = nibT[BS:]  # odd blocks

    # width selection: cost(w) = w*B + 8 * #exceptions(w), first-min wins
    maxv = jnp.maximum(
        jnp.max(top, axis=1, keepdims=True),
        jnp.max(bot, axis=1, keepdims=True),
    )  # (BS, 1)
    best = jnp.where(maxv == 0, 0, _INF)
    width = jnp.zeros((BS, 1), jnp.int32)
    for wb in (1, 2, 3, 4):
        thr = (1 << wb) - 1
        cnt = jnp.sum(
            (top >= thr).astype(jnp.int32), axis=1, keepdims=True
        ) + jnp.sum((bot >= thr).astype(jnp.int32), axis=1, keepdims=True)
        cost = wb * B + 8 * cnt
        take = cost < best
        best = jnp.where(take, cost, best)
        width = jnp.where(take, wb, width)
    width_ref[:] = width

    topf = top.astype(jnp.float32)
    botf = bot.astype(jnp.float32)
    pk = pk_ref[:]
    packed = jnp.zeros((BS, LANES), jnp.float32)
    for wi, wb in enumerate((1, 2, 4)):
        thr = float((1 << wb) - 1)
        bytes_w = jnp.dot(
            jnp.minimum(topf, thr), pk[2 * wi],
            preferred_element_type=jnp.float32,
        ) + jnp.dot(
            jnp.minimum(botf, thr), pk[2 * wi + 1],
            preferred_element_type=jnp.float32,
        )
        packed = jnp.where(width == wb, bytes_w, packed)
    # width 3: 24-bit group words, then bytes to columns 3g+i
    words = jnp.dot(
        jnp.minimum(topf, 7.0), pk[6], preferred_element_type=jnp.float32
    ) + jnp.dot(jnp.minimum(botf, 7.0), pk[7], preferred_element_type=jnp.float32)
    wi32 = words.astype(jnp.int32)
    b3 = (
        jnp.dot((wi32 & 255).astype(jnp.float32), pk[8], preferred_element_type=jnp.float32)
        + jnp.dot(((wi32 >> 8) & 255).astype(jnp.float32), pk[9], preferred_element_type=jnp.float32)
        + jnp.dot(((wi32 >> 16) & 255).astype(jnp.float32), pk[10], preferred_element_type=jnp.float32)
    )
    packed = jnp.where(width == 3, b3, packed)
    packed_ref[:] = packed.astype(jnp.int32)

    # --- exception bytes (original ids where nibble >= marker), block-major
    thrT = jnp.where(width > 0, (1 << width) - 1, _INF)  # (BS, 1)
    # int32, not bool: Mosaic cannot legalize an i1 tpu.transpose (the
    # nibble transpose above is int32 for the same reason)
    exc_T = jnp.concatenate(
        [
            (top >= thrT).astype(jnp.int32),
            (bot >= thrT).astype(jnp.int32),
        ],
        axis=0,
    )
    exc_mask = jnp.swapaxes(exc_T, 0, 1) > 0  # back to (ROWS, LANES)
    rank_e, rs_e = _rank(exc_mask.astype(jnp.float32), ltri, utri)
    exc_ref[:] = _scatter(
        rank_e, jnp.where(exc_mask, ids, 0).astype(jnp.float32), csel, merge
    ).astype(jnp.int32)
    excn_ref[:] = jnp.dot(
        csel, rs_e, preferred_element_type=jnp.float32
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def fused_encode_dpk(
    x: jax.Array,
    sf: jax.Array,
    error_bound: float,
    interpret: bool = False,
):
    """EC encode straight to DPK streams; requires n % 1024 == 0 (the
    caller's tile quantum — same as fused_encode_ec).

    Returns (width (T, 64) u8, packed (T*64, 128) u8,
    exc_rows (nchunks, 128) u8, exc_counts (nchunks,) i32,
    ac_rows (nchunks, 128) f32, ac_counts (nchunks,) i32, dc (nblk,) f32)
    with nchunks = n // 512, nblk = n // 64 — identical layouts (and bytes)
    to fused_encode_pipeline + idpack.pack_ids at cape = capc = 128.
    """
    n = x.shape[0]
    assert n % (LANES * 8) == 0, n
    nblk = n // BS
    t = -(-nblk // B)
    pad = t * B * BS - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])

    half = C.NBINS // 2
    w_bin = error_bound * 2.0
    rmax = (half * 2 + 1) * error_bound
    geom = jnp.asarray([-rmax, rmax, w_bin], jnp.float32)
    bd = jnp.asarray(_blockdiag_np(BS, LANES // BS, True), jnp.float32)
    ltri, utri, csel, dcsel = (jnp.asarray(a) for a in _tri_consts_np())
    pkc = _pack_consts_np()
    pk = jnp.asarray(
        np.stack(
            [pkc[k] for k in (
                "we_1", "wo_1", "we_2", "wo_2", "we_4", "wo_4",
                "ge", "go", "p0", "p1", "p2",
            )]
        )
    )
    merge = jnp.asarray(_slot_merge_np())

    grid = t
    outs = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, ROWS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, ROWS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HI_N, LO, CAP), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((11, ROWS, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, CAP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, CAP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t * BS, 1), jnp.int32),
            jax.ShapeDtypeStruct((t * BS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((t * NC, CAP), jnp.int32),
            jax.ShapeDtypeStruct((t * NC, 1), jnp.int32),
            jax.ShapeDtypeStruct((t * NC, CAP), jnp.float32),
            jax.ShapeDtypeStruct((t * NC, 1), jnp.int32),
            jax.ShapeDtypeStruct((t * ROWS, 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(sf.reshape(1).astype(jnp.float32), geom, x.reshape(t * ROWS, LANES),
      bd, ltri, utri, csel, dcsel, merge, pk)

    width_c, packed, exc_rows, excn, ac_rows, acn, dc2 = outs
    nc_real = n // CW
    return (
        width_c.reshape(t, BS).astype(jnp.uint8),
        packed.astype(jnp.uint8),
        exc_rows[:nc_real].astype(jnp.uint8),
        excn.reshape(-1)[:nc_real],
        ac_rows[:nc_real],
        acn.reshape(-1)[:nc_real],
        dc2.reshape(-1)[:nblk],
    )
