"""Single-kernel DPK decode: packed id stream -> reconstructed samples.

Replaces the decode device chain (ops/idpack.unpack_ids -> quantize.decode ->
transform.inverse, reference role /root/reference/dctz-decomp-lib.c:244-483)
with ONE Pallas program gridded over DPK tiles (256 blocks = 16384 elements).
Each grid step holds the tile entirely in VMEM:

  1. unpack the four candidate bit widths from the packed bytes via
     byte-gather MATMULS (a 0/1 selection matrix on the MXU replaces the
     per-width strided byte addressing — bytes <= 255 are exact in bf16),
     then select per position row by the stored width.
  2. transpose tile-major nibbles to block-major with an identity-matmul
     (values <= 15, bf16-exact); regroup to chunk rows with strided
     sublane slices off a VMEM scratch (Mosaic cannot reshape
     (256,64)->(cpt,cw) directly).
  3. route the exception bytes and the AC escape values to their positions
     with the butterfly mirror network (ops/shuffle.route_expand) — the
     same streams the XLA chain expands, in the same chunk geometry.
  4. dequantize (closed-form zigzag centers), place the DC column (a
     one-hot HIGHEST matmul embeds the (cpt, g) DC rows at lane j%64==0),
     interleave chunk rows back to coefficient rows with a selection
     matmul, and run the inverse DCT as the SAME (128,128) block-diagonal
     HIGHEST matmul as transform.block_idct_flat — outputs are
     bit-identical to the XLA chain (tests/test_dpk_fuse.py).

Measured (v5e, 128 MB f32, K=64 amortized): the chain's unpack_ids (12.3 ms)
+ decode core (7.9 ms) collapse to ~3-4 ms — see docs/benchmarks.md.

Geometry gates (decode_eligible): block_size 64, tile_b 256, NBINS 255,
cw in {128,256,512,1024,2048}, float32 pipeline. Everything else falls back
to the XLA chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from . import shuffle

BS = 64  # DCT block size
TILE_B = 256  # blocks per DPK tile (idpack.B_DEFAULT)
TILE_N = TILE_B * BS  # elements per tile
#: format tiles per grid step in BOTH fused kernels (supertiling, round
#: 5): the per-step fixed cost is ~166 ns on v5e and separate tiles'
#: dependent roll chains interleave, so fewer/fatter steps are measurably
#: faster — streams stay bit-identical at every value (tests A/B tps).
#: Tuned on chip (tools/measure/ab_tps.py): verified encode 6.80 (tps=1)
#: -> 4.31 (4) -> 4.16 ms/128 MB (8); decode 5.95 -> 3.63 -> 3.46. EC and
#: QT verified round trips hardware-validated at 8.
TPS = 8
_BIG = 1 << 20  # python int: a jnp scalar here would be a captured constant

# Test hooks (cf. ops/shuffle.py)
_FORCE: bool | None = None
_INTERPRET = False


def enabled() -> bool:
    if _FORCE is not None:
        return _FORCE
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat not in ("cpu", "gpu")


def decode_eligible(cfg, dtype, tile_b: int, cw: int, qtable) -> bool:
    """Kernel geometry gate; ineligible containers use the XLA chain."""
    del qtable  # QT rides the same kernel (qrow input)
    return (
        cfg.block_size == BS
        and cfg.nbins == C.NBINS
        and tile_b == TILE_B
        and jnp.dtype(dtype) == jnp.float32
        and cw % 128 == 0
        and TILE_N % cw == 0
        and not jax.config.jax_enable_x64  # QT renorm runs f32 (TPU path)
    )


def _bf16(x):
    """u8/i32/bool -> bf16 via f32 (Mosaic cannot cast u8->bf16 directly).
    Exact for integers <= 256."""
    return x.astype(jnp.float32).astype(jnp.bfloat16)


def _dg(a, b, contract, precision=None):
    return jax.lax.dot_general(
        a,
        b,
        (contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _make_kernel(cw: int, cape: int, capc: int, qt: bool, tps: int = 1):
    g = cw // BS  # blocks per chunk row
    cpt = TILE_N // cw  # chunk rows per tile
    g128 = cw // 128

    def kernel(sf_ref, geom_ref, w_ref, packed_ref, exc_ref, ac_ref,
               dc_ref, bd_ref, *rest):
        qt_ref = rest[0] if qt else None
        scr = rest[-1]
        w_bin = geom_ref[0]
        rmin = geom_ref[1]
        rmax = geom_ref[2]
        denom = geom_ref[3]

        # ---- 1. unpack candidates (tile-major (64*tps, 256)) ----
        # the byte-gather matmuls and shift/mask math are row-wise, so tps
        # stacked tiles batch through them unchanged (supertiling — see
        # _pack_tile; the decode twin of the encode's round-5 change)
        byf = _bf16(packed_ref[:].astype(jnp.int32))  # (64*tps, 128)
        i128 = jax.lax.broadcasted_iota(jnp.int32, (128, TILE_B), 0)
        k256 = jax.lax.broadcasted_iota(jnp.int32, (128, TILE_B), 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, (BS * tps, TILE_B), 1)

        def gsel(sel):
            return _dg(byf, _bf16(sel), ((1,), (0,))).astype(jnp.int32)

        v4 = (gsel(i128 == k256 // 2) >> ((kk % 2) * 4)) & 15
        v2 = (gsel(i128 == k256 // 4) >> ((kk % 4) * 2)) & 3
        v1 = (gsel(i128 == k256 // 8) >> (kk % 8)) & 1
        a3 = gsel(i128 == (3 * k256) // 8)
        b3 = gsel(i128 == (3 * k256) // 8 + 1)
        s3 = (3 * kk) % 8
        v3 = ((a3 >> s3) | (b3 << (8 - s3))) & 7

        # per-row width: diagonal of the broadcast (no (64,1) transpose
        # op), per tile — the width row block is (8*tps, 64)
        eye_i = (
            jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 1)
        )
        w_rows = [
            w_ref[8 * p : 8 * p + 1, :].astype(jnp.int32) for p in range(tps)
        ]
        wt = jnp.concatenate(
            [
                jnp.sum(
                    jnp.broadcast_to(w, (BS, BS)) * eye_i.astype(jnp.int32),
                    axis=1,
                    keepdims=True,
                )
                for w in w_rows
            ],
            axis=0,
        )  # (64*tps, 1)
        nib_tm = jnp.where(wt == 1, v1, jnp.zeros_like(v1))
        nib_tm = jnp.where(wt == 2, v2, nib_tm)
        nib_tm = jnp.where(wt == 3, v3, nib_tm)
        nib_tm = jnp.where(wt == 4, v4, nib_tm)

        # ---- 2. transpose to block-major, regroup to (cpt*tps, cw) ----
        eye_b = _bf16(eye_i)
        for p in range(tps):
            tp = _dg(
                _bf16(nib_tm[BS * p : BS * (p + 1)]), eye_b, ((0,), (0,))
            )  # (256, 64)
            scr[TILE_B * p : TILE_B * (p + 1)] = tp.astype(jnp.int32)
        nib3 = jnp.concatenate(
            [scr[i::g, :] for i in range(g)], axis=1
        )  # (cpt*tps, cw) — tile-major rows (TILE_B % g == 0)

        thr3 = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.concatenate(
                        [
                            jnp.where(
                                w > 0, (1 << w) - 1, jnp.int32(_BIG)
                            )
                        ]
                        * g,
                        axis=1,
                    ),
                    (cpt, cw),
                )
                for w in w_rows
            ],
            axis=0,
        )
        mask3 = nib3 == thr3

        # ---- 3. butterfly expansions ----
        # Every AC escape is a DPK exception (its exc byte is ESCAPE), and
        # both streams are in positional order — so first expand the AC
        # values into the EXCEPTION-stream domain (width cape << cw), then
        # run ONE routing network carrying both payloads.
        exc_i = exc_ref[:].astype(jnp.int32)  # (cpt*tps, cape)
        colc = jax.lax.broadcasted_iota(jnp.int32, exc_i.shape, 1)
        esc_in_exc = (exc_i == C.ESCAPE).astype(jnp.int32)
        acx = shuffle.route_expand(esc_in_exc, ac_ref[:], colc)

        col3 = jax.lax.broadcasted_iota(jnp.int32, (cpt * tps, cw), 1)
        # exception bytes ride the control word's low 8 bits (one fewer
        # roll per stage); only the f32 AC payload rolls separately
        exc3, ac3 = shuffle.route_expand(
            mask3.astype(jnp.int32), (acx,), col3, byte_rows=exc_i
        )
        ids3 = jnp.where(mask3, exc3, nib3)
        dcpos = (col3 % BS) == 0
        esc3 = (ids3 == C.ESCAPE) & ~dcpos

        if qt:
            # invert the renormalization (quantize.decode:327-339, f32 path)
            side = jnp.where(ac3 > 0, rmax, rmin)
            qrow3 = jnp.broadcast_to(
                jnp.concatenate([qt_ref[:]] * g, axis=1), (cpt * tps, cw)
            )
            ac3 = ((ac3 - side) / denom) * qrow3

        # ---- 4. dequantize + DC + IDCT ----
        k2 = ids3 // 2
        cent = jnp.where(ids3 % 2 == 1, k2 + 1, -k2).astype(
            jnp.float32
        ) * w_bin
        co = jnp.where(esc3, ac3, cent)
        idc = jax.lax.broadcasted_iota(jnp.int32, (g, cw), 0)
        qdc = jax.lax.broadcasted_iota(jnp.int32, (g, cw), 1)
        e_dc = (qdc == BS * idc).astype(jnp.float32)
        dcx = _dg(
            dc_ref[:], e_dc, ((1,), (0,)), jax.lax.Precision.HIGHEST
        )  # (cpt*tps, cw), exact one-hot placement
        co = jnp.where(dcpos, dcx, co)

        # interleave chunk rows -> coefficient rows, per tile; the IDCT
        # runs ONCE over the stacked (128*tps, 128) coefficients
        rr = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        qq = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        r_sel = (
            (qq % cpt == rr // g128) & (qq // cpt == rr % g128)
        ).astype(jnp.float32)
        c2s = []
        for p in range(tps):
            cop = co[cpt * p : cpt * (p + 1)]
            stacked = jnp.concatenate(
                [cop[:, 128 * k : 128 * (k + 1)] for k in range(g128)],
                axis=0,
            )
            c2s.append(
                _dg(r_sel, stacked, ((1,), (0,)), jax.lax.Precision.HIGHEST)
            )
        c2 = c2s[0] if tps == 1 else jnp.concatenate(c2s, axis=0)
        # the SAME block-diagonal HIGHEST matmul as transform.block_idct_flat
        x = jnp.dot(
            c2,
            bd_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref = rest[-2]
        out_ref[:] = x * sf_ref[0]

    return kernel


def _ceil_lanes(c: int) -> int:
    return -(-c // 128) * 128


# ---------------------------------------------------------------------------
# encode: ids+dcac -> width/packed/exc/ac/counts/dc, one kernel
# (drop-in for idpack.pack_ids_with_ac, reference hot loop
# /root/reference/dctz-comp-lib.c:318-416)
# ---------------------------------------------------------------------------

_INF = 1 << 30


def encode_eligible(b: int, bs: int, cw: int, nbins: int = C.NBINS) -> bool:
    return (
        b == TILE_B
        and bs == BS
        and nbins == C.NBINS  # the kernel hardcodes the closed-form bins
        and cw % 128 == 0
        and TILE_N % cw == 0
    )


def _pack_tile(nib_tm, idsc, vals3, cw, cape_k, capc_k,
               w8_ref, pk_ref, exc_ref, ac_ref, cnt_ref, dc_ref,
               tps: int = 1):
    """Shared encode tile body: width selection, bit packing, unified
    butterfly compaction, counts, DC extraction. nib_tm is the TILE-major
    (64*tps, 256) nibble grid (tps tiles stacked along sublanes);
    idsc/vals3 the chunk-major (cpt*tps, cw) id/value grids (already
    validity-masked, tile-major row blocks).

    tps > 1 = SUPERTILING (round 5): several format tiles per grid step.
    Measured on v5e, the per-grid-step fixed cost is ~166 ns and the
    dependent roll chains of separate tiles interleave (ILP), so fewer,
    fatter steps cut the encode kernel's wall time substantially
    (tools/measure/probe_primitives.py: the 27-stage roll network alone
    goes 5.36 -> 3.47 ms/128 MB at tps=2). Streams are bit-identical —
    the per-row math never crosses tile rows."""
    g = cw // BS
    cpt = TILE_N // cw

    # width selection per position row (cost = w*B + 8*#exceptions,
    # first-minimal wins like jnp.argmin — idpack.pack_ids); rows of
    # stacked tiles batch through the same row-wise reductions.
    # The four threshold counts pack into TWO 16-bit-field sums (counts
    # <= TILE_B = 256 < 2^16, exact in i32) — 2 row reductions instead of
    # 5 (the max is redundant: all-zero row <=> count(>=1) == 0).
    ge1 = (nib_tm >= 1).astype(jnp.int32)
    ge3 = (nib_tm >= 3).astype(jnp.int32)
    ge7 = (nib_tm >= 7).astype(jnp.int32)
    ge15 = (nib_tm >= 15).astype(jnp.int32)
    sa = jnp.sum(ge1 | (ge7 << 16), axis=1, keepdims=True)
    sb = jnp.sum(ge3 | (ge15 << 16), axis=1, keepdims=True)
    cnts = {1: sa & 0xFFFF, 3: sb & 0xFFFF, 7: sa >> 16, 15: sb >> 16}
    best = jnp.where(cnts[1] == 0, 0, _INF)
    width = jnp.zeros_like(best)
    for wb in (1, 2, 3, 4):
        cost = wb * TILE_B + 8 * cnts[(1 << wb) - 1]
        take = cost < best
        width = jnp.where(take, wb, width)
        best = jnp.minimum(cost, best)

    # pack at each candidate width (a weighted 0/1 matmul builds the
    # bytes: byte i = sum of clipped values k with (k*w)//8 == i,
    # weighted 2^((k*w)%8); w=3 goes through 24-bit groups since a
    # value's bits can span two bytes), select per row
    kk = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, 128), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, 128), 1)
    packed = jnp.zeros((BS * tps, 128), jnp.int32)
    for wb in (1, 2, 4):
        w_mat = jnp.where(
            (kk * wb) // 8 == ii, 1 << ((kk * wb) % 8), 0
        )
        vclip = jnp.minimum(nib_tm, (1 << wb) - 1)
        pk = _dg(_bf16(vclip), _bf16(w_mat), ((1,), (0,))).astype(
            jnp.int32
        )
        packed = jnp.where(width == wb, pk, packed)
    k32 = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, 32), 0)
    g32 = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, 32), 1)
    w24_mat = jnp.where(k32 // 8 == g32, 1 << (3 * (k32 % 8)), 0)
    w24 = _dg(
        _bf16(jnp.minimum(nib_tm, 7)), _bf16(w24_mat), ((1,), (0,))
    )  # (64*tps, 32) f32, exact (< 2^24)
    gg = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
    g3 = ((gg == jj // 3) & (jj < 96)).astype(jnp.float32)
    w24g = _dg(w24, g3, ((1,), (0,)), jax.lax.Precision.HIGHEST)
    jl = jax.lax.broadcasted_iota(jnp.int32, (BS * tps, 128), 1)
    pk3 = (w24g.astype(jnp.int32) >> (8 * (jl % 3))) & 255
    packed = jnp.where(width == 3, pk3, packed)
    pk_ref[:] = packed.astype(jnp.uint8)

    # width row (1, 64) per tile back from its (64, 1) column via the
    # diagonal (sublane slices at 64-row boundaries are vreg-aligned)
    eye64 = (
        jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 1)
    ).astype(jnp.int32)
    w_rows = []
    for p in range(tps):
        w_row = jnp.sum(
            width[BS * p : BS * (p + 1)] * eye64, axis=0, keepdims=True
        )  # (1, 64)
        w_rows.append(w_row)
    w8_ref[:] = jnp.concatenate(
        [jnp.broadcast_to(w, (8, BS)) for w in w_rows], axis=0
    ).astype(jnp.uint8)

    nib3 = jnp.minimum(idsc, 15)
    thr3 = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.concatenate(
                    [
                        jnp.where(
                            w > 0, (1 << w) - 1, jnp.int32(_BIG)
                        )
                    ]
                    * g,
                    axis=1,
                ),
                (cpt, cw),
            )
            for w in w_rows
        ],
        axis=0,
    )
    mask3 = (nib3 >= thr3).astype(jnp.int32)

    excc = jnp.sum(mask3, axis=1, keepdims=True)  # (cpt*tps, 1)
    acc = jnp.sum(
        (idsc == C.ESCAPE).astype(jnp.int32), axis=1, keepdims=True
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (cpt * tps, 128), 1)
    cnt_ref[:] = jnp.where(
        lane == 0, excc, jnp.where(lane == 1, acc, 0)
    )

    col3 = jax.lax.broadcasted_iota(jnp.int32, (cpt * tps, cw), 1)
    exc_b, ac = shuffle.route_compact_unified(
        mask3, idsc, vals3, cape_k, capc_k, col3
    )
    exc_ref[:] = exc_b.astype(jnp.uint8)
    ac_ref[:] = ac

    # DC extraction: one-hot HIGHEST matmul (exact)
    dcpos = (col3 % BS) == 0
    dcv = jnp.where(dcpos, vals3, 0.0)
    qdc = jax.lax.broadcasted_iota(jnp.int32, (cw, g), 0)
    idc = jax.lax.broadcasted_iota(jnp.int32, (cw, g), 1)
    e_dc = (qdc == BS * idc).astype(jnp.float32)
    dc_ref[:] = _dg(dcv, e_dc, ((1,), (0,)), jax.lax.Precision.HIGHEST)


def _make_encode_kernel(cw: int, cape_k: int, capc_k: int):
    g = cw // BS

    def kernel(nv_ref, ids_ref, dcac_ref, w8_ref, pk_ref, exc_ref, ac_ref,
               cnt_ref, dc_ref, scr_i, scr_f):
        t = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, BS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, BS), 1)
        gpos = (t * TILE_B + row) * BS + col
        valid = (gpos < nv_ref[0]) & (col >= 1)
        ids_i = jnp.where(valid, ids_ref[:].astype(jnp.int32), 0)
        nib_bm = jnp.minimum(ids_i, 15)

        # tile-major nibbles via identity matmul (values <= 15, bf16-exact)
        eye256 = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_B, TILE_B), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (TILE_B, TILE_B), 1)
        )
        nib_tm = _dg(_bf16(nib_bm), _bf16(eye256), ((0,), (0,))).astype(
            jnp.int32
        )  # (64, 256)

        # chunk layout via scratch strided slices
        scr_i[:] = ids_i
        scr_f[:] = dcac_ref[:]
        idsc = jnp.concatenate([scr_i[i::g, :] for i in range(g)], axis=1)
        vals3 = jnp.concatenate([scr_f[i::g, :] for i in range(g)], axis=1)

        _pack_tile(nib_tm, idsc, vals3, cw, cape_k, capc_k,
                   w8_ref, pk_ref, exc_ref, ac_ref, cnt_ref, dc_ref)

    return kernel


def _dot_bf16x3(a, b):
    """3-pass bf16x3 matmul == lax.Precision.HIGH, written out because
    Mosaic's dot lowering only accepts DEFAULT/HIGHEST. Error ~2^-21
    relative — the relaxed-analysis budget in the L2 screen covers it."""
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(p, q):
        return jax.lax.dot_general(
            p, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return d(a_hi, b_lo) + d(a_lo, b_hi) + d(a_hi, b_hi)


def _make_encode_x_kernel(
    cw: int, cape_k: int, capc_k: int, verify: bool, qt: bool,
    relaxed: bool = False, tps: int = 1,
):
    """EC/QT encode from raw samples: scale -> DCT -> quantize (mirror of
    ops/fused_encode._kernel / _kernel_qt) -> optional in-kernel
    verify-repair (mirror of ops/repair.verify_repair: two fixed
    force-escape passes + final check, QT floor included) -> the shared
    pack/compact tile body. One HBM pass for the whole guaranteed-bound
    encode. QT mode takes the (already globally-reduced) qtable as an
    input and renormalizes escapes exactly like the two-pass XLA path;
    forced-escape side is chosen by SIGN (repair._stored_dense semantics —
    identical to the out-of-range side for natural escapes).

    tps: format tiles per grid step (supertiling, see _pack_tile) — all
    row-wise math batches over the stacked tiles; only the per-tile
    transpose below loops."""
    g128 = cw // 128
    half = C.NBINS // 2
    R = 128 * tps  # sample rows per grid step

    def kernel(np_ref, nv_ref, sf_ref, geom_ref, x_ref, bdf_ref, bdi_ref,
               *rest):
        if qt:
            qt_ref = rest[0]
            rest = rest[1:]
        (w8_ref, pk_ref, exc_ref, ac_ref, cnt_ref, dc_ref, ok_ref,
         scr_i, scr_f, ok_s) = rest
        t = pl.program_id(0)
        rmin = geom_ref[0]
        rmax = geom_ref[1]
        w = geom_ref[2]
        tol = geom_ref[3]
        eb = geom_ref[4]
        qtf = geom_ref[5]

        xs = x_ref[:] / sf_ref[0]  # divide: reference semantics
        if relaxed:
            # cfg.dct_precision "high": 3-pass bf16x3 ANALYSIS only (Mosaic
            # has no HIGH lowering, so the decomposition is explicit) —
            # every reconstruction below stays HIGHEST, so verify still
            # measures exactly what the decoder will compute
            coef = _dot_bf16x3(xs, bdf_ref[:])
        else:
            coef = jnp.dot(
                xs, bdf_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (R, 128)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        gpos = (t * R + row) * 128 + col
        is_dc = (col % BS) == 0
        in_range = (coef >= rmin) & (coef <= rmax)

        def bin_of(v):
            lin = jnp.clip(
                ((v - rmin) / w).astype(jnp.int32), 0, C.NBINS - 1
            )
            return jnp.where(lin <= half, 2 * (half - lin), 2 * (lin - half) - 1)

        if qt:
            qrow = jnp.concatenate([qt_ref[0:1, :]] * 2, axis=1)  # (1, 128)
            side = jnp.where(coef > 0, rmax, rmin)
            # eb THEN qt_factor: the C rounding order (_kernel_qt)
            norm = ((coef / qrow) * eb) * qtf + side
            escape0 = ~in_range & ~is_dc
            eff = jnp.where(escape0, norm, coef)
            re_in = (eff >= rmin) & (eff <= rmax)
            ids = jnp.where(re_in & ~is_dc, bin_of(eff), C.ESCAPE)
            qt_floor = 3e-6 * jnp.abs(qrow)  # repair.verify_repair floor
        else:
            norm = coef  # EC stores the coefficient verbatim
            ids = jnp.where(in_range & ~is_dc, bin_of(coef), C.ESCAPE)
            qt_floor = jnp.zeros((1, 128), jnp.float32)

        if verify:
            ac_mask = ~is_dc & (gpos < np_ref[0])
            samp_valid = gpos < nv_ref[0]
            denom = eb * qtf

            def hat_of(ids_c):
                escape = ac_mask & (ids_c == C.ESCAPE)
                k2 = ids_c // 2
                cent = jnp.where(ids_c % 2 == 1, k2 + 1, -k2).astype(
                    jnp.float32
                ) * w
                if qt:
                    # stored = norm; the decoder inverts it (quantize.decode)
                    side_d = jnp.where(norm > 0, rmax, rmin)
                    esc_val = ((norm - side_d) / denom) * qrow
                else:
                    esc_val = coef
                hat = jnp.where(escape, esc_val, cent)
                return jnp.where(is_dc, coef, hat)

            def _blkmax(a):
                bl = jnp.max(a[:, :BS], axis=1, keepdims=True)
                br = jnp.max(a[:, BS:], axis=1, keepdims=True)
                return jnp.where(col < BS, bl, br)  # per-block, full grid

            def reconstruct(ids_c):
                hat = hat_of(ids_c)
                xhat = jnp.dot(
                    hat, bdi_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ) * sf_ref[0]
                err = jnp.abs(xhat - x_ref[:])
                err = jnp.where(samp_valid, err, 0.0)
                blk = _blkmax(err)
                e_ij = jnp.abs(coef - hat)
                return blk, e_ij

            # L2 screen (round 4, docs/verification.md): the IDCT basis is
            # orthonormal, so every sample's reconstruction error obeys
            # |(IDCT delta)_i| <= ||delta_block||_2 with delta = hat - coef.
            # Blocks whose sf*||delta||_2 sits inside the tolerance minus a
            # transform-rounding budget (32 eps * max|xs|, covering the
            # f32 DCT/IDCT round trip and the xs = x/sf rounding) need NO
            # reconstruct pass at all — the exact check + repair run only
            # on tiles the screen flags. VPU-only: two row reductions
            # replace the always-on IDCT matmul (~1.6 ms/128 MB).
            d0 = hat_of(ids) - coef
            d2 = d0 * d0
            s_l = jnp.sum(d2[:, :BS], axis=1, keepdims=True)
            s_r = jnp.sum(d2[:, BS:], axis=1, keepdims=True)
            l2b = jnp.where(col < BS, s_l, s_r)
            mxb = _blkmax(jnp.abs(xs))
            eps32 = jnp.float32(1.1920929e-07)
            # relaxed analysis widens the screen's transform-rounding
            # budget (bf16x3 forward rounding enters the stored escape
            # values); blocks that no longer fit the budget just take the
            # exact-reconstruct branch — the guarantee is unchanged
            budget = 1024.0 if relaxed else 32.0
            thr = tol / sf_ref[0] - budget * eps32 * mxb
            screened = l2b > thr * thr
            screened = screened | (thr <= 0.0)
            any_screen = jnp.max(jnp.where(screened, 1.0, 0.0))
            scr_i[:] = ids
            ok_s[0] = 1.0

            @pl.when(any_screen > 0.0)
            def _exact():
                blk0, _ = reconstruct(scr_i[:])
                any_viol = jnp.max(jnp.where(blk0 > tol, 1.0, 0.0))

                @pl.when(any_viol > 0.0)
                def _repair():
                    ids_r = scr_i[:]
                    for pass_floor in (w / 8, w * 1e-3):
                        blk, e_ij = reconstruct(ids_r)
                        floor = jnp.maximum(pass_floor, qt_floor)
                        force = (blk > tol) & ac_mask & (e_ij > floor)
                        ids_r = jnp.where(force, C.ESCAPE, ids_r)
                    blk, _ = reconstruct(ids_r)
                    scr_i[:] = ids_r
                    ok_s[0] = 1.0 - jnp.max(jnp.where(blk > tol, 1.0, 0.0))

            ids = scr_i[:]

            @pl.when(t == 0)
            def _init():
                ok_ref[:] = jnp.ones_like(ok_ref)

            ok_ref[:] = jnp.minimum(ok_ref[:], ok_s[0])
        else:

            @pl.when(t == 0)
            def _init():
                ok_ref[:] = jnp.ones_like(ok_ref)

        # validity mask for the streams (pack n_valid = the PADDED length,
        # matching fused_encode_pipeline_dpk's x.shape[0])
        ids_i = jnp.where((gpos < np_ref[0]) & ((col % BS) >= 1), ids, 0)
        nib = jnp.minimum(ids_i, 15)

        # tile-major (64*tps, 256): one selection matmul per tile (nibbles
        # <= 15). Roll the right half to lane offset 0 first — Mosaic
        # cannot concatenate slices with mismatched lane offsets along
        # sublanes. The roll runs once at full width (rolls over sliced
        # arrays crash Mosaic); the per-tile slices are sublane-aligned.
        hi_full = pltpu.roll(nib, BS, axis=1)[:, :BS]
        lo_full = nib[:, :BS]
        qi = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, TILE_B), 0)
        bi = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, TILE_B), 1)
        even = (bi % 2) == 0
        m_sel = ((even & (qi == bi // 2))
                 | (~even & (qi == 128 + bi // 2))).astype(jnp.int32)
        m_selb = _bf16(m_sel)
        tm_parts = []
        for p in range(tps):
            s_halves = jnp.concatenate(
                [lo_full[128 * p : 128 * (p + 1)],
                 hi_full[128 * p : 128 * (p + 1)]],
                axis=0,
            )
            tm_parts.append(
                _dg(_bf16(s_halves), m_selb, ((0,), (0,))).astype(
                    jnp.int32
                )
            )
        nib_tm = (
            tm_parts[0]
            if tps == 1
            else jnp.concatenate(tm_parts, axis=0)
        )

        # chunk-major (cpt, cw) via scratch strided slices. Stored values:
        # DC = the coefficient; QT escapes = the renormalized value
        # (repair._stored_dense, sign-side); EC escapes = the coefficient.
        scr_i[:] = ids_i
        if qt:
            stored = jnp.where((ids == C.ESCAPE) & ~is_dc, norm, coef)
            scr_f[:] = stored
        else:
            scr_f[:] = coef
        # the strided slices interleave tiles correctly at any tps: chunk
        # row j of the step is scratch row k + g128*j, and 128 % g128 == 0
        # keeps each tile's rows contiguous (tile-major chunk order)
        idsc = jnp.concatenate(
            [scr_i[k::g128, :] for k in range(g128)], axis=1
        )
        vals3 = jnp.concatenate(
            [scr_f[k::g128, :] for k in range(g128)], axis=1
        )

        _pack_tile(nib_tm, idsc, vals3, cw, cape_k, capc_k,
                   w8_ref, pk_ref, exc_ref, ac_ref, cnt_ref, dc_ref, tps)

    return kernel


def encode_x_fused(
    x: jax.Array,
    sf: jax.Array,
    tol: jax.Array,
    n_valid: int,
    cfg_eb: float,
    cape: int,
    cw: int,
    verify: bool,
    qtable: jax.Array | None = None,
    qt_factor: float = 10.0,
    brsf: float = 1.0,
    dct_precision: str = "highest",
):
    """Whole EC/QT device encode (optionally verified) from raw samples.

    x: flat, length a multiple of 1024 (api's pad quantum). qtable: the
    globally-reduced (64,) quantizer table enables QT mode. Returns
    (width, packed, exc_rows, exc_counts, ac_rows, ac_counts, dc,
    overflow, ok) with the same stream contract as
    idpack.pack_ids_with_ac; `ok` is the verified-bound flag (always True
    when verify=False).

    The grid runs TPS format tiles per step (supertiling — _pack_tile);
    the array pads to whole supertiles with zeros, whose streams slice
    off below. Streams are bit-identical at every tps."""
    from ..core.transform import _blockdiag_np
    import numpy as np

    n_pad = x.shape[0]
    t = -(-n_pad // TILE_N)
    g = cw // BS
    cpt = TILE_N // cw
    nblk = n_pad // BS
    nc = n_pad // cw
    cape = min(cape, cw)
    cape_k = min(cw, _ceil_lanes(cape))

    tps = min(TPS, t)
    t_pad = -(-t // tps) * tps
    xpad = t_pad * TILE_N - n_pad
    x2 = (jnp.pad(x, (0, xpad)) if xpad else x).reshape(t_pad * 128, 128)
    steps = t_pad // tps

    half = C.NBINS // 2
    w_bin = float(cfg_eb) * 2.0 * float(brsf)
    rmax = (half * 2 + 1) * (float(cfg_eb) * float(brsf))
    geom = jnp.stack(
        [
            jnp.asarray(-rmax, jnp.float32),
            jnp.asarray(rmax, jnp.float32),
            jnp.asarray(w_bin, jnp.float32),
            tol.astype(jnp.float32),
            jnp.asarray(float(cfg_eb), jnp.float32),
            jnp.asarray(float(qt_factor), jnp.float32),
        ]
    )
    bdf = jnp.asarray(_blockdiag_np(BS, 128 // BS, True), jnp.float32)
    bdi = jnp.asarray(_blockdiag_np(BS, 128 // BS, False), jnp.float32)
    np1 = jnp.asarray(n_pad, jnp.int32).reshape(1)
    nv1 = jnp.asarray(n_valid, jnp.int32).reshape(1)
    sf1 = sf.reshape(1).astype(jnp.float32)

    qt = qtable is not None
    kernel = _make_encode_x_kernel(
        cw, cape_k, cape_k, verify, qt, dct_precision == "high", tps
    )
    rep = lambda i: (0, 0)  # noqa: E731 — replicated blocks
    qt_specs = (
        [pl.BlockSpec((8, BS), rep, memory_space=pltpu.VMEM)] if qt else []
    )
    qt_args = (
        [jnp.broadcast_to(qtable.astype(jnp.float32)[None, :], (8, BS))]
        if qt
        else []
    )
    outs = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (128 * tps, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((128, 128), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), rep, memory_space=pltpu.VMEM),
        ] + qt_specs,
        out_specs=[
            pl.BlockSpec(
                (8 * tps, BS), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BS * tps, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cpt * tps, cape_k), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cpt * tps, cape_k), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cpt * tps, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cpt * tps, g), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, 128), rep, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad * 8, BS), jnp.uint8),
            jax.ShapeDtypeStruct((t_pad * BS, 128), jnp.uint8),
            jax.ShapeDtypeStruct((t_pad * cpt, cape_k), jnp.uint8),
            jax.ShapeDtypeStruct((t_pad * cpt, cape_k), jnp.float32),
            jax.ShapeDtypeStruct((t_pad * cpt, 128), jnp.int32),
            jax.ShapeDtypeStruct((t_pad * cpt, g), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((128 * tps, 128), jnp.int32),
            pltpu.VMEM((128 * tps, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(np1, nv1, sf1, geom, x2, bdf, bdi, *qt_args)
    w8, packed, exc_k, ac_k, cnts, dc3, okg = outs
    t_real = -(-nblk // TILE_B)
    width = w8[::8][:t_real]
    packed = packed[: t_real * BS]
    exc_rows = exc_k[:nc, :cape]
    ac_rows = ac_k[:nc, :cape]
    exc_counts = cnts[:nc, 0]
    ac_counts = cnts[:nc, 1]
    dc = dc3.reshape(-1)[:nblk]
    overflow = jnp.any(exc_counts > cape)
    ok = jnp.min(okg) > 0.5
    return (
        width,
        packed,
        exc_rows,
        exc_counts,
        ac_rows,
        ac_counts,
        dc,
        overflow,
        ok,
    )


def encode_fused(
    ids2d: jax.Array,
    dcac2d: jax.Array,
    n_valid,
    b: int,
    cape: int,
    cw: int,
):
    """Drop-in for idpack.pack_ids_with_ac on eligible geometry: one Pallas
    program per tile does nibble/width/pack + the unified butterfly
    compaction. Streams byte-identical (tests/test_dpk_fuse.py)."""
    nblk, bs = ids2d.shape
    t = -(-nblk // TILE_B)
    g = cw // BS
    cpt = TILE_N // cw
    nc = (nblk * bs) // cw
    cape = min(cape, cw)
    cape_k = min(cw, _ceil_lanes(cape))

    pad = t * TILE_B - nblk
    ids_p = jnp.pad(ids2d, ((0, pad), (0, 0))) if pad else ids2d
    dcac_p = jnp.pad(dcac2d, ((0, pad), (0, 0))) if pad else dcac2d
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)

    kernel = _make_encode_kernel(cw, cape_k, cape_k)
    outs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (TILE_B, BS), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_B, BS), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((8, BS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (BS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cpt, cape_k), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cpt, cape_k), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cpt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((cpt, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t * 8, BS), jnp.uint8),
            jax.ShapeDtypeStruct((t * BS, 128), jnp.uint8),
            jax.ShapeDtypeStruct((t * cpt, cape_k), jnp.uint8),
            jax.ShapeDtypeStruct((t * cpt, cape_k), jnp.float32),
            jax.ShapeDtypeStruct((t * cpt, 128), jnp.int32),
            jax.ShapeDtypeStruct((t * cpt, g), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_B, BS), jnp.int32),
            pltpu.VMEM((TILE_B, BS), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(nv, ids_p, dcac_p)
    w8, packed, exc_k, ac_k, cnts, dc3 = outs
    width = w8[::8]
    exc_rows = exc_k[:nc, :cape]
    ac_rows = ac_k[:nc, :cape]
    exc_counts = cnts[:nc, 0]
    ac_counts = cnts[:nc, 1]
    dc = dc3.reshape(-1)[:nblk]
    overflow = jnp.any(exc_counts > cape)
    return (
        width,
        packed,
        exc_rows,
        exc_counts,
        ac_rows,
        ac_counts,
        dc,
        overflow,
    )


def decode_fused(
    width: jax.Array,
    packed: jax.Array,
    exc_rows: jax.Array,
    ac_rows: jax.Array,
    dc: jax.Array,
    sf: jax.Array,
    cfg,
    cw: int,
    qtable: jax.Array | None,
) -> jax.Array:
    """Fused decode of a DPK container -> flat (T_pad*16384,) float32
    samples (the caller slices to the true n). Inputs are the same device
    arrays _decode_device_dpk receives; chunk/tile/supertile padding
    happens here (TPS tiles per grid step, the decode twin of the encode's
    supertiling — zero-padded tiles decode to zero blocks and slice off)."""
    from ..core.quantize import _geometry
    from ..core.transform import _blockdiag_np
    import numpy as np

    t, bs = width.shape
    assert bs == BS
    g = cw // BS
    cpt = TILE_N // cw
    tps = min(TPS, t)
    t_pad = -(-t // tps) * tps
    steps = t_pad // tps
    nc_pad = t_pad * cpt

    nc, cape = exc_rows.shape
    capc = ac_rows.shape[1]
    cape_k = min(cw, _ceil_lanes(cape))
    capc_k = min(cw, _ceil_lanes(capc))
    if t_pad != t:
        width = jnp.pad(width, ((0, t_pad - t), (0, 0)))
        packed = jnp.pad(packed, ((0, (t_pad - t) * BS), (0, 0)))
    exc = jnp.pad(
        exc_rows, ((0, nc_pad - nc), (0, cape_k - cape))
    )
    ac = jnp.pad(
        ac_rows.astype(jnp.float32),
        ((0, nc_pad - ac_rows.shape[0]), (0, capc_k - capc)),
    )
    dc3 = jnp.pad(dc.astype(jnp.float32), (0, t_pad * TILE_B - dc.shape[0]))
    dc3 = dc3.reshape(nc_pad, g)

    w_bin, rmin, rmax = _geometry(cfg, np.dtype(np.float32))
    denom = np.float32(float(cfg.error_bound)) * np.float32(cfg.qt_factor)
    geom = jnp.stack(
        [
            w_bin.astype(jnp.float32),
            rmin.astype(jnp.float32),
            rmax.astype(jnp.float32),
            jnp.asarray(denom, jnp.float32),
        ]
    )
    bd = jnp.asarray(_blockdiag_np(BS, 128 // BS, False), jnp.float32)
    sf1 = sf.reshape(1).astype(jnp.float32)

    qt = qtable is not None
    kernel = _make_kernel(cw, cape_k, capc_k, qt, tps)

    # Pallas requires block sublanes divisible by 8: replicate the per-tile
    # width row to 8 sublanes (tiny) instead of a (1, 64) block.
    width8 = jnp.repeat(width.astype(jnp.uint8), 8, axis=0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (8 * tps, BS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (BS * tps, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (cpt * tps, cape_k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (cpt * tps, capc_k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (cpt * tps, g), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = [sf1, geom, width8, packed, exc, ac, dc3, bd]
    if qt:
        in_specs.append(
            pl.BlockSpec((1, BS), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(qtable.astype(jnp.float32).reshape(1, BS))

    x2 = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (128 * tps, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad * 128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_B * tps, BS), jnp.int32)],
        interpret=_INTERPRET,
    )(*args)
    return x2.reshape(-1)
