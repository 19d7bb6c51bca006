"""Butterfly (monotone-routing) shuffle kernels for chunk-local streams.

Replaces the round-2 device chain's two data-movement work-horses — the
`lax.sort`-based chunk compaction (the encode cost center: 13.0 ms/128 MB
measured on v5e) and the one-hot-matmul expansion (9.0-15.5 ms depending on
capacity) — with Pallas kernels that route elements through log2(cw)
conditional shift stages held entirely in VMEM/registers:

  Stable chunk compaction moves the element at position i (the r-th masked
  element, r = rank) LEFT by d = i - r. d is non-decreasing in i and
  d[i] - d[i'] <= i - i' - 1 for masked i > i', so LSB-first conditional
  shifts by 2^k never collide: after the stages for bits 0..k, live
  positions are i - (d & (2^(k+1)-1)), and
  (d_i & m) - (d_i' & m) <= d_i - d_i' <= i - i' - 1 keeps them strictly
  increasing. Expansion runs the mirror network (MSB-first, shifting
  RIGHT); its intermediate occupancies are the forward pass's in reverse,
  so it is collision-free by the same argument. Both directions move values
  without arithmetic — outputs are BIT-IDENTICAL to the sort/one-hot paths
  (tests/test_shuffle.py asserts equality across densities and shapes).

Implementation notes (all measured on v5e, 32Mi elements, round 3):

  * An XLA-level butterfly loses badly (35 ms vs the sort's 13): every
    shift stage materializes full arrays in HBM. Only the in-kernel form
    wins — Pallas keeps all ~30 stage passes VMEM-resident.
  * The id byte rides the low 8 bits of the distance word
    (comb = d << 8 | byte) and liveness is the sign bit, so each stage
    rolls ONE control word (+ one f32 payload where needed), and `take` is
    derived from the already-rolled word — no separate mask rolls.
  * `pltpu.roll` is forward-only and 32-bit-only: left shift by s = roll by
    cw - s with the wrapped tail forced dead; bool/u8 values are carried as
    int32 inside the kernel (Mosaic cannot roll i1/i8 or cast u8->f32
    directly).
  * Mosaic crashes on rolls over mid-kernel *sliced* (narrower) arrays —
    every stage runs at full row width and outputs slice only at the final
    ref write. The unified kernel's second (tighten) pass therefore also
    runs at width cw, but its distances are < cape so only log2(cape)
    stages execute.

Measured: unified compact+tighten 5.9 ms (vs 13.0 + a second sort),
expansion 5.4 ms (vs 9.0-15.5 one-hot) per 32Mi f32 on v5e.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C

R_ROWS = 256  # chunk rows per grid step (R_ROWS x cw x ~6 arrays in VMEM)

# Test hooks (cf. ops/research/fused_decode.py): _FORCE overrides the
# backend gate, _INTERPRET runs the kernels interpreted (CPU CI).
_FORCE: bool | None = None
_INTERPRET = False


def enabled() -> bool:
    """Pallas shuffle on TPU-like backends; XLA sort/one-hot elsewhere."""
    if _FORCE is not None:
        return _FORCE
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat not in ("cpu", "gpu")


def eligible(cw: int) -> bool:
    """Kernel geometry gate: whole-vreg rows (capacities are padded to a
    lane multiple inside the wrappers)."""
    return cw % 128 == 0


def _kcap(capc: int, cw: int) -> int:
    """Kernel-facing capacity: a 128 multiple (slice back outside)."""
    return min(cw, -(-capc // 128) * 128)


# ---------------------------------------------------------------------------
# kernel building blocks
# ---------------------------------------------------------------------------


def _shl(a, s, col, cw, fill):
    r = pltpu.roll(a, cw - s, axis=1)  # forward-only roll: left by s
    return jnp.where(col < cw - s, r, jnp.full_like(r, fill))


def _shr(a, s, col, fill):
    r = pltpu.roll(a, s, axis=1)
    return jnp.where(col >= s, r, jnp.full_like(r, fill))


# Liveness encoding for the network control words (round 4): a LIVE bit at
# bit 30 instead of the old "dead = -1" sign convention. A dead word is ALL
# ZEROS, so the per-stage "does this element move" test collapses from
# (word >= 0) & (((word >> k) & 1) == 1)   [5 VPU ops]
# to
# (word & (1 << k)) != 0                   [2 VPU ops]
# — dead words have no bits set and can never move. ~20% fewer VPU ops per
# stage across all networks (the stages are the encode/decode cost center,
# docs/scaling.md). Outputs are bit-identical (tests/test_shuffle.py).
_LIVE = 1 << 30


def _stage_left(comb, vs, s, col, cw, bit):
    """One LEFT-shift stage on the control word + payloads. The roll-wrap
    mask is folded into the take test (tk is False on the wrapped tail), so
    each stage costs 1 roll + ~4 ops per payload-free word instead of the
    old roll + cmp + 2 wheres."""
    mv = (comb & bit) != 0
    cs = pltpu.roll(comb, cw - s, axis=1)
    tk = ((cs & bit) != 0) & (col < cw - s)
    vs = tuple(
        jnp.where(tk, pltpu.roll(v, cw - s, axis=1), v) for v in vs
    )
    comb = jnp.where(tk, cs, jnp.where(mv, 0, comb))
    return comb, vs


def _stage_right(comb, vs, s, col, bit):
    """Mirror stage shifting RIGHT (the expand phase-2 direction)."""
    mv = (comb & bit) != 0
    cs = pltpu.roll(comb, s, axis=1)
    tk = ((cs & bit) != 0) & (col >= s)
    vs = tuple(jnp.where(tk, pltpu.roll(v, s, axis=1), v) for v in vs)
    comb = jnp.where(tk, cs, jnp.where(mv, 0, comb))
    return comb, vs


_CUMSUM_MM = True  # inclusive prefix sum on the MXU (A/B hook; see below)


def _cumsum(m_i32, col, cw):
    """Inclusive prefix sum along lanes of a 0/1 mask.

    Default: ONE triangular 0/1 matmul on the MXU (counts <= cw <= 2048 are
    exact in the f32 accumulator) — replaces log2(cw) VPU roll+add stages,
    freeing the VPU for the routing stages that cannot leave it. The roll
    ladder remains as the fallback/AB arm."""
    if _CUMSUM_MM:
        i = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 1)
        tri = (i <= j).astype(jnp.float32).astype(jnp.bfloat16)
        mb = m_i32.astype(jnp.float32).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            mb,
            tri,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
    cum = m_i32
    s = 1
    while s < cw:
        r = pltpu.roll(cum, s, axis=1)
        cum = cum + jnp.where(col >= s, r, 0)
        s *= 2
    return cum


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def route_compact_unified(
    m_i32, idb_i32, vals, cape: int, capc: int, col, narrow_scr=None
):
    """Unified compact network on ARRAYS (shared by _k_compact_unified and
    ops/dpk_fuse.encode_fused): compact (id byte, value) by the exception
    mask, then tighten the values whose compacted byte is ESCAPE into the
    AC rows. Returns (exc_bytes (R, cape) i32, ac (R, capc) f32).

    narrow_scr is accepted for signature stability and IGNORED: a
    cape_k-lane tighten (scratch-realigned slice) was measured as a ~1 ms
    candidate but its Mosaic compile hangs on the real backend (round-4
    negative result — the tighten stays at full width).

    Round-4 roll diet: the old form routed the f32 value through the
    exception compact (2 rolls/stage) and then tightened the compacted
    escapes (2 more rolls/stage) — ~32 rolls. But stable routing preserves
    original order on BOTH paths, so the AC values can compact DIRECTLY
    from their original positions by the escape mask, and the exception
    network only needs its control word: log2(cw) single-roll stages for
    the ids + log2(cw) double-roll stages for the values = ~27 rolls, with
    the cape overflow cut applied via the exception RANK (identical to the
    old compact-position cut). Outputs are bit-identical (tests/
    test_shuffle.py, test_dpk_fuse.py)."""
    del narrow_scr
    cw = m_i32.shape[1]
    cum = _cumsum(m_i32, col, cw)
    d = col - (cum - 1)
    # phase A: exception ids only — the value does not ride the network
    comb = jnp.where(m_i32 != 0, _LIVE | (d << 8) | idb_i32, 0)
    k = 8
    s = 1
    while s < cw:
        comb, _ = _stage_left(comb, (), s, col, cw, 1 << k)
        k += 1
        s *= 2
    kv = (comb >= _LIVE) & (col < cape)
    exc_b = jnp.where(kv, comb & 255, 0)

    # phase B: AC values straight from original positions by the escape
    # mask; rank < cape reproduces the old post-compact cape cut
    esc = (
        (m_i32 != 0) & (idb_i32 == C.ESCAPE) & (cum - 1 < cape)
    ).astype(jnp.int32)
    cum2 = _cumsum(esc, col, cw)
    comb2 = jnp.where(esc != 0, _LIVE | (col - (cum2 - 1)), 0)
    vv = vals
    k = 0
    s = 1
    while s < cw:
        comb2, (vv,) = _stage_left(comb2, (vv,), s, col, cw, 1 << k)
        k += 1
        s *= 2
    ac = jnp.where(comb2[:, :capc] >= _LIVE, vv[:, :capc], 0.0)
    return exc_b[:, :cape], ac


def _k_compact_unified(mask_ref, idb_ref, val_ref, exc_ref, ac_ref):
    """Pallas wrapper around route_compact_unified (see there)."""
    cape = exc_ref.shape[1]
    capc = ac_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, mask_ref.shape, 1)
    exc_b, ac = route_compact_unified(
        mask_ref[:].astype(jnp.int32),
        idb_ref[:].astype(jnp.int32),
        val_ref[:],
        cape,
        capc,
        col,
    )
    exc_ref[:] = exc_b.astype(jnp.uint8)
    ac_ref[:] = ac


def _k_compact_bytes(mask_ref, byt_ref, out_ref):
    """Compact byte values by mask (the byte rides the distance word)."""
    cw = mask_ref.shape[1]
    capc = out_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, mask_ref.shape, 1)
    m = mask_ref[:].astype(jnp.int32)
    cum = _cumsum(m, col, cw)
    d = col - (cum - 1)
    comb = jnp.where(
        m != 0, _LIVE | (d << 8) | byt_ref[:].astype(jnp.int32), 0
    )
    k = 8
    s = 1
    while s < cw:
        comb, _ = _stage_left(comb, (), s, col, cw, 1 << k)
        k += 1
        s *= 2
    kv = (comb >= _LIVE) & (col < capc)
    out_ref[:] = jnp.where(kv, comb & 255, 0)[:, :capc].astype(jnp.uint8)


def _k_compact_f32(mask_ref, val_ref, out_ref):
    """Compact f32 values by mask (control word carries distances only)."""
    cw = mask_ref.shape[1]
    capc = out_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, mask_ref.shape, 1)
    m = mask_ref[:].astype(jnp.int32)
    cum = _cumsum(m, col, cw)
    comb = jnp.where(m != 0, _LIVE | (col - (cum - 1)), 0)
    vv = val_ref[:]
    k = 0
    s = 1
    while s < cw:
        comb, (vv,) = _stage_left(comb, (vv,), s, col, cw, 1 << k)
        k += 1
        s *= 2
    kv = (comb >= _LIVE) & (col < capc)
    out_ref[:] = jnp.where(kv, vv, 0.0)[:, :capc]


def _expand_phase1(mask_i32, col, cw):
    """Forward network on the control word alone: the destination distance
    of the r-th masked element lands at slot r (live-bit encoding)."""
    cum = _cumsum(mask_i32, col, cw)
    comb = jnp.where(mask_i32 != 0, _LIVE | (col - (cum - 1)), 0)
    k = 0
    s = 1
    while s < cw:
        comb, _ = _stage_left(comb, (), s, col, cw, 1 << k)
        k += 1
        s *= 2
    return comb


def route_expand(mask_i32, rows, col, byte_rows=None):
    """Mirror network on ARRAYS: rows[r] lands at each row's r-th masked
    position (0 elsewhere). Shared by _k_expand and the fused DPK kernels
    (ops/dpk_fuse.py). `rows` may be one array or a tuple (the network cost
    is per-MASK; extra payloads only add one roll per stage each).

    byte_rows: an optional int payload with values <= 255 that rides the
    SPARE LOW BITS of the control word through phase 2 instead of rolling
    its own array — one fewer roll per stage (the decode kernel's exception
    bytes use this). Returned FIRST when given: (byte_out, *rows_out).

    Phase 1 compacts the destination distances to their slots (the forward
    network on the control word alone); phase 2 routes values right,
    MSB-first. Requires per-row counts <= rows.shape[1] (capacity tiering
    upholds this — api._dpk_decode_prep / decompress pad rows to the peak
    tier)."""
    single = rows is not None and not isinstance(rows, (tuple, list))
    vs = (rows,) if single else tuple(rows or ())
    cw = mask_i32.shape[1]
    comb = _expand_phase1(mask_i32, col, cw)
    vs = tuple(
        jnp.pad(v, ((0, 0), (0, cw - v.shape[1])))
        if v.shape[1] < cw
        else v
        for v in vs
    )
    if byte_rows is not None:
        # re-encode LIVE | (d << 8) | byte: the byte payload sits at the
        # same slot its control word occupies after phase 1, so it merges
        # into the low 8 bits and travels for free (d <= cw <= 2048 keeps
        # d << 8 below the live bit)
        b = byte_rows
        if b.shape[1] < cw:
            b = jnp.pad(b, ((0, 0), (0, cw - b.shape[1])))
        comb = jnp.where(
            comb != 0, ((comb & (_LIVE - 1)) << 8) | (b & 255) | _LIVE, 0
        )
    k_shift = 8 if byte_rows is not None else 0
    stages = (cw - 1).bit_length()
    for k in reversed(range(stages)):
        s = 1 << k
        comb, vs = _stage_right(comb, vs, s, col, 1 << (k + k_shift))
    out = tuple(
        jnp.where(mask_i32 != 0, v, jnp.zeros_like(v)) for v in vs
    )
    if byte_rows is not None:
        byte_out = jnp.where(mask_i32 != 0, comb & 255, 0)
        return (byte_out,) + out
    return out[0] if single else out


def _k_expand(mask_ref, rows_ref, out_ref):
    """Pallas wrapper around route_expand (see there)."""
    col = jax.lax.broadcasted_iota(jnp.int32, mask_ref.shape, 1)
    out_ref[:] = route_expand(
        mask_ref[:].astype(jnp.int32), rows_ref[:], col
    )


# ---------------------------------------------------------------------------
# wrappers (row padding to the grid quantum; jit'd by the enclosing program)
# ---------------------------------------------------------------------------


def _grid_rows(nc: int) -> int:
    r = min(R_ROWS, nc)
    while nc % r:
        r -= 1
    return r


def _call(kernel, ins, out_shapes, nc, scratch_shapes=()):
    r = _grid_rows(nc)
    grid = nc // r
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (r, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            for a in ins
        ],
        out_specs=[
            pl.BlockSpec(
                (r, s.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            for s in out_shapes
        ],
        out_shape=out_shapes,
        scratch_shapes=list(scratch_shapes),
        interpret=_INTERPRET,
    )(*ins)


def compact_unified(mask, idb, vals, cape: int, capc: int):
    """(exc u8 (nc,cape), ac f32 (nc,capc)) — see _k_compact_unified."""
    nc, cw = mask.shape
    ke, kc = _kcap(cape, cw), _kcap(capc, cw)
    outs = [
        jax.ShapeDtypeStruct((nc, ke), jnp.uint8),
        jax.ShapeDtypeStruct((nc, kc), jnp.float32),
    ]
    exc, ac = _call(
        _k_compact_unified,
        (mask.astype(jnp.uint8), idb.astype(jnp.uint8), vals),
        outs,
        nc,
    )
    return exc[:, :cape], ac[:, :capc]


def compact_bytes(mask, byt, capc: int):
    nc, cw = mask.shape
    kc = _kcap(capc, cw)
    outs = [jax.ShapeDtypeStruct((nc, kc), jnp.uint8)]
    out = _call(
        _k_compact_bytes,
        (mask.astype(jnp.uint8), byt.astype(jnp.uint8)),
        outs,
        nc,
    )[0]
    return out[:, :capc]


def compact_f32(mask, vals, capc: int):
    nc, cw = mask.shape
    kc = _kcap(capc, cw)
    outs = [jax.ShapeDtypeStruct((nc, kc), jnp.float32)]
    out = _call(
        _k_compact_f32,
        (mask.astype(jnp.uint8), vals.astype(jnp.float32)),
        outs,
        nc,
    )[0]
    return out[:, :capc]


def expand(mask, rows):
    """rows[c, r] -> r-th masked position of row c (0 elsewhere).

    rows: float32 or int32 (32-bit lanes; callers cast u8/bf16)."""
    nc, cw = mask.shape
    dt = rows.dtype
    if dt == jnp.bfloat16:
        rows = rows.astype(jnp.float32)  # exact
    elif dt == jnp.uint8:
        rows = rows.astype(jnp.int32)
    outs = [jax.ShapeDtypeStruct((nc, cw), rows.dtype)]
    out = _call(_k_expand, (mask.astype(jnp.uint8), rows), outs, nc)[0]
    return out.astype(dt) if out.dtype != dt else out
