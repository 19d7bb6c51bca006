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


def route_compact_unified(m_i32, idb_i32, vals, cape: int, capc: int, col):
    """Unified compact network on ARRAYS (shared by _k_compact_unified and
    ops/dpk_fuse.encode_fused): compact (id byte, value) by the exception
    mask, then tighten the values whose compacted byte is ESCAPE into the
    AC rows. Returns (exc_bytes (R, cape) i32, ac (R, capc) f32)."""
    cw = m_i32.shape[1]
    cum = _cumsum(m_i32, col, cw)
    d = col - (cum - 1)
    comb = jnp.where(m_i32 != 0, (d << 8) | idb_i32, -1)
    vv = vals
    k = 8
    s = 1
    while s < cw:
        mv = (comb >= 0) & (((comb >> k) & 1) == 1)
        cs = _shl(comb, s, col, cw, -1)
        tk = (cs >= 0) & (((cs >> k) & 1) == 1)
        vv = jnp.where(tk, _shl(vv, s, col, cw, 0.0), vv)
        comb = jnp.where(tk, cs, jnp.where(mv, -1, comb))
        k += 1
        s *= 2
    live = comb >= 0
    kv = live & (col < cape)
    exc_b = jnp.where(kv, comb & 255, 0)
    uv = jnp.where(kv, vv, 0.0)

    # tighten: AC escapes out of the union prefix (distances < cape)
    esc = (kv & (exc_b == C.ESCAPE)).astype(jnp.int32)
    cum2 = _cumsum(esc, col, cw)
    comb2 = jnp.where(esc != 0, col - (cum2 - 1), -1)
    k = 0
    s = 1
    while s < cape:
        mv = (comb2 >= 0) & (((comb2 >> k) & 1) == 1)
        cs = _shl(comb2, s, col, cw, -1)
        tk = (cs >= 0) & (((cs >> k) & 1) == 1)
        uv = jnp.where(tk, _shl(uv, s, col, cw, 0.0), uv)
        comb2 = jnp.where(tk, cs, jnp.where(mv, -1, comb2))
        k += 1
        s *= 2
    ac = jnp.where(comb2[:, :capc] >= 0, uv[:, :capc], 0.0)
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
    comb = jnp.where(m != 0, (d << 8) | byt_ref[:].astype(jnp.int32), -1)
    k = 8
    s = 1
    while s < cw:
        mv = (comb >= 0) & (((comb >> k) & 1) == 1)
        cs = _shl(comb, s, col, cw, -1)
        tk = (cs >= 0) & (((cs >> k) & 1) == 1)
        comb = jnp.where(tk, cs, jnp.where(mv, -1, comb))
        k += 1
        s *= 2
    kv = (comb >= 0) & (col < capc)
    out_ref[:] = jnp.where(kv, comb & 255, 0)[:, :capc].astype(jnp.uint8)


def _k_compact_f32(mask_ref, val_ref, out_ref):
    """Compact f32 values by mask (control word carries distances only)."""
    cw = mask_ref.shape[1]
    capc = out_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, mask_ref.shape, 1)
    m = mask_ref[:].astype(jnp.int32)
    cum = _cumsum(m, col, cw)
    comb = jnp.where(m != 0, col - (cum - 1), -1)
    vv = val_ref[:]
    k = 0
    s = 1
    while s < cw:
        mv = (comb >= 0) & (((comb >> k) & 1) == 1)
        cs = _shl(comb, s, col, cw, -1)
        tk = (cs >= 0) & (((cs >> k) & 1) == 1)
        vv = jnp.where(tk, _shl(vv, s, col, cw, 0.0), vv)
        comb = jnp.where(tk, cs, jnp.where(mv, -1, comb))
        k += 1
        s *= 2
    kv = (comb >= 0) & (col < capc)
    out_ref[:] = jnp.where(kv, vv, 0.0)[:, :capc]


def route_expand(mask_i32, rows, col):
    """Mirror network on ARRAYS: rows[r] lands at each row's r-th masked
    position (0 elsewhere). Shared by _k_expand and the fused DPK kernels
    (ops/dpk_fuse.py). `rows` may be one array or a tuple (the network cost
    is per-MASK; extra payloads only add one roll per stage each).

    Phase 1 compacts the destination distances to their slots (the forward
    network on the control word alone); phase 2 routes values right,
    MSB-first. Requires per-row counts <= rows.shape[1] (capacity tiering
    upholds this — api._dpk_decode_prep / decompress pad rows to the peak
    tier)."""
    single = not isinstance(rows, (tuple, list))
    vs = (rows,) if single else tuple(rows)
    cw = mask_i32.shape[1]
    cum = _cumsum(mask_i32, col, cw)
    comb = jnp.where(mask_i32 != 0, col - (cum - 1), -1)
    k = 0
    s = 1
    while s < cw:
        mv = (comb >= 0) & (((comb >> k) & 1) == 1)
        cs = _shl(comb, s, col, cw, -1)
        tk = (cs >= 0) & (((cs >> k) & 1) == 1)
        comb = jnp.where(tk, cs, jnp.where(mv, -1, comb))
        k += 1
        s *= 2
    vs = tuple(
        jnp.pad(v, ((0, 0), (0, cw - v.shape[1])))
        if v.shape[1] < cw
        else v
        for v in vs
    )
    stages = (cw - 1).bit_length()
    for k in reversed(range(stages)):
        s = 1 << k
        mv = (comb >= 0) & (((comb >> k) & 1) == 1)
        cs = _shr(comb, s, col, -1)
        tk = (cs >= 0) & (((cs >> k) & 1) == 1)
        vs = tuple(jnp.where(tk, _shr(v, s, col, 0), v) for v in vs)
        comb = jnp.where(tk, cs, jnp.where(mv, -1, comb))
    out = tuple(
        jnp.where(mask_i32 != 0, v, jnp.zeros_like(v)) for v in vs
    )
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


def _call(kernel, ins, out_shapes, nc):
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
