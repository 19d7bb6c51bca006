"""Device-side id-stream coding (ops/idpack.py): round-trip, oracle
agreement, and host assembly/reassembly of the tight layout."""

import numpy as np
import pytest

import jax.numpy as jnp

from dctz_tpu.core import constants as C
from dctz_tpu.ops import idpack


def _random_ids(rng, nblk, bs, heavy=False):
    """Bin-id grids shaped like real DCT output: position-dependent decay,
    DC col = ESCAPE, occasional escapes."""
    mag = rng.geometric(p=0.4, size=(nblk, bs)).astype(np.int64) - 1
    decay = np.maximum(1, np.arange(bs) // 4)
    ids = np.minimum(mag * 8 // decay[None, :], 254)
    if heavy:
        ids = np.minimum(ids * 16, 254)
    esc = rng.random((nblk, bs)) < 0.01
    ids = np.where(esc, C.ESCAPE, ids)
    ids[:, 0] = C.ESCAPE
    return ids.astype(np.uint8)


@pytest.mark.parametrize("b", [64, 256])
@pytest.mark.parametrize("heavy", [False, True])
def test_pack_unpack_roundtrip(b, heavy):
    rng = np.random.default_rng(7)
    nblk, bs = 700, 64  # not a tile multiple: exercises padding
    ids = _random_ids(rng, nblk, bs, heavy)
    n_valid = nblk * bs - 13  # partial tail block

    width, packed, exc_rows, exc_counts, ovf = idpack.pack_ids(
        jnp.asarray(ids), n_valid, b, 1 << 20  # clamped to the chunk width
    )
    assert not bool(ovf)
    out = np.asarray(
        idpack.unpack_ids(width, packed, exc_rows, nblk, bs, b)
    )
    pos = np.arange(nblk * bs).reshape(nblk, bs)
    valid = pos < n_valid
    ref = np.where(valid, ids, 0)
    ref[:, 0] = C.ESCAPE  # DC marks always restored
    assert np.array_equal(np.where(valid, out, 0)[:, 1:], ref[:, 1:])
    assert np.array_equal(out[:, 0], ref[:, 0])


def test_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    nblk, bs, b = 512, 64, 256
    ids = _random_ids(rng, nblk, bs)
    n_valid = nblk * bs

    width, packed, exc_rows, exc_counts, ovf = idpack.pack_ids(
        jnp.asarray(ids), n_valid, b, b
    )
    assert not bool(ovf)
    w_np, tight_np, exc_np, counts_np = idpack.pack_ids_np(ids, n_valid, b)

    width = np.asarray(width)
    assert np.array_equal(width, w_np)
    # host assembly: slice each capacity row to its width's byte count
    packed = np.asarray(packed)
    bpr = idpack.packed_nbytes(width.reshape(-1), b)
    tight = packed[np.arange(packed.shape[1])[None, :] < bpr[:, None]]
    assert tight.tobytes() == tight_np
    exc_counts = np.asarray(exc_counts)
    assert np.array_equal(exc_counts, counts_np)
    cape = exc_rows.shape[1]
    exc = np.asarray(exc_rows)[
        np.arange(cape)[None, :] < exc_counts[:, None]
    ]
    assert exc.tobytes() == exc_np


def test_host_reassembly_roundtrip():
    """Tight stream -> capacity rows -> unpack must equal the original."""
    rng = np.random.default_rng(11)
    nblk, bs, b = 300, 64, 64
    ids = _random_ids(rng, nblk, bs)
    n = nblk * bs

    width, packed, exc_rows, exc_counts, ovf = idpack.pack_ids(
        jnp.asarray(ids), n, b, b
    )
    width, packed, exc_counts = map(np.asarray, (width, packed, exc_counts))
    bpr = idpack.packed_nbytes(width.reshape(-1), b)
    colmask = np.arange(b // 2)[None, :] < bpr[:, None]
    tight = packed[colmask]

    rows = np.zeros_like(packed)
    rows[colmask] = tight
    out = np.asarray(
        idpack.unpack_ids(
            jnp.asarray(width), jnp.asarray(rows), exc_rows, nblk, bs, b
        )
    )
    assert np.array_equal(out, ids)


def test_all_zero_ids_cost_nothing():
    ids = np.zeros((256, 64), np.uint8)
    ids[:, 0] = C.ESCAPE
    width, packed, exc_rows, exc_counts, ovf = idpack.pack_ids(
        jnp.asarray(ids), 256 * 64, 256, 64
    )
    assert int(np.asarray(width).sum()) == 0
    assert int(np.asarray(exc_counts).sum()) == 0
    assert idpack.packed_nbytes(np.asarray(width).reshape(-1), 256).sum() == 0


def test_exception_overflow_flag():
    """All-15 nibbles with tiny cape must raise the overflow flag."""
    ids = np.full((256, 64), 200, np.uint8)  # every AC an exception at w=4
    ids[:, 0] = C.ESCAPE
    *_, exc_counts, ovf = idpack.pack_ids(jnp.asarray(ids), 256 * 64, 256, 16)
    assert bool(ovf)


def _dcac_for(rng, ids):
    """A dcac grid consistent with the fused kernel's contract: DC at col 0,
    escaped coefficients (|v| > 0) at id==ESCAPE positions, zeros elsewhere."""
    nblk, bs = ids.shape
    dcac = np.zeros((nblk, bs), np.float32)
    esc = ids == C.ESCAPE
    esc[:, 0] = False
    vals = (rng.standard_normal(ids.shape) * 10 + 1).astype(np.float32)
    dcac = np.where(esc, np.where(vals == 0, 1.0, vals), dcac)
    dcac[:, 0] = rng.standard_normal(nblk).astype(np.float32)
    return dcac


@pytest.mark.parametrize("heavy", [False, True])
@pytest.mark.parametrize("cape", [128, 512])
def test_pack_ids_with_ac_matches_two_sort_path(heavy, cape):
    """The single-sort unified encode (pack_ids_with_ac) must be
    byte-identical to pack_ids + compaction.compact_chunked on every
    stream it emits."""
    from dctz_tpu.core.quantize import chunk_width
    from dctz_tpu.ops import compaction as cp

    rng = np.random.default_rng(11)
    nblk, bs, b = 700, 64, 256
    ids = _random_ids(rng, nblk, bs, heavy)
    dcac = _dcac_for(rng, ids)
    n_valid = nblk * bs

    (width, packed, exc_rows, exc_counts, ac_rows, ac_counts, dc, ovf) = (
        idpack.pack_ids_with_ac(
            jnp.asarray(ids), jnp.asarray(dcac), n_valid, b, cape
        )
    )
    w1, pk1, exc1, excn1, eovf1 = idpack.pack_ids(
        jnp.asarray(ids), n_valid, b, cape
    )
    np.testing.assert_array_equal(np.asarray(width), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(pk1))
    np.testing.assert_array_equal(np.asarray(exc_rows), np.asarray(exc1))
    np.testing.assert_array_equal(np.asarray(exc_counts), np.asarray(excn1))
    assert bool(ovf) == bool(eovf1)

    col = np.arange(bs)[None, :]
    esc = (ids == C.ESCAPE) & (col >= 1)
    cw = chunk_width(nblk * bs, bs)
    ac1, counts1, _ = cp.compact_chunked(
        jnp.asarray(esc.reshape(-1)),
        jnp.asarray(dcac.reshape(-1)),
        cw,
        min(cape, cw),
    )
    np.testing.assert_array_equal(np.asarray(ac_counts), np.asarray(counts1))
    # overflowed chunks truncate differently (union vs AC-only order) — both
    # paths flag the retry, so only non-overflowed rows must agree
    ok_rows = np.asarray(exc_counts) <= min(cape, cw)
    if not bool(ovf):
        assert ok_rows.all()
    np.testing.assert_array_equal(
        np.asarray(ac_rows)[ok_rows], np.asarray(ac1)[ok_rows]
    )
    np.testing.assert_array_equal(np.asarray(dc), dcac[:, 0])


def test_pack_ids_with_ac_overflow_flag_covers_ac():
    """Union overflow must flag whenever exceptions exceed cape (AC escapes
    are a subset, so the single flag is sufficient for the retry)."""
    rng = np.random.default_rng(5)
    ids = np.full((256, 64), C.ESCAPE, np.uint8)  # every AC escapes
    dcac = _dcac_for(rng, ids)
    *_, ovf = idpack.pack_ids_with_ac(
        jnp.asarray(ids), jnp.asarray(dcac), 256 * 64, 256, 16
    )
    assert bool(ovf)
