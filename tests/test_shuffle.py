"""Butterfly routing kernels (ops/shuffle.py): bit-identical to the XLA
sort/one-hot paths they replace, across densities, widths, and capacities.

Runs the Pallas kernels in interpret mode on the CPU backend (the same
strategy as the ops/research mega-kernel tests); the gating wrappers in
ops/compaction.py and ops/idpack.py are exercised force-on vs force-off so
both dispatch arms produce the same streams.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dctz_tpu.core import constants as C
from dctz_tpu.ops import compaction as cp
from dctz_tpu.ops import idpack, shuffle


@pytest.fixture
def interp():
    shuffle._FORCE, shuffle._INTERPRET = True, True
    yield
    shuffle._FORCE, shuffle._INTERPRET = None, False


def _mask_vals(rng, nc, cw, density):
    mask = rng.random((nc, cw)) < density
    vals = rng.standard_normal((nc, cw)).astype(np.float32)
    return mask, vals


@pytest.mark.parametrize("cw", [128, 256, 1024])
@pytest.mark.parametrize("density", [0.0, 0.03, 0.25, 1.0])
def test_compact_f32_matches_sort(interp, cw, density):
    rng = np.random.default_rng(cw + int(density * 100))
    nc = 24
    mask, vals = _mask_vals(rng, nc, cw, density)
    capc = min(cw, 96)  # deliberately NOT a lane multiple
    out = np.asarray(
        shuffle.compact_f32(jnp.asarray(mask), jnp.asarray(vals), capc)
    )
    ref = np.zeros((nc, capc), np.float32)
    for c in range(nc):
        sel = vals[c][mask[c]][:capc]
        ref[c, : len(sel)] = sel
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("cw", [128, 512])
def test_compact_bytes_matches(interp, cw):
    rng = np.random.default_rng(5)
    nc = 17
    mask = rng.random((nc, cw)) < 0.2
    byt = rng.integers(0, 256, (nc, cw)).astype(np.uint8)
    capc = 130
    out = np.asarray(
        shuffle.compact_bytes(jnp.asarray(mask), jnp.asarray(byt), capc)
    )
    ref = np.zeros((nc, min(cw, capc)), np.uint8)
    for c in range(nc):
        sel = byt[c][mask[c]][: ref.shape[1]]
        ref[c, : len(sel)] = sel
    assert np.array_equal(out, ref[:, : out.shape[1]])


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int32", "uint8"])
@pytest.mark.parametrize("density", [0.02, 0.5])
def test_expand_matches_one_hot(interp, dtype, density):
    rng = np.random.default_rng(11)
    nc, cw, capc = 20, 256, 160
    mask = rng.random((nc, cw)) < density
    counts = mask.sum(axis=-1)
    mask[counts > capc] = False  # expand requires counts <= capc
    if dtype == "uint8":
        rows = rng.integers(0, 256, (nc, capc)).astype(np.uint8)
    elif dtype == "int32":
        rows = rng.integers(-1000, 1000, (nc, capc)).astype(np.int32)
    else:
        rows = rng.standard_normal((nc, capc)).astype(np.float32)
    jrows = jnp.asarray(rows).astype(dtype)
    got = np.asarray(shuffle.expand(jnp.asarray(mask), jrows))
    # one-hot oracle: the path the kernel replaces
    shuffle._FORCE = False
    ref = np.asarray(cp.expand_chunked(jnp.asarray(mask), jrows))
    shuffle._FORCE = True
    assert got.dtype == ref.dtype
    assert np.array_equal(got, ref)


def test_compact_chunked_gate_bit_identical(interp):
    """The public wrapper produces the same (ac, counts, overflow) whether
    the butterfly or the sort path runs."""
    rng = np.random.default_rng(2)
    n, cw, capc = 64 * 1024, 512, 192
    mask = (rng.random(n) < 0.07).astype(bool)
    vals = rng.standard_normal(n).astype(np.float32)
    outs = {}
    for force in (True, False):
        shuffle._FORCE = force
        ac, counts, ovf = cp.compact_chunked(
            jnp.asarray(mask), jnp.asarray(vals), cw, capc
        )
        outs[force] = (np.asarray(ac), np.asarray(counts), bool(ovf))
    assert np.array_equal(outs[True][0], outs[False][0])
    assert np.array_equal(outs[True][1], outs[False][1])
    assert outs[True][2] == outs[False][2]


def test_pack_ids_with_ac_gate_bit_identical(interp):
    """pack_ids_with_ac streams are identical across both dispatch arms,
    including the escape-tighten second stage."""
    rng = np.random.default_rng(9)
    nblk, bs, b = 512, 64, 256
    mag = rng.geometric(p=0.4, size=(nblk, bs)).astype(np.int64) - 1
    decay = np.maximum(1, np.arange(bs) // 4)
    ids = np.minimum(mag * 8 // decay[None, :], 254)
    ids = np.where(rng.random((nblk, bs)) < 0.02, C.ESCAPE, ids)
    ids[:, 0] = C.ESCAPE
    ids = ids.astype(np.uint8)
    vals = rng.standard_normal((nblk, bs)).astype(np.float32)
    outs = {}
    for force in (True, False):
        shuffle._FORCE = force
        # _FORCE is not part of the jit cache key — clear between arms
        idpack.pack_ids_with_ac.clear_cache()
        res = idpack.pack_ids_with_ac(
            jnp.asarray(ids), jnp.asarray(vals), nblk * bs - 7, b, 256
        )
        outs[force] = [np.asarray(x) for x in res]
    for a, b_, name in zip(
        outs[True],
        outs[False],
        ["width", "packed", "exc_rows", "exc_counts", "ac", "acc", "dc", "ovf"],
    ):
        assert np.array_equal(a, b_), name
