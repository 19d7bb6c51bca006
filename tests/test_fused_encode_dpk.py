"""Fully-fused DPK encode kernel (ops/research/fused_encode_dpk.py), interpret mode.

Must be BYTE-IDENTICAL to the unfused chain (fused_encode_pipeline for
ids/dc/AC + idpack.pack_ids for widths/packed/exceptions) — same streams,
same width choices, same chunk counts — for every escape regime.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dctz_tpu.core import quantize as qz
from dctz_tpu.ops import fused_encode as fe, idpack
from dctz_tpu.ops.research import fused_encode_dpk as fed


def _signals(n):
    rng = np.random.default_rng(0)
    t = np.linspace(0, 100, n)
    return {
        "smooth": (np.sin(t) * 0.5).astype(np.float32),
        # escape rates are tuned to stay within the 128-slot chunk
        # capacity (the overflow regime has its own test below)
        "spiky": (
            np.sin(t) * 0.5
            + rng.standard_normal(n) * 0.01
            + np.where(rng.random(n) < 5e-4, 10.0, 0.0)
        ).astype(np.float32),
        "noisy": (rng.standard_normal(n) * 0.002).astype(np.float32),
        "zeros": np.zeros(n, np.float32),
        "mixed": np.where(
            np.arange(n) < n // 2,
            np.sin(t) * 0.5,
            rng.standard_normal(n) * 0.002,
        ).astype(np.float32),
    }


@pytest.mark.parametrize(
    "name", ["smooth", "spiky", "noisy", "zeros", "mixed"]
)
def test_matches_unfused_chain(name):
    # 18 tiles of 256 blocks + a partial tail tile (n % 16384 != 0)
    n = 1024 * 300
    x = _signals(n)[name]
    sf = jnp.float32(1.0)
    eb = 1e-3

    w2, pk2, exc2, excn2, ac2, acn2, dc2 = fed.fused_encode_dpk(
        jnp.asarray(x), sf, eb, True
    )

    ids, dc, ac_chunks, counts, ovf = fe.fused_encode_pipeline(
        jnp.asarray(x), sf, eb, None, True
    )
    if bool(ovf):
        pytest.skip("reference chain overflowed at capc=128")
    w1, pk1, exc1, excn1, eovf = idpack.pack_ids(
        ids, n, idpack.B_DEFAULT, idpack.CAPE
    )
    assert not bool(eovf)

    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(pk2), np.asarray(pk1))
    np.testing.assert_array_equal(np.asarray(excn2), np.asarray(excn1))
    np.testing.assert_array_equal(np.asarray(exc2), np.asarray(exc1))
    np.testing.assert_array_equal(np.asarray(acn2), np.asarray(counts))
    np.testing.assert_array_equal(np.asarray(ac2), np.asarray(ac_chunks))
    np.testing.assert_array_equal(np.asarray(dc2), np.asarray(dc))


def test_scaling_inside_kernel():
    n = 1024 * 16
    x = (np.sin(np.linspace(0, 50, n)) * 500).astype(np.float32)
    a = fed.fused_encode_dpk(jnp.asarray(x), jnp.float32(100.0), 1e-3, True)
    b = fed.fused_encode_dpk(
        jnp.asarray(x / 100.0), jnp.float32(1.0), 1e-3, True
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

def test_overflow_drops_but_counts_tell():
    """Chunks past capacity must not corrupt neighbors: counts > CAP flag
    the caller's retry, stored slots still match the unfused chain's
    first-CAP prefix."""
    rng = np.random.default_rng(9)
    n = 1024 * 32
    # dense spikes -> nearly all coefficients escape in spike regions
    x = np.where(
        rng.random(n) < 0.5, rng.standard_normal(n) * 50, 0.0
    ).astype(np.float32)
    out = fed.fused_encode_dpk(jnp.asarray(x), jnp.float32(1.0), 1e-3, True)
    acn = np.asarray(out[5])
    assert (acn > fed.CAP).any()  # the regime under test
    ids, dc, ac_chunks, counts, ovf = fe.fused_encode_pipeline(
        jnp.asarray(x), jnp.float32(1.0), 1e-3, None, True
    )
    assert bool(ovf)
    np.testing.assert_array_equal(acn, np.asarray(counts))
    np.testing.assert_array_equal(np.asarray(out[4]), np.asarray(ac_chunks))


@pytest.mark.parametrize("mode", ["ec", "qt"])
def test_unified_dispatch_matches_xla_dpk_container(mode):
    """The default fused DPK branch (fused_encode_pipeline_dpk[_qt]: one
    program, one shared chunk sort) must produce a byte-identical container
    to the unfused XLA DPK path that CPU backends take."""
    import dctz_tpu
    from dctz_tpu.config import CodecConfig
    from dctz_tpu.ops import compaction as cp

    n = 1024 * 64
    x = _signals(n)["spiky"]
    cfg = CodecConfig(
        mode=mode, error_bound=1e-3, container="v2", ids_codec="device"
    )

    blob_xla = dctz_tpu.compress(x, config=cfg)  # CPU: non-fused path

    orig_ucc = cp.use_chunked_compaction
    orig_uni = fe.fused_encode_pipeline_dpk
    orig_uni_qt = fe.fused_encode_pipeline_dpk_qt
    try:
        cp.use_chunked_compaction = lambda: True
        fe.fused_encode_pipeline_dpk = lambda *a: orig_uni(*a[:4], True)
        fe.fused_encode_pipeline_dpk_qt = lambda *a: orig_uni_qt(
            *a[:4], True
        )
        blob_fused = dctz_tpu.compress(x, config=cfg)
    finally:
        cp.use_chunked_compaction = orig_ucc
        fe.fused_encode_pipeline_dpk = orig_uni
        fe.fused_encode_pipeline_dpk_qt = orig_uni_qt
    assert blob_fused == blob_xla
    y = dctz_tpu.decompress(blob_fused)
    assert y.shape == x.shape and np.isfinite(y).all()
