"""Fused Pallas encode kernel tests (interpret mode on CPU).

The kernel must produce byte-identical streams to the XLA reference path
(core/quantize.py) for every escape regime, including the bimodal spike
case that sank the per-block-slot design (see ops/fused_encode.py notes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctz_tpu.config import CodecConfig
from dctz_tpu.core import quantize as qz, transform
from dctz_tpu.ops import fused_encode as fe


def _signals(n):
    rng = np.random.default_rng(0)
    t = np.linspace(0, 100, n)
    return {
        "smooth": (np.sin(t) * 0.5).astype(np.float32),
        "spiky": (
            np.sin(t) * 0.5
            + rng.standard_normal(n) * 0.01
            + np.where(rng.random(n) < 0.005, 10.0, 0.0)
        ).astype(np.float32),
        "noisy": (rng.standard_normal(n) * 0.2).astype(np.float32),
        "zeros": np.zeros(n, np.float32),
    }


@pytest.mark.parametrize("name", ["smooth", "spiky", "noisy", "zeros"])
def test_fused_matches_xla_path(name):
    n = 1024 * 24
    x = _signals(n)[name]
    sf = jnp.float32(1.0)
    cfg = CodecConfig(mode="ec", error_bound=1e-3)

    ids, dc, ac_chunks, counts, ovf = fe.fused_encode_pipeline(
        jnp.asarray(x), sf, 1e-3, None, True
    )
    if bool(ovf):
        cw = qz.chunk_width(n, 64)
        ids, dc, ac_chunks, counts, ovf = fe.fused_encode_pipeline(
            jnp.asarray(x), sf, 1e-3, cw, True
        )
        assert not bool(ovf)

    coeffs = transform.block_dct_flat(jnp.asarray(x), 64)
    q = qz.encode(coeffs, n, cfg, compaction="global")

    np.testing.assert_array_equal(np.asarray(ids), np.asarray(q.bin_ids))
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(q.dc))
    capc = ac_chunks.shape[1]
    sel = np.arange(capc)[None, :] < np.asarray(counts)[:, None]
    ac = np.asarray(ac_chunks)[sel]
    np.testing.assert_array_equal(ac, np.asarray(q.ac_buf[: int(q.ac_count)]))


def test_fused_requires_tile_quantum():
    with pytest.raises(AssertionError):
        fe.fused_encode_ec(jnp.zeros(1000, jnp.float32), jnp.float32(1.0), 1e-3, 1.0, True)


def test_fused_scaling_applied():
    """sf division must happen inside the kernel (coef of x/sf)."""
    n = 1024 * 8
    x = (np.sin(np.linspace(0, 50, n)) * 500).astype(np.float32)
    ids_a, dcac_a = fe.fused_encode_ec(
        jnp.asarray(x), jnp.float32(100.0), 1e-3, 1.0, True
    )
    ids_b, dcac_b = fe.fused_encode_ec(
        jnp.asarray(x / 100.0), jnp.float32(1.0), 1e-3, 1.0, True
    )
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))


@pytest.mark.parametrize("name", ["smooth", "spiky", "noisy", "zeros"])
def test_fused_qt_matches_xla_path(name):
    """QT two-kernel pipeline vs the XLA QT encoder at EQUAL precision
    (promote=False: the kernel renormalizes in f32; the XLA path's default
    f64 intermediates exist for C parity): identical ids, DC and qtable;
    renormalized AC values within 1 ulp (XLA contracts the mul+add chain
    into an FMA on CPU, interpret mode rounds each op — docs/numerics.md)."""
    n = 1024 * 24
    x = _signals(n)[name]
    sf = jnp.float32(1.0)
    cfg = CodecConfig(mode="qt", error_bound=1e-3)

    out = fe.fused_encode_pipeline_qt(jnp.asarray(x), sf, 1e-3, None, True)
    if bool(out[4]):
        cw = qz.chunk_width(n, 64)
        out = fe.fused_encode_pipeline_qt(jnp.asarray(x), sf, 1e-3, cw, True)
        assert not bool(out[4])
    ids, dc, ac_chunks, counts, _, qtable = out

    coeffs = transform.block_dct_flat(jnp.asarray(x), 64)
    q = qz.encode(coeffs, n, cfg, compaction="global", promote=False)

    np.testing.assert_array_equal(np.asarray(ids), np.asarray(q.bin_ids))
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(q.dc))
    # slot 0 carries the last block's DC quirk in both paths
    np.testing.assert_allclose(
        np.asarray(qtable)[1:], np.asarray(q.qtable)[1:].astype(np.float32)
    )
    capc = ac_chunks.shape[1]
    sel = np.arange(capc)[None, :] < np.asarray(counts)[:, None]
    ac = np.asarray(ac_chunks)[sel]
    np.testing.assert_allclose(
        ac, np.asarray(q.ac_buf[: int(q.ac_count)]), rtol=2e-7
    )
