"""End-to-end property tests: compress -> decompress on varied signals.

Plays the role of tests/test-dctz.sh / test-dctz-f.sh (round trips over real
datasets with manual log inspection) but with assertions: the error-bound
invariant, container sizes, and metric sanity are all checked mechanically.
"""

import numpy as np
import pytest

import dctz_tpu
from dctz_tpu.config import CodecConfig


def _signals(rng, n, dtype):
    t = np.linspace(0, 40 * np.pi, n)
    return {
        "random": (rng.standard_normal(n) * 100).astype(dtype),
        "smooth": (np.sin(t) * 50 + 3).astype(dtype),
        "mixed": (np.sin(t) * 5 + rng.standard_normal(n) * 0.01).astype(dtype),
        "constant": np.full(n, 3.14159, dtype),
        "tiny_values": (rng.standard_normal(n) * 1e-7).astype(dtype),
        "large_range": (rng.standard_normal(n) * 1e6).astype(dtype),
    }


@pytest.mark.parametrize("mode", ["ec", "qt"])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("eb", [1e-3, 1e-4, 1e-5])
def test_bound_satisfaction(mode, dtype, eb):
    """North-star invariant: max relative error <= error bound (the metric
    the reference prints, util.c:94-95, and the paper's guarantee)."""
    rng = np.random.default_rng(42)
    n = 64 * 300 + 29
    for name, x in _signals(rng, n, dtype).items():
        blob = dctz_tpu.compress(x, eb, mode)
        y = dctz_tpu.decompress(blob)
        assert y.dtype == x.dtype, name
        assert y.shape == x.shape, name
        m = dctz_tpu.evaluate(x, y, eb, len(blob))
        assert m["bound_satisfied"], (name, mode, dtype, eb, m)


@pytest.mark.parametrize("mode", ["ec", "qt"])
def test_zeros_roundtrip(mode):
    """All-zero input: the reference divides by sf=0 (documented deviation:
    we clamp sf to 1 and round-trip exactly)."""
    x = np.zeros(1000, np.float64)
    y = dctz_tpu.decompress(dctz_tpu.compress(x, 1e-3, mode))
    np.testing.assert_array_equal(y, x)


def test_qt_compresses_better_than_ec_on_outlier_heavy_data():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(64 * 1000) * 100
    x[rng.random(x.size) < 0.2] *= 50  # many escapes
    ec = dctz_tpu.compress(x, 1e-3, "ec")
    qt = dctz_tpu.compress(x, 1e-3, "qt")
    assert len(qt) < len(ec)


def test_v2_container_roundtrip_matches_v1():
    rng = np.random.default_rng(8)
    x = rng.standard_normal(64 * 500 + 7) * 10
    cfg1 = CodecConfig(mode="ec", error_bound=1e-4, container="v1")
    cfg2 = CodecConfig(mode="ec", error_bound=1e-4, container="v2", chunk_bytes=4096)
    y1 = dctz_tpu.decompress(dctz_tpu.compress(x, config=cfg1))
    y2 = dctz_tpu.decompress(dctz_tpu.compress(x, config=cfg2))
    np.testing.assert_array_equal(y1, y2)  # identical reconstruction


def test_multidim_input_flattened():
    """The reference treats N-D data as flat 1-D (dctz-test.c:77-92)."""
    rng = np.random.default_rng(9)
    x2d = rng.standard_normal((180, 360)).astype(np.float32)
    blob = dctz_tpu.compress(x2d, 1e-3, "ec")
    y = dctz_tpu.decompress(blob)
    flat = dctz_tpu.compress(x2d.reshape(-1), 1e-3, "ec")
    assert blob == flat
    assert y.shape == (180 * 360,)


def test_empty_input_raises():
    with pytest.raises(ValueError):
        dctz_tpu.compress(np.zeros(0, np.float32), 1e-3)


def test_error_bound_floor_enforced():
    """eb < 1E-6 rejected (dctz-comp-lib.c:135-138)."""
    with pytest.raises(ValueError):
        dctz_tpu.compress(np.ones(64), 1e-7)


def test_int_input_rejected():
    with pytest.raises(TypeError):
        dctz_tpu.compress(np.arange(64), 1e-3)


def test_compression_actually_compresses_smooth_data():
    t = np.linspace(0, 8 * np.pi, 64 * 2000)
    x = np.sin(t) * 100
    blob = dctz_tpu.compress(x, 1e-3, "ec")
    assert len(blob) < x.nbytes / 10  # smooth data compresses hard


def test_reported_header_metadata():
    from dctz_tpu.core import container as ct

    rng = np.random.default_rng(10)
    x = rng.standard_normal(12345) * 42
    blob = dctz_tpu.compress(x, 1e-4, "ec")
    hdr, *_ = ct.parse_v1(blob)
    assert hdr.num_elements == 12345
    assert hdr.error_bound == 1e-4
    assert hdr.dtype == np.float64
    # sf = 10**(ceil(log10(max|x|)) - 1) (util.c:28)
    amax = np.abs(x).max()
    assert hdr.scaling_factor == 10.0 ** (np.ceil(np.log10(amax)) - 1)


def test_non_truncate_mode():
    """truncate=False stores full-precision DC/AC (the reference's
    non-USE_TRUNCATE build, dctz-comp-lib.c:104-105)."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal(64 * 100) * 7
    for container in ("v1", "v2"):
        cfg = CodecConfig(
            mode="ec", error_bound=1e-4, truncate=False, container=container
        )
        blob = dctz_tpu.compress(x, config=cfg)
        y = dctz_tpu.decompress(blob)
        m = dctz_tpu.evaluate(x, y, 1e-4, len(blob))
        assert m["bound_satisfied"], container
        # full-precision escapes: error comes only from binning, never from
        # f32 truncation — escaped coefficients round-trip exactly
        from dctz_tpu.core import container as ct

        if container == "v1":
            hdr, *_ = ct.parse_v1(blob)
        else:
            hdr, *_ = ct.parse_v2(blob)
        assert not hdr.truncate or container == "v1"  # v1 infers from sizes
