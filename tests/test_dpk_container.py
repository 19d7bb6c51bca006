"""End-to-end round trips through DPK containers (ids_codec="device"):
the id stream is entropy-coded on the device and never materialized on the
host, replacing the reference's host zlib stage for that stream
(dctz-comp-lib.c:620-732)."""

import numpy as np
import pytest

import dctz_tpu
from dctz_tpu.config import CodecConfig
from dctz_tpu.core import container as ct


def _signal(n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 60, n)
    x = np.sin(t) * 40 + np.sin(t * 13.7) * 3 + rng.standard_normal(n) * 0.05
    spikes = rng.random(n) < 0.001
    return np.where(spikes, x * 8, x).astype(dtype)


def _cfg(**kw):
    kw.setdefault("container", "v2")
    kw.setdefault("ids_codec", "device")
    return CodecConfig(**kw)


@pytest.mark.parametrize("mode", ["ec", "qt"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_dpk_roundtrip_bound(mode, dtype):
    x = _signal(50_000, dtype)
    blob = dctz_tpu.compress(x, config=_cfg(mode=mode, error_bound=1e-3))
    header, *_ = ct.parse_v2(blob)
    assert header.dpk
    y = dctz_tpu.decompress(blob)
    assert y.dtype == x.dtype
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]


def test_dpk_bytes_match_non_dpk_reconstruction():
    """DPK is a different container encoding of the SAME quantized data:
    reconstruction must be bit-identical to the rANS/deflate v2 path."""
    x = _signal(30_000, np.float32, seed=3)
    y_dpk = dctz_tpu.decompress(
        dctz_tpu.compress(x, config=_cfg(error_bound=1e-3))
    )
    y_v2 = dctz_tpu.decompress(
        dctz_tpu.compress(
            x, config=CodecConfig(error_bound=1e-3, container="v2")
        )
    )
    np.testing.assert_array_equal(y_dpk, y_v2)


@pytest.mark.parametrize(
    "n", [64, 63, 65, 1000, 4096, 64 * 256, 64 * 256 * 2 + 17]
)
def test_dpk_sizes_and_tails(n):
    """Tile padding, partial tail blocks, and single-block arrays."""
    x = _signal(n, np.float32, seed=n)
    blob = dctz_tpu.compress(x, config=_cfg(error_bound=1e-4))
    y = dctz_tpu.decompress(blob)
    assert y.shape == x.shape
    assert dctz_tpu.evaluate(x, y, 1e-4)["bound_satisfied"]


def test_dpk_all_zero():
    x = np.zeros(10_000, np.float32)
    y = dctz_tpu.decompress(dctz_tpu.compress(x, config=_cfg()))
    np.testing.assert_array_equal(y, x)


def test_dpk_spiky_exception_retry():
    """Random integers escape nearly everywhere: exercises the exception
    capacity retry path (pack overflow -> cape=B rerun)."""
    rng = np.random.default_rng(5)
    x = rng.integers(-1000, 1000, 20_000).astype(np.float64)
    blob = dctz_tpu.compress(x, config=_cfg(error_bound=1e-3))
    y = dctz_tpu.decompress(blob)
    # random data is the documented worst case: just require a round trip
    # within the coefficient-domain guarantee, same as the v2 path
    y2 = dctz_tpu.decompress(
        dctz_tpu.compress(
            x, config=CodecConfig(error_bound=1e-3, container="v2")
        )
    )
    np.testing.assert_array_equal(y, y2)


def test_dpk_ratio_vs_rans():
    """Ratio positioning: on smooth climate-like data (the bench workload
    shape) device packing BEATS the host rANS path (per-position
    homogeneity + deflated exceptions); on noisy data fixed-width coding
    cannot reach fractional-bit entropy, but must stay within ~35%."""
    n = 1 << 18
    t = np.arange(n, dtype=np.float32)
    smooth = (
        np.sin(t * 0.001) * 40 + np.sin(t * 0.137) * 3 + np.sin(t * 2.03) * 0.3
    ).astype(np.float32)
    v2cfg = CodecConfig(error_bound=1e-3, container="v2")
    dpk = len(dctz_tpu.compress(smooth, config=_cfg(error_bound=1e-3)))
    v2 = len(dctz_tpu.compress(smooth, config=v2cfg))
    assert dpk < v2, (dpk, v2)

    noisy = _signal(n, np.float32, seed=9)
    dpk = len(dctz_tpu.compress(noisy, config=_cfg(error_bound=1e-3)))
    v2 = len(dctz_tpu.compress(noisy, config=v2cfg))
    assert dpk < v2 * 1.35, (dpk, v2)


def test_dpk_host_codec_ratio_mode():
    """dpk_host_codec="deflate" second stage: smaller container, identical
    reconstruction."""
    x = _signal(200_000, np.float32, seed=13)
    fast = dctz_tpu.compress(x, config=_cfg(error_bound=1e-3))
    ratio_cfg = _cfg(error_bound=1e-3, dpk_host_codec="deflate")
    small = dctz_tpu.compress(x, config=ratio_cfg)
    assert len(small) < len(fast)
    np.testing.assert_array_equal(
        dctz_tpu.decompress(small), dctz_tpu.decompress(fast)
    )


def test_dpk_host_codec_rans_mode():
    """dpk_host_codec="rans" (light ratio mode): smaller container than
    verbatim, identical reconstruction, dpkr flag set."""
    from dctz_tpu import native

    if not native.available():
        pytest.skip("native rANS codec not built")
    x = _signal(400_000, np.float32, seed=17)
    fast = dctz_tpu.compress(x, config=_cfg(error_bound=1e-3))
    small = dctz_tpu.compress(
        x, config=_cfg(error_bound=1e-3, dpk_host_codec="rans")
    )
    header, *_ = ct.parse_v2(small)
    assert header.dpkr and not header.dpkz
    assert len(small) < len(fast)
    np.testing.assert_array_equal(
        dctz_tpu.decompress(small), dctz_tpu.decompress(fast)
    )


def test_dpk_host_codec_zstd_mode():
    """dpk_host_codec="zstd" (the dominating ratio mode): smaller container
    than verbatim AND the rans ratio mode, identical reconstruction, dpks
    flag set."""
    from dctz_tpu.core import entropy

    if not entropy.zstd_available():
        pytest.skip("zstandard not installed")
    x = _signal(400_000, np.float32, seed=17)
    fast = dctz_tpu.compress(x, config=_cfg(error_bound=1e-3))
    small = dctz_tpu.compress(
        x, config=_cfg(error_bound=1e-3, dpk_host_codec="zstd")
    )
    header, *_ = ct.parse_v2(small)
    assert header.dpks and not header.dpkz and not header.dpkr
    assert len(small) < len(fast)
    np.testing.assert_array_equal(
        dctz_tpu.decompress(small), dctz_tpu.decompress(fast)
    )


def test_host_codec_zlib_and_zstd_reconstruct_identically():
    """host_codec only changes the stored bytes, never the decoded values;
    the zst flag reflects the backend in use."""
    from dctz_tpu.core import entropy

    if not entropy.zstd_available():
        pytest.skip("zstandard not installed")
    x = _signal(300_000, np.float32, seed=23)
    z = dctz_tpu.compress(x, config=_cfg(error_bound=1e-3))
    l = dctz_tpu.compress(x, config=_cfg(error_bound=1e-3, host_codec="zlib"))
    hz, *_ = ct.parse_v2(z)
    hl, *_ = ct.parse_v2(l)
    assert hz.zst and not hl.zst
    np.testing.assert_array_equal(
        dctz_tpu.decompress(z), dctz_tpu.decompress(l)
    )


def test_dpk_sharded_matches_single_chip():
    """Per-shard device packing must produce a container that decodes to
    the identical reconstruction (tile-major outputs concatenate into the
    global layout with no host reordering)."""
    import jax

    from dctz_tpu import compress_sharded
    from dctz_tpu.parallel import sharding as sh

    n = 64 * 256 * 8 * 2 + 1234  # not a quantum multiple: exercises padding
    x = _signal(n, np.float32, seed=21)
    mesh = sh.make_mesh()
    cfg = _cfg(error_bound=1e-3)
    blob = compress_sharded(x, config=cfg, mesh=mesh)
    from dctz_tpu.core import container as ct2

    header, *_ = ct2.parse_v2(blob)
    assert header.dpk
    y = dctz_tpu.decompress(blob)
    assert y.shape == x.shape
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]

    # reconstruction must equal the single-chip DPK path bit-for-bit on all
    # whole blocks (the tail block legitimately differs: the single-chip
    # XLA path uses the reference's rem-point tail basis, the sharded path
    # transforms a zero-padded 64-point block — both within bound)
    y1 = dctz_tpu.decompress(dctz_tpu.compress(x, config=cfg))
    full = (n // 64) * 64
    np.testing.assert_array_equal(y[:full], y1[:full])


@pytest.mark.parametrize("mode", ["ec", "qt"])
@pytest.mark.parametrize(
    "n", [64 * 256 * 8 * 2, 64 * 300, 50_000]
)
def test_dpk_sharded_decode_matches_single_chip(mode, n):
    """decompress_sharded on a DPK container must reconstruct bit-identically
    to the single-chip decode: whole-tile and partial-tile block-multiple
    sizes run the sharded program (zero-tile padding); a rem-point tail
    (n % 64 != 0, XLA-encoded) takes the documented single-chip fallback."""
    from dctz_tpu import decompress_sharded
    from dctz_tpu.parallel import sharding as sh

    x = _signal(n, np.float32, seed=n % 97)
    blob = dctz_tpu.compress(x, config=_cfg(mode=mode, error_bound=1e-3))
    header, *_ = ct.parse_v2(blob)
    assert header.dpk
    y1 = dctz_tpu.decompress(blob)
    y2 = decompress_sharded(blob, mesh=sh.make_mesh())
    assert y2.dtype == x.dtype and y2.shape == x.shape
    np.testing.assert_array_equal(y2, y1)


def test_dpk_sharded_decode_f64_container():
    """f64 DPK containers decode sharded too (f32 work dtype without x64,
    matching the single-chip path)."""
    from dctz_tpu import decompress_sharded
    from dctz_tpu.parallel import sharding as sh

    x = _signal(64 * 470, np.float64, seed=11)
    blob = dctz_tpu.compress(x, config=_cfg(error_bound=1e-3))
    y1 = dctz_tpu.decompress(blob)
    y2 = decompress_sharded(blob, mesh=sh.make_mesh())
    assert y2.dtype == np.float64
    np.testing.assert_array_equal(y2, y1)


@pytest.mark.parametrize("mode", ["ec", "qt"])
def test_dpk_sharded_verify(mode):
    """DPK + verify-repair + sharding compose."""
    from dctz_tpu import compress_sharded
    from dctz_tpu.parallel import sharding as sh

    rng = np.random.default_rng(4)
    x = (rng.standard_normal(64 * 256 * 8) * 20).astype(np.float32)
    cfg = _cfg(mode=mode, error_bound=1e-3, verify=True)
    blob = compress_sharded(x, config=cfg, mesh=sh.make_mesh())
    y = dctz_tpu.decompress(blob)
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]
