"""Per-plane float-stream codec ("PLC", entropy.encode_float_stream).

The v2 DC/AC sections default to per-plane coding: byte planes of the
shuffled stream each pick raw vs deflate by a cheap sample probe. These
tests pin the round-trip, the self-describing directory, the method
selection, and the container integration (flag plc, legacy decode)."""

import numpy as np
import pytest

import dctz_tpu
from dctz_tpu.config import CodecConfig
from dctz_tpu.core import container as ct
from dctz_tpu.core import entropy


def _roundtrip(
    raw: bytes, isz: int, chunk_bytes: int = 1 << 20, use_zlib: bool = False
) -> list[bytes]:
    chunks = entropy.encode_float_stream(raw, isz, chunk_bytes, 6, use_zlib)
    assert entropy.decode_float_stream(chunks) == raw
    return chunks


@pytest.mark.parametrize("isz", [1, 4, 8])
@pytest.mark.parametrize("n_items", [0, 1, 7, 1000, 100_000])
def test_plc_roundtrip_random(isz, n_items):
    rng = np.random.default_rng(n_items + isz)
    raw = rng.integers(0, 256, n_items * isz, dtype=np.uint8).tobytes()
    _roundtrip(raw, isz)


def test_plc_method_selection_float32():
    """Float-like data: low mantissa planes stored raw, exponent plane
    entropy-coded (the whole point of the codec) — zstd (method 3) on the
    default backend, deflate (method 1) on the zlib parity backend."""
    rng = np.random.default_rng(0)
    vals = (rng.normal(size=50_000).astype(np.float32) * 0.01).tobytes()
    chunks = _roundtrip(vals, 4)
    methods = list(chunks[0][1:5])
    assert methods[0] == 0 and methods[1] == 0, "mantissa planes must be raw"
    want = 3 if entropy.zstd_available() else 1
    assert methods[3] == want, "sign/exponent plane must be entropy-coded"
    zl_chunks = _roundtrip(vals, 4, use_zlib=True)
    assert list(zl_chunks[0][1:5])[3] == 1, "zlib backend must pick deflate"
    # coded size must match whole-stream shuffle+deflate within 2%
    legacy = len(
        entropy.deflate(entropy.shuffle_bytes(vals, 4), 6)
    )
    assert sum(map(len, chunks)) <= legacy * 1.02
    assert sum(map(len, zl_chunks)) <= legacy * 1.02


def test_plc_rans_method_on_large_entropy_plane():
    """A large plane whose deflate gain is pure entropy (no LZ structure)
    must pick method 2 (native rANS) and round-trip; DC-like planes with
    run structure must stay on deflate."""
    from dctz_tpu import native

    if not native.available():
        pytest.skip("native rANS codec not built")
    rng = np.random.default_rng(5)
    n = 1 << 18
    # two-plane u16 items: plane 0 = skewed entropy bytes (rans territory),
    # plane 1 = long runs (deflate territory)
    skewed = rng.choice(
        np.arange(64, dtype=np.uint8), size=n, p=np.ones(64) / 64
    )
    runs = np.repeat(
        rng.integers(0, 4, n // 512, dtype=np.uint8), 512
    )
    raw = (
        skewed.astype(np.uint16) | (runs.astype(np.uint16) << 8)
    ).tobytes()
    chunks = _roundtrip(raw, 2, use_zlib=True)
    methods = list(chunks[0][1:3])
    assert methods[0] == 2, methods
    assert methods[1] == 1, methods
    if entropy.zstd_available():
        # the default backend codes both planes with zstd (method 3)
        z_chunks = _roundtrip(raw, 2)
        assert list(z_chunks[0][1:3]) == [3, 3]


def test_plc_misaligned_degrades_to_single_plane():
    raw = b"x" * 1001  # not a multiple of 4
    chunks = entropy.encode_float_stream(raw, 4, 1 << 20, 6)
    assert chunks[0][0] == 1  # itemsize forced to 1
    assert entropy.decode_float_stream(chunks) == raw


def test_plc_truncated_plane_fails_loudly():
    raw = np.arange(4096, dtype=np.float32).tobytes()
    chunks = entropy.encode_float_stream(raw, 4, 1 << 20, 6)
    bad = list(chunks)
    # drop a chunk from the end: plane length mismatch must raise
    bad = bad[:-1]
    with pytest.raises((ValueError, IndexError)):
        entropy.decode_float_stream(bad)


def test_v2_container_sets_plc_flag_and_roundtrips():
    rng = np.random.default_rng(3)
    x = rng.normal(size=9000).astype(np.float32).cumsum().astype(np.float32)
    cfg = CodecConfig(error_bound=1e-3, container="v2")
    blob = dctz_tpu.compress(x, config=cfg)
    header, _, _, _ = ct.parse_v2(blob)
    assert header.plc
    y = dctz_tpu.decompress(blob)
    assert np.abs(np.asarray(y) - x).max() <= 255 * 1e-3 * header.scaling_factor


def test_v2_container_float_codec_deflate_legacy_path():
    rng = np.random.default_rng(4)
    x = rng.normal(size=9000).astype(np.float32)
    cfg = CodecConfig(error_bound=1e-3, container="v2", float_codec="deflate")
    blob = dctz_tpu.compress(x, config=cfg)
    header, _, _, _ = ct.parse_v2(blob)
    assert not header.plc
    y = dctz_tpu.decompress(blob)
    assert y.size == x.size
