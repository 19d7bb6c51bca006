"""Streamed/segmented container tests (multi-TB checkpoint story)."""

import io

import numpy as np
import pytest

import dctz_tpu
from dctz_tpu import stream
from dctz_tpu.config import CodecConfig


@pytest.mark.parametrize("mode", ["ec", "qt"])
def test_stream_roundtrip(mode):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64 * 700 + 21) * 30
    buf = io.BytesIO()
    stream.compress_stream(x, buf, 1e-3, mode, segment_elems=64 * 100)
    buf.seek(0)
    y = stream.decompress_stream_all(buf)
    assert y.shape == x.shape
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]


def test_stream_matches_monolithic_reconstruction():
    """Fixed global sf + block-aligned segments => identical reconstruction
    to the single-shot codec."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(64 * 512) * 5
    buf = io.BytesIO()
    stream.compress_stream(x, buf, 1e-4, "ec", segment_elems=64 * 128)
    buf.seek(0)
    y_stream = stream.decompress_stream_all(buf)
    y_mono = dctz_tpu.decompress(
        dctz_tpu.compress(x, config=CodecConfig(mode="ec", error_bound=1e-4, container="v2"))
    )
    np.testing.assert_array_equal(y_stream, y_mono)


def test_stream_segments_independently_decodable():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(64 * 300).astype(np.float32)
    buf = io.BytesIO()
    stream.compress_stream(x, buf, 1e-3, "ec", segment_elems=64 * 100)
    buf.seek(0)
    segs = list(stream.decompress_stream(buf))
    assert len(segs) == 3
    np.testing.assert_array_equal(np.concatenate(segs).shape, x.shape)


def test_stream_bad_magic():
    with pytest.raises(ValueError, match="not a DCTZ-TPU stream"):
        list(stream.decompress_stream(io.BytesIO(b"JUNK" + b"\0" * 12)))
