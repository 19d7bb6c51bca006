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


def test_stream_dpk_fused_segments_roundtrip():
    """The DPK fused-segment writer + overlapped reader (ops/dpk_fuse in
    the stream pipeline): bound holds, frames are DPK v2 containers."""
    import jax

    from dctz_tpu.core import container as ct
    from dctz_tpu.ops import dpk_fuse

    old_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    dpk_fuse._FORCE, dpk_fuse._INTERPRET = True, True
    try:
        rng = np.random.default_rng(7)
        x = (np.sin(np.arange(1 << 18, dtype=np.float32) * 0.01) * 20
             + rng.standard_normal(1 << 18).astype(np.float32) * 0.05)
        cfg = CodecConfig(
            mode="ec", error_bound=1e-3, container="v2",
            ids_codec="device", verify=True,
        )
        buf = io.BytesIO()
        stream.compress_stream(x, buf, config=cfg, segment_elems=1 << 16)
        raw = buf.getvalue()
        # frames must be DPK v2 containers
        off = stream._HDR.size
        (flen,) = stream._FRAME.unpack_from(raw, off)
        hdr, _s, _q, _cb = ct.parse_v2(
            raw[off + stream._FRAME.size : off + stream._FRAME.size + flen]
        )
        assert hdr.dpk
        buf.seek(0)
        y = stream.decompress_stream_all(buf)
        tol = 1e-3 * (x.max() - x.min())
        assert y.shape == x.shape
        assert np.abs(y - x).max() <= tol
    finally:
        dpk_fuse._FORCE, dpk_fuse._INTERPRET = None, False
        jax.config.update("jax_enable_x64", old_x64)


def test_compress_segment_elems_routes_to_stream():
    """cfg.segment_elems pipelines the monolithic compress() into a DTZS
    stream; decompress() auto-detects and round-trips."""
    import jax

    from dctz_tpu.ops import dpk_fuse

    old_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    dpk_fuse._FORCE, dpk_fuse._INTERPRET = True, True
    try:
        x = np.sin(np.arange(1 << 18, dtype=np.float32) * 0.003) * 11
        cfg = CodecConfig(
            mode="ec", error_bound=1e-3, container="v2",
            ids_codec="device", verify=True, segment_elems=1 << 16,
        )
        blob = dctz_tpu.compress(x, config=cfg)
        assert blob[:4] == b"DTZS"
        y = dctz_tpu.decompress(blob)
        tol = 1e-3 * (x.max() - x.min())
        assert np.abs(y - x).max() <= tol
    finally:
        dpk_fuse._FORCE, dpk_fuse._INTERPRET = None, False
        jax.config.update("jax_enable_x64", old_x64)


def test_stream_truncated_raises():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(64 * 200).astype(np.float32)
    buf = io.BytesIO()
    stream.compress_stream(x, buf, 1e-3, "ec", segment_elems=64 * 100)
    raw = buf.getvalue()
    with pytest.raises(ValueError, match="truncated stream"):
        list(stream.decompress_stream(io.BytesIO(raw[: len(raw) // 2])))


def test_dump_tool_dtzs(tmp_path, capsys):
    from dctz_tpu.tools import dctz_dump

    x = np.sin(np.arange(64 * 300, dtype=np.float32) * 0.01) * 9
    buf = io.BytesIO()
    stream.compress_stream(x, buf, 1e-3, "ec", segment_elems=64 * 100)
    p = tmp_path / "s.dtzs"
    p.write_bytes(buf.getvalue())
    assert dctz_dump.main([str(p)]) == 0
    out = capsys.readouterr().out
    assert '"dtzs-stream"' in out and '"frames"' in out
