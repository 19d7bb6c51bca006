"""Parser robustness: malformed containers must raise clean ValueErrors,
never crash or silently mis-decode (the reference exits or segfaults on
malformed input — dctz-decomp-lib.c trusts the header blindly)."""

import numpy as np
import pytest

import dctz_tpu
from dctz_tpu.config import CodecConfig
from dctz_tpu.core import container as ct


@pytest.fixture(scope="module")
def blobs():
    x = np.sin(np.linspace(0, 30, 5000))
    return {
        "v1": dctz_tpu.compress(x, 1e-3, "ec"),
        "v2": dctz_tpu.compress(
            x, config=CodecConfig(error_bound=1e-3, container="v2")
        ),
    }


def test_empty_blob():
    with pytest.raises(ValueError):
        dctz_tpu.decompress(b"")


def test_garbage_blob():
    with pytest.raises(Exception) as ei:
        dctz_tpu.decompress(b"\x00" * 200)
    assert not isinstance(ei.value, (SystemExit, MemoryError))


@pytest.mark.parametrize("fmt", ["v1", "v2"])
def test_truncated_blob(blobs, fmt):
    blob = blobs[fmt]
    for cut in (10, len(blob) // 2, len(blob) - 3):
        with pytest.raises(Exception) as ei:
            dctz_tpu.decompress(blob[:cut])
        assert not isinstance(ei.value, (SystemExit, MemoryError))


def test_v2_bad_version(blobs):
    blob = bytearray(blobs["v2"])
    blob[4] = 99  # version field
    with pytest.raises(ValueError, match="version"):
        ct.parse_v2(bytes(blob))


def test_v1_header_only():
    hdr = ct.pack_v1(
        ct.Header(
            dtype=np.dtype(np.float64),
            num_elements=100,
            error_bound=1e-3,
            ac_count=0,
            scaling_factor=1.0,
            mean=0.0,
            bindex_nbytes=0,
            dc_nbytes=0,
            ac_nbytes=0,
            mode="ec",
        ),
        b"",
        b"",
        b"",
        None,
    )
    # zero-length streams: inflate fails cleanly
    with pytest.raises(Exception) as ei:
        dctz_tpu.decompress(hdr)
    assert not isinstance(ei.value, (SystemExit, MemoryError))


def test_stream_truncated_frame():
    import io

    from dctz_tpu import stream

    x = np.sin(np.linspace(0, 5, 1000))
    buf = io.BytesIO()
    stream.compress_stream(x, buf, 1e-3, "ec")
    data = buf.getvalue()
    with pytest.raises(Exception) as ei:
        list(stream.decompress_stream(io.BytesIO(data[: len(data) // 2])))
    assert not isinstance(ei.value, (SystemExit, MemoryError))
