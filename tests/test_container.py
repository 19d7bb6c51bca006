"""Container-format tests: the v1 byte layout must match the reference C
struct exactly (dctz.h:96-119), and v2 must round-trip."""

import struct

import numpy as np
import pytest

from dctz_tpu.core import container as ct


def _header(mode="ec", dtype=np.float64, ac=3):
    return ct.Header(
        dtype=np.dtype(dtype),
        num_elements=1000,
        error_bound=1e-3,
        ac_count=ac,
        scaling_factor=100.0,
        mean=0.25,
        bindex_nbytes=0,
        dc_nbytes=0,
        ac_nbytes=0,
        mode=mode,
    )


def test_v1_header_is_56_bytes():
    assert ct.V1_HEADER_SIZE == 56


def test_v1_field_offsets_double_ec():
    """Byte-for-byte layout of the x86-64 struct header (dctz.h:96-119)."""
    blob = ct.pack_v1(_header(), b"BB", b"DD", b"AA", None)
    assert struct.unpack_from("<i", blob, 0)[0] == 1  # DOUBLE tag
    assert struct.unpack_from("<I", blob, 4)[0] == 1000
    assert struct.unpack_from("<d", blob, 8)[0] == 1e-3
    assert struct.unpack_from("<I", blob, 16)[0] == 3
    assert struct.unpack_from("<d", blob, 24)[0] == 100.0  # sf union
    assert struct.unpack_from("<d", blob, 32)[0] == 0.25  # mean union
    assert struct.unpack_from("<III", blob, 40) == (2, 2, 2)
    assert blob[56:58] == b"BB"
    assert blob[58:60] == b"DD"
    assert blob[60:62] == b"AA"
    assert len(blob) == 62


def test_v1_float_union_low_bytes():
    """FLOAT data stores sf/mean as float32 in the union's low 4 bytes."""
    blob = ct.pack_v1(_header(dtype=np.float32), b"", b"", b"", None)
    assert struct.unpack_from("<i", blob, 0)[0] == 0  # FLOAT tag
    assert struct.unpack_from("<f", blob, 24)[0] == np.float32(100.0)
    assert struct.unpack_from("<f", blob, 32)[0] == np.float32(0.25)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_v1_qt_roundtrip_with_qtable(dtype):
    qtable = np.arange(64, dtype=dtype) + 1.5
    blob = ct.pack_v1(_header("qt", dtype), b"bi", b"dc", b"ac", qtable)
    hdr, bz, dz, az, qt = ct.parse_v1(blob)
    assert hdr.mode == "qt"
    assert hdr.dtype == np.dtype(dtype)
    assert (bz, dz, az) == (b"bi", b"dc", b"ac")
    np.testing.assert_array_equal(qt, qtable)
    # QT files carry bindex_count = N in the tail field (dctz-comp-lib.c:796).
    assert struct.unpack_from("<I", blob, 52)[0] == 1000


def test_v1_ec_mode_inferred_without_qtable():
    blob = ct.pack_v1(_header("ec"), b"bi", b"dc", b"ac", None)
    hdr, *_rest, qt = ct.parse_v1(blob)
    assert hdr.mode == "ec"
    assert qt is None


def test_v1_truncated_blob_raises():
    blob = ct.pack_v1(_header("ec"), b"bi" * 10, b"dc", b"ac", None)
    with pytest.raises(ValueError, match="truncated"):
        ct.parse_v1(blob[:40])


def test_v2_roundtrip():
    hdr = _header("qt", np.float32)
    qtable = np.linspace(1, 2, 64).astype(np.float32)
    streams = ([b"c0", b"c1"], [b"dc"], [])
    blob = ct.pack_v2(hdr, streams, qtable, 1 << 20)
    assert ct.detect_format(blob) == "v2"
    hdr2, streams2, qt2, cb = ct.parse_v2(blob)
    assert hdr2.mode == "qt"
    assert hdr2.num_elements == hdr.num_elements
    assert hdr2.error_bound == hdr.error_bound
    assert hdr2.scaling_factor == hdr.scaling_factor
    assert streams2 == (list(streams[0]), list(streams[1]), list(streams[2]))
    np.testing.assert_array_equal(qt2, qtable)
    assert cb == 1 << 20


def test_detect_format_v1():
    blob = ct.pack_v1(_header(), b"", b"", b"", None)
    assert ct.detect_format(blob) == "v1"
