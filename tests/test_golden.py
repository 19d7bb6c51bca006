"""Golden-file compatibility tests.

Committed containers (tests/golden/) pin the on-disk formats across
development rounds: decoding them must keep producing bit-identical
reconstructions, and re-encoding the committed input must keep producing
bit-identical containers (float64 paths are deterministic). Any intentional
format change must regenerate the fixtures AND bump the container version.
"""

import hashlib
import json
import pathlib

import numpy as np
import pytest

import dctz_tpu
from dctz_tpu.config import CodecConfig

GOLDEN = pathlib.Path(__file__).parent / "golden"
MANIFEST = json.loads((GOLDEN / "manifest.json").read_text())


def _sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_decode_golden_container(name):
    """Also covers legacy (pre-IDS4, 3-section) v2 containers marked
    decode_only — old files must stay decodable forever."""
    meta = MANIFEST[name]
    blob = (GOLDEN / f"{name}.z").read_bytes()
    assert _sha(blob) == meta["blob_sha256"], "fixture corrupted?"
    y = dctz_tpu.decompress(blob)
    assert y.dtype == np.dtype(meta["dtype"])
    assert y.size == meta["n"]
    assert _sha(y.tobytes()) == meta["recon_sha256"]


@pytest.mark.parametrize(
    "name,cfgkw",
    [
        ("golden_v1_ec_f64", dict(mode="ec", container="v1")),
        ("golden_v1_qt_f64", dict(mode="qt", container="v1")),
        (
            "golden_v2_ec_f32",
            dict(mode="ec", container="v2", chunk_bytes=2048, ids_codec="deflate"),
        ),
        (
            "golden_v2_qt_f32",
            dict(mode="qt", container="v2", chunk_bytes=2048, ids_codec="deflate"),
        ),
        (
            "golden_v2_ec_f32_rans",
            dict(mode="ec", container="v2", chunk_bytes=2048, ids_codec="rans"),
        ),
        (
            "golden_v2_ec_f32_dpk",
            dict(mode="ec", container="v2", chunk_bytes=2048, ids_codec="device"),
        ),
        (
            "golden_v2_qt_f32_dpk",
            dict(mode="qt", container="v2", chunk_bytes=2048, ids_codec="device"),
        ),
        (
            "golden_v2_ec_f32_dpk_dcd",
            dict(
                mode="ec", container="v2", chunk_bytes=2048,
                ids_codec="device", dc_delta=True,
            ),
        ),
    ],
)
def test_reencode_matches_golden(name, cfgkw):
    if cfgkw.get("ids_codec") == "rans":
        from dctz_tpu import native

        if not native.available():
            pytest.skip("native rANS codec not built")
    x = np.fromfile(GOLDEN / "golden_input_f64.bin", np.float64)
    if MANIFEST[name]["dtype"] == "float32":
        x = x.astype(np.float32)
    blob = dctz_tpu.compress(x, config=CodecConfig(error_bound=1e-3, **cfgkw))
    assert _sha(blob) == MANIFEST[name]["blob_sha256"]
