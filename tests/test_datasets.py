"""Real-dataset loader self-test against tiny committed raw-format fixtures
(tests/fixtures/realdata) — the re-anchor path stays warm: the day the
canonical MSST'19/CESM files are available, `--data-dir` flips every CSV row
to source=real with no new code (VERDICT round-3 #8; command documented in
BASELINE.md)."""

import pathlib

import numpy as np
import pytest

from dctz_tpu.eval import datasets as dsmod
from dctz_tpu.eval.datasets import Dataset, parse_list_file

FIX = pathlib.Path(__file__).parent / "fixtures" / "realdata"


def test_list_file_parses_reference_layout():
    entries = parse_list_file(FIX / "list-mini.txt")
    assert [(e.name, e.dims) for e in entries] == [
        ("mini_sedov.bin", (2560,)),
        ("MINI_FIELD_1_32_128", (32, 128)),
    ]


def test_loader_flips_to_real_with_data_dir():
    ds = Dataset("mini", (2560,), "f64", "climate", "mini_sedov.bin.f64")
    assert ds.source() == "synthetic"
    assert ds.source(FIX) == "real"
    x = ds.load(FIX)
    assert x.dtype == np.float64 and x.shape == (2560,)
    # real bytes, not the synthetic generator
    t = np.linspace(0, 6.0, 64 * 40)
    np.testing.assert_array_equal(x, np.sin(t * 3) * 17 + np.cos(t * 11) * 2)


def test_loader_f32_2d_fixture():
    ds = Dataset("minif", (32, 128), "f32", "climate",
                 "MINI_FIELD_1_32_128.dat")
    x = ds.load(FIX)
    assert x.dtype == np.float32 and x.size == 32 * 128


def test_loader_rejects_truncated_real_file(tmp_path):
    (tmp_path / "short.bin.f64").write_bytes(b"\0" * 100)
    ds = Dataset("short", (2560,), "f64", "climate", "short.bin.f64")
    with pytest.raises(ValueError, match="expected >="):
        ds.load(tmp_path)


def test_harness_row_records_source_real():
    """A sweep row over the fixture dir must carry source=real end to end
    (the exact signal BASELINE.md documents for the re-anchor)."""
    from dctz_tpu.eval.harness import run_one

    ds = Dataset("mini", (2560,), "f64", "climate", "mini_sedov.bin.f64")
    row = run_one(ds, 1e-3, "ec", "jax", data_dir=str(FIX), verify=True)
    assert row["source"] == "real"
    assert row["bound_satisfied"]
