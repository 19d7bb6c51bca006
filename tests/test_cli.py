"""CLI driver tests (dctz-test.c argv-protocol parity)."""

import numpy as np
import pytest

from dctz_tpu.cli import main


@pytest.fixture()
def data_file(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(6400) * 20
    path = tmp_path / "var.bin"
    x.tofile(path)
    return path, x


def test_basic_roundtrip_double(data_file, capsys, monkeypatch):
    path, x = data_file
    monkeypatch.chdir(path.parent)
    rc = main(["-d", "1E-3", "testvar", str(path), "6400"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "total number of elements = 6400" in out
    assert "outsize = " in out
    assert "CR = " in out and "PSNR = " in out
    assert "Max relative error" in out
    # Output artifacts like the reference driver (dctz-test.c:222-267),
    # embedding the literal error-bound token (dctz-test.c:100)
    z = path.parent / "var.bin.ec.1E-3.z"
    assert z.exists()
    r = np.fromfile(str(z) + ".r", np.float64)
    rel = np.abs(r - x).max() / (x.max() - x.min())
    assert rel <= 1e-3


def test_qt_mode_and_json(data_file, capsys, monkeypatch):
    path, _ = data_file
    monkeypatch.chdir(path.parent)
    rc = main(["-d", "1E-4", "v", str(path), "6400", "--mode", "qt", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    import json

    last = [l for l in out.splitlines() if l.startswith("{")][-1]
    m = json.loads(last)
    assert m["bound_satisfied"]
    assert m["mode"] == "qt"
    assert (path.parent / "var.bin.qt.1E-4.z").exists()


def test_2d_dims_and_solname(tmp_path, capsys):
    x = np.linspace(0, 1, 80 * 25, dtype=np.float32)
    path = tmp_path / "f.dat"
    x.tofile(path)
    rc = main(
        ["-f", "1E-3", "v", str(path), "80", "25", "sol(1E-3)", "--no-write"]
    )
    assert rc == 0
    assert "total number of elements = 2000" in capsys.readouterr().out


def test_float_flag(tmp_path):
    x = (np.sin(np.linspace(0, 20, 5000)) * 7).astype(np.float32)
    path = tmp_path / "f32.bin"
    x.tofile(path)
    rc = main(["-f", "1E-3", "v", str(path), "5000", "--no-write"])
    assert rc == 0


def test_sharded_engine(tmp_path):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    x = (np.sin(np.linspace(0, 20, 64 * 64)) * 7).astype(np.float32)
    path = tmp_path / "s.bin"
    x.tofile(path)
    rc = main(["-f", "1E-3", "v", str(path), str(x.size), "--sharded", "--no-write"])
    assert rc == 0


def test_native_engine(tmp_path):
    from dctz_tpu import native

    if not native.available():
        pytest.skip("native codec not built")
    x = np.sin(np.linspace(0, 20, 5000)) * 7
    path = tmp_path / "n.bin"
    x.tofile(path)
    rc = main(["-d", "1E-3", "v", str(path), "5000", "--native", "--no-write"])
    assert rc == 0


def test_ids_codec_device(tmp_path, capsys):
    """--ids-codec device emits a DPK v2 container and round-trips."""
    from dctz_tpu.core import container as ct

    x = (np.sin(np.linspace(0, 30, 70_000)) * 9).astype(np.float32)
    path = tmp_path / "dpk.bin"
    x.tofile(path)
    rc = main(
        [
            "-f", "1E-3", "v", str(path), "70000",
            "--container", "v2", "--ids-codec", "device",
        ]
    )
    assert rc == 0
    header, *_ = ct.parse_v2((tmp_path / "dpk.bin.ec.1E-3.z").read_bytes())
    assert header.dpk
