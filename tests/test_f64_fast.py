"""f64 fast-path policy (docs/numerics.md): on TPU-like backends, float64
input with a v2 truncated container at eb >= 1e-5 runs the f32 pipeline —
encode and decode — instead of software-emulated x64. CPU tests force the
backend gate via the api._FORCE_F64_FAST hook."""

import dataclasses

import numpy as np
import pytest

import dctz_tpu
from dctz_tpu import api
from dctz_tpu.config import CodecConfig
from dctz_tpu.core import container as ct


@pytest.fixture
def tpu_policy(monkeypatch):
    monkeypatch.setattr(api, "_FORCE_F64_FAST", True)


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 60, n)
    return (
        np.sin(t) * 40 + np.sin(t * 13.7) * 3 + rng.standard_normal(n) * 0.05
    ).astype(np.float64)


def test_policy_gates():
    v2 = CodecConfig(error_bound=1e-3, container="v2")
    try:
        api._FORCE_F64_FAST = True
        assert api._f64_fast_eligible(v2)
        assert not api._f64_fast_eligible(
            dataclasses.replace(v2, container="v1")
        ), "v1 keeps reference byte parity"
        assert not api._f64_fast_eligible(
            dataclasses.replace(v2, truncate=False)
        ), "exact f64 escapes requested"
        assert not api._f64_fast_eligible(
            dataclasses.replace(v2, error_bound=2e-6)
        ), "below the f32 precision floor"
        assert not api._f64_fast_eligible(
            dataclasses.replace(v2, internal_dtype="float32")
        ), "explicit pin bypasses the auto policy"
        api._FORCE_F64_FAST = False
        assert not api._f64_fast_eligible(v2), "CPU/GPU keep native f64"
    finally:
        api._FORCE_F64_FAST = None


def test_promoted_encode_matches_forced_f32(tpu_policy):
    """Under the policy, auto f64 compression IS the internal_dtype=float32
    compression (byte-for-byte), with the header still declaring float64."""
    x = _signal(50_000)
    cfg = CodecConfig(error_bound=1e-3, container="v2")
    z_auto = dctz_tpu.compress(x, config=cfg)
    z_f32 = dctz_tpu.compress(
        x, config=dataclasses.replace(cfg, internal_dtype="float32")
    )
    assert z_auto == z_f32
    header, *_ = ct.parse_v2(z_auto)
    assert header.dtype == np.float64

    y = dctz_tpu.decompress(z_auto)
    assert y.dtype == np.float64
    assert dctz_tpu.evaluate(x, y, 1e-3, len(z_auto))["bound_satisfied"]


def test_promoted_decode_work_dtype(tpu_policy):
    """Decode symmetry: v2 truncated f64 headers pick the f32 work dtype
    under the policy; v1 and tight-bound headers keep float64."""
    x = _signal(20_000, seed=2)
    z = dctz_tpu.compress(x, config=CodecConfig(error_bound=1e-3, container="v2"))
    header, *_ = ct.parse_v2(z)
    assert api._decode_work_dtype(header, True) == "float32"
    assert api._decode_work_dtype(header, False) == "float64", "v1 exempt"
    tight = dataclasses.replace(header, error_bound=2e-6)
    assert api._decode_work_dtype(tight, True) == "float64"
    # end-to-end through the promoted decode
    y = dctz_tpu.decompress(z)
    assert y.dtype == np.float64
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]


def test_sharded_promotion(tpu_policy):
    """compress_sharded applies the same policy (f32 shards on the mesh)."""
    from dctz_tpu.parallel import sharding as sh

    x = _signal(64 * 256 * 8, seed=3)
    cfg = CodecConfig(error_bound=1e-3, container="v2")
    blob = dctz_tpu.compress_sharded(x, config=cfg, mesh=sh.make_mesh())
    header, *_ = ct.parse_v2(blob)
    assert header.dtype == np.float64
    y = dctz_tpu.decompress(blob)
    assert y.dtype == np.float64
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]


def test_verify_composes_with_promotion(tpu_policy):
    """verify=True certifies the pointwise bound on the promoted path."""
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(30_000) * 25).astype(np.float64)
    cfg = CodecConfig(error_bound=1e-4, container="v2", verify=True)
    z = dctz_tpu.compress(x, config=cfg)
    y = dctz_tpu.decompress(z)
    m = dctz_tpu.evaluate(x, y, 1e-4, len(z))
    assert m["bound_satisfied"], m
