"""Fused DPK kernels (ops/dpk_fuse.py): bit-identical containers and
decoded samples vs the XLA chains, across geometries, QT, padding tiles.

Interpret mode on the CPU backend; jit caches are cleared between dispatch
arms (_FORCE is not part of the jit key)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dctz_tpu import api
from dctz_tpu.config import CodecConfig
from dctz_tpu.core import constants as C
from dctz_tpu.core.quantize import chunk_width
from dctz_tpu.ops import compaction as cp
from dctz_tpu.ops import dpk_fuse, idpack


@pytest.fixture
def interp():
    dpk_fuse._FORCE, dpk_fuse._INTERPRET = True, True
    yield
    dpk_fuse._FORCE, dpk_fuse._INTERPRET = None, False
    idpack.pack_ids_with_ac.clear_cache()
    api._decode_device_dpk.clear_cache()


@pytest.fixture
def f32_mode():
    """The fused decode mirrors the TPU f32 path (x64 off)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)


def _stream(rng, nblk, bs=64, esc_p=0.02):
    mag = rng.geometric(p=0.4, size=(nblk, bs)).astype(np.int64) - 1
    decay = np.maximum(1, np.arange(bs) // 4)
    ids = np.minimum(mag * 8 // decay[None, :], 254)
    ids = np.where(rng.random((nblk, bs)) < esc_p, C.ESCAPE, ids)
    ids[:, 0] = C.ESCAPE
    vals = rng.standard_normal((nblk, bs)).astype(np.float32)
    return ids.astype(np.uint8), vals


NAMES = ["width", "packed", "exc_rows", "exc_counts", "ac", "acc", "dc", "ovf"]


@pytest.mark.parametrize("nblk", [256, 4096, 4096 + 128])
def test_encode_fused_streams_identical(interp, nblk):
    rng = np.random.default_rng(nblk)
    ids, vals = _stream(rng, nblk)
    nv = nblk * 64 - 7
    outs = {}
    for force in (True, False):
        dpk_fuse._FORCE = force
        idpack.pack_ids_with_ac.clear_cache()
        res = idpack.pack_ids_with_ac(
            jnp.asarray(ids), jnp.asarray(vals), nv, 256, 256
        )
        outs[force] = [np.asarray(x) for x in res]
    for a, b, nm in zip(outs[True], outs[False], NAMES):
        assert np.array_equal(a, b), nm


def test_encode_fused_overflow_flag(interp):
    """Dense escapes overflow the capacity identically in both arms."""
    rng = np.random.default_rng(0)
    ids, vals = _stream(rng, 512, esc_p=0.9)
    flags = {}
    for force in (True, False):
        dpk_fuse._FORCE = force
        idpack.pack_ids_with_ac.clear_cache()
        res = idpack.pack_ids_with_ac(
            jnp.asarray(ids), jnp.asarray(vals), 512 * 64, 256, 32
        )
        flags[force] = (bool(res[7]), np.asarray(res[3]))
    assert flags[True][0] and flags[False][0]
    assert np.array_equal(flags[True][1], flags[False][1])


def _container_arrays(rng, nblk, esc_p=0.02, cape=128, n=None):
    """Encoder-consistent device arrays: ids beyond n are coded as 0 and
    excluded from the AC stream, exactly like api._compress_fused."""
    ids, vals = _stream(rng, nblk, esc_p=esc_p)
    n_pad = nblk * 64
    n = n_pad if n is None else n
    cw = chunk_width(n_pad, 64)
    w, packed, exc_rows, exc_counts, ovf = idpack.pack_ids(
        jnp.asarray(ids), n, 256, cape
    )
    assert not bool(ovf)
    pos = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0) * 64
    pos = pos + jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1)
    esc = (
        (jnp.asarray(ids) == C.ESCAPE)
        & (jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1) >= 1)
        & (pos < n)
    )
    ac_rows, _, ovf2 = cp.compact_chunked(
        esc.reshape(-1), jnp.asarray(vals).reshape(-1), cw, min(cape, cw)
    )
    assert not bool(ovf2)
    dc = jnp.asarray(vals[:, 0])
    return (w, packed, exc_rows, ac_rows, dc), n, cw


@pytest.mark.parametrize("nblk", [256, 4096])
@pytest.mark.parametrize("mode", ["ec", "qt"])
def test_decode_fused_bit_identical(interp, f32_mode, nblk, mode):
    rng = np.random.default_rng(nblk + (0 if mode == "ec" else 1))
    (w, packed, exc_rows, ac_rows, dc), n, cw = _container_arrays(rng, nblk)
    sf = jnp.float32(2.5)
    cfg = api._device_cfg(CodecConfig(mode=mode, error_bound=1e-3))
    qt = (
        jnp.asarray(rng.uniform(1.0, 50.0, 64).astype(np.float32))
        if mode == "qt"
        else None
    )
    res = {}
    for force in (True, False):
        dpk_fuse._FORCE = force
        api._decode_device_dpk.clear_cache()
        x = api._decode_device_dpk(
            w, packed, exc_rows, dc, ac_rows, n, cfg,
            "float32", "chunked", 256, cw, sf, qt,
        )
        res[force] = np.asarray(x)
    assert res[True].shape == res[False].shape
    assert np.array_equal(res[True], res[False])


def test_decode_fused_partial_tail(interp, f32_mode):
    """n cutting into the last block: the kernel gate must fall back to the
    XLA chain (the partial tail needs the rem-point basis), so both arms
    agree bit-for-bit."""
    rng = np.random.default_rng(5)
    (w, packed, exc_rows, ac_rows, dc), n, cw = _container_arrays(
        rng, 300, cape=1 << 20,  # cape clamped to cw
        n=300 * 64 - 13,
    )
    cfg = api._device_cfg(CodecConfig(mode="ec", error_bound=1e-3))
    res = {}
    for force in (True, False):
        dpk_fuse._FORCE = force
        api._decode_device_dpk.clear_cache()
        x = api._decode_device_dpk(
            w, packed, exc_rows, dc, ac_rows, n, cfg,
            "float32", "chunked", 256, cw, jnp.float32(1.0), None,
        )
        res[force] = np.asarray(x)
    assert np.array_equal(res[True], res[False])


@pytest.fixture
def fused_path(monkeypatch):
    """Route compress() through _compress_fused on the CPU backend: chunked
    compaction forced on, every Pallas kernel in interpret mode. Without
    this, use_chunked_compaction() gates the fused dispatch OFF on CPU and
    cross-arm container comparisons are vacuous."""
    from dctz_tpu.ops import fused_encode as fe

    monkeypatch.setattr(cp, "use_chunked_compaction", lambda: True)
    fe._INTERPRET = True
    yield
    fe._INTERPRET = False
    for f in (
        fe.fused_encode_pipeline_dpk,
        fe.fused_encode_pipeline_dpk_ec,
        fe.fused_encode_ec,
        fe.fused_encode_qt,
        api._repair_fused,
    ):
        f.clear_cache()


def _clear_compress_caches():
    from dctz_tpu.ops import fused_encode as fe

    for f in (
        idpack.pack_ids_with_ac,
        fe.fused_encode_pipeline_dpk,
        fe.fused_encode_pipeline_dpk_ec,
        api._repair_fused,
        api._decode_device_dpk,
    ):
        f.clear_cache()


def test_verified_encode_streams_identical(interp, f32_mode, fused_path):
    """The in-kernel verify-repair (encode_x_fused) produces byte-identical
    containers to the XLA pipeline+repair+pack path, with repair genuinely
    active (sedov is the canonical pointwise-bound violator). The
    fused_path fixture forces the real _compress_fused dispatch on CPU —
    without it both arms silently take the non-fused path."""
    import dctz_tpu
    from dctz_tpu.eval.datasets import SUITES

    x = next(d for d in SUITES["msst19"] if d.name == "sedov").load()
    x = x.astype(np.float32)
    cfg_v = CodecConfig(
        mode="ec", error_bound=1e-3, container="v2",
        ids_codec="device", verify=True,
    )
    blobs = {}
    for force in (False, True):
        dpk_fuse._FORCE = force
        dpk_fuse._INTERPRET = True
        _clear_compress_caches()
        blobs[force] = dctz_tpu.compress(x, config=cfg_v)
    assert blobs[True] == blobs[False]
    # repair must actually fire on this data (bound violated unverified)
    cfg_n = CodecConfig(
        mode="ec", error_bound=1e-3, container="v2", ids_codec="device"
    )
    assert blobs[True] != dctz_tpu.compress(x, config=cfg_n)
    y = dctz_tpu.decompress(blobs[True])
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]


@pytest.mark.parametrize("verify", [False, True])
def test_encode_x_fused_tps_invariant(interp, f32_mode, verify):
    """Supertiling (dpk_fuse.TPS, round 5) is a pure grid-granularity
    change: streams are bit-identical at tps 1/3/4, including a tile
    count that does not divide tps (zero-padded supertiles slice off)."""
    from dctz_tpu.ops import fused_encode as fe
    from dctz_tpu.ops.repair import _SLACK

    rng = np.random.default_rng(5)
    n = 5 * dpk_fuse.TILE_N  # 5 tiles: pads at tps 3 and 4
    x = jnp.asarray(
        np.sin(np.arange(n, dtype=np.float32) * 0.01) * 20
        + rng.standard_normal(n).astype(np.float32) * 5.0
    )
    sf = jnp.asarray(100.0, jnp.float32)
    tol = (jnp.max(x) - jnp.min(x)) * jnp.float32(1e-3) * _SLACK
    cw = chunk_width(n, 64)
    old = dpk_fuse.TPS
    outs = {}
    try:
        for tps in (1, 3, 4):
            dpk_fuse.TPS = tps
            res = dpk_fuse.encode_x_fused(
                x, sf, tol, n - 11, 1e-3, idpack.CAPE, cw, verify
            )
            outs[tps] = [np.asarray(v) for v in res]
    finally:
        dpk_fuse.TPS = old
    names = NAMES + ["ok"]
    for tps in (3, 4):
        for a, b, nm in zip(outs[1], outs[tps], names):
            assert np.array_equal(a, b), (tps, nm)


def test_encode_sharded_fused_streams_identical(interp, f32_mode):
    """The per-shard fused kernel inside encode_sharded produces the same
    streams as the XLA shard body, on the 8-virtual-device mesh."""
    from dctz_tpu.parallel import sharding as sh
    from dctz_tpu.ops import fused_encode  # noqa: F401

    rng = np.random.default_rng(1)
    n = 8 * 256 * 64 * 2  # 2 tiles per shard
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 9)
    mesh = sh.make_mesh()
    cfg = api._device_cfg(
        CodecConfig(mode="ec", error_bound=1e-3, verify=True)
    )
    outs = {}
    for force in (True, False):
        dpk_fuse._FORCE = force
        sh.encode_sharded.clear_cache()
        o = sh.encode_sharded(
            x, n_real=n - 5, cfg=cfg, ac_capacity=None, mesh=mesh,
            compaction="chunked", dpk=True,
        )
        if int(np.asarray(o[-1])) or int(np.asarray(o[4])):
            # capacity overflow: api retries at full chunk width (the two
            # arms clip the discarded attempt differently — the fused AC
            # rides the exception union, the XLA arm compacts it directly)
            from dctz_tpu.core import quantize as qz

            cw = qz.chunk_width(n // 8, 64)
            o = sh.encode_sharded(
                x, n_real=n - 5, cfg=cfg, ac_capacity=cw, mesh=mesh,
                compaction="chunked", dpk=True, cape=1 << 20,
            )
        outs[force] = [np.asarray(v) for v in o]
    names = [
        "bin_ids", "dc", "ac", "acc", "ovf", "sf", "mean", "qt", "ok",
        "width", "packed", "exc", "excc", "acc2", "eovf",
    ]
    for i, nm in enumerate(names):
        if nm == "bin_ids":
            continue  # the fused arm emits zeros (unused for DPK frames)
        assert np.array_equal(outs[True][i], outs[False][i]), nm


@pytest.mark.parametrize("verify", [False, True])
def test_qt_encode_streams_identical(interp, f32_mode, fused_path, verify):
    """QT through the x-input kernel (qmax pass + renormalizing quantize +
    optional in-kernel verify) produces byte-identical containers to the
    two-kernel + pack / pipeline+repair+pack XLA arms."""
    import dctz_tpu
    from dctz_tpu.eval.datasets import SUITES
    from dctz_tpu.ops import fused_encode as fe

    x = next(d for d in SUITES["msst19"] if d.name == "sedov").load()
    x = x.astype(np.float32)
    cfg = CodecConfig(
        mode="qt", error_bound=1e-3, container="v2",
        ids_codec="device", verify=verify,
    )
    blobs = {}
    for force in (False, True):
        dpk_fuse._FORCE = force
        dpk_fuse._INTERPRET = True
        _clear_compress_caches()
        fe.fused_encode_pipeline_dpk_qt.clear_cache()
        fe.fused_encode_pipeline_dpk_qt_v2.clear_cache()
        blobs[force] = dctz_tpu.compress(x, config=cfg)
    assert blobs[True] == blobs[False]
    y = dctz_tpu.decompress(blobs[True])
    m = dctz_tpu.evaluate(x, y, 1e-3)
    if verify:
        assert m["bound_satisfied"]


def test_roundtrip_public_api(interp, f32_mode, fused_path):
    """compress/decompress through the public API with the fused kernels
    forced on vs off (real _compress_fused dispatch via fused_path):
    container identical, decode bound holds."""
    rng = np.random.default_rng(11)
    arr = (
        np.sin(np.arange(1 << 16, dtype=np.float32) * 0.01) * 20
        + rng.standard_normal(1 << 16).astype(np.float32) * 0.05
    )
    import dctz_tpu

    cfg = CodecConfig(error_bound=1e-3, container="v2", ids_codec="device")
    dpk_fuse._FORCE = False
    dpk_fuse._INTERPRET = True
    _clear_compress_caches()
    blob_ref = dctz_tpu.compress(arr, config=cfg)
    dpk_fuse._FORCE = True
    _clear_compress_caches()
    blob = dctz_tpu.compress(arr, config=cfg)
    assert blob == blob_ref
    rec = dctz_tpu.decompress(blob)
    rng_span = arr.max() - arr.min()
    assert np.abs(rec - arr).max() <= 1e-3 * rng_span + 1e-9


def test_decode_sharded_fused_bit_identical(interp, f32_mode):
    """decode_sharded_dpk's fused per-shard kernel matches the XLA shard
    body on the 8-virtual-device mesh."""
    from dctz_tpu.parallel import sharding as sh

    rng = np.random.default_rng(3)
    nblk = 8 * 256 * 2
    (w, packed, exc_rows, ac_rows, dc), n, cw = _container_arrays(rng, nblk)
    mesh = sh.make_mesh()
    cfg = api._device_cfg(CodecConfig(mode="ec", error_bound=1e-3))
    res = {}
    for force in (True, False):
        dpk_fuse._FORCE = force
        sh.decode_sharded_dpk.clear_cache()
        x = sh.decode_sharded_dpk(
            w, packed, exc_rows, dc, ac_rows, jnp.float32(1.5), None,
            tile_b=256, cw=cw, cfg=cfg, dtype="float32", mesh=mesh,
        )
        res[force] = np.asarray(x)
    assert np.array_equal(res[True], res[False])
