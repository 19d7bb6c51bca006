"""Multi-host tests: the single-process degenerate path AND a REAL
2-process jax.distributed run (each worker owns 2 virtual CPU devices,
compresses only its addressable slice, writes its part of the DTZS stream;
this process concatenates and round-trips the result)."""

import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

import dctz_tpu
from dctz_tpu.parallel import multihost as mh


def test_init_noop_single_process():
    mh.init()  # must not raise


def test_host_slice_single_process():
    start, stop = mh.host_slice(64 * 100)
    assert start == 0
    assert stop >= 64 * 100
    assert stop % 64 == 0


def test_compress_multihost_single_process_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64 * 200 + 5) * 12
    blob = mh.compress_multihost(x, x.size, 1e-3, "ec")
    y = dctz_tpu.decompress(blob)
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize(
    "mode,codec",
    [("ec", "auto"), ("qt", "auto"), ("ec", "device")],
)
def test_multiprocess_two_hosts(tmp_path, mode, codec):
    """2 real jax.distributed processes x 2 virtual devices each: every
    host writes only its own frames; the concatenation must decode in one
    process within the bound (VERDICT: 'a multi-process test producing a
    valid DTZS stream that single-process decompress() round-trips').
    codec="device" additionally runs the per-shard id coder so each frame
    carries device-packed ids."""
    worker = pathlib.Path(__file__).parent / "_mh_worker.py"
    n_total = 64 * 311 + 7  # uneven: padding lives on the last host
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"part{pid}.bin"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    str(worker),
                    coordinator,
                    "2",
                    str(pid),
                    str(n_total),
                    mode,
                    str(out),
                    codec,
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]

    blob = b"".join(o.read_bytes() for o in outs)
    y = dctz_tpu.decompress(blob)

    import importlib.util

    spec = importlib.util.spec_from_file_location("_mh_worker", worker)
    wmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wmod)
    x = wmod.make_data(n_total)
    assert y.shape == x.shape
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]


def _run_workers(tmp_path, n_total, nproc, phase, codec, stream=None,
                 tag=""):
    """Launch nproc jax.distributed workers; returns their output paths."""
    worker = pathlib.Path(__file__).parent / "_mh_worker.py"
    coordinator = f"127.0.0.1:{_free_port()}"
    procs, outs = [], []
    for pid in range(nproc):
        if phase == "restore":
            out = tmp_path / f"restore{tag}{pid}.npz"
            argv = [
                sys.executable, str(worker), coordinator, str(nproc),
                str(pid), str(n_total), "restore", str(out), codec,
                str(stream),
            ]
        else:
            out = tmp_path / f"part{tag}{pid}.bin"
            argv = [
                sys.executable, str(worker), coordinator, str(nproc),
                str(pid), str(n_total), phase, str(out), codec,
            ]
        outs.append(out)
        procs.append(
            subprocess.Popen(
                argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE
            )
        )
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
    return outs


def _reassemble(parts_npz, n_total):
    full = np.zeros(n_total, np.float64)
    frames_per_host = []
    for pz in parts_npz:
        start = int(pz["start"])
        data = pz["data"]
        full[start : start + data.size] = data[: max(0, n_total - start)]
        frames_per_host.append(tuple(pz["frames"].tolist()))
    return full, frames_per_host


def test_multiprocess_4x2_uneven_save_then_mismatched_restore(tmp_path):
    """4 jax.distributed writer processes (the tail host's slice is mostly
    padding — uneven shares), then a RESTORE by 2 processes: the reader
    process count does not match the writer's, so each reader host decodes
    the two frames overlapping its slice (the overlap-decode branch of
    decompress_multihost)."""
    n_total = 64 * 1700 + 13  # 4x 32768-elem shares; host 3 holds 10509 real
    outs = _run_workers(tmp_path, n_total, 4, "ec", "device")
    stream = b"".join(o.read_bytes() for o in outs)
    (tmp_path / "stream4.bin").write_bytes(stream)

    import importlib.util

    worker = pathlib.Path(__file__).parent / "_mh_worker.py"
    spec = importlib.util.spec_from_file_location("_mh_worker", worker)
    wmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wmod)
    x = wmod.make_data(n_total)

    # sanity: the 4-host stream restores in ONE process
    y = dctz_tpu.decompress(stream)
    assert y.shape == x.shape
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]

    # mismatched restore: 2 readers x 2 devices over the 4-frame stream
    router = _run_workers(
        tmp_path, n_total, 2, "restore", "device",
        stream=tmp_path / "stream4.bin", tag="m",
    )
    parts = [np.load(o) for o in router]
    full, frames = _reassemble(parts, n_total)
    # each reader host decoded exactly the TWO writer frames of its slice
    assert sorted(len(f) for f in frames) == [2, 2], frames
    assert len({f for fs in frames for f in fs}) == 4
    assert dctz_tpu.evaluate(x, full, 1e-3)["bound_satisfied"]


def test_distributed_restore_partial_frame_overlap(tmp_path):
    """Frames written by a single process (compress_stream, odd segment
    size) restored by 2 distributed processes: frame boundaries do NOT
    align with reader slices, so hosts decode shared frames and slice —
    the decode-and-slice branch with a REAL overlap."""
    import io

    from dctz_tpu import stream as dstream

    worker = pathlib.Path(__file__).parent / "_mh_worker.py"
    import importlib.util

    spec = importlib.util.spec_from_file_location("_mh_worker", worker)
    wmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wmod)

    n_total = 64 * 900 + 7
    x = wmod.make_data(n_total)
    buf = io.BytesIO()
    dstream.compress_stream(x, buf, 1e-3, "ec", segment_elems=64 * 300)
    (tmp_path / "streamS.bin").write_bytes(buf.getvalue())

    outs = _run_workers(
        tmp_path, n_total, 2, "restore", "auto",
        stream=tmp_path / "streamS.bin", tag="p",
    )
    parts = [np.load(o) for o in outs]
    full, frames = _reassemble(parts, n_total)
    # a shared frame proves the partial-overlap branch ran
    all_frames = [f for fs in frames for f in fs]
    assert len(all_frames) > len(set(all_frames)), frames
    assert dctz_tpu.evaluate(x, full, 1e-3)["bound_satisfied"]


def test_decompress_multihost_single_process():
    """Single-process restore returns the whole array with start 0."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(64 * 150 + 9) * 7
    blob = mh.compress_multihost(x, x.size, 1e-3, "ec")
    res = mh.decompress_multihost(blob)
    assert res.start == 0
    assert res.data.shape == x.shape
    assert dctz_tpu.evaluate(x, res.data, 1e-3)["bound_satisfied"]


def test_decompress_multihost_monolithic_single_process():
    """A monolithic (non-DTZS) container restores too: single process gets
    the whole array back with start 0."""
    from dctz_tpu.config import CodecConfig

    rng = np.random.default_rng(5)
    x = (rng.standard_normal(64 * 170 + 3) * 9).astype(np.float32)
    blob = dctz_tpu.compress(
        x, config=CodecConfig(error_bound=1e-3, container="v2",
                              segment_elems=0)
    )
    assert blob[:4] != b"DTZS"
    res = mh.decompress_multihost(blob)
    assert res.start == 0 and res.frames == ()
    assert dctz_tpu.evaluate(x, res.data, 1e-3)["bound_satisfied"]


def test_dpk_range_decode_matches_full():
    """api._decompress_dpk_range: tile-range decodes concatenate to the
    byte-exact full decode, for every host codec of the packed section
    (verbatim / zstd / deflate / rANS) and a ragged tail tile."""
    from dctz_tpu import api
    from dctz_tpu.config import CodecConfig
    from dctz_tpu.core import container as ct
    from dctz_tpu.ops import idpack

    rng = np.random.default_rng(11)
    for n, codec in [
        ((1 << 16) + 777, "none"),
        (1 << 16, "zstd"),
        (1 << 16, "deflate"),
        (1 << 15, "rans"),
    ]:
        x = (
            np.sin(np.arange(n, dtype=np.float32) * 0.01) * 20
            + rng.standard_normal(n).astype(np.float32) * 0.05
        )
        cfg = CodecConfig(
            mode="ec", error_bound=1e-3, container="v2",
            ids_codec="device", dpk_host_codec=codec, segment_elems=0,
        )
        blob = dctz_tpu.compress(x, config=cfg)
        header, streams, qtable, _cb = ct.parse_v2(blob)
        assert header.dpk, (n, codec)
        full = dctz_tpu.decompress(blob)
        n_stream, tile_b, cw = api._dpk_meta(header, streams)
        t = idpack.tiles_of(-(-n_stream // header.block_size), tile_b)
        cuts = sorted({0, t // 3, 2 * t // 3, t})
        y = np.concatenate([
            api._decompress_dpk_range(header, streams, qtable, a, b)
            for a, b in zip(cuts[:-1], cuts[1:])
        ])
        np.testing.assert_array_equal(y, full, err_msg=f"{n} {codec}")


def _chunk_offset(blob: bytes, chunk: memoryview) -> int:
    """Byte offset of a parse_v2 zero-copy chunk view within the blob."""
    base = np.frombuffer(blob, np.uint8)
    return np.frombuffer(chunk, np.uint8).ctypes.data - base.ctypes.data


@pytest.mark.parametrize("codec", ["zstd", "none"])
def test_dpk_range_decode_deferred_crc_is_range_local(monkeypatch, codec):
    """parse_v2(chunk_crcs="defer") + _decompress_dpk_range verifies ONLY
    the chunks the tile range touches: corruption outside the range goes
    unnoticed by the range decode (but is caught by the default full parse
    and by a range that covers it), and the crc'd payload bytes scale with
    the range, not the container. Covers the chunk-decoded (zstd) and the
    verbatim (covering-chunk crc window) bulk codecs."""
    from dctz_tpu import api
    from dctz_tpu.config import CodecConfig
    from dctz_tpu.core import container as ct
    from dctz_tpu.core import entropy
    from dctz_tpu.ops import idpack

    n = 1 << 18
    x = (
        np.sin(np.arange(n, dtype=np.float32) * 0.01) * 20
        + np.random.default_rng(7).standard_normal(n).astype(np.float32)
        * 0.05
    )
    cfg = CodecConfig(
        mode="ec", error_bound=1e-3, container="v2", ids_codec="device",
        segment_elems=0, chunk_bytes=4096, dpk_host_codec=codec,
    )
    if codec == "none":  # verbatim sections chunk at _VERBATIM_CHUNK
        monkeypatch.setattr(api, "_VERBATIM_CHUNK", 4096)
    blob = dctz_tpu.compress(x, config=cfg)
    header, streams, qtable, _cb = ct.parse_v2(blob, chunk_crcs="defer")
    assert header.dpk
    packed = streams[1]
    assert len(packed) >= 3, "need several bulk chunks for range locality"
    n_stream, tile_b, cw = api._dpk_meta(header, streams)
    t = idpack.tiles_of(-(-n_stream // header.block_size), tile_b)
    assert t >= 2

    # crc'd payload bytes scale with the range: a 1/4-tile range must hash
    # well under half the payload (side sections meta/width/exc are small)
    tally: list[int] = []
    orig_many = entropy.crc32_many

    def counting(chunks):
        tally.append(sum(len(c) for c in chunks))
        return orig_many(chunks)

    monkeypatch.setattr(entropy, "crc32_many", counting)
    quarter = api._decompress_dpk_range(
        header, streams, qtable, 0, max(1, t // 4)
    )
    monkeypatch.setattr(entropy, "crc32_many", orig_many)
    payload = sum(len(c) for sec in streams for c in sec)
    assert sum(tally) < 0.5 * payload, (sum(tally), payload)
    full = dctz_tpu.decompress(blob)
    np.testing.assert_array_equal(
        quarter, full[: quarter.size]
    )

    # corrupt the LAST bulk chunk: an early range decodes clean, a range
    # covering it raises, and the default (sweeping) parse always raises
    tgt = packed[-1]
    off = _chunk_offset(blob, tgt)
    bad = bytearray(blob)
    bad[off + len(tgt) - 1] ^= 0xFF
    bad = bytes(bad)
    h2, s2, q2, _ = ct.parse_v2(bad, chunk_crcs="defer")
    early = api._decompress_dpk_range(h2, s2, q2, 0, max(1, t // 4))
    np.testing.assert_array_equal(early, quarter)
    with pytest.raises(ValueError, match="crc mismatch"):
        api._decompress_dpk_range(h2, s2, q2, 0, t)
    with pytest.raises(ValueError, match="crc mismatch"):
        ct.parse_v2(bad)


@pytest.mark.parametrize("n_procs", [2, 4])
def test_distributed_restore_monolithic_dpk(tmp_path, n_procs):
    """ONE monolithic DPK v2 container restored by 2 AND 4 distributed
    processes: each host decodes only its tile range
    (api._decompress_dpk_range; O(range) crc via the deferred parse) and
    the slices reassemble to the bound-satisfying array. At 4 processes
    the tile split is uneven and trailing hosts may hold pure padding."""
    import importlib.util

    from dctz_tpu.config import CodecConfig

    worker = pathlib.Path(__file__).parent / "_mh_worker.py"
    spec = importlib.util.spec_from_file_location("_mh_worker", worker)
    wmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wmod)

    n_total = 64 * 1200 + 7
    x = wmod.make_data(n_total)
    blob = dctz_tpu.compress(
        x,
        config=CodecConfig(
            mode="ec", error_bound=1e-3, container="v2",
            ids_codec="device", verify=True, segment_elems=0,
        ),
    )
    assert blob[:4] != b"DTZS"
    (tmp_path / "mono.bin").write_bytes(blob)

    outs = _run_workers(
        tmp_path, n_total, n_procs, "restore", "device",
        stream=tmp_path / "mono.bin", tag="m",
    )
    parts = [np.load(o) for o in outs]
    full, frames = _reassemble(parts, n_total)
    # no frames: the tile-range path, not the DTZS frame path
    assert all(len(f) == 0 for f in frames), frames
    starts = sorted(int(pz["start"]) for pz in parts)
    assert starts[0] == 0 and starts[1] > 0  # >= 2 hosts held real data
    assert dctz_tpu.evaluate(x, full, 1e-3)["bound_satisfied"]


def test_multiprocess_save_restore_roundtrip(tmp_path):
    """Save on 2 jax.distributed processes, then RESTORE on 2 fresh
    processes: each restoring host decodes exactly ONE frame (its own) and
    the slices reassemble to the bound-satisfying array."""
    worker = pathlib.Path(__file__).parent / "_mh_worker.py"
    # big enough that BOTH hosts hold real data after 256-block tile
    # padding (per-host slice is 65536 elements here)
    n_total = 64 * 1200 + 7
    parts = []
    for phase, extra in (("ec", None), ("restore", None)):
        coordinator = f"127.0.0.1:{_free_port()}"
        procs = []
        outs = []
        for pid in range(2):
            if phase == "restore":
                out = tmp_path / f"restore{pid}.npz"
                argv = [
                    sys.executable, str(worker), coordinator, "2", str(pid),
                    str(n_total), "restore", str(out), "device",
                    str(tmp_path / "stream.bin"),
                ]
            else:
                out = tmp_path / f"part{pid}.bin"
                argv = [
                    sys.executable, str(worker), coordinator, "2", str(pid),
                    str(n_total), "ec", str(out), "device",
                ]
            outs.append(out)
            procs.append(
                subprocess.Popen(
                    argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE
                )
            )
        for p in procs:
            try:
                _, err = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            assert p.returncode == 0, err.decode()[-2000:]
        if phase == "ec":
            stream = b"".join(o.read_bytes() for o in outs)
            (tmp_path / "stream.bin").write_bytes(stream)
        else:
            parts = [np.load(o) for o in outs]

    import importlib.util

    spec = importlib.util.spec_from_file_location("_mh_worker", worker)
    wmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wmod)
    x = wmod.make_data(n_total)

    full = np.zeros(n_total, np.float64)
    seen_frames = []
    for pz in parts:
        start = int(pz["start"])
        data = pz["data"]
        full[start : start + data.size] = data[: max(0, n_total - start)]
        seen_frames.append(tuple(pz["frames"].tolist()))
    # each host decoded exactly its own single frame, disjointly
    assert all(len(f) == 1 for f in seen_frames), seen_frames
    assert len(set(seen_frames)) == len(seen_frames)
    assert dctz_tpu.evaluate(x, full, 1e-3)["bound_satisfied"]
