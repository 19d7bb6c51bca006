#!/usr/bin/env python
"""DCTZ-TPU benchmark. Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Headline metric: single-chip compress+decompress throughput (GB/s) on a
climate-shaped float32 array at the 1E-3 error bound (EC mode) — the
BASELINE.json metric ("compress+decompress GB/s/chip") on the CESM-ATM-like
workload. vs_baseline compares against the native C++ reference codec
(cpp/dctz_ref.cpp — the reference implementation's semantics, since the
FFTW-based original cannot be built here) running on this host's CPU.

Methodology (docs/benchmarks.md) — correctness and the host stages run
through the PUBLIC API (`compress()` / `decompress()`, real containers);
the device stages are timed AMORTIZED (K chained executions inside one jit,
synchronized once) because every synchronized call on the dev-tunnel TPU
attachment pays a ~25-60 ms pure round-trip latency that production
PCIe-attached chips do not (measured and reported as rtt_ms below — a
single per-stage sync would roughly double the device numbers):

  * Config: v2 container with device-side id-stream coding (ids_codec=
    "device"): the dominant stream leaves the chip entropy-coded, so the
    host only slices/concatenates + deflates the small side streams.
  * headline = the PIPELINED DEFAULT path's steady state, from measured
    stages AND a MEASURED overlap fraction f: 2*bytes / (wall_c + wall_d)
    with wall = max(dev, host) + (1-f)*min(dev, host) + f*min/S. f comes
    from per-segment wall timestamps of a real pipelined run on this chip
    (measure_pipeline_overlap; stream.py `trace`): f = (worker_busy +
    device_busy - wall) / min(worker_busy, device_busy) — how much of the
    shorter stage genuinely hid behind the longer one in that run (f=1 ->
    ideal pipeline, f=0 -> serial; round-4 ASSUMED f=1). The strictly-
    serial monolithic sum is reported alongside as serial_sum_gbps; the
    raw single-sync public-API number (one tunnel round trip per device
    stage) as end_to_end_with_tunnel_latency_gbps.
  * The tunnel moves host<->device data at ~0.02 GB/s — three orders of
    magnitude below production PCIe/DMA — so the StageTimer "transfer"
    stage is excluded from the headline and reported separately. Input is
    generated on-device from a deterministic formula; the C++ baseline
    gets the same array computed host-side.
  * The amortized device programs are the SAME functions the public API
    dispatches (api._stats_device + fused_encode_pipeline + pack_ids;
    api._dpk_decode_prep + _decode_device_dpk), chained via a data
    dependence so XLA cannot overlap or elide iterations.
  * StageTimer(sync=True) forces a scalar readback at device-stage
    boundaries (block_until_ready does not synchronize on this backend).
  * Correctness: the FULL decompressed array is checked against the input
    with utils.metrics.evaluate (max-rel-err vs the bound).
  * best-of-3: host timings on this machine see 2-4x external noise.
"""

from __future__ import annotations

import json
import os
import pathlib
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).parent / ".jax_cache")
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dctz_tpu import compress, decompress, evaluate, native  # noqa: E402
from dctz_tpu.config import CodecConfig  # noqa: E402
from dctz_tpu.utils.timing import StageTimer  # noqa: E402

N = 1 << 25  # 32Mi elements, 128 MB float32
EB = 1e-3
# verify=True: the headline measures the GUARANTEED-bound mode (the verify-
# repair passes run inside the same fused encode kernel; ops/dpk_fuse.py).
# segment_elems=0 pins the MONOLITHIC path for the per-stage measurements;
# the DEFAULT path (segment_elems="auto") pipelines host packing under
# device compute — its steady-state throughput is derived from the same
# measured stage times (see bench_jax) and reported as the headline.
CFG = CodecConfig(
    mode="ec", error_bound=EB, container="v2", ids_codec="device",
    verify=True, segment_elems=0,
)
CFG_DEFAULT = CodecConfig(
    mode="ec", error_bound=EB, container="v2", ids_codec="device",
    verify=True,  # segment_elems="auto": the pipelined default
)
REPS = 7  # host stages see 2-5x external noise on this VM; the best-of
# needs enough samples to catch a quiet window (round-5 captures varied
# 12.9-27 ms on the decompress host stage at REPS=5)


def climate_formula_np(n: int) -> np.ndarray:
    """Deterministic climate-shaped signal (smooth + small-scale detail +
    rare spikes). Float32 arithmetic with integer-exact spike positions so
    host and device produce the same array (up to libm-vs-XLA sin ulps)."""
    t = np.arange(n, dtype=np.float32)
    x = (
        np.sin(t * np.float32(0.001)) * np.float32(40.0)
        + np.sin(t * np.float32(0.137)) * np.float32(3.0)
        + np.sin(t * np.float32(2.03)) * np.float32(0.3)
    )
    spike = np.arange(n, dtype=np.int32) % 9973 == 0  # ~0.01% of elements
    return np.where(spike, x * np.float32(8.0), x).astype(np.float32)


def climate_formula_jax(n: int) -> jax.Array:
    t = jnp.arange(n, dtype=jnp.float32)
    x = (
        jnp.sin(t * 0.001) * 40.0
        + jnp.sin(t * 0.137) * 3.0
        + jnp.sin(t * 2.03) * 0.3
    )
    spike = jnp.arange(n, dtype=jnp.int32) % 9973 == 0
    return jnp.where(spike, x * 8.0, x)


def _nontransfer(timer: StageTimer) -> float:
    return sum(v for k, v in timer.stages.items() if k != "transfer")


def _sync(arr) -> None:
    float(jnp.asarray(arr).ravel()[0])


def measure_rtt_ms() -> float:
    """Median cost of one synchronized trivial device call: the tunnel's
    pure round-trip latency floor (production PCIe: ~10 us)."""
    f = jax.jit(lambda s: s + 1.0)
    _sync(f(jnp.float32(0)))
    samples = []
    for i in range(8):
        t0 = time.perf_counter()
        _sync(f(jnp.float32(i)))
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2] * 1e3


# 64 chained iterations: the tunnel costs ~28 ms PER EXECUTION regardless of
# K (measured: K=1/8/64 all total ~28-39 ms for a 128 MB reduce), so K=8
# still left ~3.5 ms of launch latency in every per-iteration figure. K=64
# cuts the residual to ~0.45 ms.
AMORT_K = 64


def _amortized_s(call, *operands) -> float:
    """Best-of-3 per-iteration seconds of `call(eps, *operands)->f32 scalar`,
    K chained executions inside one jit (data dependence via eps prevents
    overlap and dead-code elimination), one sync per timing.

    Operands MUST be passed here, not closed over: a concrete array captured
    by the traced function becomes an HLO constant, and on the remote-compile
    tunnel that ships the whole buffer with the compile request (512 MB
    inputs exceed the server's request limit outright — HTTP 413)."""

    @jax.jit
    def rep(z, *ops):
        def body(i, acc):
            return acc + call(acc * 1e-30, *ops) * 1e-30

        return jax.lax.fori_loop(0, AMORT_K, body, z)

    _sync(rep(jnp.float32(0), *operands))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(rep(jnp.float32(0), *operands))
        best = min(best, time.perf_counter() - t0)
    return best / AMORT_K


def amortized_device_encode_s(x) -> float:
    """The compress() device stage, as api._compress_fused dispatches it:
    stats -> the single-program verified encode kernel
    (fused_encode_pipeline_dpk_ec with verify from CFG: DCT + quantize +
    verify-repair + pack/compact in ONE Pallas program)."""
    from dctz_tpu import api
    from dctz_tpu.ops import fused_encode as fe
    from dctz_tpu.ops import idpack

    assert N % 1024 == 0  # no pad tail at bench shape

    def call(eps, x):
        arr = x + eps
        sf, mean = api._stats_device(arr, N, CFG.sf_adj)
        (wdt, packed, exc_rows, exc_counts, ac_chunks, counts, dc, ovf,
         ok) = fe.fused_encode_pipeline_dpk_ec(
            arr, sf, CFG.error_bound, idpack.CAPE, N, CFG.verify
        )
        ovf = ovf.astype(jnp.float32)
        # consume every output so nothing is dead-code eliminated
        return (
            jnp.sum(packed.astype(jnp.float32))
            + jnp.sum(wdt.astype(jnp.float32))
            + jnp.sum(exc_rows.astype(jnp.float32))
            + jnp.sum(exc_counts.astype(jnp.float32))
            + jnp.sum(dc)
            + jnp.sum(ac_chunks)
            + jnp.sum(counts.astype(jnp.float32))
            + sf
            + mean
            + ovf
            + ok.astype(jnp.float32)
        ).astype(jnp.float32)

    return _amortized_s(call, x)


def amortized_device_decode_s(blob) -> float:
    """The decompress() device stage (api._decode_device_dpk) on the real
    container's device inputs."""
    from dctz_tpu import api
    from dctz_tpu.core import container as ctn

    header, streams, qtable, _cb = ctn.parse_v2(blob)
    assert header.dpk and qtable is None
    host_arrays, (n_stream, tile_b, cw, cfg_h, ac_layout) = (
        api._dpk_decode_prep(header, streams)
    )
    dev = tuple(jnp.asarray(a) for a in host_arrays)
    for a in dev:
        _sync(a)
    sfv = jnp.asarray(header.scaling_factor, jnp.float32)
    dcfg = api._device_cfg(cfg_h)

    def call(eps, *dev):
        # NB: dc/ac may be uint8 byte planes — do not float-perturb them
        # (sfv + eps below already varies every iteration, defeating CSE)
        x = api._decode_device_dpk(
            dev[0],
            dev[1],
            dev[2],
            dev[3],
            dev[4],
            n_stream,
            dcfg,
            "float32",
            ac_layout,
            tile_b,
            cw,
            sfv + eps,
            None,
            header.dcd,
        )
        return x.ravel()[0].astype(jnp.float32)

    return _amortized_s(call, *dev)


def _interval_overlap(tr, worker_kinds, dev_kind="device"):
    """Measured overlap fraction of a two-stage pipeline from its trace:
    (serial_sum - traced_span) / min(worker_busy, device_busy), clipped
    to [0,1] — 1 = every second of the shorter stage hid behind the
    longer one, 0 = strictly serial. traced_span = last event end - first
    event start, so untraced setup (the global stats pass, frame writes)
    does not dilute the fraction. (Interval pairing is fragile when the
    tunnel serializes transfers between the threads — measured round 5:
    pull(k) runs concurrently with device(k+1), each ~400 ms, span 1.8 s
    vs 3.1 s serial.) Returns (fraction, worker_busy_s, device_busy_s)."""
    if not tr:
        return 0.0, 0.0, 0.0
    wb = sum(b - a for k, _s, a, b in tr if k in worker_kinds)
    db = sum(b - a for k, _s, a, b in tr if k == dev_kind)
    span = max(b for _k, _s, _a, b in tr) - min(a for _k, _s, a, _b in tr)
    denom = min(wb, db)
    if denom <= 0:
        return 0.0, wb, db
    f = (wb + db - span) / denom
    return max(0.0, min(1.0, f)), wb, db


def measure_pipeline_overlap(x) -> dict:
    """MEASURE the two-stage pipeline's overlap on the chip (VERDICT
    round-4 #2): one real pipelined compress + restore with per-segment
    wall timestamps (stream.compress_stream / _decode_frames `trace`),
    then per direction f = (worker_busy + device_busy - wall) /
    min(worker_busy, device_busy) — the fraction of the shorter stage
    that genuinely hid behind the longer one in THIS run. On this
    attachment the worker intervals are transfer-dominated (pull =
    device_get over the tunnel, reported alongside); the fractions are
    wall-clock facts of this run, not assumptions."""
    import io

    from dctz_tpu import stream as dstream

    se = N // 4  # 4 segments: more interval pairs than the default 2
    wall_c = wall_d = 0.0
    for _warm in range(2):  # 2nd run: compiles/cache loads out of the trace
        tr_c: list = []
        buf = io.BytesIO()
        t0 = time.perf_counter()
        dstream.compress_stream(
            x, buf, config=CFG, segment_elems=se, trace=tr_c
        )
        wall_c = time.perf_counter() - t0
        tr_d: list = []
        t0 = time.perf_counter()
        y = dstream.decompress_stream_all(
            dstream.MemReader(buf.getvalue()), trace=tr_d
        )
        wall_d = time.perf_counter() - t0
        assert y.size == N
    f_c, hb_c, db_c = _interval_overlap(tr_c, ("pull", "pack"))
    f_d, hb_d, db_d = _interval_overlap(tr_d, ("prep",))
    return {
        "compress_frac": round(f_c, 3),
        "decompress_frac": round(f_d, 3),
        "compress_worker_busy_s": round(hb_c, 3),
        "compress_device_busy_s": round(db_c, 3),
        "compress_wall_s": round(wall_c, 3),
        "decompress_worker_busy_s": round(hb_d, 3),
        "decompress_device_busy_s": round(db_d, 3),
        "decompress_wall_s": round(wall_d, 3),
        "segments": 4,
        "source": "per-segment wall timestamps of a real pipelined run "
                  "on this chip (device intervals include tunnel stalls)",
    }


def measure_pipeline_1gb(dev_rate_s_per_seg: float) -> dict:
    """The 1 GB pipelined soak point (VERDICT round-4 #8): one traced
    pipelined compress of a DEVICE-RESIDENT 2^28-element array through the
    public segment writer (16 DEFAULT_SEGMENT frames). Reports the
    measured host-pack and overlap behavior at S=16 and the steady-state
    rate using the amortized device rate (tunnel pulls excluded, as for
    the 128 MB headline)."""
    import io

    from dctz_tpu import stream as dstream

    n2 = 1 << 28  # 1 GB f32
    x = jax.jit(climate_formula_jax, static_argnums=0)(n2)
    _sync(x)
    tr: list = []
    buf = io.BytesIO()
    t0 = time.perf_counter()
    dstream.compress_stream(
        x, buf, config=CFG, segment_elems=dstream.DEFAULT_SEGMENT, trace=tr
    )
    wall = time.perf_counter() - t0
    del x
    nbytes = buf.getbuffer().nbytes
    f, hb, db = _interval_overlap(tr, ("pull", "pack"))
    pulls = sum(b - a for k, _s, a, b in tr if k == "pull")
    packs = sum(b - a for k, _s, a, b in tr if k == "pack")
    S = sum(1 for e in tr if e[0] == "device")
    gb = n2 * 4 / 1e9
    dev_s = dev_rate_s_per_seg * S
    # steady state from the production-relevant stages: device compute +
    # pure host packing (the pulls are tunnel transfer, excluded as in
    # the headline), scaled by the overlap fraction THIS run achieved
    pipe = (
        max(dev_s, packs)
        + (1.0 - f) * min(dev_s, packs)
        + f * min(dev_s, packs) / max(S, 1)
    )
    return {
        "segments": S,
        "ratio": round(gb * 1e9 / nbytes, 3),
        "wall_s": round(wall, 3),
        "host_pack_s_total": round(packs, 4),
        "host_pack_ms_per_segment": round(packs / max(S, 1) * 1e3, 2),
        "worker_busy_s_total": round(hb, 4),
        "tunnel_pull_s": round(pulls, 3),
        "overlap_frac": round(f, 3),
        "steady_state_gbps": round(gb / pipe, 3),
        "note": "device-resident input; device stage from the amortized "
                "128 MB rate (scaling flat 128 MB-1 GB, docs/scaling.md); "
                "tunnel pulls excluded as in the headline. The pack "
                "intervals run WHILE the tunnel transfers saturate this "
                "4-core host's network stack — the same 64 MB pack "
                "measures ~11.5 ms quiet vs ~35 ms here (production "
                "hosts pull via DMA)",
    }


def bench_jax() -> dict:
    x = jax.jit(climate_formula_jax, static_argnums=0)(N)
    _sync(x)  # materialize before timing

    # correctness goes through the DEFAULT (pipelined DTZS) path — the one
    # compress() actually takes for this size; ratio comes from its stream
    blob_def = compress(x, config=CFG_DEFAULT)
    y_def = decompress(blob_def)

    # warmup the monolithic path too: compiles + fills the persistent cache
    blob = compress(x, config=CFG)
    decompress(blob)

    best_c = best_d = float("inf")
    ct_last = dt_last = None
    for _ in range(REPS):
        ct = StageTimer(sync=True)
        blob = compress(x, config=CFG, timer=ct)
        if _nontransfer(ct) < best_c:
            best_c, ct_last = _nontransfer(ct), ct
        dt = StageTimer(sync=True)
        decompress(blob, timer=dt)
        if _nontransfer(dt) < best_d:
            best_d, dt_last = _nontransfer(dt), dt

    # full-array correctness vs the host-computed input
    x_np = climate_formula_np(N)
    q = evaluate(x_np, y_def, EB, len(blob_def))

    rtt_ms = measure_rtt_ms()
    dev_c = amortized_device_encode_s(x)
    dev_d = amortized_device_decode_s(blob)
    host_c = sum(v for k, v in ct_last.stages.items() if k == "zlib")
    host_d = dt_last.stages.get("host", 0.0)

    # the overlap/1 GB probes must never take down the driver capture —
    # degrade to f=0 (serial headline) with the failure recorded
    try:
        ovl = measure_pipeline_overlap(x)
    except Exception as e:  # pragma: no cover - tunnel flakiness
        ovl = {"compress_frac": 0.0, "decompress_frac": 0.0,
               "error": f"{type(e).__name__}: {e}"[:200]}
    try:
        big = measure_pipeline_1gb(dev_c * _stream_seg_frac())
    except Exception as e:  # pragma: no cover - tunnel flakiness
        big = {"error": f"{type(e).__name__}: {e}"[:200]}

    gb = N * 4 / 1e9
    total = dev_c + host_c + dev_d + host_d
    # Pipelined steady state of the DEFAULT path from MEASURED stage times
    # and the MEASURED overlap fraction f (timestamps of a real pipelined
    # run on this chip — measure_pipeline_overlap): with S segments,
    # wall/array = max(dev, host) + (1-f)*min(dev, host) + f*min/S
    # (f=1 -> the ideal two-stage pipeline with one startup bubble;
    # f=0 -> strictly serial). The CPU-backend end-to-end cross-check of
    # the same mechanism measured 1.27x/1.55x
    # (tools/measure/pipeline_overlap.py).
    from dctz_tpu import stream as _stream

    S = max(1, N // _stream.DEFAULT_SEGMENT)
    f_c = ovl["compress_frac"]
    f_d = ovl["decompress_frac"]
    pipe_c = (
        max(dev_c, host_c)
        + (1.0 - f_c) * min(dev_c, host_c)
        + f_c * min(dev_c, host_c) / S
    )
    pipe_d = (
        max(dev_d, host_d)
        + (1.0 - f_d) * min(dev_d, host_d)
        + f_d * min(dev_d, host_d) / S
    )
    return {
        "gbps": 2 * gb / (pipe_c + pipe_d),
        "measured_overlap": ovl,
        "pipelined_1gb": big,
        "serial_sum_gbps": round(2 * gb / total, 3),
        # ceiling when the host stage hides fully under device compute
        # (production hosts: 112+ cores vs this box's 4 — docs/scaling.md);
        # a labeled PROJECTION, not a measurement
        "device_bound_ceiling_gbps": round(2 * gb / (dev_c + dev_d), 3),
        "compress_gbps": gb / pipe_c,
        "decompress_gbps": gb / pipe_d,
        "device_compress_ms_amortized": round(dev_c * 1e3, 2),
        "device_decompress_ms_amortized": round(dev_d * 1e3, 2),
        "host_compress_ms": round(host_c * 1e3, 2),
        "host_decompress_ms": round(host_d * 1e3, 2),
        "pipeline_segments": S,
        "tunnel_rtt_ms": round(rtt_ms, 1),
        "end_to_end_with_tunnel_latency_gbps": round(
            2 * gb / (best_c + best_d), 4
        ),
        "compress_stages_ms_raw": {
            k: round(v * 1e3, 2) for k, v in ct_last.stages.items()
        },
        "decompress_stages_ms_raw": {
            k: round(v * 1e3, 2) for k, v in dt_last.stages.items()
        },
        "tunnel_transfer_s": round(
            ct_last.stages.get("transfer", 0.0)
            + dt_last.stages.get("transfer", 0.0),
            3,
        ),
        "verify": CFG.verify,
        "ratio": q["ratio"],
        "psnr_db": q["psnr_db"],
        "max_rel_err": q["max_rel_err"],
        "bound_satisfied_full_array": q["bound_satisfied"],
    }


def _stream_seg_frac() -> float:
    """DEFAULT_SEGMENT as a fraction of the bench array (device-stage time
    per segment = amortized whole-array time x this)."""
    from dctz_tpu import stream as dstream

    return dstream.DEFAULT_SEGMENT / N


def bench_native() -> dict:
    x = climate_formula_np(N)
    t_c = t_d = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        blob = native.compress(x, EB, "ec")
        t_c = min(t_c, time.perf_counter() - t0)
        t0 = time.perf_counter()
        y = native.decompress(blob)
        t_d = min(t_d, time.perf_counter() - t0)
    err = float(np.abs(x - y).max())
    gb = x.nbytes / 1e9
    return {
        "gbps": 2 * gb / (t_c + t_d),
        "compress_gbps": gb / t_c,
        "decompress_gbps": gb / t_d,
        "ratio": x.nbytes / len(blob),
        "max_abs_err": err,
    }


def main() -> None:
    ours = bench_jax()
    try:
        base = bench_native()
        vs = ours["gbps"] / base["gbps"]
    except Exception:  # pragma: no cover - no compiler on host
        base = {"gbps": float("nan")}
        vs = float("nan")

    def _round(d):
        return {
            k: (round(v, 4) if isinstance(v, float) else v) for k, v in d.items()
        }

    result = {
        "metric": "single-chip compress+decompress steady-state throughput (climate f32, EC 1E-3, pipelined default path, measured-overlap factor; serial sum in detail)",
        "value": round(ours["gbps"], 3),
        "unit": "GB/s",
        "vs_baseline": round(vs, 2),
        "detail": {
            "jax": _round(ours),
            "native_cpu_baseline": _round(base),
            "n_elements": N,
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
