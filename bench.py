#!/usr/bin/env python
"""DCTZ-TPU benchmark. Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Headline metric: single-chip compress+decompress throughput (GB/s) on a
climate-shaped float32 array at the 1E-3 error bound (EC mode) — the
BASELINE.json metric ("compress+decompress GB/s/chip") on the CESM-ATM-like
workload. vs_baseline compares against the native C++ reference codec
(cpp/dctz_ref.cpp — the reference implementation's semantics, since the
FFTW-based original cannot be built here) running on this host's CPU.

Methodology (docs/benchmarks.md) — everything runs through the PUBLIC API
(`compress()` / `decompress()`), producing and consuming real containers:

  * Config: v2 container with device-side id-stream coding (ids_codec=
    "device"): the dominant stream leaves the chip entropy-coded, so the
    host only slices/concatenates + deflates the small side streams.
  * The dev-tunnel TPU attachment moves host<->device data at ~0.02 GB/s —
    three orders of magnitude below production PCIe/DMA — so the StageTimer
    "transfer" stage is excluded from the headline and reported separately.
    Input is generated on-device from a deterministic formula; the C++
    baseline gets the same array computed host-side.
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
CFG = CodecConfig(mode="ec", error_bound=EB, container="v2", ids_codec="device")
REPS = 3


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


def bench_jax() -> dict:
    x = jax.jit(climate_formula_jax, static_argnums=0)(N)
    float(x.ravel()[0])  # materialize before timing

    # warmup: compiles + fills the persistent cache
    blob = compress(x, config=CFG)
    y = decompress(blob)

    best_c = best_d = float("inf")
    ct_last = dt_last = None
    for _ in range(REPS):
        ct = StageTimer(sync=True)
        blob = compress(x, config=CFG, timer=ct)
        if _nontransfer(ct) < best_c:
            best_c, ct_last = _nontransfer(ct), ct
        dt = StageTimer(sync=True)
        y = decompress(blob, timer=dt)
        if _nontransfer(dt) < best_d:
            best_d, dt_last = _nontransfer(dt), dt

    # full-array correctness vs the host-computed input
    x_np = climate_formula_np(N)
    q = evaluate(x_np, y, EB, len(blob))

    gb = N * 4 / 1e9
    return {
        "gbps": 2 * gb / (best_c + best_d),
        "compress_gbps": gb / best_c,
        "decompress_gbps": gb / best_d,
        "compress_stages_ms": {
            k: round(v * 1e3, 2) for k, v in ct_last.stages.items()
        },
        "decompress_stages_ms": {
            k: round(v * 1e3, 2) for k, v in dt_last.stages.items()
        },
        "tunnel_transfer_s": round(
            ct_last.stages.get("transfer", 0.0)
            + dt_last.stages.get("transfer", 0.0),
            3,
        ),
        "ratio": q["ratio"],
        "psnr_db": q["psnr_db"],
        "max_rel_err": q["max_rel_err"],
        "bound_satisfied_full_array": q["bound_satisfied"],
    }


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
        "metric": "single-chip compress+decompress throughput (climate f32, EC 1E-3, public API)",
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
