"""Round-3 true on-chip decomposition: K=64 amortization (the ~28 ms
tunnel round-trip per execution is constant, so K=8 inflated every stage
by ~3.5 ms), and EVERY probe consumes its full output (x.ravel()[0]
consumption let XLA slice away whole stages in the earlier scratch)."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))
import os, pathlib, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
from dctz_tpu import api
from dctz_tpu.ops import fused_encode as fe, idpack, compaction as cp
from dctz_tpu.core import constants as C
from dctz_tpu.core.quantize import chunk_width
from dctz_tpu.config import CodecConfig

N = 1 << 25
EB = 1e-3
K = 64
BS = 64

def _sync(a): float(jnp.asarray(a).ravel()[0])

def amort(fn, *ops):
    @jax.jit
    def rep(z, *o):
        def body(i, acc):
            return acc + fn(acc * 1e-30, *o) * 1e-30
        return jax.lax.fori_loop(0, K, body, z)
    _sync(rep(jnp.float32(0), *ops))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _sync(rep(jnp.float32(0), *ops))
        best = min(best, time.perf_counter() - t0)
    return (best - 0.028) / K * 1e3  # subtract the measured launch floor

def climate(n):
    t = jnp.arange(n, dtype=jnp.float32)
    x = (jnp.sin(t * 0.001) * 40.0 + jnp.sin(t * 0.137) * 3.0
         + jnp.sin(t * 2.03) * 0.3)
    spike = jnp.arange(n, dtype=jnp.int32) % 9973 == 0
    return jnp.where(spike, x * 8.0, x)

x = jax.jit(climate, static_argnums=0)(N)
_sync(x)
sf, _mean = api._stats_device(x, N, 1)
ids, dcac = fe.fused_encode_ec(x, sf, EB, 1.0, False)
ids = jax.device_put(jax.device_get(ids)); _sync(ids.astype(jnp.float32))
dcac = jax.device_put(jax.device_get(dcac)); _sync(dcac)
nblk, bs = ids.shape
cw = chunk_width(N, BS)
nc = N // cw
B = idpack.B_DEFAULT
t_tiles = idpack.tiles_of(nblk, B)

pk = idpack.pack_ids(ids, N, B, idpack.CAPE)
width_d = jax.device_put(jax.device_get(pk[0]))
packed_d = jax.device_put(jax.device_get(pk[1]))
exc_d = jax.device_put(jax.device_get(pk[2]))
_sync(width_d.astype(jnp.float32)); _sync(packed_d.astype(jnp.float32)); _sync(exc_d.astype(jnp.float32))
esc_mask = (ids == C.ESCAPE) & (jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1) >= 1)
ac_rows, ac_counts, _ovf = cp.compact_chunked(esc_mask.reshape(-1), dcac.reshape(-1), cw, 128)
ac_rows = jax.device_put(jax.device_get(ac_rows)); _sync(ac_rows)

def s_stats(eps, x):
    sf, mean = api._stats_device(x + eps, N, 1)
    return sf + mean

def s_kernel(eps, x):
    ids, dcac = fe.fused_encode_ec(x + eps, sf, EB, 1.0, False)
    return jnp.sum(ids.astype(jnp.float32)) * 1e-9 + jnp.sum(dcac) * 1e-9

def s_full_enc(eps, x):
    sf2, mean = api._stats_device(x + eps, N, 1)
    out = fe.fused_encode_pipeline_dpk(x + eps, sf2, EB, idpack.CAPE)
    return (jnp.sum(out[1].astype(jnp.float32)) + jnp.sum(out[0].astype(jnp.float32))
            + jnp.sum(out[2].astype(jnp.float32)) + jnp.sum(out[3].astype(jnp.float32))
            + jnp.sum(out[4]) + jnp.sum(out[6]) + jnp.sum(out[5].astype(jnp.float32))
            + sf2 + mean + out[7].astype(jnp.float32))

def s_packonly(eps, ids, dcac):
    out = idpack.pack_ids_with_ac(ids + (eps*1e30).astype(jnp.uint8), dcac, N, B, 128)
    return (jnp.sum(out[1].astype(jnp.float32)) + jnp.sum(out[0].astype(jnp.float32))
            + jnp.sum(out[2].astype(jnp.float32)) + jnp.sum(out[3].astype(jnp.float32))
            + jnp.sum(out[4]) + jnp.sum(out[6]) + jnp.sum(out[5].astype(jnp.float32))
            + out[7].astype(jnp.float32))

def s_unpack_full(eps, width, packed, exc):
    wf = width + (eps * 1e30).astype(jnp.uint8)
    out = idpack.unpack_ids(wf, packed, exc, nblk, bs, B, cw)
    return jnp.sum(out.astype(jnp.float32)) * 1e-9

cfg = api._device_cfg(CodecConfig(mode="ec", error_bound=EB))

def s_core(eps, ids, ac_rows):
    x = api._decode_core(ids, dcac[:, 0], ac_rows, N, cfg, "float32", "chunked", sf + eps, None)
    return jnp.sum(x) * 1e-9

def s_full_dec(eps, width, packed, exc, ac_rows):
    x = api._decode_device_dpk(width, packed, exc, dcac[:, 0] + eps, ac_rows,
                               N, cfg, "float32", "chunked", B, cw, sf, None)
    return jnp.sum(x) * 1e-9

for name, fn, ops in [
    ("stats", s_stats, (x,)),
    ("kernel(ec) dct+quant", s_kernel, (x,)),
    ("pack_ids_with_ac", s_packonly, (ids, dcac)),
    ("FULL encode", s_full_enc, (x,)),
    ("unpack_ids", s_unpack_full, (width_d, packed_d, exc_d)),
    ("decode core (full consume)", s_core, (ids, ac_rows)),
    ("FULL decode", s_full_dec, (width_d, packed_d, exc_d, ac_rows)),
]:
    print(f"{name:28s} {amort(fn, *ops):7.2f} ms  ({128/amort(fn, *ops)/1000:.1f} GB/s)" if False else f"{name:28s} {amort(fn, *ops):7.2f} ms", flush=True)
