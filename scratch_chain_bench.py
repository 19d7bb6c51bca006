"""Microbench: real encode chain decomposition (TPU, dev scratch)."""
import os, pathlib, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).parent / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dctz_tpu import api
from dctz_tpu.ops import fused_encode as fe
from dctz_tpu.ops import idpack
from dctz_tpu.config import CodecConfig

N = 1 << 25
EB = 1e-3
K = 8

def _sync(a):
    float(jnp.asarray(a).ravel()[0])

def amort(call, *ops):
    @jax.jit
    def rep(z, *o):
        def body(i, acc):
            return acc + call(acc * 1e-30, *o) * 1e-30
        return jax.lax.fori_loop(0, K, body, z)
    _sync(rep(jnp.float32(0), *ops))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(rep(jnp.float32(0), *ops))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3

def climate(n):
    t = jnp.arange(n, dtype=jnp.float32)
    x = (jnp.sin(t * 0.001) * 40.0 + jnp.sin(t * 0.137) * 3.0
         + jnp.sin(t * 2.03) * 0.3)
    spike = jnp.arange(n, dtype=jnp.int32) % 9973 == 0
    return jnp.where(spike, x * 8.0, x)

x = jax.jit(climate, static_argnums=0)(N)
_sync(x)

def s_stats(eps, x):
    sf, mean = api._stats_device(x + eps, N, 1)
    return sf + mean

def s_pipeline(eps, x):
    sf, mean = api._stats_device(x + eps, N, 1)
    ids, dc, ac, counts, ovf = fe.fused_encode_pipeline(x + eps, sf, EB, None)
    return (jnp.sum(ids.astype(jnp.float32)) * 1e-9 + jnp.sum(dc) + jnp.sum(ac)
            + jnp.sum(counts.astype(jnp.float32)) + ovf.astype(jnp.float32) + sf + mean)

def s_kernel_only(eps, x):
    sf, mean = api._stats_device(x + eps, N, 1)
    ids, dcac = fe.fused_encode_ec(x + eps, sf, EB, 1.0, False)
    return (jnp.sum(ids.astype(jnp.float32)) * 1e-9 + jnp.sum(dcac) * 1e-9 + sf + mean)

def s_full(eps, x):
    sf, mean = api._stats_device(x + eps, N, 1)
    ids, dc, ac, counts, ovf = fe.fused_encode_pipeline(x + eps, sf, EB, None)
    wdt, packed, exc_rows, exc_counts, exc_ovf = idpack.pack_ids(
        ids, N, idpack.B_DEFAULT, idpack.CAPE)
    return (jnp.sum(packed.astype(jnp.float32)) + jnp.sum(wdt.astype(jnp.float32))
            + jnp.sum(exc_rows.astype(jnp.float32)) + jnp.sum(exc_counts.astype(jnp.float32))
            + jnp.sum(dc) + jnp.sum(ac) + jnp.sum(counts.astype(jnp.float32))
            + sf + mean + ovf.astype(jnp.float32) + exc_ovf.astype(jnp.float32))

for name, fn in [
    ("stats", s_stats),
    ("stats+kernel", s_kernel_only),
    ("stats+pipeline", s_pipeline),
    ("stats+pipeline+pack", s_full),
]:
    print(f"{name:22s} {amort(fn, x):7.2f} ms", flush=True)
