"""Machine roofline probe: HBM copy, reduction, transpose, MXU matmul."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))
import os, pathlib, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

N = 1 << 25  # 128 MB f32
K = 8

def _sync(a): float(jnp.asarray(a).ravel()[0])

def amort(fn, *ops):
    @jax.jit
    def rep(z, *o):
        def body(i, acc):
            return acc + fn(acc * 1e-30, *o) * 1e-30
        return jax.lax.fori_loop(0, K, body, z)
    _sync(rep(jnp.float32(0), *ops))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(rep(jnp.float32(0), *ops))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3

x = jnp.arange(N, dtype=jnp.float32) * 1e-6
_sync(x)
x2 = x.reshape(-1, 512)
u8 = (jnp.arange(N, dtype=jnp.int32) % 251).astype(jnp.uint8)
_sync(u8.astype(jnp.float32))

t = amort(lambda e, a: jnp.sum((a + e)[::65536]) , x)   # copy via add: read+write 256MB
print(f"add1 (r128+w128MB): {t:.2f} ms  -> {256/t:.0f} GB/s", flush=True)
t = amort(lambda e, a: jnp.max(a + e), x)
print(f"max-reduce 1D (r128MB): {t:.2f} ms -> {128/t:.0f} GB/s", flush=True)
t = amort(lambda e, a: jnp.max(a + e), x2)
print(f"max-reduce 2D (r128MB): {t:.2f} ms -> {128/t:.0f} GB/s", flush=True)
t = amort(lambda e, a: jnp.max(jnp.abs(a + e)) + jnp.sum(a + e) * 1e-20, x)
print(f"amax+sum 1D: {t:.2f} ms", flush=True)
t = amort(lambda e, a: jnp.sum((a + e).astype(jnp.float32)) * 1e-9, u8)
print(f"u8 read+cast+reduce (r32MB): {t:.2f} ms", flush=True)
y = x.reshape(-1, 64, 64)
t = amort(lambda e, a: jnp.sum(jnp.swapaxes(a + e, 1, 2)[::999, 0]) , y)
print(f"transpose f32 (r+w 128MB): {t:.2f} ms -> {256/t:.0f} GB/s", flush=True)
m = jnp.zeros((64, 64), jnp.float32) + jnp.eye(64)
t = amort(lambda e, a, mm: jnp.sum(jnp.dot(a.reshape(-1, 64) + e, mm, precision=jax.lax.Precision.HIGHEST)[::9999]), y, m)
print(f"64x64 matmul HIGHEST over 128MB: {t:.2f} ms", flush=True)
big = jnp.zeros((8192, 8192), jnp.bfloat16) + jnp.bfloat16(0.5)
t = amort(lambda e, a: jnp.sum((jnp.dot(a, a, preferred_element_type=jnp.float32) * 1e-9)[::4096, ::4096]) + e, big)
flops = 2 * 8192**3
print(f"8k bf16 matmul: {t:.2f} ms -> {flops/t/1e9:.1f} TF/s", flush=True)
bigf = big.astype(jnp.float32)
t = amort(lambda e, a: jnp.sum((jnp.dot(a, a, precision=jax.lax.Precision.HIGHEST) * 1e-9)[::4096, ::4096]) + e, bigf)
print(f"8k f32 HIGHEST matmul: {t:.2f} ms -> {flops/t/1e9:.1f} TF/s", flush=True)
print(jax.devices()[0], jax.devices()[0].device_kind)
