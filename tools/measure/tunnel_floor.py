"""Probe the per-iteration floor: does time scale with K or with bytes?"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))
import os, pathlib, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

def _sync(a): float(jnp.asarray(a).ravel()[0])

def run(fn, K, *ops, tag=""):
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
    print(f"{tag} K={K:3d}: total {best*1e3:8.2f} ms  per-iter {best/K*1e3:7.3f} ms", flush=True)

for sz_mb, n in ((8, 1<<21), (128, 1<<25)):
    x = jnp.arange(n, dtype=jnp.float32) * 1e-6
    _sync(x)
    for K in (1, 8, 64):
        run(lambda e, a: jnp.max(a + e), K, x, tag=f"max {sz_mb:3d}MB")

# same op but WITHOUT the scalar dependency chain (parallel iterations)
x = jnp.arange(1<<25, dtype=jnp.float32) * 1e-6
_sync(x)
for K in (8, 64):
    @jax.jit
    def rep2(a):
        return sum(jnp.max(a + jnp.float32(i)) for i in range(K))
    _sync(rep2(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); _sync(rep2(x)); best = min(best, time.perf_counter() - t0)
    print(f"max 128MB nodep K={K}: total {best*1e3:8.2f} ms per-iter {best/K*1e3:7.3f} ms", flush=True)
