"""Verified encode on real TPU: container equality + verify-on cost."""
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
from dctz_tpu.ops import fused_encode as fe, idpack
N = 1 << 25; EB = 1e-3; K = 64
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
        t0 = time.perf_counter(); _sync(rep(jnp.float32(0), *ops)); best = min(best, time.perf_counter() - t0)
    return (best - 0.028) / K * 1e3
def climate(n):
    t = jnp.arange(n, dtype=jnp.float32)
    x = (jnp.sin(t*0.001)*40.0 + jnp.sin(t*0.137)*3.0 + jnp.sin(t*2.03)*0.3)
    return jnp.where(jnp.arange(n, dtype=jnp.int32) % 9973 == 0, x*8.0, x)
x = jax.jit(climate, static_argnums=0)(N); _sync(x)
sf, _ = api._stats_device(x, N, 1)

def enc(verify):
    def f(eps, x):
        sf2, mean = api._stats_device(x + eps, N, 1)
        out = fe.fused_encode_pipeline_dpk_ec(x + eps, sf2, EB, idpack.CAPE, N, verify)
        return (jnp.sum(out[1].astype(jnp.float32)) + jnp.sum(out[0].astype(jnp.float32))
                + jnp.sum(out[2].astype(jnp.float32)) + jnp.sum(out[3].astype(jnp.float32))
                + jnp.sum(out[4]) + jnp.sum(out[6]) + jnp.sum(out[5].astype(jnp.float32))
                + sf2 + mean + out[7].astype(jnp.float32) + out[8].astype(jnp.float32))
    return f
# equality vs the old unified (verify off)
o_old = [np.asarray(v) for v in fe.fused_encode_pipeline_dpk(x, sf, EB, idpack.CAPE)]
o_new = [np.asarray(v) for v in fe.fused_encode_pipeline_dpk_ec(x, sf, EB, idpack.CAPE, N, False)]
for i, nm in enumerate(["width","packed","exc","excc","ac","acc","dc","ovf"]):
    print(f"equal[{nm}]: {np.array_equal(o_old[i], o_new[i])}", flush=True)
o_v = [np.asarray(v) for v in fe.fused_encode_pipeline_dpk_ec(x, sf, EB, idpack.CAPE, N, True)]
print("verify ok flag:", bool(o_v[8]), flush=True)
print(f"encode verify=False: {amort(enc(False), x):.2f} ms", flush=True)
print(f"encode verify=True : {amort(enc(True), x):.2f} ms", flush=True)
