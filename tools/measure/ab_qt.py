import os, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path.cwd() / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from dctz_tpu import api
from dctz_tpu.ops import fused_encode as fe, idpack, dpk_fuse
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

# equality old-vs-new QT pipeline on chip
o_old = fe.fused_encode_pipeline_dpk_qt(x, sf, EB, idpack.CAPE)
o_new = fe.fused_encode_pipeline_dpk_qt_v2(x, sf, EB, idpack.CAPE, N, False)
names = ["width","packed","exc","excc","ac","acc","dc","ovf"]
for i, nm in enumerate(names):
    print(f"qt equal[{nm}]: {np.array_equal(np.asarray(o_old[i]), np.asarray(o_new[i]))}", flush=True)
print("qt equal[qtable]:", np.array_equal(np.asarray(o_old[8]), np.asarray(o_new[9])), flush=True)

def enc_old(eps, x):
    sf2, mean = api._stats_device(x + eps, N, 1)
    out = fe.fused_encode_pipeline_dpk_qt(x + eps, sf2, EB, idpack.CAPE)
    s = sf2 + mean
    for o in out:
        s = s + jnp.sum(o.astype(jnp.float32)) * 1e-9
    return s
def enc_new(verify):
    def f(eps, x):
        sf2, mean = api._stats_device(x + eps, N, 1)
        out = fe.fused_encode_pipeline_dpk_qt_v2(x + eps, sf2, EB, idpack.CAPE, N, verify)
        s = sf2 + mean
        for o in out:
            s = s + jnp.sum(o.astype(jnp.float32)) * 1e-9
        return s
    return f
print(f"QT encode old (2-kernel+pack): {amort(enc_old, x):.2f} ms", flush=True)
print(f"QT encode v2 verify=F        : {amort(enc_new(False), x):.2f} ms", flush=True)
print(f"QT encode v2 verify=T        : {amort(enc_new(True), x):.2f} ms", flush=True)
