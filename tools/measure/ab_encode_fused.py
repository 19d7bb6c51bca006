"""encode_fused on real TPU: stream equality vs XLA path + K=64 timing."""
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
from dctz_tpu.ops import fused_encode as fe, idpack, dpk_fuse
from dctz_tpu.core.quantize import chunk_width

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
ids, dcac = fe.fused_encode_ec(x, sf, EB, 1.0, False)
ids = jax.device_put(jax.device_get(ids)); _sync(ids.astype(jnp.float32))
dcac = jax.device_put(jax.device_get(dcac)); _sync(dcac)
cw = chunk_width(N, 64)

# equality across arms (clear jit cache between)
outs = {}
for force in (False, True):
    dpk_fuse._FORCE = force
    idpack.pack_ids_with_ac.clear_cache()
    res = idpack.pack_ids_with_ac(ids, dcac, N, 256, 128)
    outs[force] = [np.asarray(v) for v in res]
for a, b, nm in zip(outs[True], outs[False],
                    ["width","packed","exc","excc","ac","acc","dc","ovf"]):
    print(f"equal[{nm}]: {np.array_equal(a, b)}", flush=True)

def pk(eps, ids, dcac):
    r = idpack.pack_ids_with_ac(ids + (eps*1e30).astype(jnp.uint8), dcac, N, 256, 128)
    return (jnp.sum(r[1].astype(jnp.float32)) + jnp.sum(r[4]) + jnp.sum(r[0].astype(jnp.float32))
            + jnp.sum(r[2].astype(jnp.float32)) + jnp.sum(r[3].astype(jnp.float32))
            + jnp.sum(r[5].astype(jnp.float32)) + jnp.sum(r[6])) * 1e-9
def full(eps, x):
    sf2, mean = api._stats_device(x + eps, N, 1)
    out = fe.fused_encode_pipeline_dpk(x + eps, sf2, EB, idpack.CAPE)
    return (jnp.sum(out[1].astype(jnp.float32)) + jnp.sum(out[0].astype(jnp.float32))
            + jnp.sum(out[2].astype(jnp.float32)) + jnp.sum(out[3].astype(jnp.float32))
            + jnp.sum(out[4]) + jnp.sum(out[6]) + jnp.sum(out[5].astype(jnp.float32))
            + sf2 + mean + out[7].astype(jnp.float32))
for force, tag in ((False, "xla+bfly"), (True, "fusedkernel")):
    dpk_fuse._FORCE = force
    idpack.pack_ids_with_ac.clear_cache()
    fe.fused_encode_pipeline_dpk.clear_cache()
    print(f"pack[{tag}]: {amort(pk, ids, dcac):.2f} ms", flush=True)
    print(f"FULL encode[{tag}]: {amort(full, x):.2f} ms", flush=True)
