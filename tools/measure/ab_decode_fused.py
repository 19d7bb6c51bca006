"""dpk_fuse.decode_fused on real TPU: correctness vs XLA chain + K=64 timing."""
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
from dctz_tpu.ops import fused_encode as fe, idpack, compaction as cp, dpk_fuse
from dctz_tpu.core import constants as C
from dctz_tpu.core.quantize import chunk_width
from dctz_tpu.config import CodecConfig

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
cw = chunk_width(N, 64); nblk = N // 64
pk = idpack.pack_ids(ids, N, 256, 128)
w_d = jax.device_put(jax.device_get(pk[0])); _sync(w_d.astype(jnp.float32))
packed_d = jax.device_put(jax.device_get(pk[1])); _sync(packed_d.astype(jnp.float32))
exc_d = jax.device_put(jax.device_get(pk[2])); _sync(exc_d.astype(jnp.float32))
esc = (ids == C.ESCAPE) & (jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1) >= 1)
ac_rows, _, _ = cp.compact_chunked(esc.reshape(-1), dcac.reshape(-1), cw, 128)
ac_rows = jax.device_put(jax.device_get(ac_rows)); _sync(ac_rows)
dc = jax.device_put(jax.device_get(dcac[:, 0])); _sync(dc)
cfg = api._device_cfg(CodecConfig(mode="ec", error_bound=EB))

# correctness: fused vs chain on device (clear the jit cache between arms —
# _FORCE is not part of the jit key)
dpk_fuse._FORCE = False
api._decode_device_dpk.clear_cache()
x_ref = api._decode_device_dpk(w_d, packed_d, exc_d, dc, ac_rows, N, cfg, "float32", "chunked", 256, cw, sf, None)
x_ref = np.asarray(x_ref)
dpk_fuse._FORCE = True
api._decode_device_dpk.clear_cache()
x_new = api._decode_device_dpk(w_d, packed_d, exc_d, dc, ac_rows, N, cfg, "float32", "chunked", 256, cw, sf, None)
x_new = np.asarray(x_new)
print("equal:", np.array_equal(x_ref, x_new), "maxdiff:", float(np.abs(x_ref - x_new).max()), flush=True)

def dec(eps, w_d, packed_d, exc_d, dc, ac_rows):
    x = api._decode_device_dpk(w_d, packed_d, exc_d, dc + eps, ac_rows, N, cfg,
                               "float32", "chunked", 256, cw, sf, None)
    return jnp.sum(x) * 1e-9
for force, tag in ((False, "chain"), (True, "fused")):
    dpk_fuse._FORCE = force
    api._decode_device_dpk.clear_cache()
    print(f"FULL decode[{tag}]: {amort(dec, w_d, packed_d, exc_d, dc, ac_rows):.2f} ms", flush=True)
