"""512 MB scaling point: device chains at 4x the bench size (K=16)."""
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
from dctz_tpu.core.quantize import chunk_width
from dctz_tpu.config import CodecConfig

import os as _os
N = int(_os.environ.get('N_ELEMS', 1 << 27))  # default 512 MB f32
EB = 1e-3; K = 16
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
cw = chunk_width(N, 64)
print("cw", cw)
def enc(verify):
    def f(eps, x):
        sf2, mean = api._stats_device(x + eps, N, 1)
        out = fe.fused_encode_pipeline_dpk_ec(x + eps, sf2, EB, idpack.CAPE, N, verify)
        s = sf2 + mean
        for o in out:
            s = s + jnp.sum(o.astype(jnp.float32)) * 1e-9
        return s
    return f
gb = N * 4 / 1e9
t = amort(enc(True), x);  print(f"512MB encode verified: {t:.2f} ms -> {gb/t*1000:.1f} GB/s")
t = amort(enc(False), x); print(f"512MB encode        : {t:.2f} ms -> {gb/t*1000:.1f} GB/s")
pk = fe.fused_encode_pipeline_dpk_ec(x, sf, EB, idpack.CAPE, N, False)
w_d, packed_d, exc_d, _, ac_d, _, dc_d, _, _ = [jax.device_put(jax.device_get(v)) for v in pk]
for a in (w_d, packed_d, exc_d, ac_d, dc_d): _sync(a.astype(jnp.float32))
cfg = api._device_cfg(CodecConfig(mode="ec", error_bound=EB))
def dec(eps, w_d, packed_d, exc_d, dc_d, ac_d):
    xx = api._decode_device_dpk(w_d, packed_d, exc_d, dc_d + eps, ac_d, N, cfg,
                                "float32", "chunked", 256, cw, sf, None)
    return jnp.sum(xx) * 1e-9
t = amort(dec, w_d, packed_d, exc_d, dc_d, ac_d); print(f"512MB decode        : {t:.2f} ms -> {gb/t*1000:.1f} GB/s")
