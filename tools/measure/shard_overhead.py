"""Sharded-program overhead measurement (real TPU, mesh of 1): the same
verified encode body wrapped in shard_map vs plain — isolates the SPMD
structure cost (collectives + sharding constraints) on real hardware."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))
import os, pathlib, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from dctz_tpu import api
from dctz_tpu.ops import fused_encode as fe, idpack, dpk_fuse
from dctz_tpu.parallel import sharding as sh

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

def consume(out):
    s = jnp.float32(0)
    for o in out:
        s = s + jnp.sum(o.astype(jnp.float32)) * 1e-9
    return s

def plain(eps, x):
    arr = x + eps
    sf, mean = api._stats_device(arr, N, 1)
    out = fe.fused_encode_pipeline_dpk_ec(arr, sf, EB, idpack.CAPE, N, True)
    return consume(out) + sf + mean

mesh = Mesh(np.array(jax.devices()[:1]), (sh.AXIS,))

def sharded(eps, x):
    arr = x + eps
    def body(xl):
        # same collectives the real sharded encode uses (pmax sf, psum mean,
        # pmin ok) + the identical per-shard kernel
        amax = jax.lax.pmax(jnp.max(jnp.abs(xl)), sh.AXIS)
        mean = jax.lax.psum(jnp.sum(xl), sh.AXIS) / N
        from dctz_tpu.core.stats import scaling_factor
        sf = scaling_factor(amax, 1)
        flat_pos = jnp.arange(xl.shape[0])
        xv_max = jax.lax.pmax(jnp.max(xl), sh.AXIS)
        xv_min = jax.lax.pmin(jnp.min(xl), sh.AXIS)
        tol = (xv_max - xv_min) * jnp.float32(EB) * 0.99
        from dctz_tpu.core.quantize import chunk_width
        cw = chunk_width(xl.shape[0], 64)
        out = dpk_fuse.encode_x_fused(xl, sf, tol, xl.shape[0], EB, min(idpack.CAPE, cw), cw, True)
        ok = jax.lax.pmin(out[8].astype(jnp.int32), sh.AXIS)
        return out[:8] + (ok, sf, mean)
    out = jax.shard_map(body, mesh=mesh, in_specs=P(sh.AXIS),
                        out_specs=tuple([P(sh.AXIS)] * 7 + [P()] * 4),
                        check_vma=False)(arr)
    return consume(out)

print(f"plain verified encode : {amort(plain, x):.2f} ms", flush=True)
print(f"shard_map(1) verified : {amort(sharded, x):.2f} ms", flush=True)

# current as-shipped sharded encode program (old chain), for the record
from dctz_tpu.config import CodecConfig
cfg = api._device_cfg(CodecConfig(mode="ec", error_bound=EB))
def cur_sharded(eps, x):
    out = sh.encode_sharded(x + eps, n_real=N, cfg=cfg, ac_capacity=None,
                            mesh=mesh, compaction="chunked", dpk=True)
    return consume(out)
print(f"shipped sharded encode: {amort(cur_sharded, x):.2f} ms", flush=True)

# after the sharded-fused upgrade: equality + speed of encode_sharded arms
outs = {}
for force in (False, True):
    dpk_fuse._FORCE = force
    sh.encode_sharded.clear_cache()
    o = sh.encode_sharded(x, n_real=N, cfg=cfg, ac_capacity=None,
                          mesh=mesh, compaction="chunked", dpk=True)
    outs[force] = [np.asarray(v) for v in o]
names = ["bin_ids","dc","ac","acc","ovf","sf","mean","qt","ok",
         "width","packed","exc","excc","acc2","eovf"]
for i, nm in enumerate(names):
    if nm == "bin_ids":
        continue  # fused emits zeros by contract (unused for DPK)
    a, b = outs[True][i], outs[False][i]
    print(f"sh-equal[{nm}]: {np.array_equal(a, b)}", flush=True)
dpk_fuse._FORCE = None
sh.encode_sharded.clear_cache()
print(f"sharded encode (fused): {amort(cur_sharded, x):.2f} ms", flush=True)

# fused sharded DECODE arms (added after decode_sharded_dpk upgrade)
from dctz_tpu.ops import fused_encode as fe2, idpack as ip2
from dctz_tpu.core.quantize import chunk_width as cw_of
pk = fe2.fused_encode_pipeline_dpk_ec(x, jnp.float32(100.0), EB, ip2.CAPE, N, False)
w_d, packed_d, exc_d, _, ac_d, _, dc_d, _, _ = [jax.device_put(jax.device_get(v)) for v in pk]
for a in (w_d, packed_d, exc_d, ac_d, dc_d): _sync(a.astype(jnp.float32))
cwv = cw_of(N, 64)
def dec_sh(eps, w_d, packed_d, exc_d, dc_d, ac_d):
    xx = sh.decode_sharded_dpk(w_d, packed_d, exc_d, dc_d + eps, ac_d,
                               jnp.float32(100.0), None, tile_b=256, cw=cwv,
                               cfg=cfg, dtype="float32", mesh=mesh)
    return jnp.sum(xx) * 1e-9
for force, tag in ((False, "xla-chain"), (True, "fused")):
    dpk_fuse._FORCE = force
    sh.decode_sharded_dpk.clear_cache()
    print(f"sharded decode [{tag}]: {amort(dec_sh, w_d, packed_d, exc_d, dc_d, ac_d):.2f} ms", flush=True)
dpk_fuse._FORCE = None
