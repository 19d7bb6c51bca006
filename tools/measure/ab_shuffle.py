"""Round-3 A/B on real TPU: butterfly shuffle vs sort/one-hot (current API).

Measures the gated call sites force-off vs force-on:
  1. pack_ids_with_ac     (unified compact+tighten vs two sorts)
  2. compact_chunked f32  (AC stream compaction)
  3. expand_chunked       (one-hot vs mirror network), f32 + bf16 operands
"""
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
from dctz_tpu.ops import fused_encode as fe, idpack, compaction as cp, shuffle as sh
from dctz_tpu.core import constants as C
from dctz_tpu.core.quantize import chunk_width

N = 1 << 25
EB = 1e-3
K = 8
BS = 64

def _sync(a):
    float(jnp.asarray(a).ravel()[0])

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

def climate(n):
    t = jnp.arange(n, dtype=jnp.float32)
    x = (jnp.sin(t * 0.001) * 40.0 + jnp.sin(t * 0.137) * 3.0
         + jnp.sin(t * 2.03) * 0.3)
    spike = jnp.arange(n, dtype=jnp.int32) % 9973 == 0
    return jnp.where(spike, x * 8.0, x)

x = jax.jit(climate, static_argnums=0)(N)
_sync(x)
sf, _ = api._stats_device(x, N, 1)
ids, dcac = fe.fused_encode_ec(x, sf, EB, 1.0, False)
ids = jax.device_put(jax.device_get(ids)); _sync(ids.astype(jnp.float32))
dcac = jax.device_put(jax.device_get(dcac)); _sync(dcac)
nblk, bs = ids.shape
cw = chunk_width(N, BS)
nc = N // cw
print(f"nblk={nblk} bs={bs} cw={cw} nc={nc} backend={jax.devices()[0].platform}")

# ---- 1. pack_ids_with_ac (the full gated function, both arms) ----
def pk(eps, ids, dcac):
    r = idpack.pack_ids_with_ac(ids + (eps*1e30).astype(jnp.uint8), dcac, N, 256, 128)
    return (jnp.sum(r[1].astype(jnp.float32)) + jnp.sum(r[4]) +
            jnp.sum(r[2].astype(jnp.float32))) * 1e-9

for force, tag in ((False, "sortpair"), (True, "butterfly")):
    sh._FORCE = force
    t = amort(pk, ids, dcac)
    print(f"pack_ids_with_ac[{tag}]: {t:.2f} ms")

# ---- 2. compact_chunked f32 ----
esc = (ids == C.ESCAPE) & (jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1) >= 1)
esc = jax.device_put(jax.device_get(esc)); _sync(esc.astype(jnp.float32))
def cc(eps, esc, dcac):
    ac, counts, ovf = cp.compact_chunked(esc.reshape(-1), (dcac + eps).reshape(-1), cw, 128)
    return jnp.sum(ac) * 1e-9 + jnp.sum(counts.astype(jnp.float32)) * 1e-9
for force, tag in ((False, "sort"), (True, "butterfly")):
    sh._FORCE = force
    t = amort(cc, esc, dcac)
    print(f"compact_chunked_f32[{tag}]: {t:.2f} ms")

# ---- 3. expand_chunked: f32 AC rows (sparse) and bf16 exc rows ----
sh._FORCE = False
ac, counts, _ = cp.compact_chunked(esc.reshape(-1), dcac.reshape(-1), cw, 128)
ac = jax.device_put(jax.device_get(ac)); _sync(ac)
mask2 = esc.reshape(nc, cw)
def ex_f32(eps, mask2, ac):
    out = cp.expand_chunked(mask2, ac + eps)
    return jnp.sum(out) * 1e-9
for force, tag in ((False, "onehot"), (True, "butterfly")):
    sh._FORCE = force
    t = amort(ex_f32, mask2, ac)
    print(f"expand_f32_cap128[{tag}]: {t:.2f} ms")

acb = ac.astype(jnp.bfloat16)
def ex_bf16(eps, mask2, acb):
    out = cp.expand_chunked(mask2, acb + eps.astype(jnp.bfloat16))
    return jnp.sum(out.astype(jnp.float32)) * 1e-9
for force, tag in ((False, "onehot"), (True, "butterfly")):
    sh._FORCE = force
    t = amort(ex_bf16, mask2, acb)
    print(f"expand_bf16_cap128[{tag}]: {t:.2f} ms")

# correctness spot check on device: butterfly vs sort outputs equal
sh._FORCE = False
r0 = idpack.pack_ids_with_ac(ids, dcac, N, 256, 128)
sh._FORCE = True
r1 = idpack.pack_ids_with_ac(ids, dcac, N, 256, 128)
for i, name in enumerate(["width","packed","exc_rows","exc_counts","ac","acc","dc","ovf"]):
    a, b = np.asarray(r0[i]), np.asarray(r1[i])
    ok = np.array_equal(a, b)
    print(f"equal[{name}]: {ok}")
    if not ok:
        bad = np.argwhere(a != b)
        print("  first diffs:", bad[:5], a[tuple(bad[0])], b[tuple(bad[0])])
sh._FORCE = False
e0 = cp.expand_chunked(mask2, ac)
sh._FORCE = True
e1 = cp.expand_chunked(mask2, ac)
print("equal[expand]:", np.array_equal(np.asarray(e0), np.asarray(e1)))
