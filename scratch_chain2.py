"""Microbench 2: why does pack_ids cost 15.8 ms after the pipeline? (scratch)"""
import os, pathlib, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).parent / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dctz_tpu import api
from dctz_tpu.ops import fused_encode as fe
from dctz_tpu.ops import idpack
from dctz_tpu.ops import compaction as cp
from dctz_tpu.core.quantize import chunk_width

N = 1 << 25
EB = 1e-3
K = 8
B = idpack.B_DEFAULT

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

def consume_pk(pk):
    return (jnp.sum(pk[1].astype(jnp.float32)) + jnp.sum(pk[0].astype(jnp.float32))
            + jnp.sum(pk[2].astype(jnp.float32)) + jnp.sum(pk[3].astype(jnp.float32))
            + pk[4].astype(jnp.float32))

def consume_pipe(o):
    return (jnp.sum(o[0].astype(jnp.float32)) * 1e-9 + jnp.sum(o[1]) + jnp.sum(o[2])
            + jnp.sum(o[3].astype(jnp.float32)) + o[4].astype(jnp.float32))

def pipe(eps, x):
    sf, mean = api._stats_device(x + eps, N, 1)
    return fe.fused_encode_pipeline(x + eps, sf, EB, None), sf + mean

# V1: current chain (reference point)
def v1(eps, x):
    o, sm = pipe(eps, x)
    pk = idpack.pack_ids(o[0], N, B, idpack.CAPE)
    return consume_pk(pk) + consume_pipe(o) + sm

# V2: barrier between pipeline and pack
def v2(eps, x):
    o, sm = pipe(eps, x)
    (ids,) = jax.lax.optimization_barrier((o[0],))
    pk = idpack.pack_ids(ids, N, B, idpack.CAPE)
    return consume_pk(pk) + consume_pipe(o) + sm

# V3: kernel ids only (no compaction) + pack — is it pack x pipeline
# interaction or pack x compaction?
def v3(eps, x):
    sf, mean = api._stats_device(x + eps, N, 1)
    ids, dcac = fe.fused_encode_ec(x + eps, sf, EB, 1.0, False)
    pk = idpack.pack_ids(ids, N, B, idpack.CAPE)
    return consume_pk(pk) + jnp.sum(dcac) * 1e-9 + sf + mean

# V4: pack WITHOUT its exception compaction, after full pipeline
def pack_no_exc(ids2d, n_valid, b):
    nblk, bs = ids2d.shape
    t = idpack.tiles_of(nblk, b)
    row = jax.lax.broadcasted_iota(jnp.int32, (nblk, bs), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nblk, bs), 1)
    valid = (row * bs + col < n_valid) & (col >= 1)
    ids_i = jnp.where(valid, ids2d.astype(jnp.int32), 0)
    nib_bm = jnp.minimum(ids_i, 15)
    pad = t * b - nblk
    nib_p = jnp.pad(nib_bm, ((0, pad), (0, 0))) if pad else nib_bm
    tiles = jnp.swapaxes(nib_p.reshape(t, b, bs), 1, 2)
    maxv = jnp.max(tiles, axis=-1)
    costs = [jnp.where(maxv == 0, jnp.int32(0), jnp.int32(1 << 30))]
    for wb in (1, 2, 3, 4):
        thr = (1 << wb) - 1
        cnt = jnp.sum((tiles >= thr).astype(jnp.int32), axis=-1)
        costs.append(jnp.int32(wb * b) + jnp.int32(8) * cnt)
    width = jnp.argmin(jnp.stack(costs), axis=0).astype(jnp.int32)
    cap = b // 2
    packed = jnp.zeros((t, bs, cap), jnp.uint8)
    for wb in (1, 2, 3, 4):
        thr = (1 << wb) - 1
        pk = idpack._pack_w(jnp.minimum(tiles, thr), wb, b)
        pk = jnp.pad(pk, ((0, 0), (0, 0), (0, cap - pk.shape[-1])))
        packed = jnp.where((width == wb)[..., None], pk, packed)
    return width, packed

def v4(eps, x):
    o, sm = pipe(eps, x)
    width, packed = pack_no_exc(o[0], N, B)
    return (jnp.sum(packed.astype(jnp.float32)) + jnp.sum(width.astype(jnp.float32))
            + consume_pipe(o) + sm)

# V5: pipeline + ONLY the pack exception compaction (no width/pack)
def v5(eps, x):
    o, sm = pipe(eps, x)
    ids2d = o[0]
    nblk, bs = ids2d.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (nblk, bs), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nblk, bs), 1)
    valid = (row * bs + col < N) & (col >= 1)
    ids_i = jnp.where(valid, ids2d.astype(jnp.int32), 0)
    nib_bm = jnp.minimum(ids_i, 15)
    width = jnp.full((idpack.tiles_of(nblk, B), bs), 2, jnp.int32)
    thr_bm = idpack._thr_block_major(width, nblk, B)
    exc_mask = nib_bm >= thr_bm
    cw = chunk_width(nblk * bs, bs)
    exc_rows, exc_counts, exc_ovf = cp.compact_chunked(
        exc_mask.reshape(-1), ids_i.reshape(-1), cw, min(idpack.CAPE, cw))
    return (jnp.sum(exc_rows.astype(jnp.float32)) + jnp.sum(exc_counts.astype(jnp.float32))
            + exc_ovf.astype(jnp.float32) + consume_pipe(o) + sm)

for name, fn in [("v1_chain_current", v1), ("v2_barrier", v2),
                 ("v3_kernel+pack_no_compaction", v3),
                 ("v4_pipe+pack_no_exc", v4), ("v5_pipe+exc_only", v5)]:
    print(f"{name:30s} {amort(fn, x):7.2f} ms", flush=True)
