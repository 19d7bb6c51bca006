"""Microbench: pack_ids stage decomposition + u8-tiles variant (TPU).

Not part of the package — dev scratch, deleted after measurement.
"""
import os, pathlib, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).parent / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dctz_tpu.ops import idpack
from dctz_tpu.ops import compaction as cp
from dctz_tpu.core.quantize import chunk_width

N = 1 << 25
BS = 64
NBLK = N // BS
B = idpack.B_DEFAULT
T = idpack.tiles_of(NBLK, B)
_WIDTHS = (0, 1, 2, 3, 4)
_INF = jnp.int32(1 << 30)

K = 8

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
    return best / K * 1e3  # ms

# synthetic id grid shaped like the bench workload: mostly tiny ids at high
# freq positions, larger at low positions, rare escapes
def make_ids():
    key = jax.lax.broadcasted_iota(jnp.int32, (NBLK, BS), 1)
    r = jax.lax.broadcasted_iota(jnp.int32, (NBLK, BS), 0)
    h = (r * 1103515245 + key * 12345) & 0x7FFFFFFF
    mag = jnp.maximum(0, 12 - key) + (h % 3)
    esc = (h % 997) == 0
    ids = jnp.where(esc, 255, jnp.minimum(mag, 254))
    ids = jnp.where(key == 0, 255, ids)
    return ids.astype(jnp.uint8)

ids = jax.jit(make_ids)()
_sync(ids)

# --- full current pack_ids
def full(eps, ids):
    o = idpack.pack_ids(ids, N, B, idpack.CAPE)
    return (jnp.sum(o[1].astype(jnp.float32)) + jnp.sum(o[0].astype(jnp.float32))
            + jnp.sum(o[2].astype(jnp.float32)) + jnp.sum(o[3].astype(jnp.float32))
            + o[4].astype(jnp.float32) + eps)

# --- stage: nibble + transpose only
def nib_tiles(ids, dtype=jnp.int32, barrier=False):
    row = jax.lax.broadcasted_iota(jnp.int32, (NBLK, BS), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (NBLK, BS), 1)
    valid = (row * BS + col < N) & (col >= 1)
    ids_i = jnp.where(valid, ids.astype(jnp.int32), 0)
    nib_bm = jnp.minimum(ids_i, 15)
    pad = T * B - NBLK
    nib_p = jnp.pad(nib_bm, ((0, pad), (0, 0))) if pad else nib_bm
    tiles = jnp.swapaxes(nib_p.reshape(T, B, BS), 1, 2)
    if barrier:
        (tiles,) = jax.lax.optimization_barrier((tiles,))
    if dtype != jnp.int32:
        tiles = tiles.astype(dtype)
        if barrier:
            (tiles,) = jax.lax.optimization_barrier((tiles,))
    return ids_i, nib_bm, tiles

def s_transpose(eps, ids):
    _, _, tiles = nib_tiles(ids)
    return jnp.sum(tiles.astype(jnp.float32)) * 1e-9 + eps

def s_select(eps, ids):
    _, _, tiles = nib_tiles(ids)
    maxv = jnp.max(tiles, axis=-1)
    costs = [jnp.where(maxv == 0, jnp.int32(0), _INF)]
    for wb in _WIDTHS[1:]:
        thr = (1 << wb) - 1
        cnt = jnp.sum((tiles >= thr).astype(jnp.int32), axis=-1)
        costs.append(jnp.int32(wb * B) + jnp.int32(8) * cnt)
    width = jnp.argmin(jnp.stack(costs), axis=0)
    return jnp.sum(width.astype(jnp.float32)) + eps

def s_pack(eps, ids):
    _, _, tiles = nib_tiles(ids)
    width = jnp.full((T, BS), 4, jnp.int32)
    cap = B // 2
    packed = jnp.zeros((T, BS, cap), jnp.uint8)
    for wb in _WIDTHS[1:]:
        thr = (1 << wb) - 1
        pk = idpack._pack_w(jnp.minimum(tiles, thr), wb, B)
        pk = jnp.pad(pk, ((0, 0), (0, 0), (0, cap - pk.shape[-1])))
        packed = jnp.where((width == wb)[..., None], pk, packed)
    return jnp.sum(packed.astype(jnp.float32)) * 1e-9 + eps

def s_exc(eps, ids):
    ids_i, nib_bm, _ = nib_tiles(ids)
    width = jnp.full((T, BS), 2, jnp.int32)
    thr_bm = idpack._thr_block_major(width, NBLK, B)
    exc_mask = nib_bm >= thr_bm
    cw = chunk_width(NBLK * BS, BS)
    exc_rows, exc_counts, exc_ovf = cp.compact_chunked(
        exc_mask.reshape(-1), ids_i.reshape(-1), cw, min(idpack.CAPE, cw))
    return (jnp.sum(exc_rows.astype(jnp.float32)) + jnp.sum(exc_counts.astype(jnp.float32))
            + exc_ovf.astype(jnp.float32) + eps)

# --- u8 variant: select+pack on u8 tiles behind a barrier
def full_u8(eps, ids):
    ids_i, nib_bm, tiles = nib_tiles(ids, jnp.uint8, barrier=True)
    t8 = tiles
    maxv = jnp.max(t8, axis=-1).astype(jnp.int32)
    costs = [jnp.where(maxv == 0, jnp.int32(0), _INF)]
    for wb in _WIDTHS[1:]:
        thr = (1 << wb) - 1
        cnt = jnp.sum((t8 >= thr).astype(jnp.int32), axis=-1)
        costs.append(jnp.int32(wb * B) + jnp.int32(8) * cnt)
    width = jnp.argmin(jnp.stack(costs), axis=0).astype(jnp.int32)
    cap = B // 2
    packed = jnp.zeros((T, BS, cap), jnp.uint8)
    for wb in _WIDTHS[1:]:
        thr = jnp.uint8((1 << wb) - 1)
        pk = idpack._pack_w(jnp.minimum(t8, thr).astype(jnp.int32), wb, B)
        pk = jnp.pad(pk, ((0, 0), (0, 0), (0, cap - pk.shape[-1])))
        packed = jnp.where((width == wb)[..., None], pk, packed)
    thr_bm = idpack._thr_block_major(width, NBLK, B)
    exc_mask = nib_bm >= thr_bm
    cw = chunk_width(NBLK * BS, BS)
    exc_rows, exc_counts, exc_ovf = cp.compact_chunked(
        exc_mask.reshape(-1), ids_i.reshape(-1), cw, min(idpack.CAPE, cw))
    return (jnp.sum(packed.astype(jnp.float32)) + jnp.sum(width.astype(jnp.float32))
            + jnp.sum(exc_rows.astype(jnp.float32)) + jnp.sum(exc_counts.astype(jnp.float32))
            + exc_ovf.astype(jnp.float32) + eps)

for name, fn in [
    ("full_current", full),
    ("transpose_only", s_transpose),
    ("transpose+select", s_select),
    ("transpose+pack4x", s_pack),
    ("transpose+exc_compact", s_exc),
    ("full_u8_variant", full_u8),
]:
    ms = amort(fn, ids)
    print(f"{name:24s} {ms:7.2f} ms")
