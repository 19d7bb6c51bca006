"""Probe round 2: value strided slice, lane concat, in-kernel constructed
selection matrices, interleave matmul, small transpose, u8 (1,64) handling."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))
import os, pathlib
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, kernel, ins, outs):
    try:
        r = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ins],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in outs],
            out_shape=outs,
        )(*ins)
        return r[0] if isinstance(r, (list, tuple)) else r
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None

# A. strided slice of a computed VALUE + lane concat -> (32,512)
def k_sc(a_ref, o_ref):
    v = a_ref[:] * 2  # a computed value, not a ref
    o_ref[:] = jnp.concatenate([v[i::8, :] for i in range(8)], axis=1)
a = jnp.arange(256 * 64, dtype=jnp.int32).reshape(256, 64)
r = probe("value stride+concat", k_sc, [a], [jax.ShapeDtypeStruct((32, 512), jnp.int32)])
if r is not None:
    ref = np.concatenate([(np.asarray(a)*2)[i::8] for i in range(8)], axis=1)
    print(f"value stride+concat: {np.array_equal(np.asarray(r), ref)}", flush=True)

# B. in-kernel jnp.pad along lanes of a value
def k_pad(a_ref, o_ref):
    o_ref[:] = jnp.pad(a_ref[:] + 1, ((0, 0), (0, 384)))
a = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
r = probe("pad lanes", k_pad, [a], [jax.ShapeDtypeStruct((32, 512), jnp.float32)])
if r is not None:
    ref = np.pad(np.asarray(a) + 1, ((0, 0), (0, 384)))
    print(f"pad lanes: {np.array_equal(np.asarray(r), ref)}", flush=True)

# C. iota-built bf16 selection matrix + byte-gather matmul (w=4 unpack)
def k_gather(by_ref, o_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    G = (i == k // 2).astype(jnp.bfloat16)
    bsel = jax.lax.dot_general(
        by_ref[:].astype(jnp.bfloat16), G, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = (jax.lax.broadcasted_iota(jnp.int32, (64, 256), 1) % 2) * 4
    o_ref[:] = (bsel.astype(jnp.int32) >> s) & 15
by = (jnp.arange(64 * 128, dtype=jnp.int32) % 256).astype(jnp.uint8).reshape(64, 128)
r = probe("gather-unpack w4", k_gather, [by], [jax.ShapeDtypeStruct((64, 256), jnp.int32)])
if r is not None:
    bn = np.asarray(by, np.int32)
    ref = np.zeros((64, 256), np.int32)
    for k in range(256):
        ref[:, k] = (bn[:, k // 2] >> (4 * (k % 2))) & 15
    print(f"gather-unpack w4: {np.array_equal(np.asarray(r), ref)}", flush=True)

# D. interleave matmul (32,512)->(128,128) via R @ stacked, f32 HIGHEST
def k_il(a_ref, o_ref):
    cw, cpt = 512, 32
    g128 = cw // 128  # 4
    stacked = jnp.concatenate(
        [a_ref[:, 128 * k : 128 * (k + 1)] for k in range(g128)], axis=0
    )  # (128,128): row q = k*cpt + c
    rr = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    qq = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    R = ((qq % cpt == rr // g128) & (qq // cpt == rr % g128)).astype(jnp.float32)
    o_ref[:] = jax.lax.dot_general(
        R, stacked, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
a = jnp.asarray(np.random.default_rng(0).standard_normal((32, 512)), jnp.float32)
r = probe("interleave matmul", k_il, [a], [jax.ShapeDtypeStruct((128, 128), jnp.float32)])
if r is not None:
    ref = np.asarray(a).reshape(128, 128)
    print(f"interleave matmul: {np.array_equal(np.asarray(r), ref)}", flush=True)

# E. width column transpose (1,64) -> (64,1) via dg with eye
def k_wt(w_ref, o_ref):
    wf = w_ref[:].astype(jnp.bfloat16)  # (1,64), values <= 4
    e = (jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0)
         == jax.lax.broadcasted_iota(jnp.int32, (64, 64), 1)).astype(jnp.bfloat16)
    wt = jax.lax.dot_general(e, wf, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (64,1)
    o_ref[:] = wt.astype(jnp.int32)
w = (jnp.arange(64, dtype=jnp.int32) % 5).astype(jnp.uint8).reshape(1, 64)
r = probe("width transpose", k_wt, [w], [jax.ShapeDtypeStruct((64, 1), jnp.int32)])
if r is not None:
    print(f"width transpose: {np.array_equal(np.asarray(r)[:, 0], np.asarray(w, np.int32)[0])}", flush=True)

# F. pltpu.repeat tile-broadcast of (1,64) thr to (1,512)
def k_thr(w_ref, o_ref):
    wi = w_ref[:].astype(jnp.int32)
    thr = jnp.where(wi > 0, (1 << wi) - 1, jnp.int32(1 << 20))
    o_ref[:] = jnp.broadcast_to(pltpu.repeat(thr, 8, axis=1), (32, 512))
r = probe("thr tile-repeat", k_thr, [w], [jax.ShapeDtypeStruct((32, 512), jnp.int32)])
if r is not None:
    wn = np.asarray(w, np.int32)[0]
    thr = np.where(wn > 0, (1 << wn) - 1, 1 << 20)
    ref = np.broadcast_to(np.tile(thr, 8)[None, :], (32, 512))
    print(f"thr tile-repeat: {np.array_equal(np.asarray(r), ref)}", flush=True)

# G. dc placement matmul (cpt,g)@(g,cw) one-hot f32 HIGHEST
def k_dc(dc_ref, o_ref):
    g, cw = 8, 512
    i = jax.lax.broadcasted_iota(jnp.int32, (g, cw), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (g, cw), 1)
    E = ((q == 64 * i)).astype(jnp.float32)
    o_ref[:] = jax.lax.dot_general(
        dc_ref[:], E, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
dc = jnp.asarray(np.random.default_rng(1).standard_normal((32, 8)), jnp.float32)
r = probe("dc placement", k_dc, [dc], [jax.ShapeDtypeStruct((32, 512), jnp.float32)])
if r is not None:
    ref = np.zeros((32, 512), np.float32)
    ref[:, ::64] = np.asarray(dc)
    print(f"dc placement: {np.array_equal(np.asarray(r), ref)}", flush=True)
