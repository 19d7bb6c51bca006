"""Probe round 3: scratch-ref strided slice, u8->i32->f32->bf16 cast chain."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))
import os, pathlib
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, kernel, ins, outs, scratch=()):
    try:
        r = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ins],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in outs],
            out_shape=outs,
            scratch_shapes=list(scratch),
        )(*ins)
        return r[0] if isinstance(r, (list, tuple)) else r
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None

# A. scratch ref store + strided slice + lane concat
def k_sc(a_ref, o_ref, scr):
    scr[:] = a_ref[:] * 2
    o_ref[:] = jnp.concatenate([scr[i::8, :] for i in range(8)], axis=1)
a = jnp.arange(256 * 64, dtype=jnp.int32).reshape(256, 64)
r = probe("scratch stride+concat", k_sc, [a],
          [jax.ShapeDtypeStruct((32, 512), jnp.int32)],
          scratch=(pltpu.VMEM((256, 64), jnp.int32),))
if r is not None:
    ref = np.concatenate([(np.asarray(a) * 2)[i::8] for i in range(8)], axis=1)
    print(f"scratch stride+concat: {np.array_equal(np.asarray(r), ref)}", flush=True)

# B. u8 -> i32 -> f32 -> bf16 cast chain + gather matmul
def k_gather(by_ref, o_ref):
    byf = by_ref[:].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    G = (i == k // 2).astype(jnp.float32).astype(jnp.bfloat16)
    bsel = jax.lax.dot_general(
        byf, G, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    s = (jax.lax.broadcasted_iota(jnp.int32, (64, 256), 1) % 2) * 4
    o_ref[:] = (bsel.astype(jnp.int32) >> s) & 15
by = (jnp.arange(64 * 128, dtype=jnp.int32) % 256).astype(jnp.uint8).reshape(64, 128)
r = probe("gather-unpack w4 v2", k_gather, [by], [jax.ShapeDtypeStruct((64, 256), jnp.int32)])
if r is not None:
    bn = np.asarray(by, np.int32)
    ref = np.zeros((64, 256), np.int32)
    for k in range(256):
        ref[:, k] = (bn[:, k // 2] >> (4 * (k % 2))) & 15
    print(f"gather-unpack w4 v2: {np.array_equal(np.asarray(r), ref)}", flush=True)

# C. width transpose via cast chain
def k_wt(w_ref, o_ref):
    wf = w_ref[:].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    e = (jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0)
         == jax.lax.broadcasted_iota(jnp.int32, (64, 64), 1)
         ).astype(jnp.float32).astype(jnp.bfloat16)
    wt = jax.lax.dot_general(e, wf, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[:] = wt.astype(jnp.int32)
w = (jnp.arange(64, dtype=jnp.int32) % 5).astype(jnp.uint8).reshape(1, 64)
r = probe("width transpose v2", k_wt, [w], [jax.ShapeDtypeStruct((64, 1), jnp.int32)])
if r is not None:
    print(f"width transpose v2: {np.array_equal(np.asarray(r)[:, 0], np.asarray(w, np.int32)[0])}", flush=True)
