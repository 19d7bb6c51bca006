"""Probe Mosaic support for the dpk_fuse building blocks on the real TPU."""
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
        r = r[0] if isinstance(r, (list, tuple)) else r
        print(f"{name}: OK", flush=True)
        return r
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None

# 1. pltpu.repeat semantics on lanes
def k_rep(a_ref, o_ref):
    o_ref[:] = pltpu.repeat(a_ref[:], 2, axis=1)
a = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
r = probe("repeat axis=1", k_rep, [a], [jax.ShapeDtypeStruct((8, 256), jnp.int32)])
if r is not None:
    rn = np.asarray(r)
    elem = np.array_equal(rn[0, :4], np.array([0, 0, 1, 1]))
    tile = np.array_equal(rn[0, :4], np.array([0, 1, 2, 3])) and np.array_equal(rn[0, 128:132], np.array([0, 1, 2, 3]))
    print(f"  repeat semantics: elementwise={elem} tile={tile} first8={rn[0,:8]}")

# 2. dot_general transpose (contract dim0 x dim0), bf16 -> f32
def k_tr(a_ref, e_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], e_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
a = (jnp.arange(64 * 256, dtype=jnp.int32) % 16).reshape(64, 256).astype(jnp.bfloat16)
e = jnp.eye(64, dtype=jnp.bfloat16)
r = probe("dg transpose bf16", k_tr, [a, e], [jax.ShapeDtypeStruct((256, 64), jnp.float32)])
if r is not None:
    ok = np.array_equal(np.asarray(r), np.asarray(a, np.float32).T)
    print(f"  transpose exact: {ok}")

# 3. vector shift amounts (i32 >> iota)
def k_shift(a_ref, o_ref):
    s = jax.lax.broadcasted_iota(jnp.int32, a_ref.shape, 1) % 8
    o_ref[:] = (a_ref[:] >> s) & 15
a = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
r = probe("vector shift", k_shift, [a], [jax.ShapeDtypeStruct((8, 128), jnp.int32)])
if r is not None:
    an = np.asarray(a); sn = (np.arange(128) % 8)[None, :]
    print(f"  shift exact: {np.array_equal(np.asarray(r), (an >> sn) & 15)}")

# 4. reshape (256,64)->(32,512) in-kernel
def k_resh(a_ref, o_ref):
    o_ref[:] = a_ref[:].reshape(32, 512)
a = jnp.arange(256 * 64, dtype=jnp.int32).reshape(256, 64)
r = probe("reshape 256x64->32x512", k_resh, [a], [jax.ShapeDtypeStruct((32, 512), jnp.int32)])
if r is not None:
    print(f"  reshape exact: {np.array_equal(np.asarray(r), np.asarray(a).reshape(32,512))}")

# 5. reshape back (32,512)->(256,64)
def k_resh2(a_ref, o_ref):
    o_ref[:] = a_ref[:].reshape(256, 64)
a = jnp.arange(32 * 512, dtype=jnp.int32).reshape(32, 512)
r = probe("reshape 32x512->256x64", k_resh2, [a], [jax.ShapeDtypeStruct((256, 64), jnp.int32)])
if r is not None:
    print(f"  reshape2 exact: {np.array_equal(np.asarray(r), np.asarray(a).reshape(256,64))}")

# 6. strided sublane slice a[i::8, :]
def k_stride(a_ref, o_ref):
    o_ref[:] = a_ref[3::8, :]
a = jnp.arange(256 * 64, dtype=jnp.int32).reshape(256, 64)
r = probe("strided sublane slice", k_stride, [a], [jax.ShapeDtypeStruct((32, 64), jnp.int32)])
if r is not None:
    print(f"  stride exact: {np.array_equal(np.asarray(r), np.asarray(a)[3::8])}")

# 7. u8 load + cast to i32
def k_u8(a_ref, o_ref):
    o_ref[:] = a_ref[:].astype(jnp.int32) * 2
a = (jnp.arange(64 * 128, dtype=jnp.int32) % 251).astype(jnp.uint8).reshape(64, 128)
r = probe("u8 load+cast", k_u8, [a], [jax.ShapeDtypeStruct((64, 128), jnp.int32)])
if r is not None:
    print(f"  u8 exact: {np.array_equal(np.asarray(r), np.asarray(a, np.int32)*2)}")

# 8. (1,64) block read + broadcast to (256,64)
def k_bcast(w_ref, o_ref):
    o_ref[:] = jnp.broadcast_to(w_ref[0:1, :].astype(jnp.int32), (256, 64))
w = (jnp.arange(64, dtype=jnp.int32) % 5).astype(jnp.uint8).reshape(1, 64)
r = probe("u8 (1,64) bcast", k_bcast, [w], [jax.ShapeDtypeStruct((256, 64), jnp.int32)])
if r is not None:
    print(f"  bcast exact: {np.array_equal(np.asarray(r), np.broadcast_to(np.asarray(w,np.int32),(256,64)))}")
