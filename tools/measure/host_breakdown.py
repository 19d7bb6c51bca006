"""Warm host-stage breakdown (min of 10) on the bench container."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))
import os, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import dctz_tpu
from dctz_tpu import api
from dctz_tpu.config import CodecConfig
from dctz_tpu.core import container as ct, entropy
from dctz_tpu.ops import idpack

N = 1 << 25
t = np.arange(N, dtype=np.float32)
x = (np.sin(t * np.float32(0.001)) * np.float32(40.0)
     + np.sin(t * np.float32(0.137)) * np.float32(3.0)
     + np.sin(t * np.float32(2.03)) * np.float32(0.3))
x = np.where(np.arange(N, dtype=np.int32) % 9973 == 0, x * np.float32(8.0), x).astype(np.float32)
CFG = CodecConfig(mode="ec", error_bound=1e-3, container="v2", ids_codec="device", verify=True, segment_elems=0)
blob = dctz_tpu.compress(x, config=CFG)
print("ratio", N*4/len(blob))

def mn(f, reps=10):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); f(); best = min(best, time.perf_counter()-t0)
    return best * 1e3

header, streams, qtable, _cb = ct.parse_v2(blob)
# ---- decompress side ----
print(f"parse_v2            : {mn(lambda: ct.parse_v2(blob)):7.2f} ms")
print(f"dpk_decode_prep      : {mn(lambda: api._dpk_decode_prep(header, streams)):7.2f} ms")
widths_z, packed_raw, exc_z, meta_z, dz, az = streams
_pkd = (entropy.chunked_unzstd if header.dpks else
        (entropy.chunked_inflate if header.dpkz else (lambda c: b"".join(c))))
print(f"  packed decode      : {mn(lambda: _pkd(packed_raw)):7.2f} ms  ({sum(len(c) for c in packed_raw)/1e6:.1f} MB, dpks={header.dpks} dpkz={header.dpkz} dpkr={header.dpkr})")
print(f"  exc side           : {mn(lambda: entropy.chunked_unzstd(exc_z)):7.2f} ms  ({sum(len(c) for c in exc_z)/1e6:.1f} MB)")
print(f"  dc float sec       : {mn(lambda: api._decode_float_section(header, dz)):7.2f} ms")
print(f"  ac float sec       : {mn(lambda: api._decode_float_section(header, az)):7.2f} ms")
tight = _pkd(packed_raw)
(width, rows, exc_rows, dc_raw, ac_raw, n_stream, tile_b, cw, ac_counts, nblk) = api._dpk_host_rebuild(header, streams)
bpr = idpack.packed_nbytes(np.asarray(width).reshape(-1), tile_b)
print(f"  pad rows (packed)  : {mn(lambda: entropy.pad_row_prefixes(tight, bpr, tile_b//2, np.uint8)):7.2f} ms")
exc_tight = np.frombuffer(entropy.chunked_unzstd(exc_z), np.uint8) if header.zst else None
meta = entropy.chunked_unzstd(meta_z)
import struct as st
nch = (nblk*64)//cw
exc_counts = np.frombuffer(meta, np.uint16, nch, api._DPK_META_SIZE).astype(np.int64)
print(f"  pad rows (exc)     : {mn(lambda: entropy.pad_row_prefixes(exc_tight, exc_counts, 128, np.uint8)):7.2f} ms")
acc = np.frombuffer(meta, np.uint16, nch, api._DPK_META_SIZE + 2*nch).astype(np.int64)
ac = np.frombuffer(ac_raw, np.float32, header.ac_count)
print(f"  pad rows (ac)      : {mn(lambda: entropy.pad_row_prefixes(ac, acc, 128, np.float32)):7.2f} ms")

# ---- compress side: the zlib stage of compress() (rerun sections only) ----
# reproduce _compress_fused's host stage from the device outputs
# source the device-output arrays from the container rebuild (identical
# shapes/content to what the device would hand the host)
wdt = np.asarray(width)
packed = np.asarray(rows)
exc_rows2 = np.asarray(exc_rows)
exc_counts2 = exc_counts
ac_chunks = entropy.pad_row_prefixes(ac, acc, 128, np.float32)
counts = acc
dc = np.frombuffer(dc_raw, np.float32, nblk)
hdr2 = ct.Header(dtype=np.dtype(np.float32), num_elements=N, error_bound=1e-3,
                 ac_count=int(counts.sum()), scaling_factor=header.scaling_factor, mean=header.mean,
                 bindex_nbytes=0, dc_nbytes=0, ac_nbytes=0, mode="ec", block_size=64,
                 nbins=255, truncate=True)
from dctz_tpu.core.quantize import chunk_width
def comp_host():
    h = ct.Header(**{f: getattr(hdr2, f) for f in ("dtype","num_elements","error_bound","ac_count","scaling_factor","mean","bindex_nbytes","dc_nbytes","ac_nbytes","mode","block_size","nbins","truncate")})
    h.shuffle = CFG.shuffle
    pool = entropy.section_pool()
    def _ac_task():
        acs = entropy.take_row_prefixes(ac_chunks, counts)
        return api._float_sections(acs.tobytes(), 4, CFG, h)
    f_dc = pool.submit(api._float_sections, dc.tobytes(), 4, CFG, h)
    f_ac = pool.submit(_ac_task)
    streams2 = api._dpk_sections(wdt, packed, exc_rows2, exc_counts2, counts,
                                 256, chunk_width(N, 64), N, CFG, h) + (f_dc.result(), f_ac.result())
    return ct.pack_v2(h, streams2, None, CFG.chunk_bytes)
print(f"compress host total  : {mn(comp_host):7.2f} ms")
h3 = hdr2
def _pk():
    bpr2 = idpack.packed_nbytes(wdt.reshape(-1), 256)
    tight2 = entropy.take_row_prefixes(packed, bpr2)
    return entropy.chunked_zstd(tight2.tobytes(), CFG.chunk_bytes, 1)
print(f"  packed gather+zstd : {mn(_pk):7.2f} ms")
def _ex():
    t2 = entropy.take_row_prefixes(exc_rows2, exc_counts2)
    return entropy.chunked_zstd(memoryview(t2), CFG.chunk_bytes, 1)
print(f"  exc gather+zstd    : {mn(_ex):7.2f} ms")
h4 = ct.Header(**{f: getattr(hdr2, f) for f in ("dtype","num_elements","error_bound","ac_count","scaling_factor","mean","bindex_nbytes","dc_nbytes","ac_nbytes","mode","block_size","nbins","truncate")})
print(f"  dc float sec       : {mn(lambda: api._float_sections(dc.tobytes(), 4, CFG, h4)):7.2f} ms")
acs = entropy.take_row_prefixes(ac_chunks, counts)
print(f"  ac gather          : {mn(lambda: entropy.take_row_prefixes(ac_chunks, counts)):7.2f} ms")
print(f"  ac float sec       : {mn(lambda: api._float_sections(acs.tobytes(), 4, CFG, h4)):7.2f} ms")
st2 = api._dpk_sections(wdt, packed, exc_rows2, exc_counts2, counts, 256, chunk_width(N,64), N, CFG, h3) + (
    api._float_sections(dc.tobytes(), 4, CFG, h3), api._float_sections(acs.tobytes(), 4, CFG, h3))
print(f"  pack_v2 (crc+join) : {mn(lambda: ct.pack_v2(h3, st2, None, CFG.chunk_bytes)):7.2f} ms")
