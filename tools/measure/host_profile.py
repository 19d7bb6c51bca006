#!/usr/bin/env python
"""Profile the DPK host stages (compress packing + decompress rebuild) in
isolation on the CPU backend — the round-4 item-1 cost hunt. Produces the
same container the bench path emits (XLA encode on CPU gives identical
stream shapes) and times each host component.

Usage: python tools/measure/host_profile.py [n_elements_log2=25]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from dctz_tpu import api
from dctz_tpu.config import CodecConfig
from dctz_tpu.core import container as ct
from dctz_tpu.core import entropy
from dctz_tpu.utils.timing import StageTimer


def climate(n):
    t = np.arange(n, dtype=np.float32)
    x = (
        np.sin(t * np.float32(0.001)) * np.float32(40.0)
        + np.sin(t * np.float32(0.137)) * np.float32(3.0)
        + np.sin(t * np.float32(2.03)) * np.float32(0.3)
    )
    spike = np.arange(n, dtype=np.int32) % 9973 == 0
    return np.where(spike, x * np.float32(8.0), x).astype(np.float32)


def t_ms(fn, *a, reps=3, **kw):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 25)
    # force the TPU (chunked) layouts so the host arrays match the bench path
    from dctz_tpu.ops import compaction as cp

    cp.use_chunked_compaction = lambda: True
    x = climate(n)
    cfg = CodecConfig(
        mode="ec", error_bound=1e-3, container="v2", ids_codec="device",
        verify=False,
    )

    # ---- compress host stage breakdown ----
    # run the XLA device stage to get bench-shaped arrays
    import dataclasses
    import jax.numpy as jnp
    from dctz_tpu.core import quantize as qz
    from dctz_tpu.ops import idpack

    dcfg = api._device_cfg(cfg)
    q, stats = api._encode_device(jnp.asarray(x), n, dcfg, None)
    nblk_s, bs_s = q.bin_ids.shape
    cw = qz.chunk_width(nblk_s * bs_s, bs_s)
    pk = api._dpk_pack_device(q.bin_ids, n)
    ac_counts_dev = q.ac_count if q.overflowed is not None else idpack.ac_chunk_counts(q.bin_ids, n, cw)
    ac_chunks, counts = jax.device_get((q.ac_buf, q.ac_count))
    ac = entropy.take_row_prefixes(ac_chunks, counts)
    width, packed_rows, exc_rows, exc_counts = jax.device_get(pk)
    ac_counts = np.asarray(jax.device_get(ac_counts_dev))
    dc = np.asarray(jax.device_get(q.dc))
    print(f"shapes: width{width.shape} packed{packed_rows.shape} exc{exc_rows.shape} dc{dc.shape} ac{ac.shape} cw={cw}")
    print(f"ac_count={counts.sum() if counts.ndim else int(counts)} exc_total={int(exc_counts.sum())}")

    header = ct.Header(
        dtype=np.dtype(np.float32), num_elements=n, error_bound=cfg.error_bound,
        ac_count=int(ac_counts.sum()), scaling_factor=float(stats.sf),
        mean=float(stats.mean), bindex_nbytes=0, dc_nbytes=0, ac_nbytes=0,
        mode=cfg.mode, block_size=cfg.block_size, nbins=cfg.nbins,
        truncate=cfg.truncate, brsf=cfg.brsf,
    )
    header.shuffle = cfg.shuffle

    bpr = idpack.packed_nbytes(width.reshape(-1), idpack.B_DEFAULT)
    ms, tight = t_ms(entropy.take_row_prefixes, packed_rows, bpr)
    print(f"  take_row_prefixes(packed {packed_rows.nbytes/1e6:.1f}MB -> {tight.nbytes/1e6:.1f}MB): {ms:.2f} ms")

    ms, _ = t_ms(entropy.take_row_prefixes, ac_chunks, counts)
    print(f"  take_row_prefixes(ac): {ms:.2f} ms")

    ms, dc_sec = t_ms(api._float_sections, dc.tobytes(), 4, cfg, header)
    print(f"  _float_sections(dc {dc.nbytes/1e6:.1f}MB): {ms:.2f} ms")
    ms, ac_sec = t_ms(api._float_sections, ac.tobytes(), 4, cfg, header)
    print(f"  _float_sections(ac {ac.nbytes/1e6:.1f}MB): {ms:.2f} ms")

    ms, streams_ids = t_ms(
        api._dpk_sections, width, packed_rows, exc_rows, exc_counts,
        ac_counts, idpack.B_DEFAULT, cw, n, cfg, header,
    )
    print(f"  _dpk_sections (all 4 id sections incl gather): {ms:.2f} ms")

    streams = streams_ids + (dc_sec, ac_sec)
    ms, blob2 = t_ms(ct.pack_v2, header, streams, None, cfg.chunk_bytes)
    print(f"  pack_v2 (crc+join {len(blob2)/1e6:.1f}MB): {ms:.2f} ms")

    ms, blob = t_ms(api._pack_dpk_v2, header, width, packed_rows, exc_rows,
                    exc_counts, counts, ac_chunks, dc, nblk_s * bs_s, cfg,
                    None)
    print(f"  _pack_dpk_v2 TOTAL (pooled): {ms:.2f} ms "
          f"({len(blob)/1e6:.2f} MB, ratio {x.nbytes/len(blob):.2f})")

    # ---- decompress host stage breakdown ----
    header2, streams2, qtable2, _cb = ct.parse_v2(blob)
    ms, _ = t_ms(ct.parse_v2, blob)
    print(f"  parse_v2 (crc verify): {ms:.2f} ms")
    ms, _ = t_ms(api._dpk_host_rebuild, header2, streams2)
    print(f"  _dpk_host_rebuild: {ms:.2f} ms")
    ms, _ = t_ms(api._dpk_decode_prep, header2, streams2)
    print(f"  _dpk_decode_prep TOTAL: {ms:.2f} ms")


if __name__ == "__main__":
    main()
