"""Streamed / segmented compression for arrays larger than device memory.

SURVEY.md §5 (checkpoint/resume): the reference compresses single-shot,
in-memory arrays only; multi-TB checkpoint arrays need bounded-memory
streaming. A stream is a sequence of independent v2 containers behind a
small frame header:

    b"DTZS" | u16 version | u16 reserved | u64 total_elements
    repeat: u64 frame_len | v2 container bytes
    u64 0  (end marker)

Semantics match the monolithic codec exactly: a first pass computes the
GLOBAL max|x| (the scaling factor must see the whole array — reference
util.c:28), then each segment is encoded with that fixed sf. Because DCT
blocks never cross segment boundaries (segments are block-multiples), the
concatenated bin/DC/AC streams are element-for-element identical to the
monolithic encoding; only the zlib framing differs.

Each segment is also independently decodable => natural partial-restore and
parallel/distributed decompression.
"""

from __future__ import annotations

import functools
import struct
from typing import BinaryIO, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .config import CodecConfig
from .core import container as ct
from .core import entropy
from .core import quantize as qz
from .core import transform
from .core.stats import scaling_factor

MAGIC = b"DTZS"
_HDR = struct.Struct("<4sHHQ")
_FRAME = struct.Struct("<Q")

DEFAULT_SEGMENT = 1 << 24  # 16Mi elements per segment


@functools.partial(jax.jit, static_argnums=(2, 3))
def _encode_segment(x: jax.Array, sf: jax.Array, n: int, cfg: CodecConfig):
    """Segment encode with an externally fixed scaling factor."""
    xs = x / sf.astype(x.dtype)
    main_c, tail_c = transform.forward(xs, cfg.block_size)
    from .api import _pad_coeffs

    coeffs = _pad_coeffs(main_c, tail_c, cfg.block_size)
    return qz.encode(coeffs, n, cfg)


def _segments(x: np.ndarray, segment_elems: int) -> Iterator[np.ndarray]:
    for off in range(0, x.shape[0], segment_elems):
        yield x[off : off + segment_elems]


def compress_stream(
    x: np.ndarray,
    out: BinaryIO,
    error_bound: float = 1e-3,
    mode: str = "ec",
    *,
    config: CodecConfig | None = None,
    segment_elems: int = DEFAULT_SEGMENT,
) -> int:
    """Compress `x` into `out` in bounded-memory segments; returns total
    bytes written. segment_elems is rounded to a block multiple."""
    cfg = config or CodecConfig(mode=mode, error_bound=error_bound, container="v2")
    x = np.asarray(x).reshape(-1)
    n = x.shape[0]
    if n == 0:
        raise ValueError("cannot compress an empty array")
    segment_elems = max(cfg.block_size, segment_elems - segment_elems % cfg.block_size)

    # pass 1: global statistics (the sf must see the whole array)
    amax = 0.0
    total = 0.0
    for seg in _segments(x, segment_elems):
        amax = max(amax, float(np.abs(seg).max()))
        total += float(seg.sum(dtype=np.float64))
    sf = float(
        jax.device_get(
            scaling_factor(jnp.asarray(amax, x.dtype), cfg.sf_adj)
        )
    )
    mean = total / n

    written = 0
    out.write(_HDR.pack(MAGIC, 1, 0, n))
    written += _HDR.size

    # Two-stage software pipeline: the device encodes segment k while the
    # host entropy-codes segment k-1 (device dispatches are async; the
    # blocking device_get lives in the host worker). Depth 2 bounds device
    # memory to two in-flight segments.
    import concurrent.futures

    from .api import _device_cfg

    def write_frame(blob: bytes) -> int:
        out.write(_FRAME.pack(len(blob)))
        out.write(blob)
        return _FRAME.size + len(blob)

    with concurrent.futures.ThreadPoolExecutor(1) as host_worker:
        pending = None
        for seg in _segments(x, segment_elems):
            q = _encode_segment(
                jnp.asarray(seg),
                jnp.asarray(np.asarray(sf, seg.dtype)),
                seg.shape[0],
                _device_cfg(cfg),
            )
            if pending is not None:
                written += write_frame(pending.result())
            pending = host_worker.submit(
                _pack_segment, q, seg.shape[0], np.dtype(seg.dtype), sf, mean, cfg
            )
        written += write_frame(pending.result())
    out.write(_FRAME.pack(0))
    return written + _FRAME.size


def _pack_segment(
    q, n: int, dtype: np.dtype, sf: float, mean: float, cfg: CodecConfig
) -> bytes:
    """Host stage of one segment: pull device results, entropy-code, pack
    (same filters/codecs as the monolithic v2 path)."""
    from .api import _assemble_ac, _ids_streams

    ac, bin_ids, ac_count = _assemble_ac(q)
    dc = np.asarray(jax.device_get(q.dc))
    qtable = np.asarray(jax.device_get(q.qtable)) if q.qtable is not None else None

    header = ct.Header(
        dtype=dtype,
        num_elements=n,
        error_bound=cfg.error_bound,
        ac_count=ac_count,
        scaling_factor=sf,
        mean=mean,
        bindex_nbytes=0,
        dc_nbytes=0,
        ac_nbytes=0,
        mode=cfg.mode,
        block_size=cfg.block_size,
        nbins=cfg.nbins,
        truncate=cfg.truncate,
    )
    flat_ids = bin_ids.reshape(-1)[:n]
    header.shuffle = cfg.shuffle
    dcb, acb = dc.tobytes(), ac.tobytes()
    if cfg.shuffle:
        dcb = entropy.shuffle_bytes(dcb, dc.dtype.itemsize)
        acb = entropy.shuffle_bytes(acb, ac.dtype.itemsize)
    streams = _ids_streams(flat_ids.tobytes(), cfg, header) + (
        entropy.chunked_deflate(dcb, cfg.chunk_bytes, cfg.zlib_level),
        entropy.chunked_deflate(acb, cfg.chunk_bytes, cfg.zlib_level),
    )
    return ct.pack_v2(
        header, streams, qtable if cfg.mode == "qt" else None, cfg.chunk_bytes
    )


def decompress_stream(f: BinaryIO) -> Iterator[np.ndarray]:
    """Yield reconstructed segments in order."""
    from .api import decompress

    hdr = f.read(_HDR.size)
    magic, version, _res, _total = _HDR.unpack(hdr)
    if magic != MAGIC:
        raise ValueError("not a DCTZ-TPU stream")
    if version != 1:
        raise ValueError(f"unsupported stream version {version}")
    while True:
        raw = f.read(_FRAME.size)
        (length,) = _FRAME.unpack(raw)
        if length == 0:
            return
        yield decompress(f.read(length))


def decompress_stream_all(f: BinaryIO) -> np.ndarray:
    """Reassemble the full array from a stream."""
    parts = list(decompress_stream(f))
    return np.concatenate(parts) if len(parts) > 1 else parts[0]
