"""DCTZ-TPU: a TPU-native, error-bounded lossy compressor for floating-point
scientific data.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of swson/DCTZ
(reference at /root/reference): blockwise orthonormal DCT-II + adaptive
255-bin quantization with exact-outlier (EC) or quantizer-table (QT)
handling, zlib entropy coding, and a self-describing container — redesigned
as static-shape tensor algebra that scales over a TPU device mesh.

Quick start:
    import numpy as np, dctz_tpu
    x = np.random.randn(1_000_000).astype(np.float32)
    blob = dctz_tpu.compress(x, error_bound=1e-3, mode="ec")
    y = dctz_tpu.decompress(blob)
"""

from .api import compress, compress_sharded, decompress, decompress_sharded
from .config import CodecConfig
from .core.constants import BLK_SZ, NBINS, VERSION
from .utils.metrics import evaluate

__version__ = VERSION

__all__ = [
    "compress",
    "decompress",
    "compress_sharded",
    "decompress_sharded",
    "CodecConfig",
    "evaluate",
    "BLK_SZ",
    "NBINS",
    "VERSION",
]
