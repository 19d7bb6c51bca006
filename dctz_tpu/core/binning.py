"""Bin geometry: zigzag-from-center bin ids in closed form.

The reference uses two lookup tables:
  * conv_tbl (dctz-comp-lib.c:27-43) remaps the linear bin index
    (0..254, 127 = center) to a "zigzag-from-center" id so that small ids
    correspond to small magnitudes — much friendlier to deflate.
  * bin_center (gen_bins, binning.c:12-50) maps an id back to its bin center:
    bin_center[0] = 0; odd i -> +((i//2)+1)*w; even i -> -(i//2)*w.

Both tables are pure arithmetic, so on TPU we compute them in closed form on
the VPU instead of gathering through a table:

  encode:  id = 2*(half - lin)        if lin <= half
           id = 2*(lin - half) - 1    if lin >  half
  decode:  center = -(id//2)*w        if id even
           center = +((id//2)+1)*w    if id odd

which reproduces conv_tbl / gen_bins exactly (verified element-for-element in
tests/test_binning.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv_table_np(nbins: int) -> np.ndarray:
    """The reference conv_tbl as an array (for tests/tools only)."""
    lin = np.arange(nbins)
    half = nbins // 2
    return np.where(lin <= half, 2 * (half - lin), 2 * (lin - half) - 1).astype(
        np.uint8
    )


def bin_centers_np(nbins: int, error_bound: float, brsf: float = 1.0) -> np.ndarray:
    """The reference gen_bins table (binning.c:12-30) as an array."""
    w = error_bound * 2.0 * brsf
    i = np.arange(nbins)
    tmp = np.where(i % 2 == 1, (i // 2) + 1, -(i // 2))
    return (tmp * w).astype(np.float64)


def linear_to_zigzag(lin: jax.Array, nbins: int) -> jax.Array:
    """Closed form of conv_tbl[lin]; lin is int32 in [0, nbins-1]."""
    half = nbins // 2
    return jnp.where(lin <= half, 2 * (half - lin), 2 * (lin - half) - 1)


def zigzag_to_center(ids: jax.Array, bin_width: jax.Array) -> jax.Array:
    """Closed form of bin_center[conv_tbl_i[id]] (conv_tbl_i is the identity,
    dctz-decomp-lib.c:23-39); ids int32 in [0, nbins-1]."""
    k = ids // 2
    tmp = jnp.where(ids % 2 == 1, k + 1, -k)
    return tmp.astype(bin_width.dtype) * bin_width
