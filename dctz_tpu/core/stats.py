"""Input statistics and scaling factor.

Reference: calc_data_stat (util.c:12-44) makes one sequential pass computing
max|x|, min|x|, mean, and the scaling factor
    sf = 10 ** (ceil(log10(max|x|)) - SF_ADJ_AMT)
The compressor then divides the input by sf in place (dctz-comp-lib.c:193-217)
and the decompressor multiplies it back (dctz-decomp-lib.c:494-511).

Here the pass is a pair of XLA reductions (max of |x|, mean); on a sharded
array the max becomes a `lax.pmax` over the mesh (see parallel/sharding.py).

Deliberate deviation: the reference computes sf = 0 for an all-zero input
(log10(0) = -inf) and then divides by zero; we clamp sf to 1 in that case.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DataStats(NamedTuple):
    amax: jax.Array  # max |x|, scalar
    mean: jax.Array  # scalar
    sf: jax.Array  # scaling factor, scalar


def scaling_factor(amax: jax.Array, sf_adj: int) -> jax.Array:
    """sf = 10**(ceil(log10(amax)) - sf_adj); 1.0 for amax == 0 (util.c:28,42)."""
    dtype = amax.dtype
    safe = jnp.maximum(amax, jnp.finfo(dtype).tiny)
    exp = jnp.ceil(jnp.log10(safe)) - sf_adj
    sf = jnp.power(jnp.asarray(10.0, dtype), exp)
    return jnp.where(amax > 0, sf, jnp.asarray(1.0, dtype))


def calc_data_stat(x: jax.Array, sf_adj: int) -> DataStats:
    """Statistics pass over a flat array (util.c:12-44 equivalent)."""
    amax = jnp.max(jnp.abs(x))
    mean = jnp.mean(x)
    return DataStats(amax=amax, mean=mean, sf=scaling_factor(amax, sf_adj))
