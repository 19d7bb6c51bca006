"""Encode-side verify-and-repair: guaranteed pointwise error bound.

The reference guarantees its bound only in the DCT-coefficient domain of the
scaled data and ships the pointwise check DISABLED (/root/reference/
util.c:96-102): per-coefficient quantization errors (each <= eb) can
accumulate through the IDCT so that a few reconstructed ELEMENTS exceed
eb * value_range — observed on spiky datasets (sedov, random integers) at a
few tenths of a percent of blocks.

This pass closes that gap ON DEVICE, inside the encode program:

  1. reconstruct the array exactly as the decoder will (same dequantize
     arithmetic via quantize.decode's "dense" layout, same IDCT matmul,
     float32 stream truncation included);
  2. find blocks whose pointwise |x_hat - x| exceeds 0.99 * eb * range
     (1% slack absorbs backend ulp differences between the verifying and
     decoding devices);
  3. in those blocks force the error-carrying coefficients to ESCAPE so the
     decoder reads them (nearly) exactly: EC stores the coefficient verbatim
     (dctz-comp-lib.c:534-541 semantics), QT stores it through the same
     renormalization real escapes use (side chosen by sign — identical to
     the reference's out-of-range side for real escapes and its natural
     extension inside the range);
  4. repeat once with a zero floor (escape everything imprecise in blocks
     that still fail), then report the final verified flag.

Precision floors (documented, inherent to the formats): EC repair is exact
to f32 coefficient rounding. QT escapes decode through qtable[j], so a
forced escape carries ~1.5e-6 * qtable[j] of scaled-domain error — the
repair skips coefficients where escaping would not improve on their current
bin error, and the returned flag stays honest if a block cannot be fixed.

Everything is elementwise/reduction VPU work plus one extra IDCT matmul per
pass; no host round trip. The caller recompacts the AC stream from the
returned dense value grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig
from ..core import constants as C
from ..core import quantize as qz
from ..core import transform

_SLACK = 0.99  # verify against 0.99*tol: absorbs cross-backend ulp drift


def _stored_dense(coeffs, ids_i, ac_mask, cfg: CodecConfig, qtable):
    """Per-position stored values as the container would carry them:
    EC escapes store the coefficient; QT escapes store the renormalized
    value (dctz-comp-lib.c:484-533, side generalized by sign)."""
    dtype = coeffs.dtype
    if cfg.mode != "qt":
        return coeffs
    w, rmin, rmax = qz._geometry(cfg, np.dtype(dtype.name))
    wd = qz._work_dtype(dtype)
    side = jnp.where(coeffs > 0, rmax, rmin).astype(wd)
    qrow = qtable.astype(wd)[None, :]
    norm = (
        (coeffs.astype(wd) / qrow) * jnp.asarray(float(cfg.error_bound), wd)
    ) * jnp.asarray(cfg.qt_factor, wd) + side
    escape = ac_mask & (ids_i == C.ESCAPE)
    return jnp.where(escape, norm.astype(dtype), coeffs)


def _reconstruct(bin_ids, dc, dense_stored, qtable, n_decode, cfg, dtype, sf):
    """Mirror of the real decode path on in-place stored values."""
    coeffs_hat = qz.decode(
        bin_ids, dc, dense_stored, qtable, n_decode, cfg, dtype, "dense"
    )
    bs = cfg.block_size
    n_full = n_decode // bs
    rem = n_decode % bs
    main_c = coeffs_hat[:n_full]
    tail_c = (
        coeffs_hat[n_full, :rem] if rem else jnp.zeros((0,), coeffs_hat.dtype)
    )
    xhat = transform.inverse(main_c, tail_c)
    return coeffs_hat, (xhat * sf.astype(xhat.dtype))[:n_decode]


def verify_repair(
    x: jax.Array,
    coeffs: jax.Array,
    sf: jax.Array,
    bin_ids: jax.Array,
    dc: jax.Array,
    qtable: jax.Array | None,
    n_decode: int,
    n_valid,
    cfg: CodecConfig,
    tol: jax.Array | None = None,
):
    """Verify the pointwise bound and force-escape offending coefficients.

    x: the input array as the encoder saw it (length n_decode; positions
    >= n_valid are padding — n_valid may be a traced scalar inside
    shard_map). coeffs: the scaled-domain DCT coefficients (nblk, bs).
    tol: pre-slacked absolute tolerance; None computes eb * range(x) * 0.99
    locally (sharded callers pass the globally-reduced one). Returns
    (bin_ids' uint8, dense_stored float32/dtype grid for recompaction,
    ok bool scalar).
    """
    nblk, bs = coeffs.shape
    dtype = coeffs.dtype
    stored_dtype = jnp.float32 if cfg.truncate else dtype
    w, rmin, rmax = qz._geometry(cfg, np.dtype(dtype.name))
    _, ac_mask = qz._masks(nblk, bs, n_decode)
    pos = jax.lax.broadcasted_iota(jnp.int32, (nblk, bs), 0) * bs + (
        jax.lax.broadcasted_iota(jnp.int32, (nblk, bs), 1)
    )
    valid = pos < n_valid

    if tol is None:
        # pointwise tolerance: eb * value range (utils/metrics.evaluate),
        # over the REAL elements only (zero padding must not widen it)
        flat_pos = jnp.arange(x.shape[0])
        xv_max = jnp.max(jnp.where(flat_pos < n_valid, x, -jnp.inf))
        xv_min = jnp.min(jnp.where(flat_pos < n_valid, x, jnp.inf))
        tol = (
            (xv_max - xv_min) * jnp.asarray(cfg.error_bound, x.dtype) * _SLACK
        )

    def block_errors(ids):
        dense = _stored_dense(coeffs, ids.astype(jnp.int32), ac_mask, cfg, qtable)
        dense32 = dense.astype(stored_dtype)
        coeffs_hat, xhat = _reconstruct(
            ids, dc, dense32, qtable, n_decode, cfg, dtype, sf
        )
        err = jnp.abs(xhat - x[:n_decode])
        padded = jnp.zeros((nblk * bs,), err.dtype).at[:n_decode].set(err)
        blk_err = jnp.max(
            jnp.where(valid, padded.reshape(nblk, bs), 0), axis=1
        )
        e_ij = jnp.abs(coeffs - coeffs_hat.astype(dtype))
        return dense32, blk_err, e_ij

    # QT floor: escaping an in-range value itself carries ~1.5e-6*qtable[j]
    # of error (f32 rounding of the renormalized value) — never escape a
    # coefficient whose bin error is already below that.
    if cfg.mode == "qt" and qtable is not None:
        qt_floor = (3e-6 * jnp.abs(qtable).astype(dtype))[None, :]
    else:
        qt_floor = jnp.zeros((1, bs), dtype)

    ids = bin_ids
    for pass_floor in (w / 8, w * 1e-3):
        dense32, blk_err, e_ij = block_errors(ids)
        viol = blk_err > tol
        floor = jnp.maximum(jnp.asarray(pass_floor, dtype), qt_floor)
        force = viol[:, None] & ac_mask & (e_ij > floor)
        ids = jnp.where(force, jnp.asarray(C.ESCAPE, jnp.int32), ids.astype(jnp.int32)).astype(jnp.uint8)

    dense32, blk_err, _ = block_errors(ids)
    ok = ~jnp.any(blk_err > tol)
    return ids, dense32, ok
