"""Fused Pallas decode kernel tests (interpret mode on CPU).

The kernel (ops/fused_decode.py) must reconstruct exactly what the XLA
device-decode chain (idpack.unpack_ids -> quantize.decode ->
transform.inverse, the mirror of dctz-decomp-lib.c:389-483) reconstructs,
for every escape regime and in both EC and QT modes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dctz_tpu.config import CodecConfig
from dctz_tpu.core import constants as C, quantize as qz, transform
from dctz_tpu.ops import compaction as cp, idpack
from dctz_tpu.ops.research import fused_decode as fd

BS = 64


def _random_ids(rng, nblk, bs, esc_p=0.01, heavy=False, p=0.4):
    """Bin-id grids shaped like real DCT output (cf. tests/test_idpack.py)."""
    mag = rng.geometric(p=p, size=(nblk, bs)).astype(np.int64) - 1
    decay = np.maximum(1, np.arange(bs) // 4)
    ids = np.minimum(mag * 8 // decay[None, :], 254)
    if heavy:
        ids = np.minimum(ids * 16, 254)
    esc = rng.random((nblk, bs)) < esc_p
    ids = np.where(esc, C.ESCAPE, ids)
    ids[:, 0] = C.ESCAPE
    return ids.astype(np.uint8)


def _build(rng, nblk, b, mode="ec", esc_p=0.01, heavy=False, capc=128, p=0.4):
    """Self-consistent DPK decode inputs: packed ids + dc + chunked AC."""
    n = nblk * BS
    ids = _random_ids(rng, nblk, BS, esc_p, heavy, p)
    cfg = CodecConfig(
        mode=mode, error_bound=1e-3, container="v2", ids_codec="device"
    )
    cw = qz.chunk_width(n, BS)

    # pack at full capacity, then re-pad the tight exception stream to the
    # smallest tier covering the peak — exactly what api._dpk_host_rebuild
    # does on the decode side
    from dctz_tpu.core import entropy

    width, packed, exc_full, exc_counts, ovf = idpack.pack_ids(
        jnp.asarray(ids), n, b, cw
    )
    assert not bool(ovf)
    counts = np.asarray(exc_counts)
    tight = np.concatenate(
        [np.asarray(exc_full)[i, : counts[i]] for i in range(len(counts))]
    )
    peak = int(counts.max()) if counts.size else 0
    cape = next(
        c
        for c in [c for c in (32, 64, 128, 256) if c < cw] + [cw]
        if c >= min(peak, cw)
    )
    assert cape <= 128, "test data must stay fused-eligible"
    exc_rows = entropy.pad_row_prefixes(
        tight.tobytes(), counts, cape, np.uint8
    )

    # escaped-coefficient stream: values outside the bin range at exactly
    # the ESCAPE positions (col >= 1), chunk-compacted like the encoder's
    rmax = (C.NBINS // 2 * 2 + 1) * cfg.error_bound
    dense = (rng.standard_normal((nblk, BS)) * 3 + 4 * rmax).astype(
        np.float32
    )
    esc_mask = (ids == C.ESCAPE) & (np.arange(BS)[None, :] >= 1)
    ac_rows, ac_counts, ac_ovf = cp.compact_chunked(
        jnp.asarray(esc_mask.reshape(-1)),
        jnp.asarray(dense.reshape(-1)),
        cw,
        min(capc, cw),
    )
    assert not bool(ac_ovf)
    dc = (rng.standard_normal(nblk) * 10).astype(np.float32)
    qtable = (
        jnp.asarray(np.abs(rng.standard_normal(BS)).astype(np.float32) + 1.0)
        if mode == "qt"
        else None
    )
    sf = jnp.float32(37.5)
    return (
        cfg,
        n,
        cw,
        width,
        packed,
        exc_rows,
        jnp.asarray(dc),
        ac_rows,
        sf,
        qtable,
    )


def _xla_reference(cfg, n, cw, width, packed, exc_rows, dc, ac_rows, sf, qt):
    nblk = n // BS
    b = packed.shape[1] * 2  # tile width (packed rows hold b//2 bytes)
    bin_ids = idpack.unpack_ids(width, packed, exc_rows, nblk, BS, b, cw)
    coeffs = qz.decode(
        bin_ids, dc, ac_rows, qt, n, cfg, jnp.float32, "chunked"
    )
    x = transform.inverse(coeffs, jnp.zeros((0,), coeffs.dtype))
    return np.asarray((x * sf)[:n])


@pytest.mark.parametrize("mode", ["ec", "qt"])
@pytest.mark.parametrize(
    "b,esc_p,heavy",
    [(64, 0.01, False), (64, 0.05, False), (32, 0.0, False), (256, 0.02, False)],
)
def test_fused_decode_matches_xla_chain(mode, b, esc_p, heavy):
    rng = np.random.default_rng(11)
    nblk = 4 * b  # several grid steps incl. tpt reduction cases
    args = _build(rng, nblk, b, mode, esc_p, heavy)
    cfg, n, cw, width, packed, exc_rows, dc, ac_rows, sf, qt = args

    assert fd.eligible(
        jnp.float32, BS, b, cw, exc_rows.shape[1], ac_rows.shape[1]
    )
    got = np.asarray(
        fd.fused_decode_dpk(
            width, packed, exc_rows, dc, ac_rows, sf, n, b, cw, cfg, qt,
            True,
        )
    )
    want = _xla_reference(cfg, n, cw, width, packed, exc_rows, dc, ac_rows, sf, qt)
    # integer/one-hot stages are exact; the final IDCT matmul may round
    # differently (128-lane block-diagonal vs 64x64 basis) -> ulp tolerance
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6 * abs(want).max())


def test_fused_decode_tail_tile():
    """nblk not a tile multiple: padding blocks must decode to zeros and
    must not desynchronize the chunk-local ranks."""
    rng = np.random.default_rng(5)
    b = 64
    nblk = 3 * b + 24  # partial tail tile; nblk*BS still % cw == 0
    args = _build(rng, nblk, b, "ec", 0.005, p=0.85)  # mild grid: the
    # short tail tile must not push any chunk past the 128-exception tier
    cfg, n, cw, width, packed, exc_rows, dc, ac_rows, sf, qt = args
    got = np.asarray(
        fd.fused_decode_dpk(
            width, packed, exc_rows, dc, ac_rows, sf, n, b, cw, cfg, qt, True
        )
    )
    want = _xla_reference(cfg, n, cw, width, packed, exc_rows, dc, ac_rows, sf, qt)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6 * abs(want).max())


def test_eligibility_gate():
    assert not fd.eligible(jnp.float64, 64, 256, 512, 128, 128)  # dtype
    assert not fd.eligible(jnp.float32, 32, 256, 512, 128, 128)  # block size
    assert not fd.eligible(jnp.float32, 64, 256, 48, 128, 128)  # cw % bs
    assert not fd.eligible(jnp.float32, 64, 256, 512, 256, 128)  # cape
    assert not fd.eligible(jnp.float32, 64, 256, 512, 128, 512)  # capc
    assert fd.eligible(jnp.float32, 64, 256, 512, 128, 128)

