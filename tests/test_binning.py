"""Bin-geometry tests: the closed-form zigzag mapping must reproduce the
reference's conv_tbl (dctz-comp-lib.c:27-43) and gen_bins (binning.c:12-30)
exactly."""

import jax.numpy as jnp
import numpy as np

from dctz_tpu.core import binning
from dctz_tpu.core.constants import NBINS


def test_conv_tbl_spot_values():
    """Pin the mapping with values read off the reference table."""
    tbl = binning.conv_table_np(NBINS)
    assert tbl[0] == 254  # dctz-comp-lib.c:28 first entry
    assert tbl[127] == 0  # center bin -> id 0 (line 35 last entry)
    assert tbl[128] == 1  # first bin right of center (line 36 first entry)
    assert tbl[126] == 2
    assert tbl[254] == 253  # dctz-comp-lib.c:43 last entry
    assert tbl[1] == 252


def test_conv_tbl_is_bijection():
    tbl = binning.conv_table_np(NBINS)
    assert sorted(tbl.tolist()) == list(range(NBINS))


def test_conv_tbl_orders_by_magnitude():
    """Smaller |bin center| must get a smaller id (the zlib-friendliness
    property the remap exists for)."""
    tbl = binning.conv_table_np(NBINS)
    lin = np.arange(NBINS)
    dist_from_center = np.abs(lin - NBINS // 2)
    ids = tbl[np.argsort(dist_from_center, kind="stable")]
    assert (np.diff(dist_from_center[np.argsort(tbl)]) >= 0).all()
    del ids


def test_closed_form_matches_table():
    lin = jnp.arange(NBINS, dtype=jnp.int32)
    got = np.asarray(binning.linear_to_zigzag(lin, NBINS))
    np.testing.assert_array_equal(got, binning.conv_table_np(NBINS))


def test_bin_centers_match_gen_bins():
    """gen_bins: center[0]=0, odd i -> +((i//2)+1)*w, even -> -(i//2)*w."""
    eb = 1e-3
    w = eb * 2.0
    table = binning.bin_centers_np(NBINS, eb)
    assert table[0] == 0.0
    assert table[1] == w
    assert table[2] == -w
    assert table[253] == 127 * w
    assert table[254] == -127 * w
    ids = jnp.arange(NBINS, dtype=jnp.int32)
    got = np.asarray(binning.zigzag_to_center(ids, jnp.float64(w)))
    np.testing.assert_allclose(got, table, rtol=0, atol=0)


def test_encode_decode_consistency():
    """quantize(x) -> id -> center must land within half a bin width."""
    eb = 1e-3
    w = eb * 2.0
    nbins = NBINS
    rmin = -nbins * eb
    rng = np.random.default_rng(0)
    x = rng.uniform(rmin, -rmin, size=10000)
    lin = np.clip(((x - rmin) / w).astype(np.int32), 0, nbins - 1)
    ids = np.asarray(binning.linear_to_zigzag(jnp.asarray(lin), nbins))
    centers = np.asarray(
        binning.zigzag_to_center(jnp.asarray(ids), jnp.float64(w))
    )
    assert np.abs(centers - x).max() <= eb * (1 + 1e-12)
