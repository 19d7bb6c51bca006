"""Transform-layer tests.

Plays the role of the reference's dct-test.c (blocked round trip,
dct-test.c:189-220) and dct-fftw-test.c (independent-oracle agreement,
dct-fftw-test.c:106-122), with scipy as the oracle instead of FFTW.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.fft import dct as scipy_dct, idct as scipy_idct

from dctz_tpu.core import transform


@pytest.mark.parametrize("n", [64, 33, 17, 7, 2, 128])
def test_basis_orthonormal(n):
    b = np.asarray(transform.dct2_basis(n, jnp.float64))
    np.testing.assert_allclose(b @ b.T, np.eye(n), atol=1e-13)


@pytest.mark.parametrize("n", [64, 33, 7])
def test_forward_matches_scipy_ortho(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, n))
    got = np.asarray(transform.block_dct(jnp.asarray(x)))
    want = scipy_dct(x, type=2, norm="ortho", axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("n", [64, 33, 7])
def test_inverse_matches_scipy_ortho(n):
    rng = np.random.default_rng(1)
    c = rng.standard_normal((5, n))
    got = np.asarray(transform.block_idct(jnp.asarray(c)))
    want = scipy_idct(c, type=2, norm="ortho", axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("n_total", [64 * 10, 64 * 10 + 13, 64, 7, 65])
def test_blocked_roundtrip(n_total):
    """dct-test.c equivalent: forward+inverse over a blocked array."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n_total)
    main_c, tail_c = transform.forward(jnp.asarray(x), 64)
    rec = np.asarray(transform.inverse(main_c, tail_c))
    np.testing.assert_allclose(rec, x, atol=1e-12)
    # The remainder block is a rem-point transform, not a padded 64-point one
    # (reference re-plans FFTW for the tail, dctz-comp-lib.c:326-336).
    rem = n_total % 64
    assert tail_c.shape[0] == rem
    if rem:
        np.testing.assert_allclose(
            np.asarray(tail_c),
            scipy_dct(x[-rem:], type=2, norm="ortho"),
            atol=1e-12,
        )


def test_float32_roundtrip_error_small():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(64 * 100).astype(np.float32)
    main_c, tail_c = transform.forward(jnp.asarray(x), 64)
    rec = np.asarray(transform.inverse(main_c, tail_c))
    assert np.abs(rec - x).max() < 1e-5
