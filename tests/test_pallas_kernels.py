"""Tests for the Pallas Cholesky kernels (interpret mode on CPU) and the
Newton-Schulz inversion."""

import numpy as np
import pytest

from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch
from cuda_matrix_inversion_tpu.ops import pallas_cholesky as pc
from cuda_matrix_inversion_tpu.ops.newton_schulz import inverse_newton_schulz


def _identity_err_inf(a, a_inv):
    prod = np.asarray(a, dtype=np.float64) @ np.asarray(a_inv, dtype=np.float64)
    return np.abs(prod - np.eye(a.shape[-1])).sum(-1).max()


@pytest.mark.parametrize("n", [8, 16, 32])
def test_pallas_cholesky_factor(n, rng):
    a = make_spd_batch(6, n, rng).astype(np.float32)
    l = np.asarray(pc.cholesky(a))
    l_ref = np.linalg.cholesky(a.astype(np.float64))
    np.testing.assert_allclose(l, l_ref, atol=2e-5)
    # strictly lower-triangular output (upper exactly zero)
    assert np.all(np.triu(l, 1) == 0)


@pytest.mark.parametrize("n", [8, 16, 32])
def test_pallas_inverse_naive_path(n, rng):
    a = make_spd_batch(7, n, rng).astype(np.float32)
    inv = np.asarray(pc.inverse_cholesky(a))
    assert _identity_err_inf(a, inv) < 1e-4


@pytest.mark.parametrize("n", [64, 96, 128])
def test_pallas_inverse_blocked_path(n, rng):
    a = make_spd_batch(5, n, rng).astype(np.float32)
    assert pc._panel_width(n) is not None  # really exercises the blocked kernel
    inv = np.asarray(pc.inverse_cholesky(a))
    assert _identity_err_inf(a, inv) < 1e-4


def test_pallas_batch_padding(rng):
    # batch not a multiple of the block size
    a = make_spd_batch(11, 16, rng).astype(np.float32)
    inv = np.asarray(pc.inverse_cholesky(a))
    assert inv.shape == a.shape
    assert _identity_err_inf(a, inv) < 1e-4


def test_pallas_matches_xla(rng):
    import jax.numpy as jnp

    from cuda_matrix_inversion_tpu.ops import xla as xops

    a = make_spd_batch(4, 64, rng).astype(np.float32)
    i1 = np.asarray(pc.inverse_cholesky(a))
    i2 = np.asarray(xops.inverse_cholesky(jnp.asarray(a)))
    np.testing.assert_allclose(i1, i2, atol=5e-5)


# ---------------- Newton-Schulz ----------------

def _make_cond(batch, n, kappa, rng):
    q, _ = np.linalg.qr(rng.standard_normal((batch, n, n)))
    lam = np.logspace(0, -np.log10(kappa), n)
    return (q * lam[None, None, :]) @ np.transpose(q, (0, 2, 1))


@pytest.mark.parametrize("n", [8, 32, 128])
def test_newton_schulz_fixture_like(n, rng):
    a = make_spd_batch(10, n, rng).astype(np.float32)
    inv = np.asarray(inverse_newton_schulz(a))
    assert _identity_err_inf(a, inv) < 1e-4


def test_newton_schulz_nonsymmetric(rng):
    a = (rng.standard_normal((6, 32, 32)) + 32 * np.eye(32)).astype(np.float32)
    inv = np.asarray(inverse_newton_schulz(a))
    assert _identity_err_inf(a, inv) < 1e-4


def test_newton_schulz_ill_conditioned_no_nan(rng):
    # bf16 phase diverges for kappa >= 1e4; the fp32 restart must rescue it
    a = _make_cond(6, 64, 1e4, rng).astype(np.float32)
    inv = np.asarray(inverse_newton_schulz(a))
    assert np.all(np.isfinite(inv))
    assert _identity_err_inf(a, inv) < 5e-3  # comparable to the LU path at this kappa


def test_newton_schulz_moderate_conditioning(rng):
    a = _make_cond(6, 64, 1e2, rng).astype(np.float32)
    inv = np.asarray(inverse_newton_schulz(a))
    assert _identity_err_inf(a, inv) < 1e-4


def test_large_n_routes_to_xla(rng):
    # n > VMEM limit must transparently use the XLA factorization
    a = make_spd_batch(2, 300, rng).astype(np.float32)
    inv = np.asarray(pc.inverse_cholesky(a))
    assert _identity_err_inf(a, inv) < 1e-3  # larger n, fp32


def test_blocked_gauss_jordan_variant(rng):
    from cuda_matrix_inversion_tpu.ops.pallas_gauss_jordan import (
        inverse_gauss_jordan_blocked,
    )

    a = make_spd_batch(4, 64, rng).astype(np.float32)
    inv = np.asarray(inverse_gauss_jordan_blocked(a))
    assert _identity_err_inf(a, inv) < 1e-3  # gate-marginal by design


def test_newton_schulz_pallas_variant(rng):
    from cuda_matrix_inversion_tpu.ops.newton_schulz import (
        inverse_newton_schulz_pallas,
    )

    a = make_spd_batch(10, 32, rng).astype(np.float32)
    inv = np.asarray(inverse_newton_schulz_pallas(a))
    assert _identity_err_inf(a, inv) < 1e-4
    # f64 routes to the adaptive/XLA path and stays exact
    a64 = make_spd_batch(3, 16, rng)
    inv64 = np.asarray(inverse_newton_schulz_pallas(a64))
    assert inv64.dtype == np.float64
    assert _identity_err_inf(a64, inv64) < 1e-12
