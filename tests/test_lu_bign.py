"""HBM-resident big-n LU tier (ops/lu_bign.py — VERDICT r3 next #1).

Reference parity target: cuBLAS getrf/getri at any n
(src/gauss/inverse_gpu.cu:24-50).  CPU backend runs the panel kernel in
interpret mode; shapes are kept small because the per-panel loops
unroll at trace time.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_matrix_inversion_tpu.ops.lu_bign import inverse_lu_big
from cuda_matrix_inversion_tpu.ops import registry


def _resid(a, x):
    n = a.shape[-1]
    return np.abs(np.eye(n) - a.astype(np.float64)
                  @ np.asarray(x, np.float64)).max()


def test_general_batch_gate(rng):
    a = rng.standard_normal((5, 48, 48)).astype(np.float32)
    x = inverse_lu_big(jnp.asarray(a), pw=16, interpret=True)
    assert _resid(a, x) < 1e-4


def test_odd_n_pads_with_identity(rng):
    a = rng.standard_normal((3, 37, 37)).astype(np.float32)
    x = inverse_lu_big(jnp.asarray(a), pw=8, interpret=True)
    assert x.shape == (3, 37, 37)
    assert _resid(a, x) < 1e-4


def test_multi_panel_pivoting_permutation_matrix(rng):
    """A hard-pivoting case: a permutation matrix (every pivot search
    must walk away from the diagonal) plus a tiny perturbation."""
    n = 32
    perm = rng.permutation(n)
    a = np.zeros((2, n, n), np.float32)
    a[:, np.arange(n), perm] = 1.0
    a += 1e-3 * rng.standard_normal((2, n, n)).astype(np.float32)
    x = inverse_lu_big(jnp.asarray(a), pw=8, interpret=True)
    assert _resid(a, x) < 1e-4


def test_ill_conditioned_general(rng):
    """κ ≈ 2e3 nonsymmetric spectrum (the general-square fixture class
    scaled up) stays inside the gate thanks to the Newton polish."""
    n = 32
    u, _ = np.linalg.qr(rng.standard_normal((3, n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((3, n, n)))
    s = np.geomspace(1.0, 1.0 / 2000.0, n)
    a = ((u * s[None, None, :]) @ v).astype(np.float32)
    x = inverse_lu_big(jnp.asarray(a), pw=16, interpret=True)
    assert _resid(a, x) < 1e-4


def test_singular_propagates_nonfinite(rng):
    a = rng.standard_normal((2, 16, 16)).astype(np.float32)
    a[1, :, 3] = 0.0  # exactly zero pivot column → 0/0 in the kernel
    x = np.asarray(inverse_lu_big(jnp.asarray(a), pw=8, interpret=True))
    assert np.isfinite(x[0]).all()
    assert not np.isfinite(x[1]).all()


def test_dispatch_past_vmem_ceiling(monkeypatch, rng):
    """inverse_lu (the lu_pallas entry) routes n > _VMEM_MAX_N through
    the HBM kernel, not the XLA expander (threshold lowered so the test
    stays interpret-fast)."""
    from cuda_matrix_inversion_tpu.ops import pallas_lu

    monkeypatch.setattr(pallas_lu, "_VMEM_MAX_N", 16)
    a = rng.standard_normal((3, 24, 24)).astype(np.float32)
    x = pallas_lu.inverse_lu(jnp.asarray(a), interpret=True)
    assert _resid(a, x) < 1e-4


def test_registered():
    assert "lu_bign_pallas" in registry.list_inverse_algorithms(cpu=False)
    assert registry.is_pallas_algorithm("lu_bign_pallas")


def test_f64_input_roundtrip(rng):
    """f64 callers get the fp32 kernel's accuracy back in their dtype
    (the exact-f64 route lives in pallas_lu.inverse_lu)."""
    a = rng.standard_normal((2, 24, 24))
    x = inverse_lu_big(jnp.asarray(a), pw=8, interpret=True)
    assert x.dtype == jnp.float64 or x.dtype == jnp.float32
    assert _resid(a.astype(np.float32), x) < 1e-4
