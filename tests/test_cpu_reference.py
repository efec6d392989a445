"""Tests for the CPU LAPACK oracle (ops/cpu_reference.py).

The oracle itself is gated against float64 NumPy linalg — the same role
the MATLAB ground truth plays for the reference (SURVEY §4.1).
"""

import numpy as np
import pytest

from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch
from cuda_matrix_inversion_tpu.ops import cpu_reference as ref


def _identity_err(a, a_inv):
    prod = a.astype(np.float64) @ a_inv.astype(np.float64)
    return np.abs(prod - np.eye(a.shape[-1])).max()


@pytest.mark.parametrize("n", [4, 8, 16, 33])
def test_inverse_lu(n, rng):
    a = make_spd_batch(6, n, rng).astype(np.float32)
    inv = ref.inverse_lu(a)
    assert _identity_err(a, inv) < 1e-4


@pytest.mark.parametrize("n", [4, 16])
def test_inverse_lu_fp64(n, rng):
    a = make_spd_batch(6, n, rng)
    inv = ref.inverse_lu(a)
    assert _identity_err(a, inv) < 1e-10


@pytest.mark.parametrize("n", [4, 8, 16, 33])
def test_inverse_cholesky(n, rng):
    a = make_spd_batch(6, n, rng).astype(np.float32)
    inv = ref.inverse_cholesky(a)
    assert _identity_err(a, inv) < 1e-4
    # result is symmetric (the reference leaves the other triangle stale)
    np.testing.assert_allclose(inv, np.transpose(inv, (0, 2, 1)), rtol=0, atol=0)


@pytest.mark.parametrize("n", [3, 8, 16])
def test_inverse_gauss_jordan(n, rng):
    a = make_spd_batch(5, n, rng).astype(np.float32)
    inv = ref.inverse_gauss_jordan(a)
    assert _identity_err(a, inv) < 1e-4


def test_gauss_jordan_pivots_zero_diagonal():
    # The reference's GJ only swaps when the diagonal is exactly 0 and is
    # unsafe otherwise (batched_invert.cu:19-35, SURVEY §2.4.3). Ours must
    # handle a matrix that *requires* pivoting.
    a = np.array([[[0.0, 1.0], [1.0, 0.0]]], dtype=np.float32)
    inv = ref.inverse_gauss_jordan(a)
    np.testing.assert_allclose(inv[0], [[0, 1], [1, 0]], atol=1e-6)

    # and one needing magnitude pivoting for stability
    a2 = np.array([[[1e-8, 1.0], [1.0, 1.0]]], dtype=np.float64)
    inv2 = ref.inverse_gauss_jordan(a2)
    assert _identity_err(a2, inv2) < 1e-8


def test_gp_mean_matches_fixture_ground_truth(fixture_root):
    import os

    from cuda_matrix_inversion_tpu.io.mats import read_test_folder

    data = read_test_folder(os.path.join(fixture_root, "gaussian_20_16x16"), dtype=np.float64)
    mean = ref.calculate_mean_cpu(data["a"], data["b"], data["c"], data["d"])
    np.testing.assert_allclose(mean, data["means"], atol=1e-9)
    mean_s = ref.calculate_mean_solve_cpu(data["a"], data["b"], data["c"], data["d"])
    np.testing.assert_allclose(mean_s, data["means"], atol=1e-9)


def test_gp_variance_documented_sign(fixture_root):
    # Guards against reintroducing the reference CPU sign bug
    # (gauss_cpu.c:198,266 adds the quadratic term; docs say subtract).
    import os

    from cuda_matrix_inversion_tpu.io.mats import read_test_folder

    data = read_test_folder(os.path.join(fixture_root, "gaussian_20_16x16"), dtype=np.float64)
    var = ref.calculate_variance_cpu(data["a"], data["b"], data["c"], data["e"])
    np.testing.assert_allclose(var, data["variances"], atol=1e-9)
    var_s = ref.calculate_variance_solve_cpu(data["a"], data["b"], data["c"], data["e"])
    np.testing.assert_allclose(var_s, data["variances"], atol=1e-9)


def test_fp32_gp_within_bench_tolerance(fixture_root):
    import os

    from cuda_matrix_inversion_tpu.io.mats import read_test_folder

    data = read_test_folder(os.path.join(fixture_root, "gaussian_20_16x16"), dtype=np.float32)
    mean = ref.calculate_mean_cpu(data["a"], data["b"], data["c"], data["d"])
    assert np.abs(mean - data["means"]).max() < 1e-4
