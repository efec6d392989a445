"""Tests for the Strassen multiply (reference Multiplication/multi.cu)."""

import numpy as np
import pytest

from cuda_matrix_inversion_tpu.ops.strassen import strassen_matmul


def test_matches_reference_prototype_shapes(rng):
    # the reference's hardcoded test multiplies 19x16 @ 16x17 (multi.cu test())
    a = rng.standard_normal((19, 16)).astype(np.float32)
    b = rng.standard_normal((16, 17)).astype(np.float32)
    out = np.asarray(strassen_matmul(a, b, cutoff=8))
    np.testing.assert_allclose(out, a @ b, atol=1e-3)


@pytest.mark.parametrize("shape", [(64, 64, 64), (100, 96, 80), (33, 45, 27)])
def test_random_shapes(shape, rng):
    m, k, n = shape
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    out = np.asarray(strassen_matmul(a, b, cutoff=16))
    np.testing.assert_allclose(out, a @ b, atol=1e-2)


def test_batched(rng):
    a = rng.standard_normal((4, 32, 32)).astype(np.float32)
    b = rng.standard_normal((4, 32, 32)).astype(np.float32)
    out = np.asarray(strassen_matmul(a, b, cutoff=8))
    np.testing.assert_allclose(out, a @ b, atol=1e-3)


def test_cutoff_path_is_plain_matmul(rng):
    a = rng.standard_normal((8, 8)).astype(np.float32)
    b = rng.standard_normal((8, 8)).astype(np.float32)
    out = np.asarray(strassen_matmul(a, b))  # default cutoff ≫ 8
    np.testing.assert_allclose(out, a @ b, atol=1e-4)


def test_inner_dim_mismatch():
    import jax.numpy as jnp

    with pytest.raises(ValueError):
        strassen_matmul(jnp.zeros((4, 5)), jnp.zeros((4, 5)))
