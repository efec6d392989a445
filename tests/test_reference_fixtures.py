"""Parity checks against the UPSTREAM reference fixtures (MATLAB ground
truth), when the reference checkout is present.  These are the same files
the reference's own benches consume (``tests/inverse_100_*/a.mats`` etc.,
written by ``tests/generate_inverse_matrices.m``); CI environments without
the checkout skip cleanly."""

import os

import numpy as np
import pytest

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="upstream reference checkout not present")


def test_upstream_inverse_fixtures_parse_and_invert():
    from cuda_matrix_inversion_tpu.io.mats import read_test_folder
    from cuda_matrix_inversion_tpu.ops.host_api import inverse_batched

    d = read_test_folder(os.path.join(REF, "inverse_100_32x32"))
    assert d["a"].shape == (100, 32, 32)
    # MATLAB's inv(A) ground truth agrees with ours
    inv = inverse_batched(d["a"].astype(np.float32), algorithm="lu")
    assert np.abs(inv - d["aInv"]).max() < 1e-3  # fp32 vs MATLAB double
    err = np.abs(d["a"] @ inv.astype(np.float64) - np.eye(32)).sum(-1).max()
    assert err < 1e-4


def test_upstream_gaussian_fixtures_pipeline():
    from cuda_matrix_inversion_tpu.io.mats import read_test_folder
    from cuda_matrix_inversion_tpu.models.gp import gp_mean_variance_host

    g = read_test_folder(os.path.join(REF, "gaussian_100_16x16"))
    mean, var = gp_mean_variance_host(g["a"], g["b"], g["c"], g["d"], g["e"])
    # upstream files store 4 significant digits, so the GROUND TRUTH itself
    # is quantized to ~1e-4 relative — the bound reflects file precision,
    # not pipeline accuracy (own full-precision fixtures gate at 1e-4)
    assert np.abs(mean - g["means"]).max() < 2e-4
    assert np.abs(var - g["variances"]).max() < 2e-4


def test_upstream_native_parser_matches_python():
    from cuda_matrix_inversion_tpu.io import mats
    from cuda_matrix_inversion_tpu.native import matsio
    from cuda_matrix_inversion_tpu.native.build import ensure_built

    if ensure_built() is None or not matsio.available():
        pytest.skip("native parser not built")
    path = os.path.join(REF, "inverse_100_8x8", "a.mats")
    # native parser returns float64; the python reader applies the library
    # default dtype (fp32) — compare at the native width
    np.testing.assert_array_equal(
        matsio.read_mats(path), mats.read_mats(path, dtype=np.float64))


def test_upstream_native_gp_oracle_matches_matlab():
    from cuda_matrix_inversion_tpu.io.mats import read_test_folder
    from cuda_matrix_inversion_tpu.native import oracle
    from cuda_matrix_inversion_tpu.native.build import ensure_built

    if ensure_built() is None or not oracle.available():
        pytest.skip("native oracle not built")
    g = read_test_folder(os.path.join(REF, "gaussian_100_16x16"))
    m, v = oracle.gp_mean_variance(g["a"], g["b"], g["c"], g["d"], g["e"])
    # 2e-4: the upstream files' 4-digit quantization (see above)
    assert np.abs(m - np.asarray(g["means"]).reshape(-1)).max() < 2e-4
    assert np.abs(v - np.asarray(g["variances"]).reshape(-1)).max() < 2e-4
