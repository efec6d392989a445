"""Tests for the native C++ components (matsio + LAPACK oracle).

Skipped gracefully when the shared library isn't built; CI/bench builds
it via ``python -m cuda_matrix_inversion_tpu.native.build``.
"""

import numpy as np
import pytest

from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch
from cuda_matrix_inversion_tpu.native.build import ensure_built


@pytest.fixture(scope="module", autouse=True)
def built():
    if ensure_built() is None:
        pytest.skip("native lib not buildable in this environment")


def test_matsio_roundtrip(tmp_path, rng):
    from cuda_matrix_inversion_tpu.native import matsio

    assert matsio.available()
    arr = rng.standard_normal((7, 5, 3))
    path = str(tmp_path / "x.mats")
    matsio.write_mats(path, arr)
    back = matsio.read_mats(path)
    np.testing.assert_allclose(back, arr, rtol=1e-15)


def test_matsio_matches_python_parser(tmp_path, rng):
    from cuda_matrix_inversion_tpu.io.mats import read_mats, write_mats
    from cuda_matrix_inversion_tpu.native import matsio

    arr = rng.standard_normal((3, 4, 4))
    path = str(tmp_path / "y.mats")
    write_mats(path, arr)
    native = matsio.read_mats(path)
    # force the pure-Python path for comparison
    with open(path, "rb") as f:
        text = f.read()
    header_end = text.index(b"\n")
    body = np.array(text[header_end + 1:].split(), dtype=np.float64).reshape(3, 4, 4)
    np.testing.assert_array_equal(native, body)


def test_matsio_replicate(rng):
    from cuda_matrix_inversion_tpu.native import matsio

    arr = rng.standard_normal((2, 3, 3))
    out = matsio.replicate(arr, 4)
    assert out.shape == (8, 3, 3)
    np.testing.assert_array_equal(out[6], arr[0])


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_native_oracle_lu(dtype, rng):
    from cuda_matrix_inversion_tpu.native import oracle

    a = make_spd_batch(10, 24, rng).astype(dtype)
    inv = oracle.inverse_lu(a)
    err = np.abs(a.astype(np.float64) @ inv.astype(np.float64) - np.eye(24)).max()
    assert err < (1e-5 if dtype == np.float32 else 1e-12)


def test_native_oracle_cholesky_matches_scipy(rng):
    from cuda_matrix_inversion_tpu.native import oracle
    from cuda_matrix_inversion_tpu.ops import cpu_reference

    a = make_spd_batch(6, 16, rng).astype(np.float32)
    native = oracle.inverse_cholesky(a)
    scipy_ref = cpu_reference.inverse_cholesky(a)
    np.testing.assert_allclose(native, scipy_ref, atol=1e-5)
    np.testing.assert_allclose(native, np.transpose(native, (0, 2, 1)))


def test_native_oracle_singular_raises(rng):
    from cuda_matrix_inversion_tpu.native import oracle

    a = make_spd_batch(3, 8, rng).astype(np.float32)
    a[1] = 0.0
    with pytest.raises(np.linalg.LinAlgError, match="index 1"):
        oracle.inverse_lu(a)


def test_native_oracle_registered():
    from cuda_matrix_inversion_tpu.ops.registry import list_inverse_algorithms

    algs = list_inverse_algorithms(cpu=True)
    assert "lu_native_cpu" in algs and "cholesky_native_cpu" in algs


def test_native_registration_retries_after_late_build(monkeypatch):
    """The registry must pick up the native oracle even when the .so was
    stale at the FIRST _populate() and only built later in the process
    (the full-suite ordering: a fresh checkout stamps sources newer than
    the gitignored .so, earlier tests populate the registry without the
    native rows, then this module's fixture rebuilds the lib)."""
    from cuda_matrix_inversion_tpu.native import oracle
    from cuda_matrix_inversion_tpu.ops import registry

    saved_cpu = dict(registry._CPU_ALGORITHMS)
    try:
        # simulate "stale at first populate": drop the rows and make the
        # oracle unavailable, then re-populate
        registry._CPU_ALGORITHMS.pop("lu_native_cpu", None)
        registry._CPU_ALGORITHMS.pop("cholesky_native_cpu", None)
        monkeypatch.setattr(oracle, "available", lambda: False)
        assert "lu_native_cpu" not in registry.list_inverse_algorithms(cpu=True)
        # the lib "gets built": the next registry query must register it
        monkeypatch.setattr(oracle, "available", lambda: True)
        assert "lu_native_cpu" in registry.list_inverse_algorithms(cpu=True)
        assert "cholesky_native_cpu" in registry.list_inverse_algorithms(cpu=True)
    finally:
        registry._CPU_ALGORITHMS.clear()
        registry._CPU_ALGORITHMS.update(saved_cpu)


def test_native_oracle_does_not_mutate_input(rng):
    from cuda_matrix_inversion_tpu.native import oracle

    a = make_spd_batch(2, 8, rng).astype(np.float32)
    a_copy = a.copy()
    oracle.inverse_lu(a)
    np.testing.assert_array_equal(a, a_copy)  # no reference-style clobbering


@pytest.mark.parametrize("solve", [True, False])
def test_native_gp_pipeline(solve, rng):
    from cuda_matrix_inversion_tpu.native import oracle
    from cuda_matrix_inversion_tpu.ops import cpu_reference as cpu

    batch, n = 10, 16
    b = make_spd_batch(batch, n, rng).astype(np.float32)
    a = rng.random((batch, n, 1)).astype(np.float32)
    c = rng.random((batch, n, 1)).astype(np.float32)
    d = rng.random((batch, n, 1)).astype(np.float32)
    e = rng.random((batch, 1, 1)).astype(np.float32)
    m, v = oracle.gp_mean_variance(a, b, c, d, e, solve=solve)
    m_ref = cpu.calculate_mean_solve_cpu(a, b, c, d).reshape(-1)
    v_ref = cpu.calculate_variance_solve_cpu(a, b, c, e).reshape(-1)
    np.testing.assert_allclose(m, m_ref, atol=1e-5)
    np.testing.assert_allclose(v, v_ref, atol=1e-5)


def test_native_gp_singular_raises(rng):
    from cuda_matrix_inversion_tpu.native import oracle

    b = make_spd_batch(3, 8, rng).astype(np.float32)
    b[2] = 0.0
    z = np.zeros((3, 8, 1), np.float32)
    with pytest.raises(np.linalg.LinAlgError, match="index 2"):
        oracle.gp_mean_variance(z, b, z, z, np.zeros((3, 1, 1), np.float32))


def test_gauss_bench_native_cpu_rows(fixture_root, rng):
    import io
    import os

    from cuda_matrix_inversion_tpu.bench.gauss_bench import run_bench

    out = io.StringIO()
    run_bench(os.path.join(fixture_root, "gaussian_20_8x8"), 1, 1, csv=True,
              cpu_oracle="native", skip_cpu=False, stream=out)
    lines = out.getvalue().strip().splitlines()
    # CPU rows present and their error column is fixture-tight
    cpu_rows = [l for l in lines if "_cpu" in l]
    assert len(cpu_rows) == 2
    for row in cpu_rows:
        assert float(row.split()[-1]) < 1e-4


@pytest.mark.parametrize("want", ["mean", "variance"])
def test_native_gp_single_output_modes(want, rng):
    from cuda_matrix_inversion_tpu.native import oracle

    batch, n = 6, 16
    b = make_spd_batch(batch, n, rng).astype(np.float32)
    a = rng.random((batch, n, 1)).astype(np.float32)
    c = rng.random((batch, n, 1)).astype(np.float32)
    d = rng.random((batch, n, 1)).astype(np.float32)
    e = rng.random((batch, 1, 1)).astype(np.float32)
    m_both, v_both = oracle.gp_mean_variance(a, b, c, d, e)
    rhs = d if want == "mean" else a
    m, v = oracle.gp_mean_variance(a, b, c, rhs, e, want=want)
    if want == "mean":
        np.testing.assert_allclose(m, m_both, atol=1e-6)
    else:
        np.testing.assert_allclose(v, v_both, atol=1e-6)
    with pytest.raises(KeyError, match="want"):
        oracle.gp_mean_variance(a, b, c, d, e, want="nope")
