"""Tests for the stdin demos and the singularity check."""

import io

import numpy as np
import pytest

from cuda_matrix_inversion_tpu import demos
from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch
from cuda_matrix_inversion_tpu.ops.host_api import SingularBatchError, inverse_batched


def test_read_stdin_single_matrix_format():
    # the reference prototype format: first line n, then n^2 values
    # (src/gauss/31.txt)
    text = "3\n2\n0\n0\n0\n1\n2\n-2\n1\n1\n"
    mats = demos.read_stdin_matrices(io.StringIO(text))
    assert mats.shape == (1, 3, 3)
    assert mats[0, 0, 0] == 2


def test_read_stdin_batch_format():
    # batch_3.txt-style: "num m n" header
    text = "2\t2\t2\n1\t0\n0\t1\n2\t0\n0\t2\n"
    mats = demos.read_stdin_matrices(io.StringIO(text))
    assert mats.shape == (2, 2, 2)
    assert mats[1, 0, 0] == 2


def test_demo_cholesky_output(rng):
    a = make_spd_batch(1, 4, rng)
    buf = io.StringIO()
    demos.demo_cholesky(a, file=buf)
    out = buf.getvalue()
    assert "cholesky factor L" in out and "A^-1" in out


def test_demo_gauss_output(rng):
    a = make_spd_batch(1, 4, rng)
    buf = io.StringIO()
    demos.demo_gauss(a, file=buf)
    assert "Gauss-Jordan" in buf.getvalue()


def test_singularity_check_raises(rng):
    a = make_spd_batch(3, 8, rng).astype(np.float32)
    a[1] = 0.0  # singular member
    with pytest.raises(SingularBatchError) as ei:
        inverse_batched(a, algorithm="lu", check=True)
    assert ei.value.indices == [1]


def test_singularity_check_passes_clean_batch(rng):
    a = make_spd_batch(3, 8, rng).astype(np.float32)
    out = inverse_batched(a, algorithm="lu", check=True)
    assert np.isfinite(out).all()
