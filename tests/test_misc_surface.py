"""Coverage for remaining surface: dtypes, MatrixBatch, profiler trace,
bf16 path, timed context manager."""

import os

import numpy as np
import pytest

from cuda_matrix_inversion_tpu import MatrixBatch, default_dtype, set_default_dtype
from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch


def test_default_dtype_switch():
    assert default_dtype() == np.float32
    set_default_dtype("float64")
    try:
        assert default_dtype() == np.float64
    finally:
        set_default_dtype("float32")
    with pytest.raises(ValueError):
        set_default_dtype("int8")


def test_matrix_batch_container(rng):
    mb = MatrixBatch(rng.standard_normal((3, 4, 5)))
    assert (mb.batch_size, mb.m, mb.n) == (3, 4, 5)
    assert len(mb) == 3
    rep = mb.replicate(2)
    assert rep.batch_size == 6
    single = MatrixBatch(np.eye(3))
    assert single.shape == (1, 3, 3)
    with pytest.raises(ValueError):
        MatrixBatch(np.zeros(4))


def test_bf16_inputs_pass_through_kernels(rng):
    import jax.numpy as jnp

    from cuda_matrix_inversion_tpu.ops import pallas_cholesky as pc

    a = make_spd_batch(4, 16, rng)
    a16 = jnp.asarray(a, dtype=jnp.bfloat16)
    inv = np.asarray(pc.inverse_cholesky(a16), dtype=np.float64)
    # compute happens in fp32; output cast back to bf16 → coarse tolerance
    err = np.abs(a @ inv - np.eye(16)).max()
    assert err < 0.2


def test_timed_context_manager():
    from cuda_matrix_inversion_tpu.utils.timer import Timer, timed

    t = Timer("x")
    with timed(t):
        pass
    assert t.stats.count == 1 and t.last_seconds >= 0


def test_profiler_trace_writes_artifacts(tmp_path):
    import jax.numpy as jnp

    from cuda_matrix_inversion_tpu.utils.profiling import trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler trace produced no files"


def test_enqueue_slope_timer_smoke():
    import jax.numpy as jnp

    from cuda_matrix_inversion_tpu.bench.timing import enqueue_slope_seconds

    x = np.ones((64, 64), dtype=np.float32)
    s = enqueue_slope_seconds(lambda v: v @ v, [x], n1=2, n2=6, trials=2)
    assert np.isfinite(s)


def test_empty_batch_all_pallas_paths(rng):
    # a 0-matrix batch must round-trip every device path (grid of 0 cells
    # is invalid in Mosaic — pad_batch pads empties to one identity block)
    import numpy as np

    from cuda_matrix_inversion_tpu.ops.host_api import inverse_batched
    from cuda_matrix_inversion_tpu.ops.pallas_gp import (
        gp_mean_variance_fused,
        gp_mean_variance_fused_ns,
    )

    a0 = np.zeros((0, 8, 8), np.float32)
    for alg in ("lu", "cholesky_pallas", "newton_schulz_spd_pallas",
                "gauss_pallas", "lu_pallas"):
        assert inverse_batched(a0, algorithm=alg).shape == a0.shape
    z = np.zeros((0, 8, 1), np.float32)
    for fn in (gp_mean_variance_fused, gp_mean_variance_fused_ns):
        m, v = fn(z, np.zeros((0, 8, 8), np.float32), z, z,
                  np.zeros((0, 1, 1), np.float32))
        assert m.shape == (0, 1, 1) and v.shape == (0, 1, 1)
