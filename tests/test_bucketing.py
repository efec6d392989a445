"""Tests for mixed-dimension size-bucketed dispatch (BASELINE config 4)."""

import numpy as np
import pytest

from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch
from cuda_matrix_inversion_tpu.parallel import bucketing


def test_assign_buckets():
    assert bucketing.assign_buckets([3, 8, 9, 32, 100, 500]) == [8, 8, 32, 32, 128, 512]
    with pytest.raises(ValueError):
        bucketing.assign_buckets([513])


def test_pack_buckets_identity_padding(rng):
    ms = [make_spd_batch(1, n, rng)[0].astype(np.float32) for n in (4, 8, 20)]
    stacks, index = bucketing.pack_buckets(ms)
    assert set(stacks) == {8, 32}
    assert stacks[8].shape == (2, 8, 8)
    # pad region is identity
    np.testing.assert_array_equal(stacks[8][0][4:, 4:], np.eye(4, dtype=np.float32))
    np.testing.assert_array_equal(stacks[8][0][:4, 4:], 0)
    assert index == [(8, 0, 4), (8, 1, 8), (32, 0, 20)]


def test_bucketed_inverse_mixed_sizes(rng):
    sizes = [4, 8, 12, 17, 32, 40, 5]
    ms = [make_spd_batch(1, n, rng)[0].astype(np.float32) for n in sizes]
    invs = bucketing.bucketed_inverse(ms, algorithm="lu")
    for m, inv in zip(ms, invs):
        n = m.shape[0]
        assert inv.shape == (n, n)
        err = np.abs(m.astype(np.float64) @ inv - np.eye(n)).max()
        assert err < 1e-4


def test_bucketed_inverse_single_dispatch_is_jitted(rng):
    # same bucket-shape combination twice → no retrace (cache hit)
    ms = [make_spd_batch(1, n, rng)[0].astype(np.float32) for n in (4, 20)]
    bucketing.bucketed_inverse(ms, algorithm="lu")
    before = bucketing._invert_buckets._cache_size()
    bucketing.bucketed_inverse(ms, algorithm="lu")
    assert bucketing._invert_buckets._cache_size() == before


def test_bucketed_gp(rng):
    problems = []
    expected = []
    for n in (4, 8, 19, 33):
        b = make_spd_batch(1, n, rng)[0].astype(np.float32)
        a = rng.random(n).astype(np.float32)
        c = rng.random(n).astype(np.float32)
        d = rng.random(n).astype(np.float32)
        e = np.float32(rng.random())
        problems.append((a, b, c, d, np.asarray(e)))
        k = b.astype(np.float64) + np.diag(c)
        kinv = np.linalg.inv(k)
        expected.append((a @ (kinv @ d), e - a @ (kinv @ a)))
    results = bucketing.bucketed_gp_mean_variance(problems, method="solve")
    for (m, v), (me, ve) in zip(results, expected):
        assert abs(m - me) < 1e-4
        assert abs(v - ve) < 1e-4


def test_bucketed_inverse_over_mesh(rng):
    import jax

    from cuda_matrix_inversion_tpu.parallel.mesh import batch_mesh

    mesh = batch_mesh(len(jax.devices()))
    sizes = [4, 8, 12, 17, 8, 20, 5, 8]
    ms = [make_spd_batch(1, n, rng)[0].astype(np.float32) for n in sizes]
    invs = bucketing.bucketed_inverse(
        ms, algorithm="newton_schulz_spd_pallas", buckets=(8, 32), mesh=mesh)
    for m, inv in zip(ms, invs):
        n = m.shape[0]
        assert inv.shape == (n, n)
        err = np.abs(m.astype(np.float64) @ inv - np.eye(n)).max()
        assert err < 1e-4
