"""Tests for the serving engine (pre-compiled shape-bucketed dispatch)."""

import numpy as np
import pytest

from cuda_matrix_inversion_tpu.engine import GPEngine, InversionEngine, _round_up
from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch


def test_round_up():
    assert _round_up(5, (8, 32)) == 8
    assert _round_up(8, (8, 32)) == 8
    assert _round_up(9, (8, 32)) == 32
    with pytest.raises(ValueError):
        _round_up(33, (8, 32))


def test_engine_serves_arbitrary_shapes(rng):
    eng = InversionEngine(algorithm="lu")
    for batch, n in ((3, 5), (10, 16), (8, 8)):
        a = make_spd_batch(batch, n, rng).astype(np.float32)
        out = eng.inverse(a)
        assert out.shape == a.shape
        err = np.abs(a.astype(np.float64) @ out - np.eye(n)).max()
        assert err < 1e-4
    # two of those shapes share a bucket → only 2 compiled executables
    assert len(eng.compiled_shapes) == 2


def test_engine_warmup_precompiles(rng):
    eng = InversionEngine(algorithm="lu")
    eng.warmup([(3, 5), (100, 16)])
    assert eng.compiled_shapes == [(8, 8), (128, 16)]
    a = make_spd_batch(2, 4, rng).astype(np.float32)
    eng.inverse(a)  # hits the (8, 8) bucket, no new compile
    assert len(eng.compiled_shapes) == 2


def test_engine_no_retrace_at_serve_time(rng):
    eng = InversionEngine(algorithm="lu")
    a = make_spd_batch(4, 8, rng).astype(np.float32)
    eng.inverse(a)
    before = dict(eng._compiled)
    eng.inverse(make_spd_batch(6, 7, rng).astype(np.float32))  # same buckets
    assert dict(eng._compiled) == before


def test_engine_single_matrix_and_empty(rng):
    eng = InversionEngine(algorithm="lu")
    single = make_spd_batch(1, 4, rng)[0].astype(np.float32)
    out = eng.inverse(single)
    assert out.shape == (1, 4, 4)
    empty = np.zeros((0, 4, 4), np.float32)
    assert eng.inverse(empty).shape == (0, 4, 4)


def test_engine_check_raises_on_singular(rng):
    from cuda_matrix_inversion_tpu.ops.host_api import SingularBatchError

    eng = InversionEngine(algorithm="lu")
    a = make_spd_batch(3, 8, rng).astype(np.float32)
    a[2] = 0.0
    with pytest.raises(SingularBatchError):
        eng.inverse(a, check=True)


def test_gp_engine(rng):
    eng = GPEngine(method="solve")
    batch, n = 7, 12
    b = make_spd_batch(batch, n, rng).astype(np.float32)
    a = rng.random((batch, n, 1), dtype=np.float32)
    c = rng.random((batch, n, 1), dtype=np.float32)
    d = rng.random((batch, n, 1), dtype=np.float32)
    e = rng.random((batch, 1, 1), dtype=np.float32)
    mean, var = eng.mean_variance(a, b, c, d, e)
    assert mean.shape == (batch, 1, 1)
    k = b.astype(np.float64) + np.eye(n) * c[:, :, 0][:, None, :]
    kinv = np.linalg.inv(k)
    mref = np.transpose(a, (0, 2, 1)) @ (kinv @ d)
    vref = e - np.transpose(a, (0, 2, 1)) @ (kinv @ a)
    np.testing.assert_allclose(mean, mref, atol=1e-4)
    np.testing.assert_allclose(var, vref, atol=1e-4)


def test_engine_inverse_warm(rng):
    import numpy as np

    import cuda_matrix_inversion_tpu as cmi
    from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch

    eng = cmi.InversionEngine()
    a = make_spd_batch(10, 16, rng).astype(np.float32)
    inv1 = eng.inverse(a)
    a2 = a + 0.01 * rng.standard_normal(a.shape).astype(np.float32)
    a2 = ((a2 + np.transpose(a2, (0, 2, 1))) / 2).astype(np.float32)
    inv2 = eng.inverse_warm(a2, inv1)
    err = np.abs(a2.astype(np.float64) @ inv2 - np.eye(16)).sum(-1).max()
    assert err < 1e-4
    # the warm compile must NOT pollute the cold cache: exactly the one
    # cold bucket is present (the warm executable lives in _compiled_warm)
    assert eng.compiled_shapes == [(32, 16)]
    assert list(eng._compiled_warm) == [(32, 16)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mismatched"):
        eng.inverse_warm(a2, inv1[:3])


def test_engine_warm_precision_wiring(rng):
    # warm_precision defaults track the cold algorithm's domain: the
    # pan500 lane (kappa <= 500 general class) refines through the
    # 3-pass split, everything else through the bf16 warm kernel
    import numpy as np
    import pytest as _pytest

    import cuda_matrix_inversion_tpu as cmi
    from cuda_matrix_inversion_tpu.io.fixtures import make_square_batch

    assert cmi.InversionEngine().warm_precision == "bf16"
    with _pytest.raises(ValueError, match="warm_precision"):
        cmi.InversionEngine(warm_precision="fp8")

    eng = cmi.InversionEngine(algorithm="newton_schulz_pan500_pallas")
    assert eng.warm_precision == "split3"
    # functional: a general (non-SPD) batch round-trips cold -> warm
    # through the split3 refinement and holds the gate
    a = make_square_batch(6, 16, rng).astype(np.float32)
    inv1 = eng.inverse(a)
    a2 = (a + 0.005 * rng.standard_normal(a.shape)).astype(np.float32)
    inv2 = eng.inverse_warm(a2, inv1, check=True)
    err = np.abs(a2.astype(np.float64) @ inv2 - np.eye(16)).sum(-1).max()
    assert err < 1e-4
    assert list(eng._compiled_warm_check) == [(8, 16)]


def test_engine_warm_split3_past_vmem_ceiling():
    # a split3 engine serves warm requests at n > 224 through the
    # XLA-level HIGH rounds: no "runs a cold solve" warning, and the
    # refinement actually recovers the gate from the previous inverse.
    # Deterministic per-test rng (VERDICT r4 weak #1b: on the shared
    # session rng this was draw-dependent, 1.136e-4 vs the 1e-4 gate
    # before the XLA route gained its extra polish round).
    import warnings

    import numpy as np

    import cuda_matrix_inversion_tpu as cmi
    from cuda_matrix_inversion_tpu.io.fixtures import make_square_batch

    rng = np.random.default_rng(20260820)
    eng = cmi.InversionEngine(algorithm="newton_schulz_pan500_pallas",
                              batch_buckets=(2,), dim_buckets=(256,))
    a = make_square_batch(2, 240, rng).astype(np.float32)
    inv1 = eng.inverse(a)
    a2 = (a + 1e-4 * rng.standard_normal(a.shape)).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        inv2 = eng.inverse_warm(a2, inv1)
    err = np.abs(a2.astype(np.float64) @ inv2 - np.eye(240)).sum(-1).max()
    assert err < 1e-4
    assert list(eng._compiled_warm) == [(2, 256)]


def test_engine_concurrent_requests(rng):
    # the engine claims thread-safety for concurrent callers
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    import cuda_matrix_inversion_tpu as cmi
    from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch

    eng = cmi.InversionEngine()
    batches = [make_spd_batch(4 + i, 16, rng).astype(np.float32)
               for i in range(8)]
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(eng.inverse, batches))
    for a, inv in zip(batches, results):
        err = np.abs(a.astype(np.float64) @ inv - np.eye(16)).sum(-1).max()
        assert err < 1e-4


def test_engine_inverse_warm_check_divergence(rng):
    import numpy as np

    import cuda_matrix_inversion_tpu as cmi
    from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch

    eng = cmi.InversionEngine()
    a = make_spd_batch(6, 16, rng).astype(np.float32)
    inv1 = eng.inverse(a)
    # near batch: check passes
    out = eng.inverse_warm(a, inv1, check=True)
    assert np.abs(a.astype(np.float64) @ out - np.eye(16)).sum(-1).max() < 1e-4
    # far batch (completely different matrices): refinement diverges to
    # finite garbage — check must catch what a finiteness test cannot
    far = make_spd_batch(6, 16, np.random.default_rng(999)).astype(np.float32)
    far = far * 7.0 + 3.0  # push it well outside delta*kappa < 0.3
    import pytest as _pytest

    with _pytest.raises(np.linalg.LinAlgError, match="diverged"):
        eng.inverse_warm(far, inv1, check=True)


def test_native_gp_empty_batch():
    import numpy as np

    from cuda_matrix_inversion_tpu.native.build import ensure_built

    if ensure_built() is None:
        import pytest as _pytest

        _pytest.skip("native lib not buildable")
    from cuda_matrix_inversion_tpu.native import oracle

    m, v = oracle.gp_mean_variance(
        np.zeros((0, 8, 1), np.float32), np.zeros((0, 8, 8), np.float32),
        np.zeros((0, 8, 1), np.float32), np.zeros((0, 8, 1), np.float32),
        np.zeros((0, 1, 1), np.float32))
    assert m.shape == (0,) and v.shape == (0,)


def test_engine_512_bucket(rng):
    # README advertises 8x8..512x512 — the engine's dim buckets cover it.
    # r2: the general-matrix lu route now polishes past n=192 (one Newton
    # residual step, ops/xla.py::inverse_lu), so the project-wide 1e-4
    # gate holds here too, not just on the SPD (Schur) entries.
    eng = InversionEngine(algorithm="lu")
    a = make_spd_batch(2, 300, rng).astype(np.float32)
    out = eng.inverse(a)
    err = np.abs(a.astype(np.float64) @ out - np.eye(300)).sum(-1).max()
    assert err < 1e-4


def test_engine_warm_dim_buckets(rng):
    # n in 129..224 must stay on the warm kernel (ADVICE r1 #1): it
    # buckets to a WARM_DIM_BUCKETS entry <= 224, not to 256
    from cuda_matrix_inversion_tpu.engine import WARM_DIM_BUCKETS

    eng = InversionEngine()
    assert eng._warm_buckets_for(10, 150) == (32, 160)
    assert eng._warm_buckets_for(10, 224) == (32, 224)
    assert eng._warm_buckets_for(10, 128) == (32, 128)
    assert WARM_DIM_BUCKETS[-1] == 224
    # past the warm kernel's ceiling: falls back to the regular buckets
    # (cold solve inside) and warns that prev_inv is discarded
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert eng._warm_buckets_for(10, 300) == (32, 512)
    assert any("cold adaptive solve" in str(x.message) for x in w)


def test_engine_inverse_warm_160_bucket(rng):
    # a 140-dim warm request actually refines (served by the 160 bucket)
    eng = InversionEngine()
    a = make_spd_batch(4, 140, rng).astype(np.float32)
    inv1 = eng.inverse(a)
    a2 = a + 0.005 * rng.standard_normal(a.shape).astype(np.float32)
    a2 = ((a2 + np.transpose(a2, (0, 2, 1))) / 2).astype(np.float32)
    inv2 = eng.inverse_warm(a2, inv1)
    err = np.abs(a2.astype(np.float64) @ inv2 - np.eye(140)).sum(-1).max()
    assert err < 1e-4
    assert list(eng._compiled_warm) == [(8, 160)]


def test_gp_engine_warm(rng):
    import cuda_matrix_inversion_tpu as cmi

    n, batch = 16, 6
    eng = cmi.GPEngine()
    b = make_spd_batch(batch, n, rng).astype(np.float32)
    a = rng.random((batch, n, 1), dtype=np.float32)
    c = rng.random((batch, n, 1), dtype=np.float32)
    d = rng.random((batch, n, 1), dtype=np.float32)
    e = rng.random((batch, 1, 1), dtype=np.float32)

    # seed the chain with a cold K^-1
    k = b.astype(np.float64) + np.eye(n) * c[:, :, 0][:, None, :]
    kinv0 = np.linalg.inv(k).astype(np.float32)

    # drift the system slightly (the per-timestep serving pattern)
    b2 = b + 0.003 * rng.standard_normal(b.shape).astype(np.float32)
    b2 = ((b2 + np.transpose(b2, (0, 2, 1))) / 2).astype(np.float32)

    mean, var, kinv = eng.mean_variance_warm(a, b2, c, d, e, kinv0)

    k2 = b2.astype(np.float64) + np.eye(n) * c[:, :, 0][:, None, :]
    kinv_ref = np.linalg.inv(k2)
    mref = np.transpose(a, (0, 2, 1)) @ (kinv_ref @ d)
    vref = e - np.transpose(a, (0, 2, 1)) @ (kinv_ref @ a)
    np.testing.assert_allclose(mean, mref, atol=1e-4)
    np.testing.assert_allclose(var, vref, atol=1e-4)
    # the returned kinv is chainable: it passes the inverse gate for K2
    gate = np.abs(k2 @ kinv.astype(np.float64) - np.eye(n)).max()
    assert gate < 1e-4
    assert kinv.shape == (batch, n, n)

    # chain a second timestep off the refined inverse
    b3 = b2 + 0.003 * rng.standard_normal(b.shape).astype(np.float32)
    b3 = ((b3 + np.transpose(b3, (0, 2, 1))) / 2).astype(np.float32)
    mean3, var3, kinv3 = eng.mean_variance_warm(a, b3, c, d, e, kinv)
    k3 = b3.astype(np.float64) + np.eye(n) * c[:, :, 0][:, None, :]
    kinv3_ref = np.linalg.inv(k3)
    np.testing.assert_allclose(
        mean3, np.transpose(a, (0, 2, 1)) @ (kinv3_ref @ d), atol=1e-4)

    with pytest.raises(ValueError, match="prev_kinv"):
        eng.mean_variance_warm(a, b3, c, d, e, kinv[:2])

    # empty batch round-trips
    z = eng.mean_variance_warm(a[:0], b3[:0], c[:0], d[:0], e[:0], kinv[:0])
    assert z[0].shape == (0, 1, 1) and z[2].shape == (0, n, n)


def test_gp_engine_fit(rng):
    # batch-bucketed fit: 10 systems pad to the 16-bucket with weight-0
    # systems, which must leave the real systems' trajectories and the
    # convergence trace identical to the direct (unbucketed) fit.  Dim
    # stays exact — pre-scaling dim padding would bias the amplitude
    # gradient (the identity pad block would get scaled by e^{2 theta}).
    import jax.numpy as jnp

    from cuda_matrix_inversion_tpu.engine import GPEngine
    from cuda_matrix_inversion_tpu.models import gp_fit

    batch, n, rank = 10, 16, 4
    w = rng.standard_normal((batch, n, rank))
    b = (w @ np.transpose(w, (0, 2, 1)) + 0.05 * np.eye(n)).astype(np.float32)
    c = (rng.random((batch, n, 1)) + 0.5).astype(np.float32)
    d = rng.standard_normal((batch, n, 1)).astype(np.float32)

    eng = GPEngine()
    res = eng.fit(b, c, d, steps=30)
    assert res.log_amp.shape == (batch,)
    ref = gp_fit.fit_gp_scales_host(b, c, d, steps=30,
                                    method=eng.fit_method)
    np.testing.assert_allclose(res.log_amp, ref.log_amp, atol=1e-4)
    np.testing.assert_allclose(res.log_noise, ref.log_noise, atol=1e-4)
    np.testing.assert_allclose(res.lml, ref.lml, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(res.lml_path, ref.lml_path, rtol=1e-4,
                               atol=1e-3)
    # the compiled executable is cached per (batch bucket, n, steps, lr)
    assert len(eng._compiled_fit) == 1
    eng.fit(b[:8], c[:8], d[:8], steps=30)
    assert len(eng._compiled_fit) == 2  # 8-bucket is a new key

    # empty batch round-trips
    z = eng.fit(b[:0], c[:0], d[:0], steps=5)
    assert z.log_amp.shape == (0,) and z.lml_path.shape == (5,)
