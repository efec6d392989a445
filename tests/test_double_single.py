"""Double-single fp64-class tier (ops/double_single.py — VERDICT r3
next #2; reference precision switch: include/types.h:4).

Tests run on CPU with x64 enabled (conftest), so every claim is checked
against genuine f64 ground truth.  The bf16 digit casts behave
identically on CPU and TPU (exact by construction — each digit has ≤ 8
significand bits), so these numerics transfer; the on-chip confirmation
rows live in results/chip-tests.txt.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuda_matrix_inversion_tpu.ops import double_single as ds
from cuda_matrix_inversion_tpu.ops import registry


def _cond_batch(rng, batch, n, kappa):
    u, _ = np.linalg.qr(rng.standard_normal((batch, n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((batch, n, n)))
    s = np.geomspace(1.0, 1.0 / kappa, n)
    return ((u * s[None, None, :]) @ v).astype(np.float32)


def test_two_sum_exact_under_jit(rng):
    """The EFT identity a + b == s + e must hold in f64 even after XLA's
    algebraic simplifier has seen the graph (the optimization_barrier
    regression guard — without it (r+c)-c folds to r under jit)."""
    a = rng.standard_normal(256).astype(np.float32)
    b = (rng.standard_normal(256) * 1e-6).astype(np.float32)
    s, e = jax.jit(ds.two_sum)(jnp.asarray(a), jnp.asarray(b))
    lhs = a.astype(np.float64) + b.astype(np.float64)
    rhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert (lhs == rhs).all()
    assert np.abs(np.asarray(e)).max() > 0  # e genuinely carries bits


def test_slice_digits_bf16_exact_and_reconstruct(rng):
    v = (rng.standard_normal(512) * 0.5).clip(-0.999, 0.999).astype(np.float32)
    digits, rem = jax.jit(
        lambda x: ds._slice_digits(x, 6))(jnp.asarray(v))
    total = np.zeros_like(v, np.float64)
    for d in digits:
        d = np.asarray(d)
        # every digit must survive a bf16 round-trip unchanged
        assert (d.astype(jnp.bfloat16).astype(np.float32) == d).all()
        total += d.astype(np.float64)
    assert np.abs(total + np.asarray(rem, np.float64)
                  - v.astype(np.float64)).max() == 0.0
    assert np.abs(np.asarray(rem)).max() <= 2.0 ** -49


def test_matmul_ds_matches_f64(rng):
    a = _cond_batch(rng, 3, 64, 500.0)
    x64 = np.linalg.inv(a.astype(np.float64))
    xh = x64.astype(np.float32)
    xl = (x64 - xh).astype(np.float32)
    ph, pl_ = jax.jit(ds.matmul_ds)(jnp.asarray(a), jnp.asarray(xh),
                                    jnp.asarray(xl))
    got = np.asarray(ph, np.float64) + np.asarray(pl_, np.float64)
    want = a.astype(np.float64) @ x64
    assert np.abs(got - want).max() < 1e-11


def test_matmul_ds_chunked_contraction(rng):
    """K > 256 exceeds the exact-accumulation window; the chunked path
    must hold the same error class."""
    n = 320
    a = (rng.standard_normal((1, n, n)) / np.sqrt(n)).astype(np.float32)
    x = (rng.standard_normal((1, n, n)) / np.sqrt(n)).astype(np.float32)
    ph, pl_ = jax.jit(ds.matmul_ds)(jnp.asarray(a), jnp.asarray(x))
    got = np.asarray(ph, np.float64) + np.asarray(pl_, np.float64)
    want = a.astype(np.float64) @ x.astype(np.float64)
    assert np.abs(got - want).max() < 1e-11


def test_refine_reaches_ds_floor_kappa500(rng):
    a = _cond_batch(rng, 2, 64, 500.0)
    x0 = np.linalg.inv(a).astype(np.float32)
    xh, xl = ds.refine_ds(jnp.asarray(a), jnp.asarray(x0), iters=2)
    xds = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    r = np.abs(np.eye(64) - a.astype(np.float64) @ xds).max()
    assert r < 1e-10  # measured 4.7e-13; two orders of margin


def test_residual_inf_ds_matches_f64(rng):
    a = _cond_batch(rng, 2, 48, 50.0)
    x0 = np.linalg.inv(a).astype(np.float32)
    got = np.asarray(ds.residual_inf_ds(jnp.asarray(a), jnp.asarray(x0)))
    want = np.abs(np.eye(48)[None] - a.astype(np.float64)
                  @ x0.astype(np.float64)).max(axis=(1, 2))
    assert np.allclose(got, want, rtol=1e-3)


def test_inverse_hiacc_f64_output(rng):
    a = _cond_batch(rng, 2, 32, 500.0)
    x = ds.inverse_hiacc(jnp.asarray(a.astype(np.float64)),
                         algorithm="lu", iters=2)
    assert x.dtype == jnp.float64
    r = np.abs(np.eye(32) - a.astype(np.float64) @ np.asarray(x)).max()
    assert r < 1e-10


def test_inverse_hiacc_f32_collapses_to_hi(rng):
    a = _cond_batch(rng, 2, 32, 100.0)
    x = ds.inverse_hiacc(jnp.asarray(a), algorithm="lu", iters=2)
    assert x.dtype == jnp.float32
    # still the best fp32 inverse there is: residual at the fp32 floor
    r = np.abs(np.eye(32) - a.astype(np.float64)
               @ np.asarray(x, np.float64)).max()
    assert r < 1e-5


def test_registered_and_extends_kappa_range():
    # VERDICT r4 weak #3 / next #1: deterministic per-test rng (the
    # session rng made this draw-dependent) AND the adaptive refinement
    # default, so the κ=2e4 contract holds on EVERY draw — the seed
    # residual at κ·ε₃₂ ≈ 1e-3 varies by draw and a fixed schedule
    # cleared the quadratic tail only on some of them.
    assert "lu_hiacc" in registry.list_inverse_algorithms(cpu=False)
    fn = registry.get_inverse_algorithm("lu_hiacc")
    a = _cond_batch(np.random.default_rng(42), 2, 32, 2e4)
    xh, xl = ds.inverse_hiacc_ds(jnp.asarray(a), algorithm="lu")
    xds = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    r = np.abs(np.eye(32) - a.astype(np.float64) @ xds).max()
    assert r < 1e-8
    assert fn(jnp.asarray(a)).shape == a.shape


def test_adaptive_refine_holds_contract_across_draws():
    """The adaptive driver's whole point: 1e-8 at κ=2e4 on a spread of
    seeds, including ones where a fixed 3-round schedule fell short
    (r4's red suite found 5.7e-5 on the session rng's draw)."""
    for seed in (0, 1, 1234, 2026):
        a = _cond_batch(np.random.default_rng(seed), 2, 32, 2e4)
        xh, xl = ds.inverse_hiacc_ds(jnp.asarray(a), algorithm="lu")
        xds = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        r = np.abs(np.eye(32) - a.astype(np.float64) @ xds).max()
        assert r < 1e-8, f"seed {seed}: {r:.3e}"


def test_f64_input_not_rounded_to_f32():
    """ADVICE r4 medium: a genuine f64 input (entries NOT exactly
    f32-representable) must be inverted against the true A.  Before the
    ds split of A, the result was the ~1e-12 inverse of round32(A) —
    fp32-class (~κ·2⁻²⁴ ≈ 3e-5 here) against the true A."""
    rng = np.random.default_rng(7)
    a = _cond_batch(rng, 2, 32, 500.0).astype(np.float64)
    a += rng.standard_normal(a.shape) * 1e-9  # break f32-representability
    assert (a.astype(np.float32).astype(np.float64) != a).any()
    x = ds.inverse_hiacc(jnp.asarray(a), algorithm="lu")
    assert x.dtype == jnp.float64
    r = np.abs(np.eye(32) - a @ np.asarray(x)).max()
    assert r < 1e-10  # fp64-class vs the TRUE A, not round32(A)


def test_split_f64_reconstructs():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((4, 16, 16))
    ah, al = ds.split_f64(jnp.asarray(a))
    back = np.asarray(ah, np.float64) + np.asarray(al, np.float64)
    assert np.abs(back - a).max() <= np.abs(a).max() * 2.0 ** -48
