"""Fused GP mean/variance Pallas kernel — the BASELINE.json north star.

One kernel launch computes, for every matrix in the batch,

    mean = aᵀ (B + diag c)⁻¹ d
    var  = e − aᵀ (B + diag c)⁻¹ a

The reference runs this as four separately-launched stages with host
control between them (addDiagonal → cuBLAS LU inverse → gemv → dot,
``calcluateMean`` ``src/gauss_bench.cu:127-265``); the XLA path in
:mod:`..models.gp` already fuses the graph, but still materializes the
inverse/solve through HBM.  Here the whole pipeline lives in VMEM:

* diagonal add happens while staging B into scratch (zero extra passes);
* the blocked Cholesky bodies from :mod:`.pallas_cholesky` produce
  W = L⁻¹ in VMEM;
* the solves ride row space: xᵀ = dᵀ WᵀW via two (1,N)@(N,N) MXU ops per
  matrix — the inverse is never materialized and nothing but the two
  scalars per matrix is written back to HBM.

HBM traffic: read B (+4 vectors), write 2 scalars — ~6.7 MB for the
100×128 config vs ~20 MB for the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_matrix_inversion_tpu.ops.pallas_cholesky import (
    _blocked_lt_w,
    _cholesky_factor_inverse_body,
    _mm,
    _panel_width,
)
from cuda_matrix_inversion_tpu.ops.pallas_common import (
    block_batch,
    default_interpret,
    tuned_block,
)



def _pad_gp_system(a, b, c, d):
    """Pad n up to a multiple of 8 (Mosaic tile alignment): identity block
    in B, zero rows in the vectors — exact, contributes nothing."""
    n = b.shape[-1]
    target = max(8, -(-n // 8) * 8)
    if target == n:
        return a, b, c, d, n
    pad = target - n
    batch = b.shape[0]
    bp = jnp.zeros((batch, target, target), b.dtype)
    bp = bp.at[:, :n, :n].set(b)
    bp = bp.at[:, n:, n:].set(jnp.eye(pad, dtype=b.dtype))
    zpad = lambda v: jnp.pad(v, ((0, 0), (0, pad), (0, 0)))  # noqa: E731
    return zpad(a), bp, zpad(c), zpad(d), n


def _gp_kernel(pw, a_ref, b_ref, c_ref, d_ref, e_ref, out_ref,
               work_ref, lt_ref, w_ref, *small_refs):
    """a,c,d: (BM, N); b: (BM, N, N); e: (BM, 1); out: (BM, 2) = [mean, var]."""
    bm, n, _ = b_ref.shape
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(jnp.float32)

    # stage K = B + diag(c) into VMEM scratch (the reference's addDiagonal
    # kernel, src/gauss_bench.cu:38-61, fused into the load)
    work_ref[:, :, :] = b_ref[:, :, :] + eye * c_ref[:, :][:, None, :]

    if pw is None:
        _cholesky_factor_inverse_body(n, work_ref, lt_ref, w_ref)
    else:
        _blocked_lt_w(pw, work_ref, lt_ref, w_ref, *small_refs)

    # row-space solves: x_rowᵀ = K⁻¹ v  ⇔  x_row = v_row Wᵀ W (K symmetric)
    for b in range(bm):
        w_b = w_ref[b, :, :]
        rows = jnp.concatenate(
            [d_ref[b, :][None, :], a_ref[b, :][None, :]], axis=0)  # (2, N)
        t = _mm(rows, w_b, contract=((1,), (1,)))   # [d a] Wᵀ   (2, N)
        x = _mm(t, w_b)                              # ... W      (2, N)
        proj = jnp.sum(a_ref[b, :][None, :] * x, axis=1)[None, :]  # (1, 2)
        row = jnp.concatenate(
            [proj[:, 0:1], e_ref[b, :][None, :] - proj[:, 1:2]], axis=1)
        out_ref[b:b + 1, :] = row  # scalar stores to VMEM are illegal


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def gp_mean_variance_fused(a, b, c, d, e, block: int | None = None,
                           interpret: bool | None = None):
    """Fused batched GP mean+variance: one Pallas launch for the batch.

    Shapes follow the fixture layout (``include/gauss_cpu.h:16-58``):
    a, c, d — (batch, n, 1); b — (batch, n, n); e — (batch, 1, 1).
    Returns (means, variances) each (batch, 1, 1).
    """
    if b.dtype == jnp.float64:
        # keep f64 exact: XLA solve path end to end
        from cuda_matrix_inversion_tpu.ops import xla as _xla

        k = _xla.add_diagonal(b, c)
        rhs = jnp.concatenate([d, a], axis=-1)
        x = _xla.spd_solve(k, rhs)
        proj = jnp.matmul(jnp.swapaxes(a, -1, -2), x,
                          precision=jax.lax.Precision.HIGHEST)
        return proj[:, :, 0:1], e - proj[:, :, 1:2]
    if b.shape[-1] > 256:
        # past the fused kernel's VMEM ceiling: Schur-complement solve
        # whose half-size inversions still run the Pallas kernel
        # (ops/schur.py) — K = B + diag(c) is SPD by construction
        from cuda_matrix_inversion_tpu.ops import xla as _xla
        from cuda_matrix_inversion_tpu.ops.pallas_cholesky import (
            inverse_cholesky as _chol_inv,
        )
        from cuda_matrix_inversion_tpu.ops.schur import spd_schur_solve

        k = _xla.add_diagonal(b, c)
        rhs = jnp.concatenate([d, a], axis=-1)
        x = spd_schur_solve(k, rhs, functools.partial(_chol_inv,
                                                      interpret=interpret))
        proj = jnp.matmul(jnp.swapaxes(a, -1, -2), x,
                          precision=jax.lax.Precision.HIGHEST)
        return proj[:, :, 0:1], e - proj[:, :, 1:2]

    a, b, c, d, _n_orig = _pad_gp_system(a, b, c, d)
    batch, n, _ = b.shape
    orig_dtype = b.dtype
    f32 = jnp.float32
    a2, c2, d2 = (x.astype(f32)[:, :, 0] for x in (a, c, d))
    e2 = e.astype(f32)[:, :, 0]
    b2 = b.astype(f32)

    if block is not None:
        bm = block
    elif _panel_width(n) is not None:
        bm = tuned_block(n)
    else:
        bm = block_batch(batch, n, buffers=4)
    # empty batch still pads to one full block (a 0-cell grid is invalid)
    pad = (-batch) % bm if batch else bm
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (pad, n, n))
        b2 = jnp.concatenate([b2, eye], axis=0)
        zv = jnp.zeros((pad, n), f32)
        a2 = jnp.concatenate([a2, zv], axis=0)
        c2 = jnp.concatenate([c2, zv], axis=0)
        d2 = jnp.concatenate([d2, zv], axis=0)
        e2 = jnp.concatenate([e2, jnp.zeros((pad, 1), f32)], axis=0)
    grid = b2.shape[0] // bm

    pw = _panel_width(n)
    scratch = [
        pltpu.VMEM((bm, n, n), f32),  # work
        pltpu.VMEM((bm, n, n), f32),  # lt
        pltpu.VMEM((bm, n, n), f32),  # w
    ]
    if pw is not None:
        scratch += [
            pltpu.VMEM((bm, pw, pw), f32),
            pltpu.VMEM((bm, pw, pw), f32),
            pltpu.VMEM((bm, pw, pw), f32),
            pltpu.VMEM((bm, n, pw), f32),
        ]

    vec = lambda: pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_gp_kernel, pw),
        grid=(grid,),
        in_specs=[
            vec(),
            pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vec(),
            vec(),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b2.shape[0], 2), f32),
        scratch_shapes=scratch,
        interpret=default_interpret(interpret),
    )(a2, b2, c2, d2, e2)

    out = out[:batch].astype(orig_dtype)
    return out[:, 0][:, None, None], out[:, 1][:, None, None]


# ---------------------------------------------------------------------------
# Fused log marginal likelihood — the hyper-parameter-fit hot loop
# ---------------------------------------------------------------------------


def _gp_lml_kernel(pw, emit_w, b_ref, c_ref, d_ref, out_ref,
                   *rest_refs):
    """Per system: quad = dᵀK⁻¹d and logdet = log|K| in one VMEM pass.

    b: (BM, N, N); c, d: (BM, N); out: (BM, 2) = [quad, logdet].  The
    Cholesky factor+inverse body produces Lᵀ rows and W = L⁻¹ in VMEM;
    quad = ‖W d‖² (one (1,N)@(N,N) MXU op per matrix) and the
    log-determinant is 2·Σ log diag L, the diagonal extracted by a
    cross-sublane masked reduction (never a lane-dim dynamic index).

    ``emit_w``: the autodiff-forward flavor — W and αᵀ = (W d)ᵀ W are
    ALSO written to HBM so the custom VJP can form K⁻¹ = WᵀW with one
    batched matmul instead of refactorizing (w/alpha become outputs 2/3
    and w doubles as the factor workspace instead of a scratch buffer).
    """
    if emit_w:
        w_ref, alpha_ref, work_ref, lt_ref, *small_refs = rest_refs
    else:
        work_ref, lt_ref, w_ref, *small_refs = rest_refs
    bm, n, _ = b_ref.shape
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(jnp.float32)

    work_ref[:, :, :] = b_ref[:, :, :] + eye * c_ref[:, :][:, None, :]

    if pw is None:
        _cholesky_factor_inverse_body(n, work_ref, lt_ref, w_ref)
    else:
        _blocked_lt_w(pw, work_ref, lt_ref, w_ref, *small_refs)

    for b in range(bm):
        t = _mm(d_ref[b, :][None, :], w_ref[b, :, :],
                contract=((1,), (1,)))                     # (1, N) = (W d)ᵀ
        quad = jnp.sum(t * t, axis=1, keepdims=True)       # (1, 1)
        # lane j of the cross-sublane sum picks L[j, j] (lt holds Lᵀ rows,
        # so column j of lt is row j of L — eye masks the diagonal)
        diag = jnp.sum(lt_ref[b, :, :] * eye, axis=0)[None, :]   # (1, N)
        logdet = 2.0 * jnp.sum(jnp.log(diag), axis=1, keepdims=True)
        out_ref[b:b + 1, :] = jnp.concatenate([quad, logdet], axis=1)
        if emit_w:
            # αᵀ = (W d)ᵀ W = dᵀK⁻¹ — one more (1,N)@(N,N) MXU op
            alpha_ref[b:b + 1, :] = _mm(t, w_ref[b, :, :])


@functools.partial(jax.jit, static_argnames=("emit_w", "block", "interpret"))
def _lml_fused_quad_logdet(b, c, d, emit_w: bool = False,
                           block: int | None = None,
                           interpret: bool | None = None):
    """(quad, logdet[, w, alpha]) per system via the fused kernel — f32,
    n ≤ 256.

    Same padding/blocking scheme as :func:`gp_mean_variance_fused`;
    identity-padded tail rows contribute log 1 = 0 to the logdet and the
    zero-padded d rows contribute nothing to the quadratic form.
    ``emit_w=True`` (the autodiff forward) additionally returns
    W = L⁻¹ and α = K⁻¹d, sliced back to the original n — exact, because
    the identity padding makes W/K⁻¹ block-diagonal.
    """
    d_dummy = d  # _pad_gp_system pads (a, b, c, d); reuse d for the a slot
    _, b, c, d, n_orig = _pad_gp_system(d_dummy, b, c, d)
    batch, n, _ = b.shape
    f32 = jnp.float32
    c2, d2 = (x.astype(f32)[:, :, 0] for x in (c, d))
    b2 = b.astype(f32)

    if block is not None:
        bm = block
    elif _panel_width(n) is not None:
        # one notch below the GP kernel's tuned_block(n): under a jvp/scan
        # caller the same bm=24 footprint blew the 16 MB scoped-VMEM stack
        # by 176 KB at 1600×128 (r3 chip measurement — the "margins move
        # with the caller" class); 4·2¹⁹ keeps the ≥2 MB headroom rule
        bm = tuned_block(n, numerator=4 * 2**19, max_bm=16)
    else:
        bm = block_batch(batch, n, buffers=4)
    pad = (-batch) % bm if batch else bm
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (pad, n, n))
        b2 = jnp.concatenate([b2, eye], axis=0)
        zv = jnp.zeros((pad, n), f32)
        c2 = jnp.concatenate([c2, zv], axis=0)
        d2 = jnp.concatenate([d2, zv], axis=0)
    grid = b2.shape[0] // bm

    pw = _panel_width(n)
    scratch = [
        pltpu.VMEM((bm, n, n), f32),  # work
        pltpu.VMEM((bm, n, n), f32),  # lt
    ]
    if not emit_w:
        scratch.append(pltpu.VMEM((bm, n, n), f32))  # w stays on-chip
    if pw is not None:
        scratch += [
            pltpu.VMEM((bm, pw, pw), f32),
            pltpu.VMEM((bm, pw, pw), f32),
            pltpu.VMEM((bm, pw, pw), f32),
            pltpu.VMEM((bm, n, pw), f32),
        ]

    vec = lambda: pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    mat = lambda: pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    out_specs = pl.BlockSpec((bm, 2), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b2.shape[0], 2), f32)
    if emit_w:
        out_specs = (out_specs, mat(), vec())
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct(b2.shape, f32),
                     jax.ShapeDtypeStruct((b2.shape[0], n), f32))
    out = pl.pallas_call(
        functools.partial(_gp_lml_kernel, pw, emit_w),
        grid=(grid,),
        in_specs=[mat(), vec(), vec()],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=default_interpret(interpret),
    )(b2, c2, d2)
    if emit_w:
        out, w, alpha = out
        return (out[:batch, 0], out[:batch, 1],
                w[:batch, :n_orig, :n_orig], alpha[:batch, :n_orig])
    return out[:batch, 0], out[:batch, 1]


def _lml_from(quad, logdet, n):
    return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


@jax.custom_vjp
def _lml_fused(b, c, d):
    quad, logdet = _lml_fused_quad_logdet(b, c, d)
    return _lml_from(quad, logdet, b.shape[-1]).astype(b.dtype)


def _lml_fused_fwd(b, c, d):
    # the emit_w flavor: W = L⁻¹ and α = K⁻¹d ride out of the SAME kernel
    # launch as the value, so the backward needs no factorization at all
    quad, logdet, w, alpha = _lml_fused_quad_logdet(b, c, d, emit_w=True)
    lml = _lml_from(quad, logdet, b.shape[-1]).astype(b.dtype)
    return lml, (w, alpha)


def _lml_fused_bwd(res, g):
    """Analytic VJP from the forward's own residuals.

    ∂LML/∂K = ½(ααᵀ − K⁻¹) with α = K⁻¹d; ∂LML/∂d = −α.  K = B + diag c
    means ∂/∂B is the full matrix and ∂/∂c its diagonal.  K⁻¹ = WᵀW is
    ONE batched HIGHEST matmul over the forward-saved W — replacing the
    r3-first-cut refactorization (a whole inverse_cholesky launch, ~5 ms
    of the 11 ms step at 1600×128) and XLA's cholesky + four-triangular-
    solve chain alike.  Gradient precision inherits the kernel's ~1e-5
    gate — ample for the Adam fit this path exists for.
    """
    w, alpha = res
    hi = jax.lax.Precision.HIGHEST
    kinv = jnp.matmul(jnp.swapaxes(w, -1, -2), w, precision=hi)
    al = alpha[:, :, None]                                  # (batch, n, 1)
    gk = 0.5 * (jnp.matmul(al, jnp.swapaxes(al, -1, -2), precision=hi)
                - kinv)
    gm = g[:, None, None].astype(gk.dtype)
    gb = gm * gk
    gc = gm * jnp.diagonal(gk, axis1=-2, axis2=-1)[:, :, None]
    gd = gm * (-al)
    return gb, gc, gd


_lml_fused.defvjp(_lml_fused_fwd, _lml_fused_bwd)


def gp_log_marginal_likelihood_fused(b, c, d):
    """Batched GP log marginal likelihood via ONE fused Pallas launch,
    differentiable through an analytic custom VJP.

    Same contract as :func:`..models.gp.gp_log_marginal_likelihood`
    (b — (batch, n, n); c, d — (batch, n, 1) → (batch,)), but the
    forward is a single kernel (factor K in VMEM, emit dᵀK⁻¹d and
    log|K| — two scalars per system written to HBM) and the backward is
    one fused-inverse launch plus elementwise math, instead of XLA's
    cholesky + four triangular-solve chain.  f64 and n > 256 fall back
    to the XLA path (its autodiff is exact there).
    """
    if b.dtype == jnp.float64 or b.shape[-1] > 256:
        from cuda_matrix_inversion_tpu.models.gp import (
            gp_log_marginal_likelihood,
        )

        return gp_log_marginal_likelihood(b, c, d)
    # f32 in, f32 cotangents out — the custom-VJP primal is f32-only
    # (lower-precision inputs differentiate through this cast)
    orig = b.dtype
    b, c, d = (jnp.asarray(x).astype(jnp.float32) for x in (b, c, d))
    return _lml_fused(b, c, d).astype(orig)


# ---------------------------------------------------------------------------
# Warm-start fused variant — serving slowly-varying GP systems
# ---------------------------------------------------------------------------

def _gp_warm_kernel(lo_iters, hi_iters, mid_split, a_ref, b_ref, c_ref,
                    d_ref, e_ref, x0_ref, out_ref, kinv_ref, k_ref, tmp_ref):
    """Fused warm GP: seed X = prev K⁻¹, refine in VMEM, solve, and write
    the refined inverse back (so the caller can chain the next timestep).

    Same shapes as :func:`_gp_ns_kernel` plus x0 (BM, N, N) in and
    kinv (BM, N, N) out.  HBM traffic: read B + X0 (+4 vectors), write
    K⁻¹ + 2 scalars — vs read-B-write-X for the cold NS kernel; the win
    is compute: 2 bf16 + 1 polish rounds instead of the 8+2 cold
    schedule (valid while δ·κ(K) ≲ 0.3, see inverse_newton_schulz_warm).
    """
    from cuda_matrix_inversion_tpu.ops.newton_schulz import ns_vmem_rounds

    bm, n, _ = b_ref.shape
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(jnp.float32)

    k_ref[:, :, :] = b_ref[:, :, :] + eye * c_ref[:, :][:, None, :]
    kinv_ref[:, :, :] = x0_ref[:, :, :]
    ns_vmem_rounds(lo_iters, hi_iters, k_ref, kinv_ref, tmp_ref,
                   mid_split=mid_split)

    for b in range(bm):
        rows = jnp.concatenate(
            [d_ref[b, :][None, :], a_ref[b, :][None, :]], axis=0)  # (2, N)
        x = _mm(rows, kinv_ref[b, :, :])  # K symmetric ⇒ X too
        proj = jnp.sum(a_ref[b, :][None, :] * x, axis=1)[None, :]  # (1, 2)
        row = jnp.concatenate(
            [proj[:, 0:1], e_ref[b, :][None, :] - proj[:, 1:2]], axis=1)
        out_ref[b:b + 1, :] = row


@functools.partial(jax.jit, static_argnames=("lo_iters", "hi_iters", "block",
                                             "interpret"))
def gp_mean_variance_fused_warm(a, b, c, d, e, prev_kinv,
                                lo_iters: int = 2, hi_iters: int = 1,
                                block: int | None = None,
                                interpret: bool | None = None):
    """Warm-start fused GP: refine the previous timestep's K⁻¹ and solve.

    The serving pattern the reference's sensor workload implies
    (``README.md:41-44``) applied to the GP pipeline: per-timestep
    covariances drift slowly, so ``prev_kinv`` (the refined inverse this
    function returned last step) has residual δ·κ(K) and 2 bf16 + 1
    polish rounds recover the gate while δ·κ ≲ 0.3.

    Returns ``(mean, var, kinv)`` — chain ``kinv`` into the next call.
    Falls back to the cold NS-fused kernel (discarding ``prev_kinv``) for
    f64 / n > 224 (same VMEM boundary as the cold NS kernel).
    """
    if b.dtype == jnp.float64 or b.shape[-1] > 224:
        from cuda_matrix_inversion_tpu.ops import xla as _xla

        mean, var = gp_mean_variance_fused(a, b, c, d, e)
        k = _xla.add_diagonal(b, c)
        from cuda_matrix_inversion_tpu.ops.newton_schulz import (
            inverse_newton_schulz_warm,
        )

        return mean, var, inverse_newton_schulz_warm(k, prev_kinv)

    a, b, c, d, _n_orig = _pad_gp_system(a, b, c, d)
    from cuda_matrix_inversion_tpu.ops.pallas_common import pad_matrix_dim

    prev_kinv, _ = pad_matrix_dim(prev_kinv)  # identity pad: its own inverse
    batch, n, _ = b.shape
    orig_dtype = b.dtype
    f32 = jnp.float32
    a2, c2, d2 = (x.astype(f32)[:, :, 0] for x in (a, c, d))
    e2 = e.astype(f32)[:, :, 0]
    b2 = b.astype(f32)
    x02 = prev_kinv.astype(f32)

    if block is not None:
        bm = block
    else:
        # ~9 live (BM,N,N)-scale buffers (pipelined B + X0 + kinv out,
        # scratch K + tmp) — same BM=16 ceiling as the warm inversion
        # kernel; multiple_of=8: (bm, n) vector specs put bm on sublanes.
        from cuda_matrix_inversion_tpu.ops.pallas_common import divisor_block

        bm = divisor_block(batch, tuned_block(n, numerator=2 * 2**19, max_bm=16),
                           multiple_of=8)
    pad = (-batch) % bm if batch else bm
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (pad, n, n))
        b2 = jnp.concatenate([b2, eye], axis=0)
        x02 = jnp.concatenate([x02, eye], axis=0)
        zv = jnp.zeros((pad, n), f32)
        a2 = jnp.concatenate([a2, zv], axis=0)
        c2 = jnp.concatenate([c2, zv], axis=0)
        d2 = jnp.concatenate([d2, zv], axis=0)
        e2 = jnp.concatenate([e2, jnp.zeros((pad, 1), f32)], axis=0)
    grid = b2.shape[0] // bm

    run_interpret = default_interpret(interpret)
    vec = lambda: pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    out, kinv = pl.pallas_call(
        functools.partial(_gp_warm_kernel, lo_iters, hi_iters,
                          not run_interpret),
        grid=(grid,),
        in_specs=[
            vec(),
            pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vec(),
            vec(),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b2.shape[0], 2), f32),
            jax.ShapeDtypeStruct(b2.shape, f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, n, n), f32),  # K
            pltpu.VMEM((bm, n, n), f32),  # tmp
        ],
        interpret=default_interpret(interpret),
    )(a2, b2, c2, d2, e2, x02)

    out = out[:batch].astype(orig_dtype)
    kinv = kinv[:batch, :_n_orig, :_n_orig].astype(orig_dtype)
    return out[:, 0][:, None, None], out[:, 1][:, None, None], kinv


# ---------------------------------------------------------------------------
# Newton-Schulz fused variant — the fastest GP path for diag-dominant K
# ---------------------------------------------------------------------------

def _gp_ns_kernel(lo_iters, hi_iters, mid_split, a_ref, b_ref, c_ref, d_ref,
                  e_ref, out_ref, k_ref, x_ref, tmp_ref):
    """Fused GP with the inverse computed by VMEM-resident Newton-Schulz.

    Same contract as :func:`_gp_kernel`; K = B + diag(c) stays in VMEM,
    X = K⁻¹ is iterated in VMEM (see ``ns_vmem_iterate`` for the
    schedule/precision design), and because K is symmetric the solves
    are lane-aligned row-matvecs against X directly — no triangular
    machinery at all.  K is SPD by construction (B SPD + nonnegative
    diagonal, ``generate_gaussian_matrices.m:14-38``), so the iteration
    uses the "spd" start.  Domain: κ(K) ≲ 30 (diag-dominant GP kernels).
    """
    from cuda_matrix_inversion_tpu.ops.newton_schulz import ns_vmem_iterate

    bm, n, _ = b_ref.shape
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(jnp.float32)

    k_ref[:, :, :] = b_ref[:, :, :] + eye * c_ref[:, :][:, None, :]

    ns_vmem_iterate(lo_iters, hi_iters, "spd", k_ref, x_ref, tmp_ref,
                    mid_split=mid_split)

    for b in range(bm):
        rows = jnp.concatenate(
            [d_ref[b, :][None, :], a_ref[b, :][None, :]], axis=0)  # (2, N)
        x = _mm(rows, x_ref[b, :, :])  # [d a] X  (K symmetric ⇒ X too)
        proj = jnp.sum(a_ref[b, :][None, :] * x, axis=1)[None, :]  # (1, 2)
        row = jnp.concatenate(
            [proj[:, 0:1], e_ref[b, :][None, :] - proj[:, 1:2]], axis=1)
        out_ref[b:b + 1, :] = row


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def gp_mean_variance_fused_ns(a, b, c, d, e, block: int | None = None,
                              interpret: bool | None = None):
    """Fused GP via VMEM Newton-Schulz — fastest path for diag-dominant K
    (κ ≲ 30); same shapes/contract as :func:`gp_mean_variance_fused`."""
    if b.dtype == jnp.float64 or b.shape[-1] > 224:
        # past 224: 3 (BM,N,N) NS buffers + Mosaic's pipelined-input
        # allocations exceed the 16 MB VMEM even at BM=8 (measured: n=256
        # requests 25.6 MB; n=224 fits) — Cholesky-fused kernel instead
        return gp_mean_variance_fused(a, b, c, d, e)

    a, b, c, d, _n_orig = _pad_gp_system(a, b, c, d)
    batch, n, _ = b.shape
    orig_dtype = b.dtype
    f32 = jnp.float32
    a2, c2, d2 = (x.astype(f32)[:, :, 0] for x in (a, c, d))
    e2 = e.astype(f32)[:, :, 0]
    b2 = b.astype(f32)

    if block is not None:
        bm = block
    else:
        # ~11 (BM,N,N)-scale buffers live (K, X, tmp + double-buffered B
        # + vectors/out) — BM=16 at n=128 is the VMEM ceiling; prefer a
        # batch divisor to skip identity-padding waste.  multiple_of=8:
        # the (bm, n) vector block specs put bm on the sublane dim.
        from cuda_matrix_inversion_tpu.ops.pallas_common import divisor_block

        bm = divisor_block(batch, tuned_block(n, numerator=2 * 2**19, max_bm=16),
                           multiple_of=8)
    # empty batch still pads to one full block (a 0-cell grid is invalid)
    pad = (-batch) % bm if batch else bm
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (pad, n, n))
        b2 = jnp.concatenate([b2, eye], axis=0)
        zv = jnp.zeros((pad, n), f32)
        a2 = jnp.concatenate([a2, zv], axis=0)
        c2 = jnp.concatenate([c2, zv], axis=0)
        d2 = jnp.concatenate([d2, zv], axis=0)
        e2 = jnp.concatenate([e2, jnp.zeros((pad, 1), f32)], axis=0)
    grid = b2.shape[0] // bm

    from cuda_matrix_inversion_tpu.ops.newton_schulz import SPD_SCHEDULE

    run_interpret = default_interpret(interpret)
    vec = lambda: pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_gp_ns_kernel, *SPD_SCHEDULE, not run_interpret),
        grid=(grid,),
        in_specs=[
            vec(),
            pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vec(),
            vec(),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b2.shape[0], 2), f32),
        scratch_shapes=[
            pltpu.VMEM((bm, n, n), f32),  # K
            pltpu.VMEM((bm, n, n), f32),  # X
            pltpu.VMEM((bm, n, n), f32),  # tmp
        ],
        interpret=default_interpret(interpret),
    )(a2, b2, c2, d2, e2)

    out = out[:batch].astype(orig_dtype)
    return out[:, 0][:, None, None], out[:, 1][:, None, None]
