"""Pallas batched Gauss-Jordan inversion with true partial pivoting.

Replaces the reference's custom kernel family ``src/gauss/batched_invert.cu``:
its host loop launches pivotRow/normalizeRow/transform_matrix per column
(``batched_invert.cu:84-95`` — a 3×N launch storm measured at 529 ms for
100×128, BASELINE §1) and its "pivoting" only fires when the diagonal is
*exactly* zero, scanning for the first nonzero row (``:19-35``,
SURVEY §2.4.3).  Here:

* the whole factorization is ONE kernel launch; the column loop is an
  in-kernel ``fori_loop``;
* pivoting is true max-|·| pivoting via a per-matrix ``argmax`` — each
  matrix in the batch picks its own pivot row simultaneously, with
  masked one-hot arithmetic, and no row is ever physically moved: the
  accumulated permutation is applied once at the end as a one-hot MXU
  contraction (see :func:`_gauss_jordan_kernel`);
* the augmented [A | I] system lives in VMEM TRANSPOSED (matrix rows on
  the 128 lanes); elimination is a vectorized rank-1 update over all BM
  matrices at once (the analog of ``transform_matrix``'s shared-memory
  row elimination, ``:59-82``) built entirely from native lane
  reductions/broadcasts — no lane↔sublane relayouts in the loop.

Mosaic constraint notes: dynamic indexing is legal only on the sublane
(second-to-last) dim — which is exactly why the augmented system is
stored transposed: the pivot COLUMN becomes a sublane slice and the
pivot ROW a cross-lane masked reduction, both native; there is no
data-dependent control flow anywhere, as a TPU kernel wants.
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
)


def _gauss_jordan_kernel(at_ref, out_ref, work_ref, used_ref, pidx_ref):
    """Swap-free transposed Gauss-Jordan (round-2 rewrite, 43.9 → 14.1 ms
    at 1600×128).

    The augmented system lives TRANSPOSED in VMEM — ``work[b, c, i] =
    aug[b, i, c]``, matrix rows on the 128 lanes, the 2N augmented
    columns on sublanes — the layout move that already paid 3.2× in the
    LU kernel (see :mod:`.pallas_lu`): the pivot row's 2N entries come
    from ONE cross-lane masked reduction to ``(BM, 2N, 1)`` and broadcast
    back over lanes, where the natural layout needed a sublane reduction
    plus a lane→sublane relayout per column.

    And there is no physical row swap at all: step k pivots on the
    max-|·| row among the not-yet-used rows (classical pivoting over
    unused rows — the same candidate set partial pivoting sees, reached
    without moving data), eliminates in place, and records p_k in an
    index vector; at the end the left half is the permutation P (row p_k
    = e_k), so A⁻¹ = Pᵀ·R is materialized by one one-hot MXU contraction
    per matrix — the same batched-laswp trick as the LU kernel's
    per-panel permutation apply.  ``at_ref`` arrives pre-transposed (one
    XLA swapaxes outside the kernel, off the VMEM critical path).
    """
    bm, n, _ = at_ref.shape
    w2 = 2 * n

    lanes_n = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)
    iota_nn_l = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    # work = [A | I] transposed
    work_ref[:, 0:n, :] = at_ref[:, :, :]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == iota_nn_l).astype(jnp.float32)
    work_ref[:, n:w2, :] = jnp.broadcast_to(eye, (bm, n, n))
    used_ref[:, :] = jnp.zeros((bm, n), jnp.float32)
    pidx_ref[:, :] = jnp.zeros((bm, n), jnp.float32)

    def body(k, _):
        # column k of the A-half: dynamic SUBLANE slice (legal), not a
        # one-hot lane reduction
        col = work_ref[:, pl.ds(k, 1), :][:, 0, :]           # (BM, N)
        # per-matrix pivot row: argmax |col| over unused rows
        cand = jnp.where(used_ref[:, :] == 0.0, jnp.abs(col), -1.0)
        p = jnp.argmax(cand, axis=1).astype(jnp.int32)       # (BM,)
        pmask = (lanes_n == p[:, None]).astype(jnp.float32)
        used_ref[:, :] = used_ref[:, :] + pmask
        kmask = (lanes_n == k).astype(jnp.float32)
        # record p_k (float via masked iota sum: Mosaic rejects sitofp of
        # the argmax vector)
        p_f = jnp.sum(lanes_n.astype(jnp.float32) * pmask, axis=1,
                      keepdims=True)                         # (BM, 1)
        pidx_ref[:, :] = pidx_ref[:, :] + kmask * (p_f - pidx_ref[:, :])

        pivot = jnp.sum(col * pmask, axis=1, keepdims=True)  # (BM, 1) = A[p, k]
        rowp = jnp.sum(work_ref[:, :, :] * pmask[:, None, :], axis=2,
                       keepdims=True)                        # (BM, 2N, 1)
        rownorm = rowp / pivot[:, :, None]
        factor = col * (1.0 - pmask)                         # no self-elim
        p3 = pmask[:, None, :]
        # eliminate all other rows and write the normalized pivot row, in
        # one fused read-modify-write pass
        work_ref[:, :, :] = ((work_ref[:, :, :]
                              - rownorm * factor[:, None, :]) * (1.0 - p3)
                             + rownorm * p3)
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    # A⁻¹[k, c] = R[p_k, c]: one-hot contraction over the lane (row) dim,
    # exact 0/1 arithmetic under HIGHEST precision
    for b in range(bm):
        oht = jnp.maximum(0.0, 1.0 - jnp.abs(
            pidx_ref[b][:, None] - iota_nn_l.astype(jnp.float32)))  # (N, N)
        out_ref[b, :, :] = _mm(oht, work_ref[b, n:w2, :],
                               contract=((1,), (1,)))


def _blocked_gj_kernel(pw: int, a_ref, out_ref, work_ref, pcopy_ref,
                       tri_ref, tinv_ref, tnat_ref, pidx_ref):
    """Blocked Gauss-Jordan with partial pivoting — LU-style panels.

    Round-2 rewrite (VERDICT r1 weak #3): the old update
    ``work' = (I + C·S)·work_swapped`` with an *explicit* pivot-block
    inverse ``C = (E − B)·B_piv⁻¹`` amplified rounding to ~1e-4 at n=128,
    and its statically-unrolled per-column pivot search compiled for
    minutes.  Now each panel reuses the machinery that already works in
    :mod:`.pallas_lu`:

    1. ``_panel_factor_body`` (a ``fori_loop``, not an unroll) pivots and
       LU-factors the panel copy, recording the permutation as an index
       vector; the permutation is applied to the augmented work once per
       panel as a one-hot MXU matmul (batched laswp).
    2. The pivot rows are *solved*, never multiplied by a general
       inverse: R = U11⁻¹ (L11⁻¹ W_piv) via the stacked triangular
       substitution inverses (both computed in one vectorized pass over a
       (2BM, pw, pw) stack — ``pallas_lu``'s seeding trick).
    3. Full-height elimination is one rank-pw MXU update:
       ``work −= B_offpanel · R``; the pivot rows become R.
    """
    bm, n, _ = a_ref.shape
    w2 = 2 * n
    np_ = n // pw

    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (row_i == col_i).astype(jnp.float32)
    row_pw = jax.lax.broadcasted_iota(jnp.int32, (pw, pw), 0)
    col_pw = jax.lax.broadcasted_iota(jnp.int32, (pw, pw), 1)
    eye_pw = (row_pw == col_pw).astype(jnp.float32)
    row_f2 = row_i.astype(jnp.float32)
    subrow_n1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    from cuda_matrix_inversion_tpu.ops.pallas_cholesky import (
        _triangular_inverse_body,
    )
    from cuda_matrix_inversion_tpu.ops.pallas_lu import _panel_factor_body

    work_ref[:, :, 0:n] = a_ref[:, :, :]
    work_ref[:, :, n:w2] = jnp.broadcast_to(eye, (bm, n, n))

    for p in range(np_):
        k0 = p * pw
        k1 = k0 + pw
        # -- 1. pivot + LU-factor the panel copy (fori_loop inside) --
        pcopy_ref[:, :, :] = work_ref[:, :, k0:k1]
        _panel_factor_body(pw, k0, n, pcopy_ref, pidx_ref)

        # stacked triangular inverses of the panel diag block:
        # slots [0:BM] → L11⁻¹; slots [BM:2BM] → (U11⁻¹)ᵀ
        blk = pcopy_ref[:, k0:k1, :]  # (BM, pw, pw) compact LU of B_piv
        for b in range(bm):
            tri_ref[b, :, :] = blk[b, :, :].T
        tri_ref[0:bm, :, :] = (jnp.where(row_pw < col_pw, tri_ref[0:bm, :, :],
                                         0.0)
                               + jnp.broadcast_to(eye_pw, (bm, pw, pw)))
        tri_ref[bm:2 * bm, :, :] = jnp.where(row_pw <= col_pw, blk, 0.0)
        _triangular_inverse_body(pw, tri_ref, tinv_ref, tnat_ref)

        # apply the panel's row permutation to the augmented work as ONE
        # one-hot matmul per matrix (exact 0/1 arithmetic under HIGHEST)
        pidxv = pidx_ref[:, :]
        for b in range(bm):
            oht = jnp.maximum(0.0, 1.0 - jnp.abs(row_f2 - pidxv[b][None, :]))
            work_ref[b, :, :] = _mm(oht, work_ref[b, :, :],
                                    contract=((0,), (0,)))

        # post-swap panel B for the elimination (whole-buffer copy:
        # lane-offset slices fed straight to the MXU CHECK-crash Mosaic)
        pcopy_ref[:, :, :] = work_ref[:, :, k0:k1]

        # -- 2+3. R = U11⁻¹ L11⁻¹ W_piv; work −= B_off · R; rows ← R --
        offmask = ((subrow_n1 < k0) | (subrow_n1 >= k1)).astype(jnp.float32)
        for b in range(bm):
            w_piv = work_ref[b, k0:k1, :]               # (pw, 2N) sublanes
            r = _mm(tinv_ref[b, :, :], w_piv)           # L11⁻¹ W_piv
            r = _mm(tinv_ref[bm + b, :, :], r,
                    contract=((0,), (0,)))              # U11⁻¹ (…)
            b_off = pcopy_ref[b, :, :] * offmask        # zero the pivot rows
            work_ref[b, :, :] = work_ref[b, :, :] - _mm(b_off, r)
            work_ref[b, k0:k1, :] = r

    out_ref[:, :, :] = work_ref[:, :, n:w2]


def _mm(lhs, rhs, contract=((1,), (0,))):
    return jax.lax.dot_general(
        lhs, rhs,
        dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def inverse_gauss_jordan(a: jnp.ndarray, block: int | None = None,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Batched general-matrix inversion with partial pivoting, one launch.

    Drop-in for the reference's ``inverse_gauss_batched_gpu``
    (``src/gauss/batched_invert.cu:99-177``), upgraded to magnitude
    pivoting per BASELINE.json.  Works on any nonsingular batch, not just
    SPD.  Singular matrices produce non-finite outputs (the reference's
    empty else-branch, ``batched_invert.cu:29-31``, silently produced
    garbage instead).
    """
    if a.dtype == jnp.float64:
        # keep f64 exact: XLA LU path instead of fp32 VMEM round-trip
        from cuda_matrix_inversion_tpu.ops import xla as _xla

        return _xla.inverse_lu(a)
    if a.shape[-1] > 192:
        # the augmented (n, 2n) block exceeds VMEM sooner than Cholesky —
        # big matrices route to the XLA LU factorization
        from cuda_matrix_inversion_tpu.ops import xla as _xla

        return _xla.inverse_lu(a)
    orig_dtype = a.dtype
    a = a.astype(jnp.float32)
    a, n_orig = pad_matrix_dim(a)  # tile-align n (identity block pad)
    n = a.shape[-1]

    if block is not None:
        bm = block
    else:
        # the pivot loop is sequential-latency-bound, so the widest batch
        # block VMEM allows wins (swap-free transposed kernel: 16/24/32/48
        # measured 15.9/15.0/14.1/14.4 ms at 1600×128) — budget the
        # (BM, 2N, N) work buffer + out + pipelined in blocks
        from cuda_matrix_inversion_tpu.ops.pallas_common import (
            padded_matrix_bytes,
        )

        bm = (6 * 2**20) // (2 * padded_matrix_bytes(n))
        bm = max(8, min(32, bm - bm % 8))
    a_p, orig = pad_batch(a, bm)
    grid = a_p.shape[0] // bm
    # pre-transpose OUTSIDE the kernel (XLA streams it at HBM speed; the
    # kernel wants rows on lanes — see _gauss_jordan_kernel)
    at = jnp.swapaxes(a_p, -1, -2)

    out = pl.pallas_call(
        _gauss_jordan_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a_p.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, 2 * n, n), jnp.float32),   # work (transposed)
            pltpu.VMEM((bm, n), jnp.float32),          # used-row mask
            pltpu.VMEM((bm, n), jnp.float32),          # pivot index p_k
        ],
        interpret=default_interpret(interpret),
    )(at)
    return out[:orig, :n_orig, :n_orig].astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def inverse_gauss_jordan_blocked(a: jnp.ndarray, block: int | None = None,
                                 interpret: bool | None = None) -> jnp.ndarray:
    """Panel-blocked Gauss-Jordan with LU-style panels (see
    :func:`_blocked_gj_kernel` — round-2 rewrite: fori-loop pivot search,
    one-hot batched row permutation, triangular-substitution pivot-row
    solve instead of an explicit pivot-block inverse).

    Measured on chip (r2, 100×128): gate 1.05e-06 (was ~1e-4 — the
    explicit pivot-block inverse was the culprit), compile ~5 s (was
    minutes), 5.9 ms vs the rank-1 kernel's 2.9 ms (0.96 ms after the
    swap-free transposed rewrite of the rank-1 kernel).  GJ touches the full
    augmented row span every panel — 2× LU's update work by construction
    — so the rank-1 kernel stays the speed pick for pivoted one-launch
    inversion; this variant is the gate-clean MXU-blocked formulation.
    """
    if a.dtype == jnp.float64 or a.shape[-1] > 192:
        # same routing rules as the rank-1 kernel: f64 exactness and the
        # augmented-system VMEM ceiling both go to XLA LU
        from cuda_matrix_inversion_tpu.ops import xla as _xla

        return _xla.inverse_lu(a)
    batch = a.shape[0]
    orig_dtype = a.dtype
    a = a.astype(jnp.float32)
    a, n_orig = pad_matrix_dim(a)
    n = a.shape[-1]
    pw = None
    for cand in (32, 16, 8):
        if n % cand == 0 and n > cand:
            pw = cand
            break
    if pw is None:
        return inverse_gauss_jordan(a[:, :n_orig, :n_orig], block=block,
                                    interpret=interpret).astype(orig_dtype)

    bm = block_batch(batch, n, buffers=4) if block is None else block
    a_p, orig = pad_batch(a, bm)
    grid = a_p.shape[0] // bm

    out = pl.pallas_call(
        functools.partial(_blocked_gj_kernel, pw),
        grid=(grid,),
        in_specs=[pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a_p.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, n, 2 * n), jnp.float32),     # work [A | I]
            pltpu.VMEM((bm, n, pw), jnp.float32),        # panel copy
            pltpu.VMEM((2 * bm, pw, pw), jnp.float32),   # tri blocks (L+U)
            pltpu.VMEM((2 * bm, pw, pw), jnp.float32),   # tri inverses
            pltpu.VMEM((2 * bm, pw, pw), jnp.float32),   # tri natural-layout
            pltpu.VMEM((bm, n), jnp.float32),            # panel perm idx
        ],
        interpret=default_interpret(interpret),
    )(a_p)
    return out[:orig, :n_orig, :n_orig].astype(orig_dtype)
