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

    def body(kk, _):
        # TWO pivot steps per iteration, ONE read-modify-write of the big
        # augmented buffer (r3): at 1600×128 / BM=32 this kernel is
        # VMEM-bandwidth-bound — work is (BM, 2N, N) ≈ 4 MB and the
        # single-column body made 3 full passes per column (pivot-row
        # reduction, update read, update write).  Column k+1's pivot
        # column and pivot row are DERIVED from column k's rank-1 step in
        # (BM, N)/(BM, 2N, 1)-sized register math, so two eliminations
        # cost 4 passes instead of 6.  n is tile-padded, hence even.
        k = 2 * kk
        # ---- step 1: column k (classical swap-free pivoting) ----
        col1 = work_ref[:, pl.ds(k, 1), :][:, 0, :]          # (BM, N)
        cand1 = jnp.where(used_ref[:, :] == 0.0, jnp.abs(col1), -1.0)
        p1 = jnp.argmax(cand1, axis=1).astype(jnp.int32)
        pm1 = (lanes_n == p1[:, None]).astype(jnp.float32)
        used_ref[:, :] = used_ref[:, :] + pm1
        km1 = (lanes_n == k).astype(jnp.float32)
        # record p_k (float via masked iota sum: Mosaic rejects sitofp of
        # the argmax vector)
        p1f = jnp.sum(lanes_n.astype(jnp.float32) * pm1, axis=1,
                      keepdims=True)                         # (BM, 1)
        pidx_ref[:, :] = pidx_ref[:, :] + km1 * (p1f - pidx_ref[:, :])
        piv1 = jnp.sum(col1 * pm1, axis=1, keepdims=True)    # (BM, 1)
        rowp1 = jnp.sum(work_ref[:, :, :] * pm1[:, None, :], axis=2,
                        keepdims=True)                       # (BM, 2N, 1)
        rn1 = rowp1 / piv1[:, :, None]
        f1 = col1 * (1.0 - pm1)                              # no self-elim

        # ---- step 2: column k+1, derived without storing step 1 ----
        col2_raw = work_ref[:, pl.ds(k + 1, 1), :][:, 0, :]
        a1 = jnp.sum(col2_raw * pm1, axis=1, keepdims=True)  # work[p1, k+1]
        rn1k1 = a1 / piv1                                    # normalized
        col2 = (col2_raw - rn1k1 * f1) * (1.0 - pm1) + rn1k1 * pm1
        cand2 = jnp.where(used_ref[:, :] == 0.0, jnp.abs(col2), -1.0)
        p2 = jnp.argmax(cand2, axis=1).astype(jnp.int32)
        pm2 = (lanes_n == p2[:, None]).astype(jnp.float32)
        used_ref[:, :] = used_ref[:, :] + pm2
        km2 = (lanes_n == (k + 1)).astype(jnp.float32)
        p2f = jnp.sum(lanes_n.astype(jnp.float32) * pm2, axis=1,
                      keepdims=True)
        pidx_ref[:, :] = pidx_ref[:, :] + km2 * (p2f - pidx_ref[:, :])
        piv2 = jnp.sum(col2 * pm2, axis=1, keepdims=True)
        # row p2 after step 1: p2 ≠ p1, so only the rank-1 term applies
        rowp2_raw = jnp.sum(work_ref[:, :, :] * pm2[:, None, :], axis=2,
                            keepdims=True)
        s2 = jnp.sum(f1 * pm2, axis=1, keepdims=True)        # f1 at lane p2
        rowp2 = rowp2_raw - rn1 * s2[:, :, None]
        rn2 = rowp2 / piv2[:, :, None]
        f2 = col2 * (1.0 - pm2)

        # ---- ONE fused read-modify-write applying both rank-1 steps ----
        p1_3 = pm1[:, None, :]
        p2_3 = pm2[:, None, :]
        w = work_ref[:, :, :]
        w1 = (w - rn1 * f1[:, None, :]) * (1.0 - p1_3) + rn1 * p1_3
        work_ref[:, :, :] = ((w1 - rn2 * f2[:, None, :]) * (1.0 - p2_3)
                             + rn2 * p2_3)
        return 0

    jax.lax.fori_loop(0, n // 2, body, 0)

    # A⁻¹[k, c] = R[p_k, c]: one-hot contraction over the lane (row) dim,
    # exact 0/1 arithmetic under HIGHEST precision
    for b in range(bm):
        oht = jnp.maximum(0.0, 1.0 - jnp.abs(
            pidx_ref[b][:, None] - iota_nn_l.astype(jnp.float32)))  # (N, N)
        out_ref[b, :, :] = _mm(oht, work_ref[b, n:w2, :],
                               contract=((1,), (1,)))


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
