"""Pallas batched Gauss-Jordan inversion with true partial pivoting.

Replaces the reference's custom kernel family ``src/gauss/batched_invert.cu``:
its host loop launches pivotRow/normalizeRow/transform_matrix per column
(``batched_invert.cu:84-95`` — a 3×N launch storm measured at 529 ms for
100×128, BASELINE §1) and its "pivoting" only fires when the diagonal is
*exactly* zero, scanning for the first nonzero row (``:19-35``,
SURVEY §2.4.3).  Here:

* the whole factorization is ONE kernel launch; the column loop is an
  in-kernel ``fori_loop``;
* pivoting is true max-|·| partial pivoting via a per-matrix ``argmax``
  — each matrix in the batch picks its own pivot row simultaneously,
  with masked one-hot arithmetic instead of divergent row swaps;
* the augmented [A | I] system lives in VMEM; elimination is a
  vectorized rank-1 update over all BM matrices at once (the analog of
  ``transform_matrix``'s shared-memory row elimination, ``:59-82``).

Mosaic constraint notes: dynamic indexing is legal only on the sublane
(second-to-last) dim, so the pivot column is extracted by a one-hot
lane reduction and per-matrix pivot rows by one-hot sublane reductions —
there is no data-dependent control flow anywhere, as a TPU kernel wants.
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


def _gauss_jordan_kernel(a_ref, out_ref, work_ref):
    bm, n, _ = a_ref.shape
    w2 = 2 * n

    lanes_aug = jax.lax.broadcasted_iota(jnp.int32, (bm, w2), 1)
    lanes_n = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)

    # work = [A | I]
    work_ref[:, :, 0:n] = a_ref[:, :, :]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(jnp.float32)
    work_ref[:, :, n:w2] = jnp.broadcast_to(eye, (bm, n, n))

    def body(k, _):
        # ---- pivot column k of the A-half: one-hot lane reduction
        # (f32 multiply, not where: Mosaic can't make 3-D bool vectors) ----
        colmask = (lanes_n == k).astype(jnp.float32)  # (BM, N)
        col = jnp.sum(work_ref[:, :, 0:n] * colmask[:, None, :], axis=2)  # (BM, N)
        # ---- per-matrix pivot row: argmax |col| over rows >= k ----
        cand = jnp.where(lanes_n >= k, jnp.abs(col), -1.0)
        p = jnp.argmax(cand, axis=1).astype(jnp.int32)  # (BM,)
        pmask = (lanes_n == p[:, None]).astype(jnp.float32)  # (BM, N)

        # ---- gather rows k and p ----
        rowk = work_ref[:, pl.ds(k, 1), :][:, 0, :]  # (BM, 2N)
        rowp = jnp.sum(work_ref[:, :, :] * pmask[:, :, None], axis=1)  # (BM, 2N)

        # ---- swap rows k <-> p (arithmetic blend on f32 masks: Mosaic
        # cannot materialize 3-D bool vectors; note p == k must blend to
        # the identity, hence the disjoint is_p_only mask) ----
        kmask = (lanes_n == k).astype(jnp.float32)  # (BM, N)
        is_k = kmask[:, :, None]
        is_p_only = (pmask * (1.0 - kmask))[:, :, None]
        work = work_ref[:, :, :]
        swapped = (work
                   + is_k * (rowp[:, None, :] - work)
                   + is_p_only * (rowk[:, None, :] - work))

        # ---- normalize pivot row, eliminate ----
        pivot = jnp.sum(jnp.where(lanes_aug == k, rowp, 0.0), axis=1,
                        keepdims=True)  # (BM, 1) = A[p, k]
        rownorm = rowp / pivot  # (BM, 2N)

        # pivot column after the swap: elements k and p exchanged
        ek = jnp.sum(jnp.where(lanes_n == k, col, 0.0), axis=1, keepdims=True)
        ep = jnp.sum(jnp.where(lanes_n == p[:, None], col, 0.0), axis=1,
                     keepdims=True)
        col_sw = jnp.where(lanes_n == k, ep,
                           jnp.where(lanes_n == p[:, None], ek, col))
        factor = jnp.where(lanes_n == k, 0.0, col_sw)  # row k: no self-elim

        work_ref[:, :, :] = swapped - factor[:, :, None] * rownorm[:, None, :]
        work_ref[:, pl.ds(k, 1), :] = rownorm[:, None, :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    out_ref[:, :, :] = work_ref[:, :, n:w2]


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
    batch = a.shape[0]
    orig_dtype = a.dtype
    a = a.astype(jnp.float32)
    a, n_orig = pad_matrix_dim(a)  # tile-align n (identity block pad)
    n = a.shape[-1]
    # the augmented system doubles the VMEM footprint vs Cholesky
    bm = block_batch(batch, n, buffers=4) if block is None else block
    a_p, orig = pad_batch(a, bm)
    grid = a_p.shape[0] // bm

    out = pl.pallas_call(
        _gauss_jordan_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a_p.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, n, 2 * n), jnp.float32)],
        interpret=default_interpret(interpret),
    )(a_p)
    return out[:orig, :n_orig, :n_orig].astype(orig_dtype)
