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
        # cannot materialize 3-D bool vectors).  Only row p needs the
        # blend — row k is overwritten with the normalized pivot row at
        # the end of the step, so its half of the swap is skipped
        # (saves a full-width pass + a mask relayout per step). ----
        kmask = (lanes_n == k).astype(jnp.float32)  # (BM, N)
        is_p_only = (pmask * (1.0 - kmask))[:, :, None]
        work = work_ref[:, :, :]
        swapped = work + is_p_only * (rowk[:, None, :] - work)

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


def _gj_small_inverse_body(n: int, work2_ref):
    """Unblocked GJ with pivoting on a (BM, n, 2n) ref: [M | I] → [I | M⁻¹].

    The fori-loop core of :func:`_gauss_jordan_kernel`, reused by the
    blocked kernel to invert pivot blocks.
    """
    bm = work2_ref.shape[0]
    w2 = 2 * n
    lanes_aug = jax.lax.broadcasted_iota(jnp.int32, (bm, w2), 1)
    lanes_n = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)

    def body(k, _):
        colmask = (lanes_n == k).astype(jnp.float32)
        col = jnp.sum(work2_ref[:, :, 0:n] * colmask[:, None, :], axis=2)
        cand = jnp.where(lanes_n >= k, jnp.abs(col), -1.0)
        p = jnp.argmax(cand, axis=1).astype(jnp.int32)
        pmask = (lanes_n == p[:, None]).astype(jnp.float32)
        rowk = work2_ref[:, pl.ds(k, 1), :][:, 0, :]
        rowp = jnp.sum(work2_ref[:, :, :] * pmask[:, :, None], axis=1)
        kmask = (lanes_n == k).astype(jnp.float32)
        # row k's half of the swap is skipped — it is overwritten with the
        # normalized pivot row below (see the main kernel's comment)
        is_p_only = (pmask * (1.0 - kmask))[:, :, None]
        work = work2_ref[:, :, :]
        swapped = work + is_p_only * (rowk[:, None, :] - work)
        pivot = jnp.sum(jnp.where(lanes_aug == k, rowp, 0.0), axis=1,
                        keepdims=True)
        rownorm = rowp / pivot
        ek = jnp.sum(jnp.where(lanes_n == k, col, 0.0), axis=1, keepdims=True)
        ep = jnp.sum(jnp.where(lanes_n == p[:, None], col, 0.0), axis=1,
                     keepdims=True)
        col_sw = jnp.where(lanes_n == k, ep,
                           jnp.where(lanes_n == p[:, None], ek, col))
        factor = jnp.where(lanes_n == k, 0.0, col_sw)
        work2_ref[:, :, :] = swapped - factor[:, :, None] * rownorm[:, None, :]
        work2_ref[:, pl.ds(k, 1), :] = rownorm[:, None, :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _blocked_gj_kernel(pw: int, a_ref, out_ref, work_ref, pcopy_ref,
                       small_ref, sinv_ref):
    """Blocked Gauss-Jordan with partial pivoting.

    Per panel of ``pw`` columns the elimination of the full-matrix work
    is exactly two MXU matmuls per matrix instead of ``pw`` rank-1
    passes:

        work' = (I + C·S) · work_swapped,   C = (E − B) · B_piv⁻¹

    where B = the panel columns after the panel's pivot row swaps, S
    selects the pivot rows, and E is the target unit-column block.  The
    identity holds because every Gauss-Jordan elementary operation adds
    multiples of pivot rows, so their composition is I + C·S for some C,
    and C is pinned down by requiring the panel to become E.  Pivots are
    found LU-style on a cheap (BM, N, pw) panel copy; row swaps are
    applied physically to both the copy and the full work (full-matrix
    VMEM blend passes cost ~40 ns — the expensive thing to avoid is the
    per-column rank-1 outer product, not the swaps).
    """
    bm, n, _ = a_ref.shape
    w2 = 2 * n
    np_ = n // pw

    lanes_n = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (row_i == col_i).astype(jnp.float32)
    eye_pw = (jax.lax.broadcasted_iota(jnp.int32, (pw, pw), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (pw, pw), 1)).astype(jnp.float32)

    work_ref[:, :, 0:n] = a_ref[:, :, :]
    work_ref[:, :, n:w2] = jnp.broadcast_to(eye, (bm, n, n))

    for p in range(np_):
        k0 = p * pw
        # -- pivot search on a panel copy (LU-style: eliminate below only),
        #    swaps applied physically to copy AND full work --
        pcopy_ref[:, :, :] = work_ref[:, :, k0:k0 + pw]
        for j in range(pw):
            g = k0 + j
            gcol = pcopy_ref[:, :, j]  # (BM, N) over rows
            cand = jnp.where(lanes_n >= g, jnp.abs(gcol), -1.0)
            piv = jnp.argmax(cand, axis=1).astype(jnp.int32)
            pmask = (lanes_n == piv[:, None]).astype(jnp.float32)
            gmask = (lanes_n == g).astype(jnp.float32)
            is_g = gmask[:, :, None]
            is_p = (pmask * (1.0 - gmask))[:, :, None]
            # swap in the panel copy
            rowg = pcopy_ref[:, g, :]  # (BM, pw), static index
            rowp = jnp.sum(pcopy_ref[:, :, :] * pmask[:, :, None], axis=1)
            pc = pcopy_ref[:, :, :]
            pcopy_ref[:, :, :] = (pc + is_g * (rowp[:, None, :] - pc)
                                  + is_p * (rowg[:, None, :] - pc))
            # same swap in the full work
            wrowg = work_ref[:, g, :]  # (BM, 2N)
            wrowp = jnp.sum(work_ref[:, :, :] * pmask[:, :, None], axis=1)
            w = work_ref[:, :, :]
            work_ref[:, :, :] = (w + is_g * (wrowp[:, None, :] - w)
                                 + is_p * (wrowg[:, None, :] - w))
            # eliminate below g in the panel copy
            gcol2 = pcopy_ref[:, :, j]
            pivval = jnp.sum(jnp.where(lanes_n == g, gcol2, 0.0), axis=1,
                             keepdims=True)
            factor = jnp.where(lanes_n > g, gcol2 / pivval, 0.0)
            prow = pcopy_ref[:, g, :]  # (BM, pw)
            pcopy_ref[:, :, :] = pcopy_ref[:, :, :] - factor[:, :, None] * prow[:, None, :]

        # -- invert the pivot block B_piv (small GJ with pivoting) --
        small_ref[:, :, 0:pw] = work_ref[:, k0:k0 + pw, k0:k0 + pw]
        small_ref[:, :, pw:2 * pw] = jnp.broadcast_to(eye_pw, (bm, pw, pw))
        _gj_small_inverse_body(pw, small_ref)
        # whole-buffer copies: feeding lane-offset slices straight into
        # the MXU CHECK-crashes Mosaic's lowering emitter
        sinv_ref[:, :, :] = small_ref[:, :, pw:2 * pw]
        pcopy_ref[:, :, :] = work_ref[:, :, k0:k0 + pw]  # B (post-swap panel)

        # -- C = (E − B)·B_piv⁻¹ ; work += C · (pivot rows of work) --
        # (direct target-shape iota: lane-slicing a big iota value as a
        # matmul operand CHECK-crashes Mosaic's lowering emitter)
        e_blk = (jax.lax.broadcasted_iota(jnp.int32, (n, pw), 0)
                 == (jax.lax.broadcasted_iota(jnp.int32, (n, pw), 1) + k0)
                 ).astype(jnp.float32)
        for b in range(bm):
            c_mat = _mm(e_blk - pcopy_ref[b, :, :], sinv_ref[b, :, :])
            s_rows = work_ref[b, k0:k0 + pw, :]  # (pw, 2N) sublane slice
            work_ref[b, :, :] = work_ref[b, :, :] + _mm(c_mat, s_rows)

    out_ref[:, :, :] = work_ref[:, :, n:w2]


def _mm(lhs, rhs):
    return jax.lax.dot_general(
        lhs, rhs,
        dimension_numbers=((((1,), (0,))), ((), ())),
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
    batch = a.shape[0]
    orig_dtype = a.dtype
    a = a.astype(jnp.float32)
    a, n_orig = pad_matrix_dim(a)  # tile-align n (identity block pad)
    n = a.shape[-1]

    if block is not None:
        bm = block
    elif n <= 128:
        # the pivot loop is sequential-latency-bound, so wider batch
        # blocks amortize it: 16 measured 12-27% faster than 8 across
        # 100-1600 × 32-128 (24/32 regress — the per-column full-width
        # passes become bandwidth-bound first)
        bm = 16
    else:
        # augmented (n, 2n) blocks: n > 128 exceeds VMEM at bm 16
        bm = block_batch(batch, n, buffers=4)
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


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def inverse_gauss_jordan_blocked(a: jnp.ndarray, block: int | None = None,
                                 interpret: bool | None = None) -> jnp.ndarray:
    """Panel-blocked Gauss-Jordan (experimental; see _blocked_gj_kernel).

    Status after on-hardware evaluation: correct and MXU-heavy, but the
    explicit B_piv⁻¹ in the panel update amplifies rounding to ~1e-4 at
    n=128 (right at the accuracy gate; the rank-1 kernel sits at ~2e-6),
    and the statically-unrolled pivot search compiles slowly.  Kept as a
    registered variant (``gauss_blocked_pallas``) rather than the
    default — the honest conclusion is that for n ≤ 128 the fastest
    *gate-passing* general-matrix path is Newton-Schulz, with the rank-1
    GJ as the pivoting reference.
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
            pltpu.VMEM((bm, n, 2 * n), jnp.float32),    # work [A | I]
            pltpu.VMEM((bm, n, pw), jnp.float32),       # panel pivot copy
            pltpu.VMEM((bm, pw, 2 * pw), jnp.float32),  # small GJ [Bpiv | I]
            pltpu.VMEM((bm, pw, pw), jnp.float32),      # Bpiv⁻¹ copy
        ],
        interpret=default_interpret(interpret),
    )(a_p)
    return out[:orig, :n_orig, :n_orig].astype(orig_dtype)
