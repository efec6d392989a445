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


def _gauss_jordan_kernel(at_ref, out_ref, work_ref, used_ref, pidx_ref,
                         *, steps: int = 4, chunk: int | None = None):
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

    ``steps`` pivot steps run per loop iteration with ONE fused
    read-modify-write of the big augmented buffer (r3): at 1600×128 /
    BM=32 this kernel is VMEM-bandwidth-bound — work is (BM, 2N, N) ≈
    4 MB and the single-column body made 3 full passes per column
    (pivot-row reduction, update read, update write).  The pivot
    COLUMNS, masks, and pivots for all ``steps`` columns come first from
    (BM, N)-sized register math (phase A); the buffer sweep (phase B)
    then runs CHUNKED over sublane blocks of ``chunk`` rows — the pivot
    -row reduction and the rank-1 update are both row-local, so each
    block applies the steps sequentially in a small stack temp (which
    also makes the cross-step pivot-row corrections implicit: each
    reduction sees the already-updated block).  Big-buffer traffic is
    ~2/steps passes per column; the chunking exists because the UNCHUNKED
    steps=2 body's full-buffer stack temporaries blew the 16 MB scoped
    -VMEM limit on a real v5e (20.84 MB at 1600×128/BM=32, r3 chip A/B)
    — (BM, chunk, N) temps keep the stack bounded regardless of steps.
    Chip A/B at 1600×128 (r3, chunked body): steps=4 13.67 ms,
    steps=2 14.09, steps=8 14.54; chunk 32 and 64 tie, 16 costs 0.6 ms
    — hence the defaults steps=4 and chunk = the largest of {32, 16}
    dividing 2n (16 whenever n is an odd multiple of 8).
    n is tile-padded, so any power-of-two ``steps`` divides it.
    """
    bm, n, _ = at_ref.shape
    w2 = 2 * n
    if chunk is None:
        # largest of {32, 16} dividing the augmented sublane dim (w2 = 2n
        # with n tile-padded to a multiple of 8, so 16 always divides)
        chunk = 32 if w2 % 32 == 0 else 16

    lanes_n = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)
    lanes_f = lanes_n.astype(jnp.float32)
    iota_nn_l = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    # work = [A | I] transposed
    work_ref[:, 0:n, :] = at_ref[:, :, :]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == iota_nn_l).astype(jnp.float32)
    work_ref[:, n:w2, :] = jnp.broadcast_to(eye, (bm, n, n))
    used_ref[:, :] = jnp.zeros((bm, n), jnp.float32)
    pidx_ref[:, :] = jnp.zeros((bm, n), jnp.float32)

    def body(kk, _):
        k = steps * kk
        pms, fs, pivs = [], [], []
        # ---- phase A: pivot columns/masks/pivots, (BM, N) math only ----
        for t in range(steps):  # unrolled at trace time
            # column k+t, with steps < t applied in register math
            c = work_ref[:, pl.ds(k + t, 1), :][:, 0, :]     # (BM, N)
            for i in range(t):
                a = jnp.sum(c * pms[i], axis=1, keepdims=True) / pivs[i]
                c = (c - a * fs[i]) * (1.0 - pms[i]) + a * pms[i]
            cand = jnp.where(used_ref[:, :] == 0.0, jnp.abs(c), -1.0)
            p = jnp.argmax(cand, axis=1).astype(jnp.int32)
            pm = (lanes_n == p[:, None]).astype(jnp.float32)
            used_ref[:, :] = used_ref[:, :] + pm
            km = (lanes_n == (k + t)).astype(jnp.float32)
            # record p_{k+t} (float via masked iota sum: Mosaic rejects
            # sitofp of the argmax vector)
            pf = jnp.sum(lanes_f * pm, axis=1, keepdims=True)  # (BM, 1)
            pidx_ref[:, :] = pidx_ref[:, :] + km * (pf - pidx_ref[:, :])
            piv = jnp.sum(c * pm, axis=1, keepdims=True)       # (BM, 1)
            f = c * (1.0 - pm)                                 # no self-elim
            pms.append(pm)
            fs.append(f)
            pivs.append(piv)

        # ---- phase B: chunked sweep, all steps per block in one temp ----
        for j in range(0, w2, chunk):
            w = work_ref[:, pl.ds(j, chunk), :]              # (BM, C, N)
            for pm, f, piv in zip(pms, fs, pivs):
                pm3 = pm[:, None, :]
                # pivot row entries for THESE C rows (row-local masked
                # lane reduction of the already-updated block)
                rn = jnp.sum(w * pm3, axis=2,
                             keepdims=True) / piv[:, :, None]  # (BM, C, 1)
                w = (w - rn * f[:, None, :]) * (1.0 - pm3) + rn * pm3
            work_ref[:, pl.ds(j, chunk), :] = w
        return 0

    jax.lax.fori_loop(0, n // steps, body, 0)

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


@functools.partial(jax.jit,
                   static_argnames=("block", "interpret", "steps", "chunk",
                                    "polish"))
def inverse_gauss_jordan(a: jnp.ndarray, block: int | None = None,
                         interpret: bool | None = None,
                         steps: int = 4,
                         chunk: int | None = None,
                         polish: int = 1) -> jnp.ndarray:
    """Batched general-matrix inversion with partial pivoting, one launch.

    Drop-in for the reference's ``inverse_gauss_batched_gpu``
    (``src/gauss/batched_invert.cu:99-177``), upgraded to magnitude
    pivoting per BASELINE.json.  Works on any nonsingular batch, not just
    SPD.  Singular matrices produce non-finite outputs (the reference's
    empty else-branch, ``batched_invert.cu:29-31``, silently produced
    garbage instead).

    ``polish`` Newton residual steps (X ← X + X(I − AX), HIGHEST
    precision) follow the kernel — the same recipe as the large-n XLA
    route (:func:`..xla.inverse_lu`).  Gauss-Jordan's forward residual
    is κ(A)-proportional where LU's triangular solves are backward
    -stable: on general random 100×128 fixtures (κ ≈ 512, r3 chip
    ledger) the raw kernel sits at 6.3e-4 — past the 1e-4 gate the SPD
    fixtures never probed, and independent of ``steps``, so it is the
    formulation, not the fused sweep.  One squaring step lands ~1e-6
    for ~1 ms on the 1600×128 headline shape.
    """
    if a.dtype == jnp.float64 or a.shape[-1] > 192:
        # f64 must stay exact (no fp32 VMEM round-trip), and the
        # augmented (n, 2n) block exceeds VMEM sooner than Cholesky —
        # both route to the XLA LU factorization.  That route has its
        # own fixed schedule (one unconditional polish, no fused steps),
        # so honoring non-default kernel knobs is impossible: fail
        # loudly rather than return a result that ignores them (the
        # `_no_factor_only` contract in pallas_lu — a silent mismatch
        # would corrupt e.g. a polish=0 raw-kernel A/B).
        if (steps, chunk, polish) != (4, None, 1):
            route = ("the f64 XLA route" if a.dtype == jnp.float64
                     else "n > 192 (XLA route)")
            raise ValueError(
                f"steps/chunk/polish are Pallas-kernel knobs and cannot be "
                f"honored on {route}; call with the defaults there")
        from cuda_matrix_inversion_tpu.ops import xla as _xla

        return _xla.inverse_lu(a)
    orig_dtype = a.dtype
    a = a.astype(jnp.float32)
    a_unpadded = a
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

    if steps not in (1, 2, 4, 8) or n % steps:
        raise ValueError(f"steps={steps} must be a power of two dividing "
                         f"the padded dim {n}")
    if chunk is not None and (2 * n) % chunk:
        raise ValueError(f"chunk={chunk} must divide the augmented sublane "
                         f"dim {2 * n}")
    out = pl.pallas_call(
        functools.partial(_gauss_jordan_kernel, steps=steps, chunk=chunk),
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
    x = out[:orig, :n_orig, :n_orig]
    if polish:
        eye = jnp.eye(n_orig, dtype=jnp.float32)
        for _ in range(polish):
            r = eye - _mm3(a_unpadded, x)
            x = x + _mm3(x, r)
    return x.astype(orig_dtype)


def _mm3(lhs, rhs):
    return jnp.matmul(lhs, rhs, precision=jax.lax.Precision.HIGHEST)
