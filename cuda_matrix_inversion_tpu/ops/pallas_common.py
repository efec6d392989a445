"""Shared helpers for the Pallas kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def default_interpret(interpret: bool | None) -> bool:
    """Pallas TPU kernels run compiled on TPU; on the CPU test backend
    they run in interpreter mode (tests/conftest.py forces cpu)."""
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def padded_matrix_bytes(n: int, itemsize: int = 4) -> int:
    """VMEM bytes one (n, n) tile actually occupies: the sublane dim pads
    to a multiple of 8, the LANE dim to a multiple of 128 — at n = 136 a
    matrix costs 136×256 slots, 1.88× its nominal size.  Block-size
    budgets MUST use this, not n², or any n in (128k, 128k+128) OOMs
    scoped VMEM on real hardware (found the hard way at n=136, BM=24:
    17.95 MB requested vs the 16 MB limit)."""
    n_sub = -(-n // 8) * 8
    n_lane = -(-n // 128) * 128
    return n_sub * n_lane * itemsize


def block_batch(batch: int, n: int, vmem_budget_bytes: int = 10 * 2**20,
                buffers: int = 5) -> int:
    """Matrices per grid cell for the simple (rank-1) kernels.

    Always ≥ 8 regardless of ``batch``: BM < 8 creates degenerate
    sub-tile shapes Mosaic can't lower, so tiny batches pad up instead
    (``pad_batch``).  8 is also the sweet spot for the rank-1 kernels:
    the (8, N) per-column ops land on full (8, 128) VPU tiles.  ``batch``
    is accepted for signature stability but does not reduce the block.
    """
    del batch
    per_matrix = padded_matrix_bytes(n) * buffers
    bm = max(1, min(8, vmem_budget_bytes // max(per_matrix, 1)))
    return int(max(bm, 8)) if per_matrix * 8 <= vmem_budget_bytes else int(bm)


def tuned_block(n: int, numerator: int = 5 * 2**19, max_bm: int = 24) -> int:
    """Batch block for the MXU-blocked kernels: big blocks amortize the
    sequential per-panel small loops (measured optimum 24 at n=128 for
    ~5 live (BM,N,N) buffers).  ``numerator`` ≈ VMEM budget per buffer;
    lower it (and ``max_bm``) for kernels with more live buffers.
    Budgets against the tile-PADDED matrix size (see
    :func:`padded_matrix_bytes`)."""
    bm = numerator // padded_matrix_bytes(n)
    return min(max_bm, max(8, bm - bm % 8))


def divisor_block(batch: int, bm_max: int, bm_min: int = 8,
                  max_waste: float = 0.05, multiple_of: int = 1) -> int:
    """Batch block ≤ ``bm_max`` that avoids material identity-padding waste.

    For kernels whose batch block is an outer (non-tiled) dimension, a
    divisor of ``batch`` eliminates padding — e.g. the 100-matrix headline
    batch runs 5×20 instead of 5×24 (20% less MXU work).  When ``bm_max``
    already pads by ≤ ``max_waste`` (big batches), it wins: fewer, larger
    blocks amortize per-grid-step cost better than a smaller divisor.
    Reductions over the block dim keep ≥ ``bm_min`` sublanes.  Falls back
    to ``bm_max`` when batch is small or has no divisor in range (e.g.
    prime batches).

    ``multiple_of``: kernels with 2-D ``(bm, n)`` BLOCK SPECS (the fused
    GP kernels' vector inputs) must keep bm divisible by 8 — there the
    block dim IS the sublane dim and Mosaic rejects unaligned blocks.
    Pure 3-D-block kernels (inversion: ``(bm, n, n)``) pass 1; bm is an
    outer dim and any size ≥ 8 lowers.  NOTE the interpret-mode test
    suite cannot catch a violation — it skips Mosaic lowering — so this
    constraint is verified on real TPU (the verify recipe's CLI runs).
    """
    pad = (-batch) % bm_max
    if batch >= bm_min and pad / max(batch, 1) > max_waste:
        for bm in range(min(bm_max, batch), bm_min - 1, -1):
            if bm % multiple_of == 0 and batch % bm == 0:
                return bm
    return bm_max


def pad_matrix_dim(a: jnp.ndarray, multiple: int = 8):
    """Pad n up to a tile-friendly multiple with an identity block.

    ``blockdiag(A, I)⁻¹ = blockdiag(A⁻¹, I)``, so callers slice the
    result back exactly.  Returns (padded, original_n).
    """
    n = a.shape[-1]
    target = max(multiple, -(-n // multiple) * multiple)
    if target == n:
        return a, n
    pad = target - n
    batch = a.shape[0]
    out = jnp.zeros((batch, target, target), a.dtype)
    out = out.at[:, :n, :n].set(a)
    out = out.at[:, n:, n:].set(jnp.eye(pad, dtype=a.dtype))
    return out, n


def pad_batch(a: jnp.ndarray, multiple: int):
    """Pad the batch axis to a NONZERO multiple (identity matrices keep
    every kernel well-defined on the padding); returns (padded,
    original_size).  An empty batch pads to one full block — a grid of 0
    cells is invalid — and callers' ``[:0]`` un-slice returns it empty."""
    batch = a.shape[0]
    rem = batch % multiple
    if rem == 0 and batch > 0:
        return a, batch
    pad = multiple - rem
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))
    return jnp.concatenate([a, eye], axis=0), batch
