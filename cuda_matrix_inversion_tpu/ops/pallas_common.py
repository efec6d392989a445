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


def block_batch(batch: int, n: int, vmem_budget_bytes: int = 10 * 2**20,
                buffers: int = 5) -> int:
    """Matrices per grid cell: fill ~10 MB of VMEM across ``buffers``
    (BM, N, N) fp32 buffers, clamped to [1, 8] and to the batch size.

    8 is a sweet spot: the (8, N) per-column ops land on full (8, 128)
    VPU tiles, and 8×128×128×4B×buffers ≈ 2.6 MB leaves headroom for
    double-buffered pipelining of the input/output blocks.
    """
    per_matrix = n * n * 4 * buffers
    bm = max(1, min(8, vmem_budget_bytes // max(per_matrix, 1)))
    # never clamp to a tiny batch: BM < 8 creates degenerate sub-tile
    # shapes Mosaic can't lower (the batch axis pads up instead)
    return int(bm)


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
    """Pad the batch axis to a multiple (identity matrices keep every
    kernel well-defined on the padding); returns (padded, original_size)."""
    batch = a.shape[0]
    rem = batch % multiple
    if rem == 0:
        return a, batch
    pad = multiple - rem
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))
    return jnp.concatenate([a, eye], axis=0), batch
