"""Large-n SPD inversion by Schur-complement block recursion.

Serves the 256 < n ≤ 512 (and beyond) range the VMEM-resident Pallas
kernels cannot hold (3+ (BM,n,n) fp32 buffers overflow the ~16 MB VMEM
past n ≈ 256).  Rather than stream panels through a hand-built HBM
pipeline — bounded by the measured ~330 GB/s Pallas auto-pipeline DMA
limit (CLAUDE.md) — the matrix is split into a 2×2 block form and
inverted via the Schur complement:

    A = [[A11, A12], [A12ᵀ, A22]],   S = A22 − A12ᵀ A11⁻¹ A12
    A⁻¹ = [[X11 + Y S⁻¹ Yᵀ,  −Y S⁻¹],
           [−S⁻¹ Yᵀ,          S⁻¹ ]],   X11 = A11⁻¹,  Y = X11 A12

The two half-size inversions recurse until they fit the Pallas base
kernel (n ≤ 256); the stitching is four large batched fp32 (HIGHEST)
matmuls that XLA tiles straight onto the MXU.  This is the TPU-native
analog of the reference's next-memory-level staging (its shared-memory
"mm" Cholesky, ``src/inverse_cholesky_gpu.cu:462-765``): the fast
memory holds the half-problems, the big matmuls ride the spacious path.

Numerics: for SPD A both A11 (principal submatrix — eigenvalue
interlacing) and S (λmin(S) ≥ λmin(A), λmax(S) ≤ λmax(A22)) satisfy
κ ≤ κ(A), so any κ-domain guarantee of the base kernel (e.g. the
Newton-Schulz κ ≲ 30 schedule) carries through the recursion unchanged.
SPD-only, caller-asserted — same contract as the Cholesky entries.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _mm(x, y):
    return jnp.matmul(x, y, precision=_HI)


def _t(x):
    return jnp.swapaxes(x, -1, -2)


def _pad_even(a: jnp.ndarray, multiple: int = 16):
    """Pad n to a multiple of 16 with an identity block so both halves of
    the split are 8-aligned (Mosaic tile constraint on the base kernel).
    ``blockdiag(A, I)⁻¹ = blockdiag(A⁻¹, I)`` — exact un-slice."""
    n = a.shape[-1]
    target = -(-n // multiple) * multiple
    if target == n:
        return a, n
    pad = target - n
    batch = a.shape[0]
    out = jnp.zeros((batch, target, target), a.dtype)
    out = out.at[:, :n, :n].set(a)
    out = out.at[:, n:, n:].set(jnp.eye(pad, dtype=a.dtype))
    return out, n


def _split_point(n: int) -> int:
    """Split as close to n/2 as possible while keeping the A11 block
    lane-aligned (a multiple of 128 when n allows): an unaligned split
    makes BOTH halves pay the lane-dim pad-to-128 VMEM tax in the base
    kernels (see ``pallas_common.padded_matrix_bytes``); aligning A11
    confines it to the (smaller) trailing block."""
    if n >= 256:
        m = max(128, round(n / 2 / 128) * 128)
    else:
        m = -(-n // 16) * 8  # half of the 16-padded n, multiple of 8
    return min(m, n - 8)


def spd_blocked_inverse(a: jnp.ndarray, base: Callable,
                        max_base_n: int = 256) -> jnp.ndarray:
    """Invert a batch of SPD matrices of any n: Schur recursion down to
    ``base`` (a batched SPD inversion serving n ≤ ``max_base_n``).

    Jit-composable; recursion depth is static (⌈log2(n/max_base_n)⌉).
    """
    n = a.shape[-1]
    if n <= max_base_n:
        return base(a)
    a, n_orig = _pad_even(a)
    n = a.shape[-1]
    m = _split_point(n)

    a11 = a[:, :m, :m]
    a12 = a[:, :m, m:]
    a22 = a[:, m:, m:]

    x11 = spd_blocked_inverse(a11, base, max_base_n)
    y = _mm(x11, a12)                       # X11 A12            (b, m, n-m)
    s = a22 - _mm(_t(a12), y)               # Schur complement   (b, n-m, n-m)
    si = spd_blocked_inverse(s, base, max_base_n)
    b12 = -_mm(y, si)                       # −Y S⁻¹             (b, m, n-m)
    b11 = x11 - _mm(b12, _t(y))             # X11 + Y S⁻¹ Yᵀ     (b, m, m)

    top = jnp.concatenate([b11, b12], axis=-1)
    bot = jnp.concatenate([_t(b12), si], axis=-1)
    out = jnp.concatenate([top, bot], axis=-2)
    return out[:, :n_orig, :n_orig]


def spd_schur_solve(a: jnp.ndarray, rhs: jnp.ndarray, base: Callable,
                    max_base_n: int = 256) -> jnp.ndarray:
    """A⁻¹ @ rhs for large SPD A without materializing the full inverse:
    the Schur blocks apply directly to the RHS columns.

        x_top = X11 r1 + Y S⁻¹ (Yᵀ r1 − r2)
        x_bot = −S⁻¹ (Yᵀ r1 − r2)
    """
    n = a.shape[-1]
    if n <= max_base_n:
        return _mm(base(a), rhs)
    a, n_orig = _pad_even(a)
    if a.shape[-1] != n:
        rhs = jnp.pad(rhs, ((0, 0), (0, a.shape[-1] - n), (0, 0)))
    n = a.shape[-1]
    m = _split_point(n)

    a11, a12, a22 = a[:, :m, :m], a[:, :m, m:], a[:, m:, m:]
    x11 = spd_blocked_inverse(a11, base, max_base_n)
    y = _mm(x11, a12)
    s = a22 - _mm(_t(a12), y)
    si = spd_blocked_inverse(s, base, max_base_n)

    r1, r2 = rhs[:, :m, :], rhs[:, m:, :]
    w = _mm(si, _mm(_t(y), r1) - r2)        # S⁻¹ (Yᵀ r1 − r2)
    x_top = _mm(x11, r1) + _mm(y, w)
    x_bot = -w
    return jnp.concatenate([x_top, x_bot], axis=-2)[:, :n_orig, :]
