"""Host-facing convenience API — the ``*_batched_gpu`` flavor.

The reference exposes every algorithm twice (``include/inverse_gpu.h:7-31``):
``*_batched_gpu`` takes host arrays and owns alloc→H2D→kernel→D2H→free
(e.g. ``src/gauss/inverse_gpu.cu:60-123``), while ``*_batched_device``
composes on device.  This module is the former: NumPy in, NumPy out,
device transfer and synchronization handled internally.  The composable
device layer is :mod:`cuda_matrix_inversion_tpu.ops.xla` and the Pallas
kernels.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cuda_matrix_inversion_tpu.ops.registry import get_inverse_algorithm
from cuda_matrix_inversion_tpu.types import as_batch

_jit_cache = {}


def _jitted(name: str):
    if name not in _jit_cache:
        fn = get_inverse_algorithm(name)
        _jit_cache[name] = jax.jit(fn)
    return _jit_cache[name]


class SingularBatchError(np.linalg.LinAlgError):
    """Raised when `check=True` finds non-invertible matrices in a batch.

    Analog of the reference's per-matrix cuBLAS ``infoArray`` checks
    (``src/gauss/inverse_gpu.cu:35-37,52-54``); carries the offending
    batch indices.
    """

    def __init__(self, indices):
        self.indices = list(indices)
        super().__init__(
            f"batch members {self.indices} produced non-finite inverses "
            f"(singular or ill-conditioned beyond the dtype)")


def inverse_batched(a: np.ndarray, algorithm: str = "lu", device=None,
                    check: bool = False) -> np.ndarray:
    """Invert a host batch on device; host array in, host array out.

    Analog of ``inverse_lu_cuda_batched_gpu`` / ``inverse_gauss_batched_gpu``
    etc. (``include/inverse_gpu.h:7-8``): the device round-trip the
    reference hand-codes (pinned alloc, cudaMemcpy2D, launch, D2H, free —
    ``src/gauss/batched_invert.cu:99-177``) collapses to device_put + jit +
    device_get under JAX.
    """
    host = as_batch(a)
    if algorithm.endswith("_cpu"):
        out = get_inverse_algorithm(algorithm)(host)
    else:
        dev = jax.device_put(host, device)
        out = np.asarray(jax.device_get(_jitted(algorithm)(dev)))
    if check:
        finite = np.isfinite(out).all(axis=(1, 2))
        if not finite.all():
            raise SingularBatchError(np.nonzero(~finite)[0])
    return out


def inverse_batched_device(a: jnp.ndarray, algorithm: str = "lu") -> jnp.ndarray:
    """Device-resident flavor: jnp array in/out, stays in HBM, composable
    under jit (analog of the ``*_batched_device`` API)."""
    return get_inverse_algorithm(algorithm)(a)


def solve_batched(a: np.ndarray, rhs: np.ndarray, method: str = "lu",
                  device=None) -> np.ndarray:
    """Batched linear solve AX = RHS without materializing A⁻¹.

    The host-facing flavor of the reference's ``-DGAUSS_SOLVE`` capability
    (``spotrf_``+``spotrs_``, ``src/gauss_cpu.c:118-131``, selected by
    ``Makefile:119-121``), generalized: ``method="cholesky"`` is the SPD
    spotrs analog, ``method="lu"`` covers general systems (getrs), and
    ``method="lu_cpu"``/``"cholesky_cpu"`` run the host oracle.
    ``rhs``: (batch, n, k) or (batch, n).
    """
    host_a = as_batch(a)
    host_rhs = np.asarray(rhs, dtype=host_a.dtype)
    squeeze = host_rhs.ndim == 2
    if squeeze:
        host_rhs = host_rhs[..., None]
    methods = ("lu", "cholesky", "lu_cpu", "cholesky_cpu")
    if method not in methods:
        raise KeyError(f"unknown solve method {method!r}; have {list(methods)}")
    if method.endswith("_cpu"):
        import scipy.linalg

        out = np.empty_like(host_rhs)
        for i in range(host_a.shape[0]):
            if method == "cholesky_cpu":
                cf = scipy.linalg.cho_factor(host_a[i], lower=True)
                out[i] = scipy.linalg.cho_solve(cf, host_rhs[i])
            else:
                out[i] = scipy.linalg.solve(host_a[i], host_rhs[i])
    else:
        key = f"__solve_{method}"
        if key not in _jit_cache:
            from cuda_matrix_inversion_tpu.ops import xla as _xla

            solvers = {"lu": _xla.lu_solve, "cholesky": _xla.spd_solve}
            _jit_cache[key] = jax.jit(solvers[method])
        out = np.asarray(jax.device_get(_jit_cache[key](
            jax.device_put(host_a, device), jax.device_put(host_rhs, device))))
    return out[..., 0] if squeeze else out
