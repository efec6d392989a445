"""Serving engine: pre-compiled, shape-bucketed batched linear algebra.

The production-runtime layer the reference never needed (its binaries run
for seconds; SURVEY §5 "checkpoint/resume: none").  For serving, the
latency killers on TPU are (re)compilation and shape churn; the engine
removes both:

* a fixed set of (algorithm, bucket, dtype) entry points is compiled
  once at startup (``warmup()``), backed by the persistent compilation
  cache (`utils/cache.py`) so process restarts are cheap;
* requests of any batch size / matrix size are padded to the nearest
  registered bucket (identity-block padding — exact un-padding) and
  dispatched to the pre-compiled executable — no tracing at serve time;
* GP requests use the same machinery via ``gp_mean_variance``.

Thread-safe for concurrent callers (JAX dispatch is); no host round
trips inside a request beyond input/output transfer.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

DEFAULT_DIM_BUCKETS = (8, 16, 32, 64, 128, 256)
DEFAULT_BATCH_BUCKETS = (8, 32, 128, 512, 2048)


def _round_up(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    raise ValueError(f"{value} exceeds largest bucket {buckets[-1]}")


@dataclass
class InversionEngine:
    """Pre-compiled batched-inversion service.

    Example::

        eng = InversionEngine(algorithm="newton_schulz")
        eng.warmup([(100, 128)])          # compile ahead of serving
        out = eng.inverse(batch)           # (b, n, n) ndarray in/out
    """

    algorithm: str = "newton_schulz"
    dim_buckets: Sequence[int] = DEFAULT_DIM_BUCKETS
    batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS
    dtype: str = "float32"
    _compiled: Dict[Tuple[int, int], object] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def __post_init__(self):
        from cuda_matrix_inversion_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    # -- compilation ------------------------------------------------------
    def _get_executable(self, batch_b: int, dim_b: int):
        import jax

        from cuda_matrix_inversion_tpu.ops.registry import get_inverse_algorithm

        key = (batch_b, dim_b)
        with self._lock:
            exe = self._compiled.get(key)
        if exe is not None:
            return exe
        fn = get_inverse_algorithm(self.algorithm)
        spec = jax.ShapeDtypeStruct((batch_b, dim_b, dim_b), np.dtype(self.dtype))
        exe = jax.jit(fn).lower(spec).compile()
        with self._lock:
            self._compiled[key] = exe
        return exe

    def warmup(self, shapes: Sequence[Tuple[int, int]]) -> None:
        """Pre-compile for (batch, n) shapes (bucketed) before serving."""
        for batch, n in shapes:
            self._get_executable(
                _round_up(batch, self.batch_buckets),
                _round_up(n, self.dim_buckets),
            )

    @property
    def compiled_shapes(self):
        with self._lock:
            return sorted(self._compiled)

    # -- serving ----------------------------------------------------------
    def inverse(self, a: np.ndarray, check: bool = False) -> np.ndarray:
        """Invert a (batch, n, n) batch; any size within the buckets."""
        import jax

        a = np.ascontiguousarray(np.asarray(a, dtype=self.dtype))
        if a.ndim == 2:
            a = a[None]
        if a.ndim != 3 or a.shape[-1] != a.shape[-2]:
            raise ValueError(f"expected (batch, n, n), got {a.shape}")
        batch, n = a.shape[0], a.shape[-1]
        if batch == 0:
            return a.copy()
        batch_b = _round_up(batch, self.batch_buckets)
        dim_b = _round_up(n, self.dim_buckets)

        padded = np.zeros((batch_b, dim_b, dim_b), dtype=a.dtype)
        padded[:batch, :n, :n] = a
        if dim_b > n:  # identity block keeps every matrix invertible
            padded[:, n:, n:] = np.eye(dim_b - n, dtype=a.dtype)
        if batch_b > batch:  # identity matrices in the batch pad
            padded[batch:] = np.eye(dim_b, dtype=a.dtype)

        exe = self._get_executable(batch_b, dim_b)
        out = np.asarray(jax.device_get(exe(jax.device_put(padded))))
        result = out[:batch, :n, :n]
        if check:
            finite = np.isfinite(result).all(axis=(1, 2))
            if not finite.all():
                from cuda_matrix_inversion_tpu.ops.host_api import SingularBatchError

                raise SingularBatchError(np.nonzero(~finite)[0])
        return np.ascontiguousarray(result)


@dataclass
class GPEngine:
    """Pre-compiled GP mean/variance service (same bucketing strategy)."""

    method: str = "solve"
    dim_buckets: Sequence[int] = DEFAULT_DIM_BUCKETS
    batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS
    dtype: str = "float32"
    _compiled: Dict[Tuple[int, int], object] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def __post_init__(self):
        from cuda_matrix_inversion_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    def _get_executable(self, batch_b: int, dim_b: int):
        import jax

        from cuda_matrix_inversion_tpu.models.gp import gp_mean_variance

        key = (batch_b, dim_b)
        with self._lock:
            exe = self._compiled.get(key)
        if exe is not None:
            return exe
        dt = np.dtype(self.dtype)
        vec = jax.ShapeDtypeStruct((batch_b, dim_b, 1), dt)
        mat = jax.ShapeDtypeStruct((batch_b, dim_b, dim_b), dt)
        scl = jax.ShapeDtypeStruct((batch_b, 1, 1), dt)
        fn = lambda a, b, c, d, e: gp_mean_variance(  # noqa: E731
            a, b, c, d, e, method=self.method)
        exe = jax.jit(fn).lower(vec, mat, vec, vec, scl).compile()
        with self._lock:
            self._compiled[key] = exe
        return exe

    def warmup(self, shapes: Sequence[Tuple[int, int]]) -> None:
        for batch, n in shapes:
            self._get_executable(
                _round_up(batch, self.batch_buckets),
                _round_up(n, self.dim_buckets),
            )

    def mean_variance(self, a, b, c, d, e):
        """Batched GP mean/variance; returns two (batch, 1, 1) ndarrays."""
        import jax

        dt = np.dtype(self.dtype)
        a, b, c, d, e = (np.ascontiguousarray(np.asarray(x, dtype=dt))
                         for x in (a, b, c, d, e))
        batch, n = b.shape[0], b.shape[-1]
        if batch == 0:
            z = np.zeros((0, 1, 1), dt)
            return z, z.copy()
        batch_b = _round_up(batch, self.batch_buckets)
        dim_b = _round_up(n, self.dim_buckets)

        bp = np.zeros((batch_b, dim_b, dim_b), dt)
        bp[:batch, :n, :n] = b
        if dim_b > n:
            bp[:, n:, n:] = np.eye(dim_b - n, dtype=dt)
        if batch_b > batch:
            bp[batch:] = np.eye(dim_b, dtype=dt)
        pad_vec = lambda v: np.pad(  # noqa: E731
            v.reshape(batch, n, 1), ((0, batch_b - batch), (0, dim_b - n), (0, 0)))
        ap, cp, dp = pad_vec(a), pad_vec(c), pad_vec(d)
        ep = np.pad(e.reshape(batch, 1, 1), ((0, batch_b - batch), (0, 0), (0, 0)))

        exe = self._get_executable(batch_b, dim_b)
        mean, var = exe(*(jax.device_put(x) for x in (ap, bp, cp, dp, ep)))
        return (np.asarray(jax.device_get(mean))[:batch],
                np.asarray(jax.device_get(var))[:batch])
