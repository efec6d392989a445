"""Profiling/tracing: jax.profiler capture + phase-stage CSV logging.

Reference counterparts (SURVEY §5 "Tracing/profiling"):

* the ``-DDETAILED_LOGGING`` build bracketing every pipeline stage with
  ``TIMER_START/STOP`` + ``TIMER_LOG`` CSV lines (``include/timer.h:8-9``,
  usage ``src/gauss_bench.cu:150-256``) → :class:`StageLogger`, emitting
  the identical ``name,numMatrices,n,ms,ns`` schema;
* the checked-in nvprof traces (``summary_trace_gauss.txt`` etc.) →
  :func:`trace` writing a TensorBoard/Perfetto trace via ``jax.profiler``.
"""

from __future__ import annotations

import contextlib
import os
import sys
from typing import Optional, TextIO

from cuda_matrix_inversion_tpu.utils.timer import Timer


@contextlib.contextmanager
def trace(logdir: str = "/tmp/cmi_tpu_trace", create: bool = True):
    """Capture a device profile around a code block (nvprof analog).

    View with TensorBoard's profile plugin or Perfetto.
    """
    import jax

    if create:
        os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageLogger:
    """DETAILED_LOGGING-style per-stage CSV logger.

    Usage::

        log = StageLogger(num_matrices=100, n=128)
        with log.stage("calculate_mean_gpu_inv", block_on=lambda: out):
            out = inv_fn(k)
    """

    def __init__(self, num_matrices: int, n: int, stream: Optional[TextIO] = None):
        self.num_matrices = num_matrices
        self.n = n
        self.stream = stream or sys.stdout
        self.timers: dict[str, Timer] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t = self.timers.setdefault(name, Timer(name))
        t.start()
        holder = _BlockHolder()
        try:
            yield holder
        finally:
            t.stop(*holder.arrays)
            t.log(self.num_matrices, self.n, self.stream)


class _BlockHolder:
    """Collects device arrays the stage should synchronize on."""

    def __init__(self):
        self.arrays = []

    def block_on(self, *arrays):
        self.arrays.extend(arrays)
        return arrays[0] if len(arrays) == 1 else arrays
