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


_HOST_EVENT_MARKERS = (
    "$", ".py", "PjitFunction", "PJRT", "ParseArguments",
    "PythonRefManager", "jit_", "trace", "__enter__", "__exit__",
)


def profile_summary(thunk, logdir: Optional[str] = None, top: int = 15):
    """Run ``thunk`` under a device trace and aggregate op wall time.

    The TPU analog of the reference's checked-in nvprof summaries
    (``summary_trace_gauss.txt:4-11`` — kernel name, share of GPU time,
    calls, avg): parses the Perfetto JSON that ``jax.profiler`` writes,
    drops host-side events, and returns rows of
    ``(name, total_us, calls, share)`` sorted by total time.
    """
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    cleanup = logdir is None
    logdir = logdir or tempfile.mkdtemp(prefix="cmi_prof_")
    try:
        with trace(logdir):
            thunk()

        durs: dict[str, tuple[float, int]] = {}
        for path in glob.glob(
                os.path.join(logdir, "plugins", "profile", "*",
                             "*.trace.json.gz")):
            with gzip.open(path) as f:
                for e in json.load(f).get("traceEvents", []):
                    name = e.get("name", "")
                    if e.get("ph") != "X" or not name:
                        continue
                    if any(m in name for m in _HOST_EVENT_MARKERS):
                        continue
                    d, c = durs.get(name, (0.0, 0))
                    durs[name] = (d + float(e.get("dur", 0.0)), c + 1)
    finally:
        if cleanup:
            shutil.rmtree(logdir, ignore_errors=True)
    total = sum(d for d, _ in durs.values()) or 1.0
    rows = [(name, d, c, d / total)
            for name, (d, c) in sorted(durs.items(), key=lambda kv: -kv[1][0])]
    return rows[:top]


def format_profile_summary(rows) -> str:
    """Render :func:`profile_summary` rows in the nvprof-summary style."""
    lines = [f"{'time_share':>10} {'total_us':>12} {'calls':>6}  name"]
    for name, dur, calls, share in rows:
        lines.append(f"{share:>9.1%} {dur:>12.1f} {calls:>6d}  {name}")
    return "\n".join(lines)


def _main(argv=None) -> int:
    """CLI: profile the flagship paths and print nvprof-style summaries.

    ``python -m cuda_matrix_inversion_tpu.utils.profiling [--out FILE]``
    """
    import argparse

    import numpy as np

    p = argparse.ArgumentParser(description="device profile summary (nvprof analog)")
    p.add_argument("--out", default=None, help="write the summary here")
    p.add_argument("--batch", type=int, default=100)
    p.add_argument("--n", type=int, default=128)
    args = p.parse_args(argv)

    import jax

    from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch
    from cuda_matrix_inversion_tpu.models.gp import gp_mean_variance
    from cuda_matrix_inversion_tpu.ops.registry import get_inverse_algorithm

    rng = np.random.default_rng(0)
    b = make_spd_batch(args.batch, args.n, rng).astype(np.float32)
    vec = lambda: rng.random((args.batch, args.n, 1), dtype=np.float32)  # noqa: E731
    a, c, d = vec(), vec(), vec()
    e = rng.random((args.batch, 1, 1), dtype=np.float32)

    inv_fn = jax.jit(get_inverse_algorithm("newton_schulz_spd_pallas"))
    gp_fn = jax.jit(lambda *xs: gp_mean_variance(*xs, method="pallas_ns"))
    # stage inputs in HBM so the trace shows kernels, not tunnel transfers
    bd = jax.device_put(b)
    gp_args = [jax.device_put(x) for x in (a, b, c, d, e)]
    inv_fn(bd).block_until_ready()  # compile outside the trace
    jax.block_until_ready(gp_fn(*gp_args))

    out_lines = []
    for title, thunk in (
        (f"batched inversion newton_schulz_spd_pallas {args.batch}x{args.n}x{args.n}",
         lambda: inv_fn(bd).block_until_ready()),
        (f"fused GP mean/variance pallas_ns {args.batch}x{args.n}",
         lambda: jax.block_until_ready(gp_fn(*gp_args))),
    ):
        rows = profile_summary(thunk)
        out_lines.append(f"== {title} ==")
        out_lines.append(format_profile_summary(rows))
        out_lines.append("")
    text = "\n".join(out_lines)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
