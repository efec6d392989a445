"""Batched-inversion benchmark CLI.

Reference counterpart: ``src/inverse_bench.c`` — argv contract
``TEST_FOLDER NUM_REPS NUM_DUPLICATES [-csv]`` (``inverse_bench.c:276-303``),
six algorithms benchmarked side by side over replicated fixtures with
Welford stats and an average-L1-error column vs the MATLAB inverse
(``bench_parallel``, ``inverse_bench.c:76-238``).

TPU notes:

* Default timing is **device-resident**: batches staged in HBM once
  (untimed), each rep times kernel execution with a sync — per the
  BASELINE north star ("batches resident in HBM").  ``--transfers``
  switches to the reference's convention of timing H2D+kernel+D2H
  (``report/report.tex:104``); note that under the axon dev tunnel
  host↔device transfers are ~1000× slower than production PCIe/DMA, so
  that mode measures the tunnel, not the chip.  One untimed warmup rep
  always runs first so XLA compilation is excluded.
* The input-clobbering reference bug (its Cholesky wrappers write the
  factor back into the caller's ``a``, ``inverse_cholesky_gpu.cu:442-443``,
  corrupting reps ≥ 2 — SURVEY §2.4.2) is not reproduced: inputs are
  immutable JAX arrays.
* Alongside the reference's L1-vs-MATLAB column, the stricter BASELINE
  gate metric max ‖AA⁻¹−I‖∞ is printed in human mode.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from cuda_matrix_inversion_tpu.bench.reporting import (
    BenchReporter,
    identity_error_inf,
    l1_total,
    print_device_info,
)
from cuda_matrix_inversion_tpu.io.mats import read_test_folder
from cuda_matrix_inversion_tpu.io.replicate import replicate_matrices

# Default algorithm roster — the analog of the six-way comparison in
# ``inverse_bench.c:84-89``. CPU rows are the LAPACK oracle; device rows
# run on TPU.  The native rows are the multithreaded-CPU parity rows
# (``lu_blas_omp_cpu`` analog, ``inverse_bench.c:84-89`` /
# ``inverse.c:71-86``); they are skipped silently when the C++ oracle
# isn't built (registry leaves them unregistered).
DEFAULT_ALGORITHMS = (
    "lu_cpu",
    "cholesky_cpu",
    "lu_native_cpu",
    "cholesky_native_cpu",
    "lu",
    "cholesky",
    "gauss_pallas",
    "lu_pallas",
    "cholesky_pallas",
    "newton_schulz_pallas",
    "newton_schulz_spd_pallas",
    "newton_schulz_spd10_pallas",
)

# Roster for the general-square (non-SPD) fixture family: the
# pivoting-capable paths — the Cholesky/Newton-Schulz-SPD rows require
# (caller-asserted) SPD input and would just fail the gate on purpose —
# plus the κ ≲ 500 split-precision Newton-Schulz lane, which handles any
# nonsingular matrix in this fixture class (κ capped at 4·dim) without
# factorization.
GENERAL_ALGORITHMS = (
    "lu_cpu",
    "gauss_cpu",
    "lu_native_cpu",
    "lu",
    "gauss_pallas",
    "lu_pallas",
    "newton_schulz_pan500_pallas",
    # r5 (VERDICT r4 next #4): the r4 tiers sweep alongside the others —
    # lu_bign measures the HBM-resident route at ANY n in the roster,
    # lu_hiacc the fp64-class double-single refinement tier
    "lu_bign_pallas",
    "lu_hiacc",
)

# The ONLY rows that may be skipped silently when unregistered: the
# optional C++ oracle (requires `python -m ...native.build`).  Every other
# unknown name is a hard error — the reference aborts on bad input via
# ``ensure`` (``inverse_bench.c:254-270``), and a bench that can no-op on a
# typo will eventually publish an empty table (VERDICT r2 weak #2).
OPTIONAL_ALGORITHMS = frozenset({"lu_native_cpu", "cholesky_native_cpu"})


def resolve_algorithms(requested, available) -> list:
    """Split comma lists, validate against the registry, fail loudly on
    unknown names; drop unbuilt OPTIONAL rows silently."""
    from cuda_matrix_inversion_tpu.utils.errors import ensure

    names: list = []
    for item in requested:
        names.extend(s for s in str(item).split(",") if s)
    unknown = [n for n in names
               if n not in available and n not in OPTIONAL_ALGORITHMS]
    ensure(not unknown,
           "unknown inversion algorithm(s) %s; available: %s",
           unknown, sorted(available))
    return [n for n in names if n in available]


def run_bench(
    folder: str,
    num_reps: int,
    num_duplicates: int,
    csv: bool = False,
    algorithms=DEFAULT_ALGORITHMS,
    dtype=np.float32,
    transfers: bool = False,
    stream=None,
) -> BenchReporter:
    import jax

    from cuda_matrix_inversion_tpu.ops.registry import (
        get_inverse_algorithm,
        list_inverse_algorithms,
    )

    data = read_test_folder(folder, kind="inverse", dtype=dtype)
    a = replicate_matrices(data["a"], num_duplicates)
    a_inv_ref = replicate_matrices(data["aInv"], num_duplicates) if "aInv" in data else None
    num_matrices, n, _ = a.shape

    stream = stream or sys.stdout
    rep = BenchReporter(num_matrices, n, num_reps, csv=csv, stream=stream)
    if not csv:
        print_device_info(stream)

    available = set(list_inverse_algorithms())
    for name in resolve_algorithms(algorithms, available):
        fn = get_inverse_algorithm(name)
        is_cpu = name.endswith("_cpu")
        entry = rep.entry(name)

        if is_cpu:
            inv = None
            for _ in range(num_reps):
                entry.timer.start()
                inv = fn(a)
                entry.timer.stop()
        elif transfers:
            jfn = jax.jit(fn)
            jfn(jax.device_put(a)).block_until_ready()  # compile outside timers
            inv = None
            for _ in range(num_reps):
                entry.timer.start()
                # reference-parity mode: H2D + kernel + D2H in-timer
                inv = np.asarray(jax.device_get(jfn(jax.device_put(a))))
                entry.timer.stop()
        else:
            # device-resident mode: dependency-chained slope timing (see
            # bench/timing.py — plain block_until_ready is untrustworthy
            # through the axon tunnel). One call, num_reps slope samples
            # (compiles the timing loops exactly once).
            from cuda_matrix_inversion_tpu.bench.timing import (
                chained_op_samples_robust,
            )

            jfn = jax.jit(fn)
            samples = chained_op_samples_robust(fn, a, iters=4, trials=num_reps)
            for sec in samples:
                entry.timer.stats.add(max(sec, 0.0))
                entry.timer.last_seconds = max(sec, 0.0)
            inv = np.asarray(jax.device_get(jfn(jax.device_put(a))))

        extra = {}
        if a_inv_ref is not None:
            entry.total_error = l1_total(inv, a_inv_ref)
        extra["max ||AA^-1 - I||_inf"] = f"{identity_error_inf(a, inv):.3e}"
        rep.report(name, extra_metrics=extra)
    return rep


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="inverse_bench",
        description="Batched matrix inversion benchmark (TPU rebuild of src/inverse_bench.c)",
    )
    p.add_argument("test_folder")
    p.add_argument("num_reps", type=int)
    p.add_argument("num_duplicates", type=int)
    p.add_argument("-csv", action="store_true", dest="csv")
    p.add_argument("--algorithms", nargs="+", default=list(DEFAULT_ALGORITHMS))
    p.add_argument("--dtype", default="float32", choices=["float32", "float64"])
    p.add_argument("--transfers", action="store_true",
                   help="time H2D+kernel+D2H per rep (reference parity) instead of device-resident")
    from cuda_matrix_inversion_tpu.utils.backend import (
        backend_argument,
        pin_backend,
        touch_devices,
    )

    backend_argument(p)
    args = p.parse_args(argv)

    from cuda_matrix_inversion_tpu.utils.cache import enable_compilation_cache

    pin_backend(args.backend)
    enable_compilation_cache()

    if args.dtype == "float64":
        from cuda_matrix_inversion_tpu.types import enable_x64

        enable_x64()
    from cuda_matrix_inversion_tpu.utils.errors import EnsureError

    try:
        touch_devices()  # bounded-time first device contact (tunnel watchdog)
        run_bench(
            args.test_folder,
            args.num_reps,
            args.num_duplicates,
            csv=args.csv,
            algorithms=args.algorithms,
            dtype=np.dtype(args.dtype),
            transfers=args.transfers,
        )
    except EnsureError as e:
        print(f"inverse_bench: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
