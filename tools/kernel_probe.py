"""One-shot kernel A/B probe at the quoted 1600x128 shape.

Usage:  python tools/kernel_probe.py <module> <fn> '<json kwargs>' \
            [--gate] [--backend {auto,cpu}]

Times one kernel configuration with the dependency-chained harness
(bench/timing.py — wall-clock through the tunnel is not trustworthy) and
prints one JSON row compatible with results/kernel-ab-r3.jsonl.  Exists so
scoped-VMEM/perf questions that only the real chip can answer (CLAUDE.md
"Scoped-VMEM margins move with the caller") are one bounded foreground
call each.
"""
import argparse
import functools
import json
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("module", help="import path, e.g. "
                   "cuda_matrix_inversion_tpu.ops.pallas_gauss_jordan")
    p.add_argument("fn", help="callable in the module, e.g. "
                   "inverse_gauss_jordan")
    p.add_argument("kwargs", help="JSON kwargs, e.g. '{\"steps\": 4}'")
    p.add_argument("--gate", action="store_true",
                   help="also report max ||AA^-1 - I||_inf on a 32-slice")
    from cuda_matrix_inversion_tpu.utils.backend import (
        backend_argument,
        pin_backend,
        touch_devices,
    )

    backend_argument(p)
    args = p.parse_args(argv)
    try:
        kwargs = json.loads(args.kwargs)
    except json.JSONDecodeError as e:
        p.error(f"kwargs is not valid JSON: {e}")
    pin_backend(args.backend)
    from cuda_matrix_inversion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mod = __import__(args.module, fromlist=["_"])
    fn = functools.partial(getattr(mod, args.fn), **kwargs)

    from cuda_matrix_inversion_tpu.bench.timing import chained_op_seconds
    from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch

    a = make_spd_batch(1600, 128, np.random.default_rng(7)).astype(np.float32)
    touch_devices()  # bounded first contact: exit 17 = tunnel wedged
    sec = max(chained_op_seconds(fn, a, iters=4, trials=3), 1e-9)
    row = {"algorithm": f"{args.fn}{json.dumps(kwargs, sort_keys=True)}",
           "batch_ms": round(sec * 1e3, 3)}
    if args.gate:
        from cuda_matrix_inversion_tpu.bench.reporting import identity_error_inf
        row["max_identity_err_inf"] = float(
            f"{identity_error_inf(a[:32], np.asarray(fn(a[:32]))):.3e}")
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
