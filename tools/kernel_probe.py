"""One-shot kernel A/B probe at the quoted 1600x128 shape.

Usage:  python tools/kernel_probe.py <module> <fn> '<json kwargs>' [--gate]

Times one kernel configuration with the dependency-chained harness
(bench/timing.py — wall-clock through the tunnel is not trustworthy) and
prints one JSON row compatible with results/kernel-ab-r3.jsonl.  Exists so
scoped-VMEM/perf questions that only the real chip can answer (CLAUDE.md
"Scoped-VMEM margins move with the caller") are one bounded foreground
call each.
"""
import functools
import json
import sys

import numpy as np


def main() -> int:
    imp, fn_name, kwargs_json = sys.argv[1], sys.argv[2], sys.argv[3]
    gate = "--gate" in sys.argv[4:]
    kwargs = json.loads(kwargs_json)
    mod = __import__(imp, fromlist=["_"])
    fn = functools.partial(getattr(mod, fn_name), **kwargs)

    from cuda_matrix_inversion_tpu.bench.timing import chained_op_seconds
    from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch

    a = make_spd_batch(1600, 128, np.random.default_rng(7)).astype(np.float32)
    sec = max(chained_op_seconds(fn, a, iters=4, trials=3), 1e-9)
    row = {"algorithm": f"{fn_name}{json.dumps(kwargs, sort_keys=True)}",
           "batch_ms": round(sec * 1e3, 3)}
    if gate:
        from cuda_matrix_inversion_tpu.bench.reporting import identity_error_inf
        row["max_identity_err_inf"] = float(
            f"{identity_error_inf(a[:32], np.asarray(fn(a[:32]))):.3e}")
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
