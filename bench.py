"""Headline benchmark: 100× 128×128 fp32 batched inversion on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md §1): the reference's best GPU path — cuBLAS batched
LU on a GTX 690 — inverts 100× 128×128 in 14.079 ms ≈ 7,103 inversions/s
(transfers included over ~12 GB/s PCIe; `results/inverse-bench-errors.txt:6`).
Here batches are HBM-resident per the BASELINE.json north star, timing is
kernel time with a sync, and the result must pass the accuracy gate
max ‖AA⁻¹−I‖∞ < 1e-4 fp32 or the run reports value=0.
"""

import json

import numpy as np


# Physical lower bound for one batched inversion: the kernel must at
# minimum read A and write A⁻¹ through HBM.  v5e HBM peak is ~819 GB/s;
# a slope sample implying more than that is tunnel-timing noise, not a
# measurement of the chip, and is rejected (VERDICT r1 weak #5: pin the
# headline with a variance guard instead of quoting noise-floor samples).
_HBM_PEAK_BYTES_PER_S = 819e9


def _hbm_floor_ms(a: np.ndarray) -> float:
    return 2 * a.nbytes / _HBM_PEAK_BYTES_PER_S * 1e3  # read A + write X


def _best_inversion_ms(a_host: np.ndarray):
    import jax

    from cuda_matrix_inversion_tpu.bench.timing import chained_op_samples_robust
    from cuda_matrix_inversion_tpu.ops.registry import (
        get_inverse_algorithm,
        list_inverse_algorithms,
    )

    # production algorithms only — gauss_blocked_pallas is experimental
    # and the adaptive newton_schulz_spd is strictly dominated by its
    # _pallas sibling on this SPD input (timing it costs extra
    # multi-minute remote compiles of chained while_loop closures)
    candidates = [n for n in list_inverse_algorithms(cpu=False)
                  if "blocked" not in n and n != "newton_schulz_spd"]
    floor_ms = _hbm_floor_ms(a_host)
    best = (None, float("inf"), None, None)
    for name in candidates:
        try:
            fn = get_inverse_algorithm(name)
            # dependency-chained slope timing — see bench/timing.py for why
            # plain block_until_ready cannot be trusted here.  Tunnel
            # jitter can make short-chain slopes non-positive; retry with
            # longer chains and reject the candidate if still unphysical.
            samples = np.asarray(chained_op_samples_robust(
                fn, a_host, iters=16, trials=5, retry_iters=64)) * 1e3
            samples = samples[samples >= floor_ms]  # variance guard
            if samples.size == 0:
                continue
            med = float(np.median(samples))
            # accuracy gate per algorithm
            inv = np.asarray(jax.device_get(jax.jit(fn)(jax.device_put(a_host))),
                             dtype=np.float64)
            resid = np.abs(a_host.astype(np.float64) @ inv - np.eye(a_host.shape[-1]))
            err = resid.sum(axis=-1).max()
            if err < 1e-4 and med < best[1]:
                spread = (float(samples.min()), float(samples.max()))
                best = (name, med, inv, spread)
        except Exception:
            continue
    return best


def main() -> int:
    from cuda_matrix_inversion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch

    rng = np.random.default_rng(2026)
    a = make_spd_batch(100, 128, rng).astype(np.float32)

    name, ms, _, spread = _best_inversion_ms(a)
    if name is None:
        print(json.dumps({
            "metric": "batched_inversions_per_sec_100x128x128_fp32",
            "value": 0.0,
            "unit": "inversions/s",
            "vs_baseline": 0.0,
            "note": "no algorithm passed the 1e-4 accuracy gate",
        }))
        return 1

    inversions_per_sec = 100.0 / (ms / 1e3)
    baseline = 100.0 / (14.079 / 1e3)  # reference cuBLAS LU, GTX 690
    print(json.dumps({
        "metric": "batched_inversions_per_sec_100x128x128_fp32",
        "value": round(inversions_per_sec, 1),
        "unit": "inversions/s",
        "vs_baseline": round(inversions_per_sec / baseline, 2),
        "detail": {"algorithm": name, "batch_ms": round(ms, 4),
                   "sample_spread_ms": [round(spread[0], 4), round(spread[1], 4)],
                   "hbm_floor_ms": round(_hbm_floor_ms(a), 4)},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
