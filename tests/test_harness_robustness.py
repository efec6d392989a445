"""Round-3 harness-robustness surfaces (VERDICT r2 weak #1-#4).

Covers: loud failure on unknown algorithm names + comma lists
(``inverse_bench.resolve_algorithms``), the sweep-CSV outlier audit
(``reporting.audit_outliers``), the backend pin / first-contact watchdog
(``utils.backend``), and bench.py's emit-exactly-once best-so-far logic.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from cuda_matrix_inversion_tpu.bench.inverse_bench import (
    OPTIONAL_ALGORITHMS,
    resolve_algorithms,
)
from cuda_matrix_inversion_tpu.bench.reporting import (
    audit_outliers,
    parse_csv_rows,
)
from cuda_matrix_inversion_tpu.utils.errors import EnsureError

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --- resolve_algorithms (weak #2: the silent empty benchmark) ---------

def test_resolve_splits_comma_lists():
    avail = {"lu", "lu_cpu", "gauss_pallas"}
    assert resolve_algorithms(["lu_cpu,lu", "gauss_pallas"], avail) == [
        "lu_cpu", "lu", "gauss_pallas"]


def test_resolve_fails_loudly_on_typo():
    with pytest.raises(EnsureError, match="gauss_palas"):
        resolve_algorithms(["lu_cpu,lu,gauss_palas"], {"lu", "lu_cpu"})


def test_resolve_silently_skips_only_unbuilt_native_rows():
    # the documented exception: optional C++ oracle rows may be absent
    avail = {"lu"}
    names = ["lu"] + sorted(OPTIONAL_ALGORITHMS)
    assert resolve_algorithms(names, avail) == ["lu"]
    # ...but an unknown NON-optional name among them still fails
    with pytest.raises(EnsureError):
        resolve_algorithms(names + ["nope"], avail)


def test_cli_exits_nonzero_on_unknown_algorithm(tmp_path):
    # the exact reproduction from VERDICT r2 weak #2, now exit 1 + message
    from cuda_matrix_inversion_tpu.bench import inverse_bench

    rc = inverse_bench.main([
        os.path.join(REPO_ROOT, "tests", "hand_fixtures"), "1", "1", "-csv",
        "--backend", "cpu", "--algorithms", "lu_cpu,lu,gauss_palas"])
    assert rc == 1


# --- audit_outliers (weak #4: the published 10x row) -------------------

def _write_csv(path, rows):
    with open(path, "w") as f:
        for num, n, name, mean in rows:
            total = mean * 10
            f.write(f"{num} {n} 10 {name} {total:e} {mean:e} 1e-3 1e-6\n")


def test_audit_flags_planted_outlier(tmp_path):
    p = tmp_path / "sweep.txt"
    # per-matrix time flat at 1e-3 ms except the planted 200-batch row
    _write_csv(p, [(100, 8, "alg", 0.1), (200, 8, "alg", 4.0),
                   (400, 8, "alg", 0.4), (1600, 8, "alg", 1.6)])
    flags = audit_outliers(str(p), k=3.0)
    assert len(flags) == 1
    assert flags[0]["num_matrices"] == 200 and flags[0]["ratio"] > 10


def test_audit_clean_sweep_not_flagged(tmp_path):
    p = tmp_path / "sweep.txt"
    # realistic: per-matrix time mildly DECREASES with batch (amortization)
    _write_csv(p, [(100, 8, "alg", 0.12), (200, 8, "alg", 0.22),
                   (400, 8, "alg", 0.40), (1600, 8, "alg", 1.55),
                   (100, 8, "other", 0.5), (400, 8, "other", 1.9)])
    assert audit_outliers(str(p), k=3.0) == []


def test_audit_tiny_batch_amortization_not_flagged(tmp_path):
    p = tmp_path / "sweep.txt"
    # square_5_* regime: a 5-matrix launch at ~the same TOTAL time as an
    # 80-matrix one is fixed launch cost amortizing, not tunnel noise —
    # 16x worse per matrix, and legitimate (r3: the per-matrix rule
    # flagged half the square sweep this way)
    _write_csv(p, [(5, 8, "alg", 0.06), (10, 8, "alg", 0.055),
                   (80, 8, "alg", 0.05)])
    assert audit_outliers(str(p), k=3.0) == []
    # ...but a genuinely inflated small-batch row still flags: the
    # 80-matrix sibling bounds ANY smaller batch at its own total time
    _write_csv(p, [(5, 8, "alg", 0.9), (10, 8, "alg", 0.055),
                   (80, 8, "alg", 0.05)])
    flags = audit_outliers(str(p), k=3.0)
    assert [f["num_matrices"] for f in flags] == [5]


def test_audit_groups_by_n_and_skips_singletons(tmp_path):
    p = tmp_path / "sweep.txt"
    # large n is legitimately slower per matrix — must not cross-compare
    _write_csv(p, [(100, 8, "alg", 0.1), (400, 8, "alg", 0.4),
                   (100, 128, "alg", 40.0)])
    assert audit_outliers(str(p), k=3.0) == []


def test_parse_csv_rows_skips_phase_lines(tmp_path):
    p = tmp_path / "mixed.txt"
    with open(p, "w") as f:
        f.write("calculate_mean_gpu_inv,100,128,10.3,10300000\n")  # phase log
        f.write("100 8 10 alg 1.0e+00 1.0e-01 1e-3 1e-6\n")
    rows = parse_csv_rows(str(p))
    assert len(rows) == 1 and rows[0]["mean_ms"] == 0.1


# --- backend pin + watchdog (weak #3: the indefinite hang) -------------

def test_pin_backend_auto_is_noop():
    from cuda_matrix_inversion_tpu.utils.backend import pin_backend

    pin_backend("auto")  # must not touch jax config (tests already pin cpu)
    pin_backend(None)


def test_watchdog_fast_path_no_fire():
    from cuda_matrix_inversion_tpu.utils.backend import (
        first_contact_watchdog,
    )

    with first_contact_watchdog(timeout_s=30.0):
        x = 1 + 1
    assert x == 2


def test_watchdog_kills_hung_process():
    # a wedged first contact must end the process with the distinct code
    code = (
        "from cuda_matrix_inversion_tpu.utils.backend import "
        "first_contact_watchdog\n"
        "import time\n"
        "with first_contact_watchdog(timeout_s=1.0, what='test hang'):\n"
        "    time.sleep(30)\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=25)
    assert r.returncode == 17
    assert "test hang" in r.stderr


# --- bench.py emitter (weak #1: no JSON line shipped) -------------------

def _load_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO_ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emitter_emits_exactly_once(capsys, tmp_path):
    bench = _load_bench()
    bench._SESSIONS_PATH = str(tmp_path / "ledger.txt")  # don't pollute results/
    e = bench._Emitter(floor_ms=0.016)
    e.update("slow", 2.0, (1.9, 2.1), 0, 5)
    e.update("fast", 0.05, (0.04, 0.06), 2, 5)
    e.update("mid", 0.8, (0.7, 0.9), 1, 5)   # must not displace best
    assert e.emit() == 0
    assert e.emit() == 0  # second call is a no-op
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    line = json.loads(out[0])
    assert line["detail"]["algorithm"] == "fast"
    assert line["detail"]["samples_rejected"] == 2
    assert line["detail"]["samples_total"] == 5
    assert line["value"] == pytest.approx(100.0 / 0.05 * 1e3, rel=1e-3)
    assert line["vs_baseline"] > 100
    # r4: the emission is appended to the session ledger and carries the
    # cross-session median (here: just this run)
    assert line["detail"]["session_median_ms"] == pytest.approx(0.05)
    ledger = open(bench._SESSIONS_PATH).read().strip().splitlines()
    assert json.loads(ledger[-1])["detail"]["algorithm"] == "fast"


def test_emitter_flags_minority_samples_and_session_median(capsys, tmp_path):
    # ADVICE r3 medium: a 1-2 kept-sample headline must be distinguishable;
    # VERDICT r3 next #4: session_median_ms from the ledger.
    bench = _load_bench()
    bench._SESSIONS_PATH = str(tmp_path / "ledger.txt")
    with open(bench._SESSIONS_PATH, "w") as f:
        f.write("# comment line\n")
        for ms in (0.05, 0.07, 0.09):
            f.write(json.dumps({"detail": {"batch_ms": ms}}) + "\n")
    e = bench._Emitter(floor_ms=0.016)
    e.update("fast", 0.06, (0.05, 0.07), rejected=3, total=5, kept=2)
    assert e.emit() == 0
    line = json.loads(capsys.readouterr().out.strip())
    assert line["detail"]["minority_samples"] is True
    assert line["detail"]["samples_kept"] == 2
    # median of [0.06, 0.05, 0.07, 0.09]
    assert line["detail"]["session_median_ms"] == pytest.approx(0.065)


def test_emitter_no_result_is_valid_json(capsys, tmp_path):
    bench = _load_bench()
    bench._SESSIONS_PATH = str(tmp_path / "ledger.txt")
    e = bench._Emitter(floor_ms=0.016)
    assert e.emit() == 1
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] == 0.0 and "note" in line


def test_run_retries_long_chain_when_all_samples_below_floor(monkeypatch):
    # Reproduces the 2026-08-19 chip session: spd10 (~37 µs/batch) had
    # ALL 5 iters=16 slope samples under the 0.016 ms HBM floor and was
    # silently dropped, costing the headline a 2.5× faster lane.  The
    # candidate must be retried once at iters=64 before rejection.
    import time

    import numpy as np

    from cuda_matrix_inversion_tpu.bench import timing
    from cuda_matrix_inversion_tpu.ops import registry

    bench = _load_bench()
    calls = []

    def fake_samples(fn, x0, iters=16, trials=5):
        calls.append(iters)
        # short chains: pure tunnel noise below the floor; long chains:
        # a clean 0.05 ms/call signal
        per_call_s = 1e-9 if iters < 64 else 5e-5
        return [per_call_s] * trials

    monkeypatch.setattr(timing, "chained_op_samples", fake_samples)
    monkeypatch.setattr(registry, "list_inverse_algorithms",
                        lambda cpu=False: ["newton_schulz_spd10_pallas"])
    # identity batch: fn(x)=x passes the 1e-4 gate exactly
    monkeypatch.setattr(registry, "get_inverse_algorithm",
                        lambda name: (lambda x: x))

    a = np.broadcast_to(np.eye(8, dtype=np.float32), (4, 8, 8)).copy()
    emitter = bench._Emitter(floor_ms=0.016)
    t0 = time.monotonic()
    # budget must clear the escalation guard (escalating = fresh compiles,
    # skipped when < 120 s of budget remains)
    bench._run(emitter, a, deadline=t0 + 600, t0=t0, budget_s=600)

    # [16, 64]: escalation retry; trailing [64]: the r4 winner-resample
    # pass that tops the kept set up to ≥10 samples (VERDICT r3 next #4)
    assert calls == [16, 64, 64], "expected retry then one resample block"
    assert emitter.best is not None
    assert emitter.best["name"] == "newton_schulz_spd10_pallas"
    assert emitter.best["ms"] == pytest.approx(0.05, rel=1e-6)
    assert emitter.best["kept"] == 10
    # r5: the real slope measurement displaced the gate-fallback bound
    assert emitter.best["phase"] is None


def test_run_banks_gate_fallback_when_chain_compiles_wedge(monkeypatch,
                                                           capsys):
    """VERDICT r4 next #3 'done when': with the (mocked) compile path
    dead after the gate, the run must still print a NONZERO line — the
    r4 driver run published 0.0 three times past a passed gate."""
    import time

    from cuda_matrix_inversion_tpu.bench import timing
    from cuda_matrix_inversion_tpu.ops import registry

    bench = _load_bench()

    def wedged_samples(fn, x0, iters=16, trials=5):
        raise RuntimeError("compile helper wedged (mock)")

    monkeypatch.setattr(timing, "chained_op_samples", wedged_samples)
    monkeypatch.setattr(registry, "list_inverse_algorithms",
                        lambda cpu=False: ["newton_schulz_spd10_pallas"])
    monkeypatch.setattr(registry, "get_inverse_algorithm",
                        lambda name: (lambda x: x))

    a = np.broadcast_to(np.eye(8, dtype=np.float32), (4, 8, 8)).copy()
    emitter = bench._Emitter(floor_ms=0.016)
    t0 = time.monotonic()
    bench._run(emitter, a, deadline=t0 + 600, t0=t0, budget_s=600)

    # the gate passed, so a gate-fallback bound must have been banked
    assert emitter.best is not None
    assert emitter.best["phase"] == "gate-fallback"
    assert emitter.best["ms"] > 0.0
    assert emitter.emit() == 0
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] > 0.0
    assert line["detail"]["phase"] == "gate-fallback"


def test_emitter_gate_fallback_not_ledgered(capsys, tmp_path):
    # fallback bounds are crude upper bounds; they must not enter the
    # cross-session slope ledger
    bench = _load_bench()
    bench._SESSIONS_PATH = str(tmp_path / "ledger.txt")
    e = bench._Emitter(floor_ms=0.016)
    e.update("x", 50.0, (50.0, 50.0), 0, 3, kept=3, phase="gate-fallback")
    assert e.emit() == 0
    line = json.loads(capsys.readouterr().out.strip())
    assert line["detail"]["phase"] == "gate-fallback"
    assert not os.path.exists(bench._SESSIONS_PATH)


# --- sweep: square kind end-to-end + audit wiring -----------------------

def test_sweep_square_kind_end_to_end(tmp_path):
    from cuda_matrix_inversion_tpu.bench import sweep
    from cuda_matrix_inversion_tpu.io.fixtures import generate_square_fixtures

    root = tmp_path / "fx"
    generate_square_fixtures(str(root / "square_5_8x8"), 8, 5, seed=3)
    out = tmp_path / "square-bench.txt"
    rc = sweep.main(["square", str(root), "--reps", "1", "--dups", "1",
                     "--out", str(out), "--backend", "cpu",
                     "--algorithms", "lu,gauss_pallas"])
    assert rc == 0
    rows = [ln.split() for ln in open(out) if ln.strip()]
    assert {r[3] for r in rows} == {"lu", "gauss_pallas"}
    assert all(float(r[-1]) < 1e-4 for r in rows)  # L1 vs shipped aInv
    assert (tmp_path / "square-bench-errors.txt").exists()


# --- chip-test ledger plumbing (weak #6: undated on-chip claims) -------

def test_chip_test_ledger_plumbing(tmp_path):
    from cuda_matrix_inversion_tpu.bench import chip_tests

    ledger = tmp_path / "chip-tests.txt"
    progress = tmp_path / "progress.txt"
    calls = []
    checks = [
        ("ok_check", lambda: (calls.append("ok") or True, "err=1e-6")),
        ("fail_check", lambda: (False, "err=2e-4")),
        ("boom_check", lambda: 1 / 0),
    ]
    rc = chip_tests.run(str(ledger), str(progress), budget_s=None,
                        checks=checks, require_tpu=False,
                        stamp="2026-08-18T00:00:00")
    assert rc == 1  # failures present
    lines = open(ledger).read().splitlines()
    assert len(lines) == 3
    assert "ok_check PASS" in lines[0]
    assert "fail_check FAIL" in lines[1]
    assert "boom_check FAIL EXCEPTION" in lines[2]
    # resumable: a second run skips everything already recorded — but
    # the completion rc derives from the LEDGER, so earlier-chunk FAILs
    # are not forgotten (code-review r5)
    rc2 = chip_tests.run(str(ledger), str(progress), budget_s=None,
                         checks=checks, require_tpu=False,
                         stamp="2026-08-18T00:00:01")
    assert rc2 == 1 and calls == ["ok"]
    assert len(open(ledger).read().splitlines()) == 3
    # a re-measured fix supersedes its FAIL: append PASS rows for the
    # two failed names and the completed run goes green
    with open(ledger, "a") as f:
        f.write("2026-08-18T00:00:02 fail_check PASS err=1e-6\n")
        f.write("2026-08-18T00:00:03 boom_check PASS err=1e-6\n")
    rc3 = chip_tests.run(str(ledger), str(progress), budget_s=None,
                         checks=checks, require_tpu=False,
                         stamp="2026-08-18T00:00:04")
    assert rc3 == 0


def test_chip_test_budget_exhaustion_returns_3(tmp_path):
    from cuda_matrix_inversion_tpu.bench import chip_tests

    ledger = tmp_path / "ledger.txt"
    checks = [("a", lambda: (True, "x")), ("b", lambda: (True, "x"))]
    rc = chip_tests.run(str(ledger), None, budget_s=-1.0, checks=checks,
                        require_tpu=False, stamp="t")
    assert rc == 3
    assert not os.path.exists(ledger) or open(ledger).read() == ""


def test_chip_test_refuses_cpu_backend(tmp_path):
    from cuda_matrix_inversion_tpu.bench import chip_tests

    rc = chip_tests.run(str(tmp_path / "l.txt"), None, None,
                        checks=[], require_tpu=True)
    assert rc == 2  # tests force the CPU backend


def test_bench_sigterm_yields_valid_json_line():
    # the round-2 failure mode, end-to-end: kill mid-run, parse stdout
    import signal
    import time

    env = dict(os.environ, BENCH_BACKEND="cpu", BENCH_BUDGET_S="600")
    proc = subprocess.Popen([sys.executable, os.path.join(REPO_ROOT, "bench.py")],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            env=env, cwd=REPO_ROOT)
    time.sleep(8)  # mid-startup/compile
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    line = json.loads(out.decode().strip().splitlines()[-1])
    assert line["metric"].startswith("batched_inversions_per_sec")
    assert "value" in line and "vs_baseline" in line
