#!/usr/bin/env bash
# Resumable one-chunk driver for ALL pending real-chip work (round 3).
#
# The dev-tunnel TPU is reachable only from bounded FOREGROUND calls
# (CLAUDE.md "TPU environment gotchas"), so chip work runs as chunks:
#
#     timeout 590 bash tools/chip_session.sh      # repeat until rc != 3
#
# rc 3  = work remains (rerun to resume)
# rc 0  = every stage complete, ledger all-PASS
# rc 4  = every stage complete but the claim ledger recorded FAILs
# rc 17 = tunnel wedged at first device contact (utils/backend watchdog)
# other = a stage genuinely failed; see the stage log under $STATE
#
# Stages, priority-ordered (markers in $STATE survive reruns):
#   1 chip_tests     on-chip claim ledger   -> results/chip-tests.txt
#   2 ab_*           r3 kernel-rewrite A/B  -> results/kernel-ab-r3.jsonl
#   3 bench_headline bench.py JSON line     -> results/bench-sessions.txt
#   4 sweep_inverse  fresh full sweep       -> results/inverse-bench.txt
#   5 sweep_gauss                           -> results/gauss-bench.txt
#   6 sweep_square                          -> results/square-bench.txt
#   7 plots          (CPU) regenerate       -> results/plots/
set -u
cd "$(dirname "$0")/.."

STATE=${CMI_CHIP_STATE:-/tmp/cmi_chip_session}
FIXTURES=${FIXTURES:-/tmp/cmi_fixtures}
CHUNK_S=${CMI_CHUNK_S:-420}       # stop STARTING stages after this
T0=$(date +%s)
mkdir -p "$STATE" results

say() { echo "chip_session: $*" >&2; }
elapsed() { echo $(( $(date +%s) - T0 )); }
stage_done() { [ -f "$STATE/$1.done" ]; }
mark_done() { date -Is > "$STATE/$1.done"; }
# call between stages: exit 3 if the chunk budget is spent
checkpoint() { [ "$(elapsed)" -ge "$CHUNK_S" ] && exit 3 || true; }

# Quick tunnel probe so a wedged tunnel costs 100 s, not the whole chunk.
timeout 100 python -c "import jax; jax.devices()" >/dev/null 2>&1
rc=$?
if [ $rc -ne 0 ]; then
    say "tunnel probe failed (rc=$rc) — chip unreachable, try later"
    exit 17
fi

# ---- 1. on-chip claim ledger ------------------------------------------
if ! stage_done chip_tests; then
    say "stage chip_tests"
    budget=$(( CHUNK_S - $(elapsed) ))
    python -m cuda_matrix_inversion_tpu.bench.chip_tests \
        --progress "$STATE/chip_tests.progress" --budget-s "$budget" \
        2>&1 | tee -a "$STATE/chip_tests.log"
    rc=${PIPESTATUS[0]}
    case $rc in
        3) exit 3 ;;              # budget hit; rerun resumes
        # rc 1 = claims FAILED: the queue keeps moving (later stages are
        # independent measurements) but the session must NOT end 0 —
        # SESSION-COMPLETE checks this marker and exits 4.
        0|1) echo "rc=$rc" > "$STATE/chip_tests.done" ;;
        *) say "chip_tests rc=$rc"; exit $rc ;;
    esac
    checkpoint
fi

# ---- 2. kernel-rewrite A/B at the 1600x128 quoted shape ----------------
# r2 baselines (REPORT §5): gauss 13.90 ms, lu 17.32, cholesky 5.24.
for alg in gauss_pallas lu_pallas cholesky_pallas; do
    if ! stage_done "ab_$alg"; then
        say "stage ab_$alg"
        if python -m cuda_matrix_inversion_tpu.bench.scale_bench \
            --num 1600 --n 128 --algorithm "$alg" \
            >> results/kernel-ab-r3.jsonl 2> "$STATE/ab_$alg.log"; then
            tail -1 results/kernel-ab-r3.jsonl
        else
            # a Mosaic rejection/kernel failure is a RESULT (revert that
            # rewrite) — record it and keep the session moving
            say "ab_$alg FAILED (see $STATE/ab_$alg.log)"
            echo "{\"algorithm\": \"$alg\", \"failed\": true}" \
                >> results/kernel-ab-r3.jsonl
        fi
        mark_done "ab_$alg"
        checkpoint
    fi
done

# ---- 2b. kernel experiments at the same shape: steps=4 bodies (GJ
# predicted 1.5 VMEM passes/col vs 2.0; LU/Cholesky quarter the fused
# stores on the latency-bound chains) and the LU factor-only phase split
# (VERDICT r2 #9 evidence: where does the remaining LU-vs-GJ gap live?).
# One shared measurement body, parameterized per experiment.
ab_experiment() { # stage_name label import_path fn kwargs gate(1/0)
    local stage=$1 label=$2 imp=$3 fn=$4 kwargs=$5 gate=$6
    if ! stage_done "$stage"; then
        say "stage $stage"
        if AB_LABEL="$label" AB_IMPORT="$imp" AB_FN="$fn" \
           AB_KWARGS="$kwargs" AB_GATE="$gate" \
           python - >> results/kernel-ab-r3.jsonl 2> "$STATE/$stage.log" <<'PYEOF'
import functools, json, os
import numpy as np
mod = __import__(os.environ["AB_IMPORT"], fromlist=["_"])
fn = functools.partial(getattr(mod, os.environ["AB_FN"]),
                       **json.loads(os.environ["AB_KWARGS"]))
from cuda_matrix_inversion_tpu.bench.timing import chained_op_seconds
from cuda_matrix_inversion_tpu.io.fixtures import make_spd_batch
a = make_spd_batch(1600, 128, np.random.default_rng(7)).astype(np.float32)
sec = max(chained_op_seconds(fn, a, iters=4, trials=3), 1e-9)
row = {"algorithm": os.environ["AB_LABEL"], "batch_ms": round(sec * 1e3, 3)}
if os.environ["AB_GATE"] == "1":
    from cuda_matrix_inversion_tpu.bench.reporting import identity_error_inf
    row["max_identity_err_inf"] = float(
        f"{identity_error_inf(a[:32], np.asarray(fn(a[:32]))):.3e}")
print(json.dumps(row))
PYEOF
        then
            tail -1 results/kernel-ab-r3.jsonl
        else
            say "$stage FAILED (see $STATE/$stage.log)"
            echo "{\"algorithm\": \"$label\", \"failed\": true}" \
                >> results/kernel-ab-r3.jsonl
        fi
        mark_done "$stage"
        checkpoint
    fi
}
ab_experiment ab_gauss_steps4 "gauss_pallas[steps=4]" \
    cuda_matrix_inversion_tpu.ops.pallas_gauss_jordan inverse_gauss_jordan \
    '{"steps": 4}' 1
ab_experiment ab_lu_steps4 "lu_pallas[steps=4]" \
    cuda_matrix_inversion_tpu.ops.pallas_lu inverse_lu '{"steps": 4}' 1
ab_experiment ab_lu_factoronly "lu_pallas[factor_only]" \
    cuda_matrix_inversion_tpu.ops.pallas_lu inverse_lu \
    '{"_factor_only": true}' 0
ab_experiment ab_cholesky_steps4 "cholesky_pallas[steps=4]" \
    cuda_matrix_inversion_tpu.ops.pallas_cholesky inverse_cholesky \
    '{"steps": 4}' 1

# ---- 3. headline bench.py session --------------------------------------
if ! stage_done bench_headline; then
    say "stage bench_headline"
    checkpoint
    BENCH_BUDGET_S=340 python bench.py > "$STATE/bench.json"
    rc=$?
    [ $rc -ne 0 ] && { say "bench.py rc=$rc"; exit $rc; }
    cat "$STATE/bench.json" >> results/bench-sessions.txt
    cat "$STATE/bench.json"
    mark_done bench_headline
    checkpoint
fi

# ---- 4-6. full sweeps (fresh files: the rewritten kernels re-measure
# every row; old tables live in git history) -----------------------------
run_sweep() { # kind outfile
    local kind=$1 out=$2
    if ! stage_done "sweep_$kind"; then
        say "stage sweep_$kind"
        if [ ! -f "$STATE/sweep_$kind.started" ]; then
            # truncate once so the rewritten kernels re-measure every row —
            # but ONLY when there is no completed progress: a progress file
            # from a manual run of the same sweep with a missing .started
            # marker must not wipe the installed table (this happened to
            # square-bench.txt in r3; sweep.py now also refuses to audit
            # an empty table, belt and braces)
            if [ ! -s "$STATE/sweep_$kind.progress" ]; then
                : > "$out"        # truncate once; resume appends
            fi
            date -Is > "$STATE/sweep_$kind.started"
        fi
        local budget=$(( CHUNK_S - $(elapsed) ))
        [ "$budget" -lt 60 ] && exit 3
        python -m cuda_matrix_inversion_tpu.bench.sweep "$kind" "$FIXTURES" \
            --reps "${BENCH_REPS:-10}" --max-dups "${BENCH_MAX_DUPS:-16}" \
            --out "$out" --progress "$STATE/sweep_$kind.progress" \
            --budget-s "$budget" 2>&1 | tee -a "$STATE/sweep_$kind.log"
        local rc=${PIPESTATUS[0]}
        case $rc in
            3) exit 3 ;;
            0) mark_done "sweep_$kind" ;;
            *) say "sweep_$kind rc=$rc"; exit $rc ;;
        esac
        checkpoint
    fi
}
run_sweep inverse results/inverse-bench.txt
run_sweep gauss results/gauss-bench.txt
run_sweep square results/square-bench.txt

# ---- 7. plots (CPU-only) ------------------------------------------------
if ! stage_done plots; then
    say "stage plots"
    python -m cuda_matrix_inversion_tpu.analysis.plots \
        results/inverse-bench.txt --out-dir results/plots
    python -m cuda_matrix_inversion_tpu.analysis.plots \
        results/gauss-bench.txt --out-dir results/plots/gauss
    python -m cuda_matrix_inversion_tpu.analysis.plots \
        results/square-bench.txt --out-dir results/plots/square
    mark_done plots
fi

if grep -q "rc=1" "$STATE/chip_tests.done" 2>/dev/null; then
    say "SESSION-COMPLETE (with claim-ledger FAILs — see results/chip-tests.txt)"
    exit 4
fi
say "SESSION-COMPLETE"
exit 0
