#!/usr/bin/env bash
# Resumable one-chunk driver for ALL pending real-chip work (round 5).
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
#   1 chip_tests     on-chip claim ledger (incl. the r5 rows: lu_hiacc,
#                    lu_bign gate + A/B, 10k GP/fit) -> results/chip-tests.txt
#   2 ab_*           r5 LU trail-unscatter A/B  -> results/kernel-ab-r5.jsonl
#   3 bench_warm     pre-compile bench graphs into the persistent cache
#   4 bench_headline bench.py JSON line     -> results/bench-sessions.txt
#   5 sweep_square   fresh sweep (roster grew: lu_bign_pallas, lu_hiacc)
#   6 sweep_inverse  refresh (lu_pallas default changed: trail unscatter)
#   7 sweep_gauss
#   8 plots          (CPU) regenerate       -> results/plots/
set -u
cd "$(dirname "$0")/.."

STATE=${CMI_CHIP_STATE:-/tmp/cmi_chip_session_r5}
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

# ---- 2. r5 kernel A/B: LU trailing-rows unscatter (VERDICT r4 next #8,
# the slipped r3 #7 debt) at the quoted 1600x128 shape.  Baseline r3:
# lu_pallas 14.8 ms; the REPORT records the result either way.
ab_experiment() { # stage_name label import_path fn kwargs gate(1/0) [num n kind]
    local stage=$1 label=$2 imp=$3 fn=$4 kwargs=$5 gate=$6
    local num=${7:-1600} n=${8:-128} kind=${9:-spd}
    if ! stage_done "$stage"; then
        say "stage $stage"
        if AB_LABEL="$label" AB_IMPORT="$imp" AB_FN="$fn" \
           AB_KWARGS="$kwargs" AB_GATE="$gate" \
           AB_NUM="$num" AB_N="$n" AB_KIND="$kind" \
           python - >> results/kernel-ab-r5.jsonl 2> "$STATE/$stage.log" <<'PYEOF'
import functools, json, os
import numpy as np
mod = __import__(os.environ["AB_IMPORT"], fromlist=["_"])
fn = functools.partial(getattr(mod, os.environ["AB_FN"]),
                       **json.loads(os.environ["AB_KWARGS"]))
from cuda_matrix_inversion_tpu.bench.timing import chained_op_seconds
from cuda_matrix_inversion_tpu.io.fixtures import (make_spd_batch,
                                                   make_square_batch)
from cuda_matrix_inversion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
num, n = int(os.environ["AB_NUM"]), int(os.environ["AB_N"])
make = make_spd_batch if os.environ["AB_KIND"] == "spd" else make_square_batch
a = make(num, n, np.random.default_rng(7)).astype(np.float32)
sec = max(chained_op_seconds(fn, a, iters=4, trials=3), 1e-9)
row = {"algorithm": os.environ["AB_LABEL"], "num": num, "n": n,
       "batch_ms": round(sec * 1e3, 3)}
if os.environ["AB_GATE"] == "1":
    from cuda_matrix_inversion_tpu.bench.reporting import identity_error_inf
    row["max_identity_err_inf"] = float(
        f"{identity_error_inf(a[:32], np.asarray(fn(a[:32]))):.3e}")
print(json.dumps(row))
PYEOF
        then
            tail -1 results/kernel-ab-r5.jsonl
        else
            say "$stage FAILED (see $STATE/$stage.log)"
            echo "{\"algorithm\": \"$label\", \"failed\": true}" \
                >> results/kernel-ab-r5.jsonl
        fi
        mark_done "$stage"
        checkpoint
    fi
}
ab_experiment ab_lu_trail "lu_pallas[trail_unscatter]" \
    cuda_matrix_inversion_tpu.ops.pallas_lu inverse_lu \
    '{"_trail_unscatter": true}' 1
ab_experiment ab_lu_full "lu_pallas[full_unscatter]" \
    cuda_matrix_inversion_tpu.ops.pallas_lu inverse_lu \
    '{"_trail_unscatter": false}' 1
ab_experiment ab_lu_trail_factoronly "lu_pallas[trail,factor_only]" \
    cuda_matrix_inversion_tpu.ops.pallas_lu inverse_lu \
    '{"_trail_unscatter": true, "_factor_only": true}' 0

# the r3 "<5 ms at 100x512 general" bar, quantified across every lane
# that serves the shape (VERDICT r4 next #2 "or the REPORT records a
# quantified negative result"): XLA LU (the shipped default route) vs
# the pan500 XLA-HIGH lane (kappa<=500 class; square fixtures are
# kappa<=4n) vs lu_bign
ab_experiment ab512_xla_lu "lu[xla]@512" \
    cuda_matrix_inversion_tpu.ops.xla inverse_lu '{}' 1 100 512 square
ab_experiment ab512_pan500 "newton_schulz_pan500@512" \
    cuda_matrix_inversion_tpu.ops.newton_schulz \
    inverse_newton_schulz_pallas '{"precision": "split3"}' 1 100 512 square

# ---- 3. warm the persistent compile cache with bench.py's exact graphs
# (VERDICT r4 weak #4d: a cold cache under slow-mode compiles published
# 0.0; the judge measured warm-cache flips it to 310x) ------------------
if ! stage_done bench_warm; then
    say "stage bench_warm"
    budget=$(( CHUNK_S - $(elapsed) ))
    [ "$budget" -lt 120 ] && exit 3
    BENCH_WARM_BUDGET_S=$budget python bench.py --warm \
        2>&1 | tee -a "$STATE/bench_warm.log"
    rc=${PIPESTATUS[0]}
    case $rc in
        0) mark_done bench_warm ;;   # full coverage ("warm: done")
        3) exit 3 ;;                 # budget exhausted; rerun resumes
        *) say "bench --warm rc=$rc"; exit $rc ;;
    esac
    checkpoint
fi

# ---- 4. headline bench.py session --------------------------------------
if ! stage_done bench_headline; then
    say "stage bench_headline"
    checkpoint
    BENCH_BUDGET_S=340 python bench.py > "$STATE/bench.json"
    rc=$?
    [ $rc -ne 0 ] && { say "bench.py rc=$rc"; exit $rc; }
    cat "$STATE/bench.json"
    mark_done bench_headline
    checkpoint
fi

# ---- 5-7. sweeps (square first: its roster grew this round; then the
# refreshes — lu_pallas rows move with the trail-unscatter default) ------
run_sweep() { # kind outfile
    local kind=$1 out=$2
    if ! stage_done "sweep_$kind"; then
        say "stage sweep_$kind"
        if [ ! -f "$STATE/sweep_$kind.started" ]; then
            # truncate once so changed kernels re-measure every row —
            # but ONLY when there is no completed progress (a stale
            # progress file + fresh truncation once wiped
            # square-bench.txt; sweep.py also refuses to audit an empty
            # table, belt and braces)
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
run_sweep square results/square-bench.txt
run_sweep inverse results/inverse-bench.txt
run_sweep gauss results/gauss-bench.txt

# ---- 8. plots (CPU-only) ------------------------------------------------
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
