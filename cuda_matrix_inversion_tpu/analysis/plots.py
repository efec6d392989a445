"""Benchmark result analysis & plotting — matplotlib port of the MATLAB layer.

Reference counterparts (SURVEY §2.2 / L8): ``results/generate_plots.m``
(grpstats mean/std over timers → runtime + stacked partial-time plots),
``results/plotdimension.m`` + ``sortedplot.m`` (per-dimension
runtime-vs-batch curves with 99 % confidence intervals via t-scores).

Input formats (both produced by our CLIs and by the reference):

* bench rows: ``numMatrices N numReps name total_ms [mean_ms var_ms] err``
* stage rows (DETAILED_LOGGING): ``name,numMatrices,n,ms,ns``
"""

from __future__ import annotations

import dataclasses
import math
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class BenchRow:
    num_matrices: int
    n: int
    num_reps: int
    name: str
    total_ms: float
    mean_ms: Optional[float]
    var_ms: Optional[float]
    avg_error: float


def parse_bench_file(path: str) -> List[BenchRow]:
    """Parse space-separated bench rows (ref ``results/inverse-bench-errors.txt``
    format, ``inverse_bench.c:53-62``)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 6:
                nm, n, reps, name, total, err = parts
                rows.append(BenchRow(int(nm), int(n), int(reps), name,
                                     float(total), None, None, float(err)))
            elif len(parts) == 8:
                nm, n, reps, name, total, mean, var, err = parts
                rows.append(BenchRow(int(nm), int(n), int(reps), name,
                                     float(total), float(mean), float(var),
                                     float(err)))
    return rows


def parse_stage_file(path: str) -> Dict[str, List[float]]:
    """Parse ``name,numMatrices,n,ms,ns`` stage CSV (ref ``timer.h:8-9``)."""
    out: Dict[str, List[float]] = defaultdict(list)
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) == 5:
                name, _, _, _, ns = parts
                try:
                    out[name].append(float(ns) / 1e6)
                except ValueError:
                    continue
    return dict(out)


def _t99(dof: int) -> float:
    """Two-sided 99% t-score (ref ``sortedplot.m:5-10`` uses tinv)."""
    from scipy import stats

    return float(stats.t.ppf(0.995, max(dof, 1)))


def plot_runtime_vs_dimension(rows: List[BenchRow], out_path: str,
                              num_matrices: Optional[int] = None) -> str:
    """Runtime-vs-N curves, one line per algorithm (ref
    ``generate_plots.m`` runtime plot)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if num_matrices is not None:
        rows = [r for r in rows if r.num_matrices == num_matrices]
    series: Dict[str, Dict[int, float]] = defaultdict(dict)
    for r in rows:
        series[r.name][r.n] = r.total_ms / r.num_reps

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for name, pts in sorted(series.items()):
        ns = sorted(pts)
        ax.plot(ns, [pts[n] for n in ns], marker="o", label=name)
    ax.set_xlabel("matrix dimension N")
    ax.set_ylabel("runtime per rep (ms)")
    ax.set_yscale("log")
    ax.set_xscale("log", base=2)
    ax.legend(fontsize=7)
    ax.set_title(f"batched inversion runtime ({rows[0].num_matrices if rows else '?'} matrices)")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path


def plot_runtime_vs_batch(rows: List[BenchRow], n: int, out_path: str) -> str:
    """Runtime-vs-batch-size for a fixed dimension, with 99% CI whiskers
    when per-rep stats exist (ref ``plotdimension.m`` + ``sortedplot.m``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = [r for r in rows if r.n == n]
    series: Dict[str, Dict[int, BenchRow]] = defaultdict(dict)
    for r in rows:
        series[r.name][r.num_matrices] = r

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for name, pts in sorted(series.items()):
        bs = sorted(pts)
        ys = [pts[b].total_ms / pts[b].num_reps for b in bs]
        errs = []
        for b in bs:
            r = pts[b]
            if r.mean_ms is not None and r.num_reps > 1:
                sd = math.sqrt(max(r.var_ms, 0.0))
                errs.append(_t99(r.num_reps - 1) * sd / math.sqrt(r.num_reps))
            else:
                errs.append(0.0)
        ax.errorbar(bs, ys, yerr=errs, marker="o", capsize=3, label=name)
    ax.set_xlabel("batch size (num matrices)")
    ax.set_ylabel("runtime per rep (ms)")
    ax.set_yscale("log")
    ax.set_xscale("log", base=2)
    ax.legend(fontsize=7)
    ax.set_title(f"runtime vs batch size @ N={n} (99% CI)")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path


def plot_stage_split(stages: Dict[str, List[float]], out_path: str) -> str:
    """Stacked per-stage time bar (ref ``generate_plots.m`` partial-time
    stacked plot over the DETAILED_LOGGING timers)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(stages)
    means = [float(np.mean(stages[k])) for k in names]
    fig, ax = plt.subplots(figsize=(7, 3.5))
    left = 0.0
    for name, m in zip(names, means):
        ax.barh(["pipeline"], [m], left=left, label=f"{name} ({m:.2f} ms)")
        left += m
    ax.set_xlabel("time (ms)")
    ax.legend(fontsize=6, loc="center left", bbox_to_anchor=(1, 0.5))
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Plot bench CSVs (matplotlib port of results/*.m)")
    p.add_argument("bench_file")
    p.add_argument("--out-dir", default="results/plots")
    p.add_argument("--dims", type=int, nargs="*", default=[128])
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    rows = parse_bench_file(args.bench_file)
    made = [plot_runtime_vs_dimension(rows, os.path.join(args.out_dir, "runtime_vs_dim.png"))]
    for n in args.dims:
        made.append(plot_runtime_vs_batch(
            rows, n, os.path.join(args.out_dir, f"runtime_vs_batch_n{n}.png")))
    print("\n".join(made))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
