"""Performance plotting — capability parity with the reference's
performance_plot.py: log-log variance/MSE vs cumulative spp (or time),
per-iteration grouping, convergence continuation plots, fixed-budget cross
sections, guided-vs-PT comparisons. Reads the CSVs written by the drivers
(PerformanceData schema: time, spp, cumm_spp, iteration, variance, mse).
"""
from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def _load(path):
    df = pd.read_csv(path)
    for c in ("variance", "mse"):
        if c in df:
            df[c] = pd.to_numeric(df[c], errors="coerce")
    return df


def plot_one_simulation_performance(csv_path, out_path, value="variance",
                                    x="cumm_spp", title=None):
    """Log-log value vs cumulative spp, one line per training iteration
    (reference plotOneSimulationPerformance, performance_plot.py:15-128)."""
    df = _load(csv_path)
    fig, ax = plt.subplots(figsize=(7, 5))
    for it, grp in df.groupby("iteration"):
        ax.plot(grp[x], grp[value], marker=".", label=f"iter {it}")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel(x)
    ax.set_ylabel(value)
    ax.set_title(title or Path(csv_path).stem)
    ax.legend(fontsize=7)
    ax.grid(True, which="both", alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_convergence_performance(csv_paths, labels, out_path,
                                 value="variance", x="cumm_spp", title=None):
    """Overlay several runs' convergence (reference
    plotConvergencePerformance, performance_plot.py:131-189)."""
    fig, ax = plt.subplots(figsize=(7, 5))
    for path, label in zip(csv_paths, labels):
        df = _load(path)
        ax.plot(df[x], df[value], marker=".", label=label)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel(x)
    ax.set_ylabel(value)
    ax.set_title(title or "convergence")
    ax.legend(fontsize=8)
    ax.grid(True, which="both", alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_variance_cross_section(csv_paths, labels, budgets, out_path,
                                value="variance"):
    """Value at fixed cumulative-spp budgets across runs (reference
    plotVarianceConvergenceCrossSection, performance_plot.py:215-273)."""
    fig, ax = plt.subplots(figsize=(7, 5))
    for path, label in zip(csv_paths, labels):
        df = _load(path)
        ys = []
        for b in budgets:
            sel = df[df.cumm_spp <= b]
            ys.append(sel[value].iloc[-1] if len(sel) else float("nan"))
        ax.plot(budgets, ys, marker="o", label=label)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("budget (cumulative spp)")
    ax.set_ylabel(value)
    ax.legend(fontsize=8)
    ax.grid(True, which="both", alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_guided_vs_pt(guided_csv, pt_csv, out_path, value="variance",
                      x="time"):
    """Guided vs unguided comparison (reference
    plotComparingVariancePatgGuideAndPTwNEE, performance_plot.py:326-392)."""
    plot_convergence_performance(
        [guided_csv, pt_csv], ["path guiding", "PT + NEE"], out_path,
        value=value, x=x, title="guided vs PT+NEE",
    )


def convert_to_incremental_spp(df):
    """Per-row spp deltas (reference convertToIncrementalSPPDataFrame,
    performance_plot.py:276-302)."""
    df = df.copy()
    df["incr_spp"] = df["cumm_spp"].diff().fillna(df["cumm_spp"])
    return df


def get_stop_training_spp_and_time(df):
    """First row where training stopped = last iteration start (reference
    getStopTrainingSPPAndTime, performance_plot.py:305-323)."""
    last_iter = df["iteration"].max()
    sel = df[df["iteration"] == last_iter]
    return float(sel["cumm_spp"].iloc[0]), float(sel["time"].iloc[0])


def average_simulations(csv_paths, out_path):
    """Cross-simulation averaging (reference repeat_high_spp_renderer.py:
    297-329: pd.concat(...).groupby(level=0).mean())."""
    dfs = [_load(p) for p in csv_paths]
    avg = pd.concat(dfs).groupby(level=0).mean(numeric_only=True)
    avg.to_csv(out_path, index=False)
    return avg


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="Plot driver CSVs (reference performance_plot.py parity)"
    )
    ap.add_argument("--perf-dir", required=True,
                    help="debug/<scene>/performance directory")
    ap.add_argument("--out", default=None, help="output directory (plots)")
    args = ap.parse_args()
    from pathlib import Path

    perf = Path(args.perf_dir)
    out = Path(args.out) if args.out else perf.parent / "plot"
    out.mkdir(parents=True, exist_ok=True)
    for name in ("variance_inIter", "mse_groundTruth_inIter",
                 "variance_endIter", "variance_estimated_final"):
        csv = perf / f"{name}.csv"
        if csv.exists():
            plot_one_simulation_performance(
                csv, out / f"{name}.png",
                value="mse" if "mse" in name else "variance",
            )
    guided = perf / "variance_groundTruth_inIter.csv"
    pt = perf / "pt_nee_variance.csv"
    if guided.exists() and pt.exists():
        plot_guided_vs_pt(guided, pt, out / "guided_vs_pt.png")
    print(f"plots written to {out}")
