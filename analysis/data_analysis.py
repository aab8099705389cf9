"""Paper-style analysis: improvement tables, speedups, parameter efficiency.

Behavioural port of the reference analysis/data_analysis.py (353 LoC): from
``experiment_results.csv`` produce

  * Table 1 — full fine-tuning: per (domain, scheme) improvement % of the
    primary metric vs b1, plus convergence speedup (b1 epochs / scheme epochs);
  * Table 2 — linear probing: same, plus parameter efficiency
    (full-FT trainable params / linear-probe trainable params per domain);
  * Table 3 — per-scheme aggregate means across domains;
  * heatmaps of improvement % per (domain, scheme) for both strategies.

Primary metric: AUC for LP domains, accuracy otherwise (as the reference's
model selection, finetune.py:269).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnn_pretraining_tpu import config  # noqa: E402

RESULTS_DIR = Path(__file__).resolve().parent / "results"


def primary_metric(domain: str) -> str:
    return "auc" if config.TASK_TYPES[domain] == "link_prediction" else "accuracy"


def _agg(df: pd.DataFrame) -> pd.DataFrame:
    """Mean over seeds per (domain, strategy, scheme)."""
    rows = []
    for (d, st, sc), g in df.groupby(["domain", "strategy", "scheme"]):
        row = {"domain": d, "strategy": st, "scheme": sc,
               "n_seeds": len(g),
               "metric": g[primary_metric(d)].mean(),
               "convergence_epochs": g["convergence_epochs"].mean()
               if "convergence_epochs" in g else np.nan,
               "trainable_parameters": g["trainable_parameters"].mean()
               if "trainable_parameters" in g else np.nan}
        rows.append(row)
    return pd.DataFrame(rows)


def improvement_table(agg: pd.DataFrame, strategy: str) -> pd.DataFrame:
    sub = agg[agg.strategy == strategy]
    out = []
    for domain, g in sub.groupby("domain"):
        base = g[g.scheme == "b1"]
        if base.empty:
            continue
        b_metric = float(base.metric.iloc[0])
        b_epochs = float(base.convergence_epochs.iloc[0])
        for _, r in g.iterrows():
            if r.scheme == "b1":
                continue
            out.append({
                "domain": domain,
                "scheme": r.scheme,
                "metric": r.metric,
                "b1_metric": b_metric,
                "improvement_pct": 100.0 * (r.metric - b_metric)
                / max(abs(b_metric), 1e-12),
                "speedup": b_epochs / max(r.convergence_epochs, 1e-12)
                if np.isfinite(b_epochs) else np.nan,
            })
    return pd.DataFrame(out)


def parameter_efficiency(agg: pd.DataFrame) -> pd.DataFrame:
    """Full-FT trainable params / linear-probe trainable params per domain."""
    out = []
    for domain, g in agg.groupby("domain"):
        full = g[(g.strategy == "full_finetune")]
        lin = g[(g.strategy == "linear_probe")]
        if full.empty or lin.empty:
            continue
        out.append({
            "domain": domain,
            "full_ft_params": full.trainable_parameters.mean(),
            "linear_probe_params": lin.trainable_parameters.mean(),
            "parameter_efficiency":
                full.trainable_parameters.mean()
                / max(lin.trainable_parameters.mean(), 1.0),
        })
    return pd.DataFrame(out)


def scheme_analysis(agg: pd.DataFrame) -> pd.DataFrame:
    """Per-scheme mean improvement across domains (reference Table 3)."""
    rows = []
    for strategy in config.FINETUNE_STRATEGIES:
        imp = improvement_table(agg, strategy)
        if imp.empty:
            continue
        for scheme, g in imp.groupby("scheme"):
            rows.append({"strategy": strategy, "scheme": scheme,
                         "mean_improvement_pct": g.improvement_pct.mean(),
                         "max_improvement_pct": g.improvement_pct.max(),
                         "mean_speedup": g.speedup.mean()})
    return pd.DataFrame(rows)


def create_heatmap(imp: pd.DataFrame, strategy: str, out_path: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if imp.empty:
        return
    pivot = imp.pivot_table(index="domain", columns="scheme",
                            values="improvement_pct")
    fig, ax = plt.subplots(figsize=(10, 5))
    im = ax.imshow(pivot.values, cmap="RdYlGn", aspect="auto",
                   vmin=-40, vmax=40)
    ax.set_xticks(range(len(pivot.columns)), pivot.columns)
    ax.set_yticks(range(len(pivot.index)), pivot.index)
    for i in range(pivot.shape[0]):
        for j in range(pivot.shape[1]):
            v = pivot.values[i, j]
            if np.isfinite(v):
                ax.text(j, i, f"{v:+.1f}", ha="center", va="center",
                        fontsize=8)
    ax.set_title(f"Improvement % vs b1 — {strategy}")
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", type=str,
                        default=str(RESULTS_DIR / "experiment_results.csv"))
    args = parser.parse_args()
    try:
        df = pd.read_csv(args.results)
    except (FileNotFoundError, pd.errors.EmptyDataError):
        print(f"No results to analyze in {args.results}; run the sweep first.")
        return
    RESULTS_DIR.mkdir(parents=True, exist_ok=True)

    agg = _agg(df)
    t1 = improvement_table(agg, "full_finetune")
    t1.to_csv(RESULTS_DIR / "table1_full_finetuning.csv", index=False)
    t2 = improvement_table(agg, "linear_probe")
    pe = parameter_efficiency(agg)
    t2 = t2.merge(pe[["domain", "parameter_efficiency"]], on="domain",
                  how="left") if not t2.empty else t2
    t2.to_csv(RESULTS_DIR / "table2_linear_probing.csv", index=False)
    t3 = scheme_analysis(agg)
    t3.to_csv(RESULTS_DIR / "table3_scheme_analysis.csv", index=False)
    pe.to_csv(RESULTS_DIR / "table4_parameter_efficiency.csv", index=False)

    create_heatmap(t1, "full_finetune",
                   RESULTS_DIR / "heatmap_full_finetune.png")
    create_heatmap(t2, "linear_probe",
                   RESULTS_DIR / "heatmap_linear_probe.png")
    print(f"Wrote tables 1-4 + heatmaps -> {RESULTS_DIR}")
    if not t3.empty:
        print(t3.to_string(index=False))


if __name__ == "__main__":
    main()
