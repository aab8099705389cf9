"""Side-by-side quality parity report: TPU build vs reference results.

Compares this build's ``analysis/results/experiment_results.csv`` (produced by
the production sweep; synthetic stand-in data calibrated per
``data/synthetic.py`` because the container has no egress) against the
reference's published ``/root/reference/analysis/results/experiment_results.csv``
(real Planetoid/TU data on an NVIDIA L4). For every (domain, strategy, scheme)
cell it reports the mean-over-seeds primary metric on both sides plus the
relative gain vs the b1 from-scratch baseline, which is the quantity the
reference paper reports (BASELINE.md "Best pretrained gains").

Writes ``analysis/results/parity_vs_reference.{csv,md}``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnn_pretraining_tpu import config  # noqa: E402

RESULTS = Path(__file__).resolve().parent.parent / "analysis" / "results"
REF_CSV = Path("/root/reference/analysis/results/experiment_results.csv")

# Reference column names -> ours (reference analysis/data_collection.py:85-113).
_REF_RENAME = {
    "domain_name": "domain",
    "finetune_strategy": "strategy",
    "pretrained_scheme": "scheme",
}


def _primary_metric(domain: str) -> str:
    return "auc" if domain.endswith("_LP") else "accuracy"


def _cell_means(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for (domain, strategy, scheme), g in df.groupby(
            ["domain", "strategy", "scheme"]):
        metric = _primary_metric(domain)
        rows.append({
            "domain": domain,
            "strategy": strategy,
            "scheme": scheme,
            "metric": metric,
            "value": g[metric].mean(),
            "n_seeds": len(g),
            "training_time": g["training_time"].mean(),
        })
    return pd.DataFrame(rows)


def build_report() -> pd.DataFrame:
    ours = _cell_means(pd.read_csv(RESULTS / "experiment_results.csv"))
    ref = _cell_means(
        pd.read_csv(REF_CSV).rename(columns=_REF_RENAME))
    merged = ours.merge(
        ref, on=["domain", "strategy", "scheme", "metric"],
        suffixes=("_tpu", "_ref"), how="outer")

    # Gain vs the b1 from-scratch baseline within (domain, strategy) — the
    # paper's headline quantity, robust to the synthetic-vs-real data shift.
    for side in ("tpu", "ref"):
        col = f"value_{side}"
        b1 = merged[merged.scheme == "b1"].set_index(
            ["domain", "strategy"])[col]
        base = merged.set_index(["domain", "strategy"]).index.map(b1)
        merged[f"gain_vs_b1_{side}"] = (merged[col].values - base) / base
    return merged


def main() -> None:
    rep = build_report()
    rep.to_csv(RESULTS / "parity_vs_reference.csv", index=False)

    lines = [
        "# Quality parity vs reference (provisional)",
        "",
        "TPU build runs on calibrated synthetic stand-ins (no egress; see",
        "`data/synthetic.py`), reference numbers are real-data L4 runs, so",
        "absolute values are indicative while **gain vs b1** is the",
        "like-for-like comparison (same data on both sides of each ratio).",
        "",
        f"Cells present: TPU {rep.value_tpu.notna().sum()} / "
        f"{len(config.FINETUNE_DOMAINS) * len(config.FINETUNE_STRATEGIES) * len(config.FINETUNE_SCHEMES)}"
        f", reference {rep.value_ref.notna().sum()}.",
        "",
        "| domain | strategy | scheme | metric | TPU | ref | TPU Δb1 | ref Δb1 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for _, r in rep.sort_values(["domain", "strategy", "scheme"]).iterrows():
        def fmt(v, pct=False):
            if pd.isna(v):
                return "—"
            return f"{v:+.1%}" if pct else f"{v:.4f}"
        lines.append(
            f"| {r.domain} | {r.strategy} | {r.scheme} | {r.metric} "
            f"| {fmt(r.value_tpu)} | {fmt(r.value_ref)} "
            f"| {fmt(r.gain_vs_b1_tpu, True)} | {fmt(r.gain_vs_b1_ref, True)} |")

    b1 = rep[(rep.scheme == "b1") & rep.value_tpu.notna()]
    if len(b1):
        diffs = (b1.value_tpu - b1.value_ref).abs()
        lines += [
            "",
            f"b1 absolute agreement (calibration check): mean |Δ| = "
            f"{diffs.mean():.4f}, max |Δ| = {diffs.max():.4f} over "
            f"{len(b1)} cells.",
        ]

    lines += [
        "",
        "Known divergence: NFM-bearing schemes (b2, s1) underperform their",
        "reference Δb1 on the NC domains. `analysis/results/nfm_probe.md`",
        "shows this is a synthetic-data artifact — it reproduces under the",
        "iid feature calibration used by the sweep and vanishes under a",
        "neighbor-correlated calibration, with a backbone-collapse mechanism",
        "diagnostic — not a behavioral defect (NFM audited line-by-line",
        "against the reference).",
    ]
    (RESULTS / "parity_vs_reference.md").write_text("\n".join(lines) + "\n")
    print(f"Wrote {RESULTS / 'parity_vs_reference.md'} ({len(rep)} cells)")


if __name__ == "__main__":
    main()
