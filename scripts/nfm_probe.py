"""NFM-transfer calibration probe (VERDICT r2 weak #2 / next-step #2).

Question: is the b2/s1 (NFM-scheme) transfer collapse a behavioural bug in
the NFM implementation, or an artifact of the synthetic stand-in data?

Mechanism under test: the default synthetic TU generator draws node features
iid given the GRAPH label, so a masked node's features carry no neighborhood
signal — the best NFM prediction is a constant (the class/batch mean), and
optimizing toward a constant actively collapses backbone feature diversity,
which destroys linear-probe transfer. Real TU data (reference
src/data/data_setup.py:75) has neighbor-correlated node features, so NFM
there is a meaningful structural task.

Experiment: pretrain b2 (NFM-only) and b3 (LP-only control) on TWO
calibrations of the same generator — `iid` (homophily 0.0, the production
stand-in) and `hom` (homophily 0.45: features smoothed over edges, i.e.
neighbor-predictable) — then linear-probe Cora_NC/CiteSeer_NC against b1.
If Δb1(b2) is strongly negative on `iid` but recovers on `hom` while
Δb1(b3) is stable across calibrations, the collapse is a property of the
data, not the code. A backbone feature-diversity diagnostic (mean pairwise
cosine similarity of h_final on a probe batch) checks the collapse mechanism
directly.

Runs on the CPU backend by default so it can execute alongside the
TPU-exclusive production sweep:
  nohup python scripts/nfm_probe.py > /tmp/nfm_probe.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--homophily", type=float, default=0.45)
    p.add_argument("--pretrain_epochs", type=int, default=15)
    p.add_argument("--finetune_epochs", type=int, default=0,
                   help="0 = the production per-domain default")
    p.add_argument("--schemes", nargs="+", default=["b2", "b3"])
    p.add_argument("--domains", nargs="+", default=["Cora_NC", "CiteSeer_NC"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--aggregation", default="coo")
    p.add_argument("--root", default="/tmp/nfm_probe")
    p.add_argument("--tpu", action="store_true",
                   help="run on the real chip instead of CPU")
    args = p.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from gnn_pretraining_tpu import config
    from gnn_pretraining_tpu.data.setup import main as setup_data
    from gnn_pretraining_tpu.finetune.finetune import finetune
    from gnn_pretraining_tpu.pretrain.pretrain import pretrain

    calibrations = {"iid": 0.0, "hom": args.homophily}
    results: dict = {}
    diversity: dict = {}

    for cal, h in calibrations.items():
        base = Path(args.root) / cal
        processed = base / "processed"
        out_root = base / "out"
        if not (processed / "ENZYMES.npz").exists():
            setup_data(processed_dir=processed, synthetic_scale=args.scale,
                       synthetic_homophily=h)

        for scheme in args.schemes:
            cfg = config.PretrainConfig(exp_name=scheme, seed=args.seed)
            ck = out_root / "pretrain" / f"model_{scheme}_{args.seed}.msgpack"
            if not ck.exists():
                t = time.time()
                res = pretrain(cfg, aggregation=args.aggregation,
                               epochs=args.pretrain_epochs, use_wandb=False,
                               processed_dir=processed, out_root=out_root)
                print(f"[{cal}] pretrain {scheme}: "
                      f"best_val={res['best_val_total']:.4f} "
                      f"({time.time()-t:.0f}s)", flush=True)
            diversity[f"{cal}/{scheme}"] = _feature_diversity(
                ck, processed, args.aggregation)

        for domain in args.domains:
            for scheme in ["b1"] + args.schemes:
                fcfg = config.FinetuneConfig(domain_name=domain,
                                             finetune_strategy="linear_probe",
                                             pretrained_scheme=scheme,
                                             seed=args.seed)
                t = time.time()
                res = finetune(fcfg, aggregation=args.aggregation,
                               epochs=args.finetune_epochs or None,
                               use_wandb=False,
                               processed_dir=processed, out_root=out_root)
                acc = res["test/accuracy"]
                results[f"{cal}/{domain}/{scheme}"] = acc
                print(f"[{cal}] finetune {domain} {scheme}: acc={acc:.4f} "
                      f"({time.time()-t:.0f}s)", flush=True)

    report(results, diversity, args)


def _feature_diversity(ckpt_path: Path, processed: Path, aggregation: str
                       ) -> dict:
    """Mean pairwise cosine similarity + participation ratio of backbone
    outputs on one ENZYMES probe batch: a collapsed backbone (all nodes
    mapped near one ray) shows cosine → 1 and participation ratio → 1."""
    import numpy as np

    from gnn_pretraining_tpu import config
    from gnn_pretraining_tpu.data.loaders import create_pretrain_val_loader
    from gnn_pretraining_tpu.models.pretrain_model import PretrainableGNN
    from gnn_pretraining_tpu.utils.checkpoint import load_checkpoint

    ck = load_checkpoint(ckpt_path)
    scheme = ckpt_path.stem.split("_")[1]
    domains = config.PRETRAIN_DOMAINS[scheme]
    tasks = config.ACTIVE_TASKS[scheme]
    batch = create_pretrain_val_loader("ENZYMES", processed_dir=processed)[0]
    model = PretrainableGNN(domain_names=tuple(domains), task_names=tuple(tasks),
                            aggregation=aggregation)
    h = model.apply({"params": ck["params"], "batch_stats": ck["batch_stats"]},
                    batch.x, batch.node_mask, "ENZYMES", False,
                    senders=batch.senders, receivers=batch.receivers,
                    edge_mask=batch.edge_mask)
    h = np.asarray(h)[np.asarray(batch.node_mask) > 0]
    hn = h / np.maximum(np.linalg.norm(h, axis=1, keepdims=True), 1e-9)
    cos = hn @ hn.T
    mean_cos = float((cos.sum() - len(h)) / (len(h) * (len(h) - 1)))
    # participation ratio of the covariance spectrum
    c = np.cov(h.T)
    ev = np.maximum(np.linalg.eigvalsh(c), 0.0)
    pr = float(ev.sum() ** 2 / np.maximum((ev ** 2).sum(), 1e-12))
    return {"mean_pairwise_cos": round(mean_cos, 4),
            "participation_ratio": round(pr, 2)}


def report(results: dict, diversity: dict, args) -> None:
    out = {"results": results, "diversity": diversity,
           "config": {"scale": args.scale, "homophily": args.homophily,
                      "pretrain_epochs": args.pretrain_epochs,
                      "finetune_epochs": args.finetune_epochs,
                      "seed": args.seed, "backend": "tpu" if args.tpu else "cpu"}}
    res_dir = Path("analysis/results")
    res_dir.mkdir(parents=True, exist_ok=True)
    (res_dir / "nfm_probe.json").write_text(json.dumps(out, indent=2))

    lines = ["# NFM-transfer calibration probe", "",
             f"Generator scale {args.scale}, homophily {args.homophily}, "
             f"{args.pretrain_epochs} pretrain / {args.finetune_epochs} "
             f"linear-probe epochs, seed {args.seed} "
             f"({out['config']['backend']} backend).", "",
             "| domain | calibration | b1 acc | " +
             " | ".join(f"{s} Δb1" for s in args.schemes) + " |",
             "|---|---|---|" + "---|" * len(args.schemes)]
    for domain in args.domains:
        for cal in ("iid", "hom"):
            b1 = results.get(f"{cal}/{domain}/b1")
            if b1 is None:
                continue
            deltas = []
            for s in args.schemes:
                acc = results.get(f"{cal}/{domain}/{s}")
                deltas.append("—" if acc is None
                              else f"{100 * (acc - b1) / max(b1, 1e-9):+.1f}%")
            lines.append(f"| {domain} | {cal} | {b1:.4f} | "
                         + " | ".join(deltas) + " |")
    lines += ["", "Backbone feature diversity on an ENZYMES probe batch:",
              "", "| checkpoint | mean pairwise cos | participation ratio |",
              "|---|---|---|"]
    for k, v in diversity.items():
        lines.append(f"| {k} | {v['mean_pairwise_cos']} | "
                     f"{v['participation_ratio']} |")
    (res_dir / "nfm_probe.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
