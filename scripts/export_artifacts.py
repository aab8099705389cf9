"""Export durable tracked artifacts from a completed sweep (VERDICT r3 #2).

The reference ships trained outputs in git (e.g.
``outputs/finetune/model_Cora_NC_linear_probe_b2_42.pt``); this repo's
``outputs/`` is gitignored scratch that dies with the container. This script
distils a finished sweep into a small tracked ``artifacts/`` tree:

  artifacts/transfer/backbone_<scheme>_<seed>.msgpack
      fp16 transfer-contract subtree (backbone params + BN stats + the
      ENZYMES encoder) for every scheme at --seeds (default 42), ~2.7 MB
      each. Consumed directly by fine-tuning (outputs/ fallback) and by
      ``tests/test_artifacts.py``.
  artifacts/serving/<domain>_<scheme>.stablehlo
      one AOT serving export per task family (graph / node / link) from the
      corresponding fine-tune checkpoint, replayable with
      ``gnn_pretraining_tpu.serving.load_artifact`` on any JAX runtime.
  artifacts/MANIFEST.json
      sha256 + size + provenance (source checkpoint, epoch, val metric) per
      artifact.

Runs entirely on CPU (AOT lowering, no TPU needed):
  python scripts/export_artifacts.py [--seeds 42] [--out_root outputs]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from gnn_pretraining_tpu import config, serving  # noqa: E402
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN  # noqa: E402
from gnn_pretraining_tpu.utils.checkpoint import (  # noqa: E402
    load_checkpoint,
    save_transfer_artifact,
)

# One fine-tune cell per task family for the serving exports: scheme b2
# seed 42 full_finetune, the same cell family the reference ships
# (outputs/finetune/model_Cora_NC_linear_probe_b2_42.pt).
SERVING_CELLS = (
    ("ENZYMES", "full_finetune", "b2", 42),
    ("Cora_NC", "full_finetune", "b2", 42),
    ("Cora_LP", "full_finetune", "b2", 42),
)

# Representation serving straight from a *pretrain* checkpoint (no fine-tune
# needed): encoder + backbone -> [N, 256] node embeddings via the transfer
# contract. Only ENZYMES has a transferred encoder
# (models/finetune_model.py:76-93), so that is the embed domain; the seed
# axis follows --seeds (same as the transfer exports).
EMBED_DOMAINS_SCHEMES = (
    ("ENZYMES", "b2"),
)


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    h.update(path.read_bytes())
    return h.hexdigest()


def export_transfer(out_root: Path, seeds, manifest: dict) -> int:
    n = 0
    for scheme in config.ALL_SCHEMES:
        for seed in seeds:
            src = out_root / "pretrain" / f"model_{scheme}_{seed}.msgpack"
            if not src.exists():
                print(f"  skip {scheme}_{seed}: {src} missing")
                continue
            ckpt = load_checkpoint(src)
            dst = (config.ARTIFACTS_DIR / "transfer"
                   / f"backbone_{scheme}_{seed}.msgpack")
            meta = dict(ckpt.get("meta", {}))
            meta.update(scheme=scheme, seed=seed)
            save_transfer_artifact(dst, ckpt["params"], ckpt["batch_stats"],
                                   meta)
            manifest[str(dst.relative_to(config.ARTIFACTS_DIR))] = {
                "sha256": _sha256(dst), "bytes": dst.stat().st_size,
                "source": str(src), "epoch": meta.get("epoch"),
                "val_metrics": meta.get("val_metrics", {}),
            }
            print(f"  {dst.name}: {dst.stat().st_size / 1e6:.2f} MB "
                  f"(epoch {meta.get('epoch')})")
            n += 1
    return n


def export_serving_artifacts(out_root: Path, manifest: dict) -> int:
    from gnn_pretraining_tpu.data.loaders import create_finetune_arrays

    n = 0
    for domain, strategy, scheme, seed in SERVING_CELLS:
        run = f"{domain}_{strategy}_{scheme}_{seed}"
        src = out_root / "finetune" / f"model_{run}.msgpack"
        if not src.exists():
            print(f"  skip {run}: {src} missing")
            continue
        task_type = config.TASK_TYPES[domain]
        data = create_finetune_arrays(domain, "test",
                                      config.FINETUNE_BATCH_SIZES[domain])
        if task_type == "graph_classification":
            b = data.batches[0]
        else:
            b = data.graph
        example = {
            "x": np.asarray(b.x, np.float32),
            "node_mask": np.asarray(b.node_mask, np.float32),
            "senders": np.asarray(b.senders, np.int32),
            "receivers": np.asarray(b.receivers, np.int32),
            "edge_mask": np.asarray(b.edge_mask, np.float32),
        }
        if task_type == "graph_classification":
            example["node_graph"] = np.asarray(b.node_graph, np.int32)
            example["num_graphs"] = int(np.asarray(b.graph_mask).shape[0])
        elif task_type == "link_prediction":
            ne = data.edges[0].shape[1]
            example["score_senders"] = np.zeros(ne, np.int32)
            example["score_receivers"] = np.zeros(ne, np.int32)
        ckpt = load_checkpoint(src)
        model = FinetuneGNN(domain_name=domain, aggregation="coo")
        blob = serving.export_serving(
            model, {"params": ckpt["params"],
                    "batch_stats": ckpt["batch_stats"]},
            example, platforms=("tpu", "cpu"))
        dst = config.ARTIFACTS_DIR / "serving" / f"{domain}_{scheme}.stablehlo"
        serving.save_artifact(dst, blob)
        entry = {
            "sha256": _sha256(dst), "bytes": dst.stat().st_size,
            "source": str(src),
            "bucket": {"num_nodes": int(example["x"].shape[0]),
                       "num_edges": int(example["senders"].shape[0])},
        }
        if task_type == "link_prediction":
            entry["score_edges"] = int(example["score_senders"].shape[0])
        manifest[str(dst.relative_to(config.ARTIFACTS_DIR))] = entry
        print(f"  {dst.name}: {dst.stat().st_size / 1e6:.2f} MB")
        n += 1
    return n


def export_embed_artifacts(out_root: Path, seeds, manifest: dict) -> int:
    """Embedding serving exports from pretrain checkpoints (available as soon
    as the pretrain phase finishes a scheme, long before any fine-tune cell).
    Mirrors scripts/export_model.py's --embed route: fresh finetune init,
    then the transfer contract fills encoder + backbone + BN stats."""
    from gnn_pretraining_tpu.data.loaders import create_finetune_arrays
    from gnn_pretraining_tpu.models.finetune_model import (
        load_pretrained_into_finetune,
    )

    n = 0
    for (domain, scheme), seed in ((ds, sd) for ds in EMBED_DOMAINS_SCHEMES
                                   for sd in seeds):
        src = out_root / "pretrain" / f"model_{scheme}_{seed}.msgpack"
        if not src.exists():
            print(f"  skip embed {scheme}_{seed}: {src} missing")
            continue
        data = create_finetune_arrays(domain, "test",
                                      config.FINETUNE_BATCH_SIZES[domain])
        b = data.batches[0]
        example = {
            "x": np.asarray(b.x, np.float32),
            "node_mask": np.asarray(b.node_mask, np.float32),
            "senders": np.asarray(b.senders, np.int32),
            "receivers": np.asarray(b.receivers, np.int32),
            "edge_mask": np.asarray(b.edge_mask, np.float32),
        }
        ckpt = load_checkpoint(src)
        meta = dict(ckpt.get("meta", {}))
        model = FinetuneGNN(domain_name=domain, aggregation="coo")
        ft_vars = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            example["x"], example["node_mask"], False,
            senders=example["senders"], receivers=example["receivers"],
            edge_mask=example["edge_mask"], method=model.embed)
        variables = load_pretrained_into_finetune(ft_vars, ckpt, domain)
        blob = serving.export_serving(model, variables, example,
                                      platforms=("tpu", "cpu"),
                                      embed_only=True)
        dst = (config.ARTIFACTS_DIR / "serving"
               / f"{domain}_embed_{scheme}.stablehlo")
        serving.save_artifact(dst, blob)
        manifest[str(dst.relative_to(config.ARTIFACTS_DIR))] = {
            "sha256": _sha256(dst), "bytes": dst.stat().st_size,
            "source": str(src), "domain": domain, "embed": True,
            "epoch": meta.get("epoch"),
            "val_metrics": meta.get("val_metrics", {}),
            "bucket": {"num_nodes": int(example["x"].shape[0]),
                       "num_edges": int(example["senders"].shape[0])},
        }
        print(f"  {dst.name}: {dst.stat().st_size / 1e6:.2f} MB (embeddings)")
        n += 1
    return n


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[42])
    p.add_argument("--out_root", default=str(config.OUTPUT_DIR),
                   help="sweep output root holding pretrain/ and finetune/")
    p.add_argument("--no_serving", action="store_true",
                   help="transfer artifacts only (no processed data needed)")
    args = p.parse_args()
    out_root = Path(args.out_root)

    manifest_path = config.ARTIFACTS_DIR / "MANIFEST.json"
    manifest = (json.loads(manifest_path.read_text())
                if manifest_path.exists() else {})

    print("transfer artifacts:")
    nt = export_transfer(out_root, args.seeds, manifest)
    ns = 0
    if not args.no_serving:
        print("serving artifacts:")
        ns = export_serving_artifacts(out_root, manifest)
        ns += export_embed_artifacts(out_root, args.seeds, manifest)

    config.ARTIFACTS_DIR.mkdir(parents=True, exist_ok=True)
    # Prune entries whose artifact was deleted/renamed: the manifest is
    # merged across runs, so stale keys would otherwise persist forever and
    # the file-driven integrity test would never notice them.
    stale = [k for k in manifest if not (config.ARTIFACTS_DIR / k).exists()]
    for k in stale:
        del manifest[k]
        print(f"  pruned stale manifest entry {k}")
    manifest_path.write_text(json.dumps(manifest, indent=2, sort_keys=True)
                             + "\n")
    print(f"wrote {nt} transfer + {ns} serving artifacts; manifest at "
          f"{manifest_path}")


if __name__ == "__main__":
    main()
