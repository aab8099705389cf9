"""Export a fine-tuned checkpoint as a deployable StableHLO serving artifact.

Loads a sweep checkpoint (outputs/finetune/model_<run>.msgpack), bakes its
weights into an AOT-compiled eval-mode inference function for one padded
serving bucket, and writes the serialized artifact. The artifact replays on
any JAX runtime with `gnn_pretraining_tpu.serving.load_artifact` — no model
code needed.

Example:
  python scripts/export_model.py \
      --checkpoint outputs/finetune/model_Cora_NC_full_finetune_b1_42.msgpack \
      --domain_name Cora_NC --num_nodes 2708 --num_edges 8448 \
      --out outputs/serving/Cora_NC_b1.stablehlo
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# AOT export lowers for the target platforms without executing on them —
# no accelerator needed, so never wait on the TPU relay for an export.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from gnn_pretraining_tpu import config, serving  # noqa: E402
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN  # noqa: E402
from gnn_pretraining_tpu.utils.checkpoint import load_checkpoint  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--domain_name", required=True,
                   choices=sorted(config.TASK_TYPES))
    p.add_argument("--out", required=True)
    p.add_argument("--num_nodes", type=int, required=True,
                   help="padded node count of the serving bucket")
    p.add_argument("--num_edges", type=int, required=True,
                   help="padded (directed) message-passing edge count")
    p.add_argument("--num_graphs", type=int, default=1,
                   help="padded graph count (graph classification)")
    p.add_argument("--num_score_edges", type=int, default=256,
                   help="edges scored per call (link prediction)")
    p.add_argument("--aggregation", default="coo", choices=["coo", "dense"])
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--embed", action="store_true",
                   help="export node embeddings (encoder+backbone) instead "
                        "of task outputs")
    args = p.parse_args()

    ckpt = load_checkpoint(args.checkpoint)
    model = FinetuneGNN(domain_name=args.domain_name,
                        aggregation=args.aggregation)
    n, e = args.num_nodes, args.num_edges
    example = {
        "x": np.zeros((n, config.DOMAIN_DIMENSIONS[args.domain_name]),
                      np.float32),
        "node_mask": np.ones(n, np.float32),
        "senders": np.zeros(e, np.int32),
        "receivers": np.zeros(e, np.int32),
        "edge_mask": np.ones(e, np.float32),
    }
    task_type = config.TASK_TYPES[args.domain_name]
    if task_type == "graph_classification":
        example["node_graph"] = np.zeros(n, np.int32)
        example["num_graphs"] = args.num_graphs
    elif task_type == "link_prediction":
        example["score_senders"] = np.zeros(args.num_score_edges, np.int32)
        example["score_receivers"] = np.zeros(args.num_score_edges, np.int32)

    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    if "input_encoder" not in variables["params"]:
        # A *pretrain* checkpoint (per-domain encoders): route it through the
        # finetune transfer contract (backbone + BN stats always; the encoder
        # only for ENZYMES, models/finetune_model.py:76-93). Other leaves are
        # fresh-init — fine for --embed (heads unused) on ENZYMES, meaningless
        # for task serving, so refuse that.
        if not args.embed or args.domain_name != "ENZYMES":
            raise SystemExit(
                "pretrain checkpoints export only with --embed and "
                "--domain_name ENZYMES (no transferred encoder/head exists "
                "for other domains); fine-tune first for task serving")
        import jax as _jax

        from gnn_pretraining_tpu.models.finetune_model import (
            load_pretrained_into_finetune,
        )

        ft_vars = model.init(
            {"params": _jax.random.PRNGKey(0),
             "dropout": _jax.random.PRNGKey(1)},
            example["x"], example["node_mask"], False,
            senders=example["senders"], receivers=example["receivers"],
            edge_mask=example["edge_mask"],
            method=model.embed)
        variables = load_pretrained_into_finetune(ft_vars, ckpt,
                                                  args.domain_name)
    blob = serving.export_serving(
        model, variables, example, platforms=tuple(args.platforms.split(",")),
        embed_only=args.embed)
    serving.save_artifact(args.out, blob)
    print(f"Wrote {args.out} ({len(blob) / 1e6:.2f} MB, "
          f"platforms={args.platforms}, bucket N={n} E={e}"
          f"{', embeddings' if args.embed else ''})")


if __name__ == "__main__":
    main()
