"""Calibration probe for the synthetic-data difficulty knobs.

Runs the from-scratch full-fine-tuning baseline (b1) on each fine-tune
domain (reduced epochs, CPU) and prints test accuracy / "auc" next to the
reference's measured b1 value (BASELINE.md:18-27). Used to set
``synthetic.TU_SIGNAL`` / ``synthetic.PLANETOID_MIX`` so the production
sweep is non-degenerate.

Run: python scripts/calibrate_synthetic.py [domain ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from gnn_pretraining_tpu import config  # noqa: E402
from gnn_pretraining_tpu.finetune.finetune import finetune  # noqa: E402

REFERENCE_B1 = {
    "ENZYMES": ("test/accuracy", 0.667, 40),
    "PTC_MR": ("test/accuracy", 0.505, 40),
    "Cora_NC": ("test/accuracy", 0.536, 60),
    "CiteSeer_NC": ("test/accuracy", 0.453, 60),
    "Cora_LP": ("test/auc", 0.087, 40),
    "CiteSeer_LP": ("test/auc", 0.093, 40),
}


def main():
    domains = sys.argv[1:] or list(REFERENCE_B1)
    for d in domains:
        key, ref, epochs = REFERENCE_B1[d]
        cfg = config.FinetuneConfig(domain_name=d,
                                    finetune_strategy="full_finetune",
                                    pretrained_scheme="b1", seed=42)
        out = finetune(cfg, aggregation="dense", epochs=epochs,
                       use_wandb=False, out_root="/tmp/calib_out")
        extra = {k: round(v, 3) for k, v in out.items()
                 if k in ("test/accuracy", "test/auc", "test/auc_global")}
        print(f"{d:14s} {key}={out[key]:.4f}  ref_b1={ref:.3f}  "
              f"({epochs} ep)  {extra}", flush=True)


if __name__ == "__main__":
    main()
