"""End-to-end test of scripts/export_model.py: checkpoint file → artifact →
replay. Runs the CLI in a subprocess (it forces the CPU backend itself)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pretraining_tpu import serving
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN
from gnn_pretraining_tpu.utils.checkpoint import save_checkpoint

ROOT = Path(__file__).resolve().parent.parent


def test_cli_exports_runnable_artifact(tmp_path):
    n, e = 32, 64
    rng = np.random.default_rng(0)
    model = FinetuneGNN(domain_name="Cora_NC", aggregation="coo")
    x = jnp.asarray(rng.normal(size=(n, 1433)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    receivers = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, jnp.ones(n, jnp.float32), False, senders=senders,
        receivers=receivers, edge_mask=jnp.ones(e, jnp.float32))
    ckpt = tmp_path / "model.msgpack"
    save_checkpoint(ckpt, variables["params"], variables["batch_stats"],
                    epoch=0)

    out = tmp_path / "m.stablehlo"
    res = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "export_model.py"),
         "--checkpoint", str(ckpt), "--domain_name", "Cora_NC",
         "--num_nodes", str(n), "--num_edges", str(e),
         "--platforms", "cpu", "--out", str(out)],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr
    assert out.exists()

    served = serving.load_artifact(out)
    got = served(x, jnp.ones(n, jnp.float32), senders, receivers,
                 jnp.ones(e, jnp.float32))
    ref = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]},
                      x, jnp.ones(n, jnp.float32), False, senders=senders,
                      receivers=receivers,
                      edge_mask=jnp.ones(e, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_cli_refuses_task_export_from_pretrain_checkpoint(tmp_path):
    # A params tree without 'input_encoder' marks a pretrain checkpoint.
    ckpt = tmp_path / "pre.msgpack"
    save_checkpoint(ckpt,
                    {"gnn_backbone": {"layers_0": {"eps": np.float32(0)}}},
                    {}, epoch=0)
    res = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "export_model.py"),
         "--checkpoint", str(ckpt), "--domain_name", "Cora_NC",
         "--num_nodes", "8", "--num_edges", "8",
         "--platforms", "cpu", "--out", str(tmp_path / "x.stablehlo")],
        capture_output=True, text=True, timeout=300)
    assert res.returncode != 0
    assert "fine-tune first" in (res.stderr + res.stdout)
