"""Fused fine-tune runner: determinism, replay-consistency, and parity of
the saved best checkpoint with the logged selection metric."""

import json
import pathlib
import tempfile

import numpy as np
import pytest

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data import setup as data_setup
from gnn_pretraining_tpu.finetune.finetune import finetune


@pytest.fixture(scope="module")
def processed_dir():
    tmp = pathlib.Path(tempfile.mkdtemp())
    data_setup.main(processed_dir=tmp, raw_dir=tmp / "raw",
                    synthetic_scale=0.06)
    return tmp


def _run(processed_dir, domain, epochs, seed=42, out=None):
    out = out or pathlib.Path(tempfile.mkdtemp())
    cfg = config.FinetuneConfig(domain_name=domain,
                                finetune_strategy="full_finetune",
                                pretrained_scheme="b1", seed=seed)
    res = finetune(cfg, processed_dir=processed_dir, use_wandb=False,
                   epochs=epochs, out_root=out)
    return res, out, cfg


@pytest.mark.parametrize("domain,epochs", [("PTC_MR", 5), ("CiteSeer_LP", 4)])
def test_fused_run_deterministic(processed_dir, domain, epochs):
    r1, _, _ = _run(processed_dir, domain, epochs)
    r2, _, _ = _run(processed_dir, domain, epochs)
    for k, v in r1.items():
        if isinstance(v, float) and "time" not in k and "_per_sec" not in k:
            np.testing.assert_allclose(r2[k], v, rtol=1e-6, err_msg=k)


def test_best_checkpoint_matches_logged_best(processed_dir):
    """The replayed best checkpoint's stored epoch equals the epoch of the
    max logged val selection metric, and convergence_epochs agrees."""
    res, out, cfg = _run(processed_dir, "Cora_NC", 6)
    jsonl = (out / "metrics" / config.FINETUNE_PROJECT_NAME
             / f"{cfg.run_name}.jsonl")
    rows = [json.loads(l) for l in open(jsonl)]
    val_rows = [r for r in rows if "val/accuracy" in r]
    sel = [r["val/accuracy"] for r in val_rows]
    best_epoch = int(np.argmax(sel)) + 1  # first max wins (strict >)
    assert res["test/convergence_epochs"] == best_epoch

    from gnn_pretraining_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(out / "finetune" / f"model_{cfg.run_name}.msgpack")
    assert ckpt["meta"]["epoch"] == best_epoch


def test_chunk_boundary_invariance(processed_dir):
    """Epoch-chunked execution must be invariant to the chunk size: training
    with chunk_epochs=2 (three chunk boundaries in 5 epochs) and
    chunk_epochs=32 (single chunk) must produce identical metrics.

    Regression test for the round-2 fix where the in-chunk update mask
    compared the ABSOLUTE epoch index against the chunk-RELATIVE limit,
    freezing all training after the first chunk (runners.py run_epochs)."""
    cfg = config.FinetuneConfig(domain_name="PTC_MR",
                                finetune_strategy="full_finetune",
                                pretrained_scheme="b1", seed=42)
    results = []
    for ce in (2, 32):
        out = pathlib.Path(tempfile.mkdtemp())
        results.append(finetune(cfg, processed_dir=processed_dir,
                                use_wandb=False, epochs=5, out_root=out,
                                chunk_epochs=ce))
    r2, r32 = results
    for k, v in r32.items():
        if isinstance(v, float) and "time" not in k and "_per_sec" not in k:
            np.testing.assert_allclose(r2[k], v, rtol=1e-5, err_msg=k)


def test_val_global_auc_logged(processed_dir):
    res, out, cfg = _run(processed_dir, "CiteSeer_LP", 3)
    assert "test/auc_global" in res
    jsonl = (out / "metrics" / config.FINETUNE_PROJECT_NAME
             / f"{cfg.run_name}.jsonl")
    rows = [json.loads(l) for l in open(jsonl)]
    assert any("val/auc_global" in r for r in rows)
