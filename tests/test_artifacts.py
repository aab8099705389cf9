"""Durable transfer artifacts (VERDICT r3 #2).

Covers the compact fp16 transfer-artifact format (save → load roundtrip at
fp16 tolerance, subtree-only content), the fine-tune fallback that resolves a
missing outputs/pretrain checkpoint from ``artifacts/transfer/``, and — when
the tracked artifacts exist in git — a real fine-tune from a tracked sweep
artifact with zero re-pretraining (the reference's shipped-checkpoint
workflow, finetune_model.py:83-146).
"""

import json
import pathlib
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data import setup as data_setup
from gnn_pretraining_tpu.finetune.finetune import finetune
from gnn_pretraining_tpu.models import PretrainableGNN
from gnn_pretraining_tpu.utils.checkpoint import (
    load_transfer_artifact,
    save_transfer_artifact,
)


@pytest.fixture(scope="module")
def pretrain_vars():
    model = PretrainableGNN(domain_names=("ENZYMES",),
                            task_names=("node_feat_mask",))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 21)).astype(np.float32)
    senders = rng.integers(0, 40, 120).astype(np.int32)
    receivers = rng.integers(0, 40, 120).astype(np.int32)
    return model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.array(x), jnp.ones(40), "ENZYMES", True,
        senders=jnp.array(senders), receivers=jnp.array(receivers),
        edge_mask=jnp.ones(120))


@pytest.fixture(scope="module")
def processed_dir():
    tmp = pathlib.Path(tempfile.mkdtemp())
    data_setup.main(processed_dir=tmp, raw_dir=tmp / "raw",
                    synthetic_scale=0.06)
    return tmp


class TestTransferArtifactFormat:
    def test_roundtrip_fp16(self, pretrain_vars, tmp_path):
        path = tmp_path / "backbone_b2_42.msgpack"
        save_transfer_artifact(path, pretrain_vars["params"],
                               pretrain_vars["batch_stats"],
                               {"epoch": 7, "scheme": "b2", "seed": 42})
        art = load_transfer_artifact(path)
        assert art["meta"]["epoch"] == 7
        # Only the transfer-contract subtrees are stored...
        assert set(art["params"]) == {"gnn_backbone",
                                      "input_encoders_ENZYMES"}
        # ...restored as f32 within fp16 quantization error.
        src = jax.device_get(pretrain_vars["params"]["gnn_backbone"])
        got = art["params"]["gnn_backbone"]
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(src)[0],
                jax.tree_util.tree_flatten_with_path(got)[0]):
            assert np.asarray(b).dtype == np.float32, kp
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-2, atol=1e-3, err_msg=str(kp))
        # Compact: the whole point is a git-trackable size.
        assert path.stat().st_size < 4_000_000

    def test_finetune_fallback_resolves_artifact(self, pretrain_vars,
                                                 processed_dir, tmp_path,
                                                 monkeypatch):
        """A missing outputs/pretrain checkpoint falls back to the tracked
        artifact store; the run completes from the restored backbone."""
        art_dir = tmp_path / "artifacts"
        save_transfer_artifact(
            art_dir / "transfer" / "backbone_b2_42.msgpack",
            pretrain_vars["params"], pretrain_vars["batch_stats"],
            {"scheme": "b2", "seed": 42})
        monkeypatch.setattr(config, "ARTIFACTS_DIR", art_dir)

        cfg = config.FinetuneConfig(domain_name="ENZYMES",
                                    finetune_strategy="full_finetune",
                                    pretrained_scheme="b2", seed=42)
        out_root = tmp_path / "out"  # empty: no pretrain checkpoint
        res = finetune(cfg, processed_dir=processed_dir, use_wandb=False,
                       out_root=out_root, epochs=1)
        assert 0.0 <= res["test/accuracy"] <= 1.0

    def test_missing_everything_raises(self, processed_dir, tmp_path,
                                       monkeypatch):
        monkeypatch.setattr(config, "ARTIFACTS_DIR", tmp_path / "nope")
        cfg = config.FinetuneConfig(domain_name="ENZYMES",
                                    finetune_strategy="full_finetune",
                                    pretrained_scheme="b2", seed=42)
        with pytest.raises(FileNotFoundError):
            finetune(cfg, processed_dir=processed_dir, use_wandb=False,
                     out_root=tmp_path / "out", epochs=1)


TRACKED = sorted((config.ARTIFACTS_DIR / "transfer").glob("*.msgpack")) \
    if (config.ARTIFACTS_DIR / "transfer").exists() else []


@pytest.mark.skipif(not TRACKED, reason="no tracked artifacts yet "
                    "(populated by scripts/export_artifacts.py after a sweep)")
class TestTrackedArtifacts:
    def test_manifest_integrity(self):
        import hashlib

        manifest = json.loads(
            (config.ARTIFACTS_DIR / "MANIFEST.json").read_text())
        for path in TRACKED:
            rel = str(path.relative_to(config.ARTIFACTS_DIR))
            assert rel in manifest, f"{rel} missing from MANIFEST.json"
            digest = hashlib.sha256(path.read_bytes()).hexdigest()
            assert digest == manifest[rel]["sha256"], rel

    def test_all_load_with_transfer_contract_content(self):
        for path in TRACKED:
            art = load_transfer_artifact(path)
            assert "gnn_backbone" in art["params"]
            assert "gnn_backbone" in art["batch_stats"]
            leaves = jax.tree_util.tree_leaves(art["params"])
            assert all(np.isfinite(np.asarray(a)).all() for a in leaves)

    def test_finetune_from_tracked_artifact(self, processed_dir, tmp_path):
        """The fresh-container workflow: fine-tune from a tracked sweep
        artifact with zero re-pretraining (VERDICT r3 #2 'done' criterion)."""
        scheme = TRACKED[0].stem.split("_")[1]
        seed = int(TRACKED[0].stem.split("_")[2])
        cfg = config.FinetuneConfig(domain_name="ENZYMES",
                                    finetune_strategy="linear_probe",
                                    pretrained_scheme=scheme, seed=seed)
        res = finetune(cfg, processed_dir=processed_dir, use_wandb=False,
                       out_root=tmp_path / "out", epochs=2)
        assert 0.0 <= res["test/accuracy"] <= 1.0


TRACKED_SERVING = sorted((config.ARTIFACTS_DIR / "serving").glob("*.stablehlo")) \
    if (config.ARTIFACTS_DIR / "serving").exists() else []


@pytest.mark.skipif(not TRACKED_SERVING, reason="no tracked serving artifacts "
                    "yet (populated by scripts/export_artifacts.py)")
class TestTrackedServingArtifacts:
    def test_replay_on_cpu(self):
        """Every tracked .stablehlo loads and executes on the CPU backend
        with finite outputs at its manifest-recorded bucket shape (the
        cross-platform lowering includes cpu, serving.py:111-138)."""
        from gnn_pretraining_tpu import serving

        manifest = json.loads(
            (config.ARTIFACTS_DIR / "MANIFEST.json").read_text())
        for path in TRACKED_SERVING:
            rel = str(path.relative_to(config.ARTIFACTS_DIR))
            entry = manifest[rel]
            bucket = entry["bucket"]
            n, e = bucket["num_nodes"], bucket["num_edges"]
            if entry.get("embed"):
                # Embed artifacts always record their domain; the stem
                # fallback below would yield e.g. 'ENZYMES_embed' (ADVICE r4).
                assert "domain" in entry, f"{rel}: embed entry missing domain"
            domain = entry.get("domain", path.stem.rsplit("_", 1)[0])
            served = serving.load_artifact(path)
            rng = np.random.default_rng(0)
            args = [jnp.asarray(rng.normal(size=(n, config.DOMAIN_DIMENSIONS[
                        domain])).astype(np.float32)),
                    jnp.ones(n, jnp.float32),
                    jnp.zeros(e, jnp.int32), jnp.zeros(e, jnp.int32),
                    jnp.ones(e, jnp.float32)]
            task = config.TASK_TYPES[domain]
            if entry.get("embed"):
                pass  # embeddings take the bare 5-array graph signature
            elif task == "graph_classification":
                args.append(jnp.zeros(n, jnp.int32))
            elif task == "link_prediction":
                k = entry.get("score_edges", 256)
                args += [jnp.zeros(k, jnp.int32), jnp.zeros(k, jnp.int32)]
            out = np.asarray(served(*args))
            assert np.isfinite(out).all(), rel
            if entry.get("embed"):
                assert out.shape == (n, config.GNN_HIDDEN_DIM), rel
