"""Serving export: serialize → deserialize → numerically identical inference.

Covers all three task families, the file roundtrip, cross-platform lowering,
and the Pallas-aggregation guard (serving.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_pretraining_tpu import config, serving
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN


def _example(domain, rng, n=24, e=48, g=3, s=16):
    ex = {
        "x": rng.normal(size=(n, config.DOMAIN_DIMENSIONS[domain])
                        ).astype(np.float32),
        "node_mask": np.ones(n, np.float32),
        "senders": rng.integers(0, n, e).astype(np.int32),
        "receivers": rng.integers(0, n, e).astype(np.int32),
        "edge_mask": np.ones(e, np.float32),
    }
    task = config.TASK_TYPES[domain]
    if task == "graph_classification":
        ex["node_graph"] = np.sort(rng.integers(0, g, n)).astype(np.int32)
        ex["num_graphs"] = g
    elif task == "link_prediction":
        ex["score_senders"] = rng.integers(0, n, s).astype(np.int32)
        ex["score_receivers"] = rng.integers(0, n, s).astype(np.int32)
    return ex


def _init_and_reference(domain, rng):
    model = FinetuneGNN(domain_name=domain, aggregation="coo")
    ex = _example(domain, rng)
    kwargs = {k: jnp.asarray(v) for k, v in ex.items() if k != "num_graphs"}
    x = kwargs.pop("x")
    node_mask = kwargs.pop("node_mask")
    if "num_graphs" in ex:
        kwargs["num_graphs"] = ex["num_graphs"]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, node_mask, False, **kwargs)
    ref = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]},
                      x, node_mask, False, **kwargs)
    return model, variables, ex, np.asarray(ref)


@pytest.mark.parametrize("domain", ["ENZYMES", "Cora_NC", "Cora_LP"])
def test_roundtrip_matches_direct_apply(domain):
    rng = np.random.default_rng(0)
    model, variables, ex, ref = _init_and_reference(domain, rng)
    blob = serving.export_serving(model, variables, ex, platforms=("cpu",))
    served = serving.load_serving(blob)
    args = [jnp.asarray(ex[n]) for n in
            ("x", "node_mask", "senders", "receivers", "edge_mask")]
    task = config.TASK_TYPES[domain]
    if task == "graph_classification":
        args.append(jnp.asarray(ex["node_graph"]))
    elif task == "link_prediction":
        args += [jnp.asarray(ex["score_senders"]),
                 jnp.asarray(ex["score_receivers"])]
    out = served(*args)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_file_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    model, variables, ex, ref = _init_and_reference("Cora_NC", rng)
    blob = serving.export_serving(model, variables, ex, platforms=("cpu",))
    path = tmp_path / "m.stablehlo"
    serving.save_artifact(path, blob)
    served = serving.load_artifact(path)
    out = served(*(jnp.asarray(ex[n]) for n in
                   ("x", "node_mask", "senders", "receivers", "edge_mask")))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_cross_platform_lowering_includes_tpu():
    rng = np.random.default_rng(2)
    model, variables, ex, ref = _init_and_reference("Cora_NC", rng)
    blob = serving.export_serving(model, variables, ex,
                                  platforms=("tpu", "cpu"))
    served = serving.load_serving(blob)  # executes on the cpu test backend
    out = served(*(jnp.asarray(ex[n]) for n in
                   ("x", "node_mask", "senders", "receivers", "edge_mask")))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_embedding_export_matches_embed_method(tmp_path):
    rng = np.random.default_rng(4)
    model, variables, ex, _ = _init_and_reference("ENZYMES", rng)
    blob = serving.export_serving(model, variables, ex, platforms=("cpu",),
                                  embed_only=True)
    served = serving.load_serving(blob)
    args = tuple(jnp.asarray(ex[n]) for n in
                 ("x", "node_mask", "senders", "receivers", "edge_mask"))
    out = served(*args)
    ref = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]},
                      args[0], args[1], False, senders=args[2],
                      receivers=args[3], edge_mask=args[4],
                      method=model.embed)
    assert out.shape == (ex["x"].shape[0], 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_aggregation_rejected():
    rng = np.random.default_rng(3)
    model, variables, ex, _ = _init_and_reference("Cora_NC", rng)
    bad = FinetuneGNN(domain_name="Cora_NC", aggregation="pallas")
    with pytest.raises(ValueError, match="not exportable"):
        serving.export_serving(bad, variables, ex)
