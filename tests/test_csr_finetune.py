"""Block-CSR aggregation driven end-to-end through the fine-tune loop
(VERDICT r3 #3: loader-side BSR + rcm_order wired through the drivers).

The exactness of the CSR kernel itself is covered by tests/test_spmm_csr.py;
here the contract under test is the *wiring*: RCM permutation + index
remapping must leave the task mathematically unchanged, and the full fused
loop must train with ``aggregation='csr'`` on both single-graph task types.
"""

import pathlib
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.data import setup as data_setup
from gnn_pretraining_tpu.data.loaders import create_finetune_arrays
from gnn_pretraining_tpu.finetune.finetune import finetune
from gnn_pretraining_tpu.finetune.runners import _csr_graph_aux, _graph_dict
from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN


@pytest.fixture(scope="module")
def processed_dir():
    tmp = pathlib.Path(tempfile.mkdtemp())
    data_setup.main(processed_dir=tmp, raw_dir=tmp / "raw",
                    synthetic_scale=0.06)
    return tmp


def test_csr_forward_matches_coo_after_unpermute(processed_dir):
    """Eval-mode logits through the RCM-permuted BSR path equal the COO
    logits once mapped back through the permutation."""
    data = create_finetune_arrays("Cora_NC", "train", -1,
                                  processed_dir=processed_dir)
    g = data.graph
    gd_csr, bsr, inv = _csr_graph_aux(g)
    gd_coo = _graph_dict(g)

    model_coo = FinetuneGNN(domain_name="Cora_NC", aggregation="coo")
    variables = model_coo.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        gd_coo["x"], gd_coo["node_mask"], False,
        senders=gd_coo["senders"], receivers=gd_coo["receivers"],
        edge_mask=gd_coo["edge_mask"])
    logits_coo = model_coo.apply(
        variables, gd_coo["x"], gd_coo["node_mask"], False,
        senders=gd_coo["senders"], receivers=gd_coo["receivers"],
        edge_mask=gd_coo["edge_mask"])

    model_csr = FinetuneGNN(domain_name="Cora_NC", aggregation="csr")
    logits_csr = model_csr.apply(
        variables, gd_csr["x"], gd_csr["node_mask"], False,
        senders=gd_csr["senders"], receivers=gd_csr["receivers"],
        edge_mask=gd_csr["edge_mask"], bsr=bsr)

    # Node i (old ids) sits at row inv[i] of the permuted output.
    np.testing.assert_allclose(np.asarray(logits_csr)[inv],
                               np.asarray(logits_coo), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("domain,epochs", [("Cora_NC", 3), ("CiteSeer_LP", 2)])
def test_csr_trains_through_the_driver_loop(processed_dir, domain, epochs):
    cfg = config.FinetuneConfig(domain_name=domain,
                                finetune_strategy="full_finetune",
                                pretrained_scheme="b1", seed=42)
    res = finetune(cfg, processed_dir=processed_dir, use_wandb=False,
                   epochs=epochs, out_root=pathlib.Path(tempfile.mkdtemp()),
                   aggregation="csr")
    metric = "test/auc" if domain.endswith("LP") else "test/accuracy"
    assert 0.0 <= res[metric] <= 1.0
    assert res["test/edges_per_sec"] > 0


def test_csr_close_to_coo_loop_metrics(processed_dir):
    """Same cell trained with csr vs coo: the selection metric should land
    close (not bit-equal — RCM permutes dropout positions and float
    reduction order)."""
    out = pathlib.Path(tempfile.mkdtemp())
    cfg = config.FinetuneConfig(domain_name="Cora_NC",
                                finetune_strategy="linear_probe",
                                pretrained_scheme="b1", seed=42)
    r_coo = finetune(cfg, processed_dir=processed_dir, use_wandb=False,
                     epochs=4, out_root=out / "coo", aggregation="coo")
    r_csr = finetune(cfg, processed_dir=processed_dir, use_wandb=False,
                     epochs=4, out_root=out / "csr", aggregation="csr")
    assert abs(r_coo["test/accuracy"] - r_csr["test/accuracy"]) < 0.15


def test_csr_rejects_graph_classification(processed_dir):
    cfg = config.FinetuneConfig(domain_name="ENZYMES",
                                finetune_strategy="full_finetune",
                                pretrained_scheme="b1", seed=42)
    with pytest.raises(ValueError, match="csr"):
        finetune(cfg, processed_dir=processed_dir, use_wandb=False,
                 epochs=1, out_root=pathlib.Path(tempfile.mkdtemp()),
                 aggregation="csr")
