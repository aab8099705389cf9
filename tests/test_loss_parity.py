"""Loss-formula and head parity vs torch functional semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gnn_pretraining_tpu.models.heads import MLPLinkPredictor
from gnn_pretraining_tpu.utils.losses import (
    bce_with_logits,
    masked_bce_with_logits_mean,
)


class TestBCEParity:
    def test_logit_bce_matches_torch_bce_on_probs(self):
        # The reference computes BCE on sigmoid probs (tasks.py:120,
        # finetune.py:202); we compute the same loss from logits via the
        # fused stable form, identical wherever the sigmoid doesn't saturate
        # f32 (|z| <~ 16 keeps sigmoid exact to f32 eps).
        rng = np.random.default_rng(0)
        z = (rng.normal(size=64) * 5).astype(np.float32)
        labels = (rng.random(len(z)) < 0.5).astype(np.float32)

        probs = torch.sigmoid(torch.tensor(z))
        t = F.binary_cross_entropy(probs, torch.tensor(labels),
                                   reduction="sum").item()
        ours = float(jnp.sum(bce_with_logits(jnp.asarray(z),
                                             jnp.asarray(labels))))
        np.testing.assert_allclose(ours, t, rtol=1e-5)

    def test_logit_bce_grads_finite_where_probs_form_overflows(self):
        # dL/dp = -1/p overflows f32 for p < ~3e-39 (z < -89); the logits
        # form must stay finite with torch-clamp-consistent zero grads
        # beyond |z|=100 (this is the TPU NaN fix).
        z = jnp.asarray([-300.0, -120.0, -90.0, -5.0, 0.0, 5.0, 90.0, 300.0])
        y = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
        g = jax.grad(lambda zz: masked_bce_with_logits_mean(
            zz, y, jnp.ones_like(y)))(z)
        assert bool(jnp.isfinite(g).all())
        # value caps at 100 per element, matching torch's -100 log clamp
        per = bce_with_logits(z, y)
        assert float(jnp.max(per)) <= 100.0

    def test_bce_with_logits_matches_torch(self):
        # graph-classification binary loss (reference finetune.py:150-153)
        rng = np.random.default_rng(1)
        z = rng.normal(size=32).astype(np.float32) * 8
        y = (rng.random(32) < 0.5).astype(np.float32)
        t = F.binary_cross_entropy_with_logits(torch.tensor(z),
                                               torch.tensor(y)).item()
        ours = float(jnp.mean(bce_with_logits(jnp.asarray(z),
                                              jnp.asarray(y), clamp=False)))
        np.testing.assert_allclose(ours, t, rtol=1e-5)

    def test_unclamped_bce_matches_torch_beyond_clamp(self):
        # torch does NOT clamp binary_cross_entropy_with_logits: a
        # confidently-wrong |z| > 100 sample keeps loss ~|z| and gradient
        # sigmoid(z) - y. The binary GC/NC paths must use clamp=False so the
        # fused and step-wise runners agree with the reference here.
        z = np.asarray([-300.0, -150.0, 150.0, 300.0], np.float32)
        y = np.asarray([1.0, 1.0, 0.0, 0.0], np.float32)
        t = F.binary_cross_entropy_with_logits(torch.tensor(z),
                                               torch.tensor(y)).item()
        loss = lambda zz: jnp.mean(bce_with_logits(zz, jnp.asarray(y),
                                                   clamp=False))
        np.testing.assert_allclose(float(loss(jnp.asarray(z))), t, rtol=1e-6)
        g = jax.grad(loss)(jnp.asarray(z))
        # grad = (sigmoid(z) - y) / n = ±0.25 here — never the clamp's zero
        np.testing.assert_allclose(np.asarray(g),
                                   np.asarray([-0.25, -0.25, 0.25, 0.25]),
                                   atol=1e-6)


class TestLinkPredictorParity:
    def test_edge_features_and_scores_match_torch(self):
        """[h_u+h_v ; h_u*h_v ; |h_u-h_v|] -> MLP[768->256->1] -> sigmoid
        (reference heads.py:53-67), weights copied into a torch replica."""
        rng = np.random.default_rng(2)
        n, e = 20, 15
        h = rng.normal(size=(n, 256)).astype(np.float32)
        src = rng.integers(0, n, e).astype(np.int32)
        dst = rng.integers(0, n, e).astype(np.int32)

        model = MLPLinkPredictor()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), False)
        ours = model.apply(variables, jnp.asarray(h), jnp.asarray(src),
                           jnp.asarray(dst), False)

        p = variables["params"]["predictor"]
        lin0 = torch.nn.Linear(768, 256)
        lin1 = torch.nn.Linear(256, 1)
        lin0.weight.data = torch.tensor(np.asarray(p["linear_0"]["kernel"]).T)
        lin0.bias.data = torch.tensor(np.asarray(p["linear_0"]["bias"]))
        lin1.weight.data = torch.tensor(np.asarray(p["linear_1"]["kernel"]).T)
        lin1.bias.data = torch.tensor(np.asarray(p["linear_1"]["bias"]))

        ht = torch.tensor(h)
        hs, hd = ht[src], ht[dst]
        feats = torch.cat([hs + hd, hs * hd, (hs - hd).abs()], dim=1)
        ref = torch.sigmoid(lin1(F.relu(lin0(feats))).squeeze(-1))
        np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)
