"""Metric-pipeline parity tests (the quirks are the contract, SURVEY.md §6)."""

import numpy as np

from gnn_pretraining_tpu.finetune import metrics as M


class TestBatchMetrics:
    def test_binary_domain_uses_binary_average(self):
        y = np.array([0, 1, 1, 0])
        pred = np.array([0, 1, 0, 0])
        probs = np.stack([1 - np.array([0.2, 0.9, 0.4, 0.1]),
                          np.array([0.2, 0.9, 0.4, 0.1])], axis=1)
        m = M.compute_batch_metrics("PTC_MR", y, pred, probs, 0.5, "val")
        # binary f1 of this confusion: tp=1 fp=0 fn=1 -> f1=2/3
        np.testing.assert_allclose(m["val/f1"], 2 / 3, rtol=1e-6)
        assert m["num_samples"] == 4

    def test_single_class_batch_auc_is_zero(self):
        # Reference metrics.py:64-65 — definitional 0.0, the LP "AUC" artifact.
        y = np.ones(5, int)
        pred = np.ones(5, int)
        probs = np.stack([np.zeros(5), np.ones(5)], axis=1)
        m = M.compute_batch_metrics("Cora_LP", y, pred, probs, 0.1, "val")
        assert m["val/auc"] == 0.0
        assert m["val/accuracy"] == 1.0

    def test_aggregation_is_sample_weighted_mean(self):
        b1 = {"val/accuracy": 1.0, "val/auc": 0.0, "num_samples": 10}
        b2 = {"val/accuracy": 0.0, "val/auc": 1.0, "num_samples": 30}
        agg = M.aggregate_batch_metrics([b1, b2], epoch=3, prefix="val")
        np.testing.assert_allclose(agg["val/accuracy"], 0.25)
        np.testing.assert_allclose(agg["val/auc"], 0.75)
        assert "val/progress/epoch" not in agg  # only for train/test (:30-31)

    def test_lp_auc_artifact_reproduced(self):
        """Unshuffled pos-then-neg batches of one class each -> split 'AUC' 0,
        while the corrected global AUC sees a perfect ranking."""
        pos = {"test/auc": 0.0, "num_samples": 256}   # all-positive batch
        neg = {"test/auc": 0.0, "num_samples": 256}   # all-negative batch
        agg = M.aggregate_batch_metrics([pos, neg], epoch=1, prefix="test")
        assert agg["test/auc"] == 0.0

        y = np.concatenate([np.ones(256), np.zeros(256)]).astype(int)
        p = np.concatenate([np.full(256, 0.9), np.full(256, 0.1)])
        probs = np.stack([1 - p, p], axis=1)
        g = M.compute_global_auc("Cora_LP", y, probs, "test")
        assert g["test/auc_global"] == 1.0

    def test_multiclass_macro(self):
        y = np.array([0, 1, 2, 2])
        pred = np.array([0, 1, 2, 1])
        probs = np.eye(3)[pred] * 0.8 + 0.1
        m = M.compute_batch_metrics("ENZYMES", y, pred, probs, 0.2, "test")
        assert 0.0 < m["test/f1"] <= 1.0
