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


class TestFastBinaryParity:
    """The closed-form binary metrics must equal sklearn bit-for-bit-ish
    (<=1e-12): they replaced per-step sklearn calls in the fused loop."""

    def test_random_cases_match_sklearn(self):
        from sklearn.metrics import (
            accuracy_score, f1_score, precision_score, recall_score,
            roc_auc_score)

        rng = np.random.default_rng(0)
        for trial in range(50):
            n = int(rng.integers(2, 400))
            y = rng.integers(0, 2, n)
            pred = rng.integers(0, 2, n)
            # heavy ties: quantized probabilities
            prob1 = np.round(rng.random(n), int(rng.integers(0, 3)))
            probs = np.stack([1 - prob1, prob1], axis=1)
            m = M.compute_batch_metrics("Cora_LP", y, pred, probs, 0.3, "val")
            assert m["val/accuracy"] == accuracy_score(y, pred)
            assert abs(m["val/f1"] - f1_score(y, pred, zero_division=0)) < 1e-12
            assert abs(m["val/precision"]
                       - precision_score(y, pred, zero_division=0)) < 1e-12
            assert abs(m["val/recall"]
                       - recall_score(y, pred, zero_division=0)) < 1e-12
            if len(np.unique(y)) == 2:
                assert abs(m["val/auc"] - roc_auc_score(y, prob1)) < 1e-12
            else:
                assert m["val/auc"] == 0.0

    def test_degenerate_predictions(self):
        from sklearn.metrics import roc_auc_score

        y = np.array([0, 1, 0, 1])
        pred = np.zeros(4, np.int64)            # no positive predictions
        probs = np.stack([np.ones(4) * 0.5, np.ones(4) * 0.5], axis=1)
        m = M.compute_batch_metrics("CiteSeer_LP", y, pred, probs, 0.1, "t")
        assert m["t/precision"] == 0.0 and m["t/f1"] == 0.0  # zero_division=0
        assert m["t/auc"] == roc_auc_score(y, probs[:, 1])   # all-tied = 0.5

    def test_nan_probabilities_record_zero_auc(self):
        y = np.array([0, 1, 0, 1])
        pred = np.array([0, 1, 0, 1])
        probs = np.stack([np.zeros(4), np.full(4, np.nan)], axis=1)
        m = M.compute_batch_metrics("Cora_LP", y, pred, probs, 0.1, "t")
        assert m["t/auc"] == 0.0  # sklearn raises ValueError -> reference logs 0.0


class TestMulticlassClosedForms:
    """The closed-form multiclass metrics must equal sklearn (<=1e-12):
    they replaced per-row sklearn calls whose validation layer cost ~20 ms
    per multiclass batch row in the fused runner's host loop (round 5)."""

    def test_random_cases_match_sklearn(self):
        from sklearn.metrics import (
            accuracy_score,
            f1_score,
            precision_score,
            recall_score,
            roc_auc_score,
        )

        from gnn_pretraining_tpu.finetune.metrics import (
            _macro_prf,
            multiclass_ovr_auc,
        )

        rng = np.random.default_rng(0)
        for trial in range(25):
            n_cls = int(rng.integers(3, 8))
            b = int(rng.integers(5, 400))
            y = rng.integers(0, n_cls, b)
            pred = rng.integers(0, n_cls, b)
            probs = rng.random((b, n_cls))
            probs /= probs.sum(1, keepdims=True)
            acc, f1, prec, rec = _macro_prf(y, pred)
            assert abs(acc - accuracy_score(y, pred)) < 1e-12
            assert abs(f1 - f1_score(y, pred, average="macro",
                                     zero_division=0)) < 1e-12
            assert abs(prec - precision_score(y, pred, average="macro",
                                              zero_division=0)) < 1e-12
            assert abs(rec - recall_score(y, pred, average="macro",
                                          zero_division=0)) < 1e-12
            ours = multiclass_ovr_auc(y, probs)
            if len(np.unique(y)) == n_cls:
                ref = roc_auc_score(y, probs, multi_class="ovr")
                assert abs(ours - ref) < 1e-10, (trial, ours, ref)
            else:
                # sklearn raises (missing class) -> contract records 0.0
                assert ours == 0.0

    def test_labels_only_in_pred_count_for_macro(self):
        from sklearn.metrics import f1_score

        from gnn_pretraining_tpu.finetune.metrics import _macro_prf

        y = np.array([0, 0, 1, 1])
        pred = np.array([0, 2, 1, 3])  # classes 2,3 absent from y_true
        _, f1, _, _ = _macro_prf(y, pred)
        assert abs(f1 - f1_score(y, pred, average="macro",
                                 zero_division=0)) < 1e-12
