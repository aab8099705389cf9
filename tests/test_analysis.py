"""Analysis-layer tests: run-name validation, collection, and table math."""

import importlib.util
import json
import pathlib
import sys
import tempfile

import numpy as np
import pandas as pd


def _load(module_name, path):
    spec = importlib.util.spec_from_file_location(module_name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ROOT = pathlib.Path(__file__).resolve().parent.parent
collection = _load("dc", ROOT / "analysis" / "data_collection.py")
analysis = _load("da", ROOT / "analysis" / "data_analysis.py")


class TestRunNameValidation:
    def test_valid_names(self):
        d = collection.validate_run_name("Cora_NC_full_finetune_s3_42")
        assert d == {"domain": "Cora_NC", "strategy": "full_finetune",
                     "scheme": "s3", "seed": "42"}
        assert collection.validate_run_name("ENZYMES_linear_probe_b1_126")

    def test_invalid_names_rejected(self):
        # reference analysis/data_collection.py:26-57 rejects malformed runs
        for bad in ("Cora_NC_full_finetune_s3_43",       # unknown seed
                    "Nope_full_finetune_b1_42",           # unknown domain
                    "Cora_NC_b1_42",                      # missing strategy
                    "Cora_NC_full_finetune_x9_42"):       # unknown scheme
            assert collection.validate_run_name(bad) is None, bad


class TestCollection:
    def test_extracts_test_namespace(self):
        tmp = pathlib.Path(tempfile.mkdtemp())
        summary = {"test/accuracy": 0.8, "test/auc": 0.7, "val/accuracy": 0.9,
                   "test/trainable_parameters": 123}
        (tmp / "PTC_MR_full_finetune_b1_42.summary.json").write_text(
            json.dumps(summary))
        (tmp / "garbage_name.summary.json").write_text("{}")
        df = collection.extract_all_finetune_results(tmp)
        assert len(df) == 1
        row = df.iloc[0]
        assert row["accuracy"] == 0.8
        assert row["trainable_parameters"] == 123
        assert "val/accuracy" not in df.columns


class TestTables:
    def _df(self):
        rows = []
        for scheme, acc, epochs in (("b1", 0.5, 40), ("s1", 0.6, 20)):
            for seed in (42, 84):
                rows.append({"domain": "PTC_MR", "strategy": "full_finetune",
                             "scheme": scheme, "seed": seed, "accuracy": acc,
                             "auc": acc, "convergence_epochs": epochs,
                             "trainable_parameters": 100})
        return pd.DataFrame(rows)

    def test_improvement_and_speedup(self):
        agg = analysis._agg(self._df())
        t1 = analysis.improvement_table(agg, "full_finetune")
        assert len(t1) == 1
        r = t1.iloc[0]
        np.testing.assert_allclose(r["improvement_pct"], 20.0)   # 0.6 vs 0.5
        np.testing.assert_allclose(r["speedup"], 2.0)            # 40/20 epochs

    def test_primary_metric_lp_is_auc(self):
        assert analysis.primary_metric("Cora_LP") == "auc"
        assert analysis.primary_metric("ENZYMES") == "accuracy"
