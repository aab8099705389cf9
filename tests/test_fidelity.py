"""Fidelity-aware completion markers (utils/fidelity.py) and the finetune
driver's pretrain-checkpoint guard.

The markers are what makes ``--resume`` safe: a smoke run must never mask a
production cell, and a fine-tune cell must never consume a checkpoint from a
crashed pretrain run (observed: an OOM-killed pretrain leaves its best-val
checkpoint on disk but no completed summary).
"""

import importlib.util
import json
import pathlib

import numpy as np
import pytest

from gnn_pretraining_tpu import config
from gnn_pretraining_tpu.utils.fidelity import (
    cell_completed,
    data_fidelity,
    fidelity_block,
)

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _write_npz(path, source="synthetic", scale=0.5, homophily=0.0):
    np.savez(path, x=np.zeros(3),
             meta__source=np.str_(source), meta__scale=np.float64(scale),
             meta__homophily=np.float64(homophily))


class TestDataFidelity:
    def test_reads_provenance(self, tmp_path):
        _write_npz(tmp_path / "A.npz", "synthetic", 0.25)
        _write_npz(tmp_path / "B.npz", "synthetic", 0.25)
        d = data_fidelity(tmp_path, ["A", "B"])
        assert d == {"data_source": "synthetic", "synthetic_scale": 0.25,
                     "calibration": 0.0}

    def test_mixed_provenance_flagged(self, tmp_path):
        _write_npz(tmp_path / "A.npz", "synthetic", 1.0)
        _write_npz(tmp_path / "B.npz", "raw", 1.0)
        assert data_fidelity(tmp_path, ["A", "B"])["data_source"] == "mixed"

    def test_missing_file(self, tmp_path):
        d = data_fidelity(tmp_path, ["nope"])
        assert d == {"data_source": "missing", "synthetic_scale": -1.0,
                     "calibration": -1.0}

    def test_legacy_npz_is_unknown(self, tmp_path):
        np.savez(tmp_path / "A.npz", x=np.zeros(3))
        assert data_fidelity(tmp_path, ["A"])["data_source"] == "unknown"

    def test_calibration_mismatch_invalidates(self, tmp_path):
        """An iid-era store (homophily 0.0) must not satisfy a marker
        written for the neighbor-correlated production calibration."""
        _write_npz(tmp_path / "A.npz", homophily=0.45)
        d = data_fidelity(tmp_path, ["A"])
        assert d["calibration"] == 0.45
        _write_npz(tmp_path / "B.npz", homophily=0.0)
        mixed = data_fidelity(tmp_path, ["A", "B"])
        assert mixed["calibration"] == -1.0  # mixed calibrations flagged


class TestCellCompleted:
    @pytest.fixture()
    def marker(self, tmp_path):
        _write_npz(tmp_path / "D.npz")
        block = fidelity_block(50, 42, "pallas", tmp_path, ["D"])
        path = tmp_path / "run.summary.json"
        path.write_text(json.dumps(block))
        return path, block

    def test_matching_block_completes(self, marker):
        path, block = marker
        assert cell_completed(path, block)

    def test_smoke_run_never_masks_production(self, marker):
        path, block = marker
        smoke = dict(block, **{"fidelity/epochs": 2})
        path.write_text(json.dumps(smoke))
        assert not cell_completed(path, block)

    def test_incomplete_run_rejected(self, marker):
        path, block = marker
        crashed = dict(block, **{"fidelity/completed": 0})
        path.write_text(json.dumps(crashed))
        assert not cell_completed(path, block)

    def test_missing_or_garbled(self, marker, tmp_path):
        path, block = marker
        assert not cell_completed(tmp_path / "absent.json", block)
        path.write_text("{not json")
        assert not cell_completed(path, block)

    def test_pre_fidelity_summary_rejected(self, marker):
        path, block = marker
        path.write_text(json.dumps({"test/accuracy": 0.9}))
        assert not cell_completed(path, block)


def _load_driver():
    spec = importlib.util.spec_from_file_location(
        "rf_fidelity_test", ROOT / "run_finetune.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestPretrainReady:
    class _Args:
        aggregation = "pallas"

    def test_b1_never_needs_a_checkpoint(self):
        rf = _load_driver()
        assert rf.pretrain_ready("b1", 42, self._Args())

    def test_completed_marker_accepts(self, tmp_path, monkeypatch):
        rf = _load_driver()
        monkeypatch.setattr(config, "METRICS_DIR", tmp_path)
        pcfg = config.PretrainConfig(exp_name="s2", seed=42)
        block = fidelity_block(config.PRETRAIN_EPOCHS, 42, "pallas", None,
                               pcfg.pretrain_domains)
        mdir = tmp_path / config.PRETRAIN_PROJECT_NAME
        mdir.mkdir(parents=True)
        (mdir / f"{pcfg.run_name}.summary.json").write_text(json.dumps(block))
        assert rf.pretrain_ready("s2", 42, self._Args())

    def test_crashed_pretrain_rejects(self, tmp_path, monkeypatch):
        rf = _load_driver()
        monkeypatch.setattr(config, "METRICS_DIR", tmp_path)
        pcfg = config.PretrainConfig(exp_name="s2", seed=42)
        block = fidelity_block(config.PRETRAIN_EPOCHS, 42, "pallas", None,
                               pcfg.pretrain_domains)
        block["fidelity/completed"] = 0
        mdir = tmp_path / config.PRETRAIN_PROJECT_NAME
        mdir.mkdir(parents=True)
        (mdir / f"{pcfg.run_name}.summary.json").write_text(json.dumps(block))
        assert not rf.pretrain_ready("s2", 42, self._Args())

    def test_no_marker_rejects(self, tmp_path, monkeypatch):
        rf = _load_driver()
        monkeypatch.setattr(config, "METRICS_DIR", tmp_path)
        assert not rf.pretrain_ready("s3", 84, self._Args())
