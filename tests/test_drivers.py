"""Sweep-driver and sampler-bound tests."""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load(module_name, path):
    spec = importlib.util.spec_from_file_location(module_name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


run_pretrain = _load("rp", ROOT / "run_pretrain.py")
run_finetune = _load("rf", ROOT / "run_finetune.py")


class TestGridSharding:
    def test_round_robin_partition_covers_grid(self):
        grid = [(s, seed) for s in "abcd" for seed in (1, 2, 3)]
        args = types.SimpleNamespace(num_shards=3, shard_index=None)
        parts = []
        for i in range(3):
            args.shard_index = i
            parts.append(run_pretrain.shard_grid(grid, args))
        flat = [c for p in parts for c in p]
        assert sorted(flat) == sorted(grid)          # complete
        assert len(set(map(tuple, flat))) == len(grid)  # disjoint
        sizes = [len(p) for p in parts]
        assert max(sizes) - min(sizes) <= 1          # balanced

    def test_single_shard_is_identity(self):
        grid = [(d, s) for d in "ab" for s in (1,)]
        args = types.SimpleNamespace(num_shards=1, shard_index=0)
        assert run_finetune.shard_grid(grid, args) == grid

    def test_full_finetune_grid_size(self):
        assert len(run_finetune.full_grid()) == 6 * 2 * 9 * 3  # 324 cells


class TestSamplerBounds:
    def test_batches_never_exceed_pads(self):
        from gnn_pretraining_tpu.data.batch import GraphStore
        from gnn_pretraining_tpu.data.loaders import BalancedMultiDomainSampler
        from gnn_pretraining_tpu.data.synthetic import generate_tu_dataset

        # PROTEINS-like with a giant outlier graph to stress the quantile pads
        x, ei, noff, eoff, y = generate_tu_dataset("PROTEINS", seed=0, scale=0.2)
        store = GraphStore(name="P", node_features=x, edge_index=ei,
                           node_offsets=noff, edge_offsets=eoff, y=y,
                           splits={"train": np.arange(len(noff) - 1)},
                           graph_properties=np.zeros((len(noff) - 1, 12),
                                                     np.float32))
        sampler = BalancedMultiDomainSampler({"P": store},
                                             np.random.default_rng(0))
        n_pad, e_pad = sampler.pads["P"]
        # Quantile pads are tighter than the worst case for skewed sizes...
        worst = int(np.diff(noff).max()) * sampler.samples_per_domain
        assert n_pad <= worst
        # ...and every sampled batch fits.
        for _ in range(30):
            b = sampler.sample_step()["P"]
            assert b.num_nodes == n_pad and b.num_edges == e_pad
            assert np.asarray(b.node_mask).sum() <= n_pad
            assert int(np.asarray(b.graph_mask).sum()) == sampler.samples_per_domain

    def test_dp_sampler_uses_quantile_pads(self):
        from gnn_pretraining_tpu.data.batch import GraphStore
        from gnn_pretraining_tpu.data.loaders import BalancedMultiDomainSampler
        from gnn_pretraining_tpu.data.synthetic import generate_tu_dataset
        from gnn_pretraining_tpu.parallel.data_parallel import (
            dp_pads,
            shard_sampler_step,
        )

        x, ei, noff, eoff, y = generate_tu_dataset("NCI1", seed=1, scale=0.2)
        store = GraphStore(name="N", node_features=x, edge_index=ei,
                           node_offsets=noff, edge_offsets=eoff, y=y,
                           splits={"train": np.arange(len(noff) - 1)},
                           graph_properties=np.zeros((len(noff) - 1, 12),
                                                     np.float32))
        sampler = BalancedMultiDomainSampler({"N": store},
                                             np.random.default_rng(1))
        n_dev = 4
        pads = dp_pads(sampler, n_dev)
        n_pad, e_pad, g_local = pads["N"]
        assert g_local == -(-sampler.samples_per_domain // n_dev)
        # Tighter than the per-device worst case (VERDICT r1 weak #7)...
        assert n_pad <= int(np.diff(noff).max()) * g_local
        # ...and every device sub-batch of every sampled step fits.
        for _ in range(10):
            step = shard_sampler_step(sampler, n_dev, pads)["N"]
            assert step.x.shape[:2] == (n_dev, n_pad)
            assert step.senders.shape == (n_dev, e_pad)
            per_dev_graphs = np.asarray(step.graph_mask).sum(axis=1)
            assert per_dev_graphs.sum() == sampler.samples_per_domain


class TestResumeLpSweepPlan:
    """scripts/resume_lp_sweep.py treats CSV presence as cross-reset
    completion: cells already recorded never re-run, and a (scheme, seed)
    pretrain chunk is skipped entirely once all its dependents are in."""

    def _mod(self):
        return _load("rls", ROOT / "scripts" / "resume_lp_sweep.py")

    def test_empty_csv_plans_everything(self):
        m = self._mod()
        b1, chunks = m.plan(set())
        assert len(b1) == 6                       # 2 strategies x 3 seeds
        assert len(chunks) == 24                  # 8 schemes x 3 seeds
        assert all(len(dep) == 3 for _, _, dep in chunks)

    def test_recorded_cells_drop_out(self):
        m = self._mod()
        done = {("CiteSeer_LP", "full_finetune", "b1", 42),
                # full b2_42 chunk recorded -> whole chunk skipped
                ("CiteSeer_LP", "full_finetune", "b2", 42),
                ("CiteSeer_LP", "linear_probe", "b2", 42),
                ("Cora_LP", "linear_probe", "b2", 42),
                # partial b3_84 chunk -> only the missing dependents remain
                ("CiteSeer_LP", "full_finetune", "b3", 84)}
        b1, chunks = m.plan(done)
        assert len(b1) == 5
        keys = {(s, seed) for s, seed, _ in chunks}
        assert ("b2", 42) not in keys
        (dep,) = [d for s, seed, d in chunks if (s, seed) == ("b3", 84)]
        assert dep  # truthy
        deps = dict(((s, seed), d) for s, seed, d in chunks)
        assert len(deps[("b3", 84)]) == 2
        assert len(deps[("b3", 42)]) == 3


class TestIsolateOrchestrator:
    """--isolate chunking (the OOM fix): chunk skipping on resume, child
    command construction, and incomplete-grid failure signalling."""

    @pytest.fixture(autouse=True)
    def _no_real_pause(self, monkeypatch):
        """run_isolated honors the REAL /tmp chip-pause handshake at chunk
        boundaries; a live acquire_chip request from outside the test
        session would otherwise park the test (observed: a concurrent
        csr_cell.py run deadlocked this class for its whole duration)."""
        from gnn_pretraining_tpu.utils import runtime

        monkeypatch.setattr(runtime, "honor_pause", lambda *a, **k: None)

    def _args(self, **kw):
        base = dict(isolate=2, resume=True, no_wandb=True, epochs=None,
                    out_root=None, num_shards=0, shard_index=None,
                    aggregation="pallas", grid_start=0, grid_count=0)
        base.update(kw)
        return types.SimpleNamespace(**base)

    def test_slice_after_shard(self):
        grid = list(range(10))
        args = self._args(grid_start=4, grid_count=3)
        assert run_pretrain.slice_grid(grid, args) == [4, 5, 6]
        args = self._args()                      # no slice flags -> identity
        assert run_pretrain.slice_grid(grid, args) == grid

    def test_isolate_parent_never_probes_jax(self):
        # No shard flags + isolate: shard_grid must not touch the backend.
        grid = [("b2", 42)]
        args = self._args()
        assert run_pretrain.shard_grid(grid, args) == grid

    def test_complete_chunks_skip_children(self, monkeypatch):
        calls = []
        monkeypatch.setattr(run_pretrain.subprocess, "call",
                            lambda cmd: calls.append(cmd) or 0)
        done = {"a", "b", "c", "d"}
        run_pretrain.run_isolated(
            "run_pretrain.py", ["a", "b", "c", "d"], self._args(),
            ["--sweep"], lambda c: None if c in done else c)
        assert calls == []                       # everything already done

    def test_children_get_slices_and_failure_raises(self, monkeypatch):
        calls = []
        done = set()

        def fake_call(cmd):
            calls.append(cmd)
            i = cmd.index("--grid_start")
            start, count = int(cmd[i + 1]), int(cmd[i + 3])
            # first child "completes" its cells; second child dies
            if start == 0:
                done.update(["a", "b"])
                return 0
            return -9

        monkeypatch.setattr(run_pretrain.subprocess, "call", fake_call)
        import pytest
        with pytest.raises(SystemExit) as e:
            run_pretrain.run_isolated(
                "run_pretrain.py", ["a", "b", "c", "d"], self._args(),
                ["--sweep"], lambda c: None if c in done else c)
        assert e.value.code == 1                 # c, d still incomplete
        assert len(calls) == 2
        assert calls[0][-4:] == ["--grid_start", "0", "--grid_count", "2"]
        assert calls[1][-4:] == ["--grid_start", "2", "--grid_count", "2"]

    def test_child_flags_forward_fidelity(self):
        args = self._args(epochs=50, out_root="/tmp/x", resume=True,
                          num_shards=2, shard_index=1)
        flags = run_pretrain.common_child_flags(args)
        assert "--resume" in flags and "--no_wandb" in flags
        assert flags[flags.index("--epochs") + 1] == "50"
        assert flags[flags.index("--out_root") + 1] == "/tmp/x"
        assert flags[flags.index("--num_shards") + 1] == "2"
        assert flags[flags.index("--aggregation") + 1] == "pallas"
