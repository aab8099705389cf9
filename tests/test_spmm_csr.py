"""Block-CSR sparse GIN aggregation vs the COO reference (ops/spmm_csr.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_pretraining_tpu.ops.spmm import gin_aggregate_coo
from gnn_pretraining_tpu.ops.spmm_csr import (
    BlockCSR,
    build_block_csr,
    gin_aggregate_csr,
)


def _graph(seed, n, e, masked=0):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = np.ones(e, np.float32)
    if masked:
        mask[rng.choice(e, masked, replace=False)] = 0.0
    h = rng.normal(size=(n, 48)).astype(np.float32)
    return senders, receivers, mask, h


def _ref(h, s, r, m, eps):
    return gin_aggregate_coo(jnp.asarray(h), jnp.asarray(s), jnp.asarray(r),
                             jnp.asarray(m), eps)


class TestBuildBlockCSR:
    def test_tiles_reconstruct_adjacency(self):
        s, r, m, _ = _graph(0, 300, 900, masked=50)
        bsr = build_block_csr(s, r, m, 300, bm=128, bk=128)
        dense = np.zeros((384, 384), np.float32)
        for t in range(bsr.nnzb):
            i, j = int(bsr.rows[t]), int(bsr.cols[t])
            dense[i * 128:(i + 1) * 128, j * 128:(j + 1) * 128] += np.asarray(
                bsr.vals[t])
        want = np.zeros((384, 384), np.float32)
        np.add.at(want, (r, s), m)
        np.testing.assert_array_equal(dense, want)
        # every tile-row is present (empty rows get a zero pad tile)
        assert set(np.asarray(bsr.rows).tolist()) == {0, 1, 2}
        # rows sorted
        assert (np.diff(np.asarray(bsr.rows)) >= 0).all()

    def test_pad_to_fixed_count(self):
        s, r, m, _ = _graph(1, 200, 100)
        bsr = build_block_csr(s, r, m, 200, pad_to=64)
        assert bsr.nnzb == 64
        assert bsr.vals_t.shape[0] == 64

    def test_transposed_tiles(self):
        s, r, m, _ = _graph(2, 260, 700)
        bsr = build_block_csr(s, r, m, 260)
        dense_t = np.zeros((384, 384), np.float32)
        for t in range(bsr.vals_t.shape[0]):
            i, j = int(bsr.rows_t[t]), int(bsr.cols_t[t])
            dense_t[i * 128:(i + 1) * 128, j * 128:(j + 1) * 128] += (
                np.asarray(bsr.vals_t[t]))
        want = np.zeros((384, 384), np.float32)
        np.add.at(want, (r, s), m)
        np.testing.assert_array_equal(dense_t, want.T)


class TestSpmmCSR:
    @pytest.mark.parametrize("n,e", [(130, 400), (520, 2000)])
    def test_matches_coo(self, n, e):
        s, r, m, h = _graph(3, n, e, masked=e // 10)
        eps = jnp.float32(0.17)
        bsr = build_block_csr(s, r, m, n)
        got = gin_aggregate_csr(jnp.asarray(h), bsr, eps, mode="highest")
        want = _ref(h, s, r, m, eps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_isolated_nodes_rows_written(self):
        """Nodes in tile-rows with no incoming edges must still get
        (1+eps) h, not stale memory."""
        n = 300  # 3 tile-rows; edges confined to the first 100 nodes
        rng = np.random.default_rng(4)
        s = rng.integers(0, 100, 200).astype(np.int32)
        r = rng.integers(0, 100, 200).astype(np.int32)
        m = np.ones(200, np.float32)
        h = rng.normal(size=(n, 32)).astype(np.float32)
        bsr = build_block_csr(s, r, m, n)
        got = gin_aggregate_csr(jnp.asarray(h), bsr, jnp.float32(0.0),
                                mode="highest")
        want = _ref(h, s, r, m, jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_coo(self):
        s, r, m, h = _graph(5, 200, 600)
        bsr = build_block_csr(s, r, m, 200)

        def f_csr(hh, eps):
            return jnp.sum(gin_aggregate_csr(hh, bsr, eps, mode="highest")
                           ** 2)

        def f_coo(hh, eps):
            return jnp.sum(_ref(hh, s, r, m, eps) ** 2)

        gh_c, ge_c = jax.grad(f_csr, argnums=(0, 1))(jnp.asarray(h),
                                                     jnp.float32(0.3))
        gh_r, ge_r = jax.grad(f_coo, argnums=(0, 1))(jnp.asarray(h),
                                                     jnp.float32(0.3))
        np.testing.assert_allclose(np.asarray(gh_c), np.asarray(gh_r),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(ge_c), float(ge_r), rtol=1e-4)

    def test_split_mode_close(self):
        s, r, m, h = _graph(6, 256, 800)
        bsr = build_block_csr(s, r, m, 256)
        got = gin_aggregate_csr(jnp.asarray(h), bsr, jnp.float32(0.1),
                                mode="split")
        want = _ref(h, s, r, m, jnp.float32(0.1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_shared_compile_across_pad(self):
        """Graphs padded to the same tile count reuse one jitted kernel."""
        s1, r1, m1, h = _graph(7, 256, 300)
        s2, r2, m2, _ = _graph(8, 256, 500)
        b1 = build_block_csr(s1, r1, m1, 256, pad_to=16)
        b2 = build_block_csr(s2, r2, m2, 256, pad_to=16)
        eps = jnp.float32(0.0)
        got1 = gin_aggregate_csr(jnp.asarray(h), b1, eps, mode="highest")
        got2 = gin_aggregate_csr(jnp.asarray(h), b2, eps, mode="highest")
        np.testing.assert_allclose(np.asarray(got1),
                                   np.asarray(_ref(h, s1, r1, m1, eps)),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got2),
                                   np.asarray(_ref(h, s2, r2, m2, eps)),
                                   rtol=1e-5, atol=1e-5)


class TestRCMOrder:
    def test_rcm_reduces_tile_count_and_preserves_semantics(self):
        from gnn_pretraining_tpu.ops.spmm_csr import rcm_order

        # A graph with locality that a bad labeling hides: ring + short-range
        # chords, then randomly permuted labels.
        rng = np.random.default_rng(9)
        n = 1024
        base_s = np.arange(n, dtype=np.int32)
        base_r = ((base_s + 1 + rng.integers(0, 8, n)) % n).astype(np.int32)
        scramble = rng.permutation(n).astype(np.int32)
        s, r = scramble[base_s], scramble[base_r]
        m = np.ones(n, np.float32)
        h = rng.normal(size=(n, 32)).astype(np.float32)
        eps = jnp.float32(0.2)

        perm = rcm_order(s, r, n)
        inv = np.argsort(perm).astype(np.int32)
        s2, r2 = inv[s], inv[r]

        bsr_raw = build_block_csr(s, r, m, n)
        bsr_rcm = build_block_csr(s2, r2, m, n)
        assert bsr_rcm.nnzb < bsr_raw.nnzb  # locality recovered

        # aggregation in the permuted labeling == permuted aggregation
        got = gin_aggregate_csr(jnp.asarray(h[perm]), bsr_rcm, eps,
                                mode="highest")
        want = _ref(h, s, r, m, eps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want)[perm],
                                   rtol=1e-5, atol=1e-5)


class TestShardedCSR:
    def test_tile_partitioned_matches_single_device(self):
        """Tiles sharded over the 8-device mesh: psum-combined partials must
        equal the single-device aggregation (replicated-epilogue corrected)."""
        from gnn_pretraining_tpu.ops.spmm_csr import (
            csr_aggregate_sharded,
            shard_block_csr,
        )
        from gnn_pretraining_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        mesh = make_mesh(n_data=1, n_edge=n_dev)
        s, r, m, h = _graph(10, 700, 2500, masked=100)
        eps = jnp.float32(0.21)
        bsr = build_block_csr(s, r, m, 700)
        sharded = shard_block_csr(bsr, n_dev)
        assert sharded.vals.shape[0] % n_dev == 0
        got = csr_aggregate_sharded(mesh, sharded, jnp.asarray(h), eps,
                                    axis="edge", mode="highest")
        want = _ref(h, s, r, m, eps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestModelCSR:
    def test_finetune_model_csr_matches_coo(self):
        """The full FinetuneGNN forward with aggregation='csr' (BlockCSR
        passed through embed/backbone) equals the COO forward."""
        import jax

        from gnn_pretraining_tpu.models.finetune_model import FinetuneGNN

        rng = np.random.default_rng(11)
        n, e, d = 260, 800, 1433
        s = rng.integers(0, n, e).astype(np.int32)
        r = rng.integers(0, n, e).astype(np.int32)
        m = np.ones(e, np.float32)
        x = rng.normal(size=(n, d)).astype(np.float32)
        mask = np.ones(n, np.float32)
        bsr = build_block_csr(s, r, m, n)

        coo_model = FinetuneGNN(domain_name="Cora_NC", aggregation="coo")
        csr_model = FinetuneGNN(domain_name="Cora_NC", aggregation="csr")
        variables = coo_model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(x), jnp.asarray(mask), False,
            senders=jnp.asarray(s), receivers=jnp.asarray(r),
            edge_mask=jnp.asarray(m))
        want = coo_model.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                               False, senders=jnp.asarray(s),
                               receivers=jnp.asarray(r),
                               edge_mask=jnp.asarray(m))
        got = csr_model.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                              False, bsr=bsr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
