"""LP hard-negative mining: dense vs streaming paths.

The streaming miner (finetune/mining.py) must return exactly the dense
path's hard set (block-local top-k is exact: every global winner wins its
own block) and a uniform remainder that is valid — allowed pairs only, no
duplicates, disjoint from the hard set.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pretraining_tpu.finetune.mining import (
    build_forbidden_mask,
    candidate_count,
    hard_count,
    mine_hard_negatives,
    mine_hard_negatives_streaming,
)


def _setup(n=300, h=16, num_edges=400, seed=0):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    edges = rng.integers(0, n, size=(2, num_edges))
    forbidden = build_forbidden_mask(n, edges)
    return emb, edges, forbidden


class TestStreamingMiner:
    def test_hard_set_matches_dense(self):
        emb, edges, forbidden = _setup()
        n = emb.shape[0]
        num_neg = 256
        nh = hard_count(candidate_count(n, edges), num_neg)
        key = jax.random.PRNGKey(7)

        ds, dr = mine_hard_negatives(emb, forbidden, key,
                                     num_negatives=num_neg, num_hard=nh)
        ss, sr = mine_hard_negatives_streaming(emb, forbidden, key,
                                               num_negatives=num_neg,
                                               num_hard=nh, row_block=64)
        dense_hard = set(zip(np.asarray(ds)[:nh].tolist(),
                             np.asarray(dr)[:nh].tolist()))
        stream_hard = set(zip(np.asarray(ss)[:nh].tolist(),
                              np.asarray(sr)[:nh].tolist()))
        assert dense_hard == stream_hard

    def test_streaming_negatives_are_valid(self):
        emb, edges, forbidden = _setup(seed=3)
        n = emb.shape[0]
        num_neg = 200
        nh = hard_count(candidate_count(n, edges), num_neg)
        fb = np.asarray(forbidden)

        s, r = mine_hard_negatives_streaming(emb, forbidden,
                                             jax.random.PRNGKey(11),
                                             num_negatives=num_neg,
                                             num_hard=nh, row_block=128)
        s, r = np.asarray(s), np.asarray(r)
        assert s.shape == r.shape == (num_neg,)
        assert not fb[s, r].any()
        pairs = list(zip(s.tolist(), r.tolist()))
        assert len(set(pairs)) == num_neg

    def test_all_hard_no_random(self):
        emb, edges, forbidden = _setup(n=130, seed=5)
        s, r = mine_hard_negatives_streaming(emb, forbidden,
                                             jax.random.PRNGKey(0),
                                             num_negatives=32, num_hard=32,
                                             row_block=64)
        ds, dr = mine_hard_negatives(emb, forbidden, jax.random.PRNGKey(0),
                                     num_negatives=32, num_hard=32)
        assert (set(zip(np.asarray(s).tolist(), np.asarray(r).tolist()))
                == set(zip(np.asarray(ds).tolist(), np.asarray(dr).tolist())))

    def test_reverse_of_hard_pair_never_sampled(self):
        # The reference clears BOTH orientations of each hard pair before
        # uniform sampling (finetune.py:84-86). Force the regime where the
        # hard top-k keeps only one orientation of many tied pairs: rows
        # drawn from 4 distinct vectors give massive sim=1.0 ties, and
        # lax.top_k breaks ties by flat index, preferring (i, j) with small
        # i and leaving the (j, i) reverses out of the hard set.
        n, h = 64, 8
        rng = np.random.default_rng(17)
        protos = rng.normal(size=(4, h)).astype(np.float32)
        emb = jnp.asarray(protos[np.arange(n) % 4])
        edges = rng.integers(0, n, size=(2, 40))
        forbidden = build_forbidden_mask(n, edges)
        fb = np.asarray(forbidden)
        num_neg, nh = 256, 31

        for seed in range(5):
            key = jax.random.PRNGKey(seed)
            for miner, kw in ((mine_hard_negatives, {}),
                              (mine_hard_negatives_streaming,
                               {"row_block": 16})):
                s, r = miner(emb, forbidden, key, num_negatives=num_neg,
                             num_hard=nh, **kw)
                s, r = np.asarray(s), np.asarray(r)
                hard = set(zip(s[:nh].tolist(), r[:nh].tolist()))
                rand = list(zip(s[nh:].tolist(), r[nh:].tolist()))
                assert not fb[s, r].any()
                assert len(set(zip(s.tolist(), r.tolist()))) == num_neg
                for u, v in rand:
                    assert (v, u) not in hard, (miner.__name__, seed, (u, v))

    def test_padding_rows_are_not_candidates(self):
        # Padded batches must mine over real nodes only (the reference has
        # no padding; zero-embedding padding rows would otherwise tie into
        # the pool at cosine 0).
        n_real, n = 37, 40
        rng = np.random.default_rng(23)
        emb = np.zeros((n, 8), np.float32)
        emb[:n_real] = rng.normal(size=(n_real, 8))
        edges = rng.integers(0, n_real, size=(2, 30))
        node_mask = np.zeros(n, np.float32)
        node_mask[:n_real] = 1.0

        forbidden = build_forbidden_mask(n, edges, node_mask=node_mask)
        fb = np.asarray(forbidden)
        assert fb[n_real:, :].all() and fb[:, n_real:].all()

        n_cand = candidate_count(n, edges, num_real_nodes=n_real)
        te = np.asarray(edges)
        und = {(int(u), int(v)) for u, v in te.T if u != v}
        und |= {(v, u) for u, v in und}
        assert n_cand == n_real * n_real - n_real - len(und)

        s, r = mine_hard_negatives(jnp.asarray(emb), forbidden,
                                   jax.random.PRNGKey(1), num_negatives=64,
                                   num_hard=hard_count(n_cand, 64))
        s, r = np.asarray(s), np.asarray(r)
        assert (s < n_real).all() and (r < n_real).all()

    def test_non_divisible_row_block_pads_cleanly(self):
        emb, edges, forbidden = _setup(n=250, seed=9)
        n = emb.shape[0]
        s, r = mine_hard_negatives_streaming(emb, forbidden,
                                             jax.random.PRNGKey(2),
                                             num_negatives=64, num_hard=16,
                                             row_block=96)
        s, r = np.asarray(s), np.asarray(r)
        assert (s < n).all() and (r < n).all()
        assert not np.asarray(forbidden)[s, r].any()
