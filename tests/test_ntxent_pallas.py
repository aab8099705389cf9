"""Fused NT-Xent Pallas kernel vs the XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pretraining_tpu.ops.ntxent_pallas import nt_xent_pallas
from gnn_pretraining_tpu.ops.sddmm import nt_xent_loss


def _case(seed, n, d, n_valid):
    rng = np.random.default_rng(seed)
    z1 = rng.normal(size=(n, d)).astype(np.float32)
    z2 = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.arange(n) < n_valid
    return jnp.array(z1), jnp.array(z2), jnp.array(valid)


class TestFusedNTXent:
    def test_forward_matches_reference(self):
        z1, z2, valid = _case(0, 24, 16, 17)
        temp = jnp.float32(0.43)
        ref_sum, ref_rows = nt_xent_loss(z1, z2, temp, valid)
        got_sum, got_rows = nt_xent_pallas(z1, z2, temp, valid)
        np.testing.assert_allclose(float(got_rows), float(ref_rows))
        np.testing.assert_allclose(float(got_sum), float(ref_sum), rtol=1e-4)

    def test_forward_all_valid(self):
        z1, z2, valid = _case(1, 32, 8, 32)
        temp = jnp.float32(0.5)
        ref_sum, _ = nt_xent_loss(z1, z2, temp, valid)
        got_sum, _ = nt_xent_pallas(z1, z2, temp, valid)
        np.testing.assert_allclose(float(got_sum), float(ref_sum), rtol=1e-4)

    def test_gradients_match_reference_autodiff(self):
        z1, z2, valid = _case(2, 16, 8, 11)
        temp = jnp.float32(0.37)

        def f_ref(a, b):
            s, n = nt_xent_loss(a, b, temp, valid)
            return s / jnp.maximum(n, 1.0)

        def f_pl(a, b):
            s, n = nt_xent_pallas(a, b, temp, valid)
            return s / jnp.maximum(n, 1.0)

        g1_ref, g2_ref = jax.grad(f_ref, argnums=(0, 1))(z1, z2)
        g1_pl, g2_pl = jax.grad(f_pl, argnums=(0, 1))(z1, z2)
        np.testing.assert_allclose(np.asarray(g1_pl), np.asarray(g1_ref),
                                   rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2_pl), np.asarray(g2_ref),
                                   rtol=2e-3, atol=1e-5)
        # padding rows receive no gradient
        np.testing.assert_allclose(np.asarray(g1_pl)[11:], 0.0)
