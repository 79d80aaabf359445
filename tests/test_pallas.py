"""Pallas fused-FB kernel tests (interpret mode on CPU; the same kernel
compiles via Mosaic on TPU — exercised by bench.py and the TPU drive).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysvihmm_tpu import messages
from pysvihmm_tpu.messages.pallas_fb import pallas_forward_backward_batched


rng = np.random.default_rng(21)


def problem(B, T, K):
    return (
        jnp.array(np.log(rng.dirichlet(np.ones(K))), jnp.float32),
        jnp.array(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32),
        jnp.array(rng.normal(size=(B, T, K)) * 2, jnp.float32),
    )


class TestPallasFB:
    @pytest.mark.parametrize("B,T,K", [(4, 64, 8), (3, 50, 5), (8, 33, 16)])
    def test_matches_scan(self, B, T, K):
        log_pi, log_A, ll = problem(B, T, K)
        fb = pallas_forward_backward_batched(log_pi, log_A, ll, interpret=True)
        ref = jax.vmap(lambda l: messages.forward_backward(log_pi, log_A, l))(ll)
        np.testing.assert_allclose(np.array(fb.gamma), np.array(ref.gamma), atol=2e-6)
        np.testing.assert_allclose(np.array(fb.log_z), np.array(ref.log_z), rtol=2e-6)
        np.testing.assert_allclose(
            np.array(fb.trans_stats), np.array(ref.trans_stats), atol=2e-5
        )
        np.testing.assert_allclose(
            np.array(fb.init_stats), np.array(ref.init_stats), atol=2e-6
        )
        np.testing.assert_allclose(np.array(fb.log_c), np.array(ref.log_c), atol=2e-5)

    def test_stats_sum_properties(self):
        log_pi, log_A, ll = problem(4, 40, 6)
        fb = pallas_forward_backward_batched(log_pi, log_A, ll, interpret=True)
        # each xi_t sums to 1 => per-seq trans stats sum to T-1
        np.testing.assert_allclose(
            np.array(fb.trans_stats.sum(axis=(1, 2))), 39.0, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.array(fb.gamma.sum(-1)), 1.0, rtol=1e-5
        )
