"""Long-chain path tests: blocked (time-tiled) FB equals the sequential scan
on every shape/padding case, and handles a T=100k chain with bounded memory
(BASELINE config 4, scaled for CPU CI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysvihmm_tpu import messages
from pysvihmm_tpu.messages.blocked import forward_backward_blocked


rng = np.random.default_rng(11)


def problem(T, K):
    return (
        jnp.array(np.log(rng.dirichlet(np.ones(K)))),
        jnp.array(np.log(rng.dirichlet(np.ones(K), size=K))),
        jnp.array(rng.normal(size=(T, K)) * 2.0),
    )


class TestBlockedFB:
    @pytest.mark.parametrize("T,S", [(40, 8), (37, 8), (100, 256), (2, 4), (257, 64)])
    def test_matches_scan_all_shapes(self, T, S, enable_x64):
        log_pi, log_A, ll = problem(T, 5)
        w = jnp.array((rng.uniform(size=T) > 0.3).astype(np.float64))
        a = messages.forward_backward(log_pi, log_A, ll, w)
        b = forward_backward_blocked(log_pi, log_A, ll, w, block_size=S)
        np.testing.assert_allclose(np.array(b.gamma), np.array(a.gamma), atol=1e-12)
        np.testing.assert_allclose(float(b.log_z), float(a.log_z), rtol=1e-12)
        np.testing.assert_allclose(
            np.array(b.trans_stats), np.array(a.trans_stats), atol=1e-11
        )
        np.testing.assert_allclose(np.array(b.log_c), np.array(a.log_c), atol=1e-11)

    def test_long_chain_f32(self):
        """T=20k single chain in f32: logZ agrees with scan to float tolerance."""
        T, Ks = 20_000, 8
        log_pi, log_A, ll = problem(T, Ks)
        log_pi, log_A, ll = (x.astype(jnp.float32) for x in (log_pi, log_A, ll))
        a = messages.forward_backward(log_pi, log_A, ll)
        b = forward_backward_blocked(log_pi, log_A, ll, block_size=512)
        np.testing.assert_allclose(float(b.log_z), float(a.log_z), rtol=3e-6)
        np.testing.assert_allclose(np.array(b.gamma), np.array(a.gamma), atol=3e-4)

    def test_extreme_underflow_resistance(self, enable_x64):
        """Per-tile renormalization must survive T=5000 of strongly-peaked
        likelihoods whose raw product underflows any float."""
        T, Ks = 5000, 4
        log_pi, log_A, ll = problem(T, Ks)
        ll = ll - 500.0  # shift: raw lik products underflow immediately
        a = messages.forward_backward(log_pi, log_A, ll)
        b = forward_backward_blocked(log_pi, log_A, ll, block_size=128)
        assert np.isfinite(float(b.log_z))
        np.testing.assert_allclose(float(b.log_z), float(a.log_z), rtol=1e-12)
