"""Duplex E-step (messages/pallas_duplex.py): interpret-mode parity with
the fused kernels across shapes/modes, engine routing, and Mosaic
lowering legality. The duplex variant interleaves the forward and
backward chain recursions in one kernel (halved serial depth) and
computes gamma/xi/emission stats chain-free from the stored raw
alpha/beta — the scale-cancellation identities it relies on are exactly
what these parity assertions pin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysvihmm_tpu.messages.pallas_duplex import pallas_estep_duplex
from pysvihmm_tpu.messages.pallas_fb import pallas_estep_fused

rng = np.random.default_rng(11)


def problem(K, D, T, B, seed=0):
    r = np.random.default_rng(seed)
    F = 1 + D + D * (D + 1) // 2
    return (
        jnp.array(np.log(r.dirichlet(np.ones(K))), jnp.float32),
        jnp.array(np.log(r.dirichlet(np.ones(K), size=K)), jnp.float32),
        jnp.array(r.normal(size=(F, K)) * 0.1, jnp.float32),
        jnp.array(r.normal(size=(T, B, F)), jnp.float32),
    )


def assert_parity(out_f, out_d, atol=5e-6, rtol=2e-5):
    fb_f, S_f = out_f
    fb_d, S_d = out_d
    pairs = [
        ("log_c", fb_f.log_c, fb_d.log_c),
        ("log_z", fb_f.log_z, fb_d.log_z),
        ("trans", fb_f.trans_stats, fb_d.trans_stats),
        ("init", fb_f.init_stats, fb_d.init_stats),
        ("emit", S_f, S_d),
    ]
    if fb_f.gamma is not None:
        pairs.append(("gamma", fb_f.gamma, fb_d.gamma))
    for name, a, b in pairs:
        a, b = np.array(a), np.array(b)
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() / scale < max(atol, rtol), name


class TestDuplexParity:
    @pytest.mark.parametrize(
        "K,D,T,B",
        [
            (64, 8, 64, 32),   # P=2 packing, several time tiles
            (128, 3, 70, 16),  # P=1, whole-axis time tile
            (16, 2, 33, 24),   # P=8, odd T
            (32, 5, 200, 64),  # multiple row tiles possible
        ],
    )
    def test_matches_fused(self, K, D, T, B):
        lp, la, W, fe = problem(K, D, T, B)
        assert_parity(
            pallas_estep_fused(lp, la, W, fe, interpret=True),
            pallas_estep_duplex(lp, la, W, fe, interpret=True),
        )

    def test_emit_gamma(self):
        lp, la, W, fe = problem(64, 8, 64, 32, seed=1)
        assert_parity(
            pallas_estep_fused(lp, la, W, fe, emit_gamma=True, interpret=True),
            pallas_estep_duplex(lp, la, W, fe, emit_gamma=True, interpret=True),
        )

    def test_gated(self):
        lp, la, W, fe = problem(64, 8, 64, 32, seed=2)
        w = jnp.array((np.random.default_rng(5).random((64, 32)) > 0.3),
                      jnp.float32)
        assert_parity(
            pallas_estep_fused(lp, la, W, fe, weights=w, interpret=True),
            pallas_estep_duplex(lp, la, W, fe, weights=w, interpret=True),
        )

    def test_bf16x3_close_to_exact(self):
        lp, la, W, fe = problem(64, 8, 64, 32, seed=3)
        assert_parity(
            pallas_estep_fused(lp, la, W, fe, interpret=True),
            pallas_estep_duplex(
                lp, la, W, fe, interpret=True,
                precision="bf16x3", ll_precision="bf16x3",
                stats_precision="bf16x3",
            ),
            rtol=2e-3,
        )


class TestDuplexEngineRouting:
    def test_env_knob_routes_and_matches(self, monkeypatch):
        from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset
        from pysvihmm_tpu.distributions import GaussianNIW
        from pysvihmm_tpu.engines.base import batch_local_step
        from pysvihmm_tpu.models.hmm import init_params, make_prior

        K, D, B, T = 64, 4, 8, 40
        obs, _, _ = gen_gaussian_dataset(jax.random.PRNGKey(0), K, D, B, T)
        prior = make_prior(K, GaussianNIW, obs_dim=D)
        params = init_params(jax.random.PRNGKey(1), prior, GaussianNIW, obs)
        monkeypatch.delenv("PYSVIHMM_DUPLEX", raising=False)
        s0, g0 = batch_local_step(params, GaussianNIW, obs, "pallas_fused")
        monkeypatch.setenv("PYSVIHMM_DUPLEX", "1")
        s1, g1 = batch_local_step(params, GaussianNIW, obs, "pallas_fused")
        np.testing.assert_allclose(np.array(g0), np.array(g1), atol=1e-5)
        for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
            a, b = np.array(a), np.array(b)
            scale = np.abs(a).max() + 1e-12
            assert np.abs(a - b).max() / scale < 1e-4


class TestDuplexTPULowering:
    """AOT Mosaic lowering (tests/test_tpu_lowering.py pattern)."""

    K, D, T, B = 64, 8, 64, 32
    F = 1 + D + D * (D + 1) // 2
    LOG_PI = jnp.array(np.log(rng.dirichlet(np.ones(K))), jnp.float32)
    LOG_A = jnp.array(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32)
    FEATS = jax.ShapeDtypeStruct((T, B, F), jnp.float32)
    WMAT = jax.ShapeDtypeStruct((F, K), jnp.float32)
    MASK = jax.ShapeDtypeStruct((T, B), jnp.float32)

    def _lowers(self, f, *args):
        text = jax.jit(f).trace(*args).lower(
            lowering_platforms=("tpu",)
        ).as_text()
        assert "tpu_custom_call" in text

    def test_plain(self):
        self._lowers(
            lambda p, A, W, f: pallas_estep_duplex(p, A, W, f),
            self.LOG_PI, self.LOG_A, self.WMAT, self.FEATS,
        )

    def test_gated_gamma_bf16x3(self):
        self._lowers(
            lambda p, A, W, f, w: pallas_estep_duplex(
                p, A, W, f, weights=w, emit_gamma=True,
                precision="bf16x3", ll_precision="bf16x3",
                stats_precision="bf16x3",
            ),
            self.LOG_PI, self.LOG_A, self.WMAT, self.FEATS, self.MASK,
        )
