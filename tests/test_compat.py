"""Compat-layer tests: the reference-shaped class API works end-to-end for
every engine (the switch-over surface a pysvihmm user touches)."""

import jax
import numpy as np
import pytest

from pysvihmm_tpu.compat import (
    GibbsHMM,
    MetaObsHMM,
    MinibatchSVIHMM,
    SGDHMM,
    SVIHMM,
    VBHMM,
)
from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset, gen_multinomial_dataset


@pytest.fixture(scope="module")
def gauss_data():
    obs, z, _ = gen_gaussian_dataset(
        jax.random.PRNGKey(0), K=3, D=2, num_seqs=8, T=150,
        mean_scale=6.0, cov_scale=0.3,
    )
    return np.asarray(obs), np.asarray(z)


@pytest.fixture(scope="module")
def chain_data():
    obs, z, _ = gen_gaussian_dataset(
        jax.random.PRNGKey(1), K=3, D=2, num_seqs=1, T=2000,
        mean_scale=6.0, cov_scale=0.3,
    )
    return np.asarray(obs[0]), np.asarray(z[0])


class TestVBHMM:
    def test_full_reference_workflow(self, gauss_data):
        obs, z_true = gauss_data
        m = VBHMM(obs, K=3).infer(maxit=40)
        assert len(m.elbo_history) >= 2
        assert m.elbo_history[-1] > m.elbo_history[0]
        assert m.var_tran.shape == (3, 3)
        assert m.var_init.shape == (3,)
        assert m.hamming_dist(z_true) < 0.05
        assert m.decode().shape == obs.shape[:2]
        assert m.viterbi().shape == obs.shape[:2]
        assert np.isfinite(m.lower_bound())

    def test_tol_stop(self, gauss_data):
        obs, _ = gauss_data
        m = VBHMM(obs, K=3).infer(maxit=100, tol=1e-4)
        assert len(m.elbo_history) < 100

    def test_multinomial_autodetect(self):
        obs, z, _ = gen_multinomial_dataset(
            jax.random.PRNGKey(2), K=3, V=10, num_seqs=10, T=200, concentration=0.2
        )
        m = VBHMM(np.asarray(obs), K=3).infer(maxit=40)
        assert m.emission.name == "multinomial_dirichlet"
        assert m.hamming_dist(np.asarray(z)) < 0.2


class TestSVIFamily:
    def test_svihmm_single_chain(self, chain_data):
        chain, z_true = chain_data
        m = SVIHMM(chain, K=3, batch_size=16, subchain_len=50, buffer=10,
                   tau=10.0, kappa=0.6).infer(maxit=200)
        assert m.hamming_dist(z_true[None]) < 0.05

    def test_svihmm_rejects_multi_sequence(self, gauss_data):
        obs, _ = gauss_data
        with pytest.raises(ValueError, match="single long chain"):
            SVIHMM(obs, K=3)

    def test_minibatch_svi(self, gauss_data):
        obs, z_true = gauss_data
        m = MinibatchSVIHMM(obs, K=3, batch_size=4, tau=5.0, kappa=0.6).infer(maxit=300)
        assert m.hamming_dist(z_true) < 0.1

    def test_metaobs(self, chain_data):
        chain, z_true = chain_data
        m = MetaObsHMM(chain, K=3, minibatch=4, block_len=100, buffer=10,
                       tau=10.0, kappa=0.6).infer(maxit=150)
        assert m.hamming_dist(z_true[None]) < 0.05

    def test_sgdhmm(self, gauss_data):
        obs, z_true = gauss_data
        m = SGDHMM(obs, K=3, tau=1.0, kappa=0.55).infer(maxit=60)
        assert m.hamming_dist(z_true) < 0.05


class TestGibbsHMM:
    def test_gibbs(self, gauss_data):
        obs, z_true = gauss_data
        m = GibbsHMM(obs, K=3).infer(maxit=40)
        from pysvihmm_tpu.eval.metrics import hamming_error

        assert hamming_error(m.decode(), z_true, 3) < 0.05


class TestReferenceAccessors:
    def test_full_local_update_and_pred_logprob(self, gauss_data):
        obs, _ = gauss_data
        train, held = obs[:6], obs[6:]
        m = VBHMM(train, K=3).infer(maxit=30)
        gamma = m.full_local_update()
        assert gamma.shape == train.shape[:2] + (3,)
        np.testing.assert_allclose(gamma.sum(-1), 1.0, atol=1e-4)
        lp = m.pred_logprob(held)
        assert np.isfinite(lp) and lp < 0
        # exact posterior-predictive scoring path (Student-t)
        from pysvihmm_tpu.engines.base import predictive_log_likelihood

        lp_exact = float(
            predictive_log_likelihood(m.params, m.emission, np.asarray(held), exact=True)
        )
        assert np.isfinite(lp_exact)

    def test_var_emit_exposes_niw(self, gauss_data):
        obs, _ = gauss_data
        m = VBHMM(obs, K=3).infer(maxit=5)
        ve = m.var_emit
        # per-state emission posteriors as a leading-K NIW pytree
        assert ve.mean.shape == (3, 2) and ve.psi.shape == (3, 2, 2)


class TestDiagGaussianCompat:
    def test_vbhmm_diag_emission(self):
        from pysvihmm_tpu.data.synthetic import gen_diag_gaussian_dataset

        obs, z_true, _ = gen_diag_gaussian_dataset(
            jax.random.PRNGKey(31), 3, 2, num_seqs=10, T=150, mean_scale=6.0
        )
        m = VBHMM(np.asarray(obs), K=3, emission="diag_gaussian").infer(maxit=30)
        assert m.hamming_dist(np.asarray(z_true)) < 0.05
        e = m.elbo_history
        assert all(b >= a - abs(a) * 1e-5 for a, b in zip(e, e[1:]))
        # var_emit exposes the per-state NIG pytree
        assert m.var_emit.mean.shape == (3, 2) and m.var_emit.b.shape == (3, 2)
        lp = m.pred_logprob(np.asarray(obs[:2]))
        assert np.isfinite(lp) and lp < 0
