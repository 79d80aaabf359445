"""Gibbs comparison-engine tests: FFBS sweep mixes and recovers truth on
well-separated synthetic data (the reference's "Gibbs-style comparisons").
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset, gen_multinomial_dataset
from pysvihmm_tpu.distributions import GaussianNIW, MultinomialDirichlet
from pysvihmm_tpu.engines import gibbs
from pysvihmm_tpu.eval.metrics import hamming_error
from pysvihmm_tpu.models.hmm import make_prior


class TestGibbsGaussian:
    def test_recovery_and_loglik_improves(self):
        K, D, B, T = 4, 2, 10, 200
        obs, z_true, true = gen_gaussian_dataset(
            jax.random.PRNGKey(0), K, D, B, T, mean_scale=6.0, cov_scale=0.3
        )
        prior = make_prior(K, GaussianNIW, obs_dim=D)
        state = gibbs.init_state(jax.random.PRNGKey(1), prior, GaussianNIW, obs, K)
        state, metrics = gibbs.run(state, prior, obs, GaussianNIW, K, num_sweeps=60)
        mll = np.array(metrics["marginal_loglik"])
        assert np.mean(mll[-10:]) > np.mean(mll[:5])
        err = hamming_error(np.array(state.z), np.array(z_true), K)
        assert err < 0.05, f"hamming {err}"
        # transition matrix posterior draw near truth after relabeling
        from pysvihmm_tpu.eval.metrics import best_permutation

        perm = best_permutation(np.array(state.z), np.array(z_true), K)
        A_draw = np.array(state.theta[1])
        A_relabeled = A_draw[np.argsort(perm)][:, np.argsort(perm)]
        assert np.abs(A_relabeled - np.array(true.A)).max() < 0.15


class TestGibbsMultinomial:
    def test_recovery(self):
        K, V, B, T = 3, 12, 10, 300
        obs, z_true, _ = gen_multinomial_dataset(
            jax.random.PRNGKey(2), K, V, B, T, concentration=0.2
        )
        prior = make_prior(K, MultinomialDirichlet, num_symbols=V)
        state = gibbs.init_state(
            jax.random.PRNGKey(3), prior, MultinomialDirichlet, obs, K
        )
        state, _ = gibbs.run(state, prior, obs, MultinomialDirichlet, K, num_sweeps=80)
        err = hamming_error(np.array(state.z), np.array(z_true), K)
        assert err < 0.15, f"hamming {err}"


class TestGibbsDiagGaussian:
    def test_recovery(self):
        from pysvihmm_tpu.data.synthetic import gen_diag_gaussian_dataset
        from pysvihmm_tpu.distributions import DiagonalGaussianNIG

        K, D, B, T = 4, 2, 10, 200
        obs, z_true, _ = gen_diag_gaussian_dataset(
            jax.random.PRNGKey(2), K, D, B, T, mean_scale=6.0, var_scale=0.3
        )
        prior = make_prior(K, DiagonalGaussianNIG, obs_dim=D)
        state = gibbs.init_state(jax.random.PRNGKey(3), prior, DiagonalGaussianNIG, obs, K)
        state, metrics = gibbs.run(state, prior, obs, DiagonalGaussianNIG, K, num_sweeps=60)
        mll = np.array(metrics["marginal_loglik"])
        assert np.mean(mll[-10:]) > np.mean(mll[:5])
        err = hamming_error(np.array(state.z), np.array(z_true), K)
        assert err < 0.05, f"hamming {err}"
