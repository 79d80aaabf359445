"""Golden tests for the conjugate distribution layer (SURVEY.md §7 step 1).

Verifies the pybasicbayes-replacement math against scipy closed forms, the
NumPy oracle, and Monte-Carlo estimates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special as sps
from scipy import stats as scistats

from pysvihmm_tpu.distributions import dirichlet, niw
from pysvihmm_tpu.distributions.emissions import GaussianNIW, MultinomialDirichlet
from pysvihmm_tpu.oracle import numpy_ref as oracle


rng = np.random.default_rng(42)


class TestDirichlet:
    def test_expected_log_probs_scipy(self):
        alpha = rng.uniform(0.5, 5.0, size=(3, 4))
        got = np.array(dirichlet.expected_log_probs(jnp.array(alpha)))
        want = sps.digamma(alpha) - sps.digamma(alpha.sum(-1, keepdims=True))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_kl_zero_and_positive(self):
        q = jnp.array(rng.uniform(0.5, 5.0, size=(5, 4)))
        p = jnp.array(rng.uniform(0.5, 5.0, size=(5, 4)))
        np.testing.assert_allclose(np.array(dirichlet.kl(q, q)), 0.0, atol=1e-5)
        assert np.all(np.array(dirichlet.kl(q, p)) >= -1e-6)

    def test_kl_monte_carlo(self):
        q = np.array([2.0, 3.0, 1.5])
        p = np.array([1.0, 1.0, 1.0])
        samples = rng.dirichlet(q, size=200_000)
        lq = scistats.dirichlet.logpdf(samples.T, q)
        lp = scistats.dirichlet.logpdf(samples.T, p)
        mc = (lq - lp).mean()
        got = float(dirichlet.kl(jnp.array(q), jnp.array(p)))
        assert abs(got - mc) < 0.02

    def test_nat_grad_rho1_equals_posterior(self):
        q = jnp.array(rng.uniform(0.5, 5.0, size=(4, 4)))
        p = jnp.array(rng.uniform(0.5, 5.0, size=(4, 4)))
        s = jnp.array(rng.uniform(0.0, 10.0, size=(4, 4)))
        np.testing.assert_allclose(
            np.array(dirichlet.nat_grad_step(q, p, s, 1.0, 1.0)),
            np.array(dirichlet.posterior(p, s)),
            rtol=1e-6,
        )


class TestNIW:
    def _random_q(self, K=3, D=2):
        mean = rng.normal(size=(K, D))
        kappa = rng.uniform(0.5, 5.0, size=(K,))
        nu = rng.uniform(D + 2.0, D + 10.0, size=(K,))
        W = rng.normal(size=(K, D, D))
        psi = np.einsum("kde,kfe->kdf", W, W) + 3.0 * np.eye(D)
        return niw.NIW(
            mean=jnp.array(mean, jnp.float32),
            kappa=jnp.array(kappa, jnp.float32),
            nu=jnp.array(nu, jnp.float32),
            psi=jnp.array(psi, jnp.float32),
        )

    def test_expected_log_likelihood_vs_oracle(self):
        q = self._random_q()
        y = rng.normal(size=(50, 2))
        got = np.array(niw.expected_log_likelihood(q, jnp.array(y, jnp.float32)))
        want = oracle.niw_expected_log_likelihood(
            np.array(q.mean, np.float64),
            np.array(q.kappa, np.float64),
            np.array(q.nu, np.float64),
            np.array(q.psi, np.float64),
            y,
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_ell_feature_matrix_matches_expected_log_likelihood(self):
        # feats(y) @ W must equal the reference expected_log_likelihood —
        # this identity is what lets the pallas E-step share ONE feature
        # array between the likelihood and emission-stats matmuls.
        q = self._random_q(K=5, D=3)
        y = jnp.array(rng.normal(size=(7, 11, 3)), jnp.float32)
        want = np.array(niw.expected_log_likelihood(q, y))
        got = np.array(niw.ell_features(y) @ niw.ell_feature_matrix(q))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_posterior_vs_oracle(self):
        K, D = 3, 2
        prior = niw.make_prior(K, D)
        gamma = rng.uniform(size=(40, K)).astype(np.float32)
        y = rng.normal(size=(40, D)).astype(np.float32)
        stats = niw.suff_stats(jnp.array(gamma), jnp.array(y))
        post = niw.posterior(prior, stats)
        m, k, n, p = oracle.niw_posterior(
            np.array(prior.mean, np.float64),
            np.array(prior.kappa, np.float64),
            np.array(prior.nu, np.float64),
            np.array(prior.psi, np.float64),
            gamma.sum(0).astype(np.float64),
            (gamma.T @ y).astype(np.float64),
            np.einsum("tk,td,te->kde", gamma, y, y).astype(np.float64),
        )
        np.testing.assert_allclose(np.array(post.mean), m, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.array(post.kappa), k, rtol=1e-5)
        np.testing.assert_allclose(np.array(post.nu), n, rtol=1e-5)
        np.testing.assert_allclose(np.array(post.psi), p, rtol=1e-3, atol=1e-3)

    def test_nat_grad_rho1_equals_posterior(self):
        K, D = 3, 2
        prior = niw.make_prior(K, D)
        q = self._random_q(K, D)
        gamma = rng.uniform(size=(40, K)).astype(np.float32)
        y = rng.normal(size=(40, D)).astype(np.float32)
        stats = niw.suff_stats(jnp.array(gamma), jnp.array(y))
        via_sgd = niw.nat_grad_step(q, prior, stats, 1.0, 1.0)
        via_cd = niw.posterior(prior, stats)
        for a, b in zip(via_sgd, via_cd):
            np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-3, atol=1e-3)

    def test_natural_roundtrip(self):
        q = self._random_q()
        q2 = niw.from_natural(niw.to_natural(q))
        for a, b in zip(q, q2):
            np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-4, atol=1e-5)

    def test_kl_vs_oracle_and_properties(self):
        q = self._random_q()
        p = self._random_q()
        klqq = np.array(niw.kl(q, q))
        np.testing.assert_allclose(klqq, 0.0, atol=1e-3)
        klqp = np.array(niw.kl(q, p))
        assert np.all(klqp >= -1e-4)
        want = oracle.niw_kl(
            *(np.array(x, np.float64) for x in q), *(np.array(x, np.float64) for x in p)
        )
        np.testing.assert_allclose(klqp.sum(), want, rtol=1e-3)

    def test_kl_monte_carlo_1d(self):
        # D=1 NIW = Normal-Inverse-Gamma; MC-check the KL by sampling q.
        q = niw.NIW(
            mean=jnp.array([[1.0]]), kappa=jnp.array([2.0]),
            nu=jnp.array([5.0]), psi=jnp.array([[[3.0]]]),
        )
        p = niw.NIW(
            mean=jnp.array([[0.0]]), kappa=jnp.array([1.0]),
            nu=jnp.array([3.0]), psi=jnp.array([[[1.0]]]),
        )

        def logpdf(mean, kappa, nu, psi, mu, s2):
            # NIW density for D=1: sigma^2 ~ InvGamma(nu/2, psi/2), mu|s2 ~ N(mean, s2/kappa)
            a, b = nu / 2.0, psi / 2.0
            lp = a * np.log(b) - sps.gammaln(a) - (a + 1) * np.log(s2) - b / s2
            lp += -0.5 * np.log(2 * np.pi * s2 / kappa) - kappa * (mu - mean) ** 2 / (2 * s2)
            return lp

        n = 400_000
        s2 = 1.0 / rng.gamma(5.0 / 2.0, 2.0 / 3.0, size=n)
        mu = rng.normal(1.0, np.sqrt(s2 / 2.0))
        lq = logpdf(1.0, 2.0, 5.0, 3.0, mu, s2)
        lp = logpdf(0.0, 1.0, 3.0, 1.0, mu, s2)
        mc = (lq - lp).mean()
        got = float(niw.kl(q, p)[0])
        assert abs(got - mc) < 0.05, (got, mc)

    def test_sample_params_moments(self):
        q = niw.NIW(
            mean=jnp.array([[1.0, -2.0]]), kappa=jnp.array([50.0]),
            nu=jnp.array([60.0]), psi=jnp.array([np.eye(2, dtype=np.float32) * 30.0]),
        )
        mus, sigmas = niw.sample_params(jax.random.PRNGKey(0),
            jax.tree.map(lambda x: jnp.repeat(x, 4000, axis=0), q))
        mu_bar = np.array(mus).mean(0)
        sig_bar = np.array(sigmas).mean(0)
        np.testing.assert_allclose(mu_bar, [1.0, -2.0], atol=0.05)
        # E[Sigma] = Psi / (nu - D - 1) = 30/57 * I
        np.testing.assert_allclose(sig_bar, np.eye(2) * 30.0 / 57.0, atol=0.05)


class TestMultinomial:
    def test_expected_log_likelihood_gather(self):
        K, V, T = 3, 5, 20
        alpha = jnp.array(rng.uniform(0.5, 3.0, size=(K, V)), jnp.float32)
        y = jnp.array(rng.integers(0, V, size=(T,)))
        got = np.array(MultinomialDirichlet.expected_log_likelihood(alpha, y))
        elp = np.array(dirichlet.expected_log_probs(alpha))
        want = elp[:, np.array(y)].T
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # batched
        yb = jnp.array(rng.integers(0, V, size=(4, T)))
        gotb = np.array(MultinomialDirichlet.expected_log_likelihood(alpha, yb))
        assert gotb.shape == (4, T, K)
        np.testing.assert_allclose(gotb[2], elp[:, np.array(yb[2])].T, rtol=1e-6)

    def test_suff_stats_counts(self):
        K, V, T = 3, 5, 200
        y = rng.integers(0, V, size=(T,))
        gamma = np.eye(K, dtype=np.float32)[rng.integers(0, K, size=T)]
        stats = np.array(
            MultinomialDirichlet.make_suff_stats(V)(jnp.array(gamma), jnp.array(y))
        )
        want = np.zeros((K, V))
        for t in range(T):
            want[gamma[t].argmax(), y[t]] += 1
        np.testing.assert_allclose(stats, want, atol=1e-4)


class TestDiagGaussianNIG:
    """Diagonal-Gaussian / NIG family. Exactness anchor: at D=1 the NIG
    (a, b) prior on sigma2 IS the NIW with nu = 2a, psi = 2b, so every
    quantity must agree with the (separately-tested) NIW module exactly;
    D > 1 is a product of independent 1-D cases."""

    def _random_q(self, K=3, D=4):
        from pysvihmm_tpu.distributions import diag_gaussian as dg

        return dg.NIG(
            mean=jnp.array(rng.normal(size=(K, D)), jnp.float32),
            kappa=jnp.array(rng.uniform(0.5, 5.0, size=(K, D)), jnp.float32),
            a=jnp.array(rng.uniform(1.5, 6.0, size=(K, D)), jnp.float32),
            b=jnp.array(rng.uniform(0.5, 4.0, size=(K, D)), jnp.float32),
        )

    def _as_niw_1d(self, q, d):
        """Dimension d of a NIG pytree as the equivalent D=1 NIW."""
        return niw.NIW(
            mean=q.mean[:, d : d + 1],
            kappa=q.kappa[:, d],
            nu=2.0 * q.a[:, d],
            psi=2.0 * q.b[:, d, None, None],
        )

    def test_ell_equals_sum_of_1d_niw(self):
        from pysvihmm_tpu.distributions import diag_gaussian as dg

        q = self._random_q()
        y = jnp.array(rng.normal(size=(60, 4)), jnp.float32)
        got = np.array(dg.expected_log_likelihood(q, y))
        want = sum(
            np.array(niw.expected_log_likelihood(self._as_niw_1d(q, d), y[:, d : d + 1]))
            for d in range(4)
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_ell_feature_matrix_matches_ell(self):
        from pysvihmm_tpu.distributions import diag_gaussian as dg

        q = self._random_q()
        y = jnp.array(rng.normal(size=(60, 4)), jnp.float32)
        feats = dg.ell_features(y)
        assert feats.shape == (60, 1 + 2 * 4)
        got = np.array(feats @ dg.ell_feature_matrix(q))
        want = np.array(dg.expected_log_likelihood(q, y))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_posterior_matches_niw_1d(self):
        from pysvihmm_tpu.distributions import diag_gaussian as dg

        K, D, T = 3, 4, 50
        prior = dg.make_prior(K, D, kappa=1.3, a=2.2, b=0.9)
        gamma = jnp.array(rng.uniform(0.0, 1.0, size=(T, K)), jnp.float32)
        y = jnp.array(rng.normal(size=(T, D)), jnp.float32)
        stats = dg.suff_stats(gamma, y)
        post = dg.posterior(prior, stats)
        for d in range(D):
            want = niw.posterior(
                self._as_niw_1d(prior, d),
                niw.GaussianStats(
                    n=stats.n,
                    sum_y=stats.sum_y[:, d : d + 1],
                    sum_yyT=stats.sum_y2[:, d, None, None],
                ),
            )
            got = self._as_niw_1d(post, d)
            for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
                np.testing.assert_allclose(np.array(a), np.array(b), rtol=2e-5, atol=2e-5)

    def test_nat_grad_rho1_equals_posterior_and_roundtrip(self):
        from pysvihmm_tpu.distributions import diag_gaussian as dg

        q = self._random_q()
        prior = dg.make_prior(3, 4)
        gamma = jnp.array(rng.uniform(0.0, 1.0, size=(30, 3)), jnp.float32)
        y = jnp.array(rng.normal(size=(30, 4)), jnp.float32)
        stats = dg.suff_stats(gamma, y)
        stepped = dg.nat_grad_step(q, prior, stats, 1.0, 1.0)
        want = dg.posterior(prior, stats)
        for a, b in zip(jax.tree.leaves(stepped), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.array(a), np.array(b), rtol=2e-5, atol=2e-5)
        rt = dg.from_natural(dg.to_natural(q))
        for a, b in zip(jax.tree.leaves(rt), jax.tree.leaves(q)):
            np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-5, atol=1e-6)

    def test_kl_matches_niw_1d_and_properties(self):
        from pysvihmm_tpu.distributions import diag_gaussian as dg

        q, p = self._random_q(), self._random_q()
        got = np.array(dg.kl(q, p))
        want = sum(
            np.array(niw.kl(self._as_niw_1d(q, d), self._as_niw_1d(p, d)))
            for d in range(4)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.array(dg.kl(q, q)), 0.0, atol=2e-4)
        assert np.all(got >= -1e-4)

    def test_predictive_matches_niw_1d(self):
        from pysvihmm_tpu.distributions import diag_gaussian as dg

        q = self._random_q()
        y = jnp.array(rng.normal(size=(40, 4)), jnp.float32)
        got = np.array(dg.predictive_log_likelihood(q, y))
        want = sum(
            np.array(
                niw.predictive_log_likelihood(self._as_niw_1d(q, d), y[:, d : d + 1])
            )
            for d in range(4)
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_sample_params_moments(self):
        from pysvihmm_tpu.distributions import diag_gaussian as dg

        q = dg.NIG(
            mean=jnp.full((1, 2), 3.0),
            kappa=jnp.full((1, 2), 4.0),
            a=jnp.full((1, 2), 5.0),
            b=jnp.full((1, 2), 8.0),
        )
        keys = jax.random.split(jax.random.PRNGKey(0), 4000)
        mus, s2s = jax.vmap(lambda k: dg.sample_params(k, q))(keys)
        np.testing.assert_allclose(np.array(mus).mean(0), 3.0, atol=0.05)
        # E[sigma2] = b / (a - 1) = 2.0
        np.testing.assert_allclose(np.array(s2s).mean(0), 2.0, atol=0.1)

    def test_point_log_likelihood_scipy(self):
        from pysvihmm_tpu.distributions import diag_gaussian as dg

        mu = rng.normal(size=(3, 2))
        s2 = rng.uniform(0.5, 2.0, size=(3, 2))
        y = rng.normal(size=(20, 2))
        got = np.array(
            dg.diag_gaussian_log_likelihood(
                jnp.array(mu, jnp.float32), jnp.array(s2, jnp.float32),
                jnp.array(y, jnp.float32),
            )
        )
        want = np.stack(
            [
                scistats.norm.logpdf(y, mu[k], np.sqrt(s2[k])).sum(-1)
                for k in range(3)
            ],
            axis=-1,
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
