"""NumPy float64 oracle: a direct re-derivation of the reference algorithms.

Because `/root/reference` was an empty mount (SURVEY.md provenance warning),
this module IS the executable reference stand-in: batch mean-field VB for a
conjugate HMM written straight from Foti et al. 2014 / Beal 2003 in plain
NumPy, mirroring what ``pysvihmm/hmmbase.py`` + ``hmmbatchcd.py`` compute
(reconstructed, SURVEY.md §2.1-§2.2). It is deliberately simple, sequential
and float64 — used to golden-test every JAX kernel and as the "reference
performance" baseline in bench.py.
"""

from __future__ import annotations

import numpy as np
from scipy.special import digamma, gammaln


# ---------------------------------------------------------------- messages

def forward_backward(log_pi, log_A, log_lik):
    """Normalized-space FB. Returns (alpha, beta, gamma, xi_sum, log_z).

    xi_sum is sum_t xi_t (K, K); xi_t computed with explicit per-t
    normalization (the O(T K^2) triple loop the reference runs in Cython).
    """
    T, K = log_lik.shape
    A = np.exp(log_A)
    m = log_lik.max(axis=1)
    lik = np.exp(log_lik - m[:, None])

    alpha = np.zeros((T, K))
    logc = np.zeros(T)
    a = np.exp(log_pi) * lik[0]
    logc[0] = np.log(a.sum())
    alpha[0] = a / a.sum()
    for t in range(1, T):
        a = (alpha[t - 1] @ A) * lik[t]
        logc[t] = np.log(a.sum())
        alpha[t] = a / a.sum()

    beta = np.zeros((T, K))
    beta[T - 1] = 1.0
    for t in range(T - 2, -1, -1):
        b = A @ (lik[t + 1] * beta[t + 1])
        beta[t] = b / b.sum()

    g = alpha * beta
    gamma = g / g.sum(axis=1, keepdims=True)

    xi_sum = np.zeros((K, K))
    for t in range(T - 1):
        x = alpha[t][:, None] * A * (lik[t + 1] * beta[t + 1])[None, :]
        xi_sum += x / x.sum()

    log_z = logc.sum() + m.sum()
    return alpha, beta, gamma, xi_sum, log_z


def log_z_brute_force(log_pi, log_A, log_lik):
    """Exact log p~(y) by summing over *all* K^T paths (tiny T only)."""
    from itertools import product

    T, K = log_lik.shape
    total = -np.inf
    for path in product(range(K), repeat=T):
        lp = log_pi[path[0]] + log_lik[0, path[0]]
        for t in range(1, T):
            lp += log_A[path[t - 1], path[t]] + log_lik[t, path[t]]
        total = np.logaddexp(total, lp)
    return total


try:  # C fast path (built via `python setup.py build_ext --inplace`)
    from . import _fb_ext as _C
except ImportError:  # pure-NumPy fallback, like the reference's
    _C = None

HAVE_C_EXT = _C is not None


def forward_backward_fast(log_pi, log_A, log_lik):
    """C-accelerated forward-backward (the reference's Cython-ext analog).

    Identical contract to :func:`forward_backward`; falls back to the NumPy
    loop when the extension isn't built. Equality is tested in
    tests/test_native_ext.py.
    """
    if _C is None:
        return forward_backward(log_pi, log_A, log_lik)
    T, K = log_lik.shape
    log_pi = np.ascontiguousarray(log_pi, np.float64)
    log_A = np.ascontiguousarray(log_A, np.float64)
    log_lik = np.ascontiguousarray(log_lik, np.float64)
    alpha = np.empty((T, K))
    beta = np.empty((T, K))
    gamma = np.empty((T, K))
    xi_sum = np.empty((K, K))
    log_z = _C.fb_c(log_pi, log_A, log_lik, alpha, beta, gamma, xi_sum)
    return alpha, beta, gamma, xi_sum, log_z


# ---------------------------------------------------------------- dirichlet

def dir_elogp(alpha):
    return digamma(alpha) - digamma(alpha.sum(axis=-1, keepdims=True))


def dir_kl(q, p):
    q0, p0 = q.sum(-1), p.sum(-1)
    return (
        gammaln(q0)
        - gammaln(q).sum(-1)
        - gammaln(p0)
        + gammaln(p).sum(-1)
        + ((q - p) * (digamma(q) - digamma(q0)[..., None])).sum(-1)
    )


# ---------------------------------------------------------------- NIW

def niw_expected_log_likelihood(mean, kappa, nu, psi, y):
    """E_q[log N(y | mu_k, Sigma_k)] -> (T, K)."""
    K, D = mean.shape
    out = np.zeros((y.shape[0], K))
    for k in range(K):
        psi_inv = np.linalg.inv(psi[k])
        elogdet = (
            sum(digamma((nu[k] + 1 - i) / 2.0) for i in range(1, D + 1))
            + D * np.log(2.0)
            - np.linalg.slogdet(psi[k])[1]
        )
        diff = y - mean[k]
        quad = nu[k] * np.einsum("td,de,te->t", diff, psi_inv, diff)
        out[:, k] = 0.5 * (elogdet - D * np.log(2 * np.pi) - D / kappa[k] - quad)
    return out


def niw_posterior(m0, k0, n0, p0, n, sum_y, sum_yyT):
    kap = k0 + n
    nu = n0 + n
    mean = (k0[:, None] * m0 + sum_y) / kap[:, None]
    psi = (
        p0
        + sum_yyT
        + k0[:, None, None] * np.einsum("kd,ke->kde", m0, m0)
        - kap[:, None, None] * np.einsum("kd,ke->kde", mean, mean)
    )
    return mean, kap, nu, psi


def niw_kl(mq, kq, nq, pq, mp, kp, np_, pp):
    """KL(NIW_q || NIW_p), summed over states."""
    K, D = mq.shape

    def mvgammaln(a):
        return D * (D - 1) / 4.0 * np.log(np.pi) + sum(
            gammaln(a + (1 - i) / 2.0) for i in range(1, D + 1)
        )

    total = 0.0
    for k in range(K):
        psi_q_inv = np.linalg.inv(pq[k])
        elogdet = (
            sum(digamma((nq[k] + 1 - i) / 2.0) for i in range(1, D + 1))
            + D * np.log(2.0)
            - np.linalg.slogdet(pq[k])[1]
        )
        tr = np.trace(psi_q_inv @ pp[k])
        ldq = np.linalg.slogdet(pq[k])[1]
        ldp = np.linalg.slogdet(pp[k])[1]
        klw = (
            0.5 * (nq[k] - np_[k]) * elogdet
            - 0.5 * nq[k] * D
            + 0.5 * nq[k] * tr
            - 0.5 * (nq[k] - np_[k]) * D * np.log(2.0)
            + 0.5 * nq[k] * ldq
            - 0.5 * np_[k] * ldp
            + mvgammaln(np_[k] / 2.0)
            - mvgammaln(nq[k] / 2.0)
        )
        dm = mq[k] - mp[k]
        quad = nq[k] * dm @ psi_q_inv @ dm
        ratio = kp[k] / kq[k]
        kln = 0.5 * (kp[k] * quad + D * (ratio - 1.0 - np.log(ratio)))
        total += klw + kln
    return total


# ---------------------------------------------------------------- batch VB

class BatchVBOracle:
    """Reference-equivalent batch coordinate-ascent VB for Gaussian HMMs.

    Mirrors ``pysvihmm/hmmbatchcd.py::VBHMM.infer`` (reconstructed): full
    local update -> conjugate global update -> ELBO, iterated.
    """

    def __init__(self, obs, K, prior_init, prior_tran, prior_mean, prior_kappa,
                 prior_nu, prior_psi, seed=0):
        self.obs = [np.asarray(o, np.float64) for o in obs]
        self.K = K
        self.prior_init = prior_init
        self.prior_tran = prior_tran
        self.prior_niw = (prior_mean, prior_kappa, prior_nu, prior_psi)
        rng = np.random.default_rng(seed)
        self.var_init = prior_init + rng.uniform(0.5, 1.5, size=prior_init.shape)
        self.var_tran = prior_tran + rng.uniform(0.5, 1.5, size=prior_tran.shape)
        D = prior_mean.shape[1]
        idx = rng.integers(0, len(self.obs[0]), size=K)
        self.var_niw = (
            prior_mean + self.obs[0][idx],
            prior_kappa.copy(),
            prior_nu.copy(),
            prior_psi.copy(),
        )
        self.elbo_history = []

    def local_step(self):
        log_pi = dir_elogp(self.var_init)
        log_A = dir_elogp(self.var_tran)
        mean, kap, nu, psi = self.var_niw
        results = []
        log_z_total = 0.0
        for y in self.obs:
            ll = niw_expected_log_likelihood(mean, kap, nu, psi, y)
            _, _, gamma, xi_sum, log_z = forward_backward(log_pi, log_A, ll)
            results.append((gamma, xi_sum))
            log_z_total += log_z
        return results, log_z_total

    def global_step(self, results):
        init_stats = sum(g[0] for g, _ in results)
        trans_stats = sum(x for _, x in results)
        self.var_init = self.prior_init + init_stats
        self.var_tran = self.prior_tran + trans_stats
        n = sum(g.sum(0) for g, _ in results)
        sum_y = sum(g.T @ y for (g, _), y in zip(results, self.obs))
        sum_yyT = sum(
            np.einsum("tk,td,te->kde", g, y, y) for (g, _), y in zip(results, self.obs)
        )
        m0, k0, n0, p0 = self.prior_niw
        self.var_niw = niw_posterior(m0, k0, n0, p0, n, sum_y, sum_yyT)

    def elbo(self, log_z_total):
        m0, k0, n0, p0 = self.prior_niw
        mq, kq, nq, pq = self.var_niw
        return (
            log_z_total
            - dir_kl(self.var_init, self.prior_init)
            - dir_kl(self.var_tran, self.prior_tran).sum()
            - niw_kl(mq, kq, nq, pq, m0, k0, n0, p0)
        )

    def infer(self, maxit=50, tol=1e-8):
        prev = -np.inf
        for _ in range(maxit):
            results, log_z = self.local_step()
            self.elbo_history.append(self.elbo(log_z))
            self.global_step(results)
            if abs(self.elbo_history[-1] - prev) < tol * abs(prev):
                break
            prev = self.elbo_history[-1]
        return self

    def decode(self):
        results, _ = self.local_step()
        return [g.argmax(axis=1) for g, _ in results]
