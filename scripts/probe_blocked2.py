"""Breakdown probe for the blocked FB at T=100k: which piece costs 9.5s?

Relay-safe timing: every timed function is jitted and returns SCALARS only
(block_until_ready does not wait on the axon relay backend — completion is
forced by a scalar device-to-host transfer, as in bench.py).

Usage: python scripts/probe_blocked2.py [T]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timed(f, *args, n=3, label=""):
    import jax

    def sync(o):
        return [np.asarray(jax.device_get(x)) for x in jax.tree.leaves(o)]

    sync(f(*args))  # compile + warm
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s", flush=True)


def main():
    import os

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset
    from pysvihmm_tpu.distributions import GaussianNIW
    from pysvihmm_tpu.messages import blocked, scan_fb
    from pysvihmm_tpu.messages.assoc_fb import _combine
    from pysvihmm_tpu.models.hmm import expected_log_params, init_params, make_prior

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    K, D = 64, 8
    obs, z, _ = gen_gaussian_dataset(
        jax.random.PRNGKey(8), K, D, 1, T, mean_scale=8.0, cov_scale=0.3
    )
    chain = obs[0]
    prior = make_prior(K, GaussianNIW, obs_dim=D)
    p0 = init_params(jax.random.PRNGKey(9), prior, GaussianNIW, chain)
    log_pi, log_A = expected_log_params(p0)
    ll = GaussianNIW.expected_log_likelihood(p0.emit, chain)  # (T, K)
    print("setup done", flush=True)

    @jax.jit
    def fb_full_s(log_pi, log_A, ll):
        r = blocked.forward_backward_blocked(log_pi, log_A, ll, block_size=256)
        return r.log_z, r.trans_stats.sum(), r.gamma.sum(), r.init_stats.sum()

    timed(fb_full_s, log_pi, log_A, ll, label="blocked FB full")

    S = 256
    n_trans = T - 1
    pad = (S - n_trans % S) % S
    n_blocks = (n_trans + pad) // S

    def build_M(log_A, ll):
        A_tilde = jnp.exp(log_A)
        lik, shifts = scan_fb._normalize_loglik(ll)
        eye = jnp.eye(K, dtype=ll.dtype)
        lik_tr = jnp.concatenate([lik[1:], jnp.ones((pad, K), ll.dtype)], axis=0)
        valid = jnp.concatenate(
            [jnp.ones((n_trans,), bool), jnp.zeros((pad,), bool)], axis=0
        )
        M_all = jnp.where(
            valid[:, None, None],
            A_tilde[None, :, :] * lik_tr[:, None, :],
            eye[None, :, :],
        ).reshape(n_blocks, S, K, K)
        return M_all, lik

    timed(
        jax.jit(lambda a, l: jax.tree.map(jnp.sum, build_M(a, l))),
        log_A, ll, label="M_all build",
    )

    def fwd_only(log_A, ll, log_pi):
        M_all, lik = build_M(log_A, ll)
        a0 = jnp.exp(log_pi) * lik[0]
        alpha0 = a0 / jnp.sum(a0)

        def fwd_block(a, M_blk):
            m0 = jnp.max(M_blk, axis=(-2, -1), keepdims=True)
            M_n = M_blk / m0
            s0 = jnp.log(m0[..., 0, 0])
            P, sP = lax.associative_scan(_combine, (M_n, s0))
            au = jnp.einsum("k,tkj->tj", a, P)
            sums = jnp.sum(au, axis=-1)
            alphas = au / sums[:, None]
            cums = jnp.log(sums) + sP
            log_c = jnp.diff(jnp.concatenate([jnp.zeros((1,), ll.dtype), cums]))
            return alphas[-1], (alphas, log_c)

        _, (alphas_blk, logc_blk) = lax.scan(fwd_block, alpha0, M_all)
        return alphas_blk.sum(), logc_blk.sum()

    timed(jax.jit(fwd_only), log_A, ll, log_pi, label="M_all + fwd scan")

    def assoc_flat(log_A, ll):
        M_all, _ = build_M(log_A, ll)
        M = M_all.reshape(-1, K, K)
        m0 = jnp.max(M, axis=(-2, -1), keepdims=True)
        s0 = jnp.log(m0[..., 0, 0])
        P, sP = lax.associative_scan(_combine, (M / m0, s0))
        return P[-1].sum(), sP[-1]

    timed(jax.jit(assoc_flat), log_A, ll, label="M_all + flat assoc scan all T")

    @jax.jit
    def fb_seq_s(log_pi, log_A, ll):
        r = scan_fb.forward_backward(log_pi, log_A, ll)
        return r.log_z, r.trans_stats.sum(), r.gamma.sum()

    timed(fb_seq_s, log_pi, log_A, ll, label="sequential scan FB")


if __name__ == "__main__":
    main()
