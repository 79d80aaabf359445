"""Shared engine machinery: batched local E-steps, ELBO, decoding.

Replaces the helpers on ``VariationalHMMBase`` (``pysvihmm/hmmbase.py``,
reconstructed — SURVEY.md §2.2/§3): ``local_update``, ``lower_bound``,
state decoding. Everything is a pure function of (params, prior, obs);
engines differ only in *which data* they feed the local step and *how* they
turn stats into the next global state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import messages
from ..models.hmm import (
    HMMParams,
    emission_flat_stats,
    expected_log_params,
    global_kl,
)


class LocalStats(NamedTuple):
    """Summed expected sufficient statistics from a batch local step."""

    init: jax.Array  # (K,)
    trans: jax.Array  # (K, K)
    emit: object  # emission-family stats pytree, leading K
    log_z: jax.Array  # () summed variational log-normalizer


def batch_local_step(
    params: HMMParams,
    emission,
    obs: jax.Array,
    method: str = "scan",
    weights: jax.Array | None = None,
) -> tuple[LocalStats, jax.Array]:
    """Full local update over a batch of sequences.

    obs: (B, T, D) float or (B, T) int. weights: optional (B, T) kept-mask.
    Returns (summed stats, gamma (B, T, K)). The e-step is vmapped over B so
    each scan step is a (B, K) @ (K, K) matmul on the MXU.
    """
    log_pi, log_A = expected_log_params(params)

    if method == "pallas":
        from ..messages.pallas_fb import on_tpu, pallas_forward_backward_batched

        # compute the likelihoods TIME-MAJOR (free for the einsum producer)
        # so no 4*T*B*K-byte transpose feeds the kernel; only the (B, T, D)
        # observation transpose (D << K) is materialized.
        ll_tm = emission.expected_log_likelihood(
            params.emit, jnp.swapaxes(obs, 0, 1)
        )  # (T, B, K)
        fb = pallas_forward_backward_batched(
            log_pi,
            log_A,
            ll_tm,
            weights=jnp.swapaxes(weights, 0, 1) if weights is not None else None,
            time_major=True,
            # Mosaic requires a TPU; everywhere else run the same kernels
            # under the pallas interpreter (tests, CPU fallback)
            interpret=not on_tpu(),
        )
        gamma_w = fb.gamma if weights is None else fb.gamma * weights[..., None]
    else:
        ll = emission.expected_log_likelihood(params.emit, obs)  # (B, T, K)
        fb = messages.e_step_batched(log_pi, log_A, ll, weights=weights, method=method)
        gamma_w = fb.gamma if weights is None else fb.gamma * weights[..., None]

    emit_stats = emission_flat_stats(emission, params.emit, gamma_w, obs)
    # every batched path returns trans_stats already summed over sequences
    stats = LocalStats(
        init=jnp.sum(fb.init_stats, axis=0),
        trans=fb.trans_stats,
        emit=emit_stats,
        log_z=jnp.sum(fb.log_z),
    )
    return stats, fb.gamma


def elbo_from_stats(
    params: HMMParams, prior: HMMParams, emission, log_z: jax.Array
) -> jax.Array:
    """ELBO = sum_seqs log Z~ - KL(q(theta) || p(theta)) (SURVEY.md §2.1)."""
    return log_z - global_kl(params, prior, emission)


def lower_bound(
    params: HMMParams, prior: HMMParams, emission, obs: jax.Array, method: str = "scan"
) -> jax.Array:
    """Exact full-data ELBO at the current global state (fresh local step)."""
    stats, _ = batch_local_step(params, emission, obs, method)
    return elbo_from_stats(params, prior, emission, stats.log_z)


def decode(params: HMMParams, emission, obs: jax.Array) -> jax.Array:
    """Posterior-marginal state decode: argmax_k gamma_tk per sequence (B, T)."""
    _, gamma = batch_local_step(params, emission, obs)
    return jnp.argmax(gamma, axis=-1)


def viterbi_decode(params: HMMParams, emission, obs: jax.Array) -> jax.Array:
    """MAP path under the variational-mean parameters (B, T)."""
    log_pi, log_A = expected_log_params(params)
    ll = emission.expected_log_likelihood(params.emit, obs)
    return jax.vmap(lambda l: messages.viterbi(log_pi, log_A, l))(ll)


def predictive_log_likelihood(
    params: HMMParams, emission, obs: jax.Array, exact: bool = False
) -> jax.Array:
    """Held-out predictive log-likelihood via the forward filter.

    exact=False (default): posterior-mean plug-in parameters (pi_bar, A_bar,
    phi_bar) — the reference's behavior [``pred_logprob`` helpers, MED —
    SURVEY.md §2.2]. exact=True: emissions scored with the exact
    posterior-predictive density (Student-t / Dirichlet-multinomial),
    integrating out phi per observation.
    """
    from ..distributions import dirichlet

    log_pi = jnp.log(dirichlet.mean(params.init))
    log_A = jnp.log(dirichlet.mean(params.trans))
    if exact:
        ll = emission.predictive_log_likelihood(params.emit, obs)
    else:
        theta = emission.mean_params(params.emit)
        ll = emission.point_log_likelihood(theta, obs)
    _, log_z = jax.vmap(lambda l: messages.forward(log_pi, log_A, l))(ll)
    return jnp.sum(log_z)
