"""State-parallel inference for very large K: the engine layer over
``messages.state_sharded`` (tensor-parallelism analog, SURVEY.md §2.4).

Everything state-indexed shards by K-blocks over a ``state`` mesh axis:
the Dirichlet rows of init/trans posteriors, the per-state NIW/Dirichlet
emission parameters, the (T, K) likelihoods/marginals, and the expected
sufficient statistics. Outside the message kernel every update is
per-state independent (conjugate row updates, digamma expectations,
emission stat contractions over time), so GSPMD propagates the sharding
with zero hand-written communication — the ONLY collectives in a step
are the message kernel's per-step reduce-scatters and the ELBO psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..distributions import dirichlet
from ..engines.base import elbo_from_stats
from ..messages.state_sharded import state_sharded_forward_backward
from ..models.hmm import HMMParams, emission_flat_stats, expected_log_params
from ..utils.precision import f32_matmuls


def shard_params_by_state(params: HMMParams, mesh: Mesh, axis: str = "state") -> HMMParams:
    """Place every K-leading parameter leaf with its state axis sharded."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def make_ss_vb_step(emission, mesh: Mesh, axis: str = "state"):
    """Jitted coordinate-ascent VB step on ONE chain with K sharded.

    obs: (T, D) float or (T,) int, replicated (observations are small next
    to the K-sized state; shard them over a second data/time axis if not).
    """

    @jax.jit
    @f32_matmuls
    def step(params: HMMParams, prior: HMMParams, obs: jax.Array):
        log_pi, log_A = expected_log_params(params)  # K-sharded via GSPMD
        ll = emission.expected_log_likelihood(params.emit, obs)  # (T, K)
        fb = state_sharded_forward_backward(log_pi, log_A, ll, mesh, axis)
        emit_stats = emission_flat_stats(emission, params.emit, fb.gamma, obs)
        elbo = elbo_from_stats(params, prior, emission, fb.log_z)
        new_params = HMMParams(
            init=dirichlet.posterior(prior.init, fb.init_stats),
            trans=dirichlet.posterior(prior.trans, fb.trans_stats),
            emit=emission.posterior(prior.emit, emit_stats),
        )
        return new_params, elbo

    return step


def fit_large_k(
    params: HMMParams,
    prior: HMMParams,
    obs: jax.Array,  # one (T, ...) chain
    emission,
    mesh: Mesh,
    num_iters: int = 100,
    axis: str = "state",
) -> tuple[HMMParams, jax.Array]:
    """Batch VB on one chain with the state axis sharded, one compiled scan."""
    from .time_parallel import run_vb_scan

    params = shard_params_by_state(params, mesh, axis)
    prior = shard_params_by_state(prior, mesh, axis)
    step = make_ss_vb_step(emission, mesh, axis)
    return run_vb_scan(step, params, prior, obs, num_iters)
