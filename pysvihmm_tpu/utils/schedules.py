"""SVI step-size schedules (Hoffman et al. 2013; reference ``tau``/``kappa``
constructor kwargs on the SGD/SVI engines — SURVEY.md §2.2).

Includes the Robbins-Monro power schedule and an *adaptive* ("elastic")
variant (Ranganath et al. 2013-style) whose state lives device-side so it
checkpoints and restores with the rest of training state (BASELINE config 5:
"elastic step-size adaptation").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def power_schedule(step: jax.Array, tau: float = 1.0, kappa: float = 0.7) -> jax.Array:
    """rho_t = (t + tau)^(-kappa), kappa in (0.5, 1] for RM convergence."""
    return (step + tau) ** (-kappa)


class AdaptiveState(NamedTuple):
    """Running moments of the natural-gradient for the adaptive step size.

    Maintains g_bar (EW-mean of the flattened stat vector), h_bar (EW-mean of
    its squared norm) and the memory size tau_adapt; the optimal scalar step
    is rho* = |g_bar|^2 / h_bar (Ranganath et al., "An adaptive learning rate
    for stochastic variational inference").
    """

    g_bar: jax.Array  # (P,) flattened
    h_bar: jax.Array  # ()
    tau_adapt: jax.Array  # ()


def adaptive_init(param_dim: int, dtype=jnp.float32) -> AdaptiveState:
    return AdaptiveState(
        g_bar=jnp.zeros((param_dim,), dtype),
        h_bar=jnp.asarray(1.0, dtype),
        tau_adapt=jnp.asarray(10.0, dtype),
    )


def adaptive_update(
    state: AdaptiveState, grad_flat: jax.Array
) -> tuple[AdaptiveState, jax.Array]:
    """One elastic adaptation step: returns (new_state, rho)."""
    t = state.tau_adapt
    g_bar = (1.0 - 1.0 / t) * state.g_bar + (1.0 / t) * grad_flat
    h_bar = (1.0 - 1.0 / t) * state.h_bar + (1.0 / t) * jnp.sum(grad_flat**2)
    rho = jnp.sum(g_bar**2) / jnp.maximum(h_bar, 1e-30)
    rho = jnp.clip(rho, 1e-6, 1.0)
    tau_new = t * (1.0 - rho) + 1.0
    return AdaptiveState(g_bar=g_bar, h_bar=h_bar, tau_adapt=tau_new), rho
