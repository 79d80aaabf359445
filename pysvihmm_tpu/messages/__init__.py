"""Message-passing kernels: the E-step layer (reference L1, SURVEY.md §1).

Three interchangeable implementations of the same FBResult contract:
  * ``scan``   — `lax.scan`, O(T K^2), sequential in T, vmap over sequences
                 turns each step into a (B, K) @ (K, K) MXU matmul. The
                 production path for batched sequences.
  * ``assoc``  — `lax.associative_scan` prefix/suffix matrix products,
                 O(T K^3) flops, O(log T) depth. The production path for a
                 single long chain on one chip.
  * ``grad``   — sufficient stats as gradients of the log-normalizer
                 (d logZ / d log_A = sum_t xi_t, d/d log_lik = gamma,
                 d/d log_pi = gamma_0). One code path, consistency oracle.

Exact cross-agreement among all three is tested in tests/test_messages.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scan_fb import (
    FBResult,
    backward,
    ffbs_sample,
    forward,
    forward_backward,
    forward_filter_log,
    log_normalizer,
    viterbi,
)
from .assoc_fb import forward_backward_assoc, log_normalizer_assoc
from .blocked import forward_backward_blocked, forward_backward_blocked_stream
from .state_sharded import state_sharded_forward_backward
from .time_sharded import (
    time_sharded_forward_backward,
    time_sharded_forward_backward_batched,
)


def e_step_grad(
    log_pi: jax.Array,
    log_A: jax.Array,
    log_lik: jax.Array,
    method: str = "scan",
) -> FBResult:
    """E-step via autodiff of the log-normalizer (generating-function identity)."""
    fn = log_normalizer if method == "scan" else log_normalizer_assoc
    log_z, (init_stats, trans_stats, gamma) = jax.value_and_grad(
        fn, argnums=(0, 1, 2)
    )(log_pi, log_A, log_lik)
    return FBResult(
        gamma=gamma,
        log_z=log_z,
        trans_stats=trans_stats,
        init_stats=init_stats,
        log_c=None,
    )


def _pallas_time_tileable(T: int) -> bool:
    """True when the fused kernels' tiler (pallas_fb._choose_tiles) can pick
    a bounded (<= 32-step) MOSAIC-LEGAL time tile for this chain length:
    either the whole axis is short (C = T, always tiling-legal), or T has a
    multiple-of-8 divisor in [8, 32] (Mosaic requires the time tile to be a
    multiple of 8 unless it spans the whole axis). Anything else (T = 70,
    100, any prime) would force the kernels to statically unroll the entire
    time axis (compile blow-up), so "auto" avoids pallas for such shapes."""
    return T <= 32 or any(T % c == 0 for c in (8, 16, 24, 32))


def resolve_method(method: str, time_len: int | None = None) -> str:
    """Resolve the user-facing ``method="auto"`` to a concrete E-step path.

    On a TPU backend the fully-fused Pallas kernels ("pallas_fused":
    likelihood matmul + FB + emission stats in-kernel) are the production
    path (~2.1x the scan path at the benchmark shape — BASELINE.md);
    everywhere else they would run under the slow Pallas interpreter, so
    "auto" picks the `lax.scan` path. When ``time_len`` is given, "auto" also falls back
    to scan for chain lengths the kernel tiler cannot tile (see
    :func:`_pallas_time_tileable`) — engines that can pad their windows to a
    multiple of 8 do so *before* this check (svi/metaobs ``make_step``).
    Resolution happens at trace time (backend choice is static under jit);
    an explicit method string always passes through untouched. The
    PYSVIHMM_ESTEP_METHOD environment variable overrides what "auto"
    resolves to on TPU (e.g. =pallas_fused to flip the production path
    without code edits; the tileability fallback still applies).
    """
    if method == "auto":
        import os

        from .pallas_fb import on_tpu

        if not on_tpu():
            return "scan"
        if time_len is not None and not _pallas_time_tileable(time_len):
            return "scan"
        return os.environ.get("PYSVIHMM_ESTEP_METHOD", "pallas_fused")
    return method


def plan_window(method: str, keep_len: int, buffer: int, chain_len: int):
    """Resolve the E-step method + window geometry for a windowed engine.

    Single source of truth for svi/metaobs/data-parallel ``make_step``: when
    the resolved path is one of the Pallas kernels ("pallas" or
    "pallas_fused"), round the window W = keep_len + 2*buffer up to a
    multiple of 8 so the kernels' tiler gets a clean time tile (otherwise it
    would statically unroll the window); the extra steps are pure additional
    buffer, which only improves the kept-region boundary messages. The method
    is then re-resolved against the final W — "auto" falls back to scan when
    no bounded time tile exists (e.g. prime W == T, un-paddable).

    Returns (resolved_method, W, b_left) where b_left is the buffer length
    on the left side of the kept region after padding.
    """
    W = keep_len + 2 * buffer
    b_left = buffer
    if resolve_method(method) in ("pallas", "pallas_fused") and W < chain_len:
        pad = min(-W % 8, chain_len - W)
        b_left += pad // 2
        W += pad
    return resolve_method(method, time_len=W), W, b_left


def e_step_batched(
    log_pi: jax.Array,
    log_A: jax.Array,
    log_lik: jax.Array,  # (B, T, K)
    weights: jax.Array | None = None,  # (B, T) kept-mask
    method: str = "auto",
) -> FBResult:
    """Batched E-step over (B, T, K) likelihoods — the engines' entry point.

    Contract: gamma (B, T, K), log_z (B,), log_c (B, T), init_stats (B, K)
    per sequence; trans_stats ALWAYS summed over the batch, shape (K, K)
    (what every global update consumes). method="pallas" runs the fused
    TPU kernels (interpreted off-TPU); "auto" (default) resolves to the
    kernels on TPU and scan elsewhere ("pallas_fused" downgrades to
    "pallas" here — likelihoods are already materialized at this entry
    point); other methods vmap :func:`e_step`.
    """
    method = resolve_method(method, time_len=log_lik.shape[1])
    if method == "pallas_fused":
        # the fully-fused kernels need emission params to build likelihoods
        # in-kernel; here likelihoods are already materialized, so the
        # split pallas path is the fast equivalent (engines/base.py fuses).
        method = "pallas"
    if method == "pallas":
        from .pallas_fb import on_tpu, pallas_forward_backward_batched

        return pallas_forward_backward_batched(
            log_pi,
            log_A,
            log_lik,
            weights=weights,
            interpret=not on_tpu(),
        )
    if weights is None:
        fb = jax.vmap(lambda l: e_step(log_pi, log_A, l, method=method))(log_lik)
    else:
        fb = jax.vmap(
            lambda l, w: e_step(log_pi, log_A, l, weights=w, method=method)
        )(log_lik, weights)
    return fb._replace(trans_stats=jnp.sum(fb.trans_stats, axis=0))


def e_step(
    log_pi: jax.Array,
    log_A: jax.Array,
    log_lik: jax.Array,
    weights: jax.Array | None = None,
    method: str = "scan",
) -> FBResult:
    """Unified E-step over one sequence (vmap over leading batch as needed)."""
    if method == "scan":
        return forward_backward(log_pi, log_A, log_lik, weights)
    if method == "assoc":
        return forward_backward_assoc(log_pi, log_A, log_lik, weights)
    if method == "blocked":
        return forward_backward_blocked(log_pi, log_A, log_lik, weights)
    if method == "grad":
        if weights is not None:
            raise ValueError("grad e-step does not support buffer weights")
        return e_step_grad(log_pi, log_A, log_lik)
    raise ValueError(f"unknown e_step method: {method}")


__all__ = [
    "FBResult",
    "forward",
    "backward",
    "forward_backward",
    "forward_backward_assoc",
    "forward_backward_blocked",
    "forward_backward_blocked_stream",
    "state_sharded_forward_backward",
    "time_sharded_forward_backward",
    "time_sharded_forward_backward_batched",
    "forward_filter_log",
    "log_normalizer",
    "log_normalizer_assoc",
    "viterbi",
    "ffbs_sample",
    "e_step",
    "e_step_batched",
    "e_step_grad",
    "plan_window",
    "resolve_method",
]
