"""Exact forward-backward with the STATE axis sharded over a device mesh —
the tensor-parallelism analog for very large K (SURVEY.md §2.4 "keep the
door open by sharding the state axis").

At K beyond what one chip holds comfortably (A~ is K x K; alpha/beta/gamma
are T x K), shard the state axis: device d owns a K/D block of every
state-indexed array, plus the matching ROW block A~[block_d, :] of the
transition matrix (column access A~[:, block_d] reuses the same block of
A~^T, passed explicitly to keep every per-step operand local).

Per forward step   a_t ∝ (a_{t-1} @ A~) ⊙ lik_t:
    partial_d = a_d @ A_d   (local (B?, K/D) x (K/D, K) matmul)
    a_t = psum_scatter(partial) ⊙ lik_d  — ONE reduce-scatter per step.
Per backward step  b_t ∝ A~ @ (lik_{t+1} ⊙ b_{t+1}):
    m_d = lik_d ⊙ b_d;  b_t,d = psum_scatter(m @ A~^T row-block algebra)
    — symmetric, one reduce-scatter per step.
Normalizers are psum'd scalars folded into the same rhythm. The summed
pairwise stats come from the usual factorized matmul AFTER the sweeps
(one all_gather of the (T, K/D) d-side, then a local (K/D, T) @ (T, K)
producing this device's ROW block of trans_stats).

This is a capability/correctness tier, not a speed tier at small K: with
K <= a few thousand the per-step reduce-scatter latency dominates and the
single-device kernels win. It exists so the framework's parallelism story
covers the state axis exactly, tested device-count-invariant on the
virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .scan_fb import FBResult


def state_sharded_forward_backward(
    log_pi: jax.Array,
    log_A: jax.Array,
    log_lik: jax.Array,  # (T, K)
    mesh: Mesh,
    axis: str = "state",
    weights: jax.Array | None = None,
) -> FBResult:
    """Exact FBResult for one (T, K) chain with K sharded over ``mesh[axis]``.

    gamma comes back state-sharded (T, K); trans_stats is a row-sharded
    (K, K) global array (NOT replicated — for very large K that is the
    point); init_stats state-sharded (K,); log_z/log_c replicated. The
    state-axis size must divide K.
    """
    T, K = log_lik.shape
    D = mesh.shape[axis]
    if K % D != 0:
        raise ValueError(f"K={K} must be divisible by state-axis size {D}")
    if D == 1:
        # Degenerate mesh: identical semantics without the collectives.
        # (Also works around a jax 0.9.0 XLA:CPU mis-execution — memory
        # corruption observed — of reverse-scan + psum_scatter inside a
        # 1-device shard_map under jit; D >= 2 is exact.)
        from .scan_fb import forward_backward

        return forward_backward(log_pi, log_A, log_lik, weights)

    w_arg = weights if weights is not None else jnp.ones((T,), log_lik.dtype)

    @partial(
        shard_map,
        mesh=mesh,
        # A~ row blocks (K/D, K); A~^T row blocks = A~ column blocks, so the
        # backward's per-step operand is also local.
        in_specs=(P(axis), P(axis, None), P(axis, None), P(None, axis), P()),
        out_specs=(P(None, axis), P(), P(axis, None), P(axis), P()),
        check_vma=False,
    )
    def fb(log_pi_d, A_rows, At_rows, ll_d, w):
        # ll_d: (T, Kd) this device's state block of the likelihoods
        Kd = ll_d.shape[1]
        lik_d, shifts = _normalize_loglik_global(ll_d, axis)

        pi_d = jnp.exp(log_pi_d)  # (Kd,)
        A_d = jnp.exp(A_rows)  # (Kd, K) rows owned by this device
        At_d = jnp.exp(At_rows)  # (Kd, K) rows of A~^T  (= A~ columns)

        # ---- forward: one reduce-scatter per step ----
        a0_raw = pi_d * lik_d[0]
        c0 = lax.psum(jnp.sum(a0_raw), axis)
        a0 = a0_raw / c0

        def fstep(a_prev, lik_t):
            partial_full = a_prev @ A_d  # (K,) partial rows contribution
            a_blk = lax.psum_scatter(
                partial_full, axis, scatter_dimension=0, tiled=True
            )  # (Kd,) summed + this device's block
            a_raw = a_blk * lik_t
            c = lax.psum(jnp.sum(a_raw), axis)
            return a_raw / c, (a_raw / c, jnp.log(c))

        _, (alphas, logcs) = lax.scan(fstep, a0, lik_d[1:])
        alpha_d = jnp.concatenate([a0[None], alphas], axis=0)  # (T, Kd)
        log_c = jnp.concatenate([jnp.log(c0)[None], logcs], axis=0) + shifts

        # ---- backward: symmetric reduce-scatter per step ----
        bT = jnp.full((Kd,), 1.0, lik_d.dtype)

        def bstep(b_next, lik_t1):
            m = lik_t1 * b_next  # (Kd,)
            partial_full = m @ At_d  # (K,) = (A~ @ m)^T rows via A~^T blocks
            b_blk = lax.psum_scatter(
                partial_full, axis, scatter_dimension=0, tiled=True
            )
            s = lax.psum(jnp.sum(b_blk), axis)
            return b_blk / s, b_blk / s

        _, betas = lax.scan(bstep, bT, lik_d[1:], reverse=True)
        beta_d = jnp.concatenate([betas, bT[None]], axis=0)  # (T, Kd)

        # ---- outputs ----
        g_raw = alpha_d * beta_d
        gden = lax.psum(jnp.sum(g_raw, axis=-1, keepdims=True), axis)
        gamma_d = g_raw / gden  # (T, Kd)

        bl_d = lik_d[1:] * beta_d[1:]  # (T-1, Kd)
        bl_full = _allgather_cols(bl_d, axis)  # (T-1, K) — ONE gather total
        # xi normalizers n_t = (alpha_t @ A~) . bl_t, assembled locally then
        # psum'd: each device contributes its alpha-rows' share.
        n_part = jnp.einsum("tk,tk->t", alpha_d[:-1] @ A_d, bl_full)
        n = lax.psum(n_part, axis)
        w_pair = w[:-1] * w[1:]
        alpha_w = alpha_d[:-1] * (w_pair / n)[:, None]  # (T-1, Kd)
        # row block of trans_stats: A~_rows ⊙ (alpha_w^T @ bl_full)
        trans_rows = A_d * (alpha_w.T @ bl_full)  # (Kd, K)

        init_d = w[0] * gamma_d[0]  # (Kd,)
        log_z = jnp.sum(log_c)
        return gamma_d, log_z, trans_rows, init_d, log_c

    def _allgather_cols(x, ax):
        return lax.all_gather(x, ax, axis=1, tiled=True)

    def _normalize_loglik_global(ll_d, ax):
        m = lax.stop_gradient(lax.pmax(jnp.max(ll_d, axis=-1), ax))
        return jnp.exp(ll_d - m[:, None]), m

    # shard inputs: pi/lik/A rows/At rows by state block
    gamma, log_z, trans_stats, init_stats, log_c = fb(
        log_pi, log_A, jnp.swapaxes(log_A, 0, 1), jnp.asarray(log_lik), w_arg
    )
    return FBResult(
        gamma=gamma,
        log_z=log_z,
        trans_stats=trans_stats,
        init_stats=init_stats,
        log_c=log_c,
    )
