"""Time-tiled forward-backward for very long single chains (BASELINE config 4).

Hybrid of scan_fb and assoc_fb (SURVEY.md §5 "long-context"): the chain is
cut into fixed-size time tiles; *within* a tile the per-step K x K matrices
are combined with `associative_scan` (log-depth, batched MXU matmuls) while
a `lax.scan` carries the boundary messages *across* tiles. Peak memory is
O(block_size * K^2 + T * K) regardless of T, so K = 64, T = 100k chains run
with MXU-sized work per step instead of 100k sequential (1, K) matvecs.

Transitions are padded to a whole number of tiles with identity matrices
(exactly neutral for products and log-normalizers), so any T works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .scan_fb import FBResult, _normalize_loglik
from .assoc_fb import _combine


def _pad_count(n_trans: int, S: int) -> int:
    return (S - n_trans % S) % S


def forward_backward_blocked(
    log_pi: jax.Array,
    log_A: jax.Array,
    log_lik: jax.Array,
    weights: jax.Array | None = None,
    block_size: int = 256,
) -> FBResult:
    """Same contract as scan_fb.forward_backward; O(T/S) sequential depth."""
    T, K = log_lik.shape
    S = min(block_size, max(T - 1, 1))
    A_tilde = jnp.exp(log_A)
    lik, shifts = _normalize_loglik(log_lik)
    dtype = log_lik.dtype

    n_trans = T - 1
    pad = _pad_count(n_trans, S)
    n_blocks = (n_trans + pad) // S

    # Per-transition matrices M_t (t = 1..T-1), padded with identity.
    eye = jnp.eye(K, dtype=dtype)
    lik_tr = jnp.concatenate([lik[1:], jnp.ones((pad, K), dtype)], axis=0)
    valid = jnp.concatenate(
        [jnp.ones((n_trans,), bool), jnp.zeros((pad,), bool)], axis=0
    )
    M_all = jnp.where(
        valid[:, None, None],
        A_tilde[None, :, :] * lik_tr[:, None, :],
        eye[None, :, :],
    ).reshape(n_blocks, S, K, K)

    a0 = jnp.exp(log_pi) * lik[0]
    c0 = jnp.sum(a0)
    alpha0 = a0 / c0

    def fwd_block(a, M_blk):
        m0 = jnp.max(M_blk, axis=(-2, -1), keepdims=True)
        M_n = M_blk / m0
        s0 = jnp.log(m0[..., 0, 0])
        P, sP = lax.associative_scan(_combine, (M_n, s0))
        au = jnp.einsum("k,tkj->tj", a, P)  # (S, K)
        sums = jnp.sum(au, axis=-1)
        alphas = au / sums[:, None]
        cums = jnp.log(sums) + sP
        log_c = jnp.diff(jnp.concatenate([jnp.zeros((1,), dtype), cums]))
        return alphas[-1], (alphas, log_c)

    _, (alphas_blk, logc_blk) = lax.scan(fwd_block, alpha0, M_all)
    alpha = jnp.concatenate(
        [alpha0[None], alphas_blk.reshape(-1, K)[:n_trans]], axis=0
    )
    log_c = jnp.concatenate([jnp.log(c0)[None], logc_blk.reshape(-1)[:n_trans]]) + shifts
    log_z = jnp.sum(log_c)

    def bwd_block(carry, M_blk):
        b = carry
        m0 = jnp.max(M_blk, axis=(-2, -1), keepdims=True)
        M_n = M_blk / m0
        s0 = jnp.log(m0[..., 0, 0])
        # reversed-order suffix of transposes => S'_i = (M_i ... M_last)^T
        Sp, _ = lax.associative_scan(
            _combine, (jnp.swapaxes(M_n, -1, -2), s0), reverse=True
        )
        bu = jnp.einsum("tkj,k->tj", Sp, b)  # beta_{i-1} rows within block
        betas = bu / jnp.sum(bu, axis=-1, keepdims=True)
        return betas[0], betas

    _, betas_blk = lax.scan(
        bwd_block, jnp.ones((K,), dtype), M_all, reverse=True
    )
    # betas_blk[j, i] = beta at position (j*S + i) (transition index offset):
    # beta_{t-1} for transition t => rows cover positions 0..n_trans+pad-1;
    # beta_{T-1} = 1 is appended, padded tail dropped.
    beta = jnp.concatenate(
        [betas_blk.reshape(-1, K)[:n_trans], jnp.ones((1, K), dtype)], axis=0
    )

    g = alpha * beta
    gamma = g / jnp.sum(g, axis=-1, keepdims=True)

    if weights is None:
        w = jnp.ones((T,), dtype)
    else:
        w = weights.astype(dtype)

    bl = lik[1:] * beta[1:]
    n = jnp.einsum("tk,tk->t", alpha[:-1] @ A_tilde, bl)
    w_pair = w[:-1] * w[1:]
    alpha_w = alpha[:-1] * (w_pair / n)[:, None]
    trans_stats = A_tilde * (alpha_w.T @ bl)

    init_stats = w[0] * gamma[0]
    return FBResult(
        gamma=gamma,
        log_z=log_z,
        trans_stats=trans_stats,
        init_stats=init_stats,
        log_c=log_c,
    )
