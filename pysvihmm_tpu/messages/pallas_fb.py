"""Pallas TPU kernel: fused batched forward-backward message passing.

The TPU-native replacement for the reference's Cython E-step hot loop
(SURVEY.md §2.3: "the centerpiece"). XLA's `lax.scan` pays per-step
scheduling overhead and round-trips alpha through HBM every step; this
kernel keeps the (TILE_B, K) message carry in VMEM scratch across the whole
time axis, streaming likelihood tiles HBM->VMEM through pallas's pipelined
BlockSpec machinery, with each step one fused
(TILE_B, K) @ (K, K) MXU matmul + VPU rescale.

Grid layout: (batch_tiles, time_tiles) — the time axis is the trailing
(sequential) grid dimension, so VMEM scratch legally carries alpha/logz
across time tiles; batch tiles are independent.

The kernels produce normalized alpha, beta (T, K per sequence) and per-step
log-normalizers; smoothed marginals and summed pairwise stats are then two
XLA matmuls (the factorized xi-sum trick in scan_fb.forward_backward), which
XLA already maps to the MXU optimally — Pallas is used exactly where XLA is
weak (the sequential recursion), per the kernel-design guidance in
/opt/skills/guides/pallas_guide.md.

All kernels run under `interpret=True` on CPU for exact-agreement tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_fb import FBResult, _normalize_loglik


def _fwd_kernel(pi_ref, A_ref, lik_ref, alpha_ref, carry, *, C):
    """One (batch_tile, time_tile) cell of the forward recursion.

    pi_ref:   (1, K)        pi~ (step 0 handled here)
    A_ref:    (K, K)        A~ = exp(E[log A])
    lik_ref:  (TILE_B, C, K) max-normalized likelihoods for this time tile
    alpha_ref:(TILE_B, C, K) out: normalized forward messages
    carry:    (TILE_B, K)    VMEM scratch persisting across time tiles

    Per-step scaling constants are NOT stored (lane-unaligned column stores
    are illegal for Mosaic); log_c is reconstructed outside the kernel from
    alpha with one parallel batched matmul.
    """
    j = pl.program_id(1)

    def step(c, _):
        t_is_first = (j == 0) & (c == 0)
        lik_t = lik_ref[:, c, :]

        def first():
            return pi_ref[0, :][None, :] * lik_t

        def rest():
            return jnp.dot(
                carry[:, :], A_ref[:, :], preferred_element_type=jnp.float32
            ) * lik_t

        a = lax.cond(t_is_first, first, rest)
        s = jnp.sum(a, axis=-1, keepdims=True)
        a = a / s
        carry[:, :] = a
        alpha_ref[:, c, :] = a
        return _

    lax.fori_loop(0, C, step, 0)


def _bwd_kernel(A_ref, likshift_ref, beta_ref, carry, *, C):
    """Reverse-time cell: beta_t ∝ A~ @ (lik_{t+1} * beta_{t+1}), normalized.

    likshift holds lik shifted one step left (likshift[t] = lik[t+1], ones at
    t = T-1) so each position's update only touches its own tile. Tiles
    arrive in reverse time order (index_map flips j); within the tile we walk
    c from C-1 down to 0; carry holds beta_{t+1} across tiles.
    """
    j = pl.program_id(1)

    def step(i, _):
        c = C - 1 - i
        t_is_last = (j == 0) & (c == C - 1)  # reversed order: j=0 is chain end

        def last():
            return jnp.ones_like(carry[:, :])

        def rest():
            b = jnp.dot(
                carry[:, :] * likshift_ref[:, c, :],
                A_ref[:, :].T,
                preferred_element_type=jnp.float32,
            )
            return b / jnp.sum(b, axis=-1, keepdims=True)

        b = lax.cond(t_is_last, last, rest)
        beta_ref[:, c, :] = b
        carry[:, :] = b
        return _

    lax.fori_loop(0, C, step, 0)


def _choose_tiles(B: int, T: int, K: int):
    """Pick (batch_tile, time_tile). Mosaic requires the middle (sublane)
    block dim divisible by 8 or equal to T; blocks must fit VMEM with
    pipelining headroom (~3 buffers of lik + alpha in flight)."""
    tile_b = min(B, 128)
    while B % tile_b:
        tile_b //= 2
    tile_b = max(tile_b, 1)

    budget_elems = (1536 * 1024) // (tile_b * K * 4)  # ~1.5 MB per block
    C = 0
    for cand in range(8 * (budget_elems // 8), 0, -8):
        if T % cand == 0:
            C = cand
            break
    if C == 0:
        # no multiple-of-8 divisor fits: fall back to the whole time axis
        # (legal as "equal to the array dim"), shrinking tile_b to fit VMEM.
        while tile_b > 1 and tile_b * T * K * 4 > 3 * 1024 * 1024:
            tile_b //= 2
        C = T
    return tile_b, C


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_forward_backward_batched(
    log_pi: jax.Array,
    log_A: jax.Array,
    log_lik: jax.Array,  # (B, T, K)
    interpret: bool = False,
) -> FBResult:
    """Batched fused FB. Returns FBResult with leading batch axis on gamma /
    log_z / stats (stats NOT summed over batch; log_c is (B, T))."""
    B, T, K = log_lik.shape
    A_tilde = jnp.exp(log_A).astype(jnp.float32)
    lik, shifts = _normalize_loglik(log_lik.astype(jnp.float32))
    pi_tilde = jnp.exp(log_pi).astype(jnp.float32)[None, :]  # (1, K)

    tile_b, C = _choose_tiles(B, T, K)
    nB, nT = B // tile_b, T // C

    (alpha,) = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((1, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, C, K), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, C, K), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, K), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, K), jnp.float32)],
        interpret=interpret,
    )(pi_tilde, A_tilde, lik)

    lik_shift = jnp.concatenate(
        [lik[:, 1:, :], jnp.ones((B, 1, K), jnp.float32)], axis=1
    )
    (beta,) = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            # reversed time order for the backward sweep
            pl.BlockSpec(
                (tile_b, C, K),
                lambda i, j, nT=nT: (i, nT - 1 - j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_b, C, K),
                lambda i, j, nT=nT: (i, nT - 1 - j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, T, K), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tile_b, K), jnp.float32)],
        interpret=interpret,
    )(A_tilde, lik_shift)

    # Reconstruct per-step scaling constants from the normalized alpha:
    # c_t = sum_j (alpha_{t-1} @ A~)_j lik_tj, c_0 = sum(pi~ * lik_0) —
    # one *parallel* batched matmul (shared with the xi normalizers below).
    u = jnp.einsum("btk,kj->btj", alpha[:, :-1, :], A_tilde)  # (B, T-1, K)
    c_rest = jnp.einsum("btk,btk->bt", u, lik[:, 1:, :])
    c0 = jnp.einsum("k,bk->b", pi_tilde[0], lik[:, 0, :])
    log_c = jnp.concatenate([jnp.log(c0)[:, None], jnp.log(c_rest)], axis=1) + shifts
    log_z = jnp.sum(log_c, axis=-1)

    g = alpha * beta
    gamma = g / jnp.sum(g, axis=-1, keepdims=True)

    # Factorized pairwise stats (two MXU matmuls per sequence; XLA batches).
    bl = lik[:, 1:, :] * beta[:, 1:, :]
    n = jnp.einsum("btk,btk->bt", u, bl)
    alpha_w = alpha[:, :-1, :] / n[..., None]
    trans_stats = A_tilde[None] * jnp.einsum("btk,btj->bkj", alpha_w, bl)

    return FBResult(
        gamma=gamma,
        log_z=log_z,
        trans_stats=trans_stats,
        init_stats=gamma[:, 0, :],
        log_c=log_c,
    )
