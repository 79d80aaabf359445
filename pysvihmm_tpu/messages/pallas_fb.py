"""Pallas TPU kernel: fused batched forward-backward message passing.

The TPU-native replacement for the reference's Cython E-step hot loop
(SURVEY.md §2.3: "the centerpiece"). XLA's `lax.scan` pays ~10 us per-step
scheduling overhead and re-materializes the carry through HBM every step;
this kernel keeps the whole batch's (B_TILE, K) message carry in VMEM
scratch across the time axis, streaming likelihood tiles HBM->VMEM through
pallas's pipelined BlockSpec machinery, each step one fused
(B_TILE, K) @ (K, K) MXU matmul + VPU rescale.

Performance-critical layout decisions (measured on v5e):
  * Arrays are TIME-MAJOR inside the kernel — (T, B, K) — so a time step is
    a leading-axis slice (contiguous (B, K) tile), not a strided mid-axis
    gather.
  * The batch tile is as LARGE as VMEM allows (up to 1024 rows): grid cells
    run sequentially on the TensorCore, so batch tiling multiplies the
    sequential step count — the first version tiled batch by 128 and ran 16x
    more dependent steps than necessary.
  * Time tiles are small (multiples of 8 sublanes) purely to pipeline HBM
    traffic; the carry crosses tiles in VMEM scratch.
  * The step-0 special case (alpha_0 = pi * lik_0) is hoisted out of the
    inner loop as a `pl.when` prologue — no per-step `lax.cond`.

The kernels produce normalized alpha, beta; smoothed marginals, per-step
scaling constants and summed pairwise stats are then batched XLA matmuls
(the factorized xi-sum trick in scan_fb.forward_backward) which XLA maps to
the MXU optimally — Pallas is used exactly where XLA is weak (the
sequential recursion).

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
    """One time-tile of the forward recursion, whole batch tile at once.

    pi_ref:   (1, K)            pi~
    A_ref:    (K, K)            A~ = exp(E[log A])
    lik_ref:  (C, B_TILE, K)    max-normalized likelihoods, time-major
    alpha_ref:(C, B_TILE, K)    out: normalized forward messages
    carry:    (B_TILE, K)       VMEM scratch persisting across time tiles
    """
    j = pl.program_id(1)

    def advance(a_prev, lik_t):
        a = jnp.dot(a_prev, A_ref[:, :], preferred_element_type=jnp.float32) * lik_t
        return a / jnp.sum(a, axis=-1, keepdims=True)

    @pl.when(j == 0)
    def _():
        a0 = pi_ref[0, :][None, :] * lik_ref[0]
        a0 = a0 / jnp.sum(a0, axis=-1, keepdims=True)
        alpha_ref[0] = a0
        carry[:, :] = a0

    @pl.when(j != 0)
    def _():
        a = advance(carry[:, :], lik_ref[0])
        alpha_ref[0] = a
        carry[:, :] = a

    if C <= 32:
        # static unroll: fixed indices lower to aligned vector stores and the
        # whole tile schedules as straight-line MXU/VPU code
        for c in range(1, C):
            a = advance(carry[:, :], lik_ref[c])
            alpha_ref[c] = a
            carry[:, :] = a
    else:
        def step(c, _):
            a = advance(carry[:, :], lik_ref[c])
            alpha_ref[c] = a
            carry[:, :] = a
            return _

        lax.fori_loop(1, C, step, 0)


def _bwd_kernel(A_ref, likshift_ref, beta_ref, carry, *, C):
    """Reverse-time tile: beta_t ∝ (lik_{t+1} * beta_{t+1}) @ A~^T, normalized.

    likshift[t] = lik[t+1] (ones at t = T-1) so each position only touches
    its own tile. Tiles arrive in reverse time order; within a tile we walk
    c = C-1 .. 0; carry holds beta_{t+1}.
    """
    j = pl.program_id(1)

    def advance(b_next, likshift_t):
        b = jnp.dot(
            b_next * likshift_t,
            A_ref[:, :].T,
            preferred_element_type=jnp.float32,
        )
        return b / jnp.sum(b, axis=-1, keepdims=True)

    @pl.when(j == 0)
    def _():
        ones = jnp.ones_like(carry[:, :])
        beta_ref[C - 1] = ones
        carry[:, :] = ones

    @pl.when(j != 0)
    def _():
        b = advance(carry[:, :], likshift_ref[C - 1])
        beta_ref[C - 1] = b
        carry[:, :] = b

    if C <= 32:
        for c in range(C - 2, -1, -1):
            b = advance(carry[:, :], likshift_ref[c])
            beta_ref[c] = b
            carry[:, :] = b
    else:
        def step(i, _):
            c = C - 2 - i
            b = advance(carry[:, :], likshift_ref[c])
            beta_ref[c] = b
            carry[:, :] = b
            return _

        lax.fori_loop(0, C - 1, step, 0)


def _choose_tiles(B: int, T: int, K: int):
    """(batch_tile, time_tile): batch tile as large as VMEM affords (grid
    cells serialize, so batch tiling multiplies sequential depth); time tile
    a multiple of 8 (sublane rule) just big enough to pipeline DMA."""
    # Mosaic multi-buffers each streamed block (~4 copies in flight between
    # the fwd's lik-in + alpha-out); cap one block at ~1 MB to stay under the
    # 16 MB scoped-VMEM limit with headroom, while keeping tile_b maximal.
    block_budget = (1024 * 1024) // (K * 4)  # elems per (C, tile_b) block

    def time_tile(tb):
        cap = 8 * (block_budget // tb // 8)
        for cand in range(min(cap, T - T % 8), 0, -8):
            if T % cand == 0:
                return cand
        return 0

    tile_b = min(B, 1024)
    while B % tile_b:
        tile_b //= 2
    tile_b = max(tile_b, 1)
    C = time_tile(tile_b)
    while C == 0 and tile_b > 1:
        tile_b //= 2
        C = time_tile(tile_b)
    if C == 0:
        # tiny T with no multiple-of-8 divisor: whole time axis in one block
        while tile_b > 1 and 4 * tile_b * T * K * 4 > 10 * 1024 * 1024:
            tile_b //= 2
        C = T
    return tile_b, C


@functools.partial(jax.jit, static_argnames=("interpret", "tiles"))
def pallas_forward_backward_batched(
    log_pi: jax.Array,
    log_A: jax.Array,
    log_lik: jax.Array,  # (B, T, K)
    interpret: bool = False,
    tiles: tuple[int, int] | None = None,
) -> FBResult:
    """Batched fused FB. Returns FBResult with leading batch axis on gamma /
    log_z / stats (stats NOT summed over batch; log_c is (B, T)).

    tiles: optional (batch_tile, time_tile) override of _choose_tiles for
    autotuning; both must divide (B, T) respectively."""
    B, T, K = log_lik.shape
    A_tilde = jnp.exp(log_A).astype(jnp.float32)
    lik_btk, shifts = _normalize_loglik(log_lik.astype(jnp.float32))
    pi_tilde = jnp.exp(log_pi).astype(jnp.float32)[None, :]  # (1, K)

    lik = jnp.swapaxes(lik_btk, 0, 1)  # (T, B, K) time-major for the kernels
    tile_b, C = tiles if tiles is not None else _choose_tiles(B, T, K)
    nB, nT = B // tile_b, T // C

    alpha_t = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((1, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, B, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_b, K), jnp.float32)],
        interpret=interpret,
    )(pi_tilde, A_tilde, lik)

    lik_shift = jnp.concatenate(
        [lik[1:], jnp.ones((1, B, K), jnp.float32)], axis=0
    )
    beta_t = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (C, tile_b, K),
                lambda i, j, nT=nT: (nT - 1 - j, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (C, tile_b, K),
            lambda i, j, nT=nT: (nT - 1 - j, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((T, B, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_b, K), jnp.float32)],
        interpret=interpret,
    )(A_tilde, lik_shift)

    # Everything below is parallel XLA matmul work in the time-major layout.
    # u[t] = alpha_t @ A~ feeds both log_c and the xi normalizers.
    u = jnp.einsum("tbk,kj->tbj", alpha_t[:-1], A_tilde)
    c_rest = jnp.einsum("tbk,tbk->tb", u, lik[1:])
    c0 = jnp.einsum("k,bk->b", pi_tilde[0], lik[0])
    log_c = jnp.concatenate([jnp.log(c0)[None, :], jnp.log(c_rest)], axis=0)
    log_c = jnp.swapaxes(log_c, 0, 1) + shifts  # (B, T)
    log_z = jnp.sum(log_c, axis=-1)

    g = alpha_t * beta_t
    gamma = jnp.swapaxes(g / jnp.sum(g, axis=-1, keepdims=True), 0, 1)

    bl = lik[1:] * beta_t[1:]
    n = jnp.einsum("tbk,tbk->tb", u, bl)
    alpha_w = alpha_t[:-1] / n[..., None]
    trans_stats = A_tilde[None] * jnp.einsum("tbk,tbj->bkj", alpha_w, bl)

    return FBResult(
        gamma=gamma,
        log_z=log_z,
        trans_stats=trans_stats,
        init_stats=gamma[:, 0, :],
        log_c=log_c,
    )
