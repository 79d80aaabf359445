"""Duplex fused E-step: BOTH chain recursions in ONE kernel sweep.

The fused kernels (:mod:`.pallas_fb`) run the forward chain to completion,
then the backward chain — 2T dependent MXU dots back-to-back. Each dot
waits on its predecessor, so the MXU idles in every dependency stall and
the measured E-step sits ~3x above its throughput roofline (BASELINE.md).
The duplex variant overlaps the two chains:

  Kernel 1 (duplex chains), grid step j:
    * forward-advances time tile j          (alpha, per-seq renorm/step)
    * backward-advances time tile nT-1-j    (beta, per-seq renorm/step)
    interleaved in one loop — the two recursions are mutually
    independent, so each one's chain dot fills the other's dependency
    stall, and the serial depth halves from 2T to T double-steps.
    Outputs: RAW alpha + its scale rows (log_c bookkeeping, exactly the
    fused forward's contract) and RAW beta (normalization deferred, the
    forward's folded-inverse trick mirrored in reverse).

  Kernel 2 (combine + stats), grid step j — NO chain dependence at all:
    every per-step quantity of tile j is a closed form over the stored
    alpha/beta blocks, so the whole tile vectorizes and the kernel runs
    at the MXU/HBM roofline:
      gamma_t   = (alpha_t * beta_t) / seg_sum(alpha_t * beta_t)
      xi-sum   += outer(alpha_{t-1}, lik_t * beta_t
                        / (seg_sum(beta_t) * seg_sum(alpha_{t-1}*beta_{t-1})))
      (identity: with alpha_t = alpha_hat_t c_t and bhat_t = beta_t/s_t,
       the xi normalizer z_{t-1} = <alpha_hat_{t-1}, A(lik_t bhat_t)>
       equals seg_sum(alpha_{t-1} * beta_{t-1}) * s_{t-1} / c_{t-1}, and
       every c/s scale cancels — no scale arrays cross the kernels.)
      emission stats += (w_t * gamma_t)^T @ feats_t
    The likelihood tile is recomputed from feats @ W bit-identically to
    kernel 1 (same operands, same precision spec), as the fused backward
    kernel already does.

  Cost/benefit vs the fused pair: adds one extra likelihood matmul (a
  third recompute), one (T, B/P, PK) beta array HBM round-trip, and a
  third feats read — all throughput, no chain; removes ~half the serial
  dependency stalls. Same outputs, same tolerances (interpret-mode
  parity tests vs pallas_estep_fused/scan).

Reference: pysvihmm hmmbase.py forward_msgs/backward_msgs (reconstructed,
SURVEY.md §2.2/§3) — both recursions, normalized space; this module is a
TPU-latency-motivated rearrangement of the same math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fb import (
    FBResult,
    _build_feats,
    _check_tiles,
    _choose_packing,
    _choose_tiles,
    _emit_scales,
    _kdot,
    _log_c_from_scales,
    _seg_bcast_inv,
    _seg_shift_exp,
    _split_bf16,
)


def _choose_tiles_duplex(R: int, T: int, PK: int, PF: int):
    """Duplex cells keep TWO feats blocks, two ll buffers, and two chain
    outputs resident (vs one each in the fused forward): budget the
    doubled footprint against the same ~24 MB double-buffered envelope."""
    return _choose_tiles(
        R, T, PK,
        budget_bytes=24 * 1024 * 1024,
        elem_bytes=(8 * PK + 2 * PF) * 4,
    )


def _duplex_kernel(
    pi_ref, A_ref, W_ref, ffeats_ref, bfeats_ref,
    alpha_ref, sa_ref, sha_ref, beta_ref,
    acarry, dcarry, *, C, K, D, kind, prec, ll_prec,
):
    """One grid step: forward tile j and backward tile nT-1-j, interleaved.

    pi_ref:    (1, PK)   pi~ tiled P times
    A_ref:     (PK, PK)  kron(I_P, A~)
    W_ref:     (PF, PK)  kron(I_P, W)
    ffeats_ref:(C, R, PIN) features of the FORWARD tile (time tile j)
    bfeats_ref:(C, R, PIN) features of the BACKWARD tile (time tile nT-1-j)
    alpha_ref: (C, R, PK) out: RAW forward messages (alpha_hat_t * c_t)
    sa_ref:    (P, C, R)  out: per-seq alpha sums (scales; log_c)
    sha_ref:   (P, C, R)  out: per-seq max shifts the exp ran under
    beta_ref:  (C, R, PK) out: RAW backward messages (bhat_t * local scale;
               normalization deferred exactly like the forward: the
               per-seq inverse folds into the next step's likelihood
               operand, so the segment reduce never extends the chain)
    acarry:    (R, PK) scratch — normalized forward handover
    dcarry:    (R, PK) scratch — backward handover lik_0 * bhat_0 of the
               LATER time tile (the reverse-direction mirror of acarry)
    """
    j = pl.program_id(1)
    PK = A_ref.shape[0]
    P = PK // K
    tile_r = ffeats_ref.shape[1]

    def ll_of(ref):
        raw = ref[...].reshape(C * tile_r, ref.shape[2])
        f2 = raw if kind is None else _build_feats(raw, D, P, kind)
        ll = _kdot(f2, W_ref[...], (((1,), (0,)), ((), ())), ll_prec)
        return ll.reshape(C, tile_r, PK)

    ll_f = ll_of(ffeats_ref)
    ll_b = ll_of(bfeats_ref)
    # batched shift+exp for both tiles (bit-identical to per-step shifts)
    elf = _seg_shift_exp(ll_f, K)
    elb = _seg_shift_exp(ll_b, K)

    A_split = _split_bf16(A_ref[:, :]) if prec == "bf16x3" else None

    def fwd_step(a_prev, lik_t):
        return (
            _kdot(a_prev, A_ref[:, :], (((1,), (0,)), ((), ())), prec,
                  b_split=A_split)
            * lik_t
        )

    def bwd_step(d):
        # d @ A~^T as a dim-1/dim-1 contraction (no transpose materialized)
        return _kdot(d, A_ref[:, :], (((1,), (1,)), ((), ())), prec,
                     b_split=A_split)

    # seeds: forward from pi (tile 0) / normalized carry; backward from
    # bhat_{T-1} = 1 (tile nT-1) / the reverse handover
    a = jnp.where(
        j == 0,
        pi_ref[0, :][None, :] * elf[0],
        fwd_step(acarry[:, :], elf[0]),
    )
    alpha_ref[0] = a
    ainv = _seg_bcast_inv(a, K)

    b = jnp.where(
        j == 0,
        jnp.ones_like(dcarry[:, :]),
        bwd_step(dcarry[:, :]),
    )
    beta_ref[C - 1] = b
    binv = _seg_bcast_inv(b, K)

    # interleaved chains: the fwd dot of step c and the bwd dot of step
    # C-1-c are independent — each fills the other's dependency stall
    for c in range(1, C):
        a = fwd_step(a, elf[c] * ainv)
        alpha_ref[c] = a
        ainv = _seg_bcast_inv(a, K)

        cb = C - 1 - c
        b = bwd_step(elb[cb + 1] * binv * b)
        beta_ref[cb] = b
        binv = _seg_bcast_inv(b, K)

    acarry[:, :] = a * ainv
    dcarry[:, :] = elb[0] * binv * b

    # forward epilogue (off both chains): stored-alpha scale rows + shifts
    _emit_scales(alpha_ref, sa_ref, K, prec)
    for p in range(P):
        sha_ref[p] = jnp.max(ll_f[:, :, p * K : (p + 1) * K], axis=-1)


def _combine_kernel(
    W_ref, feats_ref, alpha_ref, beta_ref, *rest,
    C, K, D, kind, gated, emit_gamma, prec, ll_prec, stats_prec,
):
    """Chain-free combine: gamma, pairwise xi sums, emission stats.

    Grid runs time tiles FORWARD; the only cross-tile state is the
    (alpha, 1/gsum) pair of the previous tile's last step, carried for
    the tile-boundary (t-1, t) pairing — a handover, not a recursion:
    every tile's body is one batched computation over its C steps.

    rest: [w_ref, g_ref if gated], gout_ref, acc_ref, eacc_ref,
    aprev (R, PK), dden (R, PK) scratches.
    """
    idx = 0
    if gated:
        w_ref, g_ref = rest[0], rest[1]
        idx = 2
    else:
        w_ref = g_ref = None
    gout_ref, acc_ref, eacc_ref = rest[idx], rest[idx + 1], rest[idx + 2]
    aprev, dden = rest[idx + 3 :]

    i = pl.program_id(0)
    j = pl.program_id(1)
    PK = alpha_ref.shape[2]
    P = PK // K
    tile_r = alpha_ref.shape[1]

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)
        eacc_ref[:, :] = jnp.zeros_like(eacc_ref)

    def lane_bcast(gc):
        if P == 1:
            return gc
        return jnp.concatenate(
            [jnp.broadcast_to(gc[..., p : p + 1], gc.shape[:-1] + (K,))
             for p in range(P)],
            axis=-1,
        )

    # likelihood recompute — bit-identical operands/precision to kernel 1
    raw = feats_ref[...].reshape(C * tile_r, feats_ref.shape[2])
    f2 = raw if kind is None else _build_feats(raw, D, P, kind)
    ll = _kdot(f2, W_ref[...], (((1,), (0,)), ((), ())), ll_prec)
    el = _seg_shift_exp(ll.reshape(C, tile_r, PK), K)

    al = alpha_ref[...]
    be = beta_ref[...]
    graw = al * be
    ginv = _seg_bcast_inv(graw, K)  # 1 / gsum_t, lane-broadcast
    gamma = graw * ginv
    if emit_gamma:
        gout_ref[...] = gamma
    gstats = gamma * lane_bcast(w_ref[...]) if gated else gamma

    def outer_acc(a, d, p_):
        return _kdot(a, d, (((0,), (0,)), ((), ())), p_)

    # emission stats: one batched contraction per tile
    eacc_ref[:, :] += outer_acc(
        gstats.reshape(C * tile_r, PK), f2, stats_prec
    )

    # pairwise: d_t = lik_t * bhat_t / gsum_{t-1}
    #             = el_t * beta_t * (1/seg_sum(beta_t)) * ginv_{t-1}
    sbinv = _seg_bcast_inv(be, K)
    d = el * be * sbinv
    if C > 1:
        d_in = d[1:] * ginv[: C - 1]
        if gated:
            d_in = d_in * lane_bcast(g_ref[...][1:])
        acc_ref[:, :] += outer_acc(
            al[: C - 1].reshape((C - 1) * tile_r, PK),
            d_in.reshape((C - 1) * tile_r, PK),
            prec,
        )

    @pl.when(j != 0)
    def _():
        d0 = d[0] * dden[:, :]
        if gated:
            d0 = d0 * lane_bcast(g_ref[...][0])
        acc_ref[:, :] += outer_acc(aprev[:, :], d0, prec)

    aprev[:, :] = al[C - 1]
    # ginv is (..., 1) at P=1 (keepdims reduce); the carry slot is PK-wide
    dden[:, :] = jnp.broadcast_to(ginv[C - 1], dden.shape)

    if not emit_gamma:
        # gamma0 (kept-mask-gated): time 0 lives in the FIRST visited tile
        @pl.when(j == 0)
        def _():
            gout_ref[:, :] = gstats[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "tiles", "emit_gamma", "in_kernel_feats",
        "feats_packed", "precision", "ll_precision", "stats_precision",
        "exact_alpha",
    ),
)
def pallas_estep_duplex(
    log_pi: jax.Array,
    log_A: jax.Array,
    W: jax.Array,
    feats: jax.Array,
    weights: jax.Array | None = None,
    interpret: bool = False,
    tiles: tuple[int, int] | None = None,
    emit_gamma: bool = False,
    in_kernel_feats: str | None = None,
    feats_packed: int = 0,
    precision: lax.Precision | str = lax.Precision.HIGHEST,
    ll_precision: lax.Precision | str = lax.Precision.HIGHEST,
    stats_precision: lax.Precision | str = lax.Precision.HIGHEST,
    exact_alpha: bool = False,  # accepted for pallas_estep_fused contract
    #   parity; the duplex kernels keep alpha VMEM-resident per tile and
    #   never round it to a storage dtype, so every call is "exact" here
) -> tuple[FBResult, jax.Array]:
    """Duplex-overlapped batched E-step (module docstring).

    Same contract as :func:`pallas_fb.pallas_estep_fused`: returns
    (FBResult, emit_stats (K, F)); FBResult.gamma is packed (T, B/P, P*K)
    when emit_gamma else None; log_c/log_z/init_stats/trans_stats per the
    standard contract, kept-mask-gated when ``weights`` is given.
    """
    if feats_packed:
        T, R_in, PIN_in = feats.shape
        B = R_in * feats_packed
        Fin = PIN_in // feats_packed
    else:
        T, B, Fin = feats.shape
    K = log_A.shape[0]
    if in_kernel_feats is None:
        D = 0
        F = Fin
    else:
        D = Fin
        F = 1 + D + D * (D + 1) // 2 if in_kernel_feats == "niw" else 1 + 2 * D
    if F != W.shape[0]:
        raise ValueError(f"W rows {W.shape[0]} != feature width {F}")

    feats = feats.astype(jnp.float32)
    w_tm = weights.astype(jnp.float32) if weights is not None else None
    A_tilde = jnp.exp(log_A).astype(jnp.float32)
    pi_tilde = jnp.exp(log_pi).astype(jnp.float32)

    P = _choose_packing(B, K)
    if feats_packed and feats_packed != P:
        raise ValueError(f"feats packed with P={feats_packed}, expected {P}")
    PK = P * K
    R = B // P
    PF = P * F
    PIN = P * Fin

    A_blk = jnp.kron(jnp.eye(P, dtype=jnp.float32), A_tilde)
    W_blk = jnp.kron(jnp.eye(P, dtype=jnp.float32), W.astype(jnp.float32))
    pi_blk = jnp.tile(pi_tilde, (P,))[None, :]

    feats_p = feats if feats_packed else feats.reshape(T, R, PIN)

    tile_r, C = tiles if tiles is not None else _choose_tiles_duplex(R, T, PK, PF)
    _check_tiles(tile_r, C, R, T, explicit=tiles is not None, interpret=interpret)
    nR, nT = R // tile_r, T // C

    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    alpha_t, s_a, sh_a, beta_t = pl.pallas_call(
        functools.partial(
            _duplex_kernel, C=C, K=K, D=D, kind=in_kernel_feats,
            prec=precision, ll_prec=ll_precision,
        ),
        grid=(nR, nT),
        in_specs=[
            pl.BlockSpec((1, PK), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PK, PK), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PF, PK), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (C, tile_r, PIN), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (C, tile_r, PIN),
                lambda i, j, nT=nT: (nT - 1 - j, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (C, tile_r, PK), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (P, C, tile_r), lambda i, j: (0, j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (P, C, tile_r), lambda i, j: (0, j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (C, tile_r, PK),
                lambda i, j, nT=nT: (nT - 1 - j, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, PK), jnp.float32),
            jax.ShapeDtypeStruct((P, T, R), jnp.float32),
            jax.ShapeDtypeStruct((P, T, R), jnp.float32),
            jax.ShapeDtypeStruct((T, R, PK), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_r, PK), jnp.float32),
            pltpu.VMEM((tile_r, PK), jnp.float32),
        ],
        compiler_params=None if interpret else compiler_params,
        interpret=interpret,
    )(pi_blk, A_blk, W_blk, feats_p, feats_p)

    log_c = _log_c_from_scales(s_a, sh_a)

    gated = w_tm is not None
    inputs = [W_blk, feats_p, alpha_t, beta_t]
    in_specs = [
        pl.BlockSpec((PF, PK), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (C, tile_r, PIN), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (C, tile_r, PK), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (C, tile_r, PK), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    if gated:
        w3 = w_tm.reshape(T, R, P)
        g = jnp.concatenate(
            [
                jnp.zeros((1, B), jnp.float32),
                w_tm.reshape(T, B)[:-1] * w_tm.reshape(T, B)[1:],
            ],
            axis=0,
        ).reshape(T, R, P)
        inputs += [w3, g]
        for _ in range(2):
            in_specs.append(
                pl.BlockSpec(
                    (C, tile_r, P), lambda i, j: (j, i, 0),
                    memory_space=pltpu.VMEM,
                )
            )

    if emit_gamma:
        gamma_spec = pl.BlockSpec(
            (C, tile_r, PK), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
        )
        gamma_shape = jax.ShapeDtypeStruct((T, R, PK), jnp.float32)
    else:
        gamma_spec = pl.BlockSpec(
            (tile_r, PK), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
        gamma_shape = jax.ShapeDtypeStruct((R, PK), jnp.float32)

    gamma_out, acc, eacc = pl.pallas_call(
        functools.partial(
            _combine_kernel,
            C=C, K=K, D=D, kind=in_kernel_feats, gated=gated,
            emit_gamma=emit_gamma,
            prec=precision, ll_prec=ll_precision, stats_prec=stats_precision,
        ),
        grid=(nR, nT),
        in_specs=in_specs,
        out_specs=[
            gamma_spec,
            pl.BlockSpec((PK, PK), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PK, PF), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            gamma_shape,
            jax.ShapeDtypeStruct((PK, PK), jnp.float32),
            jax.ShapeDtypeStruct((PK, PF), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_r, PK), jnp.float32),
            pltpu.VMEM((tile_r, PK), jnp.float32),
        ],
        compiler_params=None if interpret else compiler_params,
        interpret=interpret,
    )(*inputs)

    log_z = jnp.sum(log_c, axis=-1)
    acc_kk = sum(acc[p * K : (p + 1) * K, p * K : (p + 1) * K] for p in range(P))
    trans_stats = A_tilde * acc_kk
    emit_stats = sum(eacc[p * K : (p + 1) * K, p * F : (p + 1) * F] for p in range(P))

    if emit_gamma:
        init_g = gamma_out[0].reshape(B, K)
        if gated:
            init_g = init_g * w_tm.reshape(T, B)[0][:, None]
        gamma = gamma_out
    else:
        init_g = gamma_out.reshape(B, K)
        gamma = None

    fb = FBResult(
        gamma=gamma,
        log_z=log_z,
        trans_stats=trans_stats,
        init_stats=init_g,
        log_c=log_c,
    )
    return fb, emit_stats
