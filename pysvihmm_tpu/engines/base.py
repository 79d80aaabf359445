"""Shared engine machinery: batched local E-steps, ELBO, decoding.

Replaces the helpers on ``VariationalHMMBase`` (``pysvihmm/hmmbase.py``,
reconstructed — SURVEY.md §2.2/§3): ``local_update``, ``lower_bound``,
state decoding. Everything is a pure function of (params, prior, obs);
engines differ only in *which data* they feed the local step and *how* they
turn stats into the next global state.
"""

from __future__ import annotations

import math
import os
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
from ..utils.precision import bulk_precision, f32_matmuls


class LocalStats(NamedTuple):
    """Summed expected sufficient statistics from a batch local step."""

    init: jax.Array  # (K,)
    trans: jax.Array  # (K, K)
    emit: object  # emission-family stats pytree, leading K
    log_z: jax.Array  # () summed variational log-normalizer


@f32_matmuls
def batch_local_step(
    params: HMMParams,
    emission,
    obs: jax.Array,
    method: str = "auto",
    weights: jax.Array | None = None,
    need_gamma: bool = True,
    prepared=None,
    exact: bool = False,
) -> tuple[LocalStats, jax.Array]:
    """Full local update over a batch of sequences.

    obs: (B, T, D) float or (B, T) int. weights: optional (B, T) kept-mask.
    Returns (summed stats, gamma (B, T, K) — or None when need_gamma=False,
    uniformly across methods: training steps consume only the stats, and on
    the fully-fused path skipping gamma also skips materializing it).
    method="pallas" runs the fused lane-packed kernels
    (messages/pallas_fb.py) with packed emission stats; "pallas_fused" runs
    the fully-fused kernels (likelihood matmul and emission stats
    in-kernel). "auto" (default) resolves to pallas_fused on TPU (the
    measured-fastest path — BASELINE.md) and scan elsewhere; other methods
    batch via messages.e_step_batched (vmapped, each scan step a
    (B, K) @ (K, K) MXU matmul).

    exact=True pins f32 alpha storage on the fused path even when
    need_gamma=False: log_c derives from the STORED alpha, so the TPU
    training default (bf16 alpha for gamma-free calls) would inject
    ~sqrt(T)*1e-3 nats of rounding into log Z. Evaluation callers
    (lower_bound) set it; training steps keep the measured-faster default.
    """
    method = messages.resolve_method(method, time_len=obs.shape[1])
    B, T = obs.shape[0], obs.shape[1]
    K = params.init.shape[0]

    if method == "pallas_fused":
        fb, emit_stats = _pallas_fused_estep(
            params, emission, obs, weights, need_gamma=need_gamma,
            prepared=prepared, exact=exact,
        )
        if need_gamma:
            fb = fb._replace(gamma=jnp.swapaxes(fb.gamma.reshape(T, B, K), 0, 1))
    elif method == "pallas":
        fb, emit_stats = _pallas_packed_estep(params, emission, obs, weights)
        if need_gamma:
            fb = fb._replace(gamma=jnp.swapaxes(fb.gamma.reshape(T, B, K), 0, 1))
    else:
        log_pi, log_A = expected_log_params(params)
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
    return stats, (fb.gamma if need_gamma else None)


@f32_matmuls
def long_chain_local_stats(
    params: HMMParams,
    emission,
    chain: jax.Array,
    block_size: int = 256,
    impl: str | None = None,
    time_minor: bool = False,
) -> LocalStats:
    """Exact full-chain local stats for ONE very long chain, streaming.

    Semantically `batch_local_step(params, emission, chain[None],
    method="blocked", need_gamma=False)[0]`, but gamma and the per-
    transition K x K matrices are never materialized: emission sufficient
    stats are reduced blockwise inside the backward sweep
    (messages/blocked.py::forward_backward_blocked_stream). Peak memory is
    O(T K), so K = 64 chains of T = 10M+ steps fit one chip's HBM — the
    regime of the reference paper's T~250M chromatin experiment (Foti et
    al. 2014 §4), which the non-streaming blocked path cannot reach.

    Call under `jax.jit` (static: emission, block_size, impl). Eager calls
    work but pay per-op dispatch latency — on the axon relay that is
    ~3.5 ms/op and turns a 0.1 s jitted T=100k E-step into ~9.5 s
    (bench_results/r3_tpu.jsonl).

    impl: "fused" (default — the likelihood-fused two-phase tier,
    messages/stream_fused.py: likelihoods computed per chunk from the raw
    observations, so the (T, K) array never exists in HBM and one chip
    reaches T≈100M Gaussian / 250M multinomial), "twophase" (the r4 tier:
    (T, K) log-lik materialized up front; also via
    PYSVIHMM_STREAM_IMPL=twophase), or "assoc" (the associative-scan
    tier). All are exact and f64-parity-tested against each other.
    """
    from ..messages.blocked import (
        forward_backward_blocked_stream,
        forward_backward_blocked_twophase,
    )

    if impl is None:
        impl = os.environ.get("PYSVIHMM_STREAM_IMPL", "fused")
    if time_minor and impl != "fused":
        # the non-fused tiers consume a (T, K) likelihood computed from a
        # TIME-MAJOR chain; silently feeding them (D, T) would produce a
        # confusing downstream shape error (or, at T == D, wrong stats)
        raise ValueError(
            f"time_minor=True requires impl='fused' (got impl={impl!r})"
        )

    stat_fn = lambda g, y: emission_flat_stats(emission, params.emit, g, y)
    log_pi, log_A = expected_log_params(params)
    if impl == "fused":
        from ..messages.stream_fused import forward_backward_fused_twophase

        r = forward_backward_fused_twophase(
            log_pi,
            log_A,
            chain,
            _long_chain_ell_fn(params, emission),
            block_size=block_size,
            stat_fn=stat_fn,
            stat_init=emission.zero_stats(params.emit),
            # time_minor: chain arrives FEATURE-MAJOR (D, T) so full-T
            # arrays stay lane-dense under TPU tiling (a time-major
            # (T, 8) f32 chain pads 16x in HBM — stream_fused.py)
            time_minor=time_minor,
        )
    else:
        fb_stream = {
            "twophase": forward_backward_blocked_twophase,
            "assoc": forward_backward_blocked_stream,
        }[impl]
        ll = emission.expected_log_likelihood(params.emit, chain)  # (T, K)
        r = fb_stream(
            log_pi,
            log_A,
            ll,
            block_size=block_size,
            stat_xs=chain,
            stat_fn=stat_fn,
            stat_init=emission.zero_stats(params.emit),
        )
    return LocalStats(
        init=r.init_stats, trans=r.trans_stats, emit=r.acc, log_z=r.log_z
    )


def _long_chain_ell_fn(params, emission):
    """Per-chunk expected-log-likelihood closure for the fused streaming
    tiers: the Gaussian families get their feature-matmul form (one
    feats @ W per chunk at the bulk 3-pass "high" tier — the production
    likelihood precision, utils/precision.py); families without feature
    form fall back to expected_log_likelihood directly."""
    if hasattr(emission, "ell_features"):
        W = emission.ell_feature_matrix(params.emit)

        def ell_fn(rows):
            with bulk_precision():
                return emission.ell_features(rows) @ W

        return ell_fn
    return lambda rows: emission.expected_log_likelihood(params.emit, rows)


@f32_matmuls
def long_chain_decode(
    params: HMMParams,
    emission,
    chain: jax.Array,
    block_size: int = 1024,
    chunks: int = 8,
    time_minor: bool = False,
) -> jax.Array:
    """Posterior-marginal decode of ONE long chain, streaming: (T,) int32.

    Same argmax_k gamma_tk rule as :func:`decode` (the reference's decode
    — SURVEY.md:140) but gamma is never materialized: the fused streaming
    backward sweep emits each step's argmax directly
    (messages/stream_fused.py emit_argmax), so the decode reaches the
    same T≈100M+ single-chip scale as the streaming E-step — the
    reference paper's chromatin segmentation deliverable at T≈250M
    (SURVEY.md:284). Call under jit (static: emission, block_size,
    chunks).
    """
    from ..messages.stream_fused import forward_backward_fused_twophase

    log_pi, log_A = expected_log_params(params)
    r = forward_backward_fused_twophase(
        log_pi,
        log_A,
        chain,
        _long_chain_ell_fn(params, emission),
        block_size=block_size,
        chunks=chunks,
        emit_argmax=True,
        time_minor=time_minor,
    )
    return r.z


def _pallas_packed_estep(params, emission, obs, weights=None):
    """Fused-kernel E-step with gamma left in the kernels' PACKED layout.

    Shared by :func:`batch_local_step` and :func:`windowed_local_step`.
    Returns (FBResult with gamma (T, B/P, P*K), summed emission stats).
    """
    from ..messages.pallas_fb import on_tpu, pallas_forward_backward_batched

    log_pi, log_A = expected_log_params(params)
    # compute the likelihoods TIME-MAJOR so no 4*T*B*K-byte transpose
    # feeds the kernel; the barrier forces the (B, T, D) observation
    # transpose (D << K, cheap) to MATERIALIZE so downstream consumers
    # cannot fold it into their own output layouts.
    if obs.ndim == 3:
        obs_tm = jax.lax.optimization_barrier(jnp.swapaxes(obs, 0, 1))
    else:  # int observations (multinomial): tiny, transpose freely
        obs_tm = jnp.swapaxes(obs, 0, 1)

    # production-scale likelihood matmul: 3-pass "high" (one-shot error,
    # ~5e-7 relative — utils/precision.py policy), not the 6-pass f32
    # the engine-wide guard would impose (~7% of the whole E-step).
    # Families exposing ell_features (the Gaussian families) get ONE feats @ W matmul
    # whose (T, B, F) feature array is REUSED by the emission-stats matmul —
    # the y (x) y pair features are built and written to HBM once, not twice.
    feats_tm = None
    with bulk_precision():
        if hasattr(emission, "ell_features"):
            feats_tm = emission.ell_features(obs_tm)  # (T, B, F)
            W = emission.ell_feature_matrix(params.emit)  # (F, K)
            ll_tm = feats_tm @ W  # (T, B, K)
        else:
            ll_tm = emission.expected_log_likelihood(params.emit, obs_tm)

    w_tm = jnp.swapaxes(weights, 0, 1) if weights is not None else None
    from ..messages.pallas_fb import kernel_precisions

    fb = pallas_forward_backward_batched(
        log_pi,
        log_A,
        ll_tm,
        weights=w_tm,
        time_major=True,
        packed_gamma=True,
        # Mosaic requires a TPU; everywhere else run the same kernels
        # under the pallas interpreter (tests, CPU fallback)
        interpret=not on_tpu(),
        # same chain-tier policy as the fused path (bf16x3 default)
        precision=kernel_precisions()[0],
    )
    # Emission stats read gamma in its PACKED kernel layout (no XLA
    # re-layout copy of the whole array); weights fold into the
    # feature side: sum_n (gamma_n w_n) f_n = sum_n gamma_n (w_n f_n).
    emit_stats = _packed_emission_stats(
        emission, params.emit, fb.gamma, obs_tm, weights_tm=w_tm, feats=feats_tm
    )
    return fb, emit_stats


def _fused_feats_W(emission, emit_params, obs_tm, K):
    """(kernel input, W (F, K), in_kernel_feats kind, packing P-or-0).

    Gaussian families build the DENSE (T, B, F) feature array with one XLA
    pass and let pallas_estep_fused reshape it into the kernels' packed
    (T, B/P, P*F) layout — the measured-fastest route (141.2k seq/s on
    the K=64/T=1k headline bench under the bf16x3 tiers + triu features;
    90.7k in the exact-f32/full-D^2 era when the alternatives below were
    first measured). The measured-slower alternatives are kept behind env
    knobs, OFF by default:

      * PYSVIHMM_INKERNEL_FEATS: pass raw observations and build
        [1, y, y (x) y] inside the kernels (only D floats/obs cross HBM
        instead of F) — the ragged lane concatenation is a Mosaic relayout
        storm: MEASURED 60.6k.
      * PYSVIHMM_SLOT_FEATS: per-packed-slot XLA construction
        (feats born packed, no reshape) — the P strided slices
        obs[:, p::P] gather across sublanes and the ragged P*F lane
        concat is worse than the reshape it avoids: MEASURED 44.0k.
        (This was briefly the default via an end-of-round-2 WIP snapshot;
        BENCH_r02.json's 44k records exactly that regression.)
      * PYSVIHMM_BLOCKED_FEATS: contiguous-block slots (b = p*R + r; no
        strided slices) — the ragged 73+73 lane concat alone is the
        disaster, contiguity does not save it: MEASURED 36.5k. NOTE:
        permutes per-sequence output order; sum-consumers only.
      * PYSVIHMM_PAD128_FEATS: zero-pad F to the 128-lane tile boundary
        so the packed reshape is lane-aligned — the +75% likelihood/stat
        matmul width costs more than the relayout it saves:
        MEASURED 94.6k.
      * PYSVIHMM_PADLG_FEATS: pad F only far enough that the PACKED row
        P*F is a whole number of 128-lane groups (45 -> 64 at P=2, so
        P*F = 128 exactly; no physical kernel-side growth since the
        packed row pads to 128 lanes either way) — still slower than
        paying the unaligned reshape: MEASURED 132.5k vs dense 141.2k
        (triu-era numbers).
    The optimized-HLO profile (bench_results/r3_profile_fused.txt) puts
    the dense route's packed-reshape materialization at ~1.6 ms of the
    9.5 ms E-step; all four attempted avoidance routes measured slower
    than paying it.

    MultinomialDirichlet passes dense one-hot features with kind None,
    W = E[log phi]^T.
    """
    from ..distributions import dirichlet
    from ..distributions.emissions import (
        DiagonalGaussianNIG,
        GaussianNIW,
        MultinomialDirichlet,
    )
    from ..messages.pallas_fb import _choose_packing

    if emission is MultinomialDirichlet:
        V = emit_params.shape[-1]
        W = jnp.swapaxes(dirichlet.expected_log_probs(emit_params), 0, 1)  # (V, K)
        # one-hot features are EXACT in bf16: half the HBM stream, lossless
        feats = jax.nn.one_hot(obs_tm, V, dtype=_feats_store_dtype(emission))
        return feats, W, None, 0
    Wm = emission.ell_feature_matrix(emit_params)
    import os

    if os.environ.get("PYSVIHMM_INKERNEL_FEATS") and emission in (
        GaussianNIW, DiagonalGaussianNIG
    ):
        kind = "niw" if emission is GaussianNIW else "nig"
        return obs_tm.astype(jnp.float32), Wm, kind, 0
    if os.environ.get("PYSVIHMM_SLOT_FEATS"):
        P = _choose_packing(obs_tm.shape[1], K)
        if P > 1:
            feats = jnp.concatenate(
                [emission.ell_features(obs_tm[:, p::P]) for p in range(P)], axis=-1
            )
            return feats, Wm, None, P
    if os.environ.get("PYSVIHMM_PAD128_FEATS"):
        # MEASUREMENT experiment: pad the feature width to the 128-lane
        # tile boundary with zero columns (matching zero rows in W — the
        # likelihoods and stats are exact; pad stat columns are zeros).
        # The feats array's PHYSICAL traffic is unchanged (73 lanes were
        # already padded to 128 in HBM tiles); the packed reshape
        # (T,B,128)->(T,R,256) becomes lane-aligned.
        feats = emission.ell_features(obs_tm)
        F = feats.shape[-1]
        Fp = -(-F // 128) * 128
        if Fp != F:
            feats = jnp.pad(feats, ((0, 0), (0, 0), (0, Fp - F)))
            Wm = jnp.pad(Wm, ((0, Fp - F), (0, 0)))
        return feats, Wm, None, 0
    if os.environ.get("PYSVIHMM_PADLG_FEATS"):
        # MEASUREMENT experiment: pad F only to the smallest width making
        # the PACKED row P*F a whole number of 128-lane groups (45 -> 64
        # at P=2), instead of PAD128's full 128. The packed (T, R, P*F)
        # array is physically 128-lane-padded either way, so this pad
        # adds no kernel-side traffic; the (T, B, Fp) -> (T, R, P*Fp)
        # reshape becomes lane-group aligned. Pad stat columns are zeros.
        feats = emission.ell_features(obs_tm)
        F = feats.shape[-1]
        P = _choose_packing(obs_tm.shape[1], K)
        g = 128 // math.gcd(P, 128)
        Fp = min(-(-F // g) * g, -(-F // 128) * 128)
        if Fp != F:
            feats = jnp.pad(feats, ((0, 0), (0, 0), (0, Fp - F)))
            Wm = jnp.pad(Wm, ((0, Fp - F), (0, 0)))
        return feats, Wm, None, 0
    if os.environ.get("PYSVIHMM_BLOCKED_FEATS"):
        # MEASUREMENT-ONLY experiment: build feats per CONTIGUOUS B-block
        # (slot p = sequences [p*R, (p+1)*R)) instead of the interleaved
        # b = r*P+p convention — no strided slices, no whole-array packed
        # reshape. PERMUTES the per-sequence output order (log_c rows,
        # init_stats rows, packed gamma): only sum-consumers (the bench,
        # batch global updates) see identical results. Not a production
        # route until the unpacking convention is switched to match.
        B = obs_tm.shape[1]
        P = _choose_packing(B, K)
        if P > 1:
            R = B // P
            feats = jnp.concatenate(
                [emission.ell_features(obs_tm[:, p * R : (p + 1) * R])
                 for p in range(P)],
                axis=-1,
            )
            return feats, Wm, None, P
    return (
        emission.ell_features(obs_tm).astype(_feats_store_dtype(emission)),
        Wm, None, 0,
    )


def _feats_store_dtype(emission=None):
    """Storage dtype for the fused E-step's (T, B, F) feature array.

    The feature array is the E-step's dominant HBM stream (read by BOTH
    kernels), and storing it bf16 halves that traffic: measured +27% at
    the K=64/T=1k headline (134-140k -> 173-177k seq/s, r4_tpu.jsonl).
    BUT for the Gaussian families it is NOT production-safe: extracting a
    per-state covariance (~cov_scale) from global second moments (~y^2)
    needs ~log2((mean_sep/std)^2) mantissa bits — ~13 at the headline's
    mean_scale=8/cov=0.3 — and bf16 has 8, so the bf16-value-rounded
    y (x) y stats break the NIW posterior's PSD margin exactly like the
    1-pass-bf16 stat tier did (reproduced: subchain SVI at K=64/D=8 NaNs
    on step 2, config-4 Hamming 0.0 -> 0.98; r4_tpu.jsonl). Full-batch VB
    survived the same rounding (its rho=1 conjugate update averages 256k
    observations, burying the rounding under gamma mass), which is why the
    first-pass quality check passed — the windowed-SVI probe is the
    decisive one.

    Default is therefore f32 for the Gaussian families, and bf16 ON TPU
    only where rounding is EXACT: multinomial one-hot features (0/1 are
    bf16-representable, so the half-traffic stream is lossless).
    PYSVIHMM_BF16_FEATS=1/0 forces either way (measurement knob).
    """
    v = os.environ.get("PYSVIHMM_BF16_FEATS", "").strip().lower()
    if v in ("0", "false", "off"):
        return jnp.float32
    if v:
        return jnp.bfloat16
    from ..distributions.emissions import MultinomialDirichlet
    from ..messages.pallas_fb import on_tpu

    if emission is MultinomialDirichlet and on_tpu():
        return jnp.bfloat16
    return jnp.float32


def _unpack_emit_stats(emission, emit_params, S):
    """(K, F) fused-kernel accumulator -> the emission family's stats pytree."""
    return emission.unpack_flat_stats(emit_params, S)


def _fused_tiles_override():
    """Optional (row_tile, time_tile) override for the fused kernels from
    PYSVIHMM_FUSED_TILES="512,8" — a tuning knob for bench sweeps; the
    default (None) lets pallas_fb._choose_tiles_fused pick."""
    import os

    s = os.environ.get("PYSVIHMM_FUSED_TILES")
    if not s:
        return None
    a, b = s.split(",")
    return (int(a), int(b))


def _fused_W(emission, emit_params):
    """The fused kernels' (F, K) weight matrix — the only params-dependent
    half of :func:`_fused_feats_W`."""
    from ..distributions import dirichlet
    from ..distributions.emissions import MultinomialDirichlet

    if emission is MultinomialDirichlet:
        return jnp.swapaxes(dirichlet.expected_log_probs(emit_params), 0, 1)
    return emission.ell_feature_matrix(emit_params)


def prepare_fused_obs(params, emission, obs):
    """Precompute the fused E-step's OBSERVATION-side inputs once.

    The feature array (and its packed-layout reshape) depends only on the
    data — for engines whose data is fixed across iterations (batch
    VB/SGD, repeated decodes) it is loop-invariant, but XLA does NOT
    hoist it out of a `lax.scan` on its own (profiled: the construction
    + packed-reshape relayout ran inside every benchmark iteration, ~2.8
    of 9.5 ms at the K=64/T=1k headline — bench_results/
    r3_profile_fused.txt). Build it ONCE here and pass the result to
    :func:`batch_local_step` via ``prepared=``; params-dependent W is
    still rebuilt per step.

    Returns (packed feats, kind, packing), or None when the fused path
    will not consume it (large-vocabulary multinomial fallback).
    Ignores the experimental PYSVIHMM_*_FEATS measurement knobs (the
    production dense route only).
    """
    from ..distributions.emissions import MultinomialDirichlet
    from ..messages.pallas_fb import _choose_packing
    from ..models.hmm import ONE_HOT_MAX_V

    if emission is MultinomialDirichlet and params.emit.shape[-1] > ONE_HOT_MAX_V:
        return None
    obs_tm = jnp.swapaxes(obs, 0, 1)
    if emission is MultinomialDirichlet:
        feats = jax.nn.one_hot(
            obs_tm, params.emit.shape[-1], dtype=_feats_store_dtype(emission)
        )
    else:
        feats = emission.ell_features(obs_tm).astype(_feats_store_dtype(emission))
    T, B, Fin = feats.shape
    K = params.init.shape[0]
    P = _choose_packing(B, K)
    if P > 1:
        feats = feats.reshape(T, B // P, P * Fin)
    return (feats, None, P if P > 1 else 0)


def _pallas_fused_estep(params, emission, obs, weights=None, need_gamma=True,
                        prepared=None, gamma_sel=None, exact=False):
    """Fully-fused kernel E-step (likelihoods + FB + all stats in-kernel).

    Returns (FBResult with gamma packed (T, B/P, P*K) or None, emission
    stats pytree). See messages/pallas_fb.py::pallas_estep_fused.

    Large-vocabulary multinomials fall back to the packed (split) path:
    the fused kernels stream dense one-hot features through BOTH kernels,
    which beats the gathered (T, B, K) likelihoods only while V stays
    comparable to K (models/hmm.py::ONE_HOT_MAX_V).
    """
    from ..distributions.emissions import MultinomialDirichlet
    from ..messages.pallas_fb import (
        kernel_precisions,
        on_tpu,
        pallas_estep_fused,
    )
    from ..models.hmm import ONE_HOT_MAX_V

    if emission is MultinomialDirichlet and params.emit.shape[-1] > ONE_HOT_MAX_V:
        return _pallas_packed_estep(params, emission, obs, weights)

    estep = pallas_estep_fused
    if os.environ.get("PYSVIHMM_DUPLEX"):
        # experimental: overlap the two chain recursions in one kernel
        # (messages/pallas_duplex.py) — same contract, measured A/B in
        # bench_results/
        from ..messages.pallas_duplex import pallas_estep_duplex as estep

    prec, ll_prec, stats_prec = kernel_precisions()

    log_pi, log_A = expected_log_params(params)
    if prepared is not None:
        feats, kind, packing = prepared
        W = _fused_W(emission, params.emit)
    else:
        if obs.ndim == 3 and os.environ.get("PYSVIHMM_OBS_BARRIER"):
            # measurement knob, OFF by default: forcing the (B, T, D)
            # transpose to materialize costs a full pass over the
            # LANE-PADDED array (D=8 pads 16x to 128 lanes). Without the
            # barrier XLA folds the transpose into the feature-
            # construction reads (throughput-neutral, measured).
            obs_tm = jax.lax.optimization_barrier(jnp.swapaxes(obs, 0, 1))
        else:
            obs_tm = jnp.swapaxes(obs, 0, 1)
        feats, W, kind, packing = _fused_feats_W(
            emission, params.emit, obs_tm, params.init.shape[0]
        )
    w_tm = jnp.swapaxes(weights, 0, 1) if weights is not None else None
    extra = {}
    if gamma_sel is not None:
        # in-kernel per-window gamma pick (fused kernels only; the duplex
        # experiment does not implement it)
        if estep is not pallas_estep_fused:
            raise ValueError("gamma_sel requires the fused kernels")
        extra = {"gamma_sel": gamma_sel}
        need_gamma = False
    fb, S = estep(
        log_pi,
        log_A,
        W,
        feats,
        weights=w_tm,
        emit_gamma=need_gamma,
        **extra,
        in_kernel_feats=kind,
        feats_packed=packing,
        tiles=_fused_tiles_override(),
        interpret=not on_tpu(),
        precision=prec,
        ll_precision=ll_prec,
        stats_precision=stats_prec,
        exact_alpha=exact,
    )
    if (
        os.environ.get("PYSVIHMM_PAD128_FEATS")
        or os.environ.get("PYSVIHMM_PADLG_FEATS")
    ) and hasattr(emission, "ell_feature_matrix"):
        S = S[:, : emission.ell_feature_matrix(params.emit).shape[0]]
    return fb, _unpack_emit_stats(emission, params.emit, S)


def windowed_local_step(
    params: HMMParams,
    emission,
    windows: jax.Array,  # (B, W, D) float or (B, W) int
    maskf: jax.Array,  # (B, W) kept-mask (0/1 floats)
    offs: jax.Array,  # (B,) kept-region offset inside each window
    method: str = "auto",
) -> tuple[object, jax.Array, jax.Array, jax.Array]:
    """Shared local step of the windowed engines (svi/metaobs subchains).

    Returns (emit_stats, trans_stats, gamma_at_off, log_c): emission stats
    kept-mask-gated and summed over windows; trans_stats pair-gated and
    summed (shape (K, K)); gamma_at_off (B, K) = each window's smoothed
    marginal at its kept-region offset (the initial-state stats site);
    log_c (B, W) per-step log normalizers (mask applies to their sum).

    On the pallas path gamma stays in the kernels' packed layout end to end
    (emission stats read it packed; gamma_at_off is a tiny per-window
    gather), so no whole-array (B,W,K)<->(W,B,K) re-layout copies are paid.
    """
    method = messages.resolve_method(method, time_len=windows.shape[1])
    from ..distributions.emissions import MultinomialDirichlet
    from ..models.hmm import ONE_HOT_MAX_V

    large_v = (
        emission is MultinomialDirichlet and params.emit.shape[-1] > ONE_HOT_MAX_V
    )
    if (
        method == "pallas_fused"
        and not large_v
        and os.environ.get("PYSVIHMM_GAMMA_SEL")
        and not os.environ.get("PYSVIHMM_DUPLEX")
    ):
        # MEASUREMENT knob, OFF by default: gamma-free windowed step — the
        # per-window offset marginal is accumulated IN-KERNEL
        # (pallas_fb.py gamma_sel), so the (W, B, K) gamma array is never
        # written and the one-hot contraction below disappears. MEASURED
        # SLOWER on chip at the production W=72 shapes (B=32: 0.75 vs
        # 0.61 ms; B=1024: 1.67 vs 1.63 — r4_tpu.jsonl): the avoided
        # gamma traffic is only ~25 us at this W while the extra
        # (C, R, P) sel stream + per-cell accumulate cost more. Kept as
        # a knob for LARGE-window regimes where gamma traffic dominates.
        fb, emit_stats = _pallas_fused_estep(
            params, emission, windows, maskf, gamma_sel=offs
        )
        return emit_stats, fb.trans_stats, fb.init_stats, fb.log_c
    if method in ("pallas", "pallas_fused"):
        if method == "pallas_fused":
            fb, emit_stats = _pallas_fused_estep(
                params, emission, windows, maskf, need_gamma=True
            )
        else:
            fb, emit_stats = _pallas_packed_estep(params, emission, windows, maskf)
        gamma_packed = fb.gamma  # (W, R, P*K)
        B = windows.shape[0]
        K = params.init.shape[0]
        P = gamma_packed.shape[-1] // K

        # window i lives in packed row i // P, lane block i % P, i.e. the
        # packed (W, R, P*K) array viewed as (W, B, K) has window i's
        # smoothed marginals at [:, i, :] — a pure lane-split reshape.
        # Selecting time offs[i] per window as a one-hot CONTRACTION
        # reads the array once at full bandwidth; both a vmapped
        # dynamic_slice (a SEQUENTIAL B-iteration device loop) and an
        # elementwise take_along_axis gather (B*K scalar descriptors,
        # ~0.5 ms) measured far slower at B=1024 (r3_tpu.jsonl).
        gview = gamma_packed.reshape(gamma_packed.shape[0], B, K)
        sel = jax.nn.one_hot(offs, gamma_packed.shape[0], dtype=gview.dtype)
        gamma_at = jnp.einsum("wbk,bw->bk", gview, sel)
        return emit_stats, fb.trans_stats, gamma_at, fb.log_c

    log_pi, log_A = expected_log_params(params)
    ll = emission.expected_log_likelihood(params.emit, windows)
    fb = messages.e_step_batched(log_pi, log_A, ll, weights=maskf, method=method)
    gamma_w = fb.gamma * maskf[..., None]
    emit_stats = emission_flat_stats(emission, params.emit, gamma_w, windows)
    gamma_at = jnp.take_along_axis(
        fb.gamma, offs[:, None, None], axis=1
    )[:, 0, :]
    return emit_stats, fb.trans_stats, gamma_at, fb.log_c


def elbo_from_stats(
    params: HMMParams, prior: HMMParams, emission, log_z: jax.Array
) -> jax.Array:
    """ELBO = sum_seqs log Z~ - KL(q(theta) || p(theta)) (SURVEY.md §2.1)."""
    return log_z - global_kl(params, prior, emission)


def lower_bound(
    params: HMMParams, prior: HMMParams, emission, obs: jax.Array, method: str = "auto"
) -> jax.Array:
    """Exact full-data ELBO at the current global state (fresh local step).

    exact=True keeps alpha storage f32 on TPU (the gamma-free training
    default is bf16, whose rounding would leak into log Z — ADVICE r4)."""
    stats, _ = batch_local_step(
        params, emission, obs, method, need_gamma=False, exact=True
    )
    return elbo_from_stats(params, prior, emission, stats.log_z)


def decode(params: HMMParams, emission, obs: jax.Array) -> jax.Array:
    """Posterior-marginal state decode: argmax_k gamma_tk per sequence (B, T)."""
    _, gamma = batch_local_step(params, emission, obs)
    return jnp.argmax(gamma, axis=-1)


@f32_matmuls
def viterbi_decode(params: HMMParams, emission, obs: jax.Array) -> jax.Array:
    """MAP path under the variational-mean parameters (B, T)."""
    log_pi, log_A = expected_log_params(params)
    ll = emission.expected_log_likelihood(params.emit, obs)
    return jax.vmap(lambda l: messages.viterbi(log_pi, log_A, l))(ll)


@f32_matmuls
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


def _packed_emission_stats(
    emission, emit_params, gamma_packed, obs_tm, weights_tm=None, feats=None
):
    """Emission sufficient stats from PACKED time-major gamma (T, R, P*K).

    One dim-0 dot_general against lane-packed per-observation features —
    gamma is read in the pallas kernels' native layout (no re-layout copy)
    and the P diagonal (K, F) blocks of the (P*K, P*F) product are summed
    (cross-sequence blocks are discarded). Weights (kept-masks) multiply
    the FEATURE side, which is exactly gamma-weighting by linearity.

    feats: optional precomputed (T, B, F) f32 feature array shared with
    the likelihood matmul (see :func:`_pallas_packed_estep`); F is family-
    dependent (1+D+D^2 for GaussianNIW, 1+2D for DiagonalGaussianNIG). Its
    reshape to the lane-packed 2D form is a free bitcast.
    """
    from ..distributions.emissions import MultinomialDirichlet

    T, R, PK = gamma_packed.shape
    g2 = gamma_packed.reshape(T * R, PK)

    if emission is MultinomialDirichlet:
        from ..models.hmm import ONE_HOT_MAX_V

        V = emit_params.shape[-1]
        K = emit_params.shape[0]
        P = PK // K
        if V > ONE_HOT_MAX_V:
            # segment-sum: never materialize the (T*B, V) one-hot. Unpack
            # the lane-packed gamma to per-sequence rows first — at large V
            # that relayout is small next to the avoided one-hot.
            g_seq = gamma_packed.reshape(T, R, P, K).reshape(T * R * P, K)
            if weights_tm is not None:
                g_seq = g_seq * weights_tm.reshape(T * R * P)[:, None]
            y2 = obs_tm.reshape(T * R * P)
            return jnp.swapaxes(
                jax.ops.segment_sum(g_seq, y2, num_segments=V), 0, 1
            )
        feats = jax.nn.one_hot(obs_tm, V, dtype=g2.dtype)  # (T, B, V)
        if weights_tm is not None:
            feats = feats * weights_tm[..., None]
        f2 = feats.reshape(T * R, P * V)
        from ..messages.pallas_fb import kernel_precisions
        from ..utils.precision import xla_tier

        acc = jax.lax.dot_general(
            g2, f2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # one-shot sum on the stats tier: see the Gaussian branch below
            precision=xla_tier(kernel_precisions()[2]),
        )
        return sum(acc[p * K : (p + 1) * K, p * V : (p + 1) * V] for p in range(P))

    K = jax.tree.leaves(emit_params)[0].shape[0]
    P = PK // K
    if feats is None:
        feats = emission.ell_features(obs_tm)
    F = feats.shape[-1]
    if weights_tm is not None:
        feats = feats * weights_tm[..., None]
    f2 = feats.reshape(T * R, P * F)
    # NOT 1-pass bf16: the y (x) y second moments feed NIW posteriors
    # whose psi = eta3 - kappa m m^T must stay PSD, and a rho ~ 1 SVI
    # step amplifies the raw stats by dataset/minibatch scale — bf16's
    # ~4e-3 per-term rounding (NOT sign-symmetric on the positive
    # yy-diagonal) broke psi's PSD margin for weak states in real training
    # (NaN on the second SVI step at K=64/D=8, caught on-chip). Follows
    # the stats precision tier (default bf16x3 -> XLA-native 3-pass HIGH,
    # ~1000x margin above that failure; utils/precision.py).
    from ..messages.pallas_fb import kernel_precisions
    from ..utils.precision import xla_tier

    acc = jax.lax.dot_general(
        g2, f2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=xla_tier(kernel_precisions()[2]),
    )
    S = sum(acc[p * K : (p + 1) * K, p * F : (p + 1) * F] for p in range(P))
    return _unpack_emit_stats(emission, emit_params, S)
