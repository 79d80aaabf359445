"""Exact streaming E-step at the reference paper's flagship scale.

SUPERSEDED for new measurements by scripts/run_fused_scale.py (round 5:
the likelihood-fused tier reaches T=250M on one chip and adds streaming
decode + Bayes-floor phases); kept as the r4 artifact's runner.

Foti et al. 2014 §4 runs SVI-HMM on a T≈250M human-chromatin chain — a
regime where materializing anything T x K^2 (or running 250M sequential
steps) is impossible. Our answer is the streaming blocked path
(messages/blocked.py::forward_backward_blocked_stream via
engines/base.py::long_chain_local_stats): O(T K) peak memory, MXU-sized
work per block. This runner demonstrates it ON CHIP at T = 10M (default;
--T for other sizes), the largest K=64 shape that fits one v5e's HBM with
headroom, and cross-checks the same chain with buffered-subchain SVI (the
paper's estimator) decoded against ground truth.

Outputs one JSON line per phase:
  {"phase": "exact_stream", "T": ..., "log_z": ..., "wall_s": ...,
   "steps_per_s": ...}
  {"phase": "subchain_svi", "steps": ..., "hamming_head": ..., ...}

Usage: python scripts/run_longchain_scale.py [--T 10000000] [--svi-steps 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=10_000_000)
    ap.add_argument("--K", type=int, default=64)
    ap.add_argument("--obs-dim", type=int, default=8)
    # measured on chip at T=200k/K=64: S=128-256 is the plateau (~1.1M
    # steps/s); beyond S=512 the XLA-lowered within-block associative_scan
    # degrades sharply (S=1024: 24k steps/s) — bench_results/r4_tpu.jsonl
    ap.add_argument("--block-size", type=int, default=256)
    ap.add_argument("--svi-steps", type=int, default=300)
    ap.add_argument("--head", type=int, default=100_000,
                    help="decoded/quality-probe prefix length")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pysvihmm_tpu.data.synthetic import make_gaussian_params
    from pysvihmm_tpu.distributions import GaussianNIW
    from pysvihmm_tpu.engines import svi
    from pysvihmm_tpu.engines.base import decode, long_chain_local_stats
    from pysvihmm_tpu.eval.metrics import hamming_error
    from pysvihmm_tpu.models.hmm import init_params, make_prior

    T, K, D = args.T, args.K, args.obs_dim

    # Host-side chain generation (the config-5 runner's exact-sampling
    # trick: make_gaussian_params covariances are spherical cov_scale*I,
    # so vectorized NumPy sampling is exact and runs at memory speed).
    t0 = time.perf_counter()
    true_params = make_gaussian_params(
        jax.random.PRNGKey(args.seed), K, D, mean_scale=8.0, cov_scale=0.3
    )
    pi = np.asarray(true_params.pi, np.float64)
    A = np.asarray(true_params.A, np.float64)
    mu = np.asarray(true_params.theta[0], np.float32)
    sd = float(np.sqrt(np.asarray(true_params.theta[1])[0, 0, 0]))
    A_cum = np.cumsum(A, axis=1)
    rng = np.random.default_rng(args.seed + 1)
    z = np.empty((T,), np.int32)
    z[0] = rng.choice(K, p=pi / pi.sum())
    # blockwise state rollout: inverse-CDF per step, vectorized over a
    # block's uniforms but sequential across steps (the chain dependency);
    # ~40 s for T=10M on this host
    u = rng.random(T - 1)
    for t in range(1, T):
        z[t] = int(np.searchsorted(A_cum[z[t - 1]], u[t - 1], side="right"))
    obs_np = mu[z] + sd * rng.standard_normal((T, D)).astype(np.float32)
    gen_wall = time.perf_counter() - t0

    chain = jnp.asarray(obs_np)
    prior = make_prior(K, GaussianNIW, obs_dim=D)
    p0 = init_params(jax.random.PRNGKey(args.seed + 2), prior, GaussianNIW,
                     chain[: args.head])

    # --- exact streaming E-step, jitted, completion forced by device_get
    exact_fn = jax.jit(
        lambda p, c: long_chain_local_stats(
            p, GaussianNIW, c, block_size=args.block_size
        )
    )
    float(exact_fn(p0, chain).log_z)  # compile + run
    t0 = time.perf_counter()
    stats = exact_fn(p0, chain)
    log_z = float(stats.log_z)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "phase": "exact_stream", "T": T, "K": K, "D": D,
        "block_size": args.block_size, "log_z": log_z,
        "wall_s": round(wall, 3), "steps_per_s": round(T / wall, 1),
        "gen_wall_s": round(gen_wall, 1),
        "hbm_gb_est": round(3 * T * K * 4 / 1e9 + T * D * 4 / 1e9, 2),
    }), flush=True)
    assert np.isfinite(log_z)

    # --- the paper's estimator on the same chain: buffered-subchain SVI
    cfg = svi.SVIConfig(batch_size=256, subchain_len=50, buffer=10,
                        tau=10.0, kappa=0.6)
    state = svi.init_state(p0, jax.random.PRNGKey(args.seed + 3))
    t0 = time.perf_counter()
    state, metrics = svi.fit(state, prior, chain, GaussianNIW, cfg,
                             num_steps=args.svi_steps)
    ne = np.asarray(metrics["noisy_elbo"])
    svi_wall = time.perf_counter() - t0
    z_hat = np.asarray(decode(state.params, GaussianNIW,
                              chain[None, : args.head]))[0]
    ham = hamming_error(z_hat, z[: args.head], K)
    print(json.dumps({
        "phase": "subchain_svi", "T": T, "steps": args.svi_steps,
        "B": cfg.batch_size, "L": cfg.subchain_len, "buffer": cfg.buffer,
        "wall_s": round(svi_wall, 1),
        "noisy_elbo_last20": float(ne[-20:].mean()),
        "hamming_head": ham, "head": args.head,
    }), flush=True)


if __name__ == "__main__":
    main()
