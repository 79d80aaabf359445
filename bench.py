"""Benchmark: E-step throughput, sequences/sec/chip at K=64, T=1k.

The BASELINE.json primary metric. Measures the full local E-step — expected
emission log-likelihoods + forward-backward + expected sufficient stats —
batched over sequences on one chip, steady-state, and compares against the
NumPy float64 oracle (the reference stand-in: pysvihmm itself is a NumPy/
Cython single-machine library with no published numbers — BASELINE.md).

Timing methodology (important on the axon-relay TPU backend):
  * `block_until_ready` does NOT wait on this backend and per-dispatch
    latency is ~3.5 ms, so iterations run INSIDE one jitted `lax.scan`
    (with a data dependency threaded between iterations to keep them
    sequential) and completion is forced with a device-to-host transfer.

Prints ONE JSON line:
  {"metric": "estep_seqs_per_sec_per_chip_K64_T1k", "value": N,
   "unit": "seq/s", "vs_baseline": N}
vs_baseline = speedup over the NumPy float64 oracle on this host.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

K, D, T = 64, 8, 1000


def bench_jax(batch=1024, iters=20, method="scan", family="gaussian"):
    import os

    # persistent compile cache: Mosaic/XLA compiles through the axon relay
    # take minutes; warm runs (same shapes) start in seconds
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pysvihmm_tpu.data.synthetic import (
        gen_diag_gaussian_dataset,
        gen_gaussian_dataset,
    )
    from pysvihmm_tpu.engines.base import batch_local_step
    from pysvihmm_tpu.models.hmm import init_params, make_prior, resolve_emission

    emission = resolve_emission(family)
    gen = gen_diag_gaussian_dataset if family == "diag_gaussian" else gen_gaussian_dataset
    obs, _, _ = gen(jax.random.PRNGKey(0), K, D, batch, T)
    obs = obs.astype(jnp.float32)
    prior = make_prior(K, emission, obs_dim=D)
    params = init_params(jax.random.PRNGKey(1), prior, emission, obs)

    @jax.jit
    def run_n(params_, obs_, n_zero):
        # obs/params passed as jit ARGUMENTS (closure constants ship to the
        # compile server and constant-fold pathologically slowly)
        def estep_chained(carry, _):
            # thread a negligible data dependency so iterations serialize.
            # The dependency must reach EVERY parameter group — emission
            # params included — or XLA hoists the loop-invariant expected-
            # log-likelihood matmul out of the loop and the benchmark
            # silently measures an E-step with free likelihoods (training
            # recomputes them every step: the M-step moves the params).
            p_var = jax.tree.map(lambda x: x + carry * 1e-30, params_)
            # need_gamma=False: training steps consume only the stats; on
            # the fully-fused path this skips materializing gamma entirely
            stats, gamma = batch_local_step(
                p_var, emission, obs_, method, need_gamma=False
            )
            # consume EVERY stat (cheap reductions) so XLA cannot dead-
            # code-eliminate the backward pass, the pairwise stats, or the
            # emission stats — this times the full production E-step.
            # init_stats IS gamma[:, 0] (backward-pass-dependent), so gamma
            # itself need not be consumed: training loops don't read the
            # unpacked gamma either (emission stats consume it packed), and
            # consuming it here would bill an XLA transpose no training
            # step pays.
            tot = stats.log_z + stats.trans.sum() + stats.init.sum()
            tot = tot + sum(jnp.sum(leaf) for leaf in jax.tree.leaves(stats.emit))
            return tot * 0.0 + carry, tot

        final, tots = lax.scan(estep_chained, n_zero, None, length=iters)
        return tots[-1]

    def sync(x):
        return np.asarray(jax.device_get(x))

    zero = jnp.zeros(())
    sync(run_n(params, obs, zero))  # compile + warmup
    t0 = time.perf_counter()
    sync(run_n(params, obs, zero))
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def bench_oracle(n_seq=2):
    """float64 oracle throughput (reference stand-in): uses the C
    forward-backward extension when built (the reference's own fast path
    is Cython — SURVEY.md §2.2 — so the C-ext number is the STRONG
    baseline: ~44 vs ~24 seq/s numpy-only at this shape, BASELINE.md),
    falling back to the pure-NumPy loop."""
    from pysvihmm_tpu.oracle import numpy_ref as oracle

    fb = oracle.forward_backward_fast if oracle.HAVE_C_EXT else oracle.forward_backward
    rng = np.random.default_rng(0)
    log_pi = np.log(rng.dirichlet(np.ones(K)))
    log_A = np.log(rng.dirichlet(np.ones(K), size=K))
    mean = rng.normal(size=(K, D))
    kappa = np.full(K, 2.0)
    nu = np.full(K, D + 2.0)
    psi = np.tile(np.eye(D), (K, 1, 1))
    y = rng.normal(size=(T, D))

    t0 = time.perf_counter()
    for _ in range(n_seq):
        ll = oracle.niw_expected_log_likelihood(mean, kappa, nu, psi, y)
        fb(log_pi, log_A, ll)
    dt = (time.perf_counter() - t0) / n_seq
    return 1.0 / dt, dt


def main():
    method = sys.argv[1] if len(sys.argv) > 1 else "auto"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    jax_sps, jax_dt = bench_jax(batch=batch, method=method)
    orc_sps, orc_dt = bench_oracle()
    result = {
        "metric": "estep_seqs_per_sec_per_chip_K64_T1k",
        "value": round(jax_sps, 2),
        "unit": "seq/s",
        "vs_baseline": round(jax_sps / orc_sps, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
