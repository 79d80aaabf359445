"""Benchmark the FULL windowed-SVI production step on the real chip.

VERDICT r1 item 1 evidence: the flagship `engines/svi.make_step` update —
sample starts -> gather windows -> buffered (padded) fused-kernel local
step -> scaled natural-gradient global step — must run the Pallas kernels
on TPU (plan_window pads W=70 -> 72) and land near the batched E-step's
measured per-obs throughput.

Usage: python scripts/bench_svi_step.py [B ...] [--chain-len N] [--steps N]
Defaults: B in (32, 256, 1024), L=50, b=10 (the default SVIConfig, W
pads to 72), T=100_000, 50 chained steps per timing.

Prints one JSON line per B: steps/s, window-observations/s (B*W*steps/s),
and the resolved method/W so the kernel path is visible in the artifact.
Same honest timing protocol as bench.py: steps chained inside one jitted
lax.scan via the device-side state, completion forced by device_get.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)

import numpy as np


def bench_svi(B, T, L, b, steps):
    import jax
    import jax.numpy as jnp

    from pysvihmm_tpu import messages
    from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset
    from pysvihmm_tpu.distributions import GaussianNIW
    from pysvihmm_tpu.engines import svi
    from pysvihmm_tpu.models.hmm import init_params, make_prior

    K, D = 64, 8
    obs, _, _ = gen_gaussian_dataset(jax.random.PRNGKey(0), K, D, 1, T)
    chain = obs[0].astype(jnp.float32)
    prior = make_prior(K, GaussianNIW, obs_dim=D)
    params = init_params(jax.random.PRNGKey(1), prior, GaussianNIW, chain[None])

    cfg = svi.SVIConfig(batch_size=B, subchain_len=L, buffer=b)
    method, W, _ = messages.plan_window("auto", L, b, T)
    state0 = svi.init_state(params, jax.random.PRNGKey(2))

    def run(st):
        final, metrics = svi.fit(st, prior, chain, GaussianNIW, cfg, steps)
        return final, metrics

    run_j = jax.jit(run)

    def sync(x):
        return np.asarray(jax.device_get(x))

    final, metrics = run_j(state0)
    sync(metrics["noisy_elbo"])  # compile + warmup
    t0 = time.perf_counter()
    final, metrics = run_j(state0)
    sync(metrics["noisy_elbo"])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(sync(metrics["noisy_elbo"])).all()
    return {
        "bench": "svi_step_K64",
        "B": B,
        "W": W,
        "method": method,
        "steps_per_s": round(1.0 / dt, 1),
        "window_obs_per_s": round(B * W / dt, 1),
        "ms_per_step": round(dt * 1e3, 3),
    }


def main():
    args = sys.argv[1:]
    T, L, b, steps = 100_000, 50, 10, 50
    if "--chain-len" in args:
        i = args.index("--chain-len")
        T = int(args[i + 1])
        del args[i : i + 2]
    if "--steps" in args:
        i = args.index("--steps")
        steps = int(args[i + 1])
        del args[i : i + 2]
    batches = [int(a) for a in args] or [32, 256, 1024]
    for B in batches:
        print(json.dumps(bench_svi(B, T, L, b, steps)), flush=True)


if __name__ == "__main__":
    main()
