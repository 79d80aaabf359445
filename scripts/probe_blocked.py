"""Probe: where do config 4's 74.5s go? Times compile vs steady-state of the
exact blocked E-step at T=100k (and optionally longer chains).

Usage: python scripts/probe_blocked.py [T] [reps]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import os

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import jax
    import numpy as np

    from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset
    from pysvihmm_tpu.distributions import GaussianNIW
    from pysvihmm_tpu.engines.base import batch_local_step
    from pysvihmm_tpu.models.hmm import init_params, make_prior

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    K, D = 64, 8

    t0 = time.perf_counter()
    obs, z, _ = gen_gaussian_dataset(
        jax.random.PRNGKey(8), K, D, 1, T, mean_scale=8.0, cov_scale=0.3
    )
    chain = obs[0]
    prior = make_prior(K, GaussianNIW, obs_dim=D)
    p0 = init_params(jax.random.PRNGKey(9), prior, GaussianNIW, chain)
    jax.block_until_ready(jax.tree.leaves(p0))
    print(f"gen+init: {time.perf_counter() - t0:.2f}s", flush=True)

    for i in range(reps):
        t0 = time.perf_counter()
        stats, _ = batch_local_step(p0, GaussianNIW, chain[None], method="blocked")
        lz = float(stats.log_z)  # device sync
        dt = time.perf_counter() - t0
        print(f"call {i}: {dt:.3f}s  logz={lz:.1f}", flush=True)
    print(f"T={T} done; last-call wall is the steady-state number")


if __name__ == "__main__":
    main()
