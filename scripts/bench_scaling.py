"""Data-parallel scaling-efficiency benchmark (BASELINE: ">=80% seq/s
efficiency 1 host -> N hosts").

On a real pod slice this runs over the global mesh; here it can also run on
the virtual CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) to validate that the
sharded E-step's collective structure scales — the same code path the
driver's dryrun and a real multi-host job execute.

Prints one JSON line per mesh size with seq/s and efficiency vs 1 device.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset
    from pysvihmm_tpu.distributions import GaussianNIW
    from pysvihmm_tpu.models.hmm import init_params, make_prior
    from pysvihmm_tpu.parallel import make_dp_vb_step, make_mesh, shard_batch

    K, D, T = int(sys.argv[1]) if len(sys.argv) > 1 else 16, 4, 500
    per_dev = 64
    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, len(devices)) if n <= len(devices)]
    sizes = sorted(set(sizes))

    def sync(x):
        return np.asarray(jax.device_get(x))

    base = None
    for n in sizes:
        B = per_dev * n
        obs, _, _ = gen_gaussian_dataset(jax.random.PRNGKey(0), K, D, B, T)
        prior = make_prior(K, GaussianNIW, obs_dim=D)
        params = init_params(jax.random.PRNGKey(1), prior, GaussianNIW, obs)
        mesh = make_mesh(n, devices=devices)
        step = make_dp_vb_step(GaussianNIW, mesh)
        obs_s = shard_batch(obs, mesh)
        p, e = step(params, prior, obs_s)
        sync(e)  # compile
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            p, e = step(p, prior, obs_s)
        sync(e)
        dt = (time.perf_counter() - t0) / iters
        sps = B / dt
        if base is None:
            base = sps
        eff = sps / (base * n)
        print(json.dumps({
            "devices": n, "seqs_per_sec": round(sps, 1),
            "scaling_efficiency": round(eff, 3),
        }))


def main_time():
    """Time-parallel scaling: ONE long chain, sequential depth T/devices.

    Strong scaling — the chain is fixed; more devices shorten the serial
    chain. Efficiency here is wall-clock speedup / devices. NOTE: on the
    virtual CPU mesh the "devices" timeshare the same physical cores, so
    the serial-chain shortening cannot show up as wall-clock speedup —
    run on a real slice for meaningful numbers; here it validates the
    collective structure only.
    """
    import jax
    import jax.numpy as jnp

    from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset
    from pysvihmm_tpu.distributions import GaussianNIW
    from pysvihmm_tpu.models.hmm import init_params, make_prior
    from pysvihmm_tpu.parallel import make_time_mesh, make_ts_vb_step, shard_chain

    K, D, T = 16, 4, 32_768
    devices = jax.devices()
    sizes = sorted({n for n in (1, 2, 4, 8, len(devices)) if n <= len(devices)})
    obs, _, _ = gen_gaussian_dataset(jax.random.PRNGKey(0), K, D, 1, T)
    prior = make_prior(K, GaussianNIW, obs_dim=D)
    params = init_params(jax.random.PRNGKey(1), prior, GaussianNIW, obs)

    def sync(x):
        return np.asarray(jax.device_get(x))

    base = None
    for n in sizes:
        mesh = make_time_mesh(n, devices=devices)
        step = make_ts_vb_step(GaussianNIW, mesh)
        chain = shard_chain(obs[0], mesh)
        p, e = step(params, prior, chain)
        sync(e)  # compile
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            p, e = step(p, prior, chain)
        sync(e)
        dt = (time.perf_counter() - t0) / iters
        if base is None:
            base = dt
        print(json.dumps({
            "mode": "time", "devices": n, "sec_per_vb_iter": round(dt, 4),
            "speedup": round(base / dt, 3),
            "scaling_efficiency": round(base / dt / n, 3),
        }))


if __name__ == "__main__":
    if "--time" in sys.argv:
        sys.argv.remove("--time")
        main_time()
    else:
        main()
