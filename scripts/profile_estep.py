"""Profile the full production E-step at the benchmark shape on TPU.

Dumps a jax.profiler trace and prints the top device ops by total duration
parsed out of the trace (XLA op names; pallas custom-calls show as
tpu_custom_call / mosaic ops, layout changes as copy.N / transpose).
"""
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset
from pysvihmm_tpu.distributions import GaussianNIW
from pysvihmm_tpu.engines.base import batch_local_step
from pysvihmm_tpu.models.hmm import init_params, make_prior

K, D, T, B, ITERS = 64, 8, 1000, 1024, 10
METHOD = sys.argv[1] if len(sys.argv) > 1 else "pallas_fused"
NEED_GAMMA = "--gamma" in sys.argv

obs, _, _ = gen_gaussian_dataset(jax.random.PRNGKey(0), K, D, B, T)
obs = obs.astype(jnp.float32)
prior = make_prior(K, GaussianNIW, obs_dim=D)
params = init_params(jax.random.PRNGKey(1), prior, GaussianNIW, obs)

@jax.jit
def run_n(params_, obs_, n_zero):
    def estep_chained(carry, _):
        # thread the carry into EVERY param group or XLA hoists the
        # loop-invariant likelihood matmul out of the measured loop
        p_var = jax.tree.map(lambda x: x + carry * 1e-30, params_)
        stats, gamma = batch_local_step(p_var, GaussianNIW, obs_, METHOD, need_gamma=NEED_GAMMA)
        tot = stats.log_z + stats.trans.sum() + stats.init.sum()
        tot = tot + sum(jnp.sum(leaf) for leaf in jax.tree.leaves(stats.emit))
        return tot * 0.0 + carry, tot

    _, tots = lax.scan(estep_chained, n_zero, None, length=ITERS)
    return tots[-1]

zero = jnp.zeros(())
np.asarray(jax.device_get(run_n(params, obs, zero)))  # compile + warm

tracedir = "/tmp/estep_trace"
os.system(f"rm -rf {tracedir}")
with jax.profiler.trace(tracedir):
    np.asarray(jax.device_get(run_n(params, obs, zero)))

# parse the trace: sum durations per op name on device-side tracks
paths = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
print("trace files:", paths)
ev_by_name = {}
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        ev_by_name.setdefault(name, [0, 0])
        ev_by_name[name][0] += dur
        ev_by_name[name][1] += 1
top = sorted(ev_by_name.items(), key=lambda kv: -kv[1][0])[:40]
for name, (dur, cnt) in top:
    print(f"{dur/1000:10.2f} ms  x{cnt:5d}  {name[:110]}")
