import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
from jax import lax
sys.path.insert(0, "/root/repo")
from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset
from pysvihmm_tpu.distributions import GaussianNIW
from pysvihmm_tpu.engines.base import batch_local_step
from pysvihmm_tpu.models.hmm import init_params, make_prior

K, D, T, B, ITERS = 64, 8, 1000, 1024, 10
METHOD = sys.argv[1] if len(sys.argv) > 1 else "pallas_fused"
obs, _, _ = gen_gaussian_dataset(jax.random.PRNGKey(0), K, D, B, T)
obs = obs.astype(jnp.float32)
prior = make_prior(K, GaussianNIW, obs_dim=D)
params = init_params(jax.random.PRNGKey(1), prior, GaussianNIW, obs)

@jax.jit
def run_n(params_, obs_, n_zero):
    def estep_chained(carry, _):
        p_var = jax.tree.map(lambda x: x + carry * 1e-30, params_)
        stats, gamma = batch_local_step(p_var, GaussianNIW, obs_, METHOD, need_gamma=False)
        tot = stats.log_z + stats.trans.sum() + stats.init.sum()
        tot = tot + sum(jnp.sum(leaf) for leaf in jax.tree.leaves(stats.emit))
        return tot * 0.0 + carry, tot
    _, tots = lax.scan(estep_chained, n_zero, None, length=ITERS)
    return tots[-1]

txt = run_n.lower(params, obs, jnp.zeros(())).compile().as_text()
open("/tmp/estep_hlo.txt", "w").write(txt)
print("bytes:", len(txt))
