"""Experiment runner (reference L4: per-engine experiment scripts, SURVEY.md
§1/§4): generate-or-load data, run a configured engine, log structured
metrics, optionally checkpoint.

With --pred-ll-every N (the reference paper's pred-LL-vs-wall-clock
figures), the last --holdout-seqs sequences are held out of training and
the fit runs in N-iteration segments; after each segment the runner logs
cumulative TRAINING wall-clock (eval time excluded) and the held-out
predictive log-likelihood per observation, for every VB engine.

Examples:
  python scripts/run_experiment.py --engine batch_vb --K 4 --num-iters 50
  python scripts/run_experiment.py --engine svi --K 16 --svi-batch-size 32 \
      --svi-subchain-len 50 --num-iters 2000 --log-every 100 \
      --pred-ll-every 100
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pysvihmm_tpu.config import parse_config
from pysvihmm_tpu.data.synthetic import (
    gen_diag_gaussian_dataset,
    gen_gaussian_dataset,
    gen_multinomial_dataset,
    gen_poisson_dataset,
)
from pysvihmm_tpu.engines import batch_sgd, batch_vb, gibbs, metaobs, svi
from pysvihmm_tpu.engines.base import decode, lower_bound, predictive_log_likelihood
from pysvihmm_tpu.eval.metrics import hamming_error
from pysvihmm_tpu.models.hmm import init_params, make_prior, resolve_emission
from pysvihmm_tpu.utils import checkpoint
from pysvihmm_tpu.utils.logging import MetricsLogger


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.run.debug_nans:
        jax.config.update("jax_debug_nans", True)
    key = jax.random.PRNGKey(cfg.run.seed)
    log = MetricsLogger(cfg.run.log_path or None)

    emission = resolve_emission(cfg.model.emission)  # raises on unknown names
    if cfg.model.emission == "gaussian":
        obs, z_true, _ = gen_gaussian_dataset(
            key, cfg.model.K, cfg.model.obs_dim, num_seqs=64, T=500,
            mean_scale=6.0, cov_scale=0.3,
        )
        size_kw = dict(obs_dim=cfg.model.obs_dim)
    elif cfg.model.emission == "diag_gaussian":
        obs, z_true, _ = gen_diag_gaussian_dataset(
            key, cfg.model.K, cfg.model.obs_dim, num_seqs=64, T=500,
            mean_scale=6.0, var_scale=0.3,
        )
        size_kw = dict(obs_dim=cfg.model.obs_dim)
    elif cfg.model.emission == "poisson":
        obs, z_true, _ = gen_poisson_dataset(
            key, cfg.model.K, cfg.model.obs_dim, num_seqs=64, T=500,
            rate_scale=25.0,
        )
        size_kw = dict(obs_dim=cfg.model.obs_dim)
    else:
        obs, z_true, _ = gen_multinomial_dataset(
            key, cfg.model.K, cfg.model.num_symbols, num_seqs=64, T=500
        )
        size_kw = dict(num_symbols=cfg.model.num_symbols)
    prior = make_prior(cfg.model.K, emission, alpha_init=cfg.model.alpha_init,
                       alpha_tran=cfg.model.alpha_tran, **size_kw)

    # Held-out split: same gen_*_dataset call (same true params), last
    # sequences held out — a fresh gen call would draw DIFFERENT true params
    # and make the held-out score meaningless.
    track_pred = cfg.run.pred_ll_every > 0 and cfg.run.engine != "gibbs"
    if track_pred:
        h = max(1, cfg.run.holdout_seqs)
        held, obs, z_true = obs[-h:], obs[:-h], z_true[:-h]
        n_held_obs = int(np.prod(held.shape[:2]))
    else:
        held = None

    params = init_params(jax.random.PRNGKey(cfg.run.seed + 1), prior, emission, obs)

    def eval_pred(p):
        return float(predictive_log_likelihood(p, emission, held)) / n_held_obs

    # segment boundaries: with pred-LL tracking, run the compiled fit in
    # --pred-ll-every chunks (schedule state rides in the engine state);
    # without it, one uninterrupted fit.
    seg = cfg.run.pred_ll_every if track_pred else cfg.run.num_iters
    train_wall = 0.0
    t_start = time.perf_counter()

    if cfg.run.engine in ("batch_vb", "batch_sgd"):
        elbos_all = []
        state = batch_sgd.init_state(params)
        done = 0
        while done < cfg.run.num_iters:
            n = min(seg, cfg.run.num_iters - done)
            t0 = time.perf_counter()
            if cfg.run.engine == "batch_vb":
                params, elbos = batch_vb.fit(params, prior, obs, emission,
                                             num_iters=n, method=cfg.run.method)
            else:
                state, elbos = batch_sgd.fit_state(state, prior, obs, emission,
                                                   num_iters=n,
                                                   tau=cfg.svi.tau, kappa=cfg.svi.kappa,
                                                   method=cfg.run.method)
                params = state.params
            jax.block_until_ready(elbos)
            train_wall += time.perf_counter() - t0
            elbos_all.append(np.asarray(elbos))
            done += n
            if track_pred:
                log.write(step=done, wall_s=train_wall, pred_ll=eval_pred(params))
        for i, e in enumerate(np.concatenate(elbos_all)):
            if i % cfg.run.log_every == 0:
                log.write(step=i, elbo=float(e))
    elif cfg.run.engine in ("svi", "metaobs"):
        chain = obs.reshape(-1, *obs.shape[2:])  # concatenate into one chain
        state = svi.init_state(params, jax.random.PRNGKey(cfg.run.seed + 2))
        if cfg.run.engine == "svi":
            c = svi.SVIConfig(batch_size=cfg.svi.batch_size,
                              subchain_len=cfg.svi.subchain_len,
                              buffer=cfg.svi.buffer, tau=cfg.svi.tau,
                              kappa=cfg.svi.kappa)
            fit_fn = lambda st, n: svi.fit(st, prior, chain, emission, c, n,
                                           cfg.run.method)
        else:
            c = metaobs.MetaObsConfig(minibatch=cfg.svi.batch_size,
                                      block_len=cfg.svi.subchain_len,
                                      buffer=cfg.svi.buffer, tau=cfg.svi.tau,
                                      kappa=cfg.svi.kappa)
            fit_fn = lambda st, n: metaobs.fit(st, prior, chain, emission, c, n,
                                               cfg.run.method)
        ne_all = []
        done = 0
        while done < cfg.run.num_iters:
            n = min(seg, cfg.run.num_iters - done)
            t0 = time.perf_counter()
            state, metrics = fit_fn(state, n)
            jax.block_until_ready(metrics["noisy_elbo"])
            train_wall += time.perf_counter() - t0
            ne_all.append(np.asarray(metrics["noisy_elbo"]))
            done += n
            if track_pred:
                log.write(step=done, wall_s=train_wall,
                          pred_ll=eval_pred(state.params))
        params = state.params
        ne = np.concatenate(ne_all)
        for i in range(0, len(ne), cfg.run.log_every):
            log.write(step=i, noisy_elbo=float(ne[i]))
        if cfg.run.checkpoint_dir:
            checkpoint.save_step(cfg.run.checkpoint_dir, int(state.step), state)
    elif cfg.run.engine == "gibbs":
        state = gibbs.init_state(jax.random.PRNGKey(cfg.run.seed + 2), prior,
                                 emission, obs, cfg.model.K)
        state, metrics = gibbs.run(state, prior, obs, emission, cfg.model.K,
                                   cfg.run.num_iters)
        mll = np.asarray(metrics["marginal_loglik"])
        for i in range(0, len(mll), cfg.run.log_every):
            log.write(step=i, marginal_loglik=float(mll[i]))
    else:
        raise SystemExit(f"unknown engine {cfg.run.engine}")

    wall = time.perf_counter() - t_start
    if cfg.run.engine == "gibbs":
        z_hat = np.asarray(state.z)
    else:
        z_hat = np.asarray(decode(params, emission, obs))
    err = hamming_error(z_hat.reshape(-1), np.asarray(z_true).reshape(-1), cfg.model.K)
    final_elbo = float(lower_bound(params, prior, emission, obs)) if cfg.run.engine != "gibbs" else None
    final_pred = eval_pred(params) if track_pred else None
    log.write(event="done", wall_s=wall, train_wall_s=train_wall, hamming=err,
              final_elbo=final_elbo, final_pred_ll=final_pred)


if __name__ == "__main__":
    main()
