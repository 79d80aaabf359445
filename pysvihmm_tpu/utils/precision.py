"""Matmul precision policy for inference numerics.

On TPU, JAX's default matmul precision lowers f32 matmuls/einsums to a
single bf16 MXU pass (~8 mantissa bits). That is fine for neural-net
training but NOT for variational inference message passing: at BASELINE
config 1 (K=4, D=2, 100 x T=200 batch VB) the default precision diverged
the coordinate-ascent ELBO trajectory by 6e-2 relative from the float64
oracle (it converged to a different optimum), vs 2e-5 under f32 precision
(scripts/bench_convergence.py measures this).

Policy (each tier measured at the production E-step K=64/T=1k/B=1024):

  * ERROR-COMPOUNDING ops — the T-step chain recursions (scan/assoc/
    blocked FB, Viterbi, and the Pallas kernels' chain dots) and the
    cancellation-prone emission quadratic forms: full f32. The engine
    entry points get this via the `f32_matmuls` decorator
    ("float32" = 6 bf16 passes); the Pallas kernels set
    `precision=HIGHEST` explicitly. These ops are latency-bound, so the
    extra passes cost ~5%, not the matmul-bound ~2-3x.
  * ONE-SHOT bulk contractions — the packed emission sufficient-stat
    sums over ~1e6 (t, b) terms: explicit `Precision.DEFAULT` (1 bf16
    pass). Per-term rounding (~4e-3 relative) is sign-symmetric across
    independent terms, so the f32-accumulated SUM carries ~4e-3/sqrt(N)
    ~ 1e-5 relative error — far below SVI's Monte-Carlo noise — while
    running at full MXU throughput. Measured: f32 stats cost ~15% of
    the whole E-step; DEFAULT costs ~0.
  * The expected-log-likelihood einsum feeding the FB chain runs at
    "high" (3 passes, ~5e-7 relative): its error is injected once per
    (t, k) but multiplies through exp() into the chain, so 1-pass bf16
    (4e-3 x |L| ~ 0.1 absolute in log space) is unacceptable, while
    6-pass buys nothing over 3-pass there.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Trace ``fn`` under full-f32 ("float32", 6-pass) matmul precision.

    Composes with `jax.jit` (apply below the jit decorator: the context
    governs the ops traced inside). Explicit per-op `precision=` arguments
    and inner `bulk_precision()` contexts still win where set.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper


def bulk_precision():
    """Context for throughput-bound one-shot contractions: 3-pass "high".

    Use around ops whose rounding does not compound (likelihood forms at
    production scale); see the module docstring for the error analysis.
    """
    return jax.default_matmul_precision("high")
