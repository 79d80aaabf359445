"""Autotune harness for the Pallas fused FB kernel (messages/pallas_fb.py).

Times the FB kernel alone (not the full E-step) at K=64, T=1k across
(batch_tile, time_tile) candidates, against the vmapped-scan FB, using the
chained-`lax.scan` methodology from bench.py (the axon relay's
block_until_ready does not wait; per-dispatch latency ~3.5 ms).

Usage:  python scripts/bench_pallas_tune.py [B] [tile_b,C ...]
        python scripts/bench_pallas_tune.py 1024 512,8 1024,8 256,24
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pysvihmm_tpu import messages
    from pysvihmm_tpu.messages.pallas_fb import pallas_forward_backward_batched

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cands = []
    for a in sys.argv[2:]:
        tb, c = a.split(",")
        cands.append((int(tb), int(c)))
    if not cands:
        cands = [None, (512, 8), (1024, 8), (1024, 16), (256, 8)]

    T, K = 1000, 64
    key = jax.random.PRNGKey(0)
    ll = jax.random.normal(key, (B, T, K), jnp.float32)
    lp = jnp.log(jnp.full((K,), 1.0 / K))
    lA = jnp.log(jax.random.dirichlet(jax.random.PRNGKey(1), jnp.ones(K), (K,)))

    iters = 20

    def timed(fb_fn, label):
        def consume(fb):
            if os.environ.get("FWD_ONLY"):
                # deliberately let XLA DCE the backward kernel
                return fb.log_z.sum()
            # touch EVERY output so XLA cannot dead-code-eliminate the
            # backward pass / stats (cheap reductions only)
            tot = fb.log_z.sum() + fb.trans_stats.sum() + fb.init_stats.sum()
            tot = tot + fb.gamma[:, 0, :].sum() + fb.gamma[:, -1, :].sum()
            if fb.log_c is not None:
                tot = tot + fb.log_c.sum()
            return tot

        @jax.jit
        def run(z, ll_):
            # ll_ passed as a jit ARGUMENT: closure constants ship inside
            # the relay's compile request (HTTP 413 at B >= 2048) and
            # constant-fold pathologically slowly
            def chained(carry, _):
                fb = fb_fn(lp, lA, ll_ + carry * 1e-30)
                tot = consume(fb)
                return carry + tot * 0.0, tot

            _, out = lax.scan(chained, z, None, length=iters)
            return out[-1]

        z = jnp.zeros(())
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(z, ll)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(z, ll)))
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{label:18s} {B/dt:>12.0f} seq/s   {dt*1e3:8.2f} ms/it   "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )

    def scan_fb(lp_, lA_, ll_):
        return jax.vmap(lambda l: messages.e_step(lp_, lA_, l, method="scan"))(ll_)

    import os

    if not os.environ.get("SKIP_SCAN"):
        timed(scan_fb, "scan")
    for tiles in cands:
        label = f"pallas {tiles}" if tiles else "pallas auto"
        try:
            timed(
                lambda lp_, lA_, ll_, t=tiles: pallas_forward_backward_batched(
                    lp_, lA_, ll_, tiles=t
                ),
                label,
            )
        except Exception as e:  # noqa: BLE001 — report and keep tuning
            print(f"{label:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
