"""Decompose fused-FB time: fwd kernel only vs bwd kernel only vs full.

Usage: python scripts/debug_pallas_split.py [B] [tile_b] [C]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pysvihmm_tpu.messages.pallas_fb import _bwd_kernel, _fwd_kernel

    def _fwd_nos(pi_ref, A_ref, lik_ref, alpha_ref, carry, *, C):
        """fwd variant: alpha only, no per-step scale output, no normalize."""
        j = pl.program_id(1)

        def raw_step(a_prev, lik_t):
            return (
                jnp.dot(a_prev, A_ref[:, :], preferred_element_type=jnp.float32)
                * lik_t
            )

        a = jnp.where(
            j == 0,
            pi_ref[0, :][None, :] * lik_ref[0],
            raw_step(carry[:, :], lik_ref[0]),
        )
        alpha_ref[0] = a
        for p in range(1, C):
            if p % 4 == 0:
                a = a / jnp.sum(a, axis=-1, keepdims=True)
            a = raw_step(a, lik_ref[p])
            alpha_ref[p] = a
        carry[:, :] = a / jnp.sum(a, axis=-1, keepdims=True)

    def _fwd_stack(pi_ref, A_ref, lik_ref, alpha_ref, s_ref, carry, *, C):
        """fwd variant: scale sums stacked once at tile end."""
        j = pl.program_id(1)

        def raw_step(a_prev, lik_t):
            return (
                jnp.dot(a_prev, A_ref[:, :], preferred_element_type=jnp.float32)
                * lik_t
            )

        a = jnp.where(
            j == 0,
            pi_ref[0, :][None, :] * lik_ref[0],
            raw_step(carry[:, :], lik_ref[0]),
        )
        alpha_ref[0] = a
        ss = [jnp.sum(a, axis=-1)]
        for p in range(1, C):
            if p % 4 == 0:
                a = a / ss[-1][:, None]
            a = raw_step(a, lik_ref[p])
            alpha_ref[p] = a
            ss.append(jnp.sum(a, axis=-1))
        s_ref[:, :] = jnp.stack(ss, axis=0)
        carry[:, :] = a / ss[-1][:, None]

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tile_b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    T = 1000
    K = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    nB, nT = B // tile_b, T // C

    key = jax.random.PRNGKey(0)
    lik = jax.random.uniform(key, (T, B, K), jnp.float32, 0.01, 1.0)
    pi = jnp.full((1, K), 1.0 / K)
    A = jax.random.dirichlet(jax.random.PRNGKey(1), jnp.ones(K), (K,)).astype(
        jnp.float32
    )
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, m=4 if C % 4 == 0 else 1),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((1, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, K), jnp.float32),
            jax.ShapeDtypeStruct((T, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, K), jnp.float32)],
        compiler_params=cp,
    )

    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (C, tile_b, K), lambda i, j: (nT - 1 - j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (C, tile_b, K), lambda i, j: (nT - 1 - j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (C, tile_b), lambda i, j: (nT - 1 - j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (C, tile_b), lambda i, j: (nT - 1 - j, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (C, tile_b, K), lambda i, j: (nT - 1 - j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, K), jnp.float32),
            jax.ShapeDtypeStruct((K, K), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, K), jnp.float32),
            pltpu.VMEM((tile_b, K), jnp.float32),
        ],
        compiler_params=cp,
    )

    iters = 20

    def timed(fn, label, *args):
        @jax.jit
        def run(z, *a):
            def chained(carry, _):
                out = fn(*((a[0] + carry * 1e-30,) + a[1:]))
                first = jax.tree.leaves(out)[0]
                return carry + first.ravel()[0] * 0.0, first.ravel()[0]

            _, o = lax.scan(chained, z, None, length=iters)
            return o[-1]

        z = jnp.zeros(())
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(z, *args)))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(z, *args)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:10s} {dt*1e3:8.2f} ms/it (compile {comp:.0f}s)", flush=True)

    fwd_nos = pl.pallas_call(
        functools.partial(_fwd_nos, C=C),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((1, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, B, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_b, K), jnp.float32)],
        compiler_params=cp,
    )

    fwd_stack = pl.pallas_call(
        functools.partial(_fwd_stack, C=C),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((1, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, K), jnp.float32),
            jax.ShapeDtypeStruct((T, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, K), jnp.float32)],
        compiler_params=cp,
    )

    def make_micro(body, out_dtype=jnp.float32):
        def kern(pi_ref, A_ref, lik_ref, alpha_ref, carry, *, C):
            j = pl.program_id(1)
            a = jnp.where(
                j == 0, pi_ref[0, :][None, :] * lik_ref[0], carry[:, :]
            ).astype(out_dtype)
            a = body(a, A_ref, lik_ref, alpha_ref, C)
            carry[:, :] = a.astype(jnp.float32)

        return pl.pallas_call(
            functools.partial(kern, C=C),
            grid=(nB, nT),
            in_specs=[
                pl.BlockSpec((1, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (C, tile_b, K), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((T, B, K), out_dtype),
            scratch_shapes=[pltpu.VMEM((tile_b, K), jnp.float32)],
            compiler_params=cp,
        )

    def body_dot_only(a, A_ref, lik_ref, alpha_ref, C):
        for p in range(C):
            a = jnp.dot(a, A_ref[:, :], preferred_element_type=jnp.float32)
        alpha_ref[0] = a
        return a * 1e-20  # keep range bounded across cells

    def body_dot_store(a, A_ref, lik_ref, alpha_ref, C):
        for p in range(C):
            a = jnp.dot(a, A_ref[:, :], preferred_element_type=jnp.float32)
            alpha_ref[p] = a
        return a * 1e-20

    def body_bf16(a, A_ref, lik_ref, alpha_ref, C):
        Ab = A_ref[:, :].astype(jnp.bfloat16)
        for p in range(C):
            a = jnp.dot(
                a.astype(jnp.bfloat16), Ab, preferred_element_type=jnp.float32
            )
            alpha_ref[p] = a.astype(jnp.bfloat16)
        return a * 1e-20

    def make_chunked(n_chunks):
        cb = tile_b // n_chunks

        def body(a, A_ref, lik_ref, alpha_ref, C):
            chunks = [a[i * cb : (i + 1) * cb] for i in range(n_chunks)]
            for p in range(C):
                for i in range(n_chunks):
                    chunks[i] = jnp.dot(
                        chunks[i], A_ref[:, :], preferred_element_type=jnp.float32
                    )
                for i in range(n_chunks):
                    alpha_ref[p, i * cb : (i + 1) * cb, :] = chunks[i]
            return jnp.concatenate(chunks, axis=0) * 1e-20

        return body

    which = sys.argv[4] if len(sys.argv) > 4 else "fb"
    if "4" in which:
        timed(lambda l: make_micro(make_chunked(8))(pi, A, l), "chunk8", lik)
    if "5" in which:
        timed(lambda l: make_micro(make_chunked(4))(pi, A, l), "chunk4", lik)
    if "f" in which:
        timed(lambda l: fwd(pi, A, l), "fwd", lik)
    if "n" in which:
        timed(lambda l: fwd_nos(pi, A, l), "fwd_nos", lik)
    if "s" in which:
        timed(lambda l: fwd_stack(pi, A, l), "fwd_stack", lik)
    if "1" in which:
        timed(lambda l: make_micro(body_dot_only)(pi, A, l), "dot_only", lik)
    if "2" in which:
        timed(lambda l: make_micro(body_dot_store)(pi, A, l), "dot_store", lik)
    if "3" in which:
        timed(
            lambda l: make_micro(body_bf16, jnp.bfloat16)(pi, A, l), "dot_bf16", lik
        )
    if "b" in which:
        alpha, s = fwd(pi, A, lik)
        alpha = jax.block_until_ready(alpha)
        rs = 1.0 / s
        timed(lambda a, l, r1, r2: bwd(A, l, a, r1, r2), "bwd", alpha, lik, rs, rs)


if __name__ == "__main__":
    main()
