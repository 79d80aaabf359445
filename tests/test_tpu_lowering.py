"""AOT TPU-lowering regression tests.

`jit(f).trace(args).lower(lowering_platforms=("tpu",))` serializes the
pallas kernels to Mosaic MLIR on the CPU host, without a TPU attached —
it catches structural kernel breakage (unsupported dot precisions,
malformed block specs, bad shapes) that interpret-mode tests cannot see
(interpret mode skips Mosaic entirely). Caught for real: Mosaic rejects
lax.Precision.HIGH in-kernel, which interpret-mode parity tests happily
executed. Server-side Mosaic compilation can still fail on VMEM limits,
but every shape/type/op-legality error surfaces here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysvihmm_tpu.messages.pallas_fb import (
    pallas_estep_fused,
    pallas_forward_backward_batched,
)

rng = np.random.default_rng(3)

K, D, T, B = 64, 8, 64, 32  # P=2 packing, small enough to lower fast
F = 1 + D + D * (D + 1) // 2
LOG_PI = jnp.array(np.log(rng.dirichlet(np.ones(K))), jnp.float32)
LOG_A = jnp.array(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32)
FEATS = jax.ShapeDtypeStruct((T, B, F), jnp.float32)
WMAT = jax.ShapeDtypeStruct((F, K), jnp.float32)
LL = jax.ShapeDtypeStruct((T, B, K), jnp.float32)
MASK = jax.ShapeDtypeStruct((T, B), jnp.float32)


def _lowers(f, *args):
    text = jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",)).as_text()
    assert "tpu_custom_call" in text  # the kernels actually lowered via Mosaic
    return text


class TestTPULowering:
    def test_fused_no_gamma(self):
        _lowers(
            lambda p, A, W, f: pallas_estep_fused(p, A, W, f, emit_gamma=False),
            LOG_PI, LOG_A, WMAT, FEATS,
        )

    def test_fused_with_gamma(self):
        _lowers(
            lambda p, A, W, f: pallas_estep_fused(p, A, W, f, emit_gamma=True),
            LOG_PI, LOG_A, WMAT, FEATS,
        )

    def test_fused_gated(self):
        _lowers(
            lambda p, A, W, f, w: pallas_estep_fused(
                p, A, W, f, weights=w, emit_gamma=True
            ),
            LOG_PI, LOG_A, WMAT, FEATS, MASK,
        )

    def test_split_time_major_packed(self):
        _lowers(
            lambda p, A, l: pallas_forward_backward_batched(
                p, A, l, time_major=True, packed_gamma=True
            ),
            LOG_PI, LOG_A, LL,
        )

    def test_split_gated(self):
        _lowers(
            lambda p, A, l, w: pallas_forward_backward_batched(
                p, A, l, weights=w, time_major=True, packed_gamma=True
            ),
            LOG_PI, LOG_A, LL, MASK,
        )


class TestTPULoweringAwkwardT:
    """Chain lengths whose tiling is non-trivial. Mosaic's rule: the last
    two block dims must be (multiple of 8, multiple of 128) or equal the
    whole array dim — so the tiler must never pick a ragged time tile
    (caught for real: T=1000 with a hand-passed C=20 tile, and T=70 whose
    only divisors <= 32 are ragged, both failed TPU lowering while passing
    interpret-mode tests)."""

    def test_fused_T70_whole_axis(self):
        # no multiple-of-8 divisor <= 32: the tiler takes the whole time
        # axis as one (legal) block; "auto" routes this T to scan, but an
        # explicit pallas request must still compile
        feats = jax.ShapeDtypeStruct((70, B, F), jnp.float32)
        _lowers(
            lambda p, A, W, f: pallas_estep_fused(p, A, W, f, emit_gamma=False),
            LOG_PI, LOG_A, WMAT, feats,
        )

    def test_split_T20_short_whole_axis(self):
        ll = jax.ShapeDtypeStruct((20, B, K), jnp.float32)
        _lowers(
            lambda p, A, l: pallas_forward_backward_batched(
                p, A, l, time_major=True, packed_gamma=True
            ),
            LOG_PI, LOG_A, ll,
        )

    def test_fused_T40_legal_tile(self):
        # 8 divides 40: a bounded multiple-of-8 tile exists and is chosen
        feats = jax.ShapeDtypeStruct((40, B, F), jnp.float32)
        _lowers(
            lambda p, A, W, f: pallas_estep_fused(p, A, W, f, emit_gamma=False),
            LOG_PI, LOG_A, WMAT, feats,
        )

    def test_explicit_ragged_tiles_rejected(self):
        # a hand-passed Mosaic-illegal tile raises a clear error at trace
        # time instead of failing deep inside TPU lowering; the rule applies
        # only when actually lowering (interpret=False) — interpret-mode
        # tests deliberately run multi-row-tile grids at small R
        feats = jnp.zeros((1000, B, F), jnp.float32)
        with pytest.raises(ValueError, match="Mosaic-tiling-legal"):
            pallas_estep_fused(
                LOG_PI, LOG_A, jnp.zeros((F, K), jnp.float32), feats,
                emit_gamma=False, tiles=(B // 2, 20), interpret=False,
            )


class TestFlagshipEntryLowering:
    """The driver's entry() (default SVI config, W=70 -> padded 72) must
    resolve to the fused Pallas kernels on a TPU backend and lower via
    Mosaic — the round-1 flagship regression (VERDICT r1 item 1): the
    ==\"pallas\" gate made entry() silently lower the scan path."""

    def test_entry_step_lowers_to_fused_kernels(self, monkeypatch):
        from pysvihmm_tpu.messages import pallas_fb

        monkeypatch.setattr(pallas_fb, "on_tpu", lambda: True)
        monkeypatch.delenv("PYSVIHMM_ESTEP_METHOD", raising=False)
        import __graft_entry__ as g

        fn, args = g.entry()
        text = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",)).as_text()
        assert "tpu_custom_call" in text  # fused kernels, not the scan path


class TestTPULoweringDiagFamily:
    """Feature width 1 + 2D (DiagonalGaussianNIG) lowers via Mosaic too —
    a narrower, non-NIW lane packing of the fused kernels."""

    def test_fused_diag_features(self):
        F_diag = 1 + 2 * D
        feats = jax.ShapeDtypeStruct((T, B, F_diag), jnp.float32)
        wmat = jax.ShapeDtypeStruct((F_diag, K), jnp.float32)
        _lowers(
            lambda p, A, W, f: pallas_estep_fused(p, A, W, f, emit_gamma=False),
            LOG_PI, LOG_A, wmat, feats,
        )


class TestTPULoweringBf16x3:
    """The extended "bf16x3" in-kernel precision spec (3-pass bf16-split
    emulation of HIGH, messages/pallas_fb.py::_kdot) must stay
    Mosaic-legal: it lowers each pass as a DEFAULT-precision dot plus VPU
    casts, sidestepping Mosaic's rejection of lax.Precision.HIGH."""

    def test_fused_all_tiers_bf16x3(self):
        _lowers(
            lambda p, A, W, f: pallas_estep_fused(
                p, A, W, f, emit_gamma=True,
                precision="bf16x3", ll_precision="bf16x3",
                stats_precision="bf16x3",
            ),
            LOG_PI, LOG_A, WMAT, FEATS,
        )

    def test_split_kernel_bf16x3(self):
        _lowers(
            lambda p, A, l: pallas_forward_backward_batched(
                p, A, l, time_major=True, packed_gamma=True,
                precision="bf16x3",
            ),
            LOG_PI, LOG_A, LL,
        )


class TestTPULoweringPoissonFamily:
    """Feature width 2 + D (PoissonGamma: [1, y, sum log y!]) lowers via
    Mosaic — the narrowest lane packing of the fused kernels."""

    def test_fused_poisson_features(self):
        F_pois = 2 + D
        feats = jax.ShapeDtypeStruct((T, B, F_pois), jnp.float32)
        wmat = jax.ShapeDtypeStruct((F_pois, K), jnp.float32)
        _lowers(
            lambda p, A, W, f: pallas_estep_fused(p, A, W, f, emit_gamma=False),
            LOG_PI, LOG_A, wmat, feats,
        )
