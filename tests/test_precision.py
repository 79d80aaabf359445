"""Regression guards for the tiered matmul-precision policy.

utils/precision.py encodes a measured-on-TPU policy (BASELINE.md): chain
recursions and engine entry points trace at full-f32 ("float32"/HIGHEST —
JAX's default 1-pass bf16 diverged VB trajectories 6e-2 from the f64
oracle), while one-shot bulk contractions keep MXU throughput (the packed
emission stat sums at 1-pass DEFAULT, the likelihood einsum at 3-pass
HIGH). CPU executes every tier identically, so these tests pin the policy
where it is visible on any backend: the stablehlo ``precision = [...]``
attributes of the lowered dots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pysvihmm_tpu.data.synthetic import gen_gaussian_dataset
from pysvihmm_tpu.distributions import GaussianNIW
from pysvihmm_tpu.engines.base import batch_local_step
from pysvihmm_tpu.models.hmm import init_params, make_prior
from pysvihmm_tpu.utils.precision import bulk_precision, f32_matmuls


def _dot_lines(lowered_text):
    return [l for l in lowered_text.splitlines() if "dot_general" in l]


def test_f32_matmuls_forces_highest():
    x = jnp.ones((8, 8))
    txt = jax.jit(f32_matmuls(lambda a: a @ a)).lower(x).as_text()
    (line,) = _dot_lines(txt)
    assert "[HIGHEST, HIGHEST]" in line


def test_bulk_precision_overrides_to_high_inside_f32_guard():
    x = jnp.ones((8, 8))

    def f(a):
        with bulk_precision():
            return a @ a

    txt = jax.jit(f32_matmuls(f)).lower(x).as_text()
    (line,) = _dot_lines(txt)
    assert "[HIGH, HIGH]" in line


def _lower_local_step(method):
    K, D, B, T = 4, 2, 8, 40
    obs, _, _ = gen_gaussian_dataset(jax.random.PRNGKey(0), K, D, B, T)
    prior = make_prior(K, GaussianNIW, obs_dim=D)
    params = init_params(jax.random.PRNGKey(1), prior, GaussianNIW, obs)
    fn = jax.jit(lambda p, o: batch_local_step(p, GaussianNIW, o, method))
    return fn.lower(params, obs).as_text()


def test_pallas_path_precision_tiers():
    """The production E-step carries its precision tiers at once: the
    likelihood einsum under bulk_precision() and the XLA-side emission
    stat contraction on the stats tier (default bf16x3 -> native HIGH),
    with the chain dots' precision living INSIDE the tpu_custom_call."""
    txt = _lower_local_step("pallas")
    dots = _dot_lines(txt)
    assert any("[HIGH, HIGH]" in l for l in dots)
    # no FLOAT32 dot may run at 1-pass bf16; DEFAULT-precision dots over
    # explicitly-bf16 operands are the interpret-mode rendering of the
    # kernels' bf16x3 emulation passes (exact native-bf16 MXU passes)
    assert not any(
        "[DEFAULT, DEFAULT]" in l and "xbf16" not in l for l in dots
    )
    # "highest" env restores full-f32 stat sums
    import os

    os.environ["PYSVIHMM_STATS_PREC"] = "highest"
    try:
        txt_hi = _lower_local_step("pallas")
    finally:
        del os.environ["PYSVIHMM_STATS_PREC"]
    assert any("[HIGHEST, HIGHEST]" in l for l in _dot_lines(txt_hi))


def test_scan_path_has_no_default_precision_dots():
    """The correctness-first scan path runs entirely under the f32 guard:
    a DEFAULT-precision dot appearing here means some matmul escaped it."""
    txt = _lower_local_step("scan")
    dots = _dot_lines(txt)
    assert dots, "expected dots in the lowered scan E-step"
    assert not any("[DEFAULT, DEFAULT]" in l for l in dots)


class TestKernelPrecisionKnobs:
    """The extended in-kernel precision tiers (messages/pallas_fb.py):
    env-resolved specs, and interpret-mode parity of the "bf16x3" 3-pass
    bf16-split HIGH emulation (the production default) against the 6-pass
    HIGHEST exact reference.

    Measured interpret-mode errors vs HIGHEST on the K=64 fused E-step
    (max |d| / ||ref||_inf per stat leaf): chain/pairwise tier ~4e-6,
    stat tier ~2e-6, likelihood tier ~2e-4 (one bf16-split error in the
    log-likelihood, amplified once through exp). Tolerances below hold
    3-5x margin.
    """

    def _run(self, monkeypatch, env):
        import numpy as np

        from pysvihmm_tpu.engines.base import batch_local_step
        from pysvihmm_tpu.models.hmm import init_params, make_prior

        for var in ("PYSVIHMM_KERNEL_PREC", "PYSVIHMM_LL_PREC",
                    "PYSVIHMM_STATS_PREC"):
            monkeypatch.delenv(var, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        K, D, B, T = 64, 4, 8, 32
        obs, _, _ = gen_gaussian_dataset(jax.random.PRNGKey(0), K, D, B, T)
        prior = make_prior(K, GaussianNIW, obs_dim=D)
        params = init_params(jax.random.PRNGKey(1), prior, GaussianNIW, obs)
        return batch_local_step(params, GaussianNIW, obs, "pallas_fused")

    def test_env_resolution(self, monkeypatch):
        from pysvihmm_tpu.messages.pallas_fb import kernel_precisions

        for var in ("PYSVIHMM_KERNEL_PREC", "PYSVIHMM_LL_PREC",
                    "PYSVIHMM_STATS_PREC"):
            monkeypatch.delenv(var, raising=False)
        assert kernel_precisions() == ("bf16x3",) * 3
        monkeypatch.setenv("PYSVIHMM_KERNEL_PREC", "highest")
        monkeypatch.setenv("PYSVIHMM_STATS_PREC", "default")
        assert kernel_precisions() == (
            jax.lax.Precision.HIGHEST, "bf16x3", jax.lax.Precision.DEFAULT
        )
        monkeypatch.setenv("PYSVIHMM_LL_PREC", "fast")  # unknown value
        import pytest

        with pytest.raises(ValueError):
            kernel_precisions()

    _ALL_HIGHEST = {
        "PYSVIHMM_KERNEL_PREC": "highest",
        "PYSVIHMM_LL_PREC": "highest",
        "PYSVIHMM_STATS_PREC": "highest",
    }

    def test_bf16x3_parity(self, monkeypatch):
        """Each tier alone (others pinned HIGHEST) vs the all-HIGHEST
        exact reference stays inside the measured bounds."""
        import numpy as np

        ref_s, ref_logc = self._run(monkeypatch, self._ALL_HIGHEST)
        tol = {
            "PYSVIHMM_KERNEL_PREC": 2e-5,
            "PYSVIHMM_STATS_PREC": 1e-5,
            "PYSVIHMM_LL_PREC": 1e-3,
        }
        for var, t in tol.items():
            env = dict(self._ALL_HIGHEST, **{var: "bf16x3"})
            s, logc = self._run(monkeypatch, env)
            assert float(jnp.max(jnp.abs(logc - ref_logc))) < 5e-3, var
            for a, b in zip(jax.tree.leaves(ref_s), jax.tree.leaves(s)):
                a, b = np.asarray(a), np.asarray(b)
                scale = np.abs(a).max() + 1e-12
                assert np.abs(a - b).max() / scale < t, (var, a.shape)

    def test_production_default_parity(self, monkeypatch):
        """The no-env production default (all tiers bf16x3) vs exact."""
        import numpy as np

        ref_s, _ = self._run(monkeypatch, self._ALL_HIGHEST)
        s, _ = self._run(monkeypatch, {})
        for a, b in zip(jax.tree.leaves(ref_s), jax.tree.leaves(s)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-12
            assert np.abs(a - b).max() / scale < 1e-3, a.shape
