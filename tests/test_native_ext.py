"""C forward-backward extension tests (the reference's Cython-ext analog):
exact agreement with the NumPy oracle loop; graceful fallback when unbuilt.
"""

import numpy as np
import pytest

from pysvihmm_tpu.oracle import numpy_ref as oracle


rng = np.random.default_rng(31)


@pytest.mark.skipif(not oracle.HAVE_C_EXT, reason="C extension not built")
class TestCExtension:
    @pytest.mark.parametrize("T,K", [(50, 4), (200, 16), (37, 7)])
    def test_exact_match(self, T, K):
        log_pi = np.log(rng.dirichlet(np.ones(K)))
        log_A = np.log(rng.dirichlet(np.ones(K), size=K))
        log_lik = rng.normal(size=(T, K)) * 2
        ref = oracle.forward_backward(log_pi, log_A, log_lik)
        fast = oracle.forward_backward_fast(log_pi, log_A, log_lik)
        for r, f in zip(ref, fast):
            np.testing.assert_allclose(np.asarray(f), np.asarray(r), atol=1e-12)

    def test_noncontiguous_inputs_ok(self):
        K, T = 4, 30
        log_pi = np.log(rng.dirichlet(np.ones(K)))
        log_A = np.asfortranarray(np.log(rng.dirichlet(np.ones(K), size=K)))
        log_lik = rng.normal(size=(T, 2 * K))[:, ::2]  # strided view
        ref = oracle.forward_backward(log_pi, np.ascontiguousarray(log_A), np.ascontiguousarray(log_lik))
        fast = oracle.forward_backward_fast(log_pi, log_A, log_lik)
        for r, f in zip(ref, fast):
            np.testing.assert_allclose(np.asarray(f), np.asarray(r), atol=1e-12)


def test_fallback_contract():
    """forward_backward_fast must exist and produce oracle-contract outputs
    regardless of whether the extension is importable."""
    K, T = 3, 20
    log_pi = np.log(rng.dirichlet(np.ones(K)))
    log_A = np.log(rng.dirichlet(np.ones(K), size=K))
    log_lik = rng.normal(size=(T, K))
    alpha, beta, gamma, xi, lz = oracle.forward_backward_fast(log_pi, log_A, log_lik)
    assert alpha.shape == (T, K) and xi.shape == (K, K)
    np.testing.assert_allclose(gamma.sum(1), 1.0, atol=1e-12)
    np.testing.assert_allclose(xi.sum(), T - 1, atol=1e-9)
