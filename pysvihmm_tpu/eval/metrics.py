"""Evaluation metrics: Munkres-matched Hamming error, predictive scoring.

Reference analog: the Munkres/Hungarian state-matching + Hamming distance the
reference uses before comparing decoded states to truth (``munkres`` dep or
vendored Hungarian — SURVEY.md §2.2 [MED]). State labels are unidentifiable,
so we first find the error-minimizing permutation. Assignment runs on host
via scipy (it is O(K^3) on a K x K cost matrix — never a hot path).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def best_permutation(est: np.ndarray, true: np.ndarray, K: int) -> np.ndarray:
    """Permutation perm maximizing agreement of perm[est] with true."""
    est = np.asarray(est).reshape(-1)
    true = np.asarray(true).reshape(-1)
    cost = np.zeros((K, K))
    for i in range(K):
        mask = est == i
        if mask.any():
            cost[i] = -np.bincount(true[mask], minlength=K)
    rows, cols = linear_sum_assignment(cost)
    perm = np.arange(K)
    perm[rows] = cols
    return perm


def hamming_error(est, true, K: int) -> float:
    """Fraction of mismatched states after optimal relabeling (in [0, 1])."""
    est = np.asarray(est).reshape(-1)
    true = np.asarray(true).reshape(-1)
    perm = best_permutation(est, true, K)
    return float(np.mean(perm[est] != true))


def hamming_error_long(est, true, K: int) -> float:
    """Matched Hamming error for DEVICE-resident decodes at T = 10M+.

    :func:`hamming_error` pulls both label arrays to host and walks them
    K+1 times — fine at test scale, not against a streamed 100M-step
    decode. Here the K x K confusion matrix is ONE device bincount over
    est*K+true (the only full-T pass); the O(K^3) assignment and the
    mismatch count then run on the K x K matrix alone. est/true: (T,)
    int device or numpy arrays.
    """
    import jax.numpy as jnp

    est = jnp.asarray(est).reshape(-1).astype(jnp.int32)
    true = jnp.asarray(true).reshape(-1).astype(jnp.int32)
    conf = np.asarray(
        jnp.bincount(est * K + true, length=K * K), np.int64
    ).reshape(K, K)
    rows, cols = linear_sum_assignment(-conf)
    return float(1.0 - conf[rows, cols].sum() / conf.sum())
