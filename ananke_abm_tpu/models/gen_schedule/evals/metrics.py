"""Population metrics over (N, T) purpose grids — vectorized numpy.

Same quantities as the reference metrics
(src/ananke_abm/models/gen_schedule/evals/metrics.py:4-59), with the
per-element Python loops replaced by bincount counting:
- minutes_share (P,), tod_marginals (T, P)
- joint bigram matrix (P, P) and row-conditional bigram
- L1 distance between matrices
"""
from __future__ import annotations

import numpy as np


def minutes_share(Y: np.ndarray, P: int) -> np.ndarray:
    """Fraction of all person-minutes spent in each purpose. (P,)"""
    counts = np.bincount(Y.ravel(), minlength=P).astype(np.float64)
    return counts / Y.size


def tod_marginals(Y: np.ndarray, P: int) -> np.ndarray:
    """m[t, p] = Pr(y_t == p) across persons. (T, P)

    Native C++ occupancy pass when built (6.5x: skips the N*T index
    temp the bincount path materializes); numpy otherwise.
    """
    from ananke_abm_tpu.ops import native  # lazy: avoids import cycle

    native.check_labels(Y, P)  # uniform across both branches
    N, T = Y.shape
    if native.available():
        return native.tod_counts(Y, P).astype(np.float64) / N
    flat = (np.arange(T)[None, :] * P + Y).ravel()
    counts = np.bincount(flat, minlength=T * P).reshape(T, P)
    return counts.astype(np.float64) / N


def _bigram_counts(Y: np.ndarray, P: int) -> np.ndarray:
    """(P, P) counts of adjacent within-row pairs.

    The native n=2 dense-table pass when built — the numpy path
    materializes three N*(T-1) temps (two slice copies + the pair code),
    ~7 GiB of first-touch traffic at 1M x 288; the C pass streams the
    grid once.
    """
    from ananke_abm_tpu.ops import native  # lazy: avoids import cycle

    native.check_labels(Y, P)  # uniform across both branches
    if native.available():
        return native.count_ngrams_dense(Y, 2, P).reshape(P, P)
    a = Y[:, :-1].ravel()
    b = Y[:, 1:].ravel()
    return np.bincount(a * P + b, minlength=P * P).reshape(P, P)


def bigram_matrix(Y: np.ndarray, P: int) -> np.ndarray:
    """Joint distribution of adjacent pairs, normalized over all pairs. (P,P)"""
    M = _bigram_counts(Y, P).astype(np.float64)
    z = M.sum()
    return M / z if z > 0 else M


def bigram_matrix_rowcond(Y: np.ndarray, P: int) -> np.ndarray:
    """Row-conditional transition matrix P(y_{t+1}=j | y_t=i). (P,P)"""
    B = _bigram_counts(Y, P).astype(np.float64)
    rows = B.sum(axis=1, keepdims=True)
    return np.divide(B, rows, out=np.zeros_like(B), where=rows > 0)


def l1_distance(A: np.ndarray, B: np.ndarray) -> float:
    return float(np.abs(A - B).sum())
