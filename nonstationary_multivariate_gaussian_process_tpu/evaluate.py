"""Model scoring: RMSE/LPD, G/P/D replicated-data scores, PMSE, AIC/BIC/DIC.

TPU-native re-design of the reference's ``Utility/utils.py:165-197`` metrics,
``Utility/model_validation.py`` information criteria, and the G/P/D model
evaluation inlined in the drivers (``Nonseparable_Model/Nonseparable_model.py:
386-395``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def mse(a, b, axis=None):
    """Mean squared error (utils.py:165-172)."""
    return np.mean((np.asarray(a) - np.asarray(b)) ** 2, axis=axis)


def rmse(a, b, axis=None):
    """Root mean squared error (utils.py:175-182)."""
    return np.sqrt(mse(a, b, axis=axis))


def lpd(mean, std, y):
    """Mean log predictive density under pointwise normals (utils.py:185-197)."""
    mean = np.asarray(mean).reshape(-1)
    std = np.asarray(std).reshape(-1)
    y = np.asarray(y).reshape(-1)
    z = (y - mean) / std
    return float(np.mean(-0.5 * z**2 - np.log(std) - 0.5 * np.log(2 * np.pi)))


def gpd_scores(rep_samples, y):
    """G/P/D replicated-data scores (Nonseparable_model.py:386-395).

    ``rep_samples``: (G, S, M) posterior-predictive draws at the training
    inputs; ``y``: (G, M) observations.  G = Σ(y − E[y_rep])², P = Σ Var[y_rep],
    D = G + P.
    """
    rep = np.asarray(rep_samples)
    y = np.asarray(y)
    mean_rep = rep.mean(axis=1)
    var_rep = rep.var(axis=1)
    g = float(np.sum((y - mean_rep) ** 2))
    p = float(np.sum(var_rep))
    return {"G": g, "P": p, "D": g + p}


def pmse(pred_mean, y_test):
    """Predictive mean squared error on held-out data."""
    return float(mse(pred_mean, y_test))


def get_aic(vec, deviance_fn, *args, **kwargs):
    """AIC = deviance + 2 N_p (model_validation.py:9-19)."""
    n_p = np.asarray(vec).shape[0]
    return float(deviance_fn(vec, *args, **kwargs)) + 2.0 * n_p


def get_bic(vec, deviance_fn, n_obs: int, *args, **kwargs):
    """BIC = deviance + log(N) N_p (model_validation.py:21-33).

    ``n_obs`` is the number of inputs N (the reference uses ``Y.size()[0]``).
    """
    n_p = np.asarray(vec).shape[0]
    return float(deviance_fn(vec, *args, **kwargs)) + float(np.log(n_obs)) * n_p


def get_dic(hist_vecs, deviance_fn, *args, **kwargs):
    """DIC = bar_D + p_D with p_D = bar_D − D(posterior mean) (model_validation.py:35-51).

    The per-draw deviances are vmapped into one batched evaluation instead of
    the reference's Python loop over the chain.
    """
    hist = jnp.asarray(hist_vecs)
    devs = jax.vmap(lambda v: deviance_fn(v, *args, **kwargs))(hist)
    bar_d = float(jnp.mean(devs))
    d_mean = float(deviance_fn(jnp.mean(hist, axis=0), *args, **kwargs))
    p_d = bar_d - d_mean
    return bar_d + p_d
