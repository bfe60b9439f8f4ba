"""Posterior-sample unpacking and latent-process summaries.

TPU-native re-design of ``Utility/posterior_analysis.py``: chain unpacking per
model layout (:60-88), covariance→correlation conversion (:48), and the
latent-process posterior summaries behind ``visualization_pos`` (:109-179) —
here returned as arrays (quantile bands of log-ℓ, log-σ, B_f(x), R_f(x))
with plotting separated into ``viz``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops import transforms


def unpack_hist_snmgp(hist, n: int, m: int):
    """(S,P) chain → per-parameter histories (posterior_analysis.py:60-68)."""
    hist = np.asarray(hist)
    t = transforms.tri_size(m)
    return (
        hist[:, :n],
        hist[:, n : 2 * n],
        hist[:, 2 * n : 2 * n + t],
        hist[:, -1],
    )


def unpack_hist_gnmgp(hist, n: int, m: int):
    """(posterior_analysis.py:71-78)."""
    hist = np.asarray(hist)
    t = transforms.tri_size(m)
    return hist[:, :n], hist[:, n : n + n * t], hist[:, -1]


def unpack_hist_lmc(hist, m: int):
    """(posterior_analysis.py:80-88)."""
    hist = np.asarray(hist)
    t = transforms.tri_size(m)
    return hist[:, 0], hist[:, 1], hist[:, 2 : 2 + t], hist[:, -1]


class LatentSummary(NamedTuple):
    """Pointwise posterior quantile bands of the GNMGP latent processes."""

    tilde_l_q: np.ndarray  # (3, N) quantiles of log-lengthscale process
    std_q: np.ndarray  # (3, N, M) quantiles of the std processes
    cor_q: np.ndarray  # (3, N, M, M) quantiles of the correlation processes
    b_mean: np.ndarray  # (N, M, M) posterior-mean covariance process


def gnmgp_latent_summary(hist, n: int, m: int, percentiles=(2.5, 50.0, 97.5)) -> LatentSummary:
    """Posterior bands of ℓ(x), std(x), R(x) from a GNMGP chain.

    Vectorized replacement for the per-sample loops in
    ``posterior_analysis.visualization_pos`` (:109-179).
    """
    tilde_l_h, ul_h, _ = unpack_hist_gnmgp(hist, n, m)
    s = tilde_l_h.shape[0]
    t = transforms.tri_size(m)
    lv = np.asarray(transforms.ulvec_to_lvec(jnp.asarray(ul_h).reshape(s, n, t), m))
    ls = np.asarray(transforms.vec_to_tril(jnp.asarray(lv), m))  # (S, N, M, M)
    b = ls @ np.swapaxes(ls, -1, -2)  # (S, N, M, M)
    stds = np.sqrt(np.diagonal(b, axis1=-2, axis2=-1))  # (S, N, M)
    cor = b / (stds[..., :, None] * stds[..., None, :])
    q = list(percentiles)
    return LatentSummary(
        tilde_l_q=np.percentile(tilde_l_h, q, axis=0),
        std_q=np.percentile(stds, q, axis=0),
        cor_q=np.percentile(cor, q, axis=0),
        b_mean=b.mean(axis=0),
    )


def gnmgp_map_latents(vec, n: int, m: int):
    """MAP-point latent processes: (tilde_l, B_f(x), R_f(x), stds(x)).

    Replaces the driver-side unpacking at ``Nonseparable_model.py:290-299``.
    """
    vec = np.asarray(vec)
    t = transforms.tri_size(m)
    tilde_l = vec[:n]
    ul = jnp.asarray(vec[n : n + n * t]).reshape(n, t)
    lv = transforms.ulvec_to_lvec(ul, m)
    ls = np.asarray(transforms.vec_to_tril(lv, m))
    b = ls @ np.swapaxes(ls, -1, -2)
    stds = np.sqrt(np.diagonal(b, axis1=-2, axis2=-1))
    cor = b / (stds[..., :, None] * stds[..., None, :])
    return tilde_l, b, cor, stds


def cov2cor(s):
    """Alias of ops.transforms.cov2cor (posterior_analysis.py:48-57)."""
    return np.asarray(transforms.cov2cor(jnp.asarray(s)))
