"""Batched fleet prediction: vmapped posterior-predictive over subjects.

The reference predicts per subject inside each MPI rank (sequentially per
grid point, SURVEY §3.4); here a whole bucket of equal-N subjects is one
vmapped device program — batched Gram factorizations + batched grid solves.
Used by ``workflows.run_cohort`` for test scoring; also useful standalone for
serving a fitted fleet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from ..models.base import FullData
from ..predict import gnmgp as pred_gnmgp
from ..predict import lmc as pred_lmc
from ..predict import snmgp as pred_snmgp

_PRED = {"lmc": pred_lmc, "snmgp": pred_snmgp, "gnmgp": pred_gnmgp}


def fleet_predict_map(
    model_name: str,
    vecs: jnp.ndarray,  # (S, P)
    xs: jnp.ndarray,  # (S, N)
    ys: jnp.ndarray,  # (S, N, M)
    grids: jnp.ndarray,  # (S, G) per-subject prediction inputs
    hyper: dict | None = None,
):
    """Vmapped plug-in MAP prediction for a fleet of equal-N subjects.

    Returns the model's GridPrediction pytree with a leading subject axis.
    """
    pred = _PRED[model_name]
    vecs = jnp.asarray(vecs, settings.dtype)
    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    grids = jnp.asarray(grids, settings.dtype)

    if model_name == "lmc":
        fn = lambda v, x, y, g: pred.predict_map(v, FullData(x, y), g)
    else:
        fn = lambda v, x, y, g: pred.predict_map(v, FullData(x, y), g, hyper=hyper)
    return jax.jit(jax.vmap(fn))(vecs, xs, ys, grids)
