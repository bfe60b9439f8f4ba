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


def fleet_predict_sample(
    model_name: str,
    key,
    chains: jnp.ndarray,  # (S, T, P) per-subject posterior chains
    xs: jnp.ndarray,  # (S, N)
    ys: jnp.ndarray,  # (S, N, M)
    grids: jnp.ndarray,  # (S, G) per-subject prediction inputs
    hyper: dict | None = None,
    n_sample: int | None = None,
) -> jnp.ndarray:
    """Vmapped chain-sample prediction for a fleet of equal-N subjects.

    Each subject's posterior chain (e.g. from :func:`.fleet.hmc_fleet`)
    drives its own per-draw predictive sampling — the reference's
    ``point_predsample`` family, batched across the fleet as one device
    program.  Returns (S, G, T, M) draws.
    """
    pred = _PRED[model_name]
    chains = jnp.asarray(chains, settings.dtype)
    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    grids = jnp.asarray(grids, settings.dtype)
    if n_sample is not None:
        chains = chains[:, -n_sample:]
    keys = jax.random.split(key, chains.shape[0])

    if model_name == "lmc":
        # pred_lmc.predict_sample returns (T, G, M); normalize to the
        # (G, T, M) layout of the nonstationary families
        fn = lambda k, c, x, y, g: jnp.moveaxis(
            pred.predict_sample(k, c, FullData(x, y), g), 0, 1
        )
    else:
        fn = lambda k, c, x, y, g: pred.predict_sample(
            k, c, FullData(x, y), g, hyper=hyper
        )
    return jax.jit(jax.vmap(fn))(keys, chains, xs, ys, grids)
