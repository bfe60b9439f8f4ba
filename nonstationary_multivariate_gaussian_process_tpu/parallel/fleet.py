"""Subject-parallel fleet training: vmap within a device, shard_map across.

TPU-native replacement for the reference's MPI fleet (SURVEY §2.4, §3.5): the
reference launches ``srun -n 1000`` independent processes, each fitting one
subject and writing pickles, with aggregation done post-hoc on the filesystem
(``Post_Process/past/reduce_distributed_results.py``).  Here:

* a *batch* of subjects is a stacked pytree ``FullData(x: (S,N), y: (S,N,M))``,
* within a device, subjects fit concurrently under ``vmap`` (batched
  Choleskys keep the MXU busy),
* across devices, the subject axis is sharded with ``shard_map`` over a 1-D
  ``Mesh``; fleet-level aggregate metrics (mean/min/max final objective) ride
  a single ``psum`` over ICI — the reference's filesystem "allreduce" becomes
  one collective,
* the MAP loop itself is the same chunked-``lax.scan`` Adam as the
  single-subject engine.

Subjects must share N (the sim-fleet case; replicates are iid draws of the
same size).  Ragged KAISER-style cohorts are handled by bucketing subjects by
length and running one fleet per bucket (see ``parallel.buckets``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from .. import settings
from ..models import gnmgp, lmc, snmgp
from ..models.base import FullData
from ..ops import chol as chol_ops
from ..ops import kernels
from .mesh import SUBJECT_AXIS, make_mesh, pad_to_multiple

_MODELS = {"lmc": lmc, "snmgp": snmgp, "gnmgp": gnmgp}


class FleetResult(NamedTuple):
    vecs: jnp.ndarray  # (S, P) fitted parameter vectors
    final_nlp: jnp.ndarray  # (S,) final negative log posterior per subject
    target_hist: jnp.ndarray  # (S, n_iters) log-posterior trace per subject
    fleet_metrics: dict  # psum-aggregated {mean,min,max} of the final objective


def _prior_chols(model_name: str, x: jnp.ndarray, hp: dict):
    """Per-subject prior Cholesky factors (host-f64 islands, DESIGN §4)."""
    if model_name == "snmgp":
        a1, b1 = hp["alpha_tilde_l"], hp["beta_tilde_l"]
        a2, b2 = hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"]
    elif model_name == "gnmgp":
        a1, b1 = hp["alpha_tilde_l"], hp["beta_tilde_l"]
        a2, b2 = hp["alpha_L"], hp["beta_L"]
    else:
        return jnp.zeros((0,)), jnp.zeros((0,))  # lmc has no GP priors
    pc1 = chol_ops.prior_rbf_cholesky(x, a1, b1)
    pc2 = chol_ops.prior_rbf_cholesky(x, a2, b2)
    return pc1, pc2


def _batched_prior_chols(model_name: str, xs: jnp.ndarray, hp: dict):
    """Stack per-subject prior factors, computed eagerly on the host."""
    if model_name == "lmc":
        s = xs.shape[0]
        return jnp.zeros((s, 0)), jnp.zeros((s, 0))
    pcs = [_prior_chols(model_name, xs[i], hp) for i in range(xs.shape[0])]
    return jnp.stack([p[0] for p in pcs]), jnp.stack([p[1] for p in pcs])


def _subject_nlp(model_name: str, hp: dict, masked: bool = False):
    """Per-subject objective fn(vec, x, y, pc1, pc2[, mask]) → scalar."""
    model = _MODELS[model_name]

    def nlp(vec, x, y, pc1, pc2, mask=None):
        data = FullData(x, y)
        if model_name == "lmc":
            p = model.unpack(vec, y.shape[1])
            res, _ = model.log_posterior(p, data, mask=mask, **hp)
        elif model_name == "snmgp":
            p = model.unpack(vec, y.shape[0], y.shape[1])
            res, _ = model.log_posterior(
                p, data, prior_chol_l=pc1, prior_chol_sigma=pc2, mask=mask, **hp
            )
        else:
            p = model.unpack(vec, y.shape[0], y.shape[1])
            res, _ = model.log_posterior(
                p, data, prior_chol_l=pc1, prior_chol_L=pc2, mask=mask, **hp
            )
        return -res

    if masked:
        return nlp
    return lambda vec, x, y, pc1, pc2: nlp(vec, x, y, pc1, pc2)


def fit_fleet_map(
    model_name: str,
    xs: jnp.ndarray,  # (S, N)
    ys: jnp.ndarray,  # (S, N, M)
    init_vecs: jnp.ndarray,  # (S, P)
    hyper: dict | None = None,
    n_iters: int = 1000,
    lr: float = 2e-1,
    mesh: Mesh | None = None,
    masks: jnp.ndarray | None = None,
) -> FleetResult:
    """MAP-fit a fleet of subjects, sharded over the device mesh.

    ``masks`` (S, N) boolean marks real observations for padded ragged
    subjects — supported by all three model likelihoods (dense projection for
    gnmgp, analytic Kronecker correction for snmgp/lmc).
    """
    model = _MODELS[model_name]
    hp = {**model.DEFAULT_HYPERS, **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size

    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    init_vecs = jnp.asarray(init_vecs, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    init_vecs, _ = pad_to_multiple(init_vecs, n_dev)
    if masks is not None:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2 = _batched_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp(model_name, hp, masked=True)
    optimizer = optax.adam(lr)

    def fit_one(vec0, x, y, p1, p2, mask):
        obj = lambda v: nlp(v, x, y, p1, p2, mask)

        def step(carry, _):
            v, s = carry
            val, grad = jax.value_and_grad(obj)(v)
            ok = jnp.all(jnp.isfinite(grad)) & jnp.isfinite(val)
            grad = jnp.where(ok, grad, jnp.zeros_like(grad))
            updates, s_new = optimizer.update(grad, s, v)
            v_new = optax.apply_updates(v, updates)
            v_new = jnp.where(ok, v_new, v)
            # gate only float state (moments); the int step count increments
            # unconditionally and stays replicated across the shard axis
            s_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                s_new,
                s,
            )
            return (v_new, s_new), -val

        (v, _), hist = jax.lax.scan(
            step, (vec0, optimizer.init(vec0)), None, length=n_iters
        )
        return v, obj(v), hist

    def shard_fn(vec0, x, y, p1, p2, mask):
        vecs, finals, hists = jax.vmap(fit_one)(vec0, x, y, p1, p2, mask)
        # fleet-level metrics ride one psum/pmax over ICI
        total = jax.lax.psum(jnp.sum(finals), SUBJECT_AXIS)
        lo = jax.lax.pmin(jnp.min(finals), SUBJECT_AXIS)
        hi = jax.lax.pmax(jnp.max(finals), SUBJECT_AXIS)
        return vecs, finals, hists, total, lo, hi

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 6),
        out_specs=(P(SUBJECT_AXIS), P(SUBJECT_AXIS), P(SUBJECT_AXIS), P(), P(), P()),
    )
    vecs, finals, hists, total, lo, hi = jax.jit(sharded)(
        init_vecs, xs, ys, pc1, pc2, masks
    )
    s_total = xs.shape[0]
    return FleetResult(
        vecs=vecs[:s_real],
        final_nlp=finals[:s_real],
        target_hist=hists[:s_real],
        fleet_metrics={
            "mean_final_nlp": float(total) / s_total,
            "min_final_nlp": float(lo),
            "max_final_nlp": float(hi),
        },
    )


def hmc_fleet(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    map_vecs: jnp.ndarray,  # (S, P) warm starts
    key,
    n_samples: int = 100,
    step_size: float = 1e-4,
    n_leapfrog: int = 20,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    n_warmup: int = 0,
    adapt_step_size: bool = False,
    target_accept: float = 0.75,
) -> jnp.ndarray:
    """HMC chains for a fleet of subjects, sharded over the mesh.

    Per-subject dual-averaging step-size adaptation is available via
    ``adapt_step_size``/``n_warmup`` (each subject adapts independently).
    Returns (S, n_samples, P) posterior draws.
    """
    from ..inference import hmc as hmc_mod

    model = _MODELS[model_name]
    hp = {**model.DEFAULT_HYPERS, **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size

    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    map_vecs = jnp.asarray(map_vecs, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    map_vecs, _ = pad_to_multiple(map_vecs, n_dev)
    keys = jax.random.split(key, xs.shape[0])

    pc1, pc2 = _batched_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp(model_name, hp)

    def chain_one(vec0, x, y, p1, p2, k):
        pot = lambda v: nlp(v, x, y, p1, p2)
        res = hmc_mod.hmc_sample(
            pot, vec0, n_samples, k, step_size=step_size, n_leapfrog=n_leapfrog,
            n_warmup=n_warmup, adapt_step_size=adapt_step_size,
            target_accept=target_accept,
        )
        return res.samples

    def shard_fn(vec0, x, y, p1, p2, k):
        return jax.vmap(chain_one)(vec0, x, y, p1, p2, k)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 6),
        out_specs=P(SUBJECT_AXIS),
    )
    samples = jax.jit(sharded)(map_vecs, xs, ys, pc1, pc2, keys)
    return samples[:s_real]
