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
import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from .. import settings
from ..inference import map as map_mod
from ..models import gnmgp, gnmgp_hetero, lmc, snmgp
from ..models.base import FullData
from ..ops import chol as chol_ops
from .mesh import SUBJECT_AXIS, make_mesh, pad_to_multiple

_MODELS = {"lmc": lmc, "snmgp": snmgp, "gnmgp": gnmgp,
           "gnmgp_hetero": gnmgp_hetero}


def _validate_fleet(model_name, xs, ys, vecs, masks=None, hadamard=False):
    """Named shape errors at the fleet boundary (instead of reshape errors
    surfacing from inside the shard_map program).  Shape-only — never
    materializes device arrays on the host."""
    if model_name not in _MODELS:
        raise ValueError(f"unknown model {model_name!r} (want one of "
                         f"{sorted(_MODELS)})")
    xs_shape = np.shape(xs)
    ys_shape = np.shape(ys)
    vecs_shape = np.shape(vecs)
    want_y = 2 if hadamard else 3
    if len(xs_shape) != 2 or len(ys_shape) != want_y:
        raise ValueError(
            f"fleet inputs must be stacked per subject: xs (S, N), ys "
            f"{'(S, N)' if hadamard else '(S, N, M)'}, got {xs_shape}/{ys_shape}"
        )
    if xs_shape[0] != ys_shape[0] or xs_shape[1] != ys_shape[1]:
        raise ValueError(f"xs and ys disagree: {xs_shape} vs {ys_shape}")
    if len(vecs_shape) != 2 or vecs_shape[0] != xs_shape[0]:
        raise ValueError(
            f"parameter stack must be (S, P) with S={xs_shape[0]}, "
            f"got {vecs_shape}"
        )
    if masks is not None and np.shape(masks) != xs_shape:
        raise ValueError(
            f"masks must match xs {xs_shape}, got {np.shape(masks)}"
        )


class FleetResult(NamedTuple):
    vecs: jnp.ndarray  # (S, P) fitted parameter vectors
    final_nlp: jnp.ndarray  # (S,) final negative log posterior per subject
    target_hist: jnp.ndarray  # (S, n_iters) log-posterior trace per subject
    fleet_metrics: dict  # psum-aggregated {mean,min,max} of the final objective


def _prior_chols(model_name: str, x: jnp.ndarray, hp: dict):
    """Per-subject prior Cholesky factors (host-f64 islands, DESIGN §4).

    Returns ``(pc1, pc2, pc3)``; pc3 is the heteroscedastic noise-GP factor
    (empty for the other models, empty everything for lmc)."""
    empty = jnp.zeros((0,))
    if model_name == "snmgp":
        a1, b1 = hp["alpha_tilde_l"], hp["beta_tilde_l"]
        a2, b2 = hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"]
    elif model_name in ("gnmgp", "gnmgp_hetero"):
        a1, b1 = hp["alpha_tilde_l"], hp["beta_tilde_l"]
        a2, b2 = hp["alpha_L"], hp["beta_L"]
    else:
        return empty, empty, empty  # lmc has no GP priors
    pc1 = chol_ops.prior_rbf_cholesky(x, a1, b1)
    pc2 = chol_ops.prior_rbf_cholesky(x, a2, b2)
    if model_name == "gnmgp_hetero":
        pc3 = chol_ops.prior_rbf_cholesky(x, hp["alpha_err"], hp["beta_err"])
    else:
        pc3 = empty
    return pc1, pc2, pc3


def _batched_prior_chols(model_name: str, xs: jnp.ndarray, hp: dict):
    """Stack per-subject prior factors, computed eagerly on the host."""
    if model_name == "lmc":
        s = xs.shape[0]
        z = jnp.zeros((s, 0))
        return z, z, z
    pcs = [_prior_chols(model_name, xs[i], hp) for i in range(xs.shape[0])]
    return (jnp.stack([p[0] for p in pcs]), jnp.stack([p[1] for p in pcs]),
            jnp.stack([p[2] for p in pcs]))


def _subject_nlp(model_name: str, hp: dict, masked: bool = False):
    """Per-subject objective fn(vec, x, y, pc1, pc2, pc3[, mask]) → scalar."""
    model = _MODELS[model_name]

    def nlp(vec, x, y, pc1, pc2, pc3, mask=None):
        data = FullData(x, y)
        if model_name == "lmc":
            p = model.unpack(vec, y.shape[1])
            res, _ = model.log_posterior(p, data, mask=mask, **hp)
        elif model_name == "snmgp":
            p = model.unpack(vec, y.shape[0], y.shape[1])
            res, _ = model.log_posterior(
                p, data, prior_chol_l=pc1, prior_chol_sigma=pc2, mask=mask, **hp
            )
        elif model_name == "gnmgp_hetero":
            p = model.unpack(vec, y.shape[0], y.shape[1])
            res, _ = model.log_posterior(
                p, data, prior_chol_l=pc1, prior_chol_L=pc2,
                prior_chol_err=pc3, mask=mask, **hp
            )
        else:
            p = model.unpack(vec, y.shape[0], y.shape[1])
            res, _ = model.log_posterior(
                p, data, prior_chol_l=pc1, prior_chol_L=pc2, mask=mask, **hp
            )
        return -res

    if masked:
        return nlp
    return lambda vec, x, y, pc1, pc2, pc3: nlp(vec, x, y, pc1, pc2, pc3)


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
    method: str = "adam",
) -> FleetResult:
    """MAP-fit a fleet of subjects, sharded over the device mesh.

    ``masks`` (S, N) boolean marks real observations for padded ragged
    subjects — supported by all three model likelihoods (dense projection for
    gnmgp, analytic Kronecker correction for snmgp/lmc).

    ``method="lbfgs"`` swaps each subject's Adam scan for the guarded
    L-BFGS body (``inference.map.guarded_lbfgs_step``, zoom linesearch,
    vmapped per subject — every subject runs its own linesearch in
    lockstep); ``lr`` is then ignored.  Measured win on the single-subject
    engine: README/ROADMAP (N=200: -4988 @300 iters vs Adam's -4379
    @2000).
    """
    _validate_fleet(model_name, xs, ys, init_vecs, masks)
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

    pc1, pc2, pc3 = _batched_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp(model_name, hp, masked=True)
    if method == "lbfgs":
        optimizer = optax.lbfgs()
        step_builder = map_mod.guarded_lbfgs_step
    elif method == "adam":
        optimizer = optax.adam(lr)
        step_builder = map_mod.guarded_adam_step
    else:
        raise ValueError(f"unknown method {method!r} (want 'adam' or 'lbfgs')")

    def fit_one(vec0, x, y, p1, p2, p3, mask):
        obj = lambda v: nlp(v, x, y, p1, p2, p3, mask)

        # tie the scalar carry to vec0 so it is subject-varying under
        # shard_map (a replicated literal would change VMA across the scan)
        big = jnp.asarray(jnp.inf, vec0.dtype) + 0.0 * vec0[0]
        (v, _, bv, bval), hist = jax.lax.scan(
            step_builder(obj, optimizer),
            (vec0, optimizer.init(vec0), vec0, big), None, length=n_iters
        )
        v_fin = obj(v)
        take_final = jnp.isfinite(v_fin) & (v_fin < bval)
        bv = jnp.where(take_final, v, bv)
        return bv, jnp.where(take_final, v_fin, bval), hist

    def shard_fn(vec0, x, y, p1, p2, p3, mask):
        vecs, finals, hists = jax.vmap(fit_one)(vec0, x, y, p1, p2, p3, mask)
        # fleet-level metrics ride one psum/pmax over ICI
        total = jax.lax.psum(jnp.sum(finals), SUBJECT_AXIS)
        lo = jax.lax.pmin(jnp.min(finals), SUBJECT_AXIS)
        hi = jax.lax.pmax(jnp.max(finals), SUBJECT_AXIS)
        return vecs, finals, hists, total, lo, hi

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 7),
        out_specs=(P(SUBJECT_AXIS), P(SUBJECT_AXIS), P(SUBJECT_AXIS), P(), P(), P()),
        # lbfgs: optax's zoom-linesearch cond mixes replicated literals into
        # the subject-varying carry (the nuts_fleet/smc_fleet situation) —
        # skip the VMA check; fit_one stays purely subject-local either way
        check_vma=(method == "adam"),
    )
    vecs, finals, hists, total, lo, hi = jax.jit(sharded)(
        init_vecs, xs, ys, pc1, pc2, pc3, masks
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


def _fleet_whiten_fns(model_name: str, n: int, m: int, hp: dict):
    """Per-subject whitening maps that ride the fleet's batched prior factors.

    The fleet already carries every subject's prior Cholesky factors (pc1,
    pc2) into the shard_map program for the objective; the prior-whitened
    reparameterization (inference/whiten.py semantics) reuses them as the
    linear map, so whitened fleet sampling costs two extra triangular ops per
    leapfrog step and no extra memory.  Returns ``(from_white, to_white)``
    taking ``(vec_or_u, pc1, pc2)``, or ``None`` for models with no latent-GP
    blocks (lmc).
    """
    from ..ops import transforms

    t = transforms.tri_size(m)
    # block tuples: (start, stop, k, which prior factor, mu, rows-layout).
    # rows=True means the segment reshapes to (k, n) task-major rows (the
    # hetero noise process); rows=False means (n, k) input-major columns.
    if model_name == "gnmgp":
        blocks = ((0, n, 1, 0, hp["mu_tilde_l"], False),
                  (n, n + n * t, t, 1, hp["mu_L"], False))
    elif model_name == "snmgp":
        blocks = ((0, n, 1, 0, hp["mu_tilde_l"], False),
                  (n, 2 * n, 1, 1, hp["mu_tilde_sigma"], False))
    elif model_name == "gnmgp_hetero":
        blocks = ((0, n, 1, 0, hp["mu_tilde_l"], False),
                  (n, n + n * t, t, 1, hp["mu_L"], False),
                  (n + n * t, n + n * t + n * m, m, 2, hp["mu_err"], True))
    else:
        return None

    def from_white(u, p1, p2, p3):
        facs = (p1, p2, p3)
        vec = u
        for (s0, s1, k, which, mu, rows) in blocks:
            l = facs[which]
            if rows:
                val = mu + u[s0:s1].reshape(k, -1) @ l.T
            else:
                val = mu + l @ u[s0:s1].reshape(-1, k)
            vec = vec.at[s0:s1].set(val.reshape(-1))
        return vec

    def to_white(v, p1, p2, p3):
        facs = (p1, p2, p3)
        u = jnp.asarray(v)
        for (s0, s1, k, which, mu, rows) in blocks:
            l = facs[which]
            if rows:
                sol = jax.scipy.linalg.solve_triangular(
                    l, (v[s0:s1].reshape(k, -1) - mu).T, lower=True
                ).T
            else:
                sol = jax.scipy.linalg.solve_triangular(
                    l, v[s0:s1].reshape(-1, k) - mu, lower=True
                )
            u = u.at[s0:s1].set(sol.reshape(-1))
        return u

    return from_white, to_white


def _fleet_whiten_logdet(model_name: str, n: int, m: int, hp: dict):
    """Per-subject log|det| of the fleet whitening map (see
    :func:`_fleet_whiten_fns` — the same block table): converts a
    whitened-space normalizing constant (smc_fleet's ``logz``) to the
    natural parameter space, mirroring ``Whitener.logdet()``.  Returns
    ``logdet_fn(p1, p2, p3) -> scalar`` or ``None`` for lmc."""
    from ..ops import transforms

    t = transforms.tri_size(m)
    if model_name == "gnmgp":
        blocks = ((1, 0), (t, 1))
    elif model_name == "snmgp":
        blocks = ((1, 0), (1, 1))
    elif model_name == "gnmgp_hetero":
        blocks = ((1, 0), (t, 1), (m, 2))
    else:
        return None

    def logdet_fn(p1, p2, p3):
        facs = (p1, p2, p3)
        total = jnp.asarray(0.0, settings.dtype)
        for k, which in blocks:
            total = total + k * jnp.sum(jnp.log(jnp.diag(facs[which])))
        return total

    return logdet_fn


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
    masses=None,
    whiten: bool = False,
    masks: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """HMC chains for a fleet of subjects, sharded over the mesh.

    Per-subject dual-averaging step-size adaptation is available via
    ``adapt_step_size``/``n_warmup`` (each subject adapts independently).
    ``masses``: optional per-subject mass matrices — (S, P) diagonal or
    (S, P, P) dense (the reference's preconditioned KAISER HMC,
    ``Stationary_model_mpiKAISER.py:205``; see :func:`pilot_mass_fleet`).
    ``whiten=True`` samples every subject's prior-whitened space (reusing the
    fleet's batched prior factors as the maps; draws come back in the natural
    space) — mutually exclusive with ``masses``, whose scales are natural-
    space.  ``masks`` (S, N) marks real observations so padded ragged
    subjects sample their *exact* posterior (same masked likelihoods as
    :func:`fit_fleet_map`).  Returns (S, n_samples, P) posterior draws.
    """
    from ..inference import hmc as hmc_mod

    _validate_fleet(model_name, xs, ys, map_vecs, masks)
    model = _MODELS[model_name]
    hp = {**model.DEFAULT_HYPERS, **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if whiten and masses is not None:
        raise ValueError("whiten=True and masses are mutually exclusive "
                         "(mass matrices are natural-space scales)")
    wfns = (
        _fleet_whiten_fns(model_name, np.asarray(xs).shape[1],
                          np.asarray(ys).shape[-1], hp)
        if whiten else None
    )

    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    map_vecs = jnp.asarray(map_vecs, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    map_vecs, _ = pad_to_multiple(map_vecs, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    if masses is None:
        masses_arr = jnp.zeros((xs.shape[0], 0), settings.dtype)
    else:
        masses_arr = jnp.asarray(masses, settings.dtype)
        masses_arr, _ = pad_to_multiple(masses_arr, n_dev)
    masked = masks is not None
    if masked:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2, pc3 = _batched_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp(model_name, hp, masked=masked)

    def chain_one(vec0, x, y, p1, p2, p3, k, mass, mask):
        args = (x, y, p1, p2, p3) + ((mask,) if masked else ())
        if wfns is not None:
            fw, tw = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), *args)
            vec0 = tw(vec0, p1, p2, p3)
        else:
            pot = lambda v: nlp(v, *args)
        res = hmc_mod.hmc_sample(
            pot, vec0, n_samples, k, step_size=step_size, n_leapfrog=n_leapfrog,
            n_warmup=n_warmup, adapt_step_size=adapt_step_size,
            target_accept=target_accept,
            mass_matrix=None if mass.shape[-1] == 0 else mass,
        )
        if wfns is not None:
            return jax.vmap(lambda u: wfns[0](u, p1, p2, p3))(res.samples)
        return res.samples

    def shard_fn(vec0, x, y, p1, p2, p3, k, mass, mask):
        return jax.vmap(chain_one)(vec0, x, y, p1, p2, p3, k, mass, mask)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 9),
        out_specs=P(SUBJECT_AXIS),
    )
    samples = jax.jit(sharded)(map_vecs, xs, ys, pc1, pc2, pc3, keys,
                               masses_arr, masks)
    return samples[:s_real]


def nuts_fleet(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    map_vecs: jnp.ndarray,  # (S, P) warm starts
    key,
    n_samples: int = 100,
    step_size: float = 0.1,
    n_warmup: int = 200,
    max_depth: int = 8,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    whiten: bool = False,
    masks: jnp.ndarray | None = None,
):
    """Adaptive NUTS chains for a fleet of subjects, sharded over the mesh.

    The zero-tuning counterpart of :func:`hmc_fleet`: every subject runs the
    windowed-warmup tree-doubling sampler (inference/nuts.py — one fixed-shape
    XLA program, so it vmaps across subjects and shards across devices like
    the HMC fleet), adapting its own step size and diagonal metric.
    ``whiten=True`` samples each subject's prior-whitened space via the
    fleet's batched prior factors; ``masks`` (S, N) makes padded ragged
    subjects exact.  Returns ``(samples (S, T, P), accept_stat (S,))``.
    """
    from ..inference import nuts as nuts_mod

    _validate_fleet(model_name, xs, ys, map_vecs, masks)
    model = _MODELS[model_name]
    hp = {**model.DEFAULT_HYPERS, **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    wfns = (
        _fleet_whiten_fns(model_name, np.asarray(xs).shape[1],
                          np.asarray(ys).shape[-1], hp)
        if whiten else None
    )

    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    map_vecs = jnp.asarray(map_vecs, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    map_vecs, _ = pad_to_multiple(map_vecs, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    masked = masks is not None
    if masked:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2, pc3 = _batched_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp(model_name, hp, masked=masked)

    def chain_one(vec0, x, y, p1, p2, p3, k, mask):
        args = (x, y, p1, p2, p3) + ((mask,) if masked else ())
        if wfns is not None:
            fw, tw = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), *args)
            vec0 = tw(vec0, p1, p2, p3)
        else:
            pot = lambda v: nlp(v, *args)
        res = nuts_mod.nuts_sample(
            pot, vec0, n_samples, k, step_size=step_size, n_warmup=n_warmup,
            max_depth=max_depth,
        )
        samples = res.samples
        if wfns is not None:
            samples = jax.vmap(lambda u: wfns[0](u, p1, p2, p3))(samples)
        return samples, jnp.mean(res.accept_stat[n_warmup:])

    def shard_fn(vec0, x, y, p1, p2, p3, k, mask):
        return jax.vmap(chain_one)(vec0, x, y, p1, p2, p3, k, mask)

    # check_vma=False: the NUTS U-turn while_loop mixes replicated literals
    # into its carry, which the varying-mask analysis rejects; chain_one is
    # purely subject-local (no collectives), so the check buys nothing here
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 8),
        out_specs=(P(SUBJECT_AXIS), P(SUBJECT_AXIS)),
        check_vma=False,
    )
    samples, accept = jax.jit(sharded)(map_vecs, xs, ys, pc1, pc2, pc3, keys, masks)
    return samples[:s_real], accept[:s_real]


def drhmc_fleet(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    map_vecs: jnp.ndarray,  # (S, P) warm starts
    key,
    n_samples: int = 100,
    step_size: float = 1e-3,
    n_leapfrog: int = 20,
    n_warmup: int = 200,
    n_stages: int = 3,
    reduction: float = 4.0,
    target_accept: float = 0.8,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    whiten: bool = False,
    masks: jnp.ndarray | None = None,
):
    """Delayed-rejection HMC chains for a fleet, sharded over the mesh.

    The funnel-neck counterpart of :func:`hmc_fleet` (see
    inference/drhmc.py).  Under ``vmap`` the per-draw ``lax.cond`` retry
    stages lower to both-branch selects, so every subject pays the worst
    case ``2**n_stages - 1`` trajectories per draw in lockstep — prefer the
    whitened NUTS fleet unless necks are the diagnosed obstruction.
    ``whiten``/``masks`` behave exactly as in :func:`hmc_fleet`.  Returns
    ``(samples (S, T, P), accept_stage (S, n_total))``.
    """
    from ..inference import drhmc as drhmc_mod

    _validate_fleet(model_name, xs, ys, map_vecs, masks)
    model = _MODELS[model_name]
    hp = {**model.DEFAULT_HYPERS, **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    wfns = (
        _fleet_whiten_fns(model_name, np.asarray(xs).shape[1],
                          np.asarray(ys).shape[-1], hp)
        if whiten else None
    )

    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    map_vecs = jnp.asarray(map_vecs, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    map_vecs, _ = pad_to_multiple(map_vecs, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    masked = masks is not None
    if masked:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2, pc3 = _batched_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp(model_name, hp, masked=masked)

    def chain_one(vec0, x, y, p1, p2, p3, k, mask):
        args = (x, y, p1, p2, p3) + ((mask,) if masked else ())
        if wfns is not None:
            fw, tw = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), *args)
            vec0 = tw(vec0, p1, p2, p3)
        else:
            pot = lambda v: nlp(v, *args)
        res = drhmc_mod.drhmc_sample(
            pot, vec0, n_samples, k, step_size=step_size,
            n_leapfrog=n_leapfrog, n_warmup=n_warmup, n_stages=n_stages,
            reduction=reduction, target_accept=target_accept,
        )
        samples = res.samples
        if wfns is not None:
            samples = jax.vmap(lambda u: wfns[0](u, p1, p2, p3))(samples)
        return samples, res.accept_stage

    def shard_fn(vec0, x, y, p1, p2, p3, k, mask):
        return jax.vmap(chain_one)(vec0, x, y, p1, p2, p3, k, mask)

    # check_vma=False for the same reason as nuts_fleet: the retry-stage
    # lax.cond mixes replicated literals into a subject-varying carry, which
    # the varying-mask analysis rejects; chain_one is purely subject-local
    # (no collectives), so the check buys nothing here
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 8),
        out_specs=(P(SUBJECT_AXIS), P(SUBJECT_AXIS)),
        check_vma=False,
    )
    samples, stages = jax.jit(sharded)(map_vecs, xs, ys, pc1, pc2, pc3,
                                       keys, masks)
    return samples[:s_real], stages[:s_real]


def chees_fleet(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    map_vecs: jnp.ndarray,  # (S, P) warm starts
    key,
    n_samples: int = 100,
    n_chains: int = 8,
    step_size: float = 0.01,
    n_warmup: int = 200,
    max_leapfrog: int = 256,
    chain_jitter: float = 0.5,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    whiten: bool = False,
    masks: jnp.ndarray | None = None,
    descend_iters: int = 300,
):
    """ChEES-HMC chains for a fleet of subjects, sharded over the mesh.

    The many-chain tier (inference/chees.py) per subject: each subject runs
    ``n_chains`` lockstep chains whose trajectory length follows the
    cross-chain ChEES criterion, vmapped across subjects and sharded across
    devices — the device sees (subjects-per-device × chains)-row batches, a
    deeper MXU fill than any single-chain fleet.  ``whiten=True`` samples
    each subject's prior-whitened space via the fleet's batched prior
    factors; ``masks`` (S, N) makes padded ragged subjects exact.  Chain 0
    starts at the MAP, chains 1..C-1 at ``chain_jitter``-jittered inits
    pulled back into the typical set by ``descend_iters`` guarded Adam
    steps (``inference.init.multichain_starts`` — raw position jitter
    strands chains thousands of nats up and death-spirals the shared
    adaptation; measured numbers in that docstring), so split-R̂ across the
    returned chain axis detects non-mixing.

    Returns ``(samples (S, C, T, P), accept (S,), trajectory_length (S,))``.
    """
    from ..inference import chees as chees_mod
    from ..inference import init as init_mod

    _validate_fleet(model_name, xs, ys, map_vecs, masks)
    model = _MODELS[model_name]
    hp = {**model.DEFAULT_HYPERS, **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    wfns = (
        _fleet_whiten_fns(model_name, np.asarray(xs).shape[1],
                          np.asarray(ys).shape[-1], hp)
        if whiten else None
    )

    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    map_vecs = jnp.asarray(map_vecs, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    map_vecs, _ = pad_to_multiple(map_vecs, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    masked = masks is not None
    if masked:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2, pc3 = _batched_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp(model_name, hp, masked=masked)

    def chain_one(vec0, x, y, p1, p2, p3, k, mask):
        args = (x, y, p1, p2, p3) + ((mask,) if masked else ())
        if wfns is not None:
            fw, tw = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), *args)
            vec0 = tw(vec0, p1, p2, p3)
        else:
            pot = lambda v: nlp(v, *args)
        k_start, k_run = jax.random.split(k)
        starts = init_mod.multichain_starts(
            pot, vec0, n_chains, k_start,
            jitter=chain_jitter, descent_iters=descend_iters,
        )
        res = chees_mod.chees_sample(
            pot, starts, n_samples, k_run,
            step_size=step_size, n_warmup=n_warmup,
            max_leapfrog=max_leapfrog,
        )
        samples = res.samples  # (C, T, P)
        if wfns is not None:
            samples = jax.vmap(jax.vmap(lambda u: wfns[0](u, p1, p2, p3)))(samples)
        accept = jnp.mean(res.accept_prob[n_warmup:])
        return samples, accept, res.trajectory_length

    def shard_fn(vec0, x, y, p1, p2, p3, k, mask):
        return jax.vmap(chain_one)(vec0, x, y, p1, p2, p3, k, mask)

    # check_vma=False for the same reason as nuts_fleet: the lockstep
    # leapfrog while_loop mixes replicated literals into a subject-varying
    # carry; chain_one is purely subject-local (no collectives)
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 8),
        out_specs=(P(SUBJECT_AXIS), P(SUBJECT_AXIS), P(SUBJECT_AXIS)),
        check_vma=False,
    )
    samples, accept, traj = jax.jit(sharded)(
        map_vecs, xs, ys, pc1, pc2, pc3, keys, masks
    )
    return samples[:s_real], accept[:s_real], traj[:s_real]


class SMCFleetResult(NamedTuple):
    particles: jnp.ndarray  # (S, N_particles, P) natural-space particles
    logz: jnp.ndarray  # (S,) natural-space log evidence per subject
    beta_final: jnp.ndarray  # (S,) 1.0 where the tempering path completed
    n_stages: jnp.ndarray  # (S,) adaptive stage counts
    accept: jnp.ndarray  # (S,) final-stage mean mutation accept


def resolve_smc_dispatch(dispatch: str, mesh: Mesh | None) -> str:
    """Map ``"auto"`` to the measured-safe fleet-SMC posture per hardware.

    On CPU meshes and multi-chip slices the fleet runs as ONE vmapped +
    sharded device program (``"device"`` — the MXU-filling shape).  On a
    *single non-CPU chip* a fleet SMC at model scale is a minutes-long
    single-program execution, the tunneled-TPU runtime's documented
    device-fault class (CLAUDE.md); ``"auto"`` picks ``"host"`` there —
    a per-subject host-dispatched tempering loop (one XLA dispatch per
    stage, ``inference.smc.smc_sample(dispatch="host")``), same draws at
    the same key (tests/test_fleet.py pins fleet-vs-host equality).
    """
    if dispatch not in ("auto", "device", "host"):
        raise ValueError(f"unknown dispatch {dispatch!r} "
                         "(want 'auto', 'device' or 'host')")
    if dispatch != "auto":
        return dispatch
    devs = list(mesh.devices.flat) if mesh is not None else jax.devices()
    one_chip = len(devs) == 1 and devs[0].platform != "cpu"
    return "host" if one_chip else "device"


def _host_smc_fleet_loop(subject_host, s_real: int) -> SMCFleetResult:
    """Assemble an :class:`SMCFleetResult` from a per-subject host loop.

    ``subject_host(i)`` runs subject ``i``'s full tempering path with
    ``dispatch="host"`` and returns the same 5-tuple as the device fleet's
    ``subject_one`` — the eager counterpart of the vmapped program, for the
    single-real-chip posture (:func:`resolve_smc_dispatch`).
    """
    rows = [subject_host(i) for i in range(s_real)]
    parts, logz, bf, ns, acc = zip(*rows)
    return SMCFleetResult(
        particles=jnp.stack(parts),
        logz=jnp.stack(logz),
        beta_final=jnp.stack(bf),
        n_stages=jnp.stack(ns),
        accept=jnp.stack(acc),
    )


def smc_fleet(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    key,
    n_particles: int = 256,
    n_mutations: int = 5,
    n_leapfrog: int = 10,
    target_cess: float = 0.5,
    dr_reduction: float = 0.0,
    metric: str = "full",
    n_polish: int = 0,
    waste_free: int = 0,
    resample_ess: float = 1.0,
    resample: str = "systematic",
    max_stages: int = 64,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    whiten: bool = True,
    masks: jnp.ndarray | None = None,
    dispatch: str = "auto",
) -> SMCFleetResult:
    """Adaptive tempered SMC for a fleet of subjects, sharded over the mesh.

    The between-basin tier (inference/smc.py) per subject: each subject's
    particle population follows its own adaptive prior→posterior tempering
    schedule, vmapped across subjects and sharded across devices — the
    device integrates (subjects-per-device × particles)-row leapfrog
    batches, the deepest MXU fill of any fleet sampler.  Needs no MAP warm
    start (populations start at the prior), so it can run *before* or
    without the MAP stage.  ``whiten=True`` (default — the reference
    distribution is then the exact latent-GP prior) samples each subject's
    prior-whitened space via the fleet's batched prior factors; ``masks``
    (S, N) makes padded ragged subjects exact.  ``logz`` comes back in the
    *natural* space (the whitening Jacobian is added per subject), so
    per-subject Bayes factors across models are directly comparable.

    Under vmap the per-subject ``while_loop`` runs until the slowest
    subject's schedule completes (others no-op); per-subject ``n_stages``
    and ``beta_final`` land in the result.  Particles are exchangeable, so
    any leading subset serves as a chain-sample draw matrix downstream.

    ``dispatch="auto"`` (default) picks the posture per hardware
    (:func:`resolve_smc_dispatch`): the single vmapped device program on
    CPU meshes and multi-chip slices, a per-subject host-dispatched
    tempering loop on one real chip — where the fleet program at model
    scale is the tunneled-TPU runtime's device-fault class (CLAUDE.md).
    Same draws at the same key either way.
    """
    from ..inference import smc as smc_mod

    s_in = np.asarray(xs).shape[0]
    _validate_fleet(model_name, xs, ys,
                    jnp.zeros((s_in, 1), settings.dtype), masks)
    model = _MODELS[model_name]
    hp = {**model.DEFAULT_HYPERS, **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n_pts, m = np.asarray(xs).shape[1], np.asarray(ys).shape[-1]
    wfns = _fleet_whiten_fns(model_name, n_pts, m, hp) if whiten else None
    ld_fn = _fleet_whiten_logdet(model_name, n_pts, m, hp) if whiten else None
    p_dim = (model.n_params(m) if model_name == "lmc"
             else model.n_params(n_pts, m))

    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    masked = masks is not None
    if masked:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2, pc3 = _batched_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp(model_name, hp, masked=masked)

    def subject_one(x, y, p1, p2, p3, k, mask, smc_dispatch="device"):
        args = (x, y, p1, p2, p3) + ((mask,) if masked else ())
        if wfns is not None:
            fw, _ = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), *args)
        else:
            pot = lambda v: nlp(v, *args)
        r = smc_mod.smc_sample(
            pot, p_dim, k, n_particles,
            n_mutations=n_mutations, n_leapfrog=n_leapfrog,
            target_cess=target_cess, dr_reduction=dr_reduction,
            metric=metric, n_polish=n_polish, waste_free=waste_free,
            resample_ess=resample_ess, resample=resample,
            max_stages=max_stages, dtype=settings.dtype,
            dispatch=smc_dispatch,
        )
        parts = r.particles
        logz = r.logz
        if wfns is not None:
            parts = jax.vmap(lambda u: wfns[0](u, p1, p2, p3))(parts)
            logz = logz + ld_fn(p1, p2, p3)
        ns = jnp.maximum(r.n_stages, 1)
        acc = jnp.take(r.accept, ns - 1)
        return parts, logz, r.beta_final, r.n_stages, acc

    if resolve_smc_dispatch(dispatch, mesh) == "host":
        return _host_smc_fleet_loop(
            lambda i: subject_one(xs[i], ys[i], pc1[i], pc2[i], pc3[i],
                                  keys[i], masks[i], smc_dispatch="host"),
            s_real,
        )

    def shard_fn(x, y, p1, p2, p3, k, mask):
        return jax.vmap(subject_one)(x, y, p1, p2, p3, k, mask)

    # check_vma=False for the same reason as nuts_fleet: the tempering
    # while_loop mixes replicated literals into a subject-varying carry;
    # subject_one is purely subject-local (no collectives)
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 7),
        out_specs=tuple([P(SUBJECT_AXIS)] * 5),
        check_vma=False,
    )
    parts, logz, bf, ns, acc = jax.jit(sharded)(
        xs, ys, pc1, pc2, pc3, keys, masks
    )
    return SMCFleetResult(
        particles=parts[:s_real],
        logz=logz[:s_real],
        beta_final=bf[:s_real],
        n_stages=ns[:s_real],
        accept=acc[:s_real],
    )


class PathfinderFleetResult(NamedTuple):
    draws: jnp.ndarray  # (S, n_out, P) natural-space PSIS-resampled draws
    k_hat: np.ndarray  # (S,) PSIS Pareto-shape diagnostic per subject
    elbo: jnp.ndarray  # (S,) best per-subject ELBO (whitened space)
    log_evidence: np.ndarray  # (S,) natural-space IS evidence estimate


def pathfinder_fleet(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    key,
    n_paths: int = 8,
    n_out: int = 256,
    max_iters: int = 100,
    memory: int = 6,
    n_elbo: int = 32,
    n_draws: int = 200,
    jitter: float = 2.0,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    whiten: bool = True,
    sweep_chunk: int = 256,
    masks: jnp.ndarray | None = None,
    vecs: jnp.ndarray | None = None,
) -> PathfinderFleetResult:
    """Multi-path Pathfinder for a fleet of subjects, sharded over the mesh.

    The variational tier (inference/pathfinder.py) per subject: ``n_paths``
    L-BFGS paths vmapped *inside* each subject, subjects vmapped inside
    each shard — the device integrates (subjects-per-device × paths)-row
    quasi-Newton batches plus one (paths × iters × n_elbo)-row ELBO sweep,
    the same MXU-filling shape as the fleet MAP engine it reuses.  Each
    subject's pooled draws are PSIS-smoothed and Gumbel-top-k resampled on
    the host (tiny: R = paths × draws rows of numpy per subject).

    Needs no MAP warm start: paths launch from ``jitter``-scaled normal
    starts around the whitened origin (= the latent-GP prior mean), or
    around ``vecs`` (S, P) natural-space centers when given.  ``masks``
    (S, N) makes padded ragged subjects exact.  ``log_evidence`` comes back
    in the *natural* space (whitening Jacobian added per subject) like
    ``smc_fleet.logz`` — but it is the self-normalized IS estimate under an
    approximate proposal: treat ``k_hat > 0.7`` subjects as unreliable and
    escalate them to ``smc_fleet`` (the calibrated telescope).

    No reference counterpart (the reference's only samplers are externally
    budgeted HMC chains); this is the seconds-scale cohort posture.
    """
    from ..inference import pathfinder as pf_mod

    s_in = np.asarray(xs).shape[0]
    _validate_fleet(model_name, xs, ys,
                    jnp.zeros((s_in, 1), settings.dtype), masks)
    model = _MODELS[model_name]
    hp = {**model.DEFAULT_HYPERS, **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n_pts, m = np.asarray(xs).shape[1], np.asarray(ys).shape[-1]
    wfns = _fleet_whiten_fns(model_name, n_pts, m, hp) if whiten else None
    ld_fn = _fleet_whiten_logdet(model_name, n_pts, m, hp) if whiten else None
    p_dim = (model.n_params(m) if model_name == "lmc"
             else model.n_params(n_pts, m))

    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    masked = masks is not None
    if masked:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)
    if vecs is not None:
        vecs = jnp.asarray(vecs, settings.dtype)
        vecs, _ = pad_to_multiple(vecs, n_dev)
    else:
        vecs = jnp.zeros((xs.shape[0], p_dim), settings.dtype)

    pc1, pc2, pc3 = _batched_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp(model_name, hp, masked=masked)

    def subject_one(x, y, p1, p2, p3, k, mask, center):
        args = (x, y, p1, p2, p3) + ((mask,) if masked else ())
        if wfns is not None:
            fw, tw = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), *args)
            center = tw(center, p1, p2, p3)
        else:
            pot = lambda v: nlp(v, *args)
        k_init, k_run = jax.random.split(k)
        starts = center + jitter * jax.random.normal(
            k_init, (int(n_paths), p_dim), settings.dtype
        )
        runs = jax.vmap(
            lambda s0, kk: pf_mod._pathfinder_jit(
                pot, s0, kk, int(max_iters), int(memory), int(n_elbo),
                int(n_draws), sweep_chunk=int(sweep_chunk),
            )
        )(starts, jax.random.split(k_run, int(n_paths)))
        pooled = runs.draws.reshape(-1, p_dim)
        log_w = runs.log_w.reshape(-1)
        elbo_best = jnp.max(runs.elbo)
        if wfns is not None:
            pooled = jax.vmap(lambda u: wfns[0](u, p1, p2, p3))(pooled)
            ld = ld_fn(p1, p2, p3)
        else:
            ld = jnp.zeros((), settings.dtype)
        return pooled, log_w, elbo_best, ld

    def shard_fn(x, y, p1, p2, p3, k, mask, center):
        return jax.vmap(subject_one)(x, y, p1, p2, p3, k, mask, center)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 8),
        out_specs=tuple([P(SUBJECT_AXIS)] * 4),
        check_vma=False,
    )
    pooled, log_w, elbos, lds = jax.jit(sharded)(
        xs, ys, pc1, pc2, pc3, keys, masks, vecs
    )
    draws_out, k_hats, log_ev = _pf_host_resample(
        pooled, log_w, lds, key, n_out, s_real
    )
    return PathfinderFleetResult(
        draws=jnp.asarray(draws_out),
        k_hat=k_hats,
        elbo=elbos[:s_real],
        log_evidence=log_ev,
    )


def _pf_host_resample(pooled, log_w, lds, key, n_out, s_real):
    """Per-subject PSIS smoothing + Gumbel-top-k resampling (host side).

    Tiny numpy work (R = paths × draws rows per subject), deterministic
    via per-subject folded keys.  ``lds`` (S,) whitening log-Jacobians
    lift the self-normalized IS evidence into the natural space.
    """
    from ..inference import pathfinder as pf_mod

    pooled = np.asarray(pooled)  # (S, R, P)
    log_w_np = np.asarray(log_w, dtype=np.float64)  # (S, R)
    draws_out = np.empty((s_real, int(n_out), pooled.shape[-1]),
                         pooled.dtype)
    k_hats = np.empty((s_real,))
    log_ev = np.empty((s_real,))
    for i in range(s_real):
        lw_s, kh = pf_mod.psis_smooth(log_w_np[i])
        finite = np.isfinite(log_w_np[i])
        if finite.any():
            fw_i = log_w_np[i][finite]
            mx = fw_i.max()
            log_ev[i] = (mx + np.log(np.exp(fw_i - mx).sum())
                         - np.log(finite.sum()) + float(lds[i]))
        else:
            log_ev[i] = -np.inf
        g = np.asarray(jax.random.gumbel(
            jax.random.fold_in(key, 70001 + i), (lw_s.shape[0],)
        ), dtype=np.float64)
        scores = np.where(np.isfinite(lw_s), lw_s + g, -np.inf)
        top = np.argsort(scores)[::-1][: int(n_out)]
        if top.shape[0] < int(n_out):
            # pool smaller than the requested draw count (n_out >
            # paths x draws): cycle the ranked indices rather than crash
            # on the fixed-width row assignment
            top = np.resize(top, int(n_out))
        draws_out[i] = pooled[i][np.ascontiguousarray(top)]
        k_hats[i] = kh
    return draws_out, k_hats, log_ev


def pathfinder_fleet_hadamard(
    model_name: str,
    xs: jnp.ndarray,  # (S, N)
    indxs: jnp.ndarray,  # (S, N) int task indices
    ys: jnp.ndarray,  # (S, N)
    m: int,
    key,
    n_paths: int = 8,
    n_out: int = 256,
    max_iters: int = 100,
    memory: int = 6,
    n_elbo: int = 32,
    n_draws: int = 200,
    jitter: float = 2.0,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    whiten: bool = True,
    sweep_chunk: int = 256,
    masks: jnp.ndarray | None = None,
    vecs: jnp.ndarray | None = None,
) -> PathfinderFleetResult:
    """Multi-path Pathfinder for a fleet of Hadamard-layout subjects.

    The Hadamard counterpart of :func:`pathfinder_fleet` (same contract:
    whitened-origin or ``vecs``-centered starts, per-subject PSIS +
    Gumbel-top-k on host, natural-space IS evidence, ``k_hat > 0.7`` =
    escalate to :func:`smc_fleet_hadamard`).
    """
    from ..inference import pathfinder as pf_mod

    s_in = np.asarray(xs).shape[0]
    _validate_fleet(model_name, xs, ys,
                    jnp.zeros((s_in, 1), settings.dtype), masks,
                    hadamard=True)
    if model_name not in _HADAMARD_HYPERS:
        raise ValueError(
            f"no Hadamard-layout objective for {model_name!r} (want one of "
            f"{sorted(_HADAMARD_HYPERS)})"
        )
    hp = {**_HADAMARD_HYPERS[model_name], **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n_pts = np.asarray(xs).shape[1]
    wfns = _fleet_whiten_fns(model_name, n_pts, m, hp) if whiten else None
    ld_fn = _fleet_whiten_logdet(model_name, n_pts, m, hp) if whiten else None
    p_dim = _hadamard_n_params(model_name, n_pts, m)

    xs = jnp.asarray(xs, settings.dtype)
    indxs = jnp.asarray(indxs, jnp.int32)
    ys = jnp.asarray(ys, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    indxs, _ = pad_to_multiple(indxs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    if masks is not None:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)
    if vecs is not None:
        vecs = jnp.asarray(vecs, settings.dtype)
        vecs, _ = pad_to_multiple(vecs, n_dev)
    else:
        vecs = jnp.zeros((xs.shape[0], p_dim), settings.dtype)

    pc1, pc2 = _batched_hadamard_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp_hadamard(model_name, m, hp)

    def subject_one(x, indx, y, p1, p2, k, mask, center):
        p3 = jnp.zeros((0,), p1.dtype)
        if wfns is not None:
            fw, tw = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), x, indx, y, p1, p2, mask)
            center = tw(center, p1, p2, p3)
        else:
            pot = lambda v: nlp(v, x, indx, y, p1, p2, mask)
        k_init, k_run = jax.random.split(k)
        starts = center + jitter * jax.random.normal(
            k_init, (int(n_paths), p_dim), settings.dtype
        )
        runs = jax.vmap(
            lambda s0, kk: pf_mod._pathfinder_jit(
                pot, s0, kk, int(max_iters), int(memory), int(n_elbo),
                int(n_draws), sweep_chunk=int(sweep_chunk),
            )
        )(starts, jax.random.split(k_run, int(n_paths)))
        pooled = runs.draws.reshape(-1, p_dim)
        log_w = runs.log_w.reshape(-1)
        elbo_best = jnp.max(runs.elbo)
        if wfns is not None:
            pooled = jax.vmap(lambda u: wfns[0](u, p1, p2, p3))(pooled)
            ld = ld_fn(p1, p2, p3)
        else:
            ld = jnp.zeros((), settings.dtype)
        return pooled, log_w, elbo_best, ld

    def shard_fn(x, indx, y, p1, p2, k, mask, center):
        return jax.vmap(subject_one)(x, indx, y, p1, p2, k, mask, center)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 8),
        out_specs=tuple([P(SUBJECT_AXIS)] * 4),
        check_vma=False,
    )
    pooled, log_w, elbos, lds = jax.jit(sharded)(
        xs, indxs, ys, pc1, pc2, keys, masks, vecs
    )
    draws_out, k_hats, log_ev = _pf_host_resample(
        pooled, log_w, lds, key, n_out, s_real
    )
    return PathfinderFleetResult(
        draws=jnp.asarray(draws_out),
        k_hat=k_hats,
        elbo=elbos[:s_real],
        log_evidence=log_ev,
    )


def descend_starts(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    vecs: jnp.ndarray,  # (U, P) starts, one per unit
    *,
    hyper: dict | None = None,
    masks: jnp.ndarray | None = None,
    iters: int = 300,
    lr: float = 1e-1,
    keep: jnp.ndarray | None = None,
):
    """Pull jittered multichain starts back into the typical set, batched.

    Runs ``iters`` guarded Adam steps of each unit's posterior potential
    (natural space — the typical set is parameterization-independent) on
    every row of ``vecs``, vmapped so the whole fleet descends as one
    program.  ``keep`` (U,) bool marks units to leave untouched (the
    chain-0-at-the-MAP convention).  Units whose descended potential is
    non-finite also keep their original start.

    Why: raw position jitter strands chains thousands of nats above a sharp
    posterior's typical set, no realistic warmup relaxes them, and shared
    (ChEES) adaptation death-spirals — measured numbers in
    ``inference.init.multichain_starts``.
    """
    from ..inference import init as init_mod

    _validate_fleet(model_name, xs, ys, vecs, masks)
    hp = {**_MODELS[model_name].DEFAULT_HYPERS, **(hyper or {})}
    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    vecs = jnp.asarray(vecs, settings.dtype)
    pc1, pc2, pc3 = _batched_prior_chols(model_name, xs, hp)
    masked = masks is not None
    nlp = _subject_nlp(model_name, hp, masked=masked)
    if masked:
        masks = jnp.asarray(masks, bool)
    else:
        masks = jnp.ones(xs.shape[:2], bool)

    def one(v, x, y, p1, p2, p3, m):
        args = (x, y, p1, p2, p3) + ((m,) if masked else ())
        pot = lambda u: nlp(u, *args)
        vf = init_mod.adam_descent(pot, v, iters, lr=lr)
        return jnp.where(jnp.isfinite(pot(vf)), vf, v)

    out = jax.jit(jax.vmap(one))(vecs, xs, ys, pc1, pc2, pc3, masks)
    if keep is not None:
        out = jnp.where(jnp.asarray(keep, bool)[:, None], vecs, out)
    return out


def descend_starts_hadamard(
    model_name: str,
    xs: jnp.ndarray,
    indxs: jnp.ndarray,
    ys: jnp.ndarray,
    m: int,
    vecs: jnp.ndarray,
    *,
    hyper: dict | None = None,
    masks: jnp.ndarray | None = None,
    iters: int = 300,
    lr: float = 1e-1,
    keep: jnp.ndarray | None = None,
):
    """:func:`descend_starts` for the Hadamard (input, task)-pair layout."""
    from ..inference import init as init_mod

    if model_name not in _HADAMARD_HYPERS:
        raise ValueError(
            f"no Hadamard-layout objective for {model_name!r} (want one of "
            f"{sorted(_HADAMARD_HYPERS)})"
        )
    hp = {**_HADAMARD_HYPERS[model_name], **(hyper or {})}
    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    vecs = jnp.asarray(vecs, settings.dtype)
    indxs = jnp.asarray(indxs, jnp.int32)
    pc1, pc2 = _batched_hadamard_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp_hadamard(model_name, m, hp)
    if masks is None:
        masks = jnp.ones(xs.shape, bool)
    else:
        masks = jnp.asarray(masks, bool)

    def one(v, x, ix, y, p1, p2, mk):
        pot = lambda u: nlp(u, x, ix, y, p1, p2, mk)
        vf = init_mod.adam_descent(pot, v, iters, lr=lr)
        return jnp.where(jnp.isfinite(pot(vf)), vf, v)

    out = jax.jit(jax.vmap(one))(vecs, xs, indxs, ys, pc1, pc2, masks)
    if keep is not None:
        out = jnp.where(jnp.asarray(keep, bool)[:, None], vecs, out)
    return out


# ---------------------------------------------------------------------------
# Hadamard-layout fleets (one observation per (input, task) pair).
# ---------------------------------------------------------------------------

#: Reference Hadamard hyper defaults (alpha=1 family, logpos.py:566-585, :465).
_HADAMARD_HYPERS = {
    "lmc": {"mu_tilde_l": 0.0, "sigma_tilde_l": 1.0, "a": 1.0, "b": 1.0, "c": 10.0},
    "snmgp": {
        "mu_tilde_l": 0.0, "alpha_tilde_l": 1.0, "beta_tilde_l": 1.0,
        "mu_tilde_sigma": 0.0, "alpha_tilde_sigma": 1.0, "beta_tilde_sigma": 1.0,
        "a": 1.0, "b": 1.0, "c": 10.0,
    },
    "gnmgp": {
        "mu_tilde_l": 0.0, "alpha_tilde_l": 1.0, "beta_tilde_l": 1.0,
        "mu_L": 0.0, "alpha_L": 1.0, "beta_L": 1.0, "a": 1.0, "b": 1.0,
    },
}


def _hadamard_prior_alphas(model_name: str, hp: dict):
    if model_name == "snmgp":
        return (hp["alpha_tilde_l"], hp["beta_tilde_l"],
                hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"])
    if model_name == "gnmgp":
        return (hp["alpha_tilde_l"], hp["beta_tilde_l"], hp["alpha_L"], hp["beta_L"])
    return None


def _batched_hadamard_prior_chols(model_name: str, xs: jnp.ndarray, hp: dict):
    """Stack per-subject Hadamard prior factors (host-f64 islands)."""
    alphas = _hadamard_prior_alphas(model_name, hp)
    if alphas is None:  # lmc: no GP priors
        s = xs.shape[0]
        return jnp.zeros((s, 0)), jnp.zeros((s, 0))
    a1, b1, a2, b2 = alphas
    pcs = [
        (chol_ops.prior_rbf_cholesky(xs[i], a1, b1),
         chol_ops.prior_rbf_cholesky(xs[i], a2, b2))
        for i in range(xs.shape[0])
    ]
    return jnp.stack([p[0] for p in pcs]), jnp.stack([p[1] for p in pcs])


def _subject_nlp_hadamard(model_name: str, m: int, hp: dict):
    """Per-subject Hadamard objective fn(vec, x, indx, y, pc1, pc2, mask)."""
    from ..models.base import HadamardData

    model = _MODELS[model_name]

    def nlp(vec, x, indx, y, pc1, pc2, mask):
        data = HadamardData(x, indx, y)
        if model_name == "lmc":
            p = model.unpack(vec, m)
            res, _ = model.log_posterior_hadamard(p, data, m, mask=mask, **hp)
        elif model_name == "snmgp":
            p = model.unpack(vec, y.shape[0], m)
            res, _ = model.log_posterior_hadamard(
                p, data, m, prior_chol_l=pc1, prior_chol_sigma=pc2, mask=mask, **hp
            )
        else:
            p = model.unpack(vec, y.shape[0], m)
            res, _ = model.log_posterior_hadamard(
                p, data, m, prior_chol_l=pc1, prior_chol_L=pc2, mask=mask, **hp
            )
        return -res

    return nlp


def _hadamard_n_params(model_name: str, n: int, m: int) -> int:
    """Packed Hadamard-layout parameter count (workflows.run_cohort_hadamard
    init convention)."""
    from ..ops import transforms

    t = transforms.tri_size(m)
    return {"lmc": 2 + t + 1, "snmgp": 2 * n + t + 1,
            "gnmgp": n + n * t + 1}[model_name]


def smc_fleet_hadamard(
    model_name: str,
    xs: jnp.ndarray,  # (S, N)
    indxs: jnp.ndarray,  # (S, N) int task indices
    ys: jnp.ndarray,  # (S, N)
    m: int,
    key,
    n_particles: int = 256,
    n_mutations: int = 5,
    n_leapfrog: int = 10,
    target_cess: float = 0.5,
    dr_reduction: float = 0.0,
    metric: str = "full",
    n_polish: int = 0,
    waste_free: int = 0,
    resample_ess: float = 1.0,
    resample: str = "systematic",
    max_stages: int = 64,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    whiten: bool = True,
    masks: jnp.ndarray | None = None,
    dispatch: str = "auto",
) -> SMCFleetResult:
    """Adaptive tempered SMC for a fleet of Hadamard-layout subjects.

    The Hadamard counterpart of :func:`smc_fleet` (same contract and
    defaults: prior-whitened reference, full population-covariance metric,
    per-subject natural-space evidence, no MAP warm start needed,
    hardware-resolved ``dispatch`` — :func:`resolve_smc_dispatch`).
    """
    from ..inference import smc as smc_mod

    s_in = np.asarray(xs).shape[0]
    _validate_fleet(model_name, xs, ys,
                    jnp.zeros((s_in, 1), settings.dtype), masks,
                    hadamard=True)
    if model_name not in _HADAMARD_HYPERS:
        raise ValueError(
            f"no Hadamard-layout objective for {model_name!r} (want one of "
            f"{sorted(_HADAMARD_HYPERS)})"
        )
    hp = {**_HADAMARD_HYPERS[model_name], **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n_pts = np.asarray(xs).shape[1]
    wfns = _fleet_whiten_fns(model_name, n_pts, m, hp) if whiten else None
    ld_fn = _fleet_whiten_logdet(model_name, n_pts, m, hp) if whiten else None
    p_dim = _hadamard_n_params(model_name, n_pts, m)

    xs = jnp.asarray(xs, settings.dtype)
    indxs = jnp.asarray(indxs, jnp.int32)
    ys = jnp.asarray(ys, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    indxs, _ = pad_to_multiple(indxs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    if masks is not None:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2 = _batched_hadamard_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp_hadamard(model_name, m, hp)

    def subject_one(x, indx, y, p1, p2, k, mask, smc_dispatch="device"):
        p3 = jnp.zeros((0,), p1.dtype)
        if wfns is not None:
            fw, _ = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), x, indx, y, p1, p2, mask)
        else:
            pot = lambda v: nlp(v, x, indx, y, p1, p2, mask)
        r = smc_mod.smc_sample(
            pot, p_dim, k, n_particles,
            n_mutations=n_mutations, n_leapfrog=n_leapfrog,
            target_cess=target_cess, dr_reduction=dr_reduction,
            metric=metric, n_polish=n_polish, waste_free=waste_free,
            resample_ess=resample_ess, resample=resample,
            max_stages=max_stages, dtype=settings.dtype,
            dispatch=smc_dispatch,
        )
        parts = r.particles
        logz = r.logz
        if wfns is not None:
            parts = jax.vmap(lambda u: wfns[0](u, p1, p2, p3))(parts)
            logz = logz + ld_fn(p1, p2, p3)
        ns = jnp.maximum(r.n_stages, 1)
        acc = jnp.take(r.accept, ns - 1)
        return parts, logz, r.beta_final, r.n_stages, acc

    if resolve_smc_dispatch(dispatch, mesh) == "host":
        return _host_smc_fleet_loop(
            lambda i: subject_one(xs[i], indxs[i], ys[i], pc1[i], pc2[i],
                                  keys[i], masks[i], smc_dispatch="host"),
            s_real,
        )

    def shard_fn(x, indx, y, p1, p2, k, mask):
        return jax.vmap(subject_one)(x, indx, y, p1, p2, k, mask)

    # check_vma=False for the same reason as nuts_fleet
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 7),
        out_specs=tuple([P(SUBJECT_AXIS)] * 5),
        check_vma=False,
    )
    parts, logz, bf, ns, acc = jax.jit(sharded)(
        xs, indxs, ys, pc1, pc2, keys, masks
    )
    return SMCFleetResult(
        particles=parts[:s_real],
        logz=logz[:s_real],
        beta_final=bf[:s_real],
        n_stages=ns[:s_real],
        accept=acc[:s_real],
    )


def fit_fleet_map_hadamard(
    model_name: str,
    xs: jnp.ndarray,  # (S, N)
    indxs: jnp.ndarray,  # (S, N) int task indices
    ys: jnp.ndarray,  # (S, N)
    m: int,
    init_vecs: jnp.ndarray,  # (S, P)
    hyper: dict | None = None,
    n_iters: int = 1000,
    lr: float = 2e-1,
    mesh: Mesh | None = None,
    masks: jnp.ndarray | None = None,
    method: str = "adam",
) -> FleetResult:
    """MAP-fit a fleet of Hadamard-layout subjects, sharded over the mesh.

    The reference's distributed drivers run this layout one subject per MPI
    rank with ``data_split_non`` (``Separable_model_distributed.py:221-259``);
    here it is one shard_map program, with ``masks`` making padded ragged
    subjects exact (``models.base.mask_dense_gram``).  ``method="lbfgs"``
    as in :func:`fit_fleet_map`.
    """
    _validate_fleet(model_name, xs, ys, init_vecs, masks, hadamard=True)
    if model_name not in _HADAMARD_HYPERS:
        raise ValueError(
            f"no Hadamard-layout objective for {model_name!r} (want one of "
            f"{sorted(_HADAMARD_HYPERS)})"
        )
    hp = {**_HADAMARD_HYPERS[model_name], **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size

    xs = jnp.asarray(xs, settings.dtype)
    indxs = jnp.asarray(indxs, jnp.int32)
    ys = jnp.asarray(ys, settings.dtype)
    init_vecs = jnp.asarray(init_vecs, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    indxs, _ = pad_to_multiple(indxs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    init_vecs, _ = pad_to_multiple(init_vecs, n_dev)
    if masks is not None:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2 = _batched_hadamard_prior_chols(model_name, xs, hp)

    nlp = _subject_nlp_hadamard(model_name, m, hp)
    if method == "lbfgs":
        optimizer = optax.lbfgs()
        step_builder = map_mod.guarded_lbfgs_step
    elif method == "adam":
        optimizer = optax.adam(lr)
        step_builder = map_mod.guarded_adam_step
    else:
        raise ValueError(f"unknown method {method!r} (want 'adam' or 'lbfgs')")

    def fit_one(vec0, x, indx, y, p1, p2, mask):
        obj = lambda v: nlp(v, x, indx, y, p1, p2, mask)

        # tie the scalar carry to vec0 so it is subject-varying under
        # shard_map (a replicated literal would change VMA across the scan)
        big = jnp.asarray(jnp.inf, vec0.dtype) + 0.0 * vec0[0]
        (v, _, bv, bval), hist = jax.lax.scan(
            step_builder(obj, optimizer),
            (vec0, optimizer.init(vec0), vec0, big), None, length=n_iters
        )
        v_fin = obj(v)
        take_final = jnp.isfinite(v_fin) & (v_fin < bval)
        bv = jnp.where(take_final, v, bv)
        return bv, jnp.where(take_final, v_fin, bval), hist

    def shard_fn(vec0, x, indx, y, p1, p2, mask):
        vecs, finals, hists = jax.vmap(fit_one)(vec0, x, indx, y, p1, p2, mask)
        total = jax.lax.psum(jnp.sum(finals), SUBJECT_AXIS)
        lo = jax.lax.pmin(jnp.min(finals), SUBJECT_AXIS)
        hi = jax.lax.pmax(jnp.max(finals), SUBJECT_AXIS)
        return vecs, finals, hists, total, lo, hi

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 7),
        out_specs=(P(SUBJECT_AXIS), P(SUBJECT_AXIS), P(SUBJECT_AXIS), P(), P(), P()),
        check_vma=(method == "adam"),  # lbfgs: see fit_fleet_map
    )
    vecs, finals, hists, total, lo, hi = jax.jit(sharded)(
        init_vecs, xs, indxs, ys, pc1, pc2, masks
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


def hmc_fleet_hadamard(
    model_name: str,
    xs: jnp.ndarray,  # (S, N)
    indxs: jnp.ndarray,  # (S, N) int task indices
    ys: jnp.ndarray,  # (S, N)
    m: int,
    map_vecs: jnp.ndarray,  # (S, P) warm starts
    key,
    n_samples: int = 100,
    step_size: float = 1e-4,
    n_leapfrog: int = 20,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    n_warmup: int = 0,
    adapt_step_size: bool = False,
    masks: jnp.ndarray | None = None,
    whiten: bool = False,
) -> jnp.ndarray:
    """HMC chains for a fleet of Hadamard-layout subjects, sharded over the mesh.

    The sampling counterpart of :func:`fit_fleet_map_hadamard` (the reference
    distributed drivers' HMC stage on the one-obs-per-(input, task) layout).
    ``masks`` makes padded ragged subjects exact; ``whiten=True`` samples the
    prior-whitened latent blocks via the fleet's batched prior factors (the
    Hadamard latent layout is per-observation, so the maps are the same
    shape as the full-layout ones).  Returns (S, n_samples, P) draws.
    """
    from ..inference import hmc as hmc_mod

    _validate_fleet(model_name, xs, ys, map_vecs, masks, hadamard=True)
    if model_name not in _HADAMARD_HYPERS:
        raise ValueError(
            f"no Hadamard-layout objective for {model_name!r} (want one of "
            f"{sorted(_HADAMARD_HYPERS)})"
        )
    hp = {**_HADAMARD_HYPERS[model_name], **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    wfns = (
        _fleet_whiten_fns(model_name, np.asarray(xs).shape[1], m, hp)
        if whiten else None
    )

    xs = jnp.asarray(xs, settings.dtype)
    indxs = jnp.asarray(indxs, jnp.int32)
    ys = jnp.asarray(ys, settings.dtype)
    map_vecs = jnp.asarray(map_vecs, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    indxs, _ = pad_to_multiple(indxs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    map_vecs, _ = pad_to_multiple(map_vecs, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    if masks is not None:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2 = _batched_hadamard_prior_chols(model_name, xs, hp)

    nlp = _subject_nlp_hadamard(model_name, m, hp)

    def chain_one(vec0, x, indx, y, p1, p2, k, mask):
        p3 = jnp.zeros((0,), p1.dtype)  # no hetero noise block in this layout
        if wfns is not None:
            fw, tw = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), x, indx, y, p1, p2, mask)
            vec0 = tw(vec0, p1, p2, p3)
        else:
            pot = lambda v: nlp(v, x, indx, y, p1, p2, mask)
        res = hmc_mod.hmc_sample(
            pot, vec0, n_samples, k, step_size=step_size,
            n_leapfrog=n_leapfrog, n_warmup=n_warmup,
            adapt_step_size=adapt_step_size,
        )
        if wfns is not None:
            return jax.vmap(lambda u: wfns[0](u, p1, p2, p3))(res.samples)
        return res.samples

    def shard_fn(vec0, x, indx, y, p1, p2, k, mask):
        return jax.vmap(chain_one)(vec0, x, indx, y, p1, p2, k, mask)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 8),
        out_specs=P(SUBJECT_AXIS),
    )
    samples = jax.jit(sharded)(map_vecs, xs, indxs, ys, pc1, pc2, keys, masks)
    return samples[:s_real]


def nuts_fleet_hadamard(
    model_name: str,
    xs: jnp.ndarray,  # (S, N)
    indxs: jnp.ndarray,  # (S, N) int task indices
    ys: jnp.ndarray,  # (S, N)
    m: int,
    map_vecs: jnp.ndarray,  # (S, P) warm starts
    key,
    n_samples: int = 100,
    step_size: float = 0.1,
    n_warmup: int = 200,
    max_depth: int = 8,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    whiten: bool = False,
    masks: jnp.ndarray | None = None,
):
    """Adaptive NUTS chains for a fleet of Hadamard-layout subjects.

    The zero-tuning counterpart of :func:`hmc_fleet_hadamard`, composing the
    Hadamard per-subject objective with the windowed-warmup tree-doubling
    sampler (inference/nuts.py) — one fixed-shape XLA program per subject,
    vmapped within a device and sharded over the mesh.  ``whiten=True``
    samples the prior-whitened latent blocks; ``masks`` makes padded ragged
    subjects exact.  Returns ``(samples (S, T, P), accept_stat (S,))``.
    """
    from ..inference import nuts as nuts_mod

    _validate_fleet(model_name, xs, ys, map_vecs, masks, hadamard=True)
    if model_name not in _HADAMARD_HYPERS:
        raise ValueError(
            f"no Hadamard-layout objective for {model_name!r} (want one of "
            f"{sorted(_HADAMARD_HYPERS)})"
        )
    hp = {**_HADAMARD_HYPERS[model_name], **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    wfns = (
        _fleet_whiten_fns(model_name, np.asarray(xs).shape[1], m, hp)
        if whiten else None
    )

    xs = jnp.asarray(xs, settings.dtype)
    indxs = jnp.asarray(indxs, jnp.int32)
    ys = jnp.asarray(ys, settings.dtype)
    map_vecs = jnp.asarray(map_vecs, settings.dtype)
    s_real = xs.shape[0]
    xs, _ = pad_to_multiple(xs, n_dev)
    indxs, _ = pad_to_multiple(indxs, n_dev)
    ys, _ = pad_to_multiple(ys, n_dev)
    map_vecs, _ = pad_to_multiple(map_vecs, n_dev)
    keys = jax.random.split(key, xs.shape[0])
    if masks is not None:
        masks = jnp.asarray(masks, bool)
        masks, _ = pad_to_multiple(masks, n_dev)
    else:
        masks = jnp.ones(xs.shape, bool)

    pc1, pc2 = _batched_hadamard_prior_chols(model_name, xs, hp)
    nlp = _subject_nlp_hadamard(model_name, m, hp)

    def chain_one(vec0, x, indx, y, p1, p2, k, mask):
        p3 = jnp.zeros((0,), p1.dtype)
        if wfns is not None:
            fw, tw = wfns
            pot = lambda u: nlp(fw(u, p1, p2, p3), x, indx, y, p1, p2, mask)
            vec0 = tw(vec0, p1, p2, p3)
        else:
            pot = lambda v: nlp(v, x, indx, y, p1, p2, mask)
        res = nuts_mod.nuts_sample(
            pot, vec0, n_samples, k, step_size=step_size, n_warmup=n_warmup,
            max_depth=max_depth,
        )
        samples = res.samples
        if wfns is not None:
            samples = jax.vmap(lambda u: wfns[0](u, p1, p2, p3))(samples)
        return samples, jnp.mean(res.accept_stat[n_warmup:])

    def shard_fn(vec0, x, indx, y, p1, p2, k, mask):
        return jax.vmap(chain_one)(vec0, x, indx, y, p1, p2, k, mask)

    # check_vma=False for the same reason as nuts_fleet: the U-turn
    # while_loop mixes replicated literals into its carry and the program is
    # purely subject-local (no collectives)
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * 8),
        out_specs=(P(SUBJECT_AXIS), P(SUBJECT_AXIS)),
        check_vma=False,
    )
    samples, accept = jax.jit(sharded)(map_vecs, xs, indxs, ys, pc1, pc2,
                                       keys, masks)
    return samples[:s_real], accept[:s_real]


def pilot_mass_fleet(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    map_vecs: jnp.ndarray,
    key,
    n_pilot: int = 50,
    step_size: float = 1e-4,
    n_leapfrog: int = 10,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    dense: bool = False,
    reg: float = 1e-10,
):
    """Per-subject pilot-chain mass matrices for preconditioned fleet HMC.

    The reference's recipe (``Stationary_model_mpiKAISER.py:205``,
    ``Nonseparable_model_mpiKAISER_extended.py:542-570``): run a short pilot
    chain from the MAP, set the mass to the inverse of the regularized sample
    covariance.  ``dense=False`` (default) keeps the diagonal — O(P) per
    subject instead of O(P^2), which is what a 1000-subject fleet can afford;
    ``dense=True`` reproduces the reference's full matrix.
    Returns (S, P) inverse variances or (S, P, P) inverse covariances.
    """
    pilots = hmc_fleet(
        model_name, xs, ys, map_vecs, key, n_samples=n_pilot,
        step_size=step_size, n_leapfrog=n_leapfrog, hyper=hyper, mesh=mesh,
    )  # (S, n_pilot, P)
    pilots = np.asarray(pilots)
    if dense:
        masses = []
        for s in range(pilots.shape[0]):
            cov = np.cov(pilots[s].T) + reg * np.eye(pilots.shape[-1])
            masses.append(np.linalg.inv(cov))
        return jnp.asarray(np.stack(masses), settings.dtype)
    var = pilots.var(axis=1, ddof=1) + reg
    return jnp.asarray(1.0 / var, settings.dtype)


def hessian_mass_fleet(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    map_vecs: jnp.ndarray,
    hyper: dict | None = None,
    floor: float = 1e-2,
):
    """Per-subject diagonal Hessian mass matrices at the MAP.

    A deterministic, sharper alternative to the reference's pilot-chain
    covariance (``Stationary_model_mpiKAISER.py:205``): the mass is the
    clipped diagonal of the negative-log-posterior Hessian — one vmapped
    batch of Hessian-vector products per subject, no sampling.  GNMGP
    posteriors span ~5 orders of magnitude in curvature across slots
    (measured 6.5 to 7.8e5 at N=16), which is exactly what identity-mass HMC
    cannot traverse.  Returns (S, P) diagonal masses.
    """
    model = _MODELS[model_name]
    hp = {**model.DEFAULT_HYPERS, **(hyper or {})}
    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    map_vecs = jnp.asarray(map_vecs, settings.dtype)
    p_dim = map_vecs.shape[1]
    eye = jnp.eye(p_dim, dtype=settings.dtype)
    nlp = _subject_nlp(model_name, hp)

    rows = []
    for i in range(xs.shape[0]):
        pc1, pc2, pc3 = _prior_chols(model_name, xs[i], hp)
        obj = lambda v: nlp(v, xs[i], ys[i], pc1, pc2, pc3)

        def hvp_diag(e, vec=map_vecs[i], obj=obj):
            return jax.jvp(jax.grad(obj), (vec,), (e,))[1] @ e

        rows.append(jax.jit(jax.vmap(hvp_diag))(eye))
    return jnp.clip(jnp.stack(rows), floor, None)


def hmc_fleet_multichain(
    model_name: str,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    map_vecs: jnp.ndarray,  # (S, P)
    key,
    n_chains: int = 4,
    chunk_size: int = 100,
    max_chunks: int = 10,
    rhat_target: float = 1.05,
    step_size: float = 1e-4,
    n_leapfrog: int = 20,
    hyper: dict | None = None,
    mesh: Mesh | None = None,
    masses=None,
    init_jitter: float = 0.05,
    whiten: bool = False,
    descend_iters: int = 300,
):
    """Multi-chain fleet HMC with split-R̂-driven stopping.

    Runs ``n_chains`` jittered chains per subject (vmapped into the sharded
    fleet as S*C units), in chunks of ``chunk_size`` draws; after each chunk
    the per-subject split-R̂ (max over parameters) is computed on the host and
    sampling stops when every subject is below ``rhat_target`` (or at
    ``max_chunks``).  ``masses``: optional (S, P) diag or (S, P, P) dense
    per-subject mass matrices (see :func:`pilot_mass_fleet`).  Jittered
    starts are pulled back into the typical set by ``descend_iters``
    guarded Adam steps on each unit's posterior (raw jitter strands chains
    above the typical set and warmup never recovers —
    ``inference.init.multichain_starts``); chain 0 stays at the MAP.

    Returns (samples (S, C, T, P), rhat (S,), n_chunks_used).
    """
    from ..inference import diagnostics
    from ..inference import init as init_mod

    xs = jnp.asarray(xs, settings.dtype)
    ys = jnp.asarray(ys, settings.dtype)
    map_vecs = jnp.asarray(map_vecs, settings.dtype)
    s_real, p_dim = map_vecs.shape
    k_init, k_run = jax.random.split(jax.random.PRNGKey(0) if key is None else key)

    # tile subjects across chains: unit i*C+c is chain c of subject i
    xs_t = jnp.repeat(xs, n_chains, axis=0)
    ys_t = jnp.repeat(ys, n_chains, axis=0)
    q = jnp.repeat(map_vecs, n_chains, axis=0)
    jit_mask = (jnp.arange(q.shape[0]) % n_chains) > 0  # chain 0 starts at MAP
    q = q + jnp.where(
        jit_mask[:, None],
        init_jitter * jax.random.normal(k_init, q.shape, q.dtype),
        0.0,
    )
    if descend_iters > 0:
        q = descend_starts(
            model_name, xs_t, ys_t, q, hyper=hyper,
            iters=descend_iters, keep=~jit_mask,
        )
    masses_t = None if masses is None else jnp.repeat(
        jnp.asarray(masses, settings.dtype), n_chains, axis=0
    )

    chunks = []
    rhats = np.full(s_real, np.inf)
    used = 0
    for round_i in range(max_chunks):
        k_run, k_chunk = jax.random.split(k_run)
        samples = hmc_fleet(
            model_name, xs_t, ys_t, q, k_chunk, n_samples=chunk_size,
            step_size=step_size, n_leapfrog=n_leapfrog, hyper=hyper, mesh=mesh,
            masses=masses_t, whiten=whiten,
        )  # (S*C, chunk, P)
        chunks.append(np.asarray(samples))
        q = samples[:, -1, :]  # warm resume
        used = round_i + 1
        all_draws = np.concatenate(chunks, axis=1)  # (S*C, T, P)
        per_subject = all_draws.reshape(s_real, n_chains, -1, p_dim)
        rhats = np.array(
            [float(np.max(diagnostics.rhat(per_subject[s]))) for s in range(s_real)]
        )
        if np.all(rhats < rhat_target):
            break
    all_draws = np.concatenate(chunks, axis=1).reshape(s_real, n_chains, -1, p_dim)
    return jnp.asarray(all_draws), jnp.asarray(rhats), used
