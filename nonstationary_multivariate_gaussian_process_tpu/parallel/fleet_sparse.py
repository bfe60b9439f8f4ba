"""Sparse (inducing-point) GNMGP fleet: the large-N tier, subject-parallel.

Round-3 scope limit removed: ``models/gnmgp_sparse.py`` was single-subject
(its per-subject ``SparseOps`` — inducing inputs Z, two kriging projections,
prior factors at Z — looked fleet-hostile).  They are not: at a shared
inducing count ``m_z`` every piece is a fixed-shape array pytree, so a
*stacked* ``SparseOps`` rides ``vmap`` within a device and ``shard_map``
across the mesh exactly like the dense tier's batched prior factors
(``parallel/fleet.py``).  This gives the framework the combination the
reference never had (its only scaling axis is more MPI ranks, one subject
each — SURVEY §2.4): MANY subjects × LARGE N per subject on one mesh, at
O(N·M·(m_z·M)²) per subject instead of O((NM)³).

The packed layout at Z is the exact GNMGP layout with N → m_z
(``gnmgp_sparse.unpack``), so the dense fleet's prior-whitened
reparameterization applies verbatim (``fleet._fleet_whiten_fns("gnmgp",
m_z, …)``) with Cholesky factors of the latent priors at Z.

Masks follow the cohort convention (prefix-true over padded tails,
``parallel/buckets.py``); the sparse likelihood's mask support zeroes the
padded rows of K_nm exactly (``gnmgp_sparse._woodbury_core``), so padded
ragged subjects are exact here just like in the dense fleet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from .. import settings
from ..inference import map as map_mod
from ..models import gnmgp_sparse
from ..models.base import FullData
from ..ops import chol as chol_ops
from .fleet import (FleetResult, SMCFleetResult, _fleet_whiten_fns,
                    _fleet_whiten_logdet)
from .mesh import SUBJECT_AXIS, make_mesh, pad_to_multiple


def _pad_tree(tree, multiple: int):
    return jax.tree_util.tree_map(
        lambda a: pad_to_multiple(a, multiple)[0], tree
    )


class InducingCountWarning(UserWarning):
    """The fleet-wide inducing count was pulled below the requested
    ``n_inducing`` by the bucket's shortest subject.

    ``make_fleet_sparse_ops*`` set ``m_z = min(n_inducing, min real N)`` so
    every subject's ops stack at one shape — which means one short subject
    silently degrades every *other* subject's approximation fidelity (the
    measured small-m underfit: m=32 at N=200 reaches rmse 1.05 where m=64
    recovers the dense tier's quality — ROADMAP "Sparse inducing tiers").
    Re-bucket by length (``parallel/buckets.py`` does this by default) or
    drop/route the short subject through the exact tier.
    """


def _stack_subject_ops(xs, masks, n_inducing: int, hp: dict, build_one,
                       chol_hypers):
    """Shared ops-stacking loop for every sparse fleet layout.

    Host-side (concrete xs; projections and prior factors are f64 islands).
    Each subject's Z is the quantile subset of its *real* (unpadded prefix)
    inputs; the fleet-wide inducing count is ``min(n_inducing, min real N)``
    so every subject's ops stack at one shape (an
    :class:`InducingCountWarning` fires when that pulls m_z below the
    request).  ``build_one(x_row, z)`` makes one subject's ops pytree;
    ``chol_hypers`` is a list of ``(alpha_key, beta_key)`` pairs — one prior
    Cholesky factor stack at Z per whitening block.  Returns
    ``(ops, [chol stacks...], m_z)``.
    """
    import warnings

    xs_np = np.asarray(xs, np.float64)
    s = xs_np.shape[0]
    if masks is None:
        n_reals = [xs_np.shape[1]] * s
    else:
        masks_np = np.asarray(masks, bool)
        n_reals = [int(masks_np[i].sum()) for i in range(s)]
    m_z = int(min(n_inducing, min(n_reals)))
    if m_z < n_inducing:
        short = int(np.argmin(n_reals))
        warnings.warn(
            f"fleet inducing count reduced to m_z={m_z} (< requested "
            f"n_inducing={n_inducing}) by subject {short} with only "
            f"{n_reals[short]} real observations — every subject in this "
            "bucket now runs at the lower fidelity",
            InducingCountWarning, stacklevel=3)

    ops_list = []
    chol_lists = [[] for _ in chol_hypers]
    for i in range(s):
        x_real = xs_np[i, : n_reals[i]]
        z = gnmgp_sparse.choose_inducing(x_real, m_z)
        if z.shape[0] != m_z:
            raise ValueError(
                f"subject {i}: only {z.shape[0]} distinct inducing inputs "
                f"among its {n_reals[i]} real observations (need m_z={m_z}; "
                f"duplicate input locations collapse the quantile set)"
            )
        ops_list.append(build_one(xs_np[i], z))
        for lst, (ak, bk) in zip(chol_lists, chol_hypers):
            lst.append(chol_ops.prior_rbf_cholesky(z, hp[ak], hp[bk]))

    ops = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *ops_list)
    return ops, [jnp.stack(lst) for lst in chol_lists], m_z


def make_fleet_sparse_ops(xs, masks=None, n_inducing: int = 64,
                          hyper: dict | None = None):
    """Per-subject sparse ops, stacked for the fleet: ``(ops, wl, wu, m_z)``.

    ``wl``/``wu`` are the prior Cholesky factors at Z, (S, m_z, m_z) — the
    whitening maps for sampling.  See :func:`_stack_subject_ops` for the
    shared Z-selection semantics.
    """
    from ..models.gnmgp import DEFAULT_HYPERS

    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    ops, (wl, wu), m_z = _stack_subject_ops(
        xs, masks, n_inducing, hp,
        lambda x, z: gnmgp_sparse.make_ops(x, z, hp),
        [("alpha_tilde_l", "beta_tilde_l"), ("alpha_L", "beta_L")],
    )
    return ops, wl, wu, m_z


def _subject_nlp_sparse(m_z: int, hp: dict, approx: str):
    """Per-subject sparse objective fn(vec, x, y, ops, mask) → scalar."""

    def nlp(vec, x, y, ops, mask):
        p = gnmgp_sparse.unpack(vec, m_z, y.shape[1])
        res, _ = gnmgp_sparse.log_posterior(
            p, FullData(x, y), ops, approx=approx, hyper=hp, mask=mask
        )
        return -res

    return nlp


def fit_fleet_map_sparse(
    xs: jnp.ndarray,  # (S, N)
    ys: jnp.ndarray,  # (S, N, M)
    init_vecs: jnp.ndarray,  # (S, m_z(1+T)+1)
    ops=None,  # stacked SparseOps from make_fleet_sparse_ops (built if None)
    n_inducing: int = 64,
    hyper: dict | None = None,
    approx: str = "fitc",
    n_iters: int = 1000,
    lr: float = 2e-1,
    mesh: Mesh | None = None,
    masks: jnp.ndarray | None = None,
    method: str = "adam",
) -> FleetResult:
    """MAP-fit a fleet of sparse-GNMGP subjects, sharded over the mesh.

    Same engine as ``fleet.fit_fleet_map`` (chunkless guarded Adam/L-BFGS
    scan per subject under vmap, subject axis sharded with shard_map, fleet
    metrics on one psum) with the dense prior factors replaced by each
    subject's stacked :class:`~..models.gnmgp_sparse.SparseOps`.
    """
    return _fit_fleet_map_sparse(
        "full", (xs, ys), init_vecs, m=np.shape(ys)[-1], ops=ops,
        n_inducing=n_inducing, hyper=hyper, approx=approx, n_iters=n_iters,
        lr=lr, mesh=mesh, masks=masks, method=method,
    )


def _fit_fleet_map_sparse(lk, data, init_vecs, *, m, ops=None,
                          n_inducing: int = 64, hyper: dict | None = None,
                          approx: str = "fitc", n_iters: int = 1000,
                          lr: float = 2e-1, mesh: Mesh | None = None,
                          masks=None, method: str = "adam") -> FleetResult:
    """Layout-generic sparse fleet MAP engine (every sparse model rides it).

    One chunkless guarded Adam/L-BFGS scan per subject under vmap, subject
    axis sharded over the mesh with shard_map, fleet metrics on one psum —
    the dense fleet's engine (``fleet.fit_fleet_map``) with each layout's
    stacked sparse ops carried through the same subject axis
    (:func:`_layout` supplies the objective and ops builders).
    """
    if approx not in ("fitc", "vfe"):
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    (L, hp, mesh, n_dev, m_z, _, arrs, masks_p, ops, _, s_real) = (
        _prep_sparse_fleet(lk, data, masks, ops, None, n_inducing, hyper,
                           False, mesh, m, vecs=init_vecs))
    init_vecs = pad_to_multiple(
        jnp.asarray(init_vecs, settings.dtype), n_dev)[0]
    nlp = L["nlp"](m_z, m, hp, approx)
    if method == "lbfgs":
        optimizer = optax.lbfgs()
        step_builder = map_mod.guarded_lbfgs_step
    elif method == "adam":
        optimizer = optax.adam(lr)
        step_builder = map_mod.guarded_adam_step
    else:
        raise ValueError(f"unknown method {method!r} (want 'adam' or 'lbfgs')")

    def fit_one(vec0, mask, *dargs_op):
        *dargs, op = dargs_op
        obj = lambda v: nlp(v, *dargs, op, mask)
        big = jnp.asarray(jnp.inf, vec0.dtype) + 0.0 * vec0[0]
        (v, _, bv, bval), hist = jax.lax.scan(
            step_builder(obj, optimizer),
            (vec0, optimizer.init(vec0), vec0, big), None, length=n_iters
        )
        v_fin = obj(v)
        take_final = jnp.isfinite(v_fin) & (v_fin < bval)
        bv = jnp.where(take_final, v, bv)
        return bv, jnp.where(take_final, v_fin, bval), hist

    def shard_fn(vec0, mask, *rest):
        vecs, finals, hists = jax.vmap(fit_one)(vec0, mask, *rest)
        total = jax.lax.psum(jnp.sum(finals), SUBJECT_AXIS)
        lo = jax.lax.pmin(jnp.min(finals), SUBJECT_AXIS)
        hi = jax.lax.pmax(jnp.max(finals), SUBJECT_AXIS)
        return vecs, finals, hists, total, lo, hi

    n_in = 2 + len(arrs) + 1
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * n_in),
        out_specs=(P(SUBJECT_AXIS), P(SUBJECT_AXIS), P(SUBJECT_AXIS),
                   P(), P(), P()),
        check_vma=(method == "adam"),
    )
    vecs, finals, hists, total, lo, hi = jax.jit(sharded)(
        init_vecs, masks_p, *arrs, ops
    )
    s_total = arrs[0].shape[0]
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


def hmc_fleet_sparse(
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    map_vecs: jnp.ndarray,  # (S, P) warm starts
    key,
    ops=None,
    whiten_chols=None,  # (wl, wu) from make_fleet_sparse_ops when whiten=True
    n_inducing: int = 64,
    n_samples: int = 100,
    step_size: float = 1e-4,
    n_leapfrog: int = 20,
    hyper: dict | None = None,
    approx: str = "fitc",
    mesh: Mesh | None = None,
    n_warmup: int = 0,
    adapt_step_size: bool = False,
    target_accept: float = 0.75,
    whiten: bool = False,
    masks: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """HMC chains for a sparse-GNMGP fleet — (S, n_samples, P) natural draws.

    ``whiten=True`` samples each subject's prior-whitened Z-space: the
    sparse layout is the gnmgp layout at N=m_z, so the dense fleet's
    whitening block table applies with the prior Cholesky factors *at Z*
    (``make_fleet_sparse_ops``'s ``wl``/``wu``).
    """
    samples, _ = _chain_fleet_sparse(
        "full", (xs, ys), map_vecs, key, kind="hmc",
        m=np.shape(ys)[-1], ops=ops, whiten_chols=whiten_chols,
        n_inducing=n_inducing, hyper=hyper, approx=approx, mesh=mesh,
        whiten=whiten, masks=masks, n_samples=n_samples,
        step_size=step_size, n_leapfrog=n_leapfrog, n_warmup=n_warmup,
        adapt_step_size=adapt_step_size, target_accept=target_accept,
    )
    return samples


# ---------------------------------------------------------------------------
# Hadamard layout: one observation per (input, task) pair.
# ---------------------------------------------------------------------------


def make_fleet_sparse_ops_hadamard(xs, masks=None, n_inducing: int = 64,
                                   hyper: dict | None = None):
    """:func:`make_fleet_sparse_ops` under the Hadamard hyper defaults
    (``gnmgp_sparse.HADAMARD_DEFAULT_HYPERS`` — the exact Hadamard SVC's,
    reference logpos.py:566-585)."""
    hp = {**gnmgp_sparse.HADAMARD_DEFAULT_HYPERS, **(hyper or {})}
    ops, (wl, wu), m_z = _stack_subject_ops(
        xs, masks, n_inducing, hp,
        lambda x, z: gnmgp_sparse.make_ops_hadamard(x, z, hp),
        [("alpha_tilde_l", "beta_tilde_l"), ("alpha_L", "beta_L")],
    )
    return ops, wl, wu, m_z


def _subject_nlp_sparse_hadamard(m_z: int, m: int, hp: dict, approx: str):
    """Per-subject sparse Hadamard objective
    fn(vec, x, indx, y, ops, mask) → scalar."""

    def nlp(vec, x, indx, y, ops, mask):
        p = gnmgp_sparse.unpack(vec, m_z, m)
        res, _ = gnmgp_sparse.log_posterior_hadamard(
            p, (x, indx, y), ops, m, approx=approx, hyper=hp, mask=mask
        )
        return -res

    return nlp


def fit_fleet_map_sparse_hadamard(
    xs: jnp.ndarray,  # (S, N)
    indxs: jnp.ndarray,  # (S, N) int task indices
    ys: jnp.ndarray,  # (S, N)
    m: int,
    init_vecs: jnp.ndarray,  # (S, m_z(1+T)+1)
    ops=None,
    n_inducing: int = 64,
    hyper: dict | None = None,
    approx: str = "fitc",
    n_iters: int = 1000,
    lr: float = 2e-1,
    mesh: Mesh | None = None,
    masks: jnp.ndarray | None = None,
    method: str = "adam",
) -> FleetResult:
    """MAP-fit a fleet of sparse Hadamard-layout subjects over the mesh.

    The sparse analog of ``fleet.fit_fleet_map_hadamard``: large ragged
    clinical subjects (one observation per (input, task) pair) fit at
    O(N (m_z M)^2) each, stacked SparseOps sharded with the subjects.
    """
    return _fit_fleet_map_sparse(
        "hadamard", (xs, indxs, ys), init_vecs, m=m, ops=ops,
        n_inducing=n_inducing, hyper=hyper, approx=approx, n_iters=n_iters,
        lr=lr, mesh=mesh, masks=masks, method=method,
    )


def hmc_fleet_sparse_hadamard(
    xs: jnp.ndarray,
    indxs: jnp.ndarray,
    ys: jnp.ndarray,
    m: int,
    map_vecs: jnp.ndarray,
    key,
    ops=None,
    whiten_chols=None,
    n_inducing: int = 64,
    n_samples: int = 100,
    step_size: float = 1e-4,
    n_leapfrog: int = 20,
    hyper: dict | None = None,
    approx: str = "fitc",
    mesh: Mesh | None = None,
    n_warmup: int = 0,
    adapt_step_size: bool = False,
    target_accept: float = 0.75,
    whiten: bool = False,
    masks: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """HMC chains for a sparse Hadamard fleet — (S, n_samples, P) draws.

    ``whiten=True`` uses the dense fleet's gnmgp block table at N=m_z with
    the Hadamard-prior Cholesky factors at Z (the Hadamard layout's L_vecs
    are raw, but the prior map is the same linear structure —
    ``fleet.hmc_fleet_hadamard`` precedent).
    """
    samples, _ = _chain_fleet_sparse(
        "hadamard", (xs, indxs, ys), map_vecs, key, kind="hmc", m=m,
        ops=ops, whiten_chols=whiten_chols, n_inducing=n_inducing,
        hyper=hyper, approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_samples=n_samples, step_size=step_size, n_leapfrog=n_leapfrog,
        n_warmup=n_warmup, adapt_step_size=adapt_step_size,
        target_accept=target_accept,
    )
    return samples


# ---------------------------------------------------------------------------
# Heteroscedastic variant: per-(input, task) noise GP, also at Z.
# ---------------------------------------------------------------------------


def make_fleet_sparse_ops_hetero(xs, masks=None, n_inducing: int = 64,
                                 hyper: dict | None = None):
    """Stacked :class:`~..models.gnmgp_sparse.SparseHeteroOps` for the fleet:
    ``(ops_h, wl, wu, werr, m_z)`` — the homoscedastic factors plus the
    noise GP's prior Cholesky at Z (the third whitening block)."""
    hp = {**gnmgp_sparse.HETERO_DEFAULT_HYPERS, **(hyper or {})}
    ops, (wl, wu, we), m_z = _stack_subject_ops(
        xs, masks, n_inducing, hp,
        lambda x, z: gnmgp_sparse.make_ops_hetero(x, z, hp),
        [("alpha_tilde_l", "beta_tilde_l"), ("alpha_L", "beta_L"),
         ("alpha_err", "beta_err")],
    )
    return ops, wl, wu, we, m_z


def _subject_nlp_sparse_hetero(m_z: int, hp: dict, approx: str):
    """Per-subject sparse hetero objective fn(vec, x, y, ops_h, mask)."""

    def nlp(vec, x, y, ops_h, mask):
        p = gnmgp_sparse.unpack_hetero(vec, m_z, y.shape[1])
        res, _ = gnmgp_sparse.log_posterior_hetero(
            p, FullData(x, y), ops_h, approx=approx, hyper=hp, mask=mask
        )
        return -res

    return nlp


def fit_fleet_map_sparse_hetero(
    xs: jnp.ndarray,  # (S, N)
    ys: jnp.ndarray,  # (S, N, M)
    init_vecs: jnp.ndarray,  # (S, m_z(1+T+M))
    ops=None,
    n_inducing: int = 64,
    hyper: dict | None = None,
    approx: str = "fitc",
    n_iters: int = 1000,
    lr: float = 2e-1,
    mesh: Mesh | None = None,
    masks: jnp.ndarray | None = None,
    method: str = "adam",
) -> FleetResult:
    """MAP-fit a fleet of heteroscedastic sparse-GNMGP subjects.

    The per-(input, task) noise GP lives at Z and is kriged to a per-slot
    Lambda (``gnmgp_sparse.log_lik_hetero``); everything else follows
    :func:`fit_fleet_map_sparse`."""
    return _fit_fleet_map_sparse(
        "hetero", (xs, ys), init_vecs, m=np.shape(ys)[-1], ops=ops,
        n_inducing=n_inducing, hyper=hyper, approx=approx, n_iters=n_iters,
        lr=lr, mesh=mesh, masks=masks, method=method,
    )


def hmc_fleet_sparse_hetero(
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    map_vecs: jnp.ndarray,
    key,
    ops=None,
    whiten_chols=None,  # (wl, wu, werr) when whiten=True with prebuilt ops
    n_inducing: int = 64,
    n_samples: int = 100,
    step_size: float = 1e-4,
    n_leapfrog: int = 20,
    hyper: dict | None = None,
    approx: str = "fitc",
    mesh: Mesh | None = None,
    n_warmup: int = 0,
    adapt_step_size: bool = False,
    target_accept: float = 0.75,
    whiten: bool = False,
    masks: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """HMC chains for a hetero sparse fleet — (S, n_samples, P) draws.

    ``whiten=True`` uses the dense fleet's gnmgp_hetero block table at
    N=m_z (three blocks: tilde_l, L-entries, the task-major noise rows)
    with the prior factors at Z."""
    samples, _ = _chain_fleet_sparse(
        "hetero", (xs, ys), map_vecs, key, kind="hmc",
        m=np.shape(ys)[-1], ops=ops, whiten_chols=whiten_chols,
        n_inducing=n_inducing, hyper=hyper, approx=approx, mesh=mesh,
        whiten=whiten, masks=masks, n_samples=n_samples,
        step_size=step_size, n_leapfrog=n_leapfrog, n_warmup=n_warmup,
        adapt_step_size=adapt_step_size, target_accept=target_accept,
    )
    return samples


# ---------------------------------------------------------------------------
# Separable layouts: SNMGP (nonstationary separable) and LMC (stationary).
# ---------------------------------------------------------------------------


def make_fleet_sparse_ops_snmgp(xs, masks=None, n_inducing: int = 64,
                                hyper: dict | None = None):
    """Stacked :class:`~..models.snmgp_sparse.SparseOps` for the fleet:
    ``(ops, wl, wsigma, m_z)`` — the two latent processes' kriging pieces
    plus their prior Cholesky factors at Z (the whitening blocks).

    The separable analog of :func:`make_fleet_sparse_ops`; reference
    counterpart: the separable model as a fleet driver,
    ``/root/reference/Separable_Model/Separable_model_mpisim.py`` (one MPI
    rank per replicate — here one vmap lane per subject on the mesh).
    """
    from ..models import snmgp_sparse
    from ..models.snmgp import DEFAULT_HYPERS

    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    ops, (wl, ws), m_z = _stack_subject_ops(
        xs, masks, n_inducing, hp,
        lambda x, z: snmgp_sparse.make_ops(x, z, hp),
        [("alpha_tilde_l", "beta_tilde_l"),
         ("alpha_tilde_sigma", "beta_tilde_sigma")],
    )
    return ops, wl, ws, m_z


def make_fleet_sparse_ops_lmc(xs, masks=None, n_inducing: int = 64,
                              hyper: dict | None = None):
    """Stacked :class:`~..models.lmc_sparse.SparseOps` for the fleet:
    ``(ops, m_z)``.  The stationary tier has no latent processes — ops is
    just each subject's inducing set Z, and there are no whitening factors
    (the LMC parameter vector has no latent-GP blocks).

    Reference counterpart: the stationary model as a fleet driver,
    ``/root/reference/Stationary_Model/Stationary_model_mpisim.py:265``.
    """
    from ..models import lmc_sparse
    from ..models.lmc import DEFAULT_HYPERS

    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    ops, _, m_z = _stack_subject_ops(
        xs, masks, n_inducing, hp,
        lambda x, z: lmc_sparse.make_ops(x, z, hp), [],
    )
    return ops, m_z


def _subject_nlp_sparse_snmgp(m_z: int, hp: dict, approx: str):
    """Per-subject sparse SNMGP objective fn(vec, x, y, ops, mask)."""
    from ..models import snmgp_sparse

    def nlp(vec, x, y, ops, mask):
        p = snmgp_sparse.unpack(vec, m_z, y.shape[1])
        res, _ = snmgp_sparse.log_posterior(
            p, FullData(x, y), ops, approx=approx, hyper=hp, mask=mask
        )
        return -res

    return nlp


def _subject_nlp_sparse_lmc(m: int, hp: dict, approx: str):
    """Per-subject sparse LMC objective fn(vec, x, y, ops, mask)."""
    from ..models import lmc_sparse

    def nlp(vec, x, y, ops, mask):
        p = lmc_sparse.unpack(vec, m)
        res, _ = lmc_sparse.log_posterior(
            p, FullData(x, y), ops, approx=approx, hyper=hp, mask=mask
        )
        return -res

    return nlp


def fit_fleet_map_sparse_snmgp(
    xs, ys, init_vecs, ops=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc", n_iters: int = 1000,
    lr: float = 2e-1, mesh: Mesh | None = None, masks=None,
    method: str = "adam",
) -> FleetResult:
    """MAP-fit a fleet of sparse-SNMGP subjects (separable large-N tier)."""
    return _fit_fleet_map_sparse(
        "snmgp", (xs, ys), init_vecs, m=np.shape(ys)[-1], ops=ops,
        n_inducing=n_inducing, hyper=hyper, approx=approx, n_iters=n_iters,
        lr=lr, mesh=mesh, masks=masks, method=method,
    )


def fit_fleet_map_sparse_lmc(
    xs, ys, init_vecs, ops=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc", n_iters: int = 1000,
    lr: float = 2e-1, mesh: Mesh | None = None, masks=None,
    method: str = "adam",
) -> FleetResult:
    """MAP-fit a fleet of sparse-LMC subjects (stationary large-N tier)."""
    return _fit_fleet_map_sparse(
        "lmc", (xs, ys), init_vecs, m=np.shape(ys)[-1], ops=ops,
        n_inducing=n_inducing, hyper=hyper, approx=approx, n_iters=n_iters,
        lr=lr, mesh=mesh, masks=masks, method=method,
    )


def hmc_fleet_sparse_snmgp(
    xs, ys, map_vecs, key, ops=None, whiten_chols=None, n_inducing: int = 64,
    n_samples: int = 100, step_size: float = 1e-4, n_leapfrog: int = 20,
    hyper: dict | None = None, approx: str = "fitc", mesh: Mesh | None = None,
    n_warmup: int = 0, adapt_step_size: bool = False,
    target_accept: float = 0.75, whiten: bool = False, masks=None,
):
    """HMC chains for a sparse-SNMGP fleet — (S, n_samples, P) draws.
    ``whiten=True`` whitens the two latent-GP blocks at Z (the dense
    fleet's snmgp block table at N=m_z)."""
    samples, _ = _chain_fleet_sparse(
        "snmgp", (xs, ys), map_vecs, key, kind="hmc",
        m=np.shape(ys)[-1], ops=ops, whiten_chols=whiten_chols,
        n_inducing=n_inducing, hyper=hyper, approx=approx, mesh=mesh,
        whiten=whiten, masks=masks, n_samples=n_samples,
        step_size=step_size, n_leapfrog=n_leapfrog, n_warmup=n_warmup,
        adapt_step_size=adapt_step_size, target_accept=target_accept,
    )
    return samples


def hmc_fleet_sparse_lmc(
    xs, ys, map_vecs, key, ops=None, whiten_chols=None, n_inducing: int = 64,
    n_samples: int = 100, step_size: float = 1e-4, n_leapfrog: int = 20,
    hyper: dict | None = None, approx: str = "fitc", mesh: Mesh | None = None,
    n_warmup: int = 0, adapt_step_size: bool = False,
    target_accept: float = 0.75, whiten: bool = False, masks=None,
):
    """HMC chains for a sparse-LMC fleet — (S, n_samples, P) draws.
    The LMC vector has no latent-GP blocks, so ``whiten`` is accepted for
    interface uniformity and ignored (the natural space is already the
    sampling space)."""
    samples, _ = _chain_fleet_sparse(
        "lmc", (xs, ys), map_vecs, key, kind="hmc",
        m=np.shape(ys)[-1], ops=ops, whiten_chols=whiten_chols,
        n_inducing=n_inducing, hyper=hyper, approx=approx, mesh=mesh,
        whiten=whiten, masks=masks, n_samples=n_samples,
        step_size=step_size, n_leapfrog=n_leapfrog, n_warmup=n_warmup,
        adapt_step_size=adapt_step_size, target_accept=target_accept,
    )
    return samples


def nuts_fleet_sparse_snmgp(
    xs, ys, map_vecs, key, ops=None, whiten_chols=None, n_inducing: int = 64,
    n_samples: int = 100, step_size: float = 0.1, n_warmup: int = 200,
    max_depth: int = 8, hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = False, masks=None,
):
    """Adaptive NUTS chains for a sparse-SNMGP fleet —
    ``(samples (S, T, P), accept_stat (S,))``."""
    return _chain_fleet_sparse(
        "snmgp", (xs, ys), map_vecs, key, kind="nuts",
        m=np.shape(ys)[-1], ops=ops, whiten_chols=whiten_chols,
        n_inducing=n_inducing, hyper=hyper, approx=approx, mesh=mesh,
        whiten=whiten, masks=masks, n_samples=n_samples,
        step_size=step_size, n_warmup=n_warmup, max_depth=max_depth,
    )


def nuts_fleet_sparse_lmc(
    xs, ys, map_vecs, key, ops=None, whiten_chols=None, n_inducing: int = 64,
    n_samples: int = 100, step_size: float = 0.1, n_warmup: int = 200,
    max_depth: int = 8, hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = False, masks=None,
):
    """Adaptive NUTS chains for a sparse-LMC fleet —
    ``(samples (S, T, P), accept_stat (S,))``."""
    return _chain_fleet_sparse(
        "lmc", (xs, ys), map_vecs, key, kind="nuts",
        m=np.shape(ys)[-1], ops=ops, whiten_chols=whiten_chols,
        n_inducing=n_inducing, hyper=hyper, approx=approx, mesh=mesh,
        whiten=whiten, masks=masks, n_samples=n_samples,
        step_size=step_size, n_warmup=n_warmup, max_depth=max_depth,
    )


def smc_fleet_sparse_snmgp(
    xs, ys, key, n_particles: int = 256, n_mutations: int = 5,
    n_leapfrog: int = 10, target_cess: float = 0.5,
    dr_reduction: float = 0.0, metric: str = "full", n_polish: int = 0,
    waste_free: int = 0, resample_ess: float = 1.0,
    resample: str = "systematic", max_stages: int = 64,
    ops=None, whiten_chols=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = True, masks=None,
    dispatch: str = "auto",
) -> SMCFleetResult:
    """Adaptive tempered SMC for a sparse-SNMGP fleet."""
    return _smc_fleet_sparse(
        "snmgp", (xs, ys), key, m=np.shape(ys)[-1], ops=ops,
        whiten_chols=whiten_chols, n_inducing=n_inducing, hyper=hyper,
        approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_particles=n_particles, n_mutations=n_mutations,
        n_leapfrog=n_leapfrog, target_cess=target_cess,
        dr_reduction=dr_reduction, metric=metric, n_polish=n_polish,
        waste_free=waste_free, resample_ess=resample_ess,
        resample=resample, max_stages=max_stages, dispatch=dispatch,
    )


def smc_fleet_sparse_lmc(
    xs, ys, key, n_particles: int = 256, n_mutations: int = 5,
    n_leapfrog: int = 10, target_cess: float = 0.5,
    dr_reduction: float = 0.0, metric: str = "full", n_polish: int = 0,
    waste_free: int = 0, resample_ess: float = 1.0,
    resample: str = "systematic", max_stages: int = 64,
    ops=None, whiten_chols=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = True, masks=None,
    dispatch: str = "auto",
) -> SMCFleetResult:
    """Adaptive tempered SMC for a sparse-LMC fleet (populations start at
    the natural-space prior — no latent-GP blocks to whiten)."""
    return _smc_fleet_sparse(
        "lmc", (xs, ys), key, m=np.shape(ys)[-1], ops=ops,
        whiten_chols=whiten_chols, n_inducing=n_inducing, hyper=hyper,
        approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_particles=n_particles, n_mutations=n_mutations,
        n_leapfrog=n_leapfrog, target_cess=target_cess,
        dr_reduction=dr_reduction, metric=metric, n_polish=n_polish,
        waste_free=waste_free, resample_ess=resample_ess,
        resample=resample, max_stages=max_stages, dispatch=dispatch,
    )


def _subject_nlp_sparse_snmgp_hadamard(m_z: int, m: int, hp: dict,
                                       approx: str):
    """Per-subject sparse SNMGP Hadamard objective
    fn(vec, x, indx, y, ops, mask)."""
    from ..models import snmgp_sparse

    def nlp(vec, x, indx, y, ops, mask):
        p = snmgp_sparse.unpack(vec, m_z, m)
        res, _ = snmgp_sparse.log_posterior_hadamard(
            p, (x, indx, y), ops, m, approx=approx, hyper=hp, mask=mask
        )
        return -res

    return nlp


def _subject_nlp_sparse_lmc_hadamard(m: int, hp: dict, approx: str):
    """Per-subject sparse LMC Hadamard objective
    fn(vec, x, indx, y, ops, mask)."""
    from ..models import lmc_sparse

    def nlp(vec, x, indx, y, ops, mask):
        p = lmc_sparse.unpack(vec, m)
        res, _ = lmc_sparse.log_posterior_hadamard(
            p, (x, indx, y), ops, m, approx=approx, hyper=hp, mask=mask
        )
        return -res

    return nlp


def fit_fleet_map_sparse_snmgp_hadamard(
    xs, indxs, ys, m: int, init_vecs, ops=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc", n_iters: int = 1000,
    lr: float = 2e-1, mesh: Mesh | None = None, masks=None,
    method: str = "adam",
) -> FleetResult:
    """MAP-fit a fleet of sparse Hadamard-layout SNMGP subjects."""
    return _fit_fleet_map_sparse(
        "snmgp_hadamard", (xs, indxs, ys), init_vecs, m=m, ops=ops,
        n_inducing=n_inducing, hyper=hyper, approx=approx, n_iters=n_iters,
        lr=lr, mesh=mesh, masks=masks, method=method,
    )


def fit_fleet_map_sparse_lmc_hadamard(
    xs, indxs, ys, m: int, init_vecs, ops=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc", n_iters: int = 1000,
    lr: float = 2e-1, mesh: Mesh | None = None, masks=None,
    method: str = "adam",
) -> FleetResult:
    """MAP-fit a fleet of sparse Hadamard-layout LMC subjects."""
    return _fit_fleet_map_sparse(
        "lmc_hadamard", (xs, indxs, ys), init_vecs, m=m, ops=ops,
        n_inducing=n_inducing, hyper=hyper, approx=approx, n_iters=n_iters,
        lr=lr, mesh=mesh, masks=masks, method=method,
    )


def hmc_fleet_sparse_snmgp_hadamard(
    xs, indxs, ys, m: int, map_vecs, key, ops=None, whiten_chols=None,
    n_inducing: int = 64, n_samples: int = 100, step_size: float = 1e-4,
    n_leapfrog: int = 20, hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, n_warmup: int = 0,
    adapt_step_size: bool = False, target_accept: float = 0.75,
    whiten: bool = False, masks=None,
):
    """HMC chains for a sparse Hadamard SNMGP fleet — (S, T, P) draws."""
    samples, _ = _chain_fleet_sparse(
        "snmgp_hadamard", (xs, indxs, ys), map_vecs, key, kind="hmc", m=m,
        ops=ops, whiten_chols=whiten_chols, n_inducing=n_inducing,
        hyper=hyper, approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_samples=n_samples, step_size=step_size, n_leapfrog=n_leapfrog,
        n_warmup=n_warmup, adapt_step_size=adapt_step_size,
        target_accept=target_accept,
    )
    return samples


def hmc_fleet_sparse_lmc_hadamard(
    xs, indxs, ys, m: int, map_vecs, key, ops=None, whiten_chols=None,
    n_inducing: int = 64, n_samples: int = 100, step_size: float = 1e-4,
    n_leapfrog: int = 20, hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, n_warmup: int = 0,
    adapt_step_size: bool = False, target_accept: float = 0.75,
    whiten: bool = False, masks=None,
):
    """HMC chains for a sparse Hadamard LMC fleet — (S, T, P) draws."""
    samples, _ = _chain_fleet_sparse(
        "lmc_hadamard", (xs, indxs, ys), map_vecs, key, kind="hmc", m=m,
        ops=ops, whiten_chols=whiten_chols, n_inducing=n_inducing,
        hyper=hyper, approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_samples=n_samples, step_size=step_size, n_leapfrog=n_leapfrog,
        n_warmup=n_warmup, adapt_step_size=adapt_step_size,
        target_accept=target_accept,
    )
    return samples


def nuts_fleet_sparse_snmgp_hadamard(
    xs, indxs, ys, m: int, map_vecs, key, ops=None, whiten_chols=None,
    n_inducing: int = 64, n_samples: int = 100, step_size: float = 0.1,
    n_warmup: int = 200, max_depth: int = 8, hyper: dict | None = None,
    approx: str = "fitc", mesh: Mesh | None = None, whiten: bool = False,
    masks=None,
):
    """Adaptive NUTS chains for a sparse Hadamard SNMGP fleet."""
    return _chain_fleet_sparse(
        "snmgp_hadamard", (xs, indxs, ys), map_vecs, key, kind="nuts", m=m,
        ops=ops, whiten_chols=whiten_chols, n_inducing=n_inducing,
        hyper=hyper, approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_samples=n_samples, step_size=step_size, n_warmup=n_warmup,
        max_depth=max_depth,
    )


def nuts_fleet_sparse_lmc_hadamard(
    xs, indxs, ys, m: int, map_vecs, key, ops=None, whiten_chols=None,
    n_inducing: int = 64, n_samples: int = 100, step_size: float = 0.1,
    n_warmup: int = 200, max_depth: int = 8, hyper: dict | None = None,
    approx: str = "fitc", mesh: Mesh | None = None, whiten: bool = False,
    masks=None,
):
    """Adaptive NUTS chains for a sparse Hadamard LMC fleet."""
    return _chain_fleet_sparse(
        "lmc_hadamard", (xs, indxs, ys), map_vecs, key, kind="nuts", m=m,
        ops=ops, whiten_chols=whiten_chols, n_inducing=n_inducing,
        hyper=hyper, approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_samples=n_samples, step_size=step_size, n_warmup=n_warmup,
        max_depth=max_depth,
    )


def smc_fleet_sparse_snmgp_hadamard(
    xs, indxs, ys, m: int, key, n_particles: int = 256,
    n_mutations: int = 5, n_leapfrog: int = 10, target_cess: float = 0.5,
    dr_reduction: float = 0.0, metric: str = "full", n_polish: int = 0,
    waste_free: int = 0, resample_ess: float = 1.0,
    resample: str = "systematic", max_stages: int = 64,
    ops=None, whiten_chols=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = True, masks=None,
    dispatch: str = "auto",
) -> SMCFleetResult:
    """Adaptive tempered SMC for a sparse Hadamard SNMGP fleet."""
    return _smc_fleet_sparse(
        "snmgp_hadamard", (xs, indxs, ys), key, m=m, ops=ops,
        whiten_chols=whiten_chols, n_inducing=n_inducing, hyper=hyper,
        approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_particles=n_particles, n_mutations=n_mutations,
        n_leapfrog=n_leapfrog, target_cess=target_cess,
        dr_reduction=dr_reduction, metric=metric, n_polish=n_polish,
        waste_free=waste_free, resample_ess=resample_ess,
        resample=resample, max_stages=max_stages, dispatch=dispatch,
    )


def smc_fleet_sparse_lmc_hadamard(
    xs, indxs, ys, m: int, key, n_particles: int = 256,
    n_mutations: int = 5, n_leapfrog: int = 10, target_cess: float = 0.5,
    dr_reduction: float = 0.0, metric: str = "full", n_polish: int = 0,
    waste_free: int = 0, resample_ess: float = 1.0,
    resample: str = "systematic", max_stages: int = 64,
    ops=None, whiten_chols=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = True, masks=None,
    dispatch: str = "auto",
) -> SMCFleetResult:
    """Adaptive tempered SMC for a sparse Hadamard LMC fleet."""
    return _smc_fleet_sparse(
        "lmc_hadamard", (xs, indxs, ys), key, m=m, ops=ops,
        whiten_chols=whiten_chols, n_inducing=n_inducing, hyper=hyper,
        approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_particles=n_particles, n_mutations=n_mutations,
        n_leapfrog=n_leapfrog, target_cess=target_cess,
        dr_reduction=dr_reduction, metric=metric, n_polish=n_polish,
        waste_free=waste_free, resample_ess=resample_ess,
        resample=resample, max_stages=max_stages, dispatch=dispatch,
    )


# ---------------------------------------------------------------------------
# Shared sampler engine + the NUTS / SMC tiers for every sparse layout.
# ---------------------------------------------------------------------------


def _layout(kind: str) -> dict:
    """Layout descriptor — the only places the three sparse layouts differ.

    ``nlp`` builders all take ``(m_z, m, hp, approx)`` and return a
    per-subject objective ``fn(vec, *data, ops, mask)``; ``casts`` gives
    each stacked data array's dtype family ("f" = settings.dtype,
    "i" = int32 task indices).
    """
    from ..models.gnmgp import DEFAULT_HYPERS as _GNMGP_HYPERS

    if kind == "full":
        return {
            "hypers": _GNMGP_HYPERS,
            "make_ops": make_fleet_sparse_ops,
            "n_chols": 2,
            "z_of": lambda ops: ops.z,
            "wmodel": "gnmgp",
            "n_params": gnmgp_sparse.n_params,
            "nlp": lambda m_z, m, hp, ap: _subject_nlp_sparse(m_z, hp, ap),
            "casts": ("f", "f"),
        }
    if kind == "hadamard":
        return {
            "hypers": gnmgp_sparse.HADAMARD_DEFAULT_HYPERS,
            "make_ops": make_fleet_sparse_ops_hadamard,
            "n_chols": 2,
            "z_of": lambda ops: ops.z,
            "wmodel": "gnmgp",
            "n_params": gnmgp_sparse.n_params,
            "nlp": _subject_nlp_sparse_hadamard,
            "casts": ("f", "i", "f"),
        }
    if kind == "hetero":
        return {
            "hypers": gnmgp_sparse.HETERO_DEFAULT_HYPERS,
            "make_ops": make_fleet_sparse_ops_hetero,
            "n_chols": 3,
            "z_of": lambda ops: ops.base.z,
            "wmodel": "gnmgp_hetero",
            "n_params": gnmgp_sparse.n_params_hetero,
            "nlp": lambda m_z, m, hp, ap: _subject_nlp_sparse_hetero(
                m_z, hp, ap),
            "casts": ("f", "f"),
        }
    if kind == "snmgp":
        from ..models import snmgp_sparse
        from ..models.snmgp import DEFAULT_HYPERS as _SNMGP_HYPERS

        return {
            "hypers": _SNMGP_HYPERS,
            "make_ops": make_fleet_sparse_ops_snmgp,
            "n_chols": 2,
            "z_of": lambda ops: ops.z,
            "wmodel": "snmgp",
            "n_params": snmgp_sparse.n_params,
            "nlp": lambda m_z, m, hp, ap: _subject_nlp_sparse_snmgp(
                m_z, hp, ap),
            "casts": ("f", "f"),
        }
    if kind == "lmc":
        from ..models import lmc_sparse
        from ..models.lmc import DEFAULT_HYPERS as _LMC_HYPERS

        return {
            "hypers": _LMC_HYPERS,
            "make_ops": make_fleet_sparse_ops_lmc,
            "n_chols": 0,
            "z_of": lambda ops: ops.z,
            "wmodel": "lmc",  # _fleet_whiten_fns -> None (no latent blocks)
            "n_params": lambda m_z, m: lmc_sparse.n_params(m),
            "nlp": lambda m_z, m, hp, ap: _subject_nlp_sparse_lmc(m, hp, ap),
            "casts": ("f", "f"),
        }
    if kind == "snmgp_hadamard":
        # the separable Hadamard objective shares the full layout's hyper
        # table and ops (ops depend only on x) — only the nlp and the data
        # casts differ
        from ..models import snmgp_sparse
        from ..models.snmgp import DEFAULT_HYPERS as _SNMGP_HYPERS

        return {
            "hypers": _SNMGP_HYPERS,
            "make_ops": make_fleet_sparse_ops_snmgp,
            "n_chols": 2,
            "z_of": lambda ops: ops.z,
            "wmodel": "snmgp",
            "n_params": snmgp_sparse.n_params,
            "nlp": _subject_nlp_sparse_snmgp_hadamard,
            "casts": ("f", "i", "f"),
        }
    if kind == "lmc_hadamard":
        from ..models import lmc_sparse
        from ..models.lmc import DEFAULT_HYPERS as _LMC_HYPERS

        return {
            "hypers": _LMC_HYPERS,
            "make_ops": make_fleet_sparse_ops_lmc,
            "n_chols": 0,
            "z_of": lambda ops: ops.z,
            "wmodel": "lmc",
            "n_params": lambda m_z, m: lmc_sparse.n_params(m),
            "nlp": lambda m_z, m, hp, ap: _subject_nlp_sparse_lmc_hadamard(
                m, hp, ap),
            "casts": ("f", "i", "f"),
        }
    raise ValueError(f"unknown sparse layout {kind!r}")


def _prep_sparse_fleet(lk, data, masks, ops, whiten_chols, n_inducing,
                       hyper, whiten, mesh, m, vecs=None):
    """Shared prep for the sparse sampler engines: resolve the layout,
    build/validate ops and prior factors at Z, cast + pad everything to the
    mesh's subject multiple.  Returns the padded pieces; ``chols`` is always
    three (S', k, k) stacks — unused slots are (S', 0, 0) placeholders the
    gnmgp whitening block table never touches."""
    L = _layout(lk)
    hp = {**L["hypers"], **(hyper or {})}
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size

    chols = None
    if ops is None:
        built = L["make_ops"](data[0], masks, n_inducing, hyper)
        ops, chols, m_z = built[0], list(built[1:-1]), built[-1]
    else:
        m_z = int(L["z_of"](ops).shape[1])
        if whiten and L["n_chols"]:
            if whiten_chols is None or len(whiten_chols) != L["n_chols"]:
                raise ValueError(
                    "whiten=True with prebuilt ops needs whiten_chols with "
                    f"{L['n_chols']} prior Cholesky factors at Z")
            chols = list(whiten_chols)

    xs_shape = np.shape(data[0])
    if len(xs_shape) != 2:
        raise ValueError(f"stacked subject inputs must be (S, N), "
                         f"got {xs_shape}")
    for a in data[1:]:
        if np.shape(a)[:2] != xs_shape:
            raise ValueError(
                f"stacked subject arrays disagree: xs {xs_shape} vs "
                f"{np.shape(a)}")
    if vecs is not None:
        want_p = L["n_params"](m_z, m)
        if np.shape(vecs) != (xs_shape[0], want_p):
            raise ValueError(
                f"parameter stack must be (S={xs_shape[0]}, P={want_p}) for "
                f"m_z={m_z}, M={m}, got {np.shape(vecs)}")
    if masks is not None and np.shape(masks) != xs_shape:
        raise ValueError(
            f"masks must match xs {xs_shape}, got {np.shape(masks)}")

    wfns = _fleet_whiten_fns(L["wmodel"], m_z, m, hp) if whiten else None
    arrs = [jnp.asarray(a, settings.dtype if c == "f" else jnp.int32)
            for a, c in zip(data, L["casts"])]
    s_real = arrs[0].shape[0]
    arrs = [pad_to_multiple(a, n_dev)[0] for a in arrs]
    if masks is not None:
        masks = pad_to_multiple(jnp.asarray(masks, bool), n_dev)[0]
    else:
        masks = jnp.ones(arrs[0].shape, bool)
    ops = _pad_tree(ops, n_dev)
    if whiten and chols:
        chols = [pad_to_multiple(jnp.asarray(c, settings.dtype), n_dev)[0]
                 for c in chols]
    else:
        chols = []
    zero = jnp.zeros((arrs[0].shape[0], 0, 0), settings.dtype)
    chols = (chols + [zero] * 3)[:3]
    return L, hp, mesh, n_dev, m_z, wfns, arrs, masks, ops, chols, s_real


def _chain_fleet_sparse(lk, data, map_vecs, key, *, kind, m, ops=None,
                        whiten_chols=None, n_inducing=64, hyper=None,
                        approx="fitc", mesh=None, whiten=False, masks=None,
                        **samp):
    """One chain per subject (HMC or NUTS) for any sparse layout, vmapped
    within a device and sharded over the mesh.  Returns
    ``(samples (S, T, P), stat (S,))`` — ``stat`` is the post-warmup mean
    NUTS acceptance statistic (zeros for fixed-trajectory HMC)."""
    from ..inference import hmc as hmc_mod
    from ..inference import nuts as nuts_mod

    (L, hp, mesh, n_dev, m_z, wfns, arrs, masks, ops, chols,
     s_real) = _prep_sparse_fleet(lk, data, masks, ops, whiten_chols,
                                  n_inducing, hyper, whiten, mesh, m,
                                  vecs=map_vecs)
    map_vecs = pad_to_multiple(
        jnp.asarray(map_vecs, settings.dtype), n_dev)[0]
    keys = jax.random.split(key, arrs[0].shape[0])
    nlp = L["nlp"](m_z, m, hp, approx)
    n_warmup = samp.get("n_warmup", 0)

    def chain_one(vec0, k, mask, l1, l2, l3, *dargs_op):
        *dargs, op = dargs_op
        if wfns is not None:
            fw, tw = wfns
            pot = lambda u: nlp(fw(u, l1, l2, l3), *dargs, op, mask)
            vec0 = tw(vec0, l1, l2, l3)
        else:
            pot = lambda v: nlp(v, *dargs, op, mask)
        if kind == "nuts":
            res = nuts_mod.nuts_sample(
                pot, vec0, samp["n_samples"], k,
                step_size=samp.get("step_size", 0.1),
                n_warmup=n_warmup, max_depth=samp.get("max_depth", 8),
            )
            stat = jnp.mean(res.accept_stat[n_warmup:])
        else:
            res = hmc_mod.hmc_sample(
                pot, vec0, samp["n_samples"], k,
                step_size=samp.get("step_size", 1e-4),
                n_leapfrog=samp.get("n_leapfrog", 20),
                n_warmup=n_warmup,
                adapt_step_size=samp.get("adapt_step_size", False),
                target_accept=samp.get("target_accept", 0.75),
            )
            stat = jnp.zeros((), settings.dtype)
        samples = res.samples
        if wfns is not None:
            samples = jax.vmap(lambda u: wfns[0](u, l1, l2, l3))(samples)
        return samples, stat

    def shard_fn(vec0, k, mask, l1, l2, l3, *rest):
        return jax.vmap(chain_one)(vec0, k, mask, l1, l2, l3, *rest)

    n_in = 6 + len(arrs) + 1
    # check_vma=False for NUTS: its U-turn while_loop mixes replicated
    # literals into the carry (nuts_fleet precedent); chains are
    # subject-local either way, no collectives inside.
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * n_in),
        out_specs=(P(SUBJECT_AXIS), P(SUBJECT_AXIS)),
        check_vma=(kind != "nuts"),
    )
    samples, stat = jax.jit(sharded)(map_vecs, keys, masks, *chols,
                                     *arrs, ops)
    return samples[:s_real], stat[:s_real]


def nuts_fleet_sparse(
    xs, ys, map_vecs, key, ops=None, whiten_chols=None, n_inducing: int = 64,
    n_samples: int = 100, step_size: float = 0.1, n_warmup: int = 200,
    max_depth: int = 8, hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = False, masks=None,
):
    """Adaptive NUTS chains for a sparse-GNMGP fleet, sharded over the mesh.

    The zero-tuning counterpart of :func:`hmc_fleet_sparse` (windowed
    warmup, per-subject step size + diagonal metric — inference/nuts.py);
    returns ``(samples (S, T, P), accept_stat (S,))`` like
    ``fleet.nuts_fleet``.
    """
    return _chain_fleet_sparse(
        "full", (xs, ys), map_vecs, key, kind="nuts", m=np.shape(ys)[-1],
        ops=ops, whiten_chols=whiten_chols, n_inducing=n_inducing,
        hyper=hyper, approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_samples=n_samples, step_size=step_size, n_warmup=n_warmup,
        max_depth=max_depth,
    )


def nuts_fleet_sparse_hadamard(
    xs, indxs, ys, m: int, map_vecs, key, ops=None, whiten_chols=None,
    n_inducing: int = 64, n_samples: int = 100, step_size: float = 0.1,
    n_warmup: int = 200, max_depth: int = 8, hyper: dict | None = None,
    approx: str = "fitc", mesh: Mesh | None = None, whiten: bool = False,
    masks=None,
):
    """Adaptive NUTS chains for a sparse Hadamard fleet —
    ``(samples (S, T, P), accept_stat (S,))``."""
    return _chain_fleet_sparse(
        "hadamard", (xs, indxs, ys), map_vecs, key, kind="nuts", m=m,
        ops=ops, whiten_chols=whiten_chols, n_inducing=n_inducing,
        hyper=hyper, approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_samples=n_samples, step_size=step_size, n_warmup=n_warmup,
        max_depth=max_depth,
    )


def nuts_fleet_sparse_hetero(
    xs, ys, map_vecs, key, ops=None, whiten_chols=None, n_inducing: int = 64,
    n_samples: int = 100, step_size: float = 0.1, n_warmup: int = 200,
    max_depth: int = 8, hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = False, masks=None,
):
    """Adaptive NUTS chains for a heteroscedastic sparse fleet —
    ``(samples (S, T, P), accept_stat (S,))``."""
    return _chain_fleet_sparse(
        "hetero", (xs, ys), map_vecs, key, kind="nuts",
        m=np.shape(ys)[-1], ops=ops, whiten_chols=whiten_chols,
        n_inducing=n_inducing, hyper=hyper, approx=approx, mesh=mesh,
        whiten=whiten, masks=masks, n_samples=n_samples,
        step_size=step_size, n_warmup=n_warmup, max_depth=max_depth,
    )


def _smc_fleet_sparse(lk, data, key, *, m, ops=None, whiten_chols=None,
                      n_inducing=64, hyper=None, approx="fitc", mesh=None,
                      whiten=True, masks=None, n_particles=256,
                      dispatch="auto", **smc_kwargs) -> SMCFleetResult:
    """Adaptive tempered SMC per subject for any sparse layout (the
    between-basin tier, inference/smc.py), vmapped + sharded like
    ``fleet.smc_fleet``.  ``whiten=True`` (default) makes the reference
    distribution the exact latent-GP prior at Z; ``logz`` comes back in the
    natural space (whitening Jacobian added per subject).
    ``dispatch="auto"`` resolves the posture per hardware exactly like the
    dense tier (``fleet.resolve_smc_dispatch``): the vmapped device program
    on CPU meshes / multi-chip, a per-subject host-dispatched stage loop on
    one real chip (the tunneled-TPU fault class, CLAUDE.md)."""
    from ..inference import smc as smc_mod
    from .fleet import _host_smc_fleet_loop, resolve_smc_dispatch

    (L, hp, mesh, n_dev, m_z, wfns, arrs, masks, ops, chols,
     s_real) = _prep_sparse_fleet(lk, data, masks, ops, whiten_chols,
                                  n_inducing, hyper, whiten, mesh, m)
    keys = jax.random.split(key, arrs[0].shape[0])
    nlp = L["nlp"](m_z, m, hp, approx)
    p_dim = L["n_params"](m_z, m)
    ld_fn = _fleet_whiten_logdet(L["wmodel"], m_z, m, hp) if whiten else None

    def subject_one(k, mask, l1, l2, l3, *dargs_op, smc_dispatch="device"):
        *dargs, op = dargs_op
        if wfns is not None:
            fw, _ = wfns
            pot = lambda u: nlp(fw(u, l1, l2, l3), *dargs, op, mask)
        else:
            pot = lambda v: nlp(v, *dargs, op, mask)
        r = smc_mod.smc_sample(pot, p_dim, k, n_particles,
                               dtype=settings.dtype, dispatch=smc_dispatch,
                               **smc_kwargs)
        parts, logz = r.particles, r.logz
        if wfns is not None:
            parts = jax.vmap(lambda u: wfns[0](u, l1, l2, l3))(parts)
            logz = logz + ld_fn(l1, l2, l3)
        ns = jnp.maximum(r.n_stages, 1)
        acc = jnp.take(r.accept, ns - 1)
        return parts, logz, r.beta_final, r.n_stages, acc

    if resolve_smc_dispatch(dispatch, mesh) == "host":
        return _host_smc_fleet_loop(
            lambda i: subject_one(
                keys[i], masks[i], chols[0][i], chols[1][i], chols[2][i],
                *[a[i] for a in arrs],
                jax.tree_util.tree_map(lambda t: t[i], ops),
                smc_dispatch="host",
            ),
            s_real,
        )

    def shard_fn(k, mask, l1, l2, l3, *rest):
        return jax.vmap(subject_one)(k, mask, l1, l2, l3, *rest)

    n_in = 5 + len(arrs) + 1
    # check_vma=False: the tempering while_loop mixes replicated literals
    # into a subject-varying carry (smc_fleet precedent)
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple([P(SUBJECT_AXIS)] * n_in),
        out_specs=tuple([P(SUBJECT_AXIS)] * 5),
        check_vma=False,
    )
    parts, logz, bf, ns, acc = jax.jit(sharded)(keys, masks, *chols,
                                                *arrs, ops)
    return SMCFleetResult(
        particles=parts[:s_real],
        logz=logz[:s_real],
        beta_final=bf[:s_real],
        n_stages=ns[:s_real],
        accept=acc[:s_real],
    )


def smc_fleet_sparse(
    xs, ys, key, n_particles: int = 256, n_mutations: int = 5,
    n_leapfrog: int = 10, target_cess: float = 0.5,
    dr_reduction: float = 0.0, metric: str = "full", n_polish: int = 0,
    waste_free: int = 0, resample_ess: float = 1.0,
    resample: str = "systematic", max_stages: int = 64,
    ops=None, whiten_chols=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = True, masks=None,
    dispatch: str = "auto",
) -> SMCFleetResult:
    """Adaptive tempered SMC for a sparse-GNMGP fleet (no MAP warm start
    needed — populations start at the prior at Z)."""
    return _smc_fleet_sparse(
        "full", (xs, ys), key, m=np.shape(ys)[-1], ops=ops,
        whiten_chols=whiten_chols, n_inducing=n_inducing, hyper=hyper,
        approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_particles=n_particles, n_mutations=n_mutations,
        n_leapfrog=n_leapfrog, target_cess=target_cess,
        dr_reduction=dr_reduction, metric=metric, n_polish=n_polish,
        waste_free=waste_free, resample_ess=resample_ess,
        resample=resample, max_stages=max_stages, dispatch=dispatch,
    )


def smc_fleet_sparse_hadamard(
    xs, indxs, ys, m: int, key, n_particles: int = 256,
    n_mutations: int = 5, n_leapfrog: int = 10, target_cess: float = 0.5,
    dr_reduction: float = 0.0, metric: str = "full", n_polish: int = 0,
    waste_free: int = 0, resample_ess: float = 1.0,
    resample: str = "systematic", max_stages: int = 64,
    ops=None, whiten_chols=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = True, masks=None,
    dispatch: str = "auto",
) -> SMCFleetResult:
    """Adaptive tempered SMC for a sparse Hadamard fleet."""
    return _smc_fleet_sparse(
        "hadamard", (xs, indxs, ys), key, m=m, ops=ops,
        whiten_chols=whiten_chols, n_inducing=n_inducing, hyper=hyper,
        approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_particles=n_particles, n_mutations=n_mutations,
        n_leapfrog=n_leapfrog, target_cess=target_cess,
        dr_reduction=dr_reduction, metric=metric, n_polish=n_polish,
        waste_free=waste_free, resample_ess=resample_ess,
        resample=resample, max_stages=max_stages, dispatch=dispatch,
    )


def smc_fleet_sparse_hetero(
    xs, ys, key, n_particles: int = 256, n_mutations: int = 5,
    n_leapfrog: int = 10, target_cess: float = 0.5,
    dr_reduction: float = 0.0, metric: str = "full", n_polish: int = 0,
    waste_free: int = 0, resample_ess: float = 1.0,
    resample: str = "systematic", max_stages: int = 64,
    ops=None, whiten_chols=None, n_inducing: int = 64,
    hyper: dict | None = None, approx: str = "fitc",
    mesh: Mesh | None = None, whiten: bool = True, masks=None,
    dispatch: str = "auto",
) -> SMCFleetResult:
    """Adaptive tempered SMC for a heteroscedastic sparse fleet (the noise
    GP's prior factor at Z is the third whitening block)."""
    return _smc_fleet_sparse(
        "hetero", (xs, ys), key, m=np.shape(ys)[-1], ops=ops,
        whiten_chols=whiten_chols, n_inducing=n_inducing, hyper=hyper,
        approx=approx, mesh=mesh, whiten=whiten, masks=masks,
        n_particles=n_particles, n_mutations=n_mutations,
        n_leapfrog=n_leapfrog, target_cess=target_cess,
        dr_reduction=dr_reduction, metric=metric, n_polish=n_polish,
        waste_free=waste_free, resample_ess=resample_ess,
        resample=resample, max_stages=max_stages, dispatch=dispatch,
    )
