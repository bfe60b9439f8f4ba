"""Shared model-layer plumbing.

The reference implements each model family as a standalone objective function
over a packed flat parameter vector (``Utility/logpos.py``: ``nlogpos_obj``,
``nlogpos_obj_SVC``, ``nlogpos_obj_S`` and Hadamard variants).  We keep the
*flat-vector* calling convention (it is what MAP/HMC engines consume and what
checkpoints store — parity with the reference's ``MAP.dat`` layout), but each
model module additionally exposes:

* ``unpack(vec, n, m)`` / ``pack(...)`` — layout identical to the reference's
  ``vec2pars*`` (logpos.py:17-71),
* ``nlogpos(vec, ...)`` — parity API, recomputes everything,
* ``make_objective(...)`` — returns a jit-friendly closure with all
  loop-invariant quantities (prior Gram Cholesky factors, index maps)
  precomputed ONCE, for use inside ``lax.scan`` training loops.  The reference
  rebuilds and refactors the prior covariances every Adam iteration
  (logpos.py:271-279, 357-365); hoisting them is a large constant-factor win.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from .. import settings


class FullData(NamedTuple):
    """Fully-observed multi-task data: every task observed at every input.

    ``x``: (N,) inputs; ``y``: (N, M) observations.
    """

    x: jnp.ndarray
    y: jnp.ndarray


class HadamardData(NamedTuple):
    """One observation per (input, task) pair — the reference's "hadamard" layout.

    ``x``: (N,) inputs; ``indx``: (N,) int task index; ``y``: (N,) observations.
    """

    x: jnp.ndarray
    indx: jnp.ndarray
    y: jnp.ndarray


def as_full_data(x, y) -> FullData:
    return FullData(settings.asarray(x), settings.asarray(y))


def as_hadamard_data(x, indx, y) -> HadamardData:
    return HadamardData(
        settings.asarray(x), jnp.asarray(indx, jnp.int32), settings.asarray(y)
    )


def task_major(y: jnp.ndarray) -> jnp.ndarray:
    """Flatten (N, M) observations task-major: y = Y.T.reshape(-1).

    Matches the reference's ``y = Y.t().contiguous().view(-1)`` layout used by
    every objective (e.g. logpos.py:250).
    """
    return y.T.reshape(-1)


Objective = Callable[[jnp.ndarray], jnp.ndarray]


def mask_dense_gram(gram, sigma2_err, y, mask):
    """Project masked observations exactly out of a dense likelihood.

    ``gram``: (N, N) noiseless Gram, ``mask``: (N,) bool (True = real).
    Masked rows/cols are zeroed with a unit diagonal and the observation
    zeroed, so they contribute exactly nothing to logdet or the quadratic
    form — the shape-static equivalent of dropping them (same construction as
    the FullData GNMGP masked likelihood).  Returns (cov, y_masked).
    """
    mv = jnp.asarray(mask, y.dtype)
    cov = gram * (mv[:, None] * mv[None, :])
    cov = cov + jnp.diag(jnp.where(mv > 0, sigma2_err, 1.0))
    return cov, y * mv


def check_vec(vec, expected: int, model_name: str, layout: str):
    """Named shape error for a packed parameter vector (shape-static, safe
    under jit/vmap — only ``.ndim``/``.shape`` are inspected).

    The packed-vector convention silently mis-slices on a wrong-length
    vector (e.g. ``vec[-1]`` lands inside a latent block), which is the worst
    kind of bug; every model's ``unpack`` calls this first (ROADMAP: raw
    reshape errors at the lowest-level entry points).
    """
    ndim = getattr(vec, "ndim", None)
    n = vec.shape[-1] if ndim else None
    if ndim != 1 or n != expected:
        got = f"shape {tuple(vec.shape)}" if ndim is not None else repr(vec)
        raise ValueError(
            f"{model_name} parameter vector must be 1-D with length "
            f"{expected} ({layout}); got {got}"
        )


def check_full_data(data: "FullData", model_name: str, min_n: int = 2):
    """Named shape errors for FullData at objective/predict boundaries."""
    x, y = data.x, data.y
    if getattr(x, "ndim", None) != 1 or getattr(y, "ndim", None) != 2:
        raise ValueError(
            f"{model_name} expects FullData(x (N,), y (N, M)); got "
            f"x shape {tuple(getattr(x, 'shape', ()))}, "
            f"y shape {tuple(getattr(y, 'shape', ()))}"
        )
    if x.shape[0] != y.shape[0]:
        raise ValueError(
            f"{model_name}: x and y disagree on N "
            f"({x.shape[0]} vs {y.shape[0]})"
        )
    if x.shape[0] < min_n:
        raise ValueError(
            f"{model_name}: need at least {min_n} observations, got {x.shape[0]}"
        )
