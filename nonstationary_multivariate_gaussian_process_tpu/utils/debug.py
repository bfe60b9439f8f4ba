"""Numerics guards: deterministic NaN detection for jitted objectives.

Replaces the reference's host-side anomaly machinery —
``autograd.detect_anomaly()`` around every backward
(``Nonseparable_model.py:165``), the stochastic ``while loglik != loglik``
retry (``logpos.py:267``) and the ``pdb.set_trace()`` NaN traps
(``prediction.py:124-126``) — with traced equivalents (SURVEY §5 race/sanitizer
row).  The *recovery* path (jitter escalation) lives in ``ops.chol``; this
module is the *detection* path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def checked_objective(fn, name: str = "objective"):
    """Wrap an objective so non-finite values trigger a jax.debug breadcrumb.

    Stays fully jittable: the check is a ``jax.debug.print`` guarded by the
    predicate, not host control flow.
    """

    def _report(v):
        jax.debug.print("[nmgp] WARNING: non-finite {n} = {v}", n=name, v=v)
        return v

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        val = fn(*args, **kwargs)
        return jax.lax.cond(jnp.isfinite(val), lambda v: v, _report, val)

    return wrapped


def grad_finite_fraction(grad_tree):
    """Fraction of finite gradient entries — a cheap chain-health metric."""
    leaves = jax.tree_util.tree_leaves(grad_tree)
    total = sum(l.size for l in leaves)
    finite = sum(int(jnp.sum(jnp.isfinite(l))) for l in leaves)
    return finite / max(total, 1)


def enable_global_nan_checks():
    """Turn on jax's global NaN debugging (slow; for development only)."""
    jax.config.update("jax_debug_nans", True)


def disable_global_nan_checks():
    jax.config.update("jax_debug_nans", False)
