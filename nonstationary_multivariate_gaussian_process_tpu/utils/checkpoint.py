"""Orbax-backed checkpointing for long training runs.

The artifact store (``utils.artifacts``) covers stage outputs; this module
checkpoints *live optimizer state* — (params, opt_state, PRNG key, step) —
so a multi-thousand-iteration MAP run or a long HMC chain survives preemption
(SURVEY §5 checkpoint/resume row; the reference rewrites ``MAP.dat`` every
100 iterations but loses the Adam moments and RNG state).
"""

from __future__ import annotations

import os

import numpy as np


def _backend():
    import orbax.checkpoint as ocp

    return ocp


def save_train_state(path: str, step: int, params, opt_state=None, key=None) -> None:
    """Checkpoint a training state pytree at ``path`` (atomic, versioned)."""
    ocp = _backend()
    state = {"step": np.asarray(step), "params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if key is not None:
        state["key"] = key
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, state, force=True)


def load_train_state(path: str) -> dict | None:
    """Restore a training state; None if no checkpoint exists."""
    ocp = _backend()
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    return ocp.PyTreeCheckpointer().restore(path)


def resume_or_init(path: str, init_params, init_opt_state=None, init_key=None):
    """Return (step, params, opt_state, key), restoring from ``path`` if present."""
    state = load_train_state(path)
    if state is None:
        return 0, init_params, init_opt_state, init_key
    return (
        int(state["step"]),
        state["params"],
        state.get("opt_state", init_opt_state),
        state.get("key", init_key),
    )
