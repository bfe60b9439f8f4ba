"""Device-mesh helpers for subject-parallel fleets."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SUBJECT_AXIS = "subjects"


def make_mesh(n_devices: int | None = None, axis: str = SUBJECT_AXIS) -> Mesh:
    """A 1-D mesh over available devices for the subject axis.

    The reference's only parallel strategy is one MPI rank per independent
    subject with zero collectives (SURVEY §2.4); the TPU-native analogue is a
    1-D mesh whose single axis shards the batch-of-subjects dimension.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def subject_sharding(mesh: Mesh, axis: str = SUBJECT_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def pad_to_multiple(arr, multiple: int, axis: int = 0):
    """Pad a leading subject axis to a device-count multiple; returns (padded, n_real)."""
    import jax.numpy as jnp

    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, rem)
    return jnp.pad(arr, pad_width, mode="edge"), n
