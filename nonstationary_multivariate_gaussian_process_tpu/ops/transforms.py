"""Parameter transforms: unconstrained ↔ constrained Cholesky vectors.

TPU-native re-design of the reference's ``Utility/utils.py:10-89``.  The
reference loops over N per-input vectors in Python (utils.py:38-54); here every
transform is fully vectorized / batched so it can sit inside a jitted
log-posterior with zero host control flow.

Layout convention (identical to the reference): a lower-triangular M×M matrix
is stored row-major as a length ``T = M(M+1)/2`` vector via ``tril_indices``;
the unconstrained parameterization exponentiates the diagonal entries, which
live at flat positions ``cumsum(1..M) − 1``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def tri_size(m: int) -> int:
    return m * (m + 1) // 2


def diag_indices_vec(m: int) -> np.ndarray:
    """Flat positions of the diagonal entries inside an L-vector (utils.py:12)."""
    return np.cumsum(np.arange(1, m + 1)) - 1


def _diag_mask(m: int) -> jnp.ndarray:
    mask = np.zeros(tri_size(m), dtype=bool)
    mask[diag_indices_vec(m)] = True
    return jnp.asarray(mask)


def ulvec_to_lvec(ul_vec: jnp.ndarray, m: int) -> jnp.ndarray:
    """Unconstrained → constrained L-vector: exp on diagonal slots (utils.py:10-22).

    Works on a trailing axis of size T, so it is batch-friendly:
    shapes (..., T) are supported.
    """
    mask = _diag_mask(m)
    return jnp.where(mask, jnp.exp(ul_vec), ul_vec)


def lvec_to_ulvec(l_vec: jnp.ndarray, m: int) -> jnp.ndarray:
    """Constrained → unconstrained L-vector: log on diagonal slots (utils.py:24-36)."""
    mask = _diag_mask(m)
    return jnp.where(mask, jnp.log(jnp.where(mask, l_vec, 1.0)), l_vec)


def ulvecs_to_lvecs(ul_vecs: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """Per-input batched version over a flat (N*T,) vector (utils.py:38-46)."""
    t = tri_size(m)
    return ulvec_to_lvec(ul_vecs.reshape(n, t), m).reshape(-1)


def lvecs_to_ulvecs(l_vecs: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """Inverse of :func:`ulvecs_to_lvecs` (utils.py:48-54)."""
    t = tri_size(m)
    return lvec_to_ulvec(l_vecs.reshape(n, t), m).reshape(-1)


def vec_to_tril(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """Length-T vector(s) → lower-triangular M×M matrix (utils.py:56-74).

    Supports batching on leading axes: (..., T) → (..., M, M).
    """
    rows, cols = np.tril_indices(m)
    out = jnp.zeros(x.shape[:-1] + (m, m), dtype=x.dtype)
    return out.at[..., rows, cols].set(x)


def tril_to_vec(l: jnp.ndarray, m: int) -> jnp.ndarray:
    """Lower-triangular matrix(es) → length-T vector (utils.py:77-88)."""
    rows, cols = np.tril_indices(m)
    return l[..., rows, cols]


def cov2cor(s: jnp.ndarray) -> jnp.ndarray:
    """Covariance → correlation matrix (reference posterior_analysis.py:48-57).

    Batched over leading axes.
    """
    d = jnp.sqrt(jnp.diagonal(s, axis1=-2, axis2=-1))
    return s / (d[..., :, None] * d[..., None, :])
