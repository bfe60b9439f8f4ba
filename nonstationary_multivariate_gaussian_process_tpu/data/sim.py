"""Synthetic data generators.

TPU-native re-design of the reference's ``SIM_code/sim.py`` generators:

* :func:`sim_mnts`   — nonstationary multivariate time series with known latent
  processes (reference ``SIM_MNTS``, sim.py:173-275): log-lengthscale
  ``3(x−1)³ − 3``, std processes ``(1+x², 2−x²)``, correlation process
  ``cos(πx)``, noise variance 1e-2.
* :func:`sim_mnts_s` — stationary-correlation variant (``SIM_MNTS_S``,
  sim.py:102-171): correlation fixed at 0.5, stds ``(1+x², 2(1+x²))``.

All randomness flows through explicit JAX PRNG keys (the reference relies on
global ``np.random``/``torch.manual_seed`` state, sim.py:157).  The draw of
``y ~ MVN(0, K + σ²I)`` uses the same GNMGP Gram assembly as the model layer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import settings
from ..models import gnmgp
from ..ops import kernels, transforms


class SimData(NamedTuple):
    """A simulated subject with ground-truth latent processes.

    Field layout mirrors the reference pickle ``[x, l, L_vecs, sigma2_err, Y]``
    (sim.py:274) plus the truth processes used by recovery summaries.
    """

    x: jnp.ndarray  # (N,) sorted inputs on (0, 1)
    l: jnp.ndarray  # (N,) true lengthscale process
    l_vecs: jnp.ndarray  # (N*T,) true per-point Cholesky vectors (constrained)
    sigma2_err: float  # true noise variance
    y: jnp.ndarray  # (N, M) observations
    stds: jnp.ndarray  # (N, M) true std processes
    cors: jnp.ndarray  # (N,) true correlation process (task pair 0-1)


def _chol_process_from_std_cor(stds: jnp.ndarray, cors: jnp.ndarray) -> jnp.ndarray:
    """Per-point Cholesky factors of B_f(x) = D R D for M=2 (sim.py:240-249).

    Closed form instead of a batched ``cholesky``: the truth correlation
    ``cos(πx)`` reaches ±1 at the boundary, where the numeric factorization
    fails in float32; ``1 − c²`` is computed as ``(1−c)(1+c)`` to avoid the
    catastrophic cancellation.
    """
    n, m = stds.shape
    assert m == 2, "reference truth processes are bivariate"
    s1, s2 = stds[:, 0], stds[:, 1]
    c = cors
    l11 = s1
    l21 = s2 * c
    l22 = s2 * jnp.sqrt(jnp.maximum((1.0 - c) * (1.0 + c), 0.0))
    zeros = jnp.zeros_like(s1)
    return jnp.stack(
        [
            jnp.stack([l11, zeros], axis=-1),
            jnp.stack([l21, l22], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 2)


def _draw_y(key, x, ell, ls, sigma2_err):
    """Draw y ~ MVN(0, K + σ²I) with the GNMGP Gram (sim.py:256-263).

    Uses the robust Cholesky: in float32 the kernel's 1e-6 nugget is below
    machine epsilon relative to O(1) diagonals, so near-duplicate inputs can
    make the plain factorization fail.
    """
    n, m, _ = ls.shape
    k_x = kernels.nonstationary_rbf_cov(x, ell1=ell)
    eye = jnp.eye(n * m, dtype=x.dtype)
    cov = gnmgp.gram(k_x, ls) + sigma2_err * eye
    # two-attempt robust factorization, independent of the global
    # robust-cholesky switch (a sampler must never emit NaN data)
    chol0 = jnp.linalg.cholesky(cov)
    ok = jnp.all(jnp.isfinite(chol0))
    jit_val = jnp.where(ok, 0.0, 1e-3).astype(x.dtype)
    chol = jnp.linalg.cholesky(cov + jit_val * eye)
    z = jax.random.normal(key, (n * m,), dtype=x.dtype)
    y_flat = chol @ z  # task-major (M, N)
    return y_flat.reshape(m, n).T  # (N, M)


def sim_mnts(key, n: int = 200, m: int = 2, sigma2_err: float = 1e-2) -> SimData:
    """Nonseparable nonstationary synthetic subject (reference SIM_MNTS)."""
    k_x, k_y = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(k_x, (n,), dtype=settings.dtype))
    tilde_l = 3.0 * (x - 1.0) ** 3 - 3.0
    ell = jnp.exp(tilde_l)
    stds = jnp.stack([1.0 + x**2, 2.0 - x**2], axis=1)
    cors = jnp.cos(x * jnp.pi)
    ls = _chol_process_from_std_cor(stds, cors)
    y = _draw_y(k_y, x, ell, ls, sigma2_err)
    l_vecs = transforms.tril_to_vec(ls, m).reshape(-1)
    return SimData(x, ell, l_vecs, sigma2_err, y, stds, cors)


def sim_mnts_s(key, n: int = 200, m: int = 2, sigma2_err: float = 1e-2) -> SimData:
    """Stationary-correlation variant (reference SIM_MNTS_S, sim.py:102-171)."""
    k_x, k_y = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(k_x, (n,), dtype=settings.dtype))
    tilde_l = 3.0 * (x - 1.0) ** 3 - 3.0
    ell = jnp.exp(tilde_l)
    std = 1.0 + x**2
    stds = jnp.stack([std * 1.0, std * 2.0], axis=1)  # L11=1, L22=2 (sim.py:115-118)
    cors = 0.5 * jnp.ones_like(x)
    ls = _chol_process_from_std_cor(stds, cors)
    y = _draw_y(k_y, x, ell, ls, sigma2_err)
    l_vecs = transforms.tril_to_vec(ls, m).reshape(-1)
    return SimData(x, ell, l_vecs, sigma2_err, y, stds, cors)


class HeteroSimData(NamedTuple):
    """A heteroscedastic-noise synthetic subject with ground-truth latents."""

    x: jnp.ndarray  # (N,)
    l: jnp.ndarray  # (N,) true lengthscale process
    l_vecs: jnp.ndarray  # (N*T,) true per-point Cholesky vectors
    tilde_sigma2_err: jnp.ndarray  # (N*M,) task-major true log noise variances
    y: jnp.ndarray  # (N, M)
    stds: jnp.ndarray  # (N, M)
    cors: jnp.ndarray  # (N,)


def sim_mnts_hetero(key, n: int = 200, m: int = 2) -> HeteroSimData:
    """SIM_MNTS with input-dependent noise (the extended driver's model:
    ``Nonseparable_model_mpiKAISER_extended.py:155-247``).

    Truth noise log-variance processes (task-major): task 0 rises from −5 to
    −2 across the input range, task 1 falls from −2 to −5 — smooth, strongly
    identified against the O(1) signal processes.
    """
    assert m == 2, "reference truth processes are bivariate"
    k_x, k_y = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(k_x, (n,), dtype=settings.dtype))
    tilde_l = 3.0 * (x - 1.0) ** 3 - 3.0
    ell = jnp.exp(tilde_l)
    stds = jnp.stack([1.0 + x**2, 2.0 - x**2], axis=1)
    cors = jnp.cos(x * jnp.pi)
    ls = _chol_process_from_std_cor(stds, cors)
    ts2 = jnp.concatenate([-5.0 + 3.0 * x, -2.0 - 3.0 * x])  # task-major (N*M,)

    k_xk = kernels.nonstationary_rbf_cov(x, ell1=ell)
    eye = jnp.eye(n * m, dtype=x.dtype)
    cov = gnmgp.gram(k_xk, ls) + jnp.diag(jnp.exp(ts2))
    chol0 = jnp.linalg.cholesky(cov)
    ok = jnp.all(jnp.isfinite(chol0))
    jit_val = jnp.where(ok, 0.0, 1e-3).astype(x.dtype)
    chol = jnp.linalg.cholesky(cov + jit_val * eye)
    z = jax.random.normal(k_y, (n * m,), dtype=x.dtype)
    y = (chol @ z).reshape(m, n).T
    l_vecs = transforms.tril_to_vec(ls, m).reshape(-1)
    return HeteroSimData(x, ell, l_vecs, ts2, y, stds, cors)


def _block_rbf(x, split: float, hyp0, hyp1):
    """Block-diagonal RBF covariance with different (log ℓ, log sf) per block.

    Legacy generators (sim.py:23-100) build nonstationarity this way via
    pyGPs ``cov.RBF`` with ``hyp = [log ℓ, log sf]``.
    """
    n = x.shape[0]
    n0 = int(n * split)
    k = jnp.zeros((n, n), x.dtype)
    k0 = kernels.rbf_cov(x[:n0], x[:n0], alpha=jnp.exp(hyp0[1]), beta=jnp.exp(hyp0[0]))
    k1 = kernels.rbf_cov(x[n0:], x[n0:], alpha=jnp.exp(hyp1[1]), beta=jnp.exp(hyp1[0]))
    k = k.at[:n0, :n0].set(k0)
    return k.at[n0:, n0:].set(k1)


def _mvn_draw(key, cov):
    chol = jnp.linalg.cholesky(cov + settings.jitter * jnp.eye(cov.shape[0], dtype=cov.dtype))
    return chol @ jax.random.normal(key, (cov.shape[0],), cov.dtype)


def sim_msdata(key, m: int, n: int, x):
    """Multi-output *stationary* data (legacy SIM_MSDATA, sim.py:82-100)."""
    k_b, k_y = jax.random.split(key)
    l_m = jax.random.normal(k_b, (m, m), settings.dtype)
    k_m = l_m @ l_m.T
    x = jnp.asarray(x, settings.dtype)
    k_n = kernels.rbf_cov(x, x, alpha=jnp.exp(1.0), beta=jnp.exp(-1.0))
    y = _mvn_draw(k_y, jnp.kron(k_m, k_n)).reshape(m, n).T
    return y, k_m, k_n


def sim_mndata(key, m: int, n: int, x, percentage: float = 0.5):
    """Multi-output *nonstationary* data via a blocked input covariance
    (legacy SIM_MNDATA, sim.py:23-46)."""
    k_b, k_y = jax.random.split(key)
    l_m = jax.random.normal(k_b, (m, m), settings.dtype)
    k_m = l_m @ l_m.T
    x = jnp.asarray(x, settings.dtype)
    k_n = _block_rbf(x, percentage, (-1.0, 1.0), (-4.0, 2.0))
    y = _mvn_draw(k_y, jnp.kron(k_m, k_n)).reshape(m, n).T
    return y, k_m, k_n


def sim_usdata(key, n: int, x):
    """Univariate stationary data (legacy SIM_USDATA, sim.py:48-59)."""
    x = jnp.asarray(x, settings.dtype)
    k = kernels.rbf_cov(x, x, alpha=jnp.exp(1.0), beta=jnp.exp(-1.0))
    return _mvn_draw(key, k), k


def sim_undata(key, n: int, x):
    """Univariate nonstationary data (legacy SIM_UNDATA, sim.py:61-80)."""
    x = jnp.asarray(x, settings.dtype)
    k = _block_rbf(x, 0.5, (-1.0, 1.0), (-3.0, 2.0))
    return _mvn_draw(key, k), k


def sim_replicates(key, n_replicates: int, n: int = 200, stationary_cor: bool = False):
    """Generate a batch of seeded replicates (reference __main__, sim.py:360-363).

    Returns a SimData pytree with a leading replicate axis — ready for
    vmap/shard_map fleet fitting.
    """
    keys = jax.random.split(key, n_replicates)
    gen = sim_mnts_s if stationary_cor else sim_mnts
    return jax.vmap(lambda k: gen(k, n=n))(keys)
