"""Robust dense Cholesky solves with a deterministic jitter ladder.

The reference guards ill-conditioned factorizations with a *stochastic* retry
loop — ``while loglik != loglik: …`` re-running a symeig with uniform-random
diagonal jitter (``Utility/logpos.py:267-268``, ``distributions.py:55-96``).
That is host control flow with nondeterministic results and cannot live inside
``jit``.

The TPU-native replacement is a deterministic jitter *ladder*: try Cholesky at
escalating jitter levels, select the first finite factorization with
``jnp.where`` — fully traced, reproducible, and differentiable (gradients flow
through the selected branch only).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .. import settings
from . import blocked

#: Optionally route float64 factorizations/solves of at least this size
#: through the blocked matmul-based implementations (ops/blocked.py).
#: Off by default: measured on TPU, the emulated f64 Cholesky is *latency-
#: bound per column* (~64us/col, linear in n), so blocking does not reduce
#: the sequential column count and loses slightly (193 vs 148 ms at n=2048).
#: The fast parity path is the mixed kernel (ops/mixed.py) instead; the
#: blocked ops remain as the building block for the mesh-sharded Cholesky.
#: NMGP_BLOCKED_CHOL=1 enables.
BLOCKED_MIN_N = 512
_BLOCKED_ENABLED = os.environ.get("NMGP_BLOCKED_CHOL", "0") not in ("0", "false")

#: Minimum size for the mixed-precision logdet+quad kernel (below it the
#: emulated f64 Cholesky's per-column latency is tolerable).
MIXED_MIN_N = 192

#: Small-f64 factor routing (ops/blocked.py unrolled recursive kernels):
#: XLA's f64 Cholesky pays ~64 us of sequential-column latency per column on
#: TPU (emulation), so a 128x128 K_mm factor costs ~8 ms of pure latency
#: every sparse-objective evaluation.  The unrolled kernel is straight-line
#: matmul/sqrt dataflow — no While iterations at all.  "auto" (default):
#: on for small f64 factors off-CPU (measured A/B on the chip in
#: benchmarks/kmm_probe.py); LAPACK wins on CPU.  NMGP_UNROLLED_CHOL=1/0
#: forces.
UNROLLED_MAX_N = 512
_UNROLLED = os.environ.get("NMGP_UNROLLED_CHOL", "auto").lower()


def use_unrolled(a: jnp.ndarray) -> bool:
    """True when the unrolled recursive small-factor kernel should serve
    this matrix (see ``UNROLLED_MAX_N`` notes)."""
    if a.dtype != jnp.float64 or a.ndim != 2 or a.shape[-1] > UNROLLED_MAX_N:
        return False
    if _UNROLLED == "auto":
        return jax.default_backend() != "cpu"
    return _UNROLLED not in ("0", "false")


def safe_cholesky_unrolled(a: jnp.ndarray, fallback: float | None = None):
    """:func:`safe_cholesky`'s deterministic jitter ladder over the unrolled
    recursive kernel (ops/blocked.unrolled_cholesky) — the small-f64 fast
    path for per-evaluation Grams like the sparse tier's K_mm.

    Unlike :func:`safe_cholesky` (which executes both ladder rungs so at
    most two XLA Cholesky expansions are ever lowered), the retry here
    rides ``lax.cond``: the unrolled kernel is straight-line jnp ops with
    no expander compile cost, and the common case (finite plain factor)
    then pays for ONE factorization — measured as part of the sparse
    factor/solve segment (benchmarks/kmm_probe.py --breakdown).  Identical
    values either way: the taken branch computes the same factor.
    """
    chol0 = blocked.unrolled_cholesky(a)
    if fallback is None:
        fallback = (
            FALLBACK_REL_F32 if a.dtype == jnp.float32 else FALLBACK_REL_F64
        )
    ok = jnp.all(jnp.isfinite(chol0))

    def retry(_):
        scale = jnp.mean(jnp.diagonal(a, axis1=-2, axis2=-1))
        eye = jnp.eye(a.shape[-1], dtype=a.dtype)
        return blocked.unrolled_cholesky(
            a + (jnp.asarray(fallback, a.dtype) * scale) * eye
        )

    return jax.lax.cond(ok, lambda _: chol0, retry, None)


def robust_cholesky_small(a: jnp.ndarray) -> jnp.ndarray:
    """Jitter-ladder factor via the measured-best kernel for the
    size/backend: the unrolled recursive kernel off-CPU for small f64
    Grams (:func:`use_unrolled`), else the XLA factor with the forced
    robust ladder."""
    if use_unrolled(a):
        return safe_cholesky_unrolled(a)
    return safe_cholesky(a, force_robust=True)


def tri_solve_small(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``L^{-1} b`` via the explicit unrolled triangular inverse when gated
    (ONE GEMM riding the MXU — no substitution latency), else the XLA
    substitution.  For small well-scaled factors only (f64 eps keeps the
    inverse's cond-amplified error far below the 1e-6 parity bar)."""
    if use_unrolled(l):
        return blocked.unrolled_tri_inv(l) @ b
    return tri_solve(l, b)


def _use_blocked(a: jnp.ndarray) -> bool:
    return (
        _BLOCKED_ENABLED
        and a.dtype == jnp.float64
        and a.shape[-1] >= BLOCKED_MIN_N
    )


def best_cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Cholesky via the fastest correct path for the dtype/size."""
    if _use_blocked(a):
        return blocked.blocked_cholesky(a)
    return jnp.linalg.cholesky(a)


def tri_solve(l: jnp.ndarray, b: jnp.ndarray, trans: bool = False) -> jnp.ndarray:
    """Lower-triangular solve via the fastest correct path for the dtype/size."""
    if _use_blocked(l):
        return blocked.blocked_trsm(l, b, trans)
    return jax.scipy.linalg.solve_triangular(l, b, lower=True, trans=1 if trans else 0)

#: Relative fallback jitter (fraction of the mean diagonal) when the plain
#: Cholesky fails: f64 keeps the reference-scale 1e-4; f32 needs ~1e-3 of the
#: diagonal for smooth-RBF Grams whose spectrum spans > f32 range.
FALLBACK_REL_F64 = 1e-4
FALLBACK_REL_F32 = 1e-3


def safe_cholesky(
    a: jnp.ndarray, fallback: float | None = None, force_robust: bool = False
) -> jnp.ndarray:
    """Cholesky of a symmetric PSD matrix with deterministic jitter escalation.

    Two factorizations are lowered (XLA compiles Cholesky once per call site,
    so a longer ladder multiplies compile time — measured 4× on a 2000×2000
    float64 problem): the plain factor, and a retry whose jitter is a
    *data-dependent scalar* — zero when the plain factor is finite (the retry
    then recomputes the same factor), ``fallback · mean(diag)`` otherwise.
    Fully differentiable; gradients flow through the selected factorization.
    If even the fallback fails, NaNs surface to the caller rather than being
    hidden.
    """
    chol0 = best_cholesky(a)
    if not settings.robust_cholesky and not force_robust:
        return chol0
    if fallback is None:
        fallback = (
            FALLBACK_REL_F32 if a.dtype == jnp.float32 else FALLBACK_REL_F64
        )
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    ok = jnp.all(jnp.isfinite(chol0))
    scale = jnp.mean(jnp.diagonal(a, axis1=-2, axis2=-1))
    jit_val = jnp.where(ok, 0.0, fallback * scale).astype(a.dtype)
    return best_cholesky(a + jit_val * eye)


def prior_cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Host-side float64 Cholesky for *loop-invariant prior Grams*.

    Smooth-RBF prior covariances are catastrophically ill-conditioned
    (spectrum spanning ~1e18): in float32 no reasonable jitter preserves the
    distribution.  These factorizations happen ONCE per objective (hoisted by
    ``make_objective``), so they are computed eagerly on the host in float64
    with an escalating relative-jitter ladder and cast to the working dtype —
    the "f64 islands" strategy (DESIGN §4).  Must be called outside jit.
    """
    import numpy as np

    if isinstance(a, jax.core.Tracer):
        # inside a trace there is no host path; prior factors must stay
        # robust even when the global fast-path switch disables retries
        return safe_cholesky(a, force_robust=True)
    c = _host_chol_ladder(np.asarray(a, np.float64))
    return jnp.asarray(c, a.dtype)


def _host_chol_ladder(host):
    """numpy-f64 Cholesky with escalating relative jitter."""
    import numpy as np

    scale = float(np.mean(np.diag(host)))
    for rel in (0.0, 1e-10, 1e-8, 1e-6, 1e-4, 1e-3, 1e-2):
        try:
            return np.linalg.cholesky(host + rel * scale * np.eye(host.shape[0]))
        except np.linalg.LinAlgError:
            continue
    raise np.linalg.LinAlgError("prior covariance is not positive definite")


def prior_rbf_cholesky(x, alpha, beta):
    """Host-f64 RBF prior Gram *construction* + factorization.

    In float32 mode the Gram itself loses the precision the factorization
    needs (rounding perturbs eigenvalues by ~eps·λ_max, beyond any
    distribution-preserving jitter), so the Gram is built in float64 from the
    raw inputs before factoring, then the factor is cast to the working
    dtype.  Falls back to the traced robust path when ``x`` is abstract.
    Reference prior covariances: ``RBF_cov`` with the self-nugget
    (kernels.py:24-43).
    """
    import numpy as np

    if isinstance(x, jax.core.Tracer):
        from . import kernels as _kernels

        return safe_cholesky(
            _kernels.rbf_cov(x, alpha=alpha, beta=beta), force_robust=True
        )
    x64 = np.asarray(x, np.float64)
    d2 = (x64[:, None] - x64[None, :]) ** 2
    gram = alpha**2 * np.exp(-0.5 * d2 / beta**2) + settings.jitter * np.eye(len(x64))
    return jnp.asarray(_host_chol_ladder(gram), settings.dtype)


def prior_rbf_inv(x, alpha, beta):
    """Host-f64 RBF prior Gram → hoisted ``TriInv`` (inverse factor + logdet).

    Like :func:`prior_rbf_cholesky` but additionally inverts the triangular
    factor on the host, so the per-evaluation prior solve inside jitted
    objectives is a matvec (see ``dists.TriInv``).  Falls back to the traced
    robust Cholesky (no inversion) when ``x`` is abstract.
    """
    import numpy as np

    from .. import dists as _dists

    if isinstance(x, jax.core.Tracer):
        from . import kernels as _kernels

        return safe_cholesky(
            _kernels.rbf_cov(x, alpha=alpha, beta=beta), force_robust=True
        )
    import scipy.linalg

    x64 = np.asarray(x, np.float64)
    d2 = (x64[:, None] - x64[None, :]) ** 2
    gram = alpha**2 * np.exp(-0.5 * d2 / beta**2) + settings.jitter * np.eye(len(x64))
    c = _host_chol_ladder(gram)
    w = scipy.linalg.solve_triangular(c, np.eye(len(x64)), lower=True)
    logdet = 2.0 * float(np.sum(np.log(np.diag(c))))
    return _dists.TriInv(
        jnp.asarray(w, settings.dtype), jnp.asarray(logdet, settings.dtype)
    )


def prior_rbf_eig(x, alpha, beta):
    """Host-f64 RBF prior Gram eigendecomposition ``(U, sqrt_eigs)``.

    Like :func:`prior_rbf_cholesky` but returns the orthogonal eigenbasis and
    per-direction prior standard deviations instead of a triangular factor.
    This is the form the partially non-centered reparameterization
    (``inference.whiten``) needs: with ``A = U diag(s)`` the map's inverse is
    the cheap ``diag(1/s) Uᵀ`` and each direction's scale can later be retuned
    independently.  Eigenvalues are floored at the jitter level before the
    square root, matching the nugget ``prior_rbf_cholesky`` adds.  Must be
    called outside jit (prior Grams are loop-invariant; see DESIGN §4).
    """
    import numpy as np

    x64 = np.asarray(x, np.float64)
    d2 = (x64[:, None] - x64[None, :]) ** 2
    gram = alpha**2 * np.exp(-0.5 * d2 / beta**2) + settings.jitter * np.eye(len(x64))
    eigs, u = np.linalg.eigh(gram)
    s = np.sqrt(np.maximum(eigs, settings.jitter))
    return jnp.asarray(u, settings.dtype), jnp.asarray(s, settings.dtype)


def chol_logdet(chol: jnp.ndarray):
    """``logdet(A)`` from its Cholesky factor."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)


def chol_solve(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` given ``chol(A)``."""
    if _use_blocked(chol):
        return blocked.blocked_chol_solve(chol, b)
    return jax.scipy.linalg.cho_solve((chol, True), b)


def psd_logdet_quad(a: jnp.ndarray, y: jnp.ndarray):
    """``(logdet A, yᵀ A⁻¹ y)`` via one robust Cholesky.

    Replaces the reference's dense ``torch.inverse`` + ``torch.logdet`` pair on
    the MN×MN GNMGP Gram (``Utility/logpos.py:352-353``) — one factorization
    instead of two O(n³) ops, with strictly better numerics.
    """
    if (
        settings.mixed_solves
        and a.dtype == jnp.float64
        and a.shape[-1] >= MIXED_MIN_N
        and y.ndim == 1
    ):
        from . import mixed

        return mixed.mixed_logdet_quad(a, y)
    c = safe_cholesky(a)
    sol = tri_solve(c, y)
    return chol_logdet(c), jnp.sum(sol * sol, axis=-1)


def psd_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` for symmetric PSD A with the robust Cholesky."""
    return chol_solve(safe_cholesky(a), b)
