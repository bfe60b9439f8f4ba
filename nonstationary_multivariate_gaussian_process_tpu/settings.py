"""Global numerics settings.

TPU-native analogue of the reference's ``Utility/settings.py``
(``/root/reference/Utility/settings.py:3-6``: ``torch.DoubleTensor``,
``jitter = 1e-6``, ``precision = 1e-6``).

The reference runs everything in float64 on CPU.  On TPU, float64 is emulated
and slow, so we make the working dtype configurable:

* ``NMGP_X64=1`` (default): float64 everywhere — bit-compatible with the
  reference posterior values to ~1e-6 rtol.
* ``NMGP_X64=0``: float32 compute; solves still honor the same jitter ladder.

Import this module before any other module in the package: it flips
``jax_enable_x64`` which must happen before arrays are created.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_X64 = os.environ.get("NMGP_X64", "1") not in ("0", "false", "False")

#: Precision mode: "f64" (default — reference parity dtype), "f32" (headline
#: speed), or "mixed" — f64 arrays/values with the O(n^3) solve work done by
#: the f32-preconditioned corrected kernel (ops/mixed.py): f64-accurate
#: *values* (parity holds, tests/test_mixed.py) at near-f32 speed.
precision_mode = os.environ.get(
    "NMGP_PRECISION", "f64" if _X64 else "f32"
).lower()
if precision_mode not in ("f64", "f32", "mixed"):
    raise ValueError(f"NMGP_PRECISION must be f64|f32|mixed, got {precision_mode}")
_X64 = precision_mode in ("f64", "mixed")
if _X64:
    jax.config.update("jax_enable_x64", True)

#: True in the "mixed" mode: large f64 PSD solves route through
#: ops.mixed.mixed_logdet_quad.
mixed_solves = precision_mode == "mixed"

# Persistent XLA compilation cache: float64 linear-algebra gradients are
# expensive to compile (minutes on TPU); cache them across processes.
_cache_dir = os.environ.get(
    "NMGP_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
)
if _cache_dir and _cache_dir != "0":
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

#: Default floating dtype for all covariance/posterior computations.
dtype = jnp.float64 if _X64 else jnp.float32

#: Diagonal jitter added to self-covariance matrices (reference: settings.jitter).
jitter = 1e-6

#: Small positive floor used for variance clipping and fallback jitter
#: (reference: settings.precision).
precision = 1e-6

#: When True (default), dense factorizations run the two-attempt jitter
#: escalation (ops.chol.safe_cholesky).  Set NMGP_ROBUST_CHOL=0 to lower a
#: single Cholesky per call site — ~2x fewer chol kernels in the GNMGP hot
#: path, for well-conditioned production runs.
robust_cholesky = os.environ.get("NMGP_ROBUST_CHOL", "1") not in ("0", "false")


#: When True, the f32 GNMGP Gram uses the exact broadcast contraction instead
#: of XLA's default (bf16-pass) einsum — ~8% slower gradients, true-f32 Grams.
#: f64/mixed always use the exact form.  See models/gnmgp.gram.
gram_exact = os.environ.get("NMGP_GRAM_EXACT", "0") not in ("0", "false")


def asarray(x, dt=None):
    """Convert to a jnp array in the global working dtype."""
    return jnp.asarray(x, dtype=dt or dtype)
