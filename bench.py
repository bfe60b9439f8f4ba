"""Headline benchmark (BASELINE.json): nonseparable (GNMGP) model at N=1000.

Measures, on the available accelerator:

* jitted log-posterior **gradient** evaluations/sec (the unit of MCMC/MAP work
  — each HMC leapfrog step costs one),
* HMC iterations/sec at the reference's budget (20 leapfrog steps/iter,
  ``Nonseparable_model.py:229``),
* the MN×MN Cholesky wall-clock.

``vs_baseline`` is the speedup of grad-evals/sec over a torch-CPU float64
implementation of the same objective measured in-process — the reference's
execution model (pure Python + torch CPU double precision, SURVEY §0).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Default the benchmark to the production fast path (one Cholesky per solve;
# the two-attempt robust escalation is for ill-conditioned exploratory fits and
# doubles both compile and run time).  Override with NMGP_ROBUST_CHOL=1.
os.environ.setdefault("NMGP_ROBUST_CHOL", "0")

N = int(os.environ.get("NMGP_BENCH_N", "1000"))
M = int(os.environ.get("NMGP_BENCH_M", "2"))
N_GRAD_EVALS = int(os.environ.get("NMGP_BENCH_EVALS", "30"))
N_HMC = int(os.environ.get("NMGP_BENCH_HMC", "10"))
BASELINE_EVALS = int(os.environ.get("NMGP_BENCH_BASELINE_EVALS", "3"))


def _problem():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(size=N))
    y = rng.normal(size=(N, M))
    t = M * (M + 1) // 2
    vec = np.concatenate(
        [
            -1.0 + 0.1 * rng.normal(size=N),
            0.3 * rng.normal(size=N * t),
            [-4.0],
        ]
    )
    return x, y, vec


def bench_jax(x, y, vec):
    import jax

    # persistent compilation cache: the large f64 gradient program compiles
    # once per machine, then re-runs of bench.py start in seconds
    cache_dir = os.environ.get("NMGP_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu import settings
    from nonstationary_multivariate_gaussian_process_tpu.models import FullData, gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.inference import hmc

    xd = jnp.asarray(x, settings.dtype)
    yd = jnp.asarray(y, settings.dtype)
    vd = jnp.asarray(vec, settings.dtype)
    nlp = gnmgp.make_objective(FullData(xd, yd))
    grad_fn = jax.jit(jax.value_and_grad(nlp))

    # warm up / compile
    val, g = grad_fn(vd)
    val.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(N_GRAD_EVALS):
        val, g = grad_fn(vd)
    g.block_until_ready()
    grad_evals_per_sec = N_GRAD_EVALS / (time.perf_counter() - t0)

    # Cholesky wall-clock on the MN x MN Gram
    mn = N * M
    a = jnp.eye(mn, dtype=settings.dtype) * 2.0 + 0.1 * jnp.ones((mn, mn), settings.dtype) / mn
    chol_fn = jax.jit(jnp.linalg.cholesky)
    chol_fn(a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        c = chol_fn(a)
    c.block_until_ready()
    chol_ms = (time.perf_counter() - t0) / 5 * 1e3

    # HMC iterations/sec at the reference budget (20 leapfrog steps)
    run = lambda: hmc.hmc_sample(
        nlp, vd, n_samples=N_HMC, key=jax.random.PRNGKey(0),
        step_size=1e-5, n_leapfrog=20,
    )
    res = run()
    res.samples.block_until_ready()  # includes compile
    t0 = time.perf_counter()
    res = run()
    res.samples.block_until_ready()
    hmc_iters_per_sec = N_HMC / (time.perf_counter() - t0)
    return grad_evals_per_sec, hmc_iters_per_sec, chol_ms


def bench_torch_baseline(x, y, vec):
    """Reference-style objective in torch CPU float64: dense MN×MN Gram,
    ``inverse`` + ``logdet`` likelihood, full GP priors — one backward pass
    per eval, as the reference's training loop does."""
    import torch

    torch.set_default_dtype(torch.float64)
    n, m = y.shape
    t = m * (m + 1) // 2
    xt = torch.as_tensor(x)
    yt = torch.as_tensor(y.T.reshape(-1))
    d2 = (xt[:, None] - xt[None, :]) ** 2

    def nlp(v):
        tilde_l = v[:n]
        ul = v[n : n + n * t].reshape(n, t)
        ts2 = v[-1]
        ell = torch.exp(tilde_l)
        lmat = torch.zeros(n, m, m)
        idx = torch.tril_indices(m, m)
        diag_slots = torch.cumsum(torch.arange(1, m + 1), 0) - 1
        lv = ul.clone()
        lv[:, diag_slots] = torch.exp(ul[:, diag_slots])
        lmat[:, idx[0], idx[1]] = lv
        a = ell[:, None] ** 2 + ell[None, :] ** 2
        b = ell[:, None] * ell[None, :]
        k_x = torch.sqrt(2 * b / a) * torch.exp(-d2 / a) + 1e-6 * torch.eye(n)
        b4 = torch.einsum("nab,pcb->napc", lmat, lmat)
        k4 = torch.einsum("np,napc->ancp", k_x, b4)
        cov = k4.reshape(n * m, n * m) + torch.exp(ts2) * torch.eye(n * m)
        inv = torch.inverse(cov)
        logdet = torch.logdet(cov)
        loglik = -0.5 * logdet - 0.5 * yt @ inv @ yt
        prior_k = 25.0 * torch.exp(-0.5 * d2) + 1e-6 * torch.eye(n)
        pl = torch.distributions.MultivariateNormal(
            torch.zeros(n), covariance_matrix=prior_k
        )
        lp = pl.log_prob(tilde_l) + sum(pl.log_prob(ul[:, j]) for j in range(t))
        lp = lp + (-2.0) * ts2 - torch.exp(ts2) / 1.0 + ts2
        return -(loglik + lp)

    v = torch.as_tensor(vec).clone().requires_grad_(True)
    # warm up
    nlp(v).backward()
    t0 = time.perf_counter()
    for _ in range(BASELINE_EVALS):
        v.grad = None
        nlp(v).backward()
    return BASELINE_EVALS / (time.perf_counter() - t0)


def main():
    x, y, vec = _problem()
    grad_eps, hmc_ips, chol_ms = bench_jax(x, y, vec)
    try:
        base_eps = bench_torch_baseline(x, y, vec)
    except Exception:
        base_eps = float("nan")
    vs = grad_eps / base_eps if base_eps == base_eps else float("nan")
    print(
        json.dumps(
            {
                "metric": f"gnmgp_n{N}_loglik_grad_evals_per_sec",
                "value": round(grad_eps, 3),
                "unit": "evals/s",
                "vs_baseline": round(vs, 2) if vs == vs else None,
                "hmc_iters_per_sec_20leapfrog": round(hmc_ips, 3),
                "cholesky_mnxmn_ms": round(chol_ms, 3),
                "torch_cpu_baseline_evals_per_sec": round(base_eps, 3)
                if base_eps == base_eps
                else None,
                "n": N,
                "m": M,
                "dtype": "float64" if os.environ.get("NMGP_X64", "1") != "0" else "float32",
            }
        )
    )


if __name__ == "__main__":
    main()
