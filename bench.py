"""Headline benchmark (BASELINE.json): nonseparable (GNMGP) model at N=1000.

Three measurement passes (each a subprocess — dtype is process-global):

* **float32 probe (headline)** — the TPU-native performance path: jitted
  log-posterior gradient evaluations/sec, real HMC iterations/sec at the
  reference budget (20 leapfrog steps, ``Nonseparable_model.py:229``),
  MN×MN Cholesky ms, vmapped fleet throughput.
* **mixed probe (parity configuration)** — NMGP_PRECISION=mixed: f64 values
  (1e-6-rtol log-posterior parity with the reference holds in this mode,
  ``tests/test_mixed.py::TestMixedModeObjectiveParity``) with the O(n^3)
  solves done by the f32-preconditioned corrected kernel (``ops/mixed.py``).
  Real HMC runs in this mode.  ``parity_dtype_vs_baseline`` is this probe's
  gradient rate over the baseline — the BASELINE.md "20x at 1e-6 rtol" box.
* **float64 pass** — the reference's exact dtype, for the record.  Its HMC
  figure is derived from the gradient rate: the monolithic f64 scan program
  trips a device fault on the current TPU runtime, so it is never executed.

``vs_baseline`` denominates against the **genuine reference objective**
(``/root/reference/Utility/logpos.py:299`` ``nlogpos_obj_SVC``, imported live
with torch>=2 shims) timed on this host's CPU in float64 — the reference's
execution model (SURVEY §0).  A faithful torch reimplementation is also timed
as a cross-check (``torch_cpu_f64_reimpl_evals_per_sec``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Benchmark uses the production fast path (one Cholesky per solve).
os.environ.setdefault("NMGP_ROBUST_CHOL", "0")

N = int(os.environ.get("NMGP_BENCH_N", "1000"))
M = int(os.environ.get("NMGP_BENCH_M", "2"))
N_GRAD_EVALS = int(os.environ.get("NMGP_BENCH_EVALS", "30"))
N_HMC = int(os.environ.get("NMGP_BENCH_HMC", "5"))
BASELINE_EVALS = int(os.environ.get("NMGP_BENCH_BASELINE_EVALS", "3"))
FLEET = int(os.environ.get("NMGP_BENCH_FLEET", "8"))  # vmapped subjects (f32 only)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


#: Assumed single-chip peak for the MFU fraction (TFLOP/s).  Default is the
#: v5e MXU bf16 peak (197); override with NMGP_PEAK_TFLOPS for other chips
#: or to denominate against an f32 peak.  The achieved_tflops figure is
#: peak-assumption-free; mfu_fraction = achieved / this.
PEAK_TFLOPS = float(os.environ.get("NMGP_PEAK_TFLOPS", "197"))


def grad_flop_model(n: int, m: int) -> float:
    """Analytic FLOPs per GNMGP log-posterior gradient evaluation.

    Forward: Gram assembly einsums (2·N²M³ + N²M² — models/gnmgp.gram),
    Cholesky of the (MN)×(MN) covariance (mn³/3, LAPACK potrf count), two
    triangular solves for the quadratic form (2·mn²), T+1 prior triangular
    matvecs (hoisted factors — (T+1)·2·N²).  Backward: the Cholesky pullback
    is a triangular solve against the full factor plus a symmetrized matmul
    (≈2·mn³/3 + mn³/3 = mn³) and the Gram VJP doubles the assembly einsums.
    Total ≈ (4/3)·mn³ + small-order terms — a *model*, stated so the MFU
    number is auditable, not a measured op count.
    """
    mn = n * m
    t = m * (m + 1) // 2
    gram_fwd = 2.0 * n * n * m**3 + n * n * m * m
    chol_fwd = mn**3 / 3.0
    solves = 2.0 * mn**2
    priors = (t + 1) * 2.0 * n**2
    backward = mn**3 + 2.0 * gram_fwd + solves
    return gram_fwd + chol_fwd + solves + priors + backward


def _problem():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(size=N))
    y = rng.normal(size=(N, M))
    t = M * (M + 1) // 2
    vec = np.concatenate(
        [-1.0 + 0.1 * rng.normal(size=N), 0.3 * rng.normal(size=N * t), [-4.0]]
    )
    return x, y, vec


def bench_jax(x, y, vec, run_hmc: bool):
    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu import settings
    from nonstationary_multivariate_gaussian_process_tpu.models import FullData, gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.inference import hmc

    dtype_name = settings.precision_mode
    xd = jnp.asarray(x, settings.dtype)
    yd = jnp.asarray(y, settings.dtype)
    vd = jnp.asarray(vec, settings.dtype)
    nlp = gnmgp.make_objective(FullData(xd, yd))

    # measure the gradient rate DEVICE-SIDE: one lax.scan of N_GRAD_EVALS
    # dependent evaluations per host call, so the figure reflects device
    # throughput rather than host/tunnel dispatch latency
    def scan_grads(v):
        def body(carry, _):
            val, g = jax.value_and_grad(nlp)(carry)
            return carry + 0.0 * g, val

        v2, vals = jax.lax.scan(body, v, None, length=N_GRAD_EVALS)
        return vals[-1]

    scan_fn = jax.jit(scan_grads)
    t0 = time.perf_counter()
    scan_fn(vd).block_until_ready()
    _log(f"[{dtype_name}] grad compile+first-chunk {time.perf_counter()-t0:.1f}s")
    rates = []
    for _ in range(2):  # best-of-2 guards against transient device throttling
        t0 = time.perf_counter()
        scan_fn(vd).block_until_ready()
        rates.append(N_GRAD_EVALS / (time.perf_counter() - t0))
    grad_eps = max(rates)
    _log(f"[{dtype_name}] grad evals/sec {grad_eps:.3f} (runs: {[round(r,1) for r in rates]})")

    mn = N * M
    a = jnp.eye(mn, dtype=settings.dtype) * 2.0 + 0.1 / mn
    chol_fn = jax.jit(jnp.linalg.cholesky)
    chol_fn(a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        c = chol_fn(a)
    c.block_until_ready()
    chol_ms = (time.perf_counter() - t0) / 5 * 1e3
    _log(f"[{dtype_name}] cholesky {chol_ms:.2f}ms")

    hmc_estimated = True
    hmc_ips = grad_eps / 20.0
    if run_hmc:
        try:
            run = lambda: hmc.hmc_sample(
                nlp, vd, n_samples=N_HMC, key=jax.random.PRNGKey(0),
                step_size=1e-5, n_leapfrog=20,
            )
            res = run()
            res.samples.block_until_ready()  # includes compile
            t0 = time.perf_counter()
            res = run()
            res.samples.block_until_ready()
            hmc_ips = N_HMC / (time.perf_counter() - t0)
            hmc_estimated = False
        except Exception as e:  # pragma: no cover — device dependent
            _log(f"[{dtype_name}] HMC run failed ({type(e).__name__}); estimating")
    _log(f"[{dtype_name}] hmc iters/sec {hmc_ips:.3f} (estimated={hmc_estimated})")

    # per-chip fleet throughput at the production cohort scale (N=200, the
    # reference's per-subject size): vmapped per-subject gradients — small
    # per-subject factorizations batch efficiently where an N=1000 problem
    # already saturates the chip alone
    fleet_eps = None
    fleet_n = int(os.environ.get("NMGP_BENCH_FLEET_N", "200"))
    if run_hmc and FLEET > 1:
        try:
            rng = np.random.default_rng(1)
            t = M * (M + 1) // 2
            xs = jnp.asarray(
                np.sort(rng.uniform(size=(FLEET, fleet_n)), axis=1), settings.dtype
            )
            ys = jnp.asarray(rng.normal(size=(FLEET, fleet_n, M)), settings.dtype)
            vs = jnp.asarray(
                np.concatenate(
                    [
                        -1.0 + 0.1 * rng.normal(size=(FLEET, fleet_n)),
                        0.3 * rng.normal(size=(FLEET, fleet_n * t)),
                        -4.0 * np.ones((FLEET, 1)),
                    ],
                    axis=1,
                ),
                settings.dtype,
            )

            def subj_nlp(v, x, y):
                return gnmgp.nlogpos(v, y, x, prior=False)

            fleet_grad = jax.jit(jax.vmap(jax.grad(subj_nlp)))
            g = fleet_grad(vs, xs, ys)
            g.block_until_ready()
            n_rep = 20
            t0 = time.perf_counter()
            for _ in range(n_rep):
                g = fleet_grad(vs, xs, ys)
            g.block_until_ready()
            fleet_eps = FLEET * n_rep / (time.perf_counter() - t0)
            _log(f"[{dtype_name}] fleet({FLEET}, N={fleet_n}) grad evals/sec {fleet_eps:.3f}")
        except Exception as e:
            _log(f"[{dtype_name}] fleet probe failed ({type(e).__name__})")

    # fleet-size sweep (f32 headline only): where does vmapped per-subject
    # throughput saturate the chip? (VERDICT r2 #5)
    fleet_sweep = None
    if run_hmc and settings.precision_mode == "f32":
        try:
            sweep_sizes = [
                int(s) for s in os.environ.get(
                    "NMGP_BENCH_FLEET_SWEEP", "8,16,32,64"
                ).split(",")
            ]
            rng = np.random.default_rng(3)
            t = M * (M + 1) // 2
            fleet_sweep = {}
            for s_count in sweep_sizes:
                xs = jnp.asarray(
                    np.sort(rng.uniform(size=(s_count, fleet_n)), axis=1),
                    settings.dtype,
                )
                ys = jnp.asarray(
                    rng.normal(size=(s_count, fleet_n, M)), settings.dtype
                )
                vs = jnp.asarray(
                    np.concatenate(
                        [
                            -1.0 + 0.1 * rng.normal(size=(s_count, fleet_n)),
                            0.3 * rng.normal(size=(s_count, fleet_n * t)),
                            -4.0 * np.ones((s_count, 1)),
                        ],
                        axis=1,
                    ),
                    settings.dtype,
                )
                fg = jax.jit(jax.vmap(jax.grad(
                    lambda v, x, y: gnmgp.nlogpos(v, y, x, prior=False)
                )))
                fg(vs, xs, ys).block_until_ready()
                n_rep = 20
                t0 = time.perf_counter()
                for _ in range(n_rep):
                    g = fg(vs, xs, ys)
                g.block_until_ready()
                fleet_sweep[s_count] = s_count * n_rep / (time.perf_counter() - t0)
                _log(f"[{dtype_name}] fleet sweep S={s_count}: "
                     f"{fleet_sweep[s_count]:.1f} evals/s")
        except Exception as e:
            _log(f"[{dtype_name}] fleet sweep failed ({type(e).__name__})")
            fleet_sweep = None
    # tempered-SMC probe (f32 headline only): the round-3 sampler tier's
    # health signal — two independent prior->posterior runs at the
    # reference scale (N=200) must agree on the log evidence; spread is
    # the reproducibility number chain samplers never achieved at this N
    smc_row = {}
    if (run_hmc and settings.precision_mode == "f32"
            and os.environ.get("NMGP_BENCH_SMC", "1") != "0"):
        try:
            from nonstationary_multivariate_gaussian_process_tpu.data import sim
            from nonstationary_multivariate_gaussian_process_tpu.inference import (
                smc, whiten,
            )

            smc_n = int(os.environ.get("NMGP_BENCH_SMC_N", "128"))
            d = sim.sim_mnts(jax.random.PRNGKey(0), n=smc_n)
            snlp = gnmgp.make_objective(FullData(
                jnp.asarray(d.x, settings.dtype), jnp.asarray(d.y, settings.dtype)
            ))
            w = whiten.make_whitener("gnmgp", jnp.asarray(d.x, settings.dtype),
                                     smc_n, M)
            t0 = time.perf_counter()
            logzs, stages = [], []
            for i in range(2):
                # the mutation budget that measured ~1-nat run-to-run
                # agreement at N=200 (ROADMAP); n=128 keeps the probe under
                # ~5 min on one chip
                r = smc.smc_sample(
                    w.wrap(snlp), w.n_params, jax.random.PRNGKey(100 + i),
                    512, n_mutations=5, n_leapfrog=10, metric="full",
                    dispatch="host",
                )
                logzs.append(float(r.logz + w.logdet()))
                stages.append(int(r.n_stages))
                _log(f"[{dtype_name}] smc run {i}: stages={stages[-1]} "
                     f"beta={float(r.beta_final):.2f} logz={logzs[-1]:.1f}")
            smc_row = {
                "smc_logz_mean": float(np.mean(logzs)),
                "smc_logz_spread": float(abs(logzs[0] - logzs[1])),
                "smc_stages": stages,
                "smc_wall_s": time.perf_counter() - t0,
                "smc_n": smc_n,
            }
        except Exception as e:
            _log(f"[{dtype_name}] smc probe failed ({type(e).__name__}: {e})")

    # sparse (inducing-point) large-N probe (f32 headline only): the tier
    # that removes the O((MN)^3) ceiling — gradient rate at N far beyond the
    # exact path's budget (models/gnmgp_sparse.py)
    sparse_row = {}
    if (run_hmc and settings.precision_mode == "f32"
            and os.environ.get("NMGP_BENCH_SPARSE", "1") != "0"):
        try:
            from nonstationary_multivariate_gaussian_process_tpu.models import (
                gnmgp_sparse,
            )

            sp_n = int(os.environ.get("NMGP_BENCH_SPARSE_N", "2000"))
            sp_mz = int(os.environ.get("NMGP_BENCH_SPARSE_MZ", "64"))
            t = M * (M + 1) // 2
            rng3 = np.random.default_rng(4)
            xs = jnp.asarray(np.sort(rng3.uniform(size=sp_n)), settings.dtype)
            ys = jnp.asarray(rng3.normal(size=(sp_n, M)), settings.dtype)
            snlp_sp, ops_sp = gnmgp_sparse.make_objective(
                FullData(xs, ys), n_inducing=sp_mz
            )
            mz = int(ops_sp.z.shape[0])
            v_sp = jnp.asarray(
                np.concatenate([
                    -1.0 + 0.1 * rng3.normal(size=mz),
                    0.3 * rng3.normal(size=mz * t),
                    [-4.0],
                ]), settings.dtype,
            )

            def scan_sp(v):
                def body(c, _):
                    val, g = jax.value_and_grad(snlp_sp)(c)
                    return c + 0.0 * g, val
                return jax.lax.scan(body, v, None, length=N_GRAD_EVALS)[1][-1]

            fn_sp = jax.jit(scan_sp)
            fn_sp(v_sp).block_until_ready()
            rates_sp = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn_sp(v_sp).block_until_ready()
                rates_sp.append(N_GRAD_EVALS / (time.perf_counter() - t0))
            sparse_row = {
                "sparse_grad_evals_per_sec": max(rates_sp),
                "sparse_n": sp_n,
                "sparse_m_z": mz,
            }
            _log(f"[{dtype_name}] sparse(N={sp_n}, m_z={mz}) grad evals/sec "
                 f"{max(rates_sp):.1f}")
        except Exception as e:
            _log(f"[{dtype_name}] sparse probe failed ({type(e).__name__}: {e})")

    # secondary models at this precision (SNMGP/LMC ride the Kronecker path;
    # in mixed mode it routes through the corrected per-block solver)
    other = {}
    if settings.precision_mode == "mixed":
        from nonstationary_multivariate_gaussian_process_tpu.models import lmc, snmgp

        t = M * (M + 1) // 2
        rng2 = np.random.default_rng(2)
        svec = jnp.asarray(
            np.concatenate(
                [-1.0 + 0.1 * rng2.normal(size=N), 0.1 * rng2.normal(size=N),
                 0.3 * rng2.normal(size=t), [-4.0]]
            ), settings.dtype,
        )
        lvec = jnp.asarray(
            np.concatenate([[-1.0, 0.0], 0.3 * rng2.normal(size=t), [-4.0]]),
            settings.dtype,
        )
        for name, mod, v0 in (("snmgp", snmgp, svec), ("lmc", lmc, lvec)):
            try:
                onlp = mod.make_objective(FullData(xd, yd))

                def scan10(v, onlp=onlp):
                    def body(c, _):
                        val, g = jax.value_and_grad(onlp)(c)
                        return c + 0.0 * g, val
                    return jax.lax.scan(body, v, None, length=10)[0]

                fn2 = jax.jit(scan10)
                fn2(v0).block_until_ready()
                t0 = time.perf_counter()
                fn2(v0).block_until_ready()
                other[f"{name}_grad_evals_per_sec"] = 10 / (time.perf_counter() - t0)
                _log(f"[{dtype_name}] {name} grad evals/sec {other[f'{name}_grad_evals_per_sec']:.1f}")
            except Exception as e:
                _log(f"[{dtype_name}] {name} probe failed ({type(e).__name__})")
    flops = grad_flop_model(N, M)
    achieved_tflops = flops * grad_eps / 1e12
    fleet_achieved = None
    if fleet_sweep:
        best = max(fleet_sweep.values())
        fleet_achieved = grad_flop_model(fleet_n, M) * best / 1e12
    return {
        "grad_evals_per_sec": grad_eps,
        "hmc_iters_per_sec": hmc_ips,
        "hmc_estimated": hmc_estimated,
        "cholesky_ms": chol_ms,
        "fleet_grad_evals_per_sec": fleet_eps,
        "fleet_size": FLEET,
        "fleet_n": fleet_n,
        "fleet_sweep": fleet_sweep,
        "model_flops_per_grad": flops,
        "achieved_tflops": achieved_tflops,
        "mfu_fraction": achieved_tflops / PEAK_TFLOPS,
        "fleet_achieved_tflops": fleet_achieved,
        "dtype": dtype_name,
        **smc_row,
        **sparse_row,
        **other,
    }


def bench_reference_baseline(x, y, vec, n_evals: int | None = None):
    """Time the GENUINE reference objective (``Utility/logpos.nlogpos_obj_SVC``,
    ``/root/reference/Utility/logpos.py:299``) — value + backward per eval,
    torch CPU float64, with torch>=2 shims for removed ops (as in
    tests/conftest.py)."""
    import sys as _sys
    import warnings

    ref = os.environ.get("NMGP_REFERENCE_PATH", "/root/reference")
    if not os.path.isdir(os.path.join(ref, "Utility")):
        raise FileNotFoundError(f"reference not mounted at {ref}")
    if ref not in _sys.path:
        _sys.path.insert(0, ref)
    import torch

    torch.set_default_dtype(torch.float64)

    def _symeig(a, eigenvectors=False, upper=False):
        w, v = torch.linalg.eigh(a, UPLO="U" if upper else "L")
        return (w, v) if eigenvectors else (w, torch.zeros_like(a))

    torch.symeig = _symeig
    torch.solve = lambda input, A: (torch.linalg.solve(A, input), None)
    torch.cholesky = torch.linalg.cholesky
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from Utility import logpos

    n_evals = BASELINE_EVALS if n_evals is None else n_evals
    v = torch.as_tensor(vec).clone().requires_grad_(True)
    xt = torch.as_tensor(x)
    yt = torch.as_tensor(y)
    logpos.nlogpos_obj_SVC(v, yt, xt).backward()  # warm up
    t0 = time.perf_counter()
    for _ in range(n_evals):
        v.grad = None
        logpos.nlogpos_obj_SVC(v, yt, xt).backward()
    eps = n_evals / (time.perf_counter() - t0)
    _log(f"[reference-cpu-f64] n={len(x)} grad evals/sec {eps:.3f}")
    return eps


def bench_torch_baseline(x, y, vec):
    """Reference-style objective in torch CPU float64: dense MN×MN Gram,
    ``inverse`` + ``logdet`` likelihood, full GP priors, one backward/eval."""
    import torch

    torch.set_default_dtype(torch.float64)
    n, m = y.shape
    t = m * (m + 1) // 2
    xt = torch.as_tensor(x)
    yt = torch.as_tensor(y.T.reshape(-1).copy())
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
        # inverse-gamma(1,1) prior on sigma2_err + exp-transform Jacobian
        lp = lp + (-2.0) * ts2 - torch.exp(-ts2) + ts2
        return -(loglik + lp)

    v = torch.as_tensor(vec).clone().requires_grad_(True)
    nlp(v).backward()  # warm up
    t0 = time.perf_counter()
    for _ in range(BASELINE_EVALS):
        v.grad = None
        nlp(v).backward()
    eps = BASELINE_EVALS / (time.perf_counter() - t0)
    _log(f"[torch-cpu-f64] grad evals/sec {eps:.3f}")
    return eps


def main():
    x, y, vec = _problem()

    if "--probe" in sys.argv:
        mode = os.environ.get("NMGP_PRECISION", "f64")
        res = bench_jax(x, y, vec, run_hmc=mode in ("f32", "mixed"))
        print(json.dumps(res))
        return

    def probe(mode: str):
        """Run one precision pass in a subprocess.  The parent never
        initializes jax: the single TPU is exclusive-access, and sequential
        full-process exits hand it off reliably where an in-process re-claim
        can hang."""
        env = dict(os.environ, NMGP_PRECISION=mode)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe"],
                env=env, capture_output=True, text=True, timeout=1500,
            )
            sys.stderr.write(out.stderr)
            for line in out.stdout.strip().splitlines():
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
        except Exception as e:
            _log(f"probe ({mode}) failed: {type(e).__name__}: {e}")
        return None

    f32 = probe("f32")      # headline: TPU performance path (runs real HMC)
    mixed = probe("mixed")  # parity configuration (runs real HMC)
    f64 = probe("f64")      # reference dtype (HMC derived, never executed)
    nanrow = {"grad_evals_per_sec": float("nan"), "cholesky_ms": float("nan"),
              "hmc_iters_per_sec": float("nan"), "hmc_estimated": True}
    if f64 is None:
        f64 = dict(nanrow)
    if mixed is None:
        mixed = dict(nanrow)

    try:
        base_eps = bench_reference_baseline(x, y, vec)
    except Exception as e:
        _log(f"genuine-reference baseline failed: {type(e).__name__}: {e}")
        base_eps = float("nan")
    # reference comparator at the sparse tier's N (one eval — the dense f64
    # CPU path is minutes-per-gradient up here, which is the point)
    ref_sparse_eps = float("nan")
    if f32 and f32.get("sparse_grad_evals_per_sec"):
        try:
            sp_n = int(f32["sparse_n"])
            rng3 = np.random.default_rng(4)
            x_sp = np.sort(rng3.uniform(size=sp_n))
            y_sp = rng3.normal(size=(sp_n, M))
            t = M * (M + 1) // 2
            v_sp = np.concatenate([
                -1.0 + 0.1 * rng3.normal(size=sp_n),
                0.3 * rng3.normal(size=sp_n * t), [-4.0],
            ])
            ref_sparse_eps = bench_reference_baseline(x_sp, y_sp, v_sp, n_evals=1)
        except Exception as e:
            _log(f"reference sparse-N baseline failed: {type(e).__name__}: {e}")
    try:
        reimpl_eps = bench_torch_baseline(x, y, vec)
    except Exception:
        reimpl_eps = float("nan")
    if base_eps != base_eps:
        base_eps = reimpl_eps

    head = f32 or mixed

    def r(v, nd=3):
        try:
            v = float(v)
        except (TypeError, ValueError):
            return None
        return round(v, nd) if v == v else None

    def ratio(num):
        try:
            return float(num) / base_eps if base_eps == base_eps else float("nan")
        except (TypeError, ValueError):
            return float("nan")

    vs = ratio(head["grad_evals_per_sec"])
    mixed_vs = ratio(mixed.get("grad_evals_per_sec"))
    f64_vs = ratio(f64.get("grad_evals_per_sec"))
    base_hmc = base_eps / 20.0 if base_eps == base_eps else float("nan")
    print(
        json.dumps(
            {
                "metric": f"gnmgp_n{N}_loglik_grad_evals_per_sec_f32",
                "value": r(head["grad_evals_per_sec"]),
                "unit": "evals/s",
                "vs_baseline": r(vs, 2),
                "hmc_iters_per_sec_20leapfrog": r(head.get("hmc_iters_per_sec")),
                "hmc_estimated_from_grad_rate": head.get("hmc_estimated"),
                "cholesky_mnxmn_ms_f32": r(head.get("cholesky_ms")),
                "fleet_grad_evals_per_sec_f32": r(head.get("fleet_grad_evals_per_sec")),
                "fleet_size": head.get("fleet_size"),
                "fleet_n": head.get("fleet_n"),
                "parity_dtype_vs_baseline": r(mixed_vs, 2),
                "mixed_grad_evals_per_sec": r(mixed.get("grad_evals_per_sec")),
                "mixed_hmc_iters_per_sec_20leapfrog": r(mixed.get("hmc_iters_per_sec")),
                "mixed_hmc_estimated": mixed.get("hmc_estimated"),
                "mixed_hmc_vs_baseline_hmc": r(
                    float(mixed.get("hmc_iters_per_sec") or "nan") / base_hmc
                    if base_hmc == base_hmc else float("nan"), 2),
                "mixed_snmgp_grad_evals_per_sec": r(mixed.get("snmgp_grad_evals_per_sec")),
                "mixed_lmc_grad_evals_per_sec": r(mixed.get("lmc_grad_evals_per_sec")),
                "f64_grad_evals_per_sec": r(f64.get("grad_evals_per_sec")),
                "f64_vs_baseline": r(f64_vs, 2),
                "f64_cholesky_mnxmn_ms": r(f64.get("cholesky_ms")),
                "reference_cpu_f64_baseline_evals_per_sec": r(base_eps),
                "torch_cpu_f64_reimpl_evals_per_sec": r(reimpl_eps),
                "model_flops_per_grad": r(head.get("model_flops_per_grad"), 0),
                "mfu_achieved_tflops_f32": r(head.get("achieved_tflops"), 4),
                "mfu_fraction_f32": r(head.get("mfu_fraction"), 5),
                "mfu_peak_tflops_assumed": PEAK_TFLOPS,
                "mfu_fleet_achieved_tflops_f32": r(head.get("fleet_achieved_tflops"), 4),
                "fleet_sweep_evals_per_sec": {
                    str(k): r(v, 1) for k, v in (head.get("fleet_sweep") or {}).items()
                } or None,
                "smc_logz_mean": r(head.get("smc_logz_mean"), 1),
                "smc_logz_spread_2runs": r(head.get("smc_logz_spread"), 2),
                "smc_n": head.get("smc_n"),
                "smc_wall_s": r(head.get("smc_wall_s"), 1),
                "sparse_grad_evals_per_sec_f32": r(head.get("sparse_grad_evals_per_sec"), 1),
                "sparse_n": head.get("sparse_n"),
                "sparse_m_z": head.get("sparse_m_z"),
                "sparse_vs_reference_same_n": r(
                    float(head.get("sparse_grad_evals_per_sec") or "nan")
                    / ref_sparse_eps if ref_sparse_eps == ref_sparse_eps
                    else float("nan"), 1),
                "reference_cpu_f64_sparse_n_evals_per_sec": r(ref_sparse_eps, 4),
                "n": N,
                "m": M,
                "parity": "log-posterior matches reference at 1e-6 rtol in f64 AND mixed (tests/test_models_parity.py, tests/test_mixed.py)",
            }
        )
    )


if __name__ == "__main__":
    main()
