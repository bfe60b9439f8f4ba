"""Sampler efficiency on the real TPU: NUTS vs the reference-contract HMC.

The reference's sampler budget is fixed-length HMC (20 leapfrog steps,
hand-tuned step size, ``Nonseparable_model.py:229``).  This bench measures,
on the GNMGP posterior at the reference scale, what the adaptive samplers
buy in effective samples per second and per gradient evaluation:

* ``hmc``        — fixed step/length, the reference contract,
* ``hmc+window`` — same trajectory budget, windowed warmup adapts step size
  and a diagonal metric,
* ``nuts``       — dynamic trajectories + windowed warmup.

Run: ``python benchmarks/sampler_bench.py [--n 200] [--draws 400]``.
Prints one JSON object; per-sampler stderr progress lines.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("NMGP_X64", "0")  # speed tier: float32

import numpy as np


def log(msg):
    print(f"[sampler_bench] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--draws", type=int, default=400)
    ap.add_argument("--warmup", type=int, default=400)
    ap.add_argument("--step-size", type=float, default=2e-3)
    ap.add_argument("--whiten", default="off", nargs="?", const="prior",
                    choices=["off", "prior", "pncp"],
                    help="sampling reparameterization: prior-whitened latent "
                         "blocks, or partially non-centered (a pilot chain "
                         "retunes every eigendirection to its posterior scale)")
    ap.add_argument("--pilot", type=int, default=200,
                    help="pilot draws for --whiten pncp")
    ap.add_argument("--samplers", default="hmc,hmc_window,nuts",
                    help="comma-separated subset to run (hmc, hmc_window, "
                         "nuts, drhmc, rmhmc)")
    ap.add_argument("--rm-k", type=int, default=12,
                    help="rmhmc: subspace size — the k worst-mixing pilot "
                         "coordinates get the position-dependent metric")
    ap.add_argument("--rm-leapfrog", type=int, default=6,
                    help="rmhmc: generalized-leapfrog steps per subspace draw")
    ap.add_argument("--rm-step-size", type=float, default=0.2,
                    help="rmhmc: initial subspace step size (dual-averaged)")
    ap.add_argument("--rm-fp", type=int, default=6,
                    help="rmhmc: fixed-point iterations per implicit half-step")
    ap.add_argument("--dr-stages", type=int, default=3,
                    help="delayed-rejection proposal stages for drhmc")
    ap.add_argument("--dr-reduction", type=float, default=4.0,
                    help="per-stage step-size reduction for drhmc")
    ap.add_argument("--dr-target", type=float, default=0.8,
                    help="drhmc stage-1 dual-averaging accept target; lower "
                         "it to run a coarser bulk step and lean on retries")
    ap.add_argument("--mass", default="none", choices=["none", "hessian"],
                    help="hessian: clipped |diag| of the (whitened-space) "
                         "negative-log-posterior Hessian at the MAP as the "
                         "HMC mass matrix — Hessian-diag preconditioning "
                         "composed with whitening (VERDICT r2 #2)")
    ap.add_argument("--max-depth", type=int, default=7,
                    help="NUTS tree-doubling depth cap (2^depth leapfrogs)")
    ap.add_argument("--leapfrog", type=int, default=20,
                    help="HMC trajectory length (reference budget: 20)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.inference import (
        diagnostics,
        drhmc,
        hmc,
        map as map_mod,
        nuts,
        rmhmc,
        whiten,
    )
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData

    log(f"platform={jax.devices()[0].platform} n={args.n} draws={args.draws}")
    d = sim.sim_mnts(jax.random.PRNGKey(0), n=args.n)
    data = FullData(jnp.asarray(d.x), jnp.asarray(d.y))
    nlp = gnmgp.make_objective(data)
    n, m = data.y.shape
    vec0 = jnp.zeros((gnmgp.n_params(n, m),), data.y.dtype)
    res = map_mod.fit_map(nlp, vec0, n_iters=400, lr=0.1)
    map_vec = res.vec
    log(f"MAP fitted, nlp={float(nlp(map_vec)):.2f}")

    w = None
    pilot_cost = None
    if args.whiten != "off":
        mode = "eig" if args.whiten == "pncp" else "chol"
        w = whiten.make_whitener("gnmgp", data.x, n, m, mode=mode)
        if args.whiten == "pncp":
            t0 = time.time()
            pilot = hmc.hmc_sample(
                w.wrap(nlp), w.to_white(map_vec), args.pilot,
                jax.random.PRNGKey(9), step_size=args.step_size,
                n_leapfrog=20, n_warmup=args.pilot, adapt_step_size=True,
            )
            w = whiten.retune(w, w.from_white_batch(pilot.samples))
            pilot_cost = {"wall_s": round(time.time() - t0, 2),
                          "grad_evals": 2 * args.pilot * 20}
            log(f"pncp: retuned from {args.pilot}-draw pilot "
                f"({pilot_cost['wall_s']}s)")
        nlp = w.wrap(nlp)
        map_vec = w.to_white(map_vec)
        log(f"sampling the {args.whiten}-reparameterized space")

    mass = None
    if args.mass == "hessian":
        # diagonal Hessian of the current-space potential at the (mapped)
        # MAP; the whitened Hessian is indefinite (whiten.py docstring), so
        # clip |diag| away from zero — scales, not curvatures
        p_dim = map_vec.shape[0]
        eye = jnp.eye(p_dim, dtype=map_vec.dtype)
        hd = jax.jit(jax.vmap(
            lambda e: jax.jvp(jax.grad(nlp), (map_vec,), (e,))[1] @ e
        ))(eye)
        mass = jnp.clip(jnp.abs(hd), 1e-2, None)
        log(f"hessian mass: diag range [{float(mass.min()):.3g}, "
            f"{float(mass.max()):.3g}]")

    def score(name, run):
        t0 = time.time()
        samples, grads = run()  # (S, P), total gradient evals
        wall = time.time() - t0
        if w is not None:
            samples = w.from_white_batch(samples)
        s = np.asarray(samples)
        ess = min(diagnostics.ess(s[:, j]) for j in range(0, s.shape[1], 7))
        out = {
            "min_ess": round(ess, 1),
            "ess_per_sec": round(ess / wall, 3),
            "ess_per_kgrad": round(1000.0 * ess / grads, 3),
            "wall_s": round(wall, 2),
            "grad_evals": int(grads),
        }
        log(f"{name}: {out}")
        return out

    results = {}
    leap = args.leapfrog  # default 20: the reference budget (Nonseparable_model.py:229)

    def run_hmc():
        r = hmc.hmc_sample(
            nlp, map_vec, args.draws, jax.random.PRNGKey(1),
            step_size=args.step_size, n_leapfrog=leap,
            n_warmup=args.warmup, adapt_step_size=True, mass_matrix=mass,
        )
        jax.block_until_ready(r.samples)
        return r.samples, (args.draws + args.warmup) * leap

    def run_hmc_window():
        r = hmc.hmc_sample(
            nlp, map_vec, args.draws, jax.random.PRNGKey(1),
            step_size=args.step_size, n_leapfrog=leap,
            n_warmup=args.warmup, adapt_mass=True,
        )
        jax.block_until_ready(r.samples)
        return r.samples, (args.draws + args.warmup) * leap

    def run_drhmc():
        r = drhmc.drhmc_sample(
            nlp, map_vec, args.draws, jax.random.PRNGKey(1),
            step_size=args.step_size, n_leapfrog=leap,
            n_warmup=args.warmup, n_stages=args.dr_stages,
            reduction=args.dr_reduction, target_accept=args.dr_target,
            mass_matrix=mass,
        )
        jax.block_until_ready(r.samples)
        # a draw that reached stage s paid 2**(s-1) extra trajectories of
        # ghost+proposal leapfrogs (drhmc.py docstring); stage 0 = reached all
        st = np.asarray(r.accept_stage)
        reached = np.where(st == 0, args.dr_stages, st)
        grads = leap * int((2 ** reached - 1).sum())  # sum of 2^(s-1), s<=reached
        log(f"drhmc: stage histogram {np.bincount(st, minlength=args.dr_stages + 1).tolist()}")
        return r.samples, grads

    def run_rmhmc():
        # pilot chain picks the k worst-mixing (ridge) coordinates
        pilot = hmc.hmc_sample(
            nlp, map_vec, 200, jax.random.PRNGKey(3),
            step_size=args.step_size, n_leapfrog=leap, n_warmup=200,
            adapt_step_size=True,
        )
        idx = rmhmc.slowest_coords(np.asarray(pilot.samples), args.rm_k)
        log(f"rmhmc: subspace idx={idx.tolist()}")
        r = rmhmc.rmhmc_gibbs_sample(
            nlp, map_vec, args.draws, jax.random.PRNGKey(1), idx=idx,
            step_size=args.step_size, rm_step_size=args.rm_step_size,
            n_leapfrog=leap, rm_leapfrog=args.rm_leapfrog, n_fp=args.rm_fp,
            n_warmup=args.warmup,
        )
        jax.block_until_ready(r.samples)
        log(f"rmhmc: acceptA={float(np.mean(r.accept_prob)):.2f} "
            f"acceptB={float(np.mean(r.rm_accept_prob)):.2f} "
            f"epsA={float(r.step_size):.2e} epsB={float(r.rm_step_size):.2e}")
        # grad-equivalent accounting: stage A pays leap+1 full gradients per
        # draw (incl. the post-accept refresh); stage B pays, per leapfrog
        # step, n_fp+1 subspace Hessians (≈k HVPs ≈ 2k grads each) and one
        # metric-derivative tensor T (k fwd tangents through the Hessian,
        # ≈2k² grads) — the momentum fixed point itself is k³ einsums, free
        k = args.rm_k
        per_draw_b = args.rm_leapfrog * ((args.rm_fp + 1) * 2 * k + 2 * k * k)
        grads = (args.draws + args.warmup + 400) * (leap + 1) \
            + (args.draws + args.warmup) * per_draw_b
        return r.samples, grads

    def run_nuts():
        r = nuts.nuts_sample(
            nlp, map_vec, args.draws, jax.random.PRNGKey(1),
            step_size=args.step_size, n_warmup=args.warmup,
            max_depth=args.max_depth,
            mass_matrix=mass, adapt_mass=mass is None,
        )
        jax.block_until_ready(r.samples)
        return r.samples, int(np.asarray(r.n_leapfrog).sum())

    which = set(args.samplers.split(","))
    if "hmc" in which:
        results["hmc"] = score("hmc", run_hmc)
    if "hmc_window" in which:
        results["hmc_window"] = score("hmc+window", run_hmc_window)
    if "drhmc" in which:
        results["drhmc"] = score("drhmc", run_drhmc)
    if "rmhmc" in which:
        results["rmhmc"] = score("rmhmc", run_rmhmc)
    if "nuts" in which:
        results["nuts"] = score("nuts", run_nuts)
    if "nuts" in results and "hmc" in results:
        results["speedup_ess_per_sec_nuts_vs_hmc"] = round(
            results["nuts"]["ess_per_sec"] / max(results["hmc"]["ess_per_sec"], 1e-9), 2
        )
    out = {"n": args.n, "draws": args.draws, "whiten": args.whiten,
           "mass": args.mass, "max_depth": args.max_depth,
           "precision": os.environ.get("NMGP_PRECISION", "f32"), **results}
    if pilot_cost is not None:
        out["pncp_pilot"] = pilot_cost
    print(json.dumps(out))


if __name__ == "__main__":
    main()
