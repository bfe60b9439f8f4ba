"""Simulation-based calibration of the shipping sampler posture.

VERDICT r4 #4: the reference's only calibration evidence is recovery-vs-truth
(``SIM_code/res_summary.py:88-157``); the rigorous tool here is Talts et al.
SBC (``inference/sbc.py``).  This driver points it at the *shipping cohort
posture* — the tempered-SMC tier that the default R-hat escalation swaps in
at the reference scale (``PipelineConfig.escalate_rhat``, ROADMAP "Adaptive
tempered SMC"): prior-whitened populations, ``metric="full"``, beta=1 polish
stages — and writes the rank histogram + per-coordinate chi-squared
uniformity p-values as a JSON artifact.

    env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/run_sbc.py \
        --n 100 --replicates 48 --particles 192 --out benchmarks/sbc_gnmgp.json

Interpretation: under a correctly-implemented prior + likelihood + sampler,
the rank of each true coordinate among its posterior draws is uniform; the
artifact records the fraction of coordinates whose chi-squared p-value falls
below 0.05 (expected ~5% under uniformity) and the Benjamini-style global
check (min p · D vs 0.05).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="gnmgp", choices=["gnmgp", "snmgp"])
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--m", type=int, default=2)
    ap.add_argument("--replicates", type=int, default=48)
    ap.add_argument("--particles", type=int, default=192)
    ap.add_argument("--mutations", type=int, default=4)
    ap.add_argument("--leapfrog", type=int, default=10)
    ap.add_argument("--polish", type=int, default=10)
    ap.add_argument("--thin", type=int, default=4,
                    help="keep every thin-th particle for ranking "
                         "(exchangeable, but thinning also bounds ranking "
                         "cost)")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", default="benchmarks/sbc_result.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu.inference import (
        sbc, smc, whiten,
    )
    from nonstationary_multivariate_gaussian_process_tpu.models import (
        FullData, gnmgp, snmgp,
    )

    mod = {"gnmgp": gnmgp, "snmgp": snmgp}[args.model]
    rng = np.random.default_rng(args.seed)
    x = np.sort(rng.uniform(size=args.n))
    prior_fn = sbc.make_prior_sampler(args.model, x, args.m)
    sim_fn = sbc.make_simulator(args.model, x, args.m)
    w = whiten.make_whitener(args.model, jnp.asarray(x), args.n, args.m)
    xj = jnp.asarray(x)

    # the escalation tier's posture (workflows._run_chain_smc defaults):
    # whitened N(0,I)=exact-prior reference, full population-covariance
    # metric, polish stages; dispatch="device" on CPU, "host" off-CPU
    dispatch = "device" if jax.devices()[0].platform == "cpu" else "host"

    def posterior_fn(k, theta_true, y):
        del theta_true
        nlp = mod.make_objective(FullData(xj, jnp.asarray(y)))
        r = smc.smc_sample(
            w.wrap(nlp), w.n_params, k, args.particles,
            n_mutations=args.mutations, n_leapfrog=args.leapfrog,
            metric="full", n_polish=args.polish, dispatch=dispatch,
        )
        return w.from_white_batch(r.particles[:: args.thin])

    t0 = time.time()

    def progress(r, total):
        el = time.time() - t0
        print(f"[sbc] replicate {r + 1}/{total} done "
              f"({el:.0f}s elapsed, ~{el / (r + 1) * (total - r - 1):.0f}s "
              "left)", file=sys.stderr, flush=True)

    res = sbc.sbc_ranks(prior_fn, sim_fn, posterior_fn,
                        jax.random.PRNGKey(args.seed), args.replicates,
                        progress=progress)
    p = sbc.uniformity_pvalues(res)
    d = p.shape[0]
    out = {
        "model": args.model,
        "n": args.n,
        "m": args.m,
        "replicates": args.replicates,
        "particles": args.particles,
        "polish": args.polish,
        "thin_draws_per_replicate": int(res.n_draws),
        "posture": "whitened SMC metric=full + polish (the escalation tier)",
        "n_coords": d,
        "frac_p_below_05": float((p < 0.05).mean()),
        "min_p": float(p.min()),
        "min_p_bonferroni": float(min(1.0, p.min() * d)),
        "median_p": float(np.median(p)),
        "rank_hist_pooled": np.histogram(
            res.ranks.ravel(), bins=8, range=(0, res.n_draws + 1)
        )[0].tolist(),
        "wall_s": round(time.time() - t0, 1),
        "pass": bool((p < 0.05).mean() < 0.15 and p.min() * d > 0.01),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
