"""Default-posture cohort run on the real chip — the VERDICT r4 #1 evidence.

The reference's pipeline runs MAP→HMC per subject reliably on its production
hardware (``Nonseparable_model.py:212-237``).  Round 4's escalation default
(`escalate_rhat=1.2`) routed non-mixing subjects through a monolithic
``smc_fleet`` program — the tunneled single-TPU device-fault class — so the
user had to know to flip flags there.  Round 5's ``dispatch="auto"``
(``fleet.resolve_smc_dispatch``) routes the escalation through per-subject
host-dispatched tempering loops on one real chip.  This script captures the
proof: ``run_cohort(do_hmc=True)`` at the reference scale (N=200) with
DEFAULT flags, on the TPU, completing with escalated tempered-SMC draws.

Run solo on the chip (exclusive tunnel); f32 is the headline on-chip compute
posture (the f64 scan programs are the documented fault class bench.py also
avoids):

    NMGP_X64=0 python benchmarks/cohort_tpu_run.py

Writes ``benchmarks/cohort_escalation_tpu_r05.json``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim

    n, s = int(os.environ.get("COHORT_N", "200")), 4
    keys = jax.random.split(jax.random.PRNGKey(0), s)
    subjects = {}
    for i in range(s):
        d = sim.sim_mnts(keys[i], n=n)
        subjects[f"subj{i}"] = (np.asarray(d.x), np.asarray(d.y))

    cfg = workflows.PipelineConfig(
        model="gnmgp", n_opt=300, do_hmc=True, n_hmc=50, hmc_warmup=100,
        do_loo=False,
    )  # everything else: shipped defaults (escalate_rhat=1.2, smc auto)
    t0 = time.time()
    res = workflows.run_cohort(subjects, cfg=cfg, n_buckets=1)
    wall = time.time() - t0

    esc = {}
    rmses = []
    for sid, rec in res["subjects"].items():
        samp = rec.get("sampling", {})
        if rec.get("test_rmse") is not None:
            rmses.append(float(rec["test_rmse"]))
        esc[sid] = {
            "sampler": samp.get("sampler", "chains"),
            "escalated_from_rhat": samp.get("escalated_from_rhat"),
            "max_rhat": samp.get("max_rhat"),
            "log_evidence": samp.get("log_evidence"),
            "draws_finite": bool(np.isfinite(
                np.asarray(rec.get("hmc_samples", np.nan))).all()),
        }
    out = {
        "platform": jax.devices()[0].platform,
        "n_devices": jax.device_count(),
        "n": n,
        "subjects": s,
        "flags": "defaults (escalate_rhat=1.2, dispatch auto)",
        "precision": os.environ.get("NMGP_PRECISION",
                                    "f32" if os.environ.get("NMGP_X64") == "0"
                                    else "f64"),
        "wall_s": round(wall, 1),
        "test_rmse_median": float(np.median(rmses)) if rmses else None,
        "per_subject": esc,
        "n_escalated": sum(1 for v in esc.values()
                           if v["escalated_from_rhat"] is not None),
    }
    path = os.path.join(os.path.dirname(__file__),
                        "cohort_escalation_tpu_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps(out, indent=1, default=float))


if __name__ == "__main__":
    main()
