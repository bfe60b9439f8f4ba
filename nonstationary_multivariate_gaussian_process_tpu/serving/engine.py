"""Serving layer: persistently-compiled predict endpoints over the artifact store.

The reference's "deployment" story is re-running plotting scripts against
pickle trees (SURVEY §2.3); here a fitted fleet becomes a low-latency
predict service:

* **self-contained** — ``PredictEngine(root)`` stands up from an artifact
  root alone: ``workflows.run_subject`` persists the conditioning data
  (``data`` stage) next to the MAP vector (``map``) and chain (``hmc``),
* **compile-once** — prediction requests are padded to a small set of grid
  buckets so every (N, M, G-bucket) signature compiles exactly once per
  process (and once per *machine* with the persistent XLA compile cache,
  ``settings.NMGP_JAX_CACHE``); warm requests are pure device execution,
* **two modes** — ``mode="map"`` plug-in prediction (mean/std/bands) and
  ``mode="sample"`` posterior-draw prediction over the stored HMC chain.

The engine is deliberately transport-agnostic; ``serving.server`` wraps it
in a dependency-free HTTP JSON API.
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np

from .. import settings
from ..models.base import FullData
from ..predict import gnmgp as pred_gnmgp
from ..predict import gnmgp_hetero as pred_hetero
from ..predict import gnmgp_sparse as pred_sparse
from ..predict import lmc as pred_lmc
from ..predict import lmc_sparse as pred_lmc_sparse
from ..predict import snmgp as pred_snmgp
from ..predict import snmgp_sparse as pred_snmgp_sparse
from ..utils.artifacts import ArtifactStore

_PRED = {
    "lmc": pred_lmc,
    "snmgp": pred_snmgp,
    "gnmgp": pred_gnmgp,
    "gnmgp_hetero": pred_hetero,
    "gnmgp_sparse": pred_sparse,
    "gnmgp_hetero_sparse": pred_sparse,
    "snmgp_sparse": pred_snmgp_sparse,
    "lmc_sparse": pred_lmc_sparse,
}

_SPARSE = ("gnmgp_sparse", "gnmgp_hetero_sparse", "snmgp_sparse", "lmc_sparse")

GRID_BUCKETS = (32, 64, 128, 256, 512, 1024)


def _bucket(g: int, buckets=GRID_BUCKETS) -> int:
    for b in buckets:
        if g <= b:
            return b
    return -(-g // buckets[-1]) * buckets[-1]


class PredictEngine:
    """Loads fitted subjects from an artifact store and serves predictions."""

    def __init__(
        self,
        root: str,
        model: str = "gnmgp",
        dataset: str = "sim",
        hyper: dict | None = None,
        seed: int = 0,
    ):
        if model not in _PRED:
            raise ValueError(f"unknown model {model!r} (want one of {sorted(_PRED)})")
        self.store = ArtifactStore(root)
        self.model = model
        self.dataset = dataset
        self.hyper = hyper
        self._subjects: dict[str, dict] = {}
        self._key = jax.random.PRNGKey(seed)
        # the TPU is exclusive-access; serialize device work across threads
        self._lock = threading.Lock()

        if model in _SPARSE:
            # the sparse predictors krige grid-side projections on the host
            # (f64 islands) so they run EAGERLY — at sparse cost
            # (O(G M (mM)^2) matmuls) the dispatch overhead is negligible
            if model == "gnmgp_hetero_sparse":
                self._map_fn = lambda v, x, y, g, ops, approx: (
                    pred_sparse.predict_map_hetero(
                        v, FullData(x, y), ops, g, hyper=hyper, approx=approx
                    ))
                self._sample_fn = None  # hetero sparse chain prediction: map-only
            else:
                # gnmgp/snmgp/lmc sparse predictors share the
                # (vec, data, ops, grid, hyper, approx) contract
                pred = _PRED[model]
                self._map_fn = lambda v, x, y, g, ops, approx: (
                    pred.predict_map(
                        v, FullData(x, y), ops, g, hyper=hyper, approx=approx
                    ))
                self._sample_fn = lambda k, hv, x, y, g, ops, approx: (
                    pred.predict_sample(
                        k, hv, FullData(x, y), ops, g, hyper=hyper,
                        approx=approx
                    ))
            return
        if model == "lmc":
            map_fn = lambda v, x, y, g: pred_lmc.predict_map(v, FullData(x, y), g)
            sample_fn = lambda k, hv, x, y, g: pred_lmc.predict_sample(
                k, hv, FullData(x, y), g
            )
        else:
            pred = _PRED[model]
            map_fn = lambda v, x, y, g: pred.predict_map(
                v, FullData(x, y), g, hyper=hyper
            )
            sample_fn = lambda k, hv, x, y, g: pred.predict_sample(
                k, hv, FullData(x, y), g, hyper=hyper
            )
        # jit caches one executable per (N, M, G-bucket) signature
        self._map_fn = jax.jit(map_fn)
        self._sample_fn = jax.jit(sample_fn)

    # -- catalog -----------------------------------------------------------

    def subject_ids(self) -> list[str]:
        """Subjects with both conditioning data and a fitted MAP in the store."""
        manifest = self.store._load_manifest()
        prefix = f"{self.model}__{self.dataset}__"
        sids = []
        for key in manifest:
            if key.startswith(prefix) and key.endswith("__map"):
                sid = key[len(prefix) : -len("__map")]
                if self.store.exists(ArtifactStore.key(self.model, self.dataset, sid, "data")):
                    sids.append(sid)
        return sorted(sids)

    def _load(self, sid: str) -> dict:
        if sid not in self._subjects:
            k = lambda stage: ArtifactStore.key(self.model, self.dataset, sid, stage)
            if not self.store.exists(k("map")) or not self.store.exists(k("data")):
                raise KeyError(f"subject {sid!r} has no fitted artifacts under {self.store.root}")
            data = self.store.load(k("data"))
            map_art = self.store.load(k("map"))
            rec = {
                "x": jnp.asarray(data["x"], settings.dtype),
                "y": jnp.asarray(data["y"], settings.dtype),
                "vec": jnp.asarray(map_art["vec"], settings.dtype),
            }
            if self.model in _SPARSE:
                from ..models import gnmgp_sparse as sp_model
                from ..models import lmc_sparse as lsp_model
                from ..models import snmgp_sparse as ssp_model

                if "z" not in map_art:
                    raise KeyError(
                        f"subject {sid!r}: sparse artifacts need the inducing "
                        "inputs ('z' in the map stage) — refit with the "
                        "current run_subject"
                    )
                z = jnp.asarray(map_art["z"], settings.dtype)
                make_ops = {
                    "gnmgp_hetero_sparse": sp_model.make_ops_hetero,
                    "gnmgp_sparse": sp_model.make_ops,
                    "snmgp_sparse": ssp_model.make_ops,
                    "lmc_sparse": lsp_model.make_ops,
                }[self.model]
                rec["ops"] = make_ops(rec["x"], z, self.hyper)
                rec["approx"] = str(map_art.get("approx", "fitc"))
            if self.store.exists(k("hmc")):
                rec["chain"] = jnp.asarray(
                    self.store.load(k("hmc"))["samples"], settings.dtype
                )
            self._subjects[sid] = rec
        return self._subjects[sid]

    # -- endpoints ----------------------------------------------------------

    def predict(
        self,
        sid: str,
        x_star,
        mode: str = "map",
        n_sample: int = 100,
    ) -> dict:
        """Predict at arbitrary inputs ``x_star`` for a fitted subject.

        Pads the request to the next grid bucket (repeating the last point)
        so arbitrary request sizes reuse a fixed set of compiled programs,
        then crops.  Returns plain-numpy ``{"mean", "std", "lower", "upper"}``
        (G, M); ``mode="sample"`` adds ``"draws"`` quantile provenance from
        the posterior chain instead of the plug-in bands.
        """
        rec = self._load(sid)
        xs = np.atleast_1d(np.asarray(x_star, float))
        if xs.ndim != 1:
            raise ValueError(f"x_star must be 1-D, got shape {xs.shape}")
        g = xs.shape[0]
        gb = _bucket(g)
        grid = jnp.asarray(
            np.concatenate([xs, np.full((gb - g,), xs[-1])]), settings.dtype
        )
        sparse_args = ((rec["ops"], rec["approx"])
                       if self.model in _SPARSE else ())
        with self._lock:
            if mode == "map":
                gp = self._map_fn(rec["vec"], rec["x"], rec["y"], grid,
                                  *sparse_args)
                return {
                    "mean": np.asarray(gp.mean)[:g],
                    "std": np.asarray(gp.std)[:g],
                    "lower": np.asarray(gp.percentiles)[:g, 0],
                    "upper": np.asarray(gp.percentiles)[:g, 2],
                }
            if mode == "sample":
                if self._sample_fn is None:
                    raise ValueError(
                        f"model {self.model!r} serves mode='map' only"
                    )
                if "chain" not in rec:
                    raise KeyError(f"subject {sid!r} has no stored HMC chain")
                self._key, sub = jax.random.split(self._key)
                hv = rec["chain"][-int(n_sample):]
                draws = self._sample_fn(sub, hv, rec["x"], rec["y"], grid,
                                        *sparse_args)
                draws = np.asarray(draws)[:g]  # (G, S, M)
                return {
                    "mean": draws.mean(axis=1),
                    "std": draws.std(axis=1),
                    "lower": np.percentile(draws, 2.5, axis=1),
                    "upper": np.percentile(draws, 97.5, axis=1),
                }
        raise ValueError(f"unknown mode {mode!r} (want 'map' or 'sample')")

    def info(self, sid: str) -> dict:
        """Fit metadata for one subject: shapes, stored stages, and the
        persisted sampling record — the SMC tier's ``log_evidence`` (exact
        Bayes-factor comparison across served models) or the chain tiers'
        pooled diagnostics — plus held-out scores when stored."""
        rec = self._load(sid)
        k = lambda stage: ArtifactStore.key(self.model, self.dataset, sid, stage)

        def scalarize(d):
            out = {}
            for kk, v in d.items():
                a = np.asarray(v)
                out[kk] = a.item() if a.ndim == 0 else a.tolist()
            return out

        out = {
            "subject": sid,
            "model": self.model,
            "n": int(rec["x"].shape[0]),
            "m": int(rec["y"].shape[1]),
            "has_chain": "chain" in rec,
        }
        if "chain" in rec:
            out["n_draws"] = int(rec["chain"].shape[0])
        if self.store.exists(k("sampling")):
            out["sampling"] = scalarize(self.store.load(k("sampling")))
        if self.store.exists(k("scores")):
            out["scores"] = scalarize(self.store.load(k("scores")))
        return out

    def warm(self, grid_sizes=(64, 256)) -> int:
        """Precompile the hot signatures for every stored subject shape.

        Returns the number of (subject-shape, bucket) programs touched; with
        the persistent compile cache this is a cache load after the first
        process on a machine.
        """
        n = 0
        seen = set()
        for sid in self.subject_ids():
            rec = self._load(sid)
            shape = tuple(rec["y"].shape)
            for gs in grid_sizes:
                if (shape, _bucket(gs)) in seen:
                    continue
                seen.add((shape, _bucket(gs)))
                self.predict(sid, np.linspace(0.0, 1.0, gs))
                n += 1
        return n
