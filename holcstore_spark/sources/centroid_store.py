"""Versioned persistence for trained k-means centroids.

``semantic_dedup(centroids=)`` / ``cluster_balanced_sample(centroids=)``
/ ``ivf_topk(centroids=)`` share ONE training pass within a session; a
multi-day incremental ingest needs the same sharing ACROSS sessions —
re-training on each day's batch shifts the cluster boundaries, which
silently changes WHICH documents are ever compared as near-duplicates
(SemDeDup's keep rule is cluster-local). ``CentroidStore`` persists the
trained centroids together with the parameters that define the space
(quantization scale, trainer identity, n_clusters/iters/dim), versioned
so a deliberate re-train is an explicit new version, never a silent
drift.

The table is tiny (n_clusters × dim int64 per version) so the format is
one JSON file per version under ``<path>/`` with atomic renames — the
same write discipline as the stores' frozen configs; no Spark job, no
parquet, readable by anything.
"""

from __future__ import annotations

import json
import os

#: parameters that DEFINE the partition of the embedding space; loading
#: with any of these different is refused (comparing cluster-local
#: near-dups across different spaces is meaningless)
SPACE_PARAMS = ("n_clusters", "iters", "dim", "scale", "algo")

#: the deterministic trainer this library ships
#: (:func:`holcstore_spark.operators.similarity.train_ivf_centroids`)
DEFAULT_ALGO = "int-kmeans/lowest-id-seeds/trunc-mean"


class CentroidStore:
    """A directory of immutable ``v{N}.json`` centroid versions.

    Typical incremental-dedup loop::

        cs = CentroidStore(path)
        params = dict(n_clusters=64, iters=2, dim=64)
        if cs.latest_version() is None:          # day 0: train once
            cents = train_ivf_centroids(day0, n_lists=64, iters=2)
            cs.save(cents, params)
        cents, ver = cs.require(params)          # every day after
        kept = semantic_dedup(batch, n_clusters=64, centroids=cents)
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- internals -------------------------------------------------------
    def _vpath(self, version: int) -> str:
        return os.path.join(self.path, f"v{version:06d}.json")

    def versions(self) -> list[int]:
        out = []
        for f in os.listdir(self.path):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    # -- write -----------------------------------------------------------
    def save(self, centroids: list[list[int]], params: dict) -> int:
        """Persist a trained centroid set as the next version. ``params``
        must carry ``n_clusters``/``iters``/``dim`` (``scale`` defaults
        to the library's 1000, ``algo`` to the deterministic trainer);
        ``n_clusters`` is cross-checked against the centroid count.
        Returns the new version number. Concurrent savers racing the
        same slot: first link wins, the loser retries the next slot."""
        p = dict(params)
        p.setdefault("scale", 1000)
        p.setdefault("algo", DEFAULT_ALGO)
        missing = [k for k in SPACE_PARAMS if k not in p]
        if missing:
            raise ValueError(f"params missing {missing}; the space is "
                             f"defined by {list(SPACE_PARAMS)}")
        if int(p["n_clusters"]) != len(centroids):
            raise ValueError(
                f"params claim n_clusters={p['n_clusters']} but "
                f"{len(centroids)} centroids were given"
            )
        if any(len(c) != int(p["dim"]) for c in centroids):
            raise ValueError(f"centroid width differs from dim={p['dim']}")
        payload = json.dumps(
            {"params": p,
             "centroids": [[int(x) for x in c] for c in centroids]},
            sort_keys=True,
        )
        version = (self.latest_version() or 0) + 1
        while True:
            target = self._vpath(version)
            tmp = f"{target}.tmp-{os.getpid()}-{id(self)}"
            with open(tmp, "w") as f:
                f.write(payload)
            try:
                # atomic claim: link fails if the slot exists (os.link
                # never overwrites), unlike os.replace
                os.link(tmp, target)
                os.unlink(tmp)
                return version
            except FileExistsError:
                os.unlink(tmp)
                version += 1

    # -- read --------------------------------------------------------------
    def load(self, version: int | None = None
             ) -> tuple[list[list[int]], dict, int]:
        """(centroids, params, version); default latest."""
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(
                    f"no centroid versions at {self.path}"
                )
        with open(self._vpath(version)) as f:
            data = json.load(f)
        return data["centroids"], data["params"], version

    def require(self, params: dict, version: int | None = None
                ) -> tuple[list[list[int]], int]:
        """Load a version and REFUSE loudly if any space-defining
        parameter differs from what the caller is about to run with —
        the guard that turns silent cross-day drift into an error."""
        cents, saved, ver = self.load(version)
        want = dict(params)
        want.setdefault("scale", 1000)
        want.setdefault("algo", DEFAULT_ALGO)
        diffs = {
            k: (saved.get(k), want.get(k))
            for k in SPACE_PARAMS
            if saved.get(k) != want.get(k)
        }
        if diffs:
            raise ValueError(
                f"centroid version v{ver} at {self.path} was trained "
                f"with different space parameters {diffs} "
                "(saved != requested); reusing it would silently change "
                "which documents are comparable as near-duplicates — "
                "either run with the saved parameters or train and "
                "save() a new version"
            )
        return cents, ver
