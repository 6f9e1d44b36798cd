"""CentroidStore: persisted k-means centroids for cross-batch semantic
dedup stability (round 12) — re-training per batch shifts cluster
boundaries and silently changes which near-dups are comparable; the
store versions the trained space and refuses mismatched parameters."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from holcstore_spark.sources.centroid_store import CentroidStore


def emb_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )


A = [1.0, 0.0, 0.0, 0.0]
B = [0.0, 1.0, 0.0, 0.0]
C = [0.0, 0.0, 1.0, 0.0]
D = [0.0, 0.0, 0.0, 1.0]

BATCH1 = [(1, A), (2, A), (3, B), (4, C)]
BATCH2 = [(101, A), (102, B), (103, B), (104, D)]


class TestPersistence:
    def test_save_load_roundtrip_and_versioning(self, tmp_store_path):
        cs = CentroidStore(os.path.join(tmp_store_path, "c"))
        assert cs.latest_version() is None
        params = {"n_clusters": 2, "iters": 1, "dim": 3}
        v1 = cs.save([[1, 2, 3], [4, 5, 6]], params)
        assert v1 == 1
        v2 = cs.save([[7, 8, 9], [1, 1, 1]], params)
        assert v2 == 2 and cs.versions() == [1, 2]
        cents, saved, ver = cs.load()          # latest
        assert ver == 2 and cents == [[7, 8, 9], [1, 1, 1]]
        assert saved["scale"] == 1000          # defaults stamped
        cents1, _, _ = cs.load(1)              # time travel
        assert cents1 == [[1, 2, 3], [4, 5, 6]]

    def test_save_validates_shape(self, tmp_store_path):
        cs = CentroidStore(os.path.join(tmp_store_path, "c"))
        with pytest.raises(ValueError, match="n_clusters=3"):
            cs.save([[1, 2]], {"n_clusters": 3, "iters": 1, "dim": 2})
        with pytest.raises(ValueError, match="dim=5"):
            cs.save([[1, 2]], {"n_clusters": 1, "iters": 1, "dim": 5})

    def test_require_refuses_mismatched_space_loudly(self, tmp_store_path):
        cs = CentroidStore(os.path.join(tmp_store_path, "c"))
        cs.save([[1, 2], [3, 4]], {"n_clusters": 2, "iters": 2, "dim": 2})
        cents, ver = cs.require({"n_clusters": 2, "iters": 2, "dim": 2})
        assert ver == 1 and cents == [[1, 2], [3, 4]]
        with pytest.raises(ValueError, match="n_clusters.*silently"):
            cs.require({"n_clusters": 4, "iters": 2, "dim": 2})
        with pytest.raises(ValueError, match="scale"):
            cs.require({"n_clusters": 2, "iters": 2, "dim": 2,
                        "scale": 500})


class TestCrossBatchStability:
    def test_two_batch_semantic_dedup_equals_single_batch(
            self, spark, tmp_store_path):
        # the contract persistence exists for: day-0 training is saved,
        # day-1 reuses the SAME space, and incremental dedup (kept-so-far
        # unioned with the new batch) lands exactly the single-batch
        # keep set
        from holcstore_spark.operators.similarity import (
            semantic_dedup,
            train_ivf_centroids,
        )

        b1, b2 = emb_df(spark, BATCH1), emb_df(spark, BATCH2)
        full = b1.unionByName(b2)
        cs = CentroidStore(os.path.join(tmp_store_path, "c"))
        params = {"n_clusters": 4, "iters": 2, "dim": 4}

        # day 0: train on batch 1, persist
        cents = train_ivf_centroids(b1, n_lists=4, iters=2, dim=4)
        cs.save(cents, params)

        # single-batch ground truth under the SAME persisted space
        shared, _ = cs.require(params)
        single = sorted(
            r["vec_id"] for r in
            semantic_dedup(full, n_clusters=4, threshold=0.9, iters=2,
                           centroids=shared).collect()
        )
        assert single == [1, 3, 4, 104]

        # two-day incremental: day 0 dedups batch 1, day 1 loads the
        # persisted centroids (a new "session") and dedups kept ∪ batch2
        kept1 = semantic_dedup(b1, n_clusters=4, threshold=0.9, iters=2,
                               centroids=shared)
        kept1_rows = b1.join(kept1.select("vec_id"), "vec_id")
        cs2 = CentroidStore(os.path.join(tmp_store_path, "c"))
        day2_cents, ver = cs2.require(params)
        assert day2_cents == shared and ver == 1
        two_batch = sorted(
            r["vec_id"] for r in
            semantic_dedup(kept1_rows.unionByName(b2), n_clusters=4,
                           threshold=0.9, iters=2,
                           centroids=day2_cents).collect()
        )
        assert two_batch == single

    def test_retrain_is_an_explicit_new_version(self, spark,
                                                tmp_store_path):
        from holcstore_spark.operators.similarity import (
            train_ivf_centroids,
        )

        b1, b2 = emb_df(spark, BATCH1), emb_df(spark, BATCH2)
        cs = CentroidStore(os.path.join(tmp_store_path, "c"))
        params = {"n_clusters": 2, "iters": 1, "dim": 4}
        v1 = cs.save(train_ivf_centroids(b1, n_lists=2, iters=1, dim=4),
                     params)
        v2 = cs.save(train_ivf_centroids(b2, n_lists=2, iters=1, dim=4),
                     params)
        assert (v1, v2) == (1, 2)
        # both versions stay addressable: an audit can re-run day 0
        # exactly as it ran
        c1, _, _ = cs.load(v1)
        c2, _, _ = cs.load(v2)
        assert c1 != c2
