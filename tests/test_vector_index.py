"""VectorIndex: the persisted, transactional IVF index (round 12) —
build once / append incrementally / probe-search with manifest-level
list pruning, exactly-once appends, per-list binpack."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from holcstore_spark.sources.vector_index import VectorIndex


@pytest.fixture()
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _pairs(rows):
    return sorted((r["q_id"], r["neighbor_id"], r["score"]) for r in rows)


class TestSearchParity:
    def test_topk_equals_inmemory_ivf_with_same_centroids(
            self, spark, tmp_store_path, emb):
        from holcstore_spark.operators.similarity import ivf_topk

        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        assert vi.append(emb, txn_app="b", txn_version=0)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        got = vi.topk(q, k=3, n_probe=2).collect()
        want = ivf_topk(emb, q, k=3, n_lists=4, n_probe=2,
                        centroids=vi.centroids()).collect()
        assert _pairs(got) == _pairs(want)

    def test_incremental_appends_equal_one_shot(self, spark,
                                                tmp_store_path, emb):
        # two appends into the SAME persisted space == one append of the
        # union (the centroid persistence contract, applied to ANN)
        from holcstore_spark.operators.similarity import ivf_topk

        b1 = emb.filter(F.col("vec_id") % 2 == 0)
        b2 = emb.filter(F.col("vec_id") % 2 == 1)
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        assert vi.append(b1, txn_app="b", txn_version=0)  # trains v1
        assert vi.append(b2, txn_app="b", txn_version=1)  # reuses v1
        q = emb.filter(F.col("vec_id") % 100 == 0)
        got = vi.topk(q, k=3, n_probe=2).collect()
        want = ivf_topk(emb, q, k=3, n_probe=2,
                        centroids=vi.centroids()).collect()
        assert _pairs(got) == _pairs(want)

    def test_filtered_topk_matches_filtered_inmemory(
            self, spark, tmp_store_path, emb):
        from holcstore_spark.operators.similarity import ivf_topk

        # attrs carry their DECLARED type (review finding: stringly
        # attrs would block numeric-filter pushdown on the index scan)
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64,
                         attr_cols={"label": "long"})
        assert vi.append(emb, txn_app="b", txn_version=0)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        got = vi.topk(q, k=3, n_probe=4,
                      filters={"label__in": [2, 5, 7]}).collect()
        want = ivf_topk(emb, q, k=3, n_probe=4,
                        centroids=vi.centroids(),
                        filters=F.col("label").isin(2, 5, 7)).collect()
        assert _pairs(got) == _pairs(want)
        labels = {r["vec_id"]: r["label"] for r in
                  emb.select("vec_id", "label").collect()}
        assert all(labels[n] in (2, 5, 7) for _, n, _ in _pairs(got))


class TestManifestPruning:
    def test_probe_read_opens_only_probed_lists_files(
            self, spark, tmp_store_path, emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        n_live = len(vi._txlog.snapshot().files["data"])
        assert n_live >= 3  # one file per non-empty list
        pruned = vi.df(lists=[0])
        assert len(pruned.inputFiles()) < n_live
        assert len(pruned.inputFiles()) <= 1
        full = vi.df()
        assert len(full.inputFiles()) == n_live
        # pruned read returns exactly list 0's rows
        assert pruned.filter(F.col("list") != 0).count() == 0
        assert pruned.count() == full.filter(F.col("list") == 0).count()


class TestExactlyOnceAppend:
    def test_replayed_append_commits_nothing(self, spark,
                                             tmp_store_path, emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        assert vi.append(emb, txn_app="b", txn_version=0) is True
        n = vi.df().count()
        v = vi._txlog.snapshot().version
        assert vi.append(emb, txn_app="b", txn_version=0) is False
        assert vi.df().count() == n
        assert vi._txlog.snapshot().version == v
        assert vi.last_txn_version("b") == 0


class TestMaintenance:
    def test_optimize_binpacks_and_search_unchanged(
            self, spark, tmp_store_path, emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        # 3 appends -> every list accumulates >=2 files
        thirds = [emb.filter(F.col("vec_id") % 3 == i) for i in range(3)]
        for v, b in enumerate(thirds):
            vi.append(b, txn_app="b", txn_version=v)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        before = _pairs(vi.topk(q, k=3, n_probe=2).collect())
        files_before = len(vi._txlog.snapshot().files["data"])
        assert vi.optimize(min_files=3) >= 1
        assert len(vi._txlog.snapshot().files["data"]) < files_before
        assert _pairs(vi.topk(q, k=3, n_probe=2).collect()) == before
        assert vi.vacuum(retention_seconds=0.0) > 0
        assert _pairs(vi.topk(q, k=3, n_probe=2).collect()) == before


class TestEmptyIndex:
    def test_search_before_first_append_raises_friendly(
            self, spark, tmp_store_path, emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, dim=64)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        with pytest.raises(ValueError, match="no trained centroids"):
            vi.topk(q, k=3)


class TestFrozenParams:
    def test_mismatched_reopen_refused(self, spark, tmp_store_path, emb):
        p = os.path.join(tmp_store_path, "vi")
        VectorIndex(spark, p, n_lists=4, dim=64)
        VectorIndex(spark, p, n_lists=4, dim=64)  # same: fine
        with pytest.raises(ValueError, match="frozen"):
            VectorIndex(spark, p, n_lists=8, dim=64)
        with pytest.raises(ValueError, match="frozen"):
            VectorIndex(spark, p, n_lists=4, dim=64, attr_cols=("label",))


class TestDeclaredIdType:
    def test_append_casts_id_to_frozen_type(self, spark, tmp_store_path,
                                            emb):
        # ADVICE r12: an id column whose physical type differs from the
        # declared id_type must not commit files that fail at read time
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)  # id_type="long"
        assert vi.append(
            emb.withColumn("vec_id", F.col("vec_id").cast("int")),
            txn_app="b", txn_version=0,
        )
        out = vi.df()
        assert dict(out.dtypes)["vec_id"] == "bigint"
        assert out.count() == emb.count()
        q = emb.filter(F.col("vec_id") % 100 == 0)
        assert vi.topk(q, k=3, n_probe=2).count() > 0


class TestForget:
    """delete() — replay-safe tombstones + physical erasure (round 13)."""

    def test_deleted_vector_never_returned(self, spark, tmp_store_path,
                                           emb):
        from holcstore_spark.operators.similarity import ivf_topk

        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        top1 = vi.topk(q, k=1, n_probe=4).collect()[0]["neighbor_id"]
        assert vi.delete([top1], txn_app="del", txn_version=0)
        got = vi.topk(q, k=3, n_probe=4).collect()
        assert top1 not in {r["neighbor_id"] for r in got}
        # masked search == in-memory search over the corpus minus the id
        want = ivf_topk(emb.filter(F.col("vec_id") != top1), q, k=3,
                        n_probe=4, centroids=vi.centroids()).collect()
        assert _pairs(got) == _pairs(want)

    def test_replayed_delete_commits_nothing(self, spark, tmp_store_path,
                                             emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        assert vi.delete([2, 4], txn_app="del", txn_version=0) is True
        v = vi._txlog.snapshot().version
        assert vi.delete([2, 4], txn_app="del", txn_version=0) is False
        assert vi._txlog.snapshot().version == v
        assert vi.df().filter(F.col("vec_id").isin(2, 4)).count() == 0

    def test_optimize_physically_erases_and_search_unchanged(
            self, spark, tmp_store_path, emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        dead = [r["vec_id"] for r in
                emb.filter(F.col("vec_id") % 7 == 3)
                .select("vec_id").collect()]
        assert vi.delete(dead, txn_app="del", txn_version=0)
        masked = _pairs(vi.topk(q, k=3, n_probe=4).collect())
        assert vi.optimize(min_files=1) >= 1
        snap = vi._txlog.snapshot()
        raw = spark.read.schema(vi._schema()).parquet(
            *snap.paths("data", vi.path))
        assert raw.filter(F.col("vec_id").isin(dead)).count() == 0
        assert _pairs(vi.topk(q, k=3, n_probe=4).collect()) == masked
        assert vi.vacuum(retention_seconds=0.0) > 0
        assert _pairs(vi.topk(q, k=3, n_probe=4).collect()) == masked

    def test_delete_accepts_dataframe_ids(self, spark, tmp_store_path,
                                          emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        n = vi.df().count()
        dead = emb.filter(F.col("vec_id") < 10).select("vec_id")
        k = dead.count()
        assert vi.delete(dead, txn_app="del", txn_version=0)
        assert vi.df().count() == n - k


class TestSelectivityGuard:
    """min_results= (round 13): selective filters must not silently
    return fewer than k neighbours when matches exist in un-probed
    lists."""

    def test_auto_probe_escalation_reaches_full_k(self, spark,
                                                  tmp_store_path, emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=16, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        flt = F.col("vec_id") < 10  # ~2% of sf0.001
        # without the guard: at n_probe=1 at least one query is short
        bare = vi.topk(q, k=5, n_probe=1, filters=flt)
        bare_counts = {r["q_id"]: r["n"] for r in
                       bare.groupBy("q_id").agg(F.count(F.lit(1))
                                                .alias("n")).collect()}
        assert min(bare_counts.values(), default=0) < 5 \
            or len(bare_counts) < q.count()
        # with the guard: every query reaches full k (pool >= 9 per
        # query after self-exclusion)
        out = vi.topk(q, k=5, n_probe=1, filters=flt, min_results=5)
        counts = {r["q_id"]: r["n"] for r in
                  out.groupBy("q_id").agg(F.count(F.lit(1))
                                          .alias("n")).collect()}
        assert len(counts) == q.count()
        assert set(counts.values()) == {5}
        assert all(r["neighbor_id"] < 10 for r in out.collect())

    def test_exhaustive_escalation_equals_exact_filtered_search(
            self, spark, tmp_store_path, emb):
        from holcstore_spark.operators.similarity import brute_force_topk

        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=16, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        # pool of 3: genuine scarcity — escalation must go exhaustive
        # and return the exact filtered neighbours, short by honesty
        got = vi.topk(q, k=5, n_probe=1, filters=F.col("vec_id") < 3,
                      min_results=5)
        want = brute_force_topk(emb, q, k=5,
                                filters=F.col("vec_id") < 3)
        assert _pairs(got.collect()) == _pairs(want.collect())




class TestRetrain:
    """retrain() (round 13): transactional centroid-version swap."""

    def test_retrain_equals_fresh_build_bit_exactly(
            self, spark, tmp_store_path, emb):
        b1 = emb.filter(F.col("vec_id") < 40)
        b2 = emb.filter(F.col("vec_id") >= 40)
        q = emb.filter(F.col("vec_id") % 50 == 7)
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=16, iters=2, dim=64)
        vi.append(b1, txn_app="b", txn_version=0)  # space trained on b1
        vi.append(b2, txn_app="b", txn_version=1)
        assert vi.retrain(txn_app="rt", txn_version=0) == 2
        assert vi.active_space_version() == 2
        fresh = VectorIndex(spark, os.path.join(tmp_store_path, "vi2"),
                            n_lists=16, iters=2, dim=64)
        fresh.append(emb, txn_app="b", txn_version=0)
        # same live rows -> identical deterministic training -> search
        # results equal a fresh-built index bit-for-bit
        assert vi.centroids() == fresh.centroids()
        assert _pairs(vi.topk(q, k=5, n_probe=4).collect()) == \
            _pairs(fresh.topk(q, k=5, n_probe=4).collect())

    def test_retrain_restores_recall_under_drift(self, spark,
                                                 tmp_store_path):
        from pyspark.sql import types as T

        from holcstore_spark.operators.similarity import brute_force_topk

        DIM = 64

        def vec(f):
            return [float(f(d)) for d in range(DIM)]

        rows = []
        # day-0 corpus: 16 well-separated anchors e_i*10 (ids 100..115,
        # HIGHER than the drifted batch so the retrain's lowest-id seeds
        # come from the drifted data)
        for i in range(16):
            rows.append(
                (100 + i, vec(lambda d, i=i: 10.0 if d == i else 0.0), 0))
        # drift: near-duplicate PAIRS at the midpoints between
        # consecutive anchors, each member biased toward a different
        # anchor — the true nearest neighbour sits just across a day-0
        # list boundary, so probe-1 search under the stale space misses
        # every partner
        for i in range(16):
            j = (i + 1) % 16
            u = vec(lambda d, i=i, j=j:
                    5.2 if d == i else (4.8 if d == j else 0.0))
            w = vec(lambda d, i=i, j=j:
                    4.8 if d == i else (5.2 if d == j else 0.0))
            rows.append((2 * i, u, 1))
            rows.append((2 * i + 1, w, 1))
        schema = T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("batch", T.IntegerType()),
        ])
        df = spark.createDataFrame(rows, schema)
        b1 = df.filter(F.col("batch") == 0).select("vec_id", "embedding")
        b2 = df.filter(F.col("batch") == 1).select("vec_id", "embedding")
        full = df.select("vec_id", "embedding")
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=16, iters=2, dim=DIM)
        vi.append(b1, txn_app="b", txn_version=0)
        vi.append(b2, txn_app="b", txn_version=1)

        def recall_at_1():
            got = {(r["q_id"], r["neighbor_id"]) for r in
                   vi.topk(b2, k=1, n_probe=1).collect()}
            want = {(r["q_id"], r["neighbor_id"]) for r in
                    brute_force_topk(full, b2, k=1).collect()}
            return len(got & want) / len(want)

        assert recall_at_1() == 0.0   # stale space splits every pair
        assert vi.retrain(txn_app="rt", txn_version=0) == 2
        assert recall_at_1() == 1.0   # new space reunites them

    def test_retrain_replay_idempotent(self, spark, tmp_store_path, emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        assert vi.retrain(txn_app="rt", txn_version=0) == 2
        v = vi._txlog.snapshot().version
        assert vi.retrain(txn_app="rt", txn_version=0) is None
        assert vi._txlog.snapshot().version == v
        assert vi.active_space_version() == 2
        # old files became unreferenced at the swap: reclaimable
        assert vi.vacuum(retention_seconds=0.0) > 0

    def test_retrain_purges_deleted_rows(self, spark, tmp_store_path,
                                         emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        assert vi.delete([3, 5, 8], txn_app="del", txn_version=0)
        vi.retrain(txn_app="rt", txn_version=0)
        snap = vi._txlog.snapshot()
        raw = spark.read.schema(vi._schema()).parquet(
            *snap.paths("data", vi.path))
        assert raw.filter(F.col("vec_id").isin(3, 5, 8)).count() == 0
        assert raw.count() == emb.count() - 3

    def test_mixed_version_reads_refused(self, spark, tmp_store_path,
                                         emb):
        from holcstore_spark.sources.txlog import TxLog

        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb.filter(F.col("vec_id") < 400), txn_app="b",
                  txn_version=0)
        vi.retrain(txn_app="rt", txn_version=0)
        # simulate the race: an append whose rows were assigned under
        # the OLD space lands after the swap (white-box: stage rows
        # stamped with space_v=1)
        late = emb.filter(F.col("vec_id") >= 400)
        snap = vi._txlog.snapshot()
        adds = vi._stage(vi._assigned(late, vi._cents_for(1)), space_v=1)
        vi._txlog.commit(
            snap.version, "append", TxLog.next_op_id(snap),
            {"data": adds}, {}, touched=None,
        )
        with pytest.raises(ValueError, match="multiple centroid"):
            vi.df().count()
        with pytest.raises(ValueError, match="multiple centroid"):
            vi.topk(emb.limit(3), k=1)
        # retrain is the documented remediation: it ignores the stored
        # list assignments and rebuilds one consistent space
        assert vi.retrain(txn_app="rt", txn_version=1) == 3
        assert vi.df().count() == emb.count()
        assert vi.topk(emb.filter(F.col("vec_id") % 100 == 0),
                       k=3, n_probe=2).count() > 0


def _adc_pairs(rows):
    return sorted((r["q_id"], r["neighbor_id"], r["adc_dist_q"])
                  for r in rows)


class TestIvfPq:
    """Persisted IVF-PQ (round 13): PQ codes stored clustered by list;
    ADC search inside the pruned probed lists."""

    def _pq_index(self, spark, path, emb):
        vi = VectorIndex(spark, path, n_lists=4, iters=2, dim=64,
                         pq_m=4, pq_centroids=8)
        assert vi.append(emb, txn_app="b", txn_version=0)
        return vi

    def test_exhaustive_adc_equals_pq_topk_bit_exactly(
            self, spark, tmp_store_path, emb):
        from holcstore_spark.operators.similarity import pq_topk

        vi = self._pq_index(spark, os.path.join(tmp_store_path, "vi"),
                            emb)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        got = vi.topk(q, k=5, n_probe=4, mode="adc").collect()
        want = pq_topk(emb, q, k=5, m=4, n_centroids=8, iters=2,
                       dim=64).collect()
        assert _adc_pairs(got) == _adc_pairs(want)

    def test_adc_scan_never_reads_vec_q(self, spark, tmp_store_path,
                                        emb):
        import re

        vi = self._pq_index(spark, os.path.join(tmp_store_path, "vi"),
                            emb)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        out = vi.topk(q, k=5, n_probe=2, mode="adc")
        plan = out._jdf.queryExecution().executedPlan().toString()
        reads = re.findall(r"ReadSchema: [^\n]*", plan)
        idx_reads = [r for r in reads if "pq_code" in r]
        assert idx_reads, "no index scan found in the plan"
        # the bytes-read reduction: the dim-sized vec_q column chunks
        # are never decoded on the ADC path — m codes per vector only
        assert all("vec_q" not in r for r in idx_reads)

    def test_adc_respects_tombstones_and_filters(self, spark,
                                                 tmp_store_path, emb):
        p = os.path.join(tmp_store_path, "vi")
        vi = VectorIndex(spark, p, n_lists=4, iters=2, dim=64,
                         pq_m=4, pq_centroids=8,
                         attr_cols={"label": "long"})
        assert vi.append(emb, txn_app="b", txn_version=0)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        top1 = vi.topk(q, k=1, n_probe=4,
                       mode="adc").collect()[0]["neighbor_id"]
        assert vi.delete([top1], txn_app="del", txn_version=0)
        got = vi.topk(q, k=5, n_probe=4, mode="adc",
                      filters={"label__gte": 5}).collect()
        labels = {r["vec_id"]: r["label"] for r in
                  emb.select("vec_id", "label").collect()}
        assert top1 not in {r["neighbor_id"] for r in got}
        assert all(labels[r["neighbor_id"]] >= 5 for r in got)

    def test_retrain_preserves_pq_codes(self, spark, tmp_store_path,
                                        emb):
        vi = self._pq_index(spark, os.path.join(tmp_store_path, "vi"),
                            emb.filter(F.col("vec_id") < 300))
        vi.append(emb.filter(F.col("vec_id") >= 300), txn_app="b",
                  txn_version=1)
        codes_before = {r["vec_id"]: list(r["pq_code"]) for r in
                        vi.df().select("vec_id", "pq_code").collect()}
        assert vi.retrain(txn_app="rt", txn_version=0) == 2
        codes_after = {r["vec_id"]: list(r["pq_code"]) for r in
                       vi.df().select("vec_id", "pq_code").collect()}
        # the IVF space swapped; the PQ encoding (frozen codebooks) is
        # untouched by a retrain
        assert codes_after == codes_before
        q = emb.filter(F.col("vec_id") % 100 == 0)
        assert vi.topk(q, k=5, n_probe=4, mode="adc").count() > 0

    def test_adc_mode_refused_without_pq(self, spark, tmp_store_path,
                                         emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        with pytest.raises(ValueError, match="without\\s+pq_m"):
            vi.topk(q, k=3, mode="adc")
        with pytest.raises(ValueError, match="unknown mode"):
            vi.topk(q, k=3, mode="cosine")

    def test_pq_params_frozen(self, spark, tmp_store_path):
        p = os.path.join(tmp_store_path, "vi")
        VectorIndex(spark, p, n_lists=4, dim=64, pq_m=4)
        VectorIndex(spark, p, n_lists=4, dim=64, pq_m=4)  # same: fine
        with pytest.raises(ValueError, match="frozen"):
            VectorIndex(spark, p, n_lists=4, dim=64, pq_m=8)
        with pytest.raises(ValueError, match="frozen"):
            VectorIndex(spark, p, n_lists=4, dim=64)
        with pytest.raises(ValueError, match="divisible"):
            VectorIndex(spark, os.path.join(tmp_store_path, "vi2"),
                        n_lists=4, dim=64, pq_m=7)


class TestReviewFindingsRound13:
    def test_invalid_k_and_n_probe_rejected(self, spark, tmp_store_path,
                                            emb):
        # review r13: n_probe=0 would loop forever under min_results
        # escalation (0*2 == 0); both are rejected up front
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        q = emb.filter(F.col("vec_id") % 100 == 0)
        with pytest.raises(ValueError, match="must be >= 1"):
            vi.topk(q, k=3, n_probe=0, min_results=3)
        with pytest.raises(ValueError, match="must be >= 1"):
            vi.topk(q, k=0)

    def test_optimize_raises_on_row_loss_beyond_tombstones(
            self, spark, tmp_store_path, emb, monkeypatch):
        # review r13: with a tombstone present, a repack that loses
        # UNRELATED live rows must still raise — the erasure invariant
        # is exact (staged == source - tombstone-matched), not "any
        # shortfall is fine once deletes exist"
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb.filter(F.col("vec_id") % 2 == 0), txn_app="b",
                  txn_version=0)
        vi.append(emb.filter(F.col("vec_id") % 2 == 1), txn_app="b",
                  txn_version=1)
        assert vi.delete([2, 4], txn_app="del", txn_version=0)
        real_mask = VectorIndex._mask_deleted

        def lossy_mask(self, df, snap):
            # simulate a masking bug that drops one extra live row
            return real_mask(self, df, snap).filter(
                F.col("vec_id") != 7)

        monkeypatch.setattr(VectorIndex, "_mask_deleted", lossy_mask)
        with pytest.raises(RuntimeError, match="row mismatch"):
            vi.optimize(min_files=1)

    def test_full_erasure_stages_are_orphan_noted(self, spark,
                                                  tmp_store_path, emb):
        # review r13: a fully-erased list's 0-row staged file must be
        # reclaimable by the default sidecar-driven vacuum
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(emb, txn_app="b", txn_version=0)
        # tombstone one whole list
        one_list = [r["vec_id"] for r in
                    vi.df().filter(F.col("list") == 0)
                    .select("vec_id").collect()]
        assert one_list
        assert vi.delete(one_list, txn_app="del", txn_version=0)
        assert vi.optimize(min_files=1) >= 1
        reclaimed = vi.vacuum(retention_seconds=0.0)
        assert reclaimed > 0
        # no unreferenced parquet remains anywhere under files/
        live = {e["path"] for t in ("data", "meta")
                for e in vi._txlog.snapshot().files[t]}
        on_disk = set()
        froot = os.path.join(vi.path, "files")
        for root, _dirs, files in os.walk(froot):
            for f in files:
                if f.endswith(".parquet"):
                    on_disk.add(os.path.relpath(
                        os.path.join(root, f), vi.path))
        assert on_disk <= live, f"leaked: {sorted(on_disk - live)}"


def _edges(rows):
    return sorted(
        (r["src_id"], r["neighbor_id"], r["score"]) for r in rows
    )


class TestIndexedKnnGraph:
    def test_graph_from_index_equals_operator_with_same_centroids(
            self, spark, tmp_store_path, emb):
        from holcstore_spark.operators.similarity import knn_graph

        sub = emb.filter(F.col("vec_id") < 300)
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        assert vi.append(sub, txn_app="b", txn_version=0)
        got = vi.knn_graph(k=3, n_probe=2).collect()
        want = knn_graph(sub, k=3, n_lists=4, n_probe=2,
                         centroids=vi.centroids()).collect()
        assert _edges(got) == _edges(want)

    def test_candidate_side_has_no_reassign_stage(
            self, spark, tmp_store_path, emb):
        # the whole point of the indexed path: the stored list IS the
        # assignment. The operator computes _assign_to_centroid on the
        # candidate side (an n_lists-way aggregate over every vector);
        # the indexed plan must carry probe-assignment expressions for
        # the SOURCE side only — one aggregate family per plan, not two
        from holcstore_spark.operators.similarity import knn_graph

        sub = emb.filter(F.col("vec_id") < 300)
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        vi.append(sub, txn_app="b", txn_version=0)
        idx_plan = vi.knn_graph(k=3, n_probe=2)._jdf.queryExecution() \
            .executedPlan().toString()
        op_plan = knn_graph(sub, k=3, n_lists=4, n_probe=2,
                            centroids=vi.centroids())._jdf \
            .queryExecution().executedPlan().toString()
        # assignment/probing are Arrow-batched pandas UDFs
        # (ArrowEvalPython stages): the operator pays one per side
        # (_assign_to_centroid on candidates + _probe_lists on
        # sources), the index exactly ONE (source probes only — the
        # stored list IS the candidate assignment)
        assert idx_plan.count("ArrowEvalPython") == 1
        assert op_plan.count("ArrowEvalPython") == 2
        # and the operator's quantized() transform never runs on the
        # indexed path — vec_q is stored pre-quantized
        assert "transform(" not in idx_plan
        assert "vec_q" in idx_plan

    def test_filters_restrict_candidates_only(self, spark,
                                              tmp_store_path, emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64,
                         attr_cols={"label": "int"})
        sub = emb.filter(F.col("vec_id") < 300)
        vi.append(sub, txn_app="b", txn_version=0)
        out = vi.knn_graph(k=3, n_probe=2,
                           filters=F.col("label") != 3).collect()
        banned = {r["vec_id"] for r in
                  sub.filter(F.col("label") == 3).collect()}
        assert banned, "fixture must contain label-3 vectors"
        assert not ({r["neighbor_id"] for r in out} & banned)
        assert {r["src_id"] for r in out} & banned  # sources unfiltered


class TestIncrementalKnnGraph:
    def test_append_then_update_equals_full_rebuild(
            self, spark, tmp_store_path, emb):
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        base = emb.filter(F.col("vec_id") < 400)
        batch = emb.filter(
            (F.col("vec_id") >= 400) & (F.col("vec_id") < 500)
        )
        # first append trains the space; the second reuses it, so the
        # centroids are fixed across the increment — the method contract
        assert vi.append(base, txn_app="b", txn_version=0)
        g0 = vi.knn_graph(k=3, n_probe=2)
        g0_rows = g0.collect()
        assert vi.append(batch, txn_app="b", txn_version=1)
        inc = vi.update_knn_graph(
            spark.createDataFrame(g0_rows, g0.schema), batch,
            k=3, n_probe=2,
        ).collect()
        full = vi.knn_graph(k=3, n_probe=2).collect()
        assert _edges(inc) == _edges(full)
        # every indexed vector got its edges
        assert ({r["src_id"] for r in inc}
                == {r["vec_id"] for r in vi.df().collect()})

    def test_delete_then_update_equals_full_rebuild(
            self, spark, tmp_store_path, emb):
        """The r14 verdict's done-gate for ask #2: delete-aware
        incremental maintenance — forgotten edges are filtered and
        ONLY sources whose top-k lost a member are rescored, and the
        result equals a from-scratch rebuild bit-exactly."""
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        base = emb.filter(F.col("vec_id") < 500)
        assert vi.append(base, txn_app="b", txn_version=0)
        g0 = vi.knn_graph(k=3, n_probe=2)
        g0_rows = g0.collect()
        victims = [r["vec_id"] for r in
                   base.filter(F.col("vec_id") % 11 == 0)
                   .select("vec_id").collect()]
        assert vi.delete(victims, txn_app="b", txn_version=1)
        inc = vi.update_knn_graph(
            spark.createDataFrame(g0_rows, g0.schema),
            k=3, n_probe=2,
        ).collect()
        full = vi.knn_graph(k=3, n_probe=2).collect()
        assert _edges(inc) == _edges(full)
        # deleted vectors appear on neither side of any edge
        dead = set(victims)
        assert not any(r["src_id"] in dead or r["neighbor_id"] in dead
                       for r in inc)
        assert ({r["src_id"] for r in inc}
                == {r["vec_id"] for r in vi.df().collect()})

    def test_mixed_delete_and_append_update(
            self, spark, tmp_store_path, emb):
        """delete + append since the previous graph, composed in one
        update call — still equals the full rebuild bit-exactly."""
        vi = VectorIndex(spark, os.path.join(tmp_store_path, "vi"),
                         n_lists=4, iters=2, dim=64)
        base = emb.filter(F.col("vec_id") < 400)
        batch = emb.filter(
            (F.col("vec_id") >= 400) & (F.col("vec_id") < 500)
        )
        assert vi.append(base, txn_app="b", txn_version=0)
        g0 = vi.knn_graph(k=3, n_probe=2)
        g0_rows = g0.collect()
        victims = [r["vec_id"] for r in
                   base.filter(F.col("vec_id") % 13 == 0)
                   .select("vec_id").collect()]
        assert vi.delete(victims, txn_app="b", txn_version=1)
        assert vi.append(batch, txn_app="b", txn_version=2)
        inc = vi.update_knn_graph(
            spark.createDataFrame(g0_rows, g0.schema), batch,
            k=3, n_probe=2,
        ).collect()
        full = vi.knn_graph(k=3, n_probe=2).collect()
        assert _edges(inc) == _edges(full)
        dead = set(victims)
        assert not any(r["src_id"] in dead or r["neighbor_id"] in dead
                       for r in inc)


class TestSampledTraining:
    """r16 (VERDICT r15 ask #5): train_sample > 0 trains the space on
    a deterministic content-hash sample — the corpus-scale IVF
    practice. Sampling may move centroids, never correctness: with all
    lists probed the results equal the brute-force ranking exactly."""

    def test_deterministic_and_frozen(self, spark, tmp_store_path, emb):
        a = VectorIndex(spark, os.path.join(tmp_store_path, "a"),
                        n_lists=4, iters=2, dim=64, train_sample=50)
        b = VectorIndex(spark, os.path.join(tmp_store_path, "b"),
                        n_lists=4, iters=2, dim=64, train_sample=50)
        assert a.append(emb, txn_app="s", txn_version=0)
        assert b.append(emb, txn_app="s", txn_version=0)
        assert a.centroids() == b.centroids()
        # the knob is frozen per index
        with pytest.raises(ValueError, match="incompatible"):
            VectorIndex(spark, os.path.join(tmp_store_path, "a"),
                        n_lists=4, iters=2, dim=64, train_sample=99)
        with pytest.raises(ValueError, match="train_sample"):
            VectorIndex(spark, os.path.join(tmp_store_path, "c"),
                        n_lists=4, iters=2, dim=64, train_sample=-1)

    def test_all_probe_search_exact_despite_sampling(
            self, spark, tmp_store_path, emb):
        from holcstore_spark.operators.similarity import (
            brute_force_topk,
        )

        vi = VectorIndex(spark, tmp_store_path, n_lists=4, iters=2,
                         dim=64, train_sample=40)
        assert vi.append(emb, txn_app="s", txn_version=0)
        q = emb.filter(F.col("vec_id") % 150 == 0)
        got = vi.topk(q, k=3, n_probe=4).collect()   # all lists
        want = brute_force_topk(emb, q, k=3).collect()
        assert _pairs(got) == _pairs(want)

    def test_sample_trains_on_subset_not_corpus(self, spark,
                                                tmp_store_path, emb):
        """The training frame really is the N-row hash sample: a full
        train over the same corpus produces different centroids (the
        regression teeth: if sampling silently fell back to the full
        frame, these would be equal)."""
        s = VectorIndex(spark, os.path.join(tmp_store_path, "s"),
                        n_lists=4, iters=2, dim=64, train_sample=30)
        f = VectorIndex(spark, os.path.join(tmp_store_path, "f"),
                        n_lists=4, iters=2, dim=64)
        assert s.append(emb, txn_app="s", txn_version=0)
        assert f.append(emb, txn_app="s", txn_version=0)
        assert s.centroids() != f.centroids()
