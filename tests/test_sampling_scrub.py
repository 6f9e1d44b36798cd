"""Tests for the sampling / PII-scrub / repetition operators
(beyond-reference LLM-pipeline layer; no reference analogue)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from holcstore_spark.operators.sampling import (
    _frac_to_hex,
    hash_split,
    sample_fraction,
    stratified_sample,
)
from holcstore_spark.operators.scrub import pii_stats, redact_pii
from holcstore_spark.operators.text import repetition_stats


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(2000).withColumnRenamed("id", "doc_id")


class TestHashSplit:
    def test_partition_and_proportions(self, ids):
        d = hash_split(ids, ["doc_id"], {"train": 0.8, "valid": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in
                  d.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 2000
        assert counts["train"] > 1400  # ~1600 expected
        assert 100 < counts["valid"] + counts["test"] < 600

    def test_deterministic_and_repartition_stable(self, ids):
        a = hash_split(ids, ["doc_id"], {"a": 0.5, "b": 0.5}).collect()
        b = hash_split(ids.repartition(7), ["doc_id"], {"a": 0.5, "b": 0.5}).collect()
        assert {(r["doc_id"], r["split"]) for r in a} == \
               {(r["doc_id"], r["split"]) for r in b}

    def test_weights_normalized(self, ids):
        a = hash_split(ids, ["doc_id"], {"x": 2.0, "y": 2.0})
        b = hash_split(ids, ["doc_id"], {"x": 0.5, "y": 0.5})
        assert a.collect() == b.collect()

    def test_zero_weights_raise(self, ids):
        with pytest.raises(ValueError):
            hash_split(ids, ["doc_id"], {"x": 0.0, "y": 0.0})


class TestSampleFraction:
    def test_nested_samples(self, ids):
        small = {r["doc_id"] for r in
                 sample_fraction(ids, ["doc_id"], 0.1).collect()}
        big = {r["doc_id"] for r in
               sample_fraction(ids, ["doc_id"], 0.5).collect()}
        assert small <= big  # smaller fraction is a subset of the larger
        assert 100 < len(big) < 1400

    def test_bounds(self, ids):
        assert sample_fraction(ids, ["doc_id"], 1.0).count() == 2000
        assert sample_fraction(ids, ["doc_id"], 0.0).count() == 0
        with pytest.raises(ValueError):
            sample_fraction(ids, ["doc_id"], 1.5)

    def test_frac_to_hex_order(self):
        assert _frac_to_hex(0.25) == "40000000"
        assert _frac_to_hex(0.0) == "00000000"
        assert _frac_to_hex(1.0) == "ffffffff"


class TestStratifiedSample:
    def test_exact_n_per_stratum(self, spark):
        df = spark.range(300).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).alias("g")
        )
        out = stratified_sample(df, ["g"], 10, ["doc_id"], out_rank="rk")
        per = out.groupBy("g").count().collect()
        assert all(r["count"] == 10 for r in per)
        assert out.agg(F.max("rk")).first()[0] == 10

    def test_small_stratum_keeps_all(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "g"]
        )
        out = stratified_sample(df, ["g"], 5, ["doc_id"])
        assert out.count() == 3
        assert "__rk" not in out.columns


class TestScrub:
    def test_counts_and_redaction(self, spark):
        df = spark.createDataFrame(
            [
                (1, "write to a.b+c@mail.example.org or j@x.io today"),
                (2, "server at 192.168.0.1 and 10.0.0.255 up"),
                (3, "call +1-555-0123 45 or 06 12 34 56 78 now"),
                (4, "no pii here at all"),
            ],
            ["doc_id", "text"],
        )
        out = redact_pii(pii_stats(df), "text").orderBy("doc_id").collect()
        assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 0, 0)
        assert "<EMAIL>" in out[0]["redacted"] and "@" not in out[0]["redacted"]
        assert out[1]["n_ipv4"] == 2 and out[1]["redacted"].count("<IP>") == 2
        assert out[2]["n_phone"] >= 1 and "<PHONE>" in out[2]["redacted"]
        assert out[3]["redacted"] == "no pii here at all"

    def test_email_redacted_before_phone_can_eat_digits(self, spark):
        df = spark.createDataFrame([(1, "mail 123456789a@d.com end")],
                                   ["doc_id", "text"])
        row = redact_pii(df).first()
        assert row["redacted"] == "mail <EMAIL> end"


class TestVocab:
    def test_tf_and_df(self, spark):
        from holcstore_spark.operators.text import vocab, vocab_topk

        df = spark.createDataFrame(
            [(1, "a b a"), (2, "b c"), (3, "a")], ["doc_id", "text"]
        )
        v = {r["token"]: (r["tf"], r["df"]) for r in vocab(df).collect()}
        assert v == {"a": (3, 2), "b": (2, 2), "c": (1, 1)}
        top = vocab_topk(df, k=2).collect()
        assert [r["token"] for r in top] == ["a", "b"]

    def test_topk_tiebreak_on_token(self, spark):
        from holcstore_spark.operators.text import vocab_topk

        df = spark.createDataFrame([(1, "z y x")], ["doc_id", "text"])
        top = vocab_topk(df, k=2).collect()
        assert [r["token"] for r in top] == ["x", "y"]


class TestRepetition:
    def test_crafted_fractions(self, spark):
        # "a b a b": words 4, distinct 2 -> dup 0.5; bigrams [a b, b a, a b]
        # -> dup 1/3, top 2/3; trigrams [a b a, b a b] -> dup 0
        df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
        r = repetition_stats(df).first()
        assert r["n_tokens"] == 4
        assert r["dup_word_frac"] == pytest.approx(0.5)
        assert r["dup_bigram_frac"] == pytest.approx(1 / 3)
        assert r["top_bigram_frac"] == pytest.approx(2 / 3)
        assert r["dup_trigram_frac"] == 0.0

    def test_all_same_token(self, spark):
        df = spark.createDataFrame([(1, "x x x x x")], ["doc_id", "text"])
        r = repetition_stats(df).first()
        assert r["dup_word_frac"] == pytest.approx(4 / 5)
        assert r["top_bigram_frac"] == 1.0

    def test_no_repetition(self, spark):
        df = spark.createDataFrame([(1, "q w e r t y")], ["doc_id", "text"])
        r = repetition_stats(df).first()
        assert r["dup_word_frac"] == 0.0
        assert r["dup_bigram_frac"] == 0.0
        assert r["top_bigram_frac"] == pytest.approx(1 / 5)


class TestRebalanceMix:
    def test_mix_maximizes_volume_and_is_deterministic(self, spark):
        from holcstore_spark.operators.sampling import rebalance_mix

        # 300 a / 100 b / 50 c, target mix 2:1:1 → T limited by c:
        # T = min(300·4/2, 100·4, 50·4) = 200 → want 100 a, 50 b, 50 c
        d = (
            spark.range(450)
            .withColumnRenamed("id", "doc_id")
            .withColumn(
                "grp",
                F.when(F.col("doc_id") < 300, "a")
                .when(F.col("doc_id") < 400, "b")
                .otherwise("c"),
            )
        )
        kept = rebalance_mix(d, "grp", {"a": 2, "b": 1, "c": 1}, ["doc_id"])
        sizes = {r["grp"]: r["n"] for r in
                 kept.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
        # the limiting group keeps everything; others land near target
        # (hash sampling is binomial around the expected size)
        assert sizes["c"] == 50
        assert 85 <= sizes["a"] <= 115
        assert 40 <= sizes["b"] <= 60
        # deterministic: second run selects the identical rows
        again = rebalance_mix(d, "grp", {"a": 2, "b": 1, "c": 1}, ["doc_id"])
        assert kept.exceptAll(again).count() == 0
        assert again.exceptAll(kept).count() == 0

    def test_non_target_groups_dropped_and_missing_raises(self, spark):
        from holcstore_spark.operators.sampling import rebalance_mix

        d = (
            spark.range(10).withColumnRenamed("id", "doc_id")
            .withColumn("grp", F.when(F.col("doc_id") < 5, "x").otherwise("y"))
        )
        kept = rebalance_mix(d, "grp", {"x": 1}, ["doc_id"])
        assert {r["grp"] for r in kept.select("grp").distinct().collect()} == {"x"}
        # r16: counts are no longer collected eagerly, so the
        # missing-group guard fires from inside the plan (raise_error)
        # at ACTION time rather than as a driver-side ValueError
        with pytest.raises(Exception, match="no rows for target group"):
            rebalance_mix(d, "grp", {"x": 1, "absent": 1}, ["doc_id"]).collect()


class TestTemperatureSample:
    def test_smallest_domain_kept_whole_and_head_flattened(self, spark):
        from holcstore_spark.operators.sampling import temperature_sample
        import math

        rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))
        kept = temperature_sample(df, "lang", ["doc_id"]).groupBy("lang").count()
        got = {r["lang"]: r["count"] for r in kept.collect()}
        assert got["small"] == 100                 # n_min kept whole
        # big keeps ~sqrt(100*900) = 300 (hash noise within a few %)
        assert abs(got["big"] - math.sqrt(100 * 900)) < 60

    def test_deterministic_and_stable_under_repartition(self, spark):
        from holcstore_spark.operators.sampling import temperature_sample

        rows = [(i, "a" if i % 3 else "b") for i in range(300)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))
        ids1 = sorted(r["doc_id"] for r in temperature_sample(df, "lang", ["doc_id"]).collect())
        ids2 = sorted(
            r["doc_id"]
            for r in temperature_sample(df.repartition(7), "lang", ["doc_id"]).collect()
        )
        assert ids1 == ids2 and len(ids1) > 0

    def test_null_domain_rows_dropped(self, spark):
        from holcstore_spark.operators.sampling import temperature_sample

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "lang": ["en", None, "en"]})
        )
        rows = temperature_sample(df, "lang", ["doc_id"]).collect()
        assert all(r["lang"] == "en" for r in rows)


class TestCapPerGroup:
    @pytest.fixture()
    def domains(self, spark):
        rows = [
            (i, "big" if i < 10 else "small", 100 - i) for i in range(13)
        ]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
        )

    def test_cap_keeps_best_first(self, domains):
        from holcstore_spark.operators.sampling import cap_per_group

        out = cap_per_group(domains, group="source", cap=4).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r["doc_id"])
        # big domain capped to its 4 longest (n_chars desc = lowest ids)
        assert sorted(by_src["big"]) == [0, 1, 2, 3]
        # small domain is under the cap: untouched
        assert sorted(by_src["small"]) == [10, 11, 12]

    def test_custom_order_and_schema_preserved(self, domains):
        from holcstore_spark.operators.sampling import cap_per_group

        out = cap_per_group(
            domains, group="source", cap=2,
            order_by=[F.col("doc_id").desc()],
        )
        assert out.columns == ["doc_id", "source", "n_chars"]
        kept = sorted(r["doc_id"] for r in out.collect())
        assert kept == [8, 9, 11, 12]


class TestCapPerGroupSalted:
    """r16 (VERDICT r15 ask #4): the two-phase salted cap must equal
    the single-pass cap exactly — the salt prunes, never selects."""

    def test_salted_equals_single_pass(self, spark):
        from holcstore_spark.operators.sampling import cap_per_group

        rows = [(i, f"d{i % 7}", (i * 37) % 100) for i in range(500)]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
        )
        one = cap_per_group(d, cap=5, salt_buckets=1)
        salted = cap_per_group(d, cap=5, salt_buckets=16)
        assert sorted(r["doc_id"] for r in one.collect()) == \
               sorted(r["doc_id"] for r in salted.collect())
        # degenerate salts (more buckets than rows per group) still exact
        wide = cap_per_group(d, cap=5, salt_buckets=997)
        assert sorted(r["doc_id"] for r in wide.collect()) == \
               sorted(r["doc_id"] for r in one.collect())

    def test_mega_domain_spread_over_salts(self, spark):
        """Phase 1 genuinely splits a mega-domain: the phase-1 window
        partitions by (group, salt), visible in the plan as a
        partitionBy on both columns."""
        from holcstore_spark.operators.sampling import cap_per_group

        rows = [(i, "mega", i) for i in range(200)] + [
            (1000 + i, "tail", i) for i in range(3)]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
        )
        out = cap_per_group(d, cap=4, salt_buckets=8)
        got = {}
        for r in out.collect():
            got.setdefault(r["source"], []).append(r["doc_id"])
        # exact best-first survivors per group
        assert sorted(got["mega"]) == [196, 197, 198, 199]  # n_chars desc
        assert sorted(got["tail"]) == [1000, 1001, 1002]
        plan = out._jdf.queryExecution().toString()
        assert "__salt" in plan

    def test_salt_buckets_validation(self, spark):
        from holcstore_spark.operators.sampling import cap_per_group

        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "source": ["a"]})
        )
        with pytest.raises(ValueError, match="salt_buckets"):
            cap_per_group(d, salt_buckets=0)
