"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal plumbing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from holcstore_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    minhash_candidate_pairs,
    simhash_groups,
    token_shingles,
)
from holcstore_spark.operators.multimodal import (
    attach_binary_payload,
    decode_strict,
    decode_stub,
    extract_media_meta,
)
from holcstore_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    lsh_topk,
)
from holcstore_spark.operators.text import (
    lang_id,
    quality_score,
    text_stats,
    token_count_bpe,
)

DOC = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture()
def docs(spark):
    rows = [
        (1, DOC),
        (2, DOC),                                # exact dup of 1
        (3, DOC + " extra"),                     # near dup of 1
        (4, "completely different words here about spark engines and joins"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


class TestDedup:
    def test_exact_dedup_keeps_min_id(self, docs):
        kept = exact_dedup(docs).orderBy("doc_id").collect()
        assert [r["doc_id"] for r in kept] == [1, 3, 4]

    def test_minhash_finds_near_dups_not_distinct(self, docs):
        pairs = minhash_candidate_pairs(docs, n_hashes=16, bands=8, shingle_k=3)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got           # identical docs always collide
        assert (1, 3) in got           # near dup shares most shingles
        assert (1, 4) not in got and (3, 4) not in got

    def test_fused_signature_agg_matches_hof_reference(self, spark):
        # r16: the signature aggregate fuses hash projection + min +
        # hex format into ONE agg() of parsed SQL expressions (driver
        # plan-construction cost); this pins its documented contract —
        # bit-identical signatures to the Column-HOF reference
        # formulation (minhash_signature over token_shingles) for
        # non-null text, including short docs (single-shingle) and
        # boilerplate-heavy docs (duplicate shingles).
        from holcstore_spark.operators.dedup import (
            _minhash_signature_agg,
            minhash_signature,
            token_shingles,
        )

        rows = [
            (1, DOC),
            (2, "xy"),                       # shorter than shingle_k
            (3, ("dup dup dup dup " * 8).strip()),  # duplicate shingles
            (4, ""),                         # empty → single '' shingle
            (5, DOC + " tail"),
        ]
        d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        fused = _minhash_signature_agg(d, "text", "doc_id", 16, 3)
        ref = d.select(
            "doc_id", *minhash_signature(token_shingles("text", 3), 16)
        )
        assert fused.exceptAll(ref).count() == 0
        assert ref.exceptAll(fused).count() == 0
        assert [f.name for f in fused.schema.fields] == (
            ["doc_id"] + [f"mh_{j}" for j in range(16)]
        )
        assert all(
            f.dataType.simpleString() == "string"
            for f in fused.schema.fields[1:]
        )

    def test_simhash_sql_path_matches_column_path(self, spark):
        # r16: simhash64 builds its 60 per-bit votes as one parsed SQL
        # expression when given a column NAME (driver plan-construction
        # cost); a Column argument keeps the original formulation. The
        # two paths must be bit-identical — including a regex-special
        # separator (escaped into both split() calls) and empty text.
        from pyspark.sql import functions as F

        from holcstore_spark.operators.dedup import simhash64

        rows = [(1, DOC), (2, DOC + " extra"), (3, ""),
                (4, "a.b.c.dots.as.separators")]
        d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        for sep in (" ", "."):
            sql_path = d.select("doc_id", simhash64("text", sep).alias("s"))
            col_path = d.select(
                "doc_id", simhash64(F.col("text"), sep).alias("s")
            )
            assert sql_path.exceptAll(col_path).count() == 0, sep
            assert col_path.exceptAll(sql_path).count() == 0, sep
            assert sql_path.schema["s"].dataType.simpleString() == "bigint"

    def test_simhash_name_guards_dotted_and_unsafe_separators(self, spark):
        # r17 (ADVICE r16): the SQL fast path must only fire for plain
        # top-level identifiers with literal-safe separators. A dotted
        # NAME is a struct-field reference under F.col — it must keep
        # resolving (the r16 backtick-quoting broke it); a separator
        # whose re.escape carries a backslash (e.g. '.') must route to
        # the Column path so spark.sql.parser.escapedStringLiterals
        # cannot change the split regex.
        from pyspark.sql import functions as F

        from holcstore_spark.operators.dedup import simhash64

        rows = [(1, DOC), (2, DOC + " more")]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        ).select("doc_id", F.struct("text").alias("meta"))
        dotted = d.select("doc_id", simhash64("meta.text").alias("s"))
        flat = d.select(
            "doc_id", simhash64(F.col("meta.text")).alias("s")
        )
        assert dotted.exceptAll(flat).count() == 0
        assert flat.exceptAll(dotted).count() == 0
        # literal-unsafe separator: both conf values of
        # escapedStringLiterals must yield the Column-path result
        d2 = spark.createDataFrame(
            pd.DataFrame([(1, "x.y.z"), (2, "x.y")],
                         columns=["doc_id", "text"])
        )
        want = d2.select(
            "doc_id", simhash64(F.col("text"), ".").alias("s")
        ).collect()
        conf = "spark.sql.parser.escapedStringLiterals"
        old = spark.conf.get(conf, "false")
        try:
            for v in ("true", "false"):
                spark.conf.set(conf, v)
                got = d2.select(
                    "doc_id", simhash64("text", ".").alias("s")
                ).collect()
                assert got == want, v
        finally:
            spark.conf.set(conf, old)

    def test_minhash_null_text_gets_a_signature_not_a_bypass(self, spark):
        # r13 advice: F.split(NULL) → NULL array → explode emits no
        # rows, so NULL-text docs silently escaped minhash dedup. They
        # now coalesce to '' — NULL and empty docs dedup each other.
        rows = [(1, None), (2, ""), (3, "")]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
                {"text": "object"}
            )
        )
        pairs = minhash_candidate_pairs(d, n_hashes=16, bands=8, shingle_k=3)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got and (1, 3) in got and (2, 3) in got

    def test_incremental_dedup_against_signature_index(self, spark, docs):
        # round 11: the production incremental shape — history's bands
        # are persisted; a new batch dedups against them + itself
        from holcstore_spark.operators.dedup import (
            dedup_incremental,
            minhash_bands,
        )

        index = minhash_bands(docs, "text", "doc_id", 16, 4, 3)
        new_rows = [
            (101, DOC),                            # near/exact dup of history
            (102, DOC + " extra"),                 # near dup of history (3)
            (103, "fresh unseen content about streaming watermarks state"),
            (104, "fresh unseen content about streaming watermarks state"),
            (105, "entirely novel sentence with zero overlap whatsoever"),
        ]
        new = spark.createDataFrame(
            pd.DataFrame(new_rows, columns=["doc_id", "text"])
        )
        kept = sorted(r["doc_id"] for r in dedup_incremental(
            new, index, n_hashes=16, bands=4, shingle_k=3).collect())
        # 101/102 collide with history (history wins); 104 collides with
        # the lower-id NEW 103; 103 and 105 survive
        assert kept == [103, 105]
        # kept rows carry ALL the batch's columns
        cols = dedup_incremental(new, index).columns
        assert cols == ["doc_id", "text"]
        # empty index: pure batch-internal dedup, lowest id per bucket
        empty = index.filter(F.lit(False))
        kept2 = sorted(r["doc_id"] for r in dedup_incremental(
            new, empty).collect())
        # 102 drops vs the lower-id NEW 101 (near-dups of each other),
        # 104 vs 103 — batch-internal rule only, history forgotten
        assert kept2 == [101, 103, 105]
        # max_bucket valve: cap below the history bucket sizes keeps
        # the colliding new docs (documented pathological-bucket rule)
        kept3 = sorted(r["doc_id"] for r in dedup_incremental(
            new, index, max_bucket=1).collect())
        assert kept3 == [101, 102, 103, 104, 105]

    def test_jaccard_verify_exact_values(self, spark, docs):
        pairs = spark.createDataFrame(
            pd.DataFrame([(1, 2), (1, 3), (1, 4)], columns=["id_a", "id_b"])
        )
        out = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_verify(pairs, docs, threshold=0.0).collect()
        }
        assert out[(1, 2)] == 1.0
        assert 0.8 < out[(1, 3)] < 1.0
        assert out[(1, 4)] == 0.0

    def test_simhash_groups_identical_docs(self, docs):
        g = simhash_groups(docs).filter(F.col("group_size") > 1).collect()
        ids = sorted(r["doc_id"] for r in g)
        assert 1 in ids and 2 in ids

    def test_shingles_shorter_than_k(self, spark):
        d = spark.createDataFrame(pd.DataFrame([(1, "only two")], columns=["doc_id", "text"]))
        sh = d.select(token_shingles("text", k=3).alias("s")).collect()[0]["s"]
        assert sh == ["only two"]

    def test_connected_components_transitive(self, spark):
        # A~B, B~C, C!~A must land in ONE cluster; D-E separate; chain 10..13
        from holcstore_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            pd.DataFrame(
                [(1, 2), (2, 3), (4, 5), (11, 10), (11, 12), (12, 13)],
                columns=["id_a", "id_b"],
            )
        )
        comp = {
            r["node"]: r["comp"] for r in connected_components(pairs).collect()
        }
        assert comp[1] == comp[2] == comp[3] == 1
        assert comp[4] == comp[5] == 4
        assert comp[10] == comp[11] == comp[12] == comp[13] == 10
        assert len(comp) == 9

    def test_cluster_representatives_argmax_and_ties(self, spark):
        from holcstore_spark.operators.dedup import (
            cluster_representatives,
            connected_components,
        )

        pairs = spark.createDataFrame(
            pd.DataFrame([(1, 2), (2, 3), (4, 5)], columns=["id_a", "id_b"])
        )
        comp = connected_components(pairs)
        docs = spark.createDataFrame(
            pd.DataFrame(
                # cluster {1,2,3}: 2 has max n_chars -> rep; cluster {4,5}:
                # tie on n_chars -> lowest id (4) wins
                [(1, 10), (2, 50), (3, 50 - 1), (4, 7), (5, 7), (9, 99)],
                columns=["doc_id", "n_chars"],
            )
        )
        reps = {
            r["cluster_id"]: (r["rep_id"], r["cluster_size"], r["n_dropped"])
            for r in cluster_representatives(comp, docs).collect()
        }
        assert reps == {1: (2, 3, 2), 4: (4, 2, 1)}  # doc 9 unclustered — absent

    def test_quality_top_fraction_exact_and_threshold(self, spark):
        from holcstore_spark.operators.text import quality_top_fraction

        pdf = pd.DataFrame(
            {
                "doc_id": range(10),
                "lang": ["en"] * 6 + ["fr"] * 4,
                "quality": [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.95, 0.85, 0.75, 0.65],
            }
        )
        d = spark.createDataFrame(pdf)
        kept = quality_top_fraction(d, 0.5, by="lang").collect()
        ids = sorted(r["doc_id"] for r in kept)
        assert ids == [0, 1, 2, 6, 7]  # ceil(6*0.5)=3 en, ceil(4*0.5)=2 fr
        # threshold mode (scale path): approximate — everything the exact
        # rank keeps survives, plus at most the sketch's one boundary doc
        # per group (percentile_approx lands the cutoff ON a data value)
        thr = sorted(
            r["doc_id"]
            for r in quality_top_fraction(d, 0.5, by="lang", mode="threshold").collect()
        )
        assert set(ids) <= set(thr)
        assert len(thr) <= len(ids) + 2  # one boundary doc per group max
        # ungrouped + bad args
        allkept = quality_top_fraction(d, 1.0, by=None).count()
        assert allkept == 10
        with pytest.raises(ValueError):
            quality_top_fraction(d, 0.0)
        with pytest.raises(ValueError):
            quality_top_fraction(d, 0.5, mode="nope")

    def test_clean_corpus_cluster_resolution(self, spark):
        # doc3 is near both doc1 and doc2, but doc1~doc2 falls below the
        # threshold: pairwise drop keeps {1, 2}; cluster mode keeps only 1
        from holcstore_spark.operators.pipeline import clean_corpus

        base = [f"w{i}" for i in range(20)]
        t1 = " ".join(base)
        mid = base.copy(); mid[10] = "CHANGED3"
        t3 = " ".join(mid)
        far = mid.copy(); far[3] = "CHANGED2"
        t2 = " ".join(far)
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "text": [t1, t2, t3]})
        )
        kw = dict(min_quality=0.0, jaccard_threshold=0.6,
                  n_hashes=16, bands=16, shingle_k=3)
        pairwise = sorted(
            r["doc_id"] for r in clean_corpus(docs, **kw).collect()
        )
        clustered = sorted(
            r["doc_id"]
            for r in clean_corpus(docs, resolve_clusters=True, **kw).collect()
        )
        assert pairwise == [1, 2]
        assert clustered == [1]

    def test_connected_components_max_iter_raises(self, spark):
        from holcstore_spark.operators.dedup import connected_components

        chain = spark.createDataFrame(
            pd.DataFrame([(i, i + 1) for i in range(8)], columns=["id_a", "id_b"])
        )
        with pytest.raises(RuntimeError):
            connected_components(chain, max_iter=2)


@pytest.fixture()
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),    # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),   # opposite of 0
        (4, [0.8, 0.2, 0.0, 0.0]),    # close to 0 and 1
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )


class TestSimilarity:
    def test_concurrent_subspace_books_match_serial(self, vectors):
        # r16: pq_encode/pq_topk/VectorIndex train their m per-subspace
        # codebooks from a driver thread pool (guide §2.6); each training
        # is deterministic and independent, so the concurrent result must
        # be BIT-identical to the serial loop it replaced, in order.
        from holcstore_spark.operators.similarity import (
            train_ivf_centroids,
            train_subspace_books,
        )

        m, sub = 2, 2
        conc = train_subspace_books(
            vectors, m, sub, n_centroids=2, iters=2,
            id_col="vec_id", vec_col="embedding",
        )
        serial = []
        for j in range(m):
            sub_df = vectors.select(
                F.col("vec_id"),
                F.slice(F.col("embedding"), j * sub + 1, sub).alias("__sub"),
            )
            serial.append(train_ivf_centroids(
                sub_df, n_lists=2, iters=2,
                id_col="vec_id", vec_col="__sub", dim=sub,
            ))
        assert conc == serial

    def test_brute_force_topk_ordering(self, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        out = brute_force_topk(vectors, q, k=2).collect()
        assert [r["neighbor_id"] for r in out] == [1, 4]
        assert out[0]["score"] > 0.98

    def test_brute_force_zero_vector_scores_null_and_ranks_last(self, spark):
        # a zero-norm vector must score NULL (matching cosine_q's
        # divide-by-zero NULL), never NaN — Spark sorts NaN above every
        # double, which would make the zero vector the rank-1 neighbour
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        ]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        q = d.filter(F.col("vec_id") == 0)
        out = brute_force_topk(d, q, k=1).collect()
        assert [r["neighbor_id"] for r in out] == [1]
        scores = {
            r["neighbor_id"]: r["score"]
            for r in brute_force_topk(d, q, k=2).collect()
        }
        assert scores[2] is None

    def test_lsh_topk_subset_of_bruteforce_scores(self, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        bf = {r["neighbor_id"]: r["score"]
              for r in brute_force_topk(vectors, q, k=4).collect()}
        out = lsh_topk(vectors, q, k=4, n_planes=2, dim=4).collect()
        # LSH returns a subset of candidates with identical exact scores
        for r in out:
            assert r["score"] == pytest.approx(bf[r["neighbor_id"]])

    def test_ivf_topk_exact_scores_and_recall(self, vectors):
        from holcstore_spark.operators.similarity import ivf_topk

        q = vectors.filter(F.col("vec_id") == 0)
        bf = {r["neighbor_id"]: r["score"]
              for r in brute_force_topk(vectors, q, k=4).collect()}
        out = ivf_topk(vectors, q, k=4, n_lists=2, n_probe=2, iters=1, )
        rows = out.collect()
        # probing every list == exhaustive: scores match brute force exactly
        assert {r["neighbor_id"]: r["score"] for r in rows} == bf

    def test_ivf_pretrained_centroids_shape_validated(self, vectors):
        # ADVICE r12: wrong-shape pre-trained centroids must error
        # loudly instead of silently mis-assigning lists
        from holcstore_spark.operators.similarity import ivf_topk

        q = vectors.filter(F.col("vec_id") == 0)
        with pytest.raises(ValueError, match="empty"):
            ivf_topk(vectors, q, centroids=[])
        with pytest.raises(ValueError, match="ragged"):
            ivf_topk(vectors, q, centroids=[[1, 2, 3, 4], [1, 2]])
        with pytest.raises(ValueError, match="integer-quantized"):
            ivf_topk(vectors, q, centroids=[[0.1, 0.2, 0.3, 0.4]])

    def test_ivf_filtered_full_probe_equals_postfiltered_bruteforce(
            self, vectors):
        # round 12: probing EVERY list makes filtered IVF exhaustive over
        # the filtered candidates, so it must equal brute force over the
        # pre-filtered set exactly — and never return a filtered-out row
        from holcstore_spark.operators.similarity import ivf_topk

        labeled = vectors.withColumn("label", F.col("vec_id") % 2)
        q = labeled.filter(F.col("vec_id") == 0)
        bf = {
            (r["q_id"], r["neighbor_id"]): r["score"]
            for r in brute_force_topk(
                labeled.filter(F.col("label") == 1), q, k=4
            ).collect()
        }
        out = ivf_topk(labeled, q, k=4, n_lists=2, n_probe=2, iters=1,
                       filters={"label": 1}).collect()
        assert {(r["q_id"], r["neighbor_id"]): r["score"] for r in out} == bf
        assert {r["neighbor_id"] for r in out} == {1, 3}  # odd ids only

    def test_ivf_filtered_column_and_dict_predicates_agree(self, vectors):
        from holcstore_spark.operators.similarity import ivf_topk

        labeled = vectors.withColumn("label", F.col("vec_id") % 2)
        q = labeled.filter(F.col("vec_id") == 0)
        via_dict = ivf_topk(labeled, q, k=4, n_lists=2, n_probe=2, iters=1,
                            filters={"label": 1}).collect()
        via_col = ivf_topk(labeled, q, k=4, n_lists=2, n_probe=2, iters=1,
                           filters=F.col("label") == 1).collect()
        assert sorted(map(tuple, via_dict)) == sorted(map(tuple, via_col))

    def test_ivf_filtered_recall_vs_postfiltered_bruteforce_sf001(
            self, spark):
        # the headline contract on real data: candidate-side filtering
        # during generation, recall measured against post-filtered exact
        # search; every neighbour must satisfy the predicate and common
        # pairs carry identical exact scores
        from holcstore_spark.operators.similarity import ivf_topk

        e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        q = e.filter(F.col("vec_id") % 100 == 0)
        flt = {"label__in": [2, 5, 7]}
        exact = brute_force_topk(
            e.filter(F.col("label").isin([2, 5, 7])), q, k=3
        ).collect()
        # synthetic embeddings are near-random (little cluster
        # structure), so recall tracks the probe fraction: measured
        # 0.47/0.60/0.67 at n_probe 4/6/8 of 16 — assert the 8-probe
        # level with margin
        approx = ivf_topk(e, q, k=3, n_lists=16, n_probe=8, iters=2,
                          filters=flt).collect()
        labels = {r["vec_id"]: r["label"] for r in
                  e.select("vec_id", "label").collect()}
        assert all(labels[r["neighbor_id"]] in (2, 5, 7) for r in approx)
        exact_pairs = {(r["q_id"], r["neighbor_id"]) for r in exact}
        approx_pairs = {(r["q_id"], r["neighbor_id"]) for r in approx}
        recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
        assert recall >= 0.5, f"filtered-IVF recall {recall:.2f} too low"
        exact_scores = {(r["q_id"], r["neighbor_id"]): r["score"]
                        for r in exact}
        for r in approx:
            key = (r["q_id"], r["neighbor_id"])
            if key in exact_scores:
                assert r["score"] == pytest.approx(exact_scores[key])

    def test_lsh_and_bruteforce_filtered_agree(self, vectors):
        # round 12: filters= on the remaining ANN entry points — the
        # filtered brute force is exact over the filtered candidates,
        # and filtered LSH returns a subset of it with identical exact
        # scores and only predicate-passing neighbours
        from holcstore_spark.operators.similarity import lsh_topk

        labeled = vectors.withColumn("label", F.col("vec_id") % 2)
        q = labeled.filter(F.col("vec_id") == 0)
        bf = {
            (r["q_id"], r["neighbor_id"]): r["score"]
            for r in brute_force_topk(labeled, q, k=4,
                                      filters={"label": 1}).collect()
        }
        assert set(n for _, n in bf) == {1, 3}  # odd ids only
        out = lsh_topk(labeled, q, k=4, n_planes=2, dim=4,
                       filters={"label": 1}).collect()
        for r in out:
            assert r["neighbor_id"] % 2 == 1
            assert r["score"] == pytest.approx(
                bf[(r["q_id"], r["neighbor_id"])]
            )

    def test_pq_filtered_neighbors_respect_predicate(self, spark):
        from holcstore_spark.operators.similarity import pq_topk

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter(F.col("vec_id") % 20 == 0)
        out = pq_topk(e, q, k=3, m=4, n_centroids=8, iters=1, dim=64,
                      filters={"label__gte": 5}).collect()
        labels = {r["vec_id"]: r["label"] for r in
                  e.select("vec_id", "label").collect()}
        assert out and all(labels[r["neighbor_id"]] >= 5 for r in out)
        # an always-true filter must be a no-op vs the unfiltered path
        base = pq_topk(e, q, k=3, m=4, n_centroids=8, iters=1, dim=64)
        trivial = pq_topk(e, q, k=3, m=4, n_centroids=8, iters=1, dim=64,
                          filters={"label__gte": 0})
        assert sorted(map(tuple, base.collect())) == \
            sorted(map(tuple, trivial.collect()))

    def test_cosine_near_dup_pairs(self, vectors):
        pairs = cosine_near_dup_pairs(vectors, threshold=0.95, n_planes=2, dim=4)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        # 0-1 and 1-4 are >0.95 cosine; opposite/orthogonal pairs are not
        assert all(a < b for a, b in got)
        assert (0, 3) not in got and (0, 2) not in got


class TestText:
    def test_text_stats_crafted(self, spark):
        d = spark.createDataFrame(
            pd.DataFrame([(1, "the cat, the dog!")], columns=["doc_id", "text"])
        )
        r = text_stats(d).collect()[0]
        assert r["n_chars"] == 17
        assert r["n_tokens"] == 4
        assert r["n_punct"] == 2          # ',' and '!'
        assert r["n_stopwords"] == 2      # 'the' twice ('cat,'/'dog!' don't match)
        assert len(r["fingerprint"]) == 16

    def test_token_count_bpe(self, spark):
        d = spark.createDataFrame(
            pd.DataFrame([(1, "ab, cd! xy")], columns=["doc_id", "text"])
        )
        assert token_count_bpe(d).collect()[0]["n_bpe_tokens"] == 5

    def test_lang_id(self, spark):
        rows = [
            (1, "the cat of the house and friends"),
            (2, "le chat de la maison et les amis"),
            (3, "der hund und die katze ist hier"),
            (4, "xyzzy qwerty asdf"),
        ]
        d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        out = {r["doc_id"]: r["lang_pred"] for r in lang_id(d).collect()}
        assert out == {1: "en", 2: "fr", 3: "de", 4: "und"}

    def test_quality_score_bounds(self, spark):
        rows = [(1, "the of and to in " * 30), (2, "!!!! ???? ,,,,")]
        d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        out = {r["doc_id"]: r["quality"] for r in quality_score(d).collect()}
        assert 0.0 <= out[2] < out[1] <= 1.0

    def test_winnow_fingerprints_shared_substring(self, spark):
        from holcstore_spark.operators.text import winnow_fingerprints

        shared = "a long shared passage that winnowing must anchor on"
        rows = [
            (1, "PREFIX ONE " + shared),
            (2, shared + " SUFFIX TWO ENTIRELY DIFFERENT"),
            (3, "nothing in common with the others at all here"),
            (4, "tiny"),  # shorter than k → single gram
        ]
        d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        out = {
            r["doc_id"]: set(r["fps"])
            for r in d.select(
                "doc_id", winnow_fingerprints("text").alias("fps")
            ).collect()
        }
        # position-shifted shared substring → overlapping fingerprints
        assert out[1] & out[2]
        assert not (out[1] & out[3])
        assert len(out[4]) == 1
        # deterministic across evaluations
        again = {
            r["doc_id"]: set(r["fps"])
            for r in d.select(
                "doc_id", winnow_fingerprints("text").alias("fps")
            ).collect()
        }
        assert again == out


class TestMultimodal:
    def test_meta_extraction(self, spark):
        d = spark.createDataFrame(
            pd.DataFrame([(1, "abc"), (2, "hello")], columns=["doc_id", "text"])
        )
        with_payload = attach_binary_payload(d)
        meta = {r["doc_id"]: r for r in extract_media_meta(with_payload).collect()}
        assert meta[1]["n_bytes"] == 3
        assert meta[1]["digest"] == "900150983cd24fb0d6963f7d28e17f72"
        assert meta[2]["media_type"] == "image"

    def test_decode_stub_deterministic_shape(self, spark):
        d = attach_binary_payload(
            spark.createDataFrame(pd.DataFrame([(1, "abc")], columns=["doc_id", "text"]))
        )
        r1 = decode_stub(d).collect()[0]
        r2 = decode_stub(d).collect()[0]
        assert r1["features"] == r2["features"]
        assert len(r1["features"]) == 4
        assert 64 <= r1["width"] < 128

    def test_decode_strict_ppm_real_pixels(self, spark):
        # handcrafted 2×2 P6 with a header comment; channel means and the
        # pixel digest must come from a REAL parse of the payload
        import hashlib as _hl

        import numpy as np

        pix = bytes([255, 0, 0,  0, 255, 0,
                     0, 0, 255,  10, 20, 30])
        ppm = b"P6\n# comment\n2 2\n255\n" + pix
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(ppm)]})
        )
        r = decode_strict(d).collect()[0]
        assert (r["codec"], r["width"], r["height"]) == ("ppm", 2, 2)
        arr = np.frombuffer(pix, dtype=np.uint8).reshape(-1, 3)
        assert r["mean_r"] == arr[:, 0].mean()
        assert r["mean_g"] == arr[:, 1].mean()
        assert r["mean_b"] == arr[:, 2].mean()
        assert r["pixel_digest"] == _hl.md5(pix).hexdigest()

    def test_decode_strict_bmp_real_pixels(self, spark):
        # 3×2 uncompressed 24-bit BMP, bottom-up rows with 4-byte-aligned
        # stride (3·3=9 → stride 12): decode must un-pad, flip, and swap
        # BGR→RGB
        import struct

        import numpy as np

        rgb = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)
        stride = 12
        rows = []
        for y in (1, 0):  # bottom-up
            row = rgb[y][..., ::-1].tobytes()  # RGB→BGR on disk
            rows.append(row + b"\x00" * (stride - len(row)))
        pixel_data = b"".join(rows)
        header = (
            b"BM"
            + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0,
                          len(pixel_data), 2835, 2835, 0, 0)
        )
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [7], "payload": [bytearray(header + pixel_data)]})
        )
        r = decode_strict(d).collect()[0]
        assert (r["codec"], r["width"], r["height"]) == ("bmp", 3, 2)
        flat = rgb.reshape(-1, 3)
        assert r["mean_r"] == flat[:, 0].mean()
        assert r["mean_g"] == flat[:, 1].mean()
        assert r["mean_b"] == flat[:, 2].mean()

    def test_decode_strict_png_real_pixels_all_filters(self, spark):
        # stdlib-zlib PNG decode: filter_cycle uses scanline filter y%5,
        # so a single 6-row image exercises None/Sub/Up/Average/Paeth;
        # filters are lossless — means + digest must equal the source
        import hashlib as _hl

        import numpy as np

        from holcstore_spark.operators.multimodal import encode_png

        rng = np.random.RandomState(7)
        arr = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
        png = encode_png(arr, filter_cycle=True)
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(png)]})
        )
        r = decode_strict(d).collect()[0]
        assert (r["codec"], r["width"], r["height"]) == ("png", 5, 6)
        flat = arr.reshape(-1, 3)
        assert r["mean_r"] == flat[:, 0].mean()
        assert r["mean_g"] == flat[:, 1].mean()
        assert r["mean_b"] == flat[:, 2].mean()
        assert r["pixel_digest"] == _hl.md5(arr.tobytes()).hexdigest()

    def test_jpeg_uniform_even_blocks_bit_exact(self, spark):
        # the exactness property the oracle relies on: uniform 8x8 blocks
        # with even values survive quantization exactly (DC=8d, q=16,
        # d even -> round(d/2) lossless; all AC zero)
        import hashlib as _hl

        import numpy as np

        from holcstore_spark.operators.jpeg import encode_jpeg

        vals = [32, 64, 100, 126, 90, 54]
        img = np.repeat(np.array(vals, dtype=np.uint8), 64).reshape(-1, 8)
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(encode_jpeg(img))]})
        )
        r = decode_strict(d).collect()[0]
        assert (r["codec"], r["width"], r["height"]) == ("jpeg", 8, 48)
        assert r["mean_r"] == r["mean_g"] == r["mean_b"] == sum(vals) / len(vals)
        rgb = np.repeat(img[..., None], 3, axis=2)
        assert r["pixel_digest"] == _hl.md5(rgb.tobytes()).hexdigest()

    def test_jpeg_sampling_and_restart_matrix(self):
        # 4:4:4 / 4:2:0, with and without restart markers, odd dims
        # (pad/crop): decode error bounded by quantization loss
        import numpy as np

        from holcstore_spark.operators.jpeg import encode_jpeg, parse_jpeg

        xs = np.linspace(40, 200, 37)
        ys = np.linspace(60, 180, 21)
        gx, gy = np.meshgrid(xs, ys)
        img = np.stack([gx, gy, (gx + gy) / 2], axis=-1).astype(np.uint8)
        for kw in ({}, {"subsample": True}, {"restart_interval": 3},
                   {"subsample": True, "restart_interval": 2}):
            w, h, rgb = parse_jpeg(encode_jpeg(img, **kw))
            assert (w, h) == (37, 21)
            err = np.abs(rgb.astype(int) - img.astype(int)).max()
            assert err <= 16, (kw, err)

    def test_jpeg_16bit_dqt_and_merged_dht_segments(self):
        # real-world encoders emit 16-bit quant tables and multi-table DHT
        # segments; rewrite our 8-bit stream into both forms and re-decode
        import struct

        import numpy as np

        from holcstore_spark.operators.jpeg import encode_jpeg, parse_jpeg

        jp = bytearray(encode_jpeg(np.full((8, 8), 100, dtype=np.uint8)))
        i = jp.index(b"\xff\xdb")
        size = struct.unpack_from(">H", jp, i + 2)[0]
        qt_zz = bytes(jp[i + 5 : i + 5 + 64])
        body16 = bytes([0x10]) + b"".join(
            struct.pack(">H", v) for v in qt_zz
        )
        seg16 = b"\xff\xdb" + struct.pack(">H", len(body16) + 2) + body16
        jp16 = bytes(jp[:i]) + seg16 + bytes(jp[i + 2 + size :])
        _, _, rgb = parse_jpeg(jp16)
        assert (rgb == 100).all()

        i1 = jp16.index(b"\xff\xc4")
        s1 = struct.unpack_from(">H", jp16, i1 + 2)[0]
        i2 = jp16.index(b"\xff\xc4", i1 + 2)
        s2 = struct.unpack_from(">H", jp16, i2 + 2)[0]
        b1, b2 = jp16[i1 + 4 : i1 + 2 + s1], jp16[i2 + 4 : i2 + 2 + s2]
        merged = b"\xff\xc4" + struct.pack(">H", len(b1) + len(b2) + 2) + b1 + b2
        _, _, rgb = parse_jpeg(jp16[:i1] + merged + jp16[i2 + 2 + s2 :])
        assert (rgb == 100).all()

    def test_avi_roundtrip_and_frame_sample_strict(self, spark):
        # uncompressed RIFF/AVI: DIB frames are lossless (bottom-up BGR,
        # 4-byte row padding on odd widths) — container walk + numpy decode
        import hashlib as _hl

        import numpy as np

        from holcstore_spark.operators.multimodal import (
            encode_avi,
            frame_sample_strict,
            parse_avi,
        )

        rng = np.random.RandomState(3)
        frames = rng.randint(0, 256, size=(5, 6, 7, 3)).astype(np.uint8)
        avi = encode_avi(frames)
        w, h, back = parse_avi(avi)
        assert (w, h) == (7, 6) and (back == frames).all()

        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(avi)]})
        )
        rows = frame_sample_strict(d, every=2).orderBy("frame_idx").collect()
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        for r in rows:
            fr = frames[r["frame_idx"]]
            assert (r["width"], r["height"]) == (7, 6)
            assert r["mean_r"] == fr[..., 0].astype(int).sum() / 42
            assert r["frame_digest"] == _hl.md5(fr.tobytes()).hexdigest()

        import struct

        bad = bytearray(avi)
        struct.pack_into("<I", bad, bad.index(b"strf") + 8 + 16, 1)
        with pytest.raises(ValueError, match="compressed AVI"):
            parse_avi(bytes(bad))
        with pytest.raises(ValueError, match="not a RIFF/AVI"):
            parse_avi(b"RIFF\x00\x00\x00\x00WAVE")

    def test_mjpeg_avi_decode(self, spark):
        """Motion-JPEG AVI (r15): frames are real JPEGs — uniform even
        gray frames survive quantization exactly, arbitrary frames
        decode with bounded quantization error, the sampler walks the
        compressed container, and non-MJPG compressions still raise."""
        import hashlib as _hl

        import numpy as np

        from holcstore_spark.operators.multimodal import (
            encode_avi,
            frame_sample_strict,
            parse_avi,
        )

        vals = [0, 2, 88, 126, 254]
        frames = np.stack(
            [np.full((8, 8, 3), v, np.uint8) for v in vals]
        )
        avi = encode_avi(frames, codec="MJPG")
        w, h, back = parse_avi(avi)
        assert (w, h) == (8, 8) and (back == frames).all()
        # the compressed container rides the SAME sampler
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(avi)]})
        )
        rows = frame_sample_strict(d, every=2).orderBy("frame_idx").collect()
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        for r in rows:
            v = vals[r["frame_idx"]]
            assert r["mean_r"] == r["mean_g"] == r["mean_b"] == float(v)
            assert r["frame_digest"] == _hl.md5(
                bytes([v]) * 192
            ).hexdigest()
        # arbitrary content: lossy but decodable, dims preserved
        rng = np.random.RandomState(9)
        rf = rng.randint(0, 256, (3, 16, 24, 3)).astype(np.uint8)
        w, h, back = parse_avi(encode_avi(rf, codec="MJPG"))
        assert (w, h) == (24, 16) and back.shape == rf.shape
        assert np.abs(back.astype(int) - rf.astype(int)).mean() < 40
        with pytest.raises(ValueError, match="DIB or MJPG"):
            encode_avi(rf, codec="H264")

    def test_jpeg_rejects_invalid_and_truncated(self):
        import numpy as np

        from holcstore_spark.operators.jpeg import (
            encode_jpeg,
            encode_progressive,
            parse_jpeg,
        )

        jp = bytearray(encode_jpeg(np.full((8, 8), 100, dtype=np.uint8)))
        # SOF0 flipped to SOF2 makes the baseline scan (Ss..Se = 0..63)
        # an ILLEGAL progressive scan — refused, not mis-decoded
        bad = bytearray(jp)
        bad[bad.index(b"\xc0", 2)] = 0xC2
        with pytest.raises(ValueError, match="progressive|baseline"):
            parse_jpeg(bytes(bad))
        # extended/lossless/arithmetic SOFs still refuse
        bad = bytearray(jp)
        bad[bad.index(b"\xc0", 2)] = 0xC1
        with pytest.raises(ValueError, match="extended|arithmetic"):
            parse_jpeg(bytes(bad))
        with pytest.raises((ValueError, IndexError)):
            parse_jpeg(bytes(jp[:40]))
        with pytest.raises(ValueError):
            parse_jpeg(b"\x00\x01\x02\x03")
        pb = encode_progressive(np.full((8, 8), 100, dtype=np.uint8))
        with pytest.raises((ValueError, IndexError)):
            parse_jpeg(pb[:60])

    def test_progressive_equals_baseline_bit_exact(self):
        """Progressive and baseline encodings carry the SAME quantized
        coefficients, so both decodes must produce bit-identical pixels
        — across gray/RGB, 4:4:4/4:2:0 and non-MCU-aligned dims."""
        import numpy as np

        from holcstore_spark.operators.jpeg import (
            encode_jpeg,
            encode_progressive,
            parse_jpeg,
        )

        rng = np.random.RandomState(42)
        cases = [
            (rng.randint(0, 256, (8, 8)).astype(np.uint8), False),
            (rng.randint(0, 256, (21, 13)).astype(np.uint8), False),
            (rng.randint(0, 256, (24, 16, 3)).astype(np.uint8), False),
            (rng.randint(0, 256, (17, 19, 3)).astype(np.uint8), True),
            # mostly-flat: long cross-block EOBRUNs in every AC scan
            ((rng.rand(32, 32) < 0.02).astype(np.uint8) * 255, False),
        ]
        for img, sub in cases:
            wb, hb, base = parse_jpeg(encode_jpeg(img, subsample=sub))
            wp, hp, prog = parse_jpeg(
                encode_progressive(img, subsample=sub)
            )
            assert (wb, hb) == (wp, hp)
            assert np.array_equal(base, prog)

    def test_progressive_custom_scan_scripts(self):
        """Spectral selection is free-form: a no-approximation script
        and a 3-band split with per-band refinements both reconstruct
        the baseline pixels exactly."""
        import numpy as np

        from holcstore_spark.operators.jpeg import (
            encode_jpeg,
            encode_progressive,
            parse_jpeg,
        )

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (19, 23, 3)).astype(np.uint8)
        _, _, base = parse_jpeg(encode_jpeg(img))
        allc = (0, 1, 2)
        scripts = [
            [(allc, 0, 0, 0, 0)]
            + [((c,), 1, 63, 0, 0) for c in range(3)],
            [(allc, 0, 0, 0, 1),
             ((0,), 1, 2, 0, 1), ((0,), 3, 9, 0, 1), ((0,), 10, 63, 0, 1),
             ((1,), 1, 63, 0, 1), ((2,), 1, 63, 0, 1),
             ((0,), 1, 2, 1, 0), ((0,), 3, 9, 1, 0), ((0,), 10, 63, 1, 0),
             ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0),
             (allc, 0, 0, 1, 0)],
        ]
        for scans in scripts:
            _, _, prog = parse_jpeg(encode_progressive(img, scans=scans))
            assert np.array_equal(base, prog)

    def test_progressive_property_rounds(self):
        """Randomized round-trips across shapes, color modes and
        sparsity — any EOBRUN/correction-bit/point-transform bug in
        either direction breaks pixel equality."""
        import numpy as np

        from holcstore_spark.operators.jpeg import (
            encode_jpeg,
            encode_progressive,
            parse_jpeg,
        )

        rng = np.random.RandomState(1234)
        for trial in range(20):
            h, w = rng.randint(1, 40), rng.randint(1, 40)
            kind = trial % 4
            if kind == 0:
                img = rng.randint(0, 256, (h, w)).astype(np.uint8)
                sub = False
            elif kind == 1:
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                sub = False
            elif kind == 2:
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                sub = True
            else:
                img = np.full((h, w), 128, np.uint8)
                for _ in range(rng.randint(0, 5)):
                    img[rng.randint(h), rng.randint(w)] = rng.randint(256)
                sub = False
            _, _, base = parse_jpeg(encode_jpeg(img, subsample=sub))
            _, _, prog = parse_jpeg(encode_progressive(img, subsample=sub))
            assert np.array_equal(base, prog), (trial, h, w, kind)

    def test_parse_png_color_types_and_errors(self):
        # non-RGB colour types map to RGB (gray replicated, alpha
        # dropped, palette looked up); malformed payloads raise
        import struct
        import zlib

        import numpy as np

        from holcstore_spark.operators.multimodal import _PNG_SIG, _parse_png

        def enc(px, color, plte=None):
            h, w = px.shape[:2]
            raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

            def chunk(t, body):
                crc = zlib.crc32(t + body) & 0xFFFFFFFF
                return (struct.pack(">I", len(body)) + t + body
                        + struct.pack(">I", crc))

            out = _PNG_SIG + chunk(
                b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
            )
            if plte is not None:
                out += chunk(b"PLTE", plte.tobytes())
            return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

        rng = np.random.RandomState(3)
        g = rng.randint(0, 256, size=(4, 5, 1), dtype=np.uint8)
        assert np.array_equal(_parse_png(enc(g, 0))[2], np.repeat(g, 3, axis=2))
        ga = rng.randint(0, 256, size=(4, 5, 2), dtype=np.uint8)
        assert np.array_equal(
            _parse_png(enc(ga, 4))[2], np.repeat(ga[..., :1], 3, axis=2)
        )
        rgba = rng.randint(0, 256, size=(4, 5, 4), dtype=np.uint8)
        assert np.array_equal(_parse_png(enc(rgba, 6))[2], rgba[..., :3])
        plte = rng.randint(0, 256, size=(8, 3), dtype=np.uint8)
        pal = rng.randint(0, 8, size=(4, 5, 1), dtype=np.uint8)
        assert np.array_equal(_parse_png(enc(pal, 3, plte))[2], plte[pal[..., 0]])
        with pytest.raises(ValueError, match="not a PNG"):
            _parse_png(b"\x89PNGxxxx")
        with pytest.raises(ValueError, match="missing PLTE"):
            _parse_png(enc(pal, 3))

    def test_resize_strict_handles_png_input(self, spark):
        # resize sniffs _DECODERS, so a PNG input downsamples and
        # re-encodes to P6 just like PPM/BMP inputs
        import numpy as np

        from holcstore_spark.operators.multimodal import encode_png, resize_strict

        arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1],
                          "payload": [bytearray(encode_png(arr))]})
        )
        r = resize_strict(d, factor=2).collect()[0]
        assert (r["width"], r["height"]) == (2, 2)
        back = decode_strict(
            spark.createDataFrame(
                pd.DataFrame({"doc_id": [1], "payload": [r["payload"]]})
            )
        ).collect()[0]
        kept = arr[::2, ::2].reshape(-1, 3)
        assert back["mean_r"] == kept[:, 0].mean()

    def test_decode_strict_rejects_unknown_format(self, spark):
        d = attach_binary_payload(
            spark.createDataFrame(pd.DataFrame([(1, "x")], columns=["doc_id", "text"]))
        )
        with pytest.raises(Exception, match="decode_stub|NotImplementedError"):
            decode_strict(d).collect()

    def test_frame_sample_explodes_and_strides(self, spark):
        import hashlib

        from holcstore_spark.operators.multimodal import frame_sample

        # 1000 bytes → 10 frames of 100 (last short: 1000 = 10×100 exactly);
        # 950 bytes → frames 0..9, last is 50 bytes; every=3 keeps 0,3,6,9
        d = attach_binary_payload(
            spark.createDataFrame(
                pd.DataFrame(
                    [(1, "a" * 950), (2, "xy")], columns=["doc_id", "text"]
                )
            ),
            media_type="video",
        )
        out = frame_sample(d, frame_bytes=100, every=3).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        f1 = sorted(by_doc[1], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in f1] == [0, 3, 6, 9]
        assert [r["n_bytes"] for r in f1] == [100, 100, 100, 50]
        fr0 = b"a" * 100
        assert f1[0]["digest"] == hashlib.md5(
            fr0.hex().upper().encode()
        ).hexdigest()
        assert bytes(f1[0]["frame"]) == fr0
        # tiny payload: one short frame
        assert [(r["frame_idx"], r["n_bytes"]) for r in by_doc[2]] == [(0, 2)]

    def test_resize_stub_strides_bytes(self, spark):
        from holcstore_spark.operators.multimodal import decode_stub, resize_stub

        d = attach_binary_payload(
            spark.createDataFrame(
                pd.DataFrame([(1, "abcdefgh")], columns=["doc_id", "text"])
            )
        )
        full = decode_stub(d).collect()[0]
        half = resize_stub(d, factor=2).collect()[0]
        assert bytes(half["payload"]) == b"aceg"
        assert half["width"] == full["width"] // 2
        assert half["height"] == full["height"] // 2


class TestPackingAndContamination:
    def test_pack_manifest_matches_serial_cumsum(self, spark):
        from holcstore_spark.operators.packing import pack_manifest

        texts = {i: " ".join(["w"] * (i % 7 + 1)) for i in range(1, 21)}
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
        )
        # bucket_size=4 forces several buckets through the two-phase sum
        out = {
            r["doc_id"]: r
            for r in pack_manifest(d, block_tokens=10, bucket_size=4).collect()
        }
        off = 0
        for i in sorted(texts):
            n = i % 7 + 1
            r = out[i]
            assert r["n_tokens"] == n
            assert r["start_offset"] == off, i
            assert r["start_block"] == off // 10
            assert r["end_block"] == (off + n - 1) // 10
            off += n

    def test_pack_manifest_empty_doc_spans_one_block(self, spark):
        from holcstore_spark.operators.packing import pack_manifest

        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "x"]})
        )
        rows = {r["doc_id"]: r for r in pack_manifest(d, block_tokens=2).collect()}
        assert rows[1]["start_block"] == 0 and rows[1]["end_block"] == 1
        assert rows[2]["start_offset"] == 3

    def test_pack_manifest_rejects_non_numeric_key(self, spark):
        # a string key would NULL-out __bucket and the inner bucket join
        # would silently drop rows — must raise instead
        import pytest

        from holcstore_spark.operators.packing import pack_manifest

        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": ["a", "b"], "text": ["x", "y"]})
        )
        with pytest.raises(TypeError, match="numeric ordering key"):
            pack_manifest(d)

    def test_ngram_contamination_thresholds(self, spark):
        from holcstore_spark.operators.contamination import ngram_contamination

        bench = spark.createDataFrame(
            pd.DataFrame({"doc_id": [100], "text": ["the quick brown fox jumps high"]})
        )
        docs = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": [1, 2, 3],
                "text": [
                    # shares shingles "the quick brown", "quick brown fox"
                    "see the quick brown fox run",
                    # shares exactly one shingle ("fox jumps high")
                    "a fox jumps high today maybe",
                    "completely unrelated words here now",
                ],
            })
        )
        out = {r["doc_id"]: r["n_overlap"]
               for r in ngram_contamination(docs, bench, k=3, min_overlap=2).collect()}
        assert out == {1: 2}
        # min_overlap=1 admits doc 2 as well
        out1 = {r["doc_id"]: r["n_overlap"]
                for r in ngram_contamination(docs, bench, k=3, min_overlap=1).collect()}
        assert out1 == {1: 2, 2: 1}

    def test_tfidf_top_terms_ranks_rare_tokens(self, spark):
        from holcstore_spark.operators.text import tfidf_top_terms

        d = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": [1, 2, 3],
                "text": [
                    "common common rare1",
                    "common rare2 rare2",
                    "common filler words",
                ],
            })
        )
        out = {(r["doc_id"], r["rank"]): r
               for r in tfidf_top_terms(d, k=2).collect()}
        # 'common' appears in every doc (df=3) → idf (3-3+0.5)/(3+0.5) is
        # minimal; doc-unique tokens rank first
        assert out[(1, 1)]["token"] == "rare1"
        assert out[(2, 1)]["token"] == "rare2"
        assert out[(2, 1)]["tf"] == 2 and out[(2, 1)]["df"] == 1
        # exact rational score: tf * (N - df + 0.5)/(df + 0.5)
        assert out[(2, 1)]["score"] == 2.0 * ((3.0 - 1 + 0.5) / (1 + 0.5))
        assert out[(1, 2)]["token"] == "common"

    def test_minhash_max_bucket_drops_boilerplate(self, spark):
        # 6 identical docs form one saturated bucket per band; with the cap
        # below the bucket size no candidate pairs emerge, without it all
        # 15 pairs do
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(6), "text": [DOC] * 6})
        )
        capped = minhash_candidate_pairs(
            d, n_hashes=16, bands=4, max_bucket=5
        ).count()
        uncapped = minhash_candidate_pairs(d, n_hashes=16, bands=4).count()
        assert capped == 0
        assert uncapped == 15

    def test_cosine_near_dup_max_bucket(self, spark):
        rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        from holcstore_spark.operators.similarity import cosine_near_dup_pairs

        assert cosine_near_dup_pairs(d, n_planes=2, dim=4).count() == 10
        assert cosine_near_dup_pairs(
            d, n_planes=2, dim=4, max_bucket=4
        ).count() == 0

    def test_decode_audio_wav16_stereo_stdlib_encoder(self, spark):
        # encode with the stdlib wave module (independent of our parser):
        # 16-bit stereo PCM; decode must center nothing (already signed),
        # count frames = samples/channels, and get the exact mean |amp|
        import io
        import wave

        import numpy as np

        from holcstore_spark.operators.multimodal import decode_audio_strict

        samples = np.array([100, -200, 300, -400, 500, -600], dtype="<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(samples.tobytes())
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(buf.getvalue())]})
        )
        r = decode_audio_strict(d).collect()[0]
        assert (r["codec"], r["sample_rate"], r["n_channels"]) == ("wav", 44100, 2)
        assert r["n_samples"] == 3  # frames
        assert r["mean_abs"] == np.abs(samples.astype("int64")).mean()

    def test_decode_audio_wav8_bias_and_rejects(self, spark):
        from holcstore_spark.operators.multimodal import (
            decode_audio_strict,
            encode_wav_pcm8,
        )

        wav = encode_wav_pcm8(bytes([128, 0, 255]), sample_rate=8000)
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(wav)]})
        )
        r = decode_audio_strict(d).collect()[0]
        # centered amplitudes: 0, -128, 127 → mean abs (0+128+127)/3
        assert r["mean_abs"] == (0 + 128 + 127) / 3
        bad = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(b"not audio")]})
        )
        with pytest.raises(Exception, match="RIFF|WAVE"):
            decode_audio_strict(bad).collect()

    def test_segment_dup_stats_cross_doc_sharing(self, spark):
        from holcstore_spark.operators.text import segment_dup_stats

        # docs 1 and 2 share their first 3-word segment; doc 3 is unique;
        # doc 1's second (short) segment is unshared
        d = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": [1, 2, 3],
                "text": [
                    "a b c x y",      # segs: "a b c", "x y"
                    "a b c",          # segs: "a b c"
                    "q r s",          # segs: "q r s"
                ],
            })
        )
        out = {r["doc_id"]: r for r in segment_dup_stats(d, k_words=3).collect()}
        assert out[1]["n_segments"] == 2 and out[1]["n_shared"] == 1
        assert out[1]["share_ratio"] == 0.5
        assert out[2]["n_segments"] == 1 and out[2]["n_shared"] == 1
        assert out[3]["n_shared"] == 0

    def test_winnow_arrow_twin_identical(self, spark):
        from holcstore_spark.operators.text import (
            winnow_fingerprints,
            winnow_fingerprints_arrow,
        )

        d = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": [1, 2, 3, 4, 5],
                "text": [DOC, DOC[:5], "", "x" * 100, None],
            })
        )
        a = {r["doc_id"]: r["fp"] for r in
             d.select("doc_id", winnow_fingerprints("text").alias("fp")).collect()}
        b = {r["doc_id"]: r["fp"] for r in
             d.select("doc_id",
                      winnow_fingerprints_arrow("text").alias("fp")).collect()}
        assert a == b
        assert a[5] is None  # NULL text propagates, not fingerprint("")

    def test_resize_strict_real_pixels_roundtrip(self, spark):
        # 4×2 PPM downsampled by 2 → 2×1 keeping pixels (0,0) and (0,2);
        # the output is a valid P6 that decode_strict parses back
        import numpy as np

        from holcstore_spark.operators.multimodal import (
            decode_strict,
            resize_strict,
        )

        rgb = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
        ppm = b"P6\n4 2\n255\n" + rgb.tobytes()
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(ppm)]})
        )
        r = resize_strict(d, factor=2).collect()[0]
        assert (r["width"], r["height"]) == (2, 1)
        back = decode_strict(
            spark.createDataFrame(
                pd.DataFrame({"doc_id": [1], "payload": [bytearray(bytes(r["payload"]))]})
            )
        ).collect()[0]
        expected = rgb[::2, ::2].reshape(-1, 3)
        assert (back["width"], back["height"]) == (2, 1)
        assert back["mean_r"] == expected[:, 0].mean()
        assert back["mean_b"] == expected[:, 2].mean()


class TestStatsRollup:
    def test_percentile_exact_crafted(self, spark):
        from holcstore_spark.operators.stats import percentile_rollup

        df = spark.createDataFrame(
            pd.DataFrame({"g": ["a"] * 5 + ["b"] * 2, "value": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0]})
        )
        out = {r["g"]: r for r in percentile_rollup(df, ("g",), ps=(0.25, 0.5, 0.75)).collect()}
        assert out["a"]["p_25"] == 2.0 and out["a"]["p_50"] == 3.0 and out["a"]["p_75"] == 4.0
        assert out["a"]["n"] == 5 and out["a"]["v_mean"] == 3.0
        # two points: p50 is the midpoint by linear interpolation
        assert out["b"]["p_50"] == 15.0

    def test_percentile_approx_within_set(self, spark):
        from holcstore_spark.operators.stats import percentile_rollup

        vals = [float(i) for i in range(101)]
        df = spark.createDataFrame(pd.DataFrame({"g": ["x"] * 101, "value": vals}))
        row = percentile_rollup(df, ("g",), ps=(0.5,), exact=False).collect()[0]
        # approx quantile returns an actual element near the true median
        assert abs(row["p_50"] - 50.0) <= 1.0

    def test_histogram_bins_and_nulls(self, spark):
        from holcstore_spark.operators.stats import value_histogram

        df = spark.createDataFrame(
            pd.DataFrame({"g": ["a"] * 4, "value": [0.0, 63.9, 64.0, None]})
        )
        rows = {r["bin"]: r for r in value_histogram(df, ("g",), bin_width=64.0).collect()}
        assert rows[0]["n"] == 2 and rows[1]["n"] == 1      # null excluded
        assert rows[1]["bin_lo"] == 64.0

    def test_histogram_negative_values_keep_negative_bins(self, spark):
        from holcstore_spark.operators.stats import value_histogram

        df = spark.createDataFrame(pd.DataFrame({"g": ["a"], "value": [-1.0]}))
        row = value_histogram(df, ("g",), bin_width=64.0).collect()[0]
        assert row["bin"] == -1 and row["bin_lo"] == -64.0


class TestDocChunks:
    def test_window_starts_and_overlap(self, spark):
        from holcstore_spark.operators.text import doc_chunks

        text = "".join(chr(ord("a") + i % 26) for i in range(350))
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
        rows = doc_chunks(df, size=200, stride=150).orderBy("chunk_id").collect()
        assert [r["chunk_id"] for r in rows] == [0, 1, 2]
        assert [r["chunk_len"] for r in rows] == [200, 200, 50]
        assert rows[0]["chunk"] == text[0:200]
        assert rows[1]["chunk"] == text[150:350]
        # 50-char overlap between consecutive windows
        assert rows[0]["chunk"][150:] == rows[1]["chunk"][:50]

    def test_short_null_and_empty_docs(self, spark):
        from holcstore_spark.operators.text import doc_chunks

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "text": ["hi", None, ""]})
        )
        rows = doc_chunks(df, size=200, stride=150).collect()
        assert len(rows) == 1 and rows[0]["doc_id"] == 1 and rows[0]["chunk"] == "hi"

    def test_rejects_nonpositive_params(self, spark):
        from holcstore_spark.operators.text import doc_chunks

        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
        with pytest.raises(ValueError):
            doc_chunks(df, stride=0)


class TestQuantizeEmbeddings:
    def test_codes_and_scale(self, spark):
        from holcstore_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            pd.DataFrame({"vec_id": [0], "embedding": [[1.0, -0.5, 0.0]]})
        )
        row = quantize_embeddings(df).collect()[0]
        assert row["q_scale"] == 1.0 / 127.0
        # floor(x/scale + 0.5): 127, floor(-63.0)= -63, 0
        assert list(row["q_vec"]) == [127, -63, 0]

    def test_zero_vector_quantizes_to_zero(self, spark):
        from holcstore_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            pd.DataFrame({"vec_id": [0], "embedding": [[0.0, 0.0]]})
        )
        row = quantize_embeddings(df).collect()[0]
        assert row["q_scale"] == 0.0 and list(row["q_vec"]) == [0, 0]

    def test_roundtrip_error_bounded_by_half_step(self, spark):
        from holcstore_spark.operators.similarity import quantize_embeddings

        vals = [0.813, -0.204, 0.056, -0.991, 0.5]
        df = spark.createDataFrame(pd.DataFrame({"vec_id": [0], "embedding": [vals]}))
        row = quantize_embeddings(df).collect()[0]
        scale = row["q_scale"]
        for orig, code in zip(vals, row["q_vec"]):
            assert abs(code * scale - orig) <= scale / 2 + 1e-12


class TestUnigramSurprisal:
    def test_bits_exact_crafted(self, spark):
        from holcstore_spark.operators.text import unigram_surprisal

        # corpus: "a a a b" + "b c" -> counts a=3, b=2, c=1; N=6
        # floor_log2: N->2, a->1, b->1, c->0; bits: a=1, b=1, c=2
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": ["a a a b", "b c"]})
        )
        out = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
        assert out[1]["n_tokens"] == 4 and out[1]["sum_bits"] == 4  # 1+1+1+1
        assert out[2]["n_tokens"] == 2 and out[2]["sum_bits"] == 3  # 1+2
        assert out[2]["mean_bits"] == 1.5

    def test_null_and_empty_docs_absent(self, spark):
        from holcstore_spark.operators.text import unigram_surprisal

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "text": ["x y", None, ""]})
        )
        rows = unigram_surprisal(df).collect()
        assert [r["doc_id"] for r in rows] == [1]

    def test_rare_tokens_score_higher(self, spark):
        from holcstore_spark.operators.text import unigram_surprisal

        common = "the " * 63 + "the"
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": [common, "zyzzyva"]})
        )
        out = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
        assert out[2]["mean_bits"] > out[1]["mean_bits"]


class TestBigramCollocations:
    def test_lift_exact_crafted(self, spark):
        from holcstore_spark.operators.text import bigram_collocations

        # "x y" always together (5x), "a b" common words co-occurring
        docs = ["x y a"] * 5 + ["a b"] * 5 + ["b a"] * 5
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        )
        rows = bigram_collocations(df, min_count=5, k=10).collect()
        got = {r["bg"]: r for r in rows}
        # N=35 tokens: x:5 y:5 a:15 b:10
        assert got["x y"]["lift"] == (5 * 35) / (5 * 5)       # 7.0
        assert got["a b"]["lift"] == (5 * 35) / (15 * 10)
        # exclusive pair ranks above the common-word pair
        assert got["x y"]["rank"] < got["a b"]["rank"]

    def test_min_count_filters_rare_pairs(self, spark):
        from holcstore_spark.operators.text import bigram_collocations

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": ["p q", "p q"]})
        )
        assert bigram_collocations(df, min_count=5, k=10).count() == 0
        assert bigram_collocations(df, min_count=2, k=10).count() == 1

    def test_single_token_and_null_docs_yield_nothing(self, spark):
        from holcstore_spark.operators.text import bigram_collocations

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "text": ["solo", None, ""]})
        )
        assert bigram_collocations(df, min_count=1, k=10).count() == 0


class TestNormalizeText:
    def test_canonical_form(self, spark):
        from holcstore_spark.operators.text import normalize_text

        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["  Foo,   BAR!! 42 ", "a-b_c", None],
        }))
        got = {r["doc_id"]: r["text_norm"]
               for r in normalize_text(df).collect()}
        assert got[1] == "foo bar 42"
        assert got[2] == "a b c"
        assert got[3] is None

    def test_keep_digits_false_strips_numbers(self, spark):
        from holcstore_spark.operators.text import normalize_text

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["abc 123 def"]})
        )
        row = normalize_text(df, keep_digits=False).collect()[0]
        assert row["text_norm"] == "abc def"

    def test_normalization_collapses_trivial_variants_for_dedup(self, spark):
        from holcstore_spark.operators.text import normalize_text

        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["Hello,  World!", "hello world"],
        }))
        out = normalize_text(df).select("text_norm").distinct()
        assert out.count() == 1


class TestPrepareCorpus:
    def test_stages_compose(self, spark):
        from holcstore_spark.operators.pipeline import prepare_corpus

        rows = [
            (1, "en", "Hello,  World! " * 30),      # long doc -> many chunks
            (2, "en", "hello world " * 30 + "hello world"),  # not an exact dup after norm? see below
            (3, "en", "Hello,  World! " * 30),      # exact dup of 1 after norm
            (4, "fr", "bonjour le monde"),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang", "text"]))
        out = prepare_corpus(df, chunk_size=50, chunk_stride=40).collect()
        ids = {r["doc_id"] for r in out}
        assert 3 not in ids          # deduped against doc 1 (same normal form)
        assert 4 in ids              # smallest domain kept whole
        for r in out:
            assert r["split"] in ("train", "valid")
            assert 1 <= r["chunk_len"] <= 50

    def test_chunks_carry_domain_without_rejoin(self, spark):
        from holcstore_spark.operators.text import doc_chunks

        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1], "lang": ["en"], "text": ["x" * 100]}))
        rows = doc_chunks(df, size=40, stride=30, keep=("lang",)).collect()
        assert all(r["lang"] == "en" for r in rows) and len(rows) == 4


class TestPgmDecode:
    def test_decode_strict_pgm_replicates_gray_to_rgb(self, spark):
        from holcstore_spark.operators.multimodal import decode_strict

        w, h = 3, 2
        gray = bytes([0, 128, 255, 10, 20, 30])
        payload = f"P5\n# cmt\n{w} {h}\n255\n".encode() + gray
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [bytearray(payload)]})
        )
        row = decode_strict(df).collect()[0]
        assert (row["codec"], row["width"], row["height"]) == ("pgm", 3, 2)
        expect = sum(gray) / len(gray)
        assert row["mean_r"] == expect == row["mean_g"] == row["mean_b"]

    def test_truncated_pgm_rejected(self, spark):
        from holcstore_spark.operators.multimodal import _parse_pgm

        with pytest.raises(ValueError):
            _parse_pgm(b"P5\n3 2\n255\n\x00\x01")


class TestProductQuantization:
    def test_codes_and_exact_reconstruction_error(self, spark):
        from holcstore_spark.operators.similarity import pq_encode

        # 4 vectors in 8 dims, m=2 subspaces of 4; with n_centroids=2 and
        # seeds = two lowest ids, identical vectors share codes
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]),  # == vec 0
            (3, [0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),  # == vec 1
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        out = {r["vec_id"]: r for r in
               pq_encode(df, m=2, n_centroids=2, dim=8).collect()}
        assert list(out[0]["pq_code"]) == list(out[2]["pq_code"])
        assert list(out[1]["pq_code"]) == list(out[3]["pq_code"])
        assert list(out[0]["pq_code"]) != list(out[1]["pq_code"])
        # codebook contains the two distinct points exactly -> zero error
        assert all(out[i]["recon_err_q"] == 0 for i in out)

    def test_distortion_positive_for_out_of_codebook_vector(self, spark):
        from holcstore_spark.operators.similarity import pq_encode

        rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.4, 0.4])]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        out = {r["vec_id"]: r for r in
               pq_encode(df, m=1, n_centroids=2, iters=1, dim=2).collect()}
        # centroid update: cluster {0,2} mean -> (200,200); vec 2 (400,400)
        # has exact err (400-200)^2*2 = 80000
        assert out[2]["recon_err_q"] == 80000
        assert out[1]["recon_err_q"] == 0

    def test_rejects_indivisible_dim(self, spark):
        from holcstore_spark.operators.similarity import pq_encode

        df = spark.createDataFrame(pd.DataFrame({"vec_id": [0], "embedding": [[1.0, 2.0, 3.0]]}))
        with pytest.raises(ValueError):
            pq_encode(df, m=2, dim=3)


class TestPqTopk:
    def test_adc_finds_exact_match_first(self, spark):
        from holcstore_spark.operators.similarity import pq_topk

        # candidates include an exact copy of the query: the copy shares
        # the query's codes, so its ADC equals the query's own
        # reconstruction distance - the minimum possible - and ranks first
        rows = [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(20)]
        rows.append((100, rows[3][1]))            # copy of vec 3
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        q = df.filter("vec_id = 100")
        out = pq_topk(df, q, k=3, m=2, n_centroids=4, dim=8).collect()
        assert out[0]["q_id"] == 100
        ranked = sorted(out, key=lambda r: (r["adc_dist_q"], r["neighbor_id"]))
        assert ranked[0]["neighbor_id"] == 3
        assert ranked[0]["adc_dist_q"] == min(r["adc_dist_q"] for r in out)

    def test_k_rows_per_query_and_no_self(self, spark):
        from holcstore_spark.operators.similarity import pq_topk

        rows = [(i, [float(i % 3), float(i % 5)]) for i in range(12)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        q = df.filter("vec_id < 2")
        out = pq_topk(df, q, k=4, m=1, n_centroids=3, dim=2).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["q_id"], []).append(r["neighbor_id"])
            assert r["neighbor_id"] != r["q_id"]
        assert all(len(v) == 4 for v in per_q.values()) and len(per_q) == 2


class TestBpeLearnMerges:
    def test_matches_sequential_reference(self, spark):
        from holcstore_spark.operators.text import bpe_learn_merges

        docs = ["a b a b c", "a b c d", "c d c d"]
        df = spark.createDataFrame(pd.DataFrame({"text": docs}))
        got = [(r["merge_idx"], r["pair"], r["count"])
               for r in bpe_learn_merges(df, n_merges=3).collect()]

        # sequential reference implementation
        def ref(corpus, n):
            out = []
            cur = list(corpus)
            for i in range(n):
                counts = {}
                for s in cur:
                    tk = s.split(" ")
                    for a, b in zip(tk, tk[1:]):
                        counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + 1
                if not counts:
                    break
                pair = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                out.append((i, pair[0], pair[1]))
                cur = [
                    (" " + s + " ").replace(
                        f" {pair[0]} ", " " + pair[0].replace(" ", "") + " "
                    ).strip()
                    for s in cur
                ]
            return out

        assert got == ref(docs, 3)
        # first merge: "a b" (3 occurrences) beats "c d" (3)? counts:
        # a b:3, b a:1, b c:2, c d:3, d c:1 -> tie a b / c d -> "a b" asc
        assert got[0][1] == "a b" and got[0][2] == 3

    def test_merged_token_participates_in_later_pairs(self, spark):
        from holcstore_spark.operators.text import bpe_learn_merges

        df = spark.createDataFrame(pd.DataFrame({"text": ["x y z"] * 5}))
        got = bpe_learn_merges(df, n_merges=2).collect()
        assert (got[0]["pair"], got[0]["count"]) == ("x y", 5)
        # after merging "x y" -> "xy", the next best pair is ("xy", "z")
        assert (got[1]["pair"], got[1]["count"]) == ("xy z", 5)


class TestBpeApply:
    def test_apply_replays_training(self, spark):
        from holcstore_spark.operators.text import bpe_apply, bpe_learn_merges

        docs = ["a b a b c", "a b c d", "c d c d"]
        df = spark.createDataFrame(pd.DataFrame({"text": docs}))
        merges = [r["pair"] for r in bpe_learn_merges(df, n_merges=2).collect()]
        got = [r["text_bpe"] for r in bpe_apply(df, merges).collect()]
        # apply must REPLAY training exactly: recompute the corpus state
        # by the same sequential replaces
        cur = list(docs)
        for pair in merges:
            cur = [(" " + t + " ").replace(
                f" {pair} ", " " + pair.replace(" ", "") + " ").strip()
                for t in cur]
        assert got == cur
        # applying zero merges is identity
        same = [r["text_bpe"] for r in bpe_apply(df, []).collect()]
        assert same == docs

    def test_merge_chain_order_matters(self, spark):
        from holcstore_spark.operators.text import bpe_apply

        df = spark.createDataFrame(pd.DataFrame({"text": ["x y z"]}))
        chained = bpe_apply(df, ["x y", "xy z"]).collect()[0]["text_bpe"]
        assert chained == "xyz"


class TestSemanticDedup:
    """SemDeDup shape: k-means partition, within-cluster cosine pairs,
    keep-the-lowest-id rule."""

    def test_pairs_only_within_clusters_and_keep_rule(self, vectors):
        from holcstore_spark.operators.similarity import (
            semantic_dedup,
            semantic_dedup_pairs,
        )

        pairs = semantic_dedup_pairs(
            vectors, n_clusters=2, threshold=0.95, iters=2
        ).collect()
        got = {(r["id_a"], r["id_b"]): r["score"] for r in pairs}
        assert all(a < b for a, b in got)
        # near-identical directions pair; orthogonal/opposite never do
        assert all(s >= 0.95 for s in got.values())
        assert (0, 2) not in got and (0, 3) not in got
        kept = semantic_dedup(
            vectors, n_clusters=2, threshold=0.95, iters=2
        ).collect()
        kept_ids = {r["vec_id"] for r in kept}
        dropped = {0, 1, 2, 3, 4} - kept_ids
        # the keep rule: dropped iff a LOWER-id near-dup exists
        assert dropped == {b for _, b in got}
        for _, b in got:
            assert b not in kept_ids
        # clusters ride through for downstream balanced sampling
        assert all(isinstance(r["cluster"], int) for r in kept)

    def test_exact_duplicates_collapse_to_lowest_id(self, spark):
        from holcstore_spark.operators.similarity import semantic_dedup

        rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(4)] + [
            (10, [0.0, 0.0, 0.0, 1.0]),
        ]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        kept = {r["vec_id"]
                for r in semantic_dedup(d, n_clusters=2, threshold=0.999,
                                        iters=1).collect()}
        assert kept == {0, 10}

    def test_deterministic_across_runs(self, vectors):
        from holcstore_spark.operators.similarity import semantic_dedup

        a = sorted((r["vec_id"], r["cluster"]) for r in semantic_dedup(
            vectors, n_clusters=2, threshold=0.5, iters=2).collect())
        b = sorted((r["vec_id"], r["cluster"]) for r in semantic_dedup(
            vectors, n_clusters=2, threshold=0.5, iters=2).collect())
        assert a == b

    def test_max_cluster_drops_megacluster(self, vectors):
        from holcstore_spark.operators.similarity import semantic_dedup_pairs

        # with ONE cluster everything lands together; max_cluster=2
        # drops it (safety valve) -> zero pairs, loudly bounded work
        pairs = semantic_dedup_pairs(
            vectors, n_clusters=1, threshold=0.0, iters=1, max_cluster=2
        )
        assert pairs.count() == 0

    def test_cross_cluster_pairs_never_scored(self, vectors):
        # pin the cluster SCOPING itself: at threshold -1 every scored
        # pair passes, so the pair set must be EXACTLY the within-cluster
        # id pairs — any cross-cluster pair appearing means the partition
        # was ignored (review r10: the earlier assertions also held for
        # a global scorer)
        from holcstore_spark.operators.similarity import (
            semantic_dedup,
            semantic_dedup_pairs,
        )

        clusters = {r["vec_id"]: r["cluster"] for r in semantic_dedup(
            vectors, n_clusters=2, threshold=1.01, iters=2).collect()}
        assert len(set(clusters.values())) == 2  # the fixture does split
        got = {(r["id_a"], r["id_b"]) for r in semantic_dedup_pairs(
            vectors, n_clusters=2, threshold=-1.0, iters=2).collect()}
        want = {
            (a, b)
            for a in clusters for b in clusters
            if a < b and clusters[a] == clusters[b]
        }
        assert got == want

    def test_tiny_corpus_smaller_than_n_clusters(self, spark):
        # review r10: the trainer used to KeyError when the corpus has
        # fewer rows than n_lists (defaults on a 3-doc corpus)
        from holcstore_spark.operators.similarity import semantic_dedup

        rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        kept = {r["vec_id"] for r in semantic_dedup(
            d, n_clusters=16, threshold=0.999, iters=2).collect()}
        assert kept == {0, 2}  # the exact duplicate 1 dropped

    def test_max_cluster_keeps_megacluster_whole(self, vectors):
        # the documented valve behavior: an over-sized cluster skips
        # NEAR-dup scoring — all members kept when none are exact
        # duplicates (the fixture has five distinct vectors)
        from holcstore_spark.operators.similarity import semantic_dedup

        kept = {r["vec_id"] for r in semantic_dedup(
            vectors, n_clusters=1, threshold=0.0, iters=1,
            max_cluster=2).collect()}
        assert kept == {0, 1, 2, 3, 4}

    def test_max_cluster_still_drops_exact_duplicates(self, spark):
        # VERDICT r10 "what's wrong #2": an over-valve cluster must NOT
        # smuggle bit-identical embeddings through — exact quantized
        # duplicates collapse to their minimum id even when the valve
        # skips the quadratic near-dup matmul
        from holcstore_spark.operators.similarity import semantic_dedup

        rows = (
            [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(4)]     # 4 exact copies
            + [(10, [1.0, 2.0, 3.0, 4.001])]                  # near-dup only
            + [(20, [2.0, 2.0, 3.0, 4.0]), (21, [2.0, 2.0, 3.0, 4.0])]
        )
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        kept = {r["vec_id"] for r in semantic_dedup(
            d, n_clusters=1, threshold=0.99, iters=1, max_cluster=3
        ).collect()}
        # exact groups {0,1,2,3} -> 0 and {20,21} -> 20; the mere
        # NEAR-duplicate 10 survives (valve skipped the matmul)
        assert kept == {0, 10, 20}
        # un-valved, the near-dup 10 is also dropped — the valve only
        # relaxes near-dup scoring, never exact-dup collapsing
        kept_full = {r["vec_id"] for r in semantic_dedup(
            d, n_clusters=1, threshold=0.99, iters=1
        ).collect()}
        assert kept_full == {0, 20}

    def test_recluster_depth_scores_neardups_in_megacluster(self, spark):
        # recluster_depth > 0: an over-valve cluster re-clusters locally
        # and near-dups are caught INSIDE sub-clusters — depth 0 (the
        # default valve) keeps them
        from holcstore_spark.operators.similarity import semantic_dedup

        # two tight direction groups, 6 members each, inside ONE
        # over-valve k-means cluster (n_clusters=1)
        rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(6)]
        rows += [(100 + i, [0.0, 0.0, 1.0, 0.001 * i]) for i in range(6)]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        kw = dict(n_clusters=1, threshold=0.999, iters=1, max_cluster=4)
        kept0 = {r["vec_id"] for r in semantic_dedup(d, **kw).collect()}
        assert kept0 == {*range(6), *range(100, 106)}  # valve: no exact dups
        kept1 = {r["vec_id"]
                 for r in semantic_dedup(d, recluster_depth=2,
                                         **kw).collect()}
        # level 1 bisects the two direction groups; level 2 bisects each
        # group at its midpoint — the four under-valve halves then run
        # the FULL near-dup scorer, keeping only each half's min id
        # (boundary survivors 3/103 are the documented approximation;
        # the un-valved exact answer would be {0, 100})
        assert kept1 == {0, 3, 100, 103}
        # 12 → 4: the mega-cluster near-dups ARE scored now
        assert len(kept1) < len(kept0)

    def test_recluster_no_progress_falls_back_to_exact_collapse(
        self, spark
    ):
        # all rows identical: k-means cannot split (one sub-cluster) —
        # the recursion must fall back to the exact-dup collapse, not
        # loop or keep everything
        from holcstore_spark.operators.similarity import semantic_dedup

        rows = [(i, [1.0, 2.0, 0.0, 0.0]) for i in range(8)]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        kept = {r["vec_id"] for r in semantic_dedup(
            d, n_clusters=1, threshold=0.9, iters=1, max_cluster=4,
            recluster_depth=3).collect()}
        assert kept == {0}

    def test_np_bisect_separates_groups_and_detects_degeneracy(self):
        import numpy as np

        from holcstore_spark.operators.similarity import _np_bisect_labels

        # two tight direction groups: the farthest-point seeds land one
        # per group, so the split follows the real boundary
        A = np.array(
            [[1000, i, 0, 0] for i in range(5)]
            + [[0, 0, 1000, i] for i in range(5)], dtype=np.int64,
        )
        labels = _np_bisect_labels(A)
        assert set(labels[:5]) == {0} and set(labels[5:]) == {1}
        # identical rows: no progress — None, never a fake split
        assert _np_bisect_labels(np.ones((6, 4), dtype=np.int64)) is None
        # deterministic: same input, same labels
        assert (labels == _np_bisect_labels(A)).all()

    def test_shared_centroids_skip_retraining(self, vectors, monkeypatch):
        # pipeline shape: semantic_dedup then cluster_balanced_sample
        # retrain the SAME k-means — `centroids=` shares one training
        # pass across ops with bit-identical results
        import holcstore_spark.operators.similarity as sim

        cents = sim.train_ivf_centroids(vectors, n_lists=2, iters=2)
        base_keep = sorted((r["vec_id"], r["cluster"]) for r in
                           sim.semantic_dedup(vectors, n_clusters=2,
                                              threshold=0.5,
                                              iters=2).collect())
        base_samp = sorted(r["vec_id"] for r in
                           sim.cluster_balanced_sample(
                               vectors, n_clusters=2, iters=2).collect())

        def boom(*a, **kw):
            raise AssertionError("trainer must not run with centroids=")

        monkeypatch.setattr(sim, "train_ivf_centroids", boom)
        got_keep = sorted((r["vec_id"], r["cluster"]) for r in
                          sim.semantic_dedup(vectors, n_clusters=2,
                                             threshold=0.5, iters=2,
                                             centroids=cents).collect())
        got_samp = sorted(r["vec_id"] for r in
                          sim.cluster_balanced_sample(
                              vectors, n_clusters=2, iters=2,
                              centroids=cents).collect())
        got_pairs = sim.semantic_dedup_pairs(
            vectors, n_clusters=2, threshold=0.5, iters=2,
            centroids=cents).count()
        assert got_keep == base_keep
        assert got_samp == base_samp
        assert got_pairs >= 0  # ran without the trainer

    def test_max_cluster_exact_dup_zero_vector_and_threshold_edges(
        self, spark
    ):
        # parity with the un-valved scorer at the edges: zero vectors
        # score NaN (kept, even when bit-identical), and a threshold
        # above 1.0 drops nothing — including exact duplicates
        from holcstore_spark.operators.similarity import semantic_dedup

        rows = [
            (0, [0.0, 0.0]), (1, [0.0, 0.0]),     # identical ZERO vectors
            (2, [1.0, 0.0]), (3, [1.0, 0.0]),     # identical nonzero
        ]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        kept = {r["vec_id"] for r in semantic_dedup(
            d, n_clusters=1, threshold=0.9, iters=1, max_cluster=2
        ).collect()}
        assert kept == {0, 1, 2}  # zero vectors exempt, 3 collapsed
        kept_hi = {r["vec_id"] for r in semantic_dedup(
            d, n_clusters=1, threshold=1.01, iters=1, max_cluster=2
        ).collect()}
        assert kept_hi == {0, 1, 2, 3}  # threshold > 1: nothing drops


class TestClusterBalancedSample:
    def test_smallest_cluster_kept_whole_heads_tamed(self, spark):
        from math import isqrt

        from holcstore_spark.operators.similarity import (
            cluster_balanced_sample,
        )

        # two clear direction groups, sizes 12 vs 3
        rows = [(i, [1.0 + (i % 5) * 0.001, 0.0]) for i in range(12)]
        rows += [(100 + i, [0.0, 1.0 + i * 0.001]) for i in range(3)]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        kept = cluster_balanced_sample(d, n_clusters=2, iters=2).collect()
        by_cluster: dict[int, int] = {}
        for r in kept:
            by_cluster[r["cluster"]] = by_cluster.get(r["cluster"], 0) + 1
        sizes = sorted(by_cluster.values())
        # the small cluster (n_min=3) is kept whole; the head keeps
        # ~sqrt(3*12)=6 by hash (exact count is hash-dependent but must
        # be strictly below 12 and at least 1)
        assert sizes[0] == 3
        assert 1 <= sizes[1] < 12
        # and deterministic across runs
        again = cluster_balanced_sample(d, n_clusters=2, iters=2).collect()
        assert sorted((r["vec_id"], r["cluster"]) for r in kept) == \
            sorted((r["vec_id"], r["cluster"]) for r in again)
        assert isqrt(3 * 12) == 6  # the target the hash filter approximates


class TestMinResultsContract:
    """The loud half of the round-13 selectivity guard on the raw
    per-call operators (the managed index escalates instead)."""

    def test_ivf_min_results_raises_on_selective_filter(self, vectors):
        from holcstore_spark.operators.similarity import ivf_topk

        q = vectors.filter(F.col("vec_id") == 0)
        # pool of <=2 after self-exclusion can never satisfy k=3
        with pytest.raises(ValueError, match="min_results"):
            ivf_topk(vectors, q, k=3, n_lists=2, n_probe=2, iters=1,
                     filters=F.col("vec_id") < 2, min_results=3)

    def test_ivf_min_results_passes_when_satisfied(self, vectors):
        from holcstore_spark.operators.similarity import ivf_topk

        q = vectors.filter(F.col("vec_id") == 0)
        out = ivf_topk(vectors, q, k=3, n_lists=2, n_probe=2, iters=1,
                       min_results=3)
        assert out.count() == 3

    def test_lsh_min_results_raises_on_selective_filter(self, vectors):
        from holcstore_spark.operators.similarity import lsh_topk

        q = vectors.filter(F.col("vec_id") == 0)
        with pytest.raises(ValueError, match="min_results"):
            lsh_topk(vectors, q, k=3, n_planes=2, dim=4,
                     filters=F.col("vec_id") < 2, min_results=3)

    def test_numpy_centroids_accepted(self, vectors):
        # review r13: np.int64 components / ndarray rows are legitimate
        # trained centroids and must pass validation
        import numpy as np

        from holcstore_spark.operators.similarity import (
            ivf_topk,
            train_ivf_centroids,
        )

        q = vectors.filter(F.col("vec_id") == 0)
        cents = train_ivf_centroids(vectors, n_lists=2, iters=1, dim=4)
        np_cents = list(np.asarray(cents, dtype=np.int64))
        out = ivf_topk(vectors, q, k=4, n_probe=2, centroids=np_cents)
        base = ivf_topk(vectors, q, k=4, n_probe=2, centroids=cents)
        assert sorted(map(tuple, out.collect())) == \
            sorted(map(tuple, base.collect()))


class TestDuplicateSpans:
    """Exact-substring (duplicate-span) dedup — Lee et al. 2022 shape."""

    @pytest.fixture()
    def span_docs(self, spark):
        rows = [
            (1, "a b c d e f g h i j"),               # the original
            (2, "x a b c d e f g h i j y"),           # embeds doc 1's span
            (3, "short doc"),                          # < k tokens: no grams
            (4, "a b c d e f g h a b c d e f g h"),   # self-repeat + doc-1 gram
            (5, "unique words only here nothing shared at all ok fine"),
        ]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        )

    def test_stats_keep_first_and_self_repeats(self, span_docs):
        from holcstore_spark.operators.dedup import duplicate_span_stats

        out = {r["doc_id"]: r for r in duplicate_span_stats(span_docs, k=8).collect()}
        assert len(out) == 5
        # doc 1 is the globally-first occurrence: nothing removed
        assert out[1]["dup_tokens"] == 0 and out[1]["kept_tokens"] == 10
        # doc 2's embedded copy of the 10-token region is fully removed
        assert out[2]["dup_tokens"] == 10 and out[2]["kept_tokens"] == 2
        # doc 3 is shorter than k: no grams, nothing to remove
        assert out[3]["dup_tokens"] == 0 and out[3]["n_tokens"] == 2
        # doc 4: its 'a..h' grams lose to doc 1 AND its second half
        # repeats its first — everything goes
        assert out[4]["dup_tokens"] == 16 and out[4]["kept_tokens"] == 0
        assert out[5]["dup_tokens"] == 0

    def test_strip_matches_stats_kept_counts(self, span_docs):
        from holcstore_spark.operators.dedup import (
            duplicate_span_stats,
            strip_duplicate_spans,
        )

        stats = {r["doc_id"]: r["kept_tokens"]
                 for r in duplicate_span_stats(span_docs, k=8).collect()}
        stripped = {r["doc_id"]: r
                    for r in strip_duplicate_spans(span_docs, k=8).collect()}
        assert set(stripped) == set(stats)
        for doc_id, kept in stats.items():
            assert stripped[doc_id]["kept_tokens"] == kept
            txt = stripped[doc_id]["text_clean"]
            n = len([t for t in txt.split(" ") if t != ""]) if txt else 0
            assert n == kept
        # survivors keep original order
        assert stripped[2]["text_clean"] == "x y"

    def test_non_numeric_id_refused(self, spark):
        from holcstore_spark.operators.dedup import duplicate_span_stats

        d = spark.createDataFrame(
            pd.DataFrame([("a", "x y z")], columns=["doc_id", "text"])
        )
        with pytest.raises(TypeError, match="INTEGRAL id"):
            duplicate_span_stats(d, k=2)


class TestKnnGraph:
    def test_exact_mode_matches_bruteforce_per_source(self, vectors):
        from holcstore_spark.operators.similarity import knn_graph

        out = knn_graph(vectors, k=2, exact=True).collect()
        per_src = {}
        for r in out:
            per_src.setdefault(r["src_id"], []).append(r["neighbor_id"])
        # every vector gets neighbours, never itself
        assert set(per_src) == {0, 1, 2, 3, 4}
        for src, nbrs in per_src.items():
            assert src not in nbrs and len(nbrs) == 2
        bf = brute_force_topk(
            vectors, vectors.filter(F.col("vec_id") == 0), k=2
        ).collect()
        assert sorted(n["neighbor_id"] for n in bf) == sorted(per_src[0])

    def test_blocked_exhaustive_probe_equals_exact(self, vectors):
        from holcstore_spark.operators.similarity import knn_graph

        exact = sorted(map(tuple, knn_graph(vectors, k=2, exact=True).collect()))
        # probing every list == exhaustive search
        blocked = sorted(map(tuple, knn_graph(
            vectors, k=2, n_lists=2, n_probe=2, iters=1
        ).collect()))
        assert blocked == exact

    def test_candidate_filters_restrict_neighbors_only(self, vectors):
        from holcstore_spark.operators.similarity import knn_graph

        out = knn_graph(
            vectors, k=2, n_lists=2, n_probe=2, iters=1,
            filters=F.col("vec_id") != 1,
        ).collect()
        assert all(r["neighbor_id"] != 1 for r in out)
        # vec 1 is still a SOURCE (filters restrict candidates only)
        assert any(r["src_id"] == 1 for r in out)


class TestDsirBits:
    def test_target_domain_scores_higher(self, spark):
        from holcstore_spark.operators.text import dsir_bits

        rows = [
            (1, "alpha beta gamma alpha beta", "t"),
            (2, "alpha beta gamma beta alpha", "t"),
            (3, "delta epsilon zeta eta theta", "c"),
            (4, "delta zeta eta theta epsilon", "c"),
        ]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text", "dom"])
        )
        out = {r["doc_id"]: r for r in dsir_bits(d, F.col("dom") == "t").collect()}
        # target-vocab docs outscore the off-target docs
        assert out[1]["dsir_bits"] > out[3]["dsir_bits"]
        assert out[2]["dsir_bits"] > out[4]["dsir_bits"]
        assert out[1]["n_tokens"] == 5
        assert out[1]["mean_bits"] == pytest.approx(out[1]["dsir_bits"] / 5)

    def test_empty_target_defined_everywhere(self, spark):
        from holcstore_spark.operators.text import dsir_bits

        rows = [(1, "a b c", "x"), (2, "d e f", "x")]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text", "dom"])
        )
        # no rows match the target: add-one smoothing keeps every score
        # finite and the op total (no crash, all docs present)
        out = dsir_bits(d, F.col("dom") == "nope").collect()
        assert {r["doc_id"] for r in out} == {1, 2}

    def test_product_overflow_guard_fires_loudly(self, spark):
        # the guard itself is testable at any magnitude: two counts
        # whose product crosses 2^62 must raise, not wrap (r13 advice:
        # 1e12-token corpora push (ct+1)·(Nc+V) past 2^63 silently)
        from holcstore_spark.operators.text import _checked_product

        d = spark.range(1).select(
            F.lit(1 << 40).cast("long").alias("a"),
            F.lit(1 << 40).cast("long").alias("b"),
            F.lit(3).cast("long").alias("c"),
        )
        ok = d.select(
            _checked_product(F.col("a"), F.col("c"), "boom").alias("p")
        ).collect()
        assert ok[0]["p"] == 3 << 40
        with pytest.raises(Exception, match="wrap BIGINT"):
            d.select(
                _checked_product(
                    F.col("a"), F.col("b"),
                    "dsir_bits: count product nears 2^63 and would wrap "
                    "BIGINT",
                ).alias("p")
            ).collect()


class TestSpanDedupReviewFindings:
    """Round-13 review pass: edge inputs the first cut got wrong."""

    def test_null_text_counts_zero_tokens(self, spark):
        from holcstore_spark.operators.dedup import (
            duplicate_span_stats,
            strip_duplicate_spans,
        )

        d = spark.createDataFrame(
            [(1, "a b c"), (2, None)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in duplicate_span_stats(d, k=2).collect()}
        # F.size(split(NULL)) is -1 under non-ANSI; the op must say 0
        assert out[2]["n_tokens"] == 0 and out[2]["kept_tokens"] == 0
        stripped = {r["doc_id"]: r for r in strip_duplicate_spans(d, k=2).collect()}
        assert stripped[2]["text_clean"] == "" and stripped[2]["kept_tokens"] == 0

    def test_column_text_and_custom_sep(self, spark):
        from holcstore_spark.operators.dedup import duplicate_span_stats

        # sep='|' is a regex metachar: an unescaped split would shatter
        # every character; Column-valued text must also be accepted
        d = spark.createDataFrame(
            [(1, "A|B|C|D"), (2, "x|a|b|c|d|y")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in duplicate_span_stats(
                d, text=F.lower(F.col("text")), k=4, sep="|"
            ).collect()
        }
        assert out[1]["n_tokens"] == 4 and out[1]["dup_tokens"] == 0
        # doc 2 embeds doc 1's lowercase 4-gram
        assert out[2]["n_tokens"] == 6 and out[2]["dup_tokens"] == 4

    def test_oversized_id_refused_loudly(self, spark):
        from holcstore_spark.operators.dedup import duplicate_span_stats

        d = spark.createDataFrame(
            [(1 << 50, "a b c")], "doc_id long, text string"
        )
        with pytest.raises(Exception, match="duplicate-span dedup"):
            duplicate_span_stats(d, k=2).collect()

    def test_fractional_id_type_refused(self, spark):
        from holcstore_spark.operators.dedup import duplicate_span_stats

        d = spark.createDataFrame(
            [(1.5, "a b c")], "doc_id double, text string"
        )
        with pytest.raises(TypeError, match="INTEGRAL id"):
            duplicate_span_stats(d, k=2)


class TestBm25:
    @pytest.fixture()
    def corpus(self, spark):
        rows = [
            (1, "spark shuffle join join join"),       # tf(join)=3, short
            (2, "spark " * 20 + "join"),                # tf(join)=1, long
            (3, "spark scan filter pushdown prune"),    # no query term hit
            (4, "join once here and nothing else"),     # tf(join)=1, short
        ]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        )

    def test_tf_saturation_and_length_norm(self, corpus):
        from holcstore_spark.operators.text import bm25_topk

        out = bm25_topk(corpus, ["join"], k=10).collect()
        got = {r["doc_id"]: r for r in out}
        # doc 3 matches nothing: absent
        assert 3 not in got and set(got) == {1, 2, 4}
        # higher tf wins; equal tf → shorter doc wins (length norm)
        assert got[1]["score_micro"] > got[4]["score_micro"]
        assert got[4]["score_micro"] > got[2]["score_micro"]
        assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
        assert got[1]["score"] == pytest.approx(got[1]["score_micro"] / 1e6)

    def test_multi_term_sums_and_n_terms(self, corpus):
        from holcstore_spark.operators.text import bm25_topk

        both = {r["doc_id"]: r for r in
                bm25_topk(corpus, ["join", "scan"], k=10).collect()}
        only_j = {r["doc_id"]: r for r in
                  bm25_topk(corpus, ["join"], k=10).collect()}
        # doc 3 now matches via 'scan'
        assert both[3]["n_terms"] == 1
        # integer micro-unit sums: the join-term contribution may shift
        # with N/df unchanged here (same corpus), so doc 1's two-query
        # score >= its single-term score
        assert both[1]["score_micro"] >= only_j[1]["score_micro"]
        assert both[1]["n_terms"] == 1  # doc 1 has no 'scan'

    def test_k_cut_and_empty_query_refused(self, corpus):
        from holcstore_spark.operators.text import bm25_topk

        top1 = bm25_topk(corpus, ["join"], k=1).collect()
        assert len(top1) == 1 and top1[0]["doc_id"] == 1
        with pytest.raises(ValueError, match="at least one query term"):
            bm25_topk(corpus, [])


class TestGopherRules:
    def test_each_rule_fires_on_its_own_pathology(self, spark):
        from holcstore_spark.operators.text import gopher_rules

        good = ("the quick brown fox likes to be of and that have "
                "with plenty " * 6).strip()          # 66 words, natural
        rows = [
            (1, good),
            (2, "short doc"),                         # word count
            (3, " ".join(["a"] * 60)),                # mean len < 3
            (4, good + " " + "#" * 40),               # symbol ratio
            (5, "\n".join(["- bullet line"] * 10)),   # bullets (+count)
            (6, "\n".join([good] + ["trailing..."] * 9)),  # ellipses
            (7, " ".join(["123"] * 60)),              # alpha words
            (8, ("zork gronk blorp fleem quux " * 12).strip()),  # stops
            (9, None),                                # NULL text
            (10, "\n".join([good] + ["trailing…"] * 9)),  # U+2026
            (11, good + " " + "…" * 12),              # U+2026 symbols
        ]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
                {"text": "object"})
        )
        out = {r["doc_id"]: r for r in gopher_rules(d).collect()}
        assert out[1]["gopher_pass"] is True
        assert out[2]["rule_word_count"] is False
        assert out[3]["rule_mean_word_len"] is False
        assert out[4]["rule_symbol_ratio"] is False
        assert out[5]["rule_bullet_lines"] is False
        assert out[6]["rule_ellipsis_lines"] is False
        assert out[7]["rule_alpha_words"] is False
        assert out[8]["rule_stopwords"] is False
        # NULL coalesces to '': fails word count, never crashes
        assert out[9]["rule_word_count"] is False
        assert out[9]["gopher_pass"] is False
        # the one-char Unicode ellipsis counts like '...' (advisor r14)
        assert out[10]["rule_ellipsis_lines"] is False
        assert out[11]["rule_symbol_ratio"] is False
        # every pathological doc fails overall
        assert all(not out[i]["gopher_pass"] for i in range(2, 12))

    def test_metrics_are_sane(self, spark):
        from holcstore_spark.operators.text import gopher_rules

        d = spark.createDataFrame(
            pd.DataFrame([(1, "alpha beta gamma")],
                         columns=["doc_id", "text"])
        )
        r = gopher_rules(d).collect()[0]
        assert r["n_words"] == 3
        assert r["mean_word_len"] == pytest.approx(14 / 3)
        assert r["alpha_word_frac"] == 1.0
        assert r["gopher_stop_hits"] == 0


class TestC4Rules:
    def test_line_filter_and_page_rules(self, spark):
        from holcstore_spark.operators.text import c4_rules

        rows = [
            (1, "this line has five words.\nshort one.\n"
                "no terminal punctuation here at all\n"
                "another good sentence right here!\n"
                "and one more question to ask?"),
            (2, "contains lorem ipsum dolor sit amet today fine.\n"
                "second sentence is here now.\n"
                "third sentence also right here."),
            (3, "function() { return 1; } is code here.\n"
                "more prose sentences follow this line.\n"
                "and a third full sentence too."),
            (4, "only two full sentences are here.\n"
                "so the page must be dropped now."),
            (5, None),
        ]
        d = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
                {"text": "object"})
        )
        out = {r["doc_id"]: r for r in c4_rules(d).collect()}
        # doc 1: 5 lines; 'short one.' (<5 words) and the
        # unterminated line drop; 3 kept lines, 3 sentences -> keep
        assert out[1]["n_lines"] == 5 and out[1]["n_lines_kept"] == 3
        assert out[1]["n_sentences"] == 3 and out[1]["c4_keep"] is True
        assert "short one." not in out[1]["text_c4"]
        assert "no terminal punctuation" not in out[1]["text_c4"]
        # lorem ipsum / brace pages rejected despite enough sentences
        assert out[2]["has_lorem_ipsum"] is True
        assert out[2]["c4_keep"] is False
        assert out[3]["has_brace"] is True and out[3]["c4_keep"] is False
        # < 3 sentences rejected
        assert out[4]["n_sentences"] == 2 and out[4]["c4_keep"] is False
        # NULL text: empty everything, rejected, no crash
        assert out[5]["text_c4"] == "" and out[5]["c4_keep"] is False


class TestRrfFuse:
    def _rank(self, spark, pairs):
        return spark.createDataFrame(
            pd.DataFrame(pairs, columns=["doc_id", "rank"])
        )

    def test_fusion_rewards_presence_in_both(self, spark):
        from holcstore_spark.operators.similarity import rrf_fuse

        a = self._rank(spark, [(1, 1), (2, 2), (3, 3)])
        b = self._rank(spark, [(2, 1), (4, 2)])
        out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10).collect()}
        # doc 2 appears in both lists: highest fused score
        assert min(out, key=lambda d: out[d]["fused_rank"]) == 2
        assert out[2]["n_lists"] == 2 and out[1]["n_lists"] == 1
        assert out[2]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
        # single-list docs contribute only their own term
        assert out[4]["rrf_score"] == pytest.approx(1 / 62)

    def test_ties_break_by_id_and_k_cuts(self, spark):
        from holcstore_spark.operators.similarity import rrf_fuse

        a = self._rank(spark, [(7, 1), (5, 1)])  # impossible real ranks,
        # but exercises the tie: equal contributions → lower id first
        out = rrf_fuse([a], k=1).collect()
        assert len(out) == 1 and out[0]["doc_id"] == 5
        assert out[0]["fused_rank"] == 1

    def test_arg_validation(self, spark):
        from holcstore_spark.operators.similarity import rrf_fuse

        with pytest.raises(ValueError, match="at least one ranking"):
            rrf_fuse([])

    def test_duplicate_id_within_one_list_counts_once_at_best_rank(
        self, spark
    ):
        # r13 advice: sharded retrieval backends emit duplicate ids; a
        # duplicate must not fan out through the full-outer joins
        # (duplicated output rows, double-counted contribution)
        from holcstore_spark.operators.similarity import rrf_fuse

        a = self._rank(spark, [(1, 1), (2, 2), (2, 5)])  # dup id 2
        b = self._rank(spark, [(2, 1)])
        out = rrf_fuse([a, b], k=10).collect()
        ids = [r["doc_id"] for r in out]
        assert sorted(ids) == [1, 2]  # no duplicate output rows
        got = {r["doc_id"]: r for r in out}
        # id 2 counts once in list a, at its best rank (2), plus list b
        assert got[2]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
        assert got[2]["n_lists"] == 2


class TestIncrementalSpanDedup:
    def test_matches_one_shot_when_history_precedes_batch(self, spark):
        # with every history id below every batch id, the one-shot
        # keep-first rule over history ∪ batch restricted to the batch
        # equals the incremental verdict against the gram index — the
        # correctness contract of the production shape
        from holcstore_spark.operators.dedup import (
            duplicate_span_stats,
            duplicate_span_stats_incremental,
            span_gram_index,
        )

        rows = [
            (1, "a b c d e f g h i j"),
            (2, "p q r s t u v w x y"),
            (10, "x a b c d e f g h i j y"),    # copies hist doc 1's span
            (11, "m n o p q r s t u v w x y"),  # copies hist doc 2's span
            (12, "fresh words only in the batch here now ok fine"),
            (13, "fresh words only in the batch here now ok fine"),  # batch dup
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        hist = d.filter(F.col("doc_id") < 10)
        batch = d.filter(F.col("doc_id") >= 10)
        one_shot = {
            r["doc_id"]: (r["dup_tokens"], r["kept_tokens"])
            for r in duplicate_span_stats(d, k=8).collect()
            if r["doc_id"] >= 10
        }
        incr = {
            r["doc_id"]: (r["dup_tokens"], r["kept_tokens"])
            for r in duplicate_span_stats_incremental(
                batch, span_gram_index(hist, k=8), k=8
            ).collect()
        }
        assert incr == one_shot
        # and the semantics are the intended ones: both copies stripped,
        # the in-batch dup (13) loses to 12, the fresh doc keeps all
        assert incr[10][0] == 10 and incr[11][0] == 10
        assert incr[12] == (0, 10) and incr[13] == (10, 0)

    def test_incremental_strip_matches_stats_and_one_shot(self, spark):
        # round 14: the strip twin — cleaned text against the gram
        # index, kept_tokens equal to the stats op by construction,
        # and equal to one-shot strip when history ids precede batch
        from holcstore_spark.operators.dedup import (
            duplicate_span_stats_incremental,
            span_gram_index,
            strip_duplicate_spans,
            strip_duplicate_spans_incremental,
        )

        rows = [
            (1, "a b c d e f g h i j"),
            (2, "p q r s t u v w x y"),
            (10, "x a b c d e f g h i j y"),
            (12, "fresh words only in the batch here now ok fine"),
            (13, "fresh words only in the batch here now ok fine"),
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        hist = d.filter(F.col("doc_id") < 10)
        batch = d.filter(F.col("doc_id") >= 10)
        idx = span_gram_index(hist, k=8)
        stripped = {r["doc_id"]: r for r in
                    strip_duplicate_spans_incremental(
                        batch, idx, k=8).collect()}
        stats = {r["doc_id"]: r for r in
                 duplicate_span_stats_incremental(
                     batch, idx, k=8).collect()}
        for i in stripped:
            assert stripped[i]["kept_tokens"] == stats[i]["kept_tokens"]
        one_shot = {r["doc_id"]: r for r in
                    strip_duplicate_spans(d, k=8).collect()
                    if r["doc_id"] >= 10}
        assert {i: (r["text_clean"], r["kept_tokens"])
                for i, r in stripped.items()} == \
               {i: (r["text_clean"], r["kept_tokens"])
                for i, r in one_shot.items()}
        # the copied 10-token span is gone, the splice points remain
        assert stripped[10]["text_clean"] == "x y"
        assert stripped[13]["text_clean"] == ""

    def test_index_has_no_ids_and_dedups_hashes(self, spark):
        from holcstore_spark.operators.dedup import span_gram_index

        d = spark.createDataFrame(
            [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")],
            "doc_id long, text string",
        )
        idx = span_gram_index(d, k=8)
        assert idx.columns == ["gram_h"]
        # identical docs → identical grams → distinct collapses them
        assert idx.count() == 3


class TestImageNearDup:
    """r16 (VERDICT r15 ask #7): perceptual-hash image dedup — dHash
    over the real decoders, LSH-banded candidates, exact Hamming
    verify, and the BandIndex-backed incremental path."""

    @staticmethod
    def _ppm(w, h, pix: bytes) -> bytes:
        return b"P6\n%d %d\n255\n" % (w, h) + pix

    @pytest.fixture()
    def images(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        base = rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8)
        near = base.copy()
        near[5, 7] = [0, 0, 0]  # one pixel edited
        far = rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8)
        rows = [
            (1, self._ppm(8, 6, base.tobytes())),
            (2, self._ppm(8, 6, near.tobytes())),
            (3, self._ppm(8, 6, far.tobytes())),
        ]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "payload"])
        ), base

    def test_dhash_matches_reference_bits(self, spark, images):
        """The packed hash equals a straight numpy re-derivation of the
        documented spec (nearest-neighbour grid, integer grayscale,
        left<right bits, MSB-first halves)."""
        import numpy as np

        from holcstore_spark.operators.multimodal import dhash_strict

        d, base = images
        r = {x["doc_id"]: x for x in dhash_strict(d).collect()}
        gray = base.astype(np.int32).sum(axis=2) // 3
        ys = (np.arange(8) * 6) // 8
        xs = (np.arange(9) * 8) // 9
        g = gray[np.ix_(ys, xs)]
        bits = (g[:, :-1] < g[:, 1:]).astype(int).ravel()
        hi = int("".join(map(str, bits[:32])), 2)
        lo = int("".join(map(str, bits[32:])), 2)
        assert (r[1]["dhash_hi"], r[1]["dhash_lo"]) == (hi, lo)
        assert r[1]["codec"] == "ppm" and r[1]["width"] == 8

    def test_pairs_found_and_verified(self, spark, images):
        from holcstore_spark.operators.multimodal import (
            image_neardup_pairs,
        )

        d, _ = images
        got = [(r["id_a"], r["id_b"], r["hamming"])
               for r in image_neardup_pairs(d, max_hamming=10).collect()]
        assert [(a, b) for a, b, _ in got] == [(1, 2)]
        assert got[0][2] <= 3  # one edited pixel flips few bits

    def test_png_and_ppm_encodings_of_same_pixels_collide(self, spark):
        """Perceptual means codec-independent: the same pixel buffer
        as PPM and PNG produces hamming 0 (byte digests would differ)."""
        import numpy as np

        from holcstore_spark.operators.multimodal import (
            encode_png, image_neardup_pairs,
        )

        rng = np.random.RandomState(3)
        arr = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
        d = spark.createDataFrame(pd.DataFrame(
            [(1, self._ppm(7, 5, arr.tobytes())), (2, encode_png(arr))],
            columns=["doc_id", "payload"],
        ))
        got = image_neardup_pairs(d, max_hamming=0).collect()
        assert [(r["id_a"], r["id_b"], r["hamming"])
                for r in got] == [(1, 2, 0)]

    def test_band_index_accepts_dhash_bands_and_incremental_dedup(
        self, spark, tmp_store_path, images
    ):
        """The 8-hex dhash band_key satisfies BandIndex's frozen
        (n_hashes=4, bands=4) shape contract, and the incremental
        image dedup against the stored bands drops the near-dup while
        keeping the distinct image."""
        from holcstore_spark.operators.multimodal import (
            dhash_bands, dhash_strict, image_dedup_incremental,
        )
        from holcstore_spark.sources.band_index import BandIndex

        d, _ = images
        history = d.filter(F.col("doc_id") == 1)
        batch = d.filter(F.col("doc_id") > 1)
        idx = BandIndex(spark, tmp_store_path, n_hashes=4, bands=4)
        assert idx.append_bands(
            dhash_bands(dhash_strict(history)), txn_app="img",
            txn_version=0,
        )
        kept = image_dedup_incremental(batch, idx.df())
        assert [r["doc_id"] for r in kept.collect()] == [3]
        # replayed append commits nothing (exactly-once)
        assert not idx.append_bands(
            dhash_bands(dhash_strict(history)), txn_app="img",
            txn_version=0,
        )
