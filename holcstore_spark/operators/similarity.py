"""Similarity search over an embedding column (``array<float>``).

Two paths:

- ``brute_force_topk`` — exact cosine top-k of queries × candidates. The
  query side is broadcast (queries ≪ candidates); the candidate table
  streams through one stage, each partition emitting its local top-k via
  window rank. Never materializes the full n×m score matrix on one node;
  at 100 TB the scan is embarrassingly parallel and shuffle is limited to
  (queries × k) rows.
- ``lsh_topk`` — random-hyperplane (sign) LSH: embeddings bucket by the
  sign pattern of h deterministic hyperplanes; top-k runs per bucket. The
  scale path: candidate generation is an equi-join on the bucket key.

Scores use integer-quantized arithmetic (round(x*1000) per element): the
dot product is then exact integer math, making results order-independent
and bit-reproducible across engines (the DuckDB oracle matches exactly).
Hyperplanes are derived from md5 bits — deterministic, no RNG state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantized(vec: Column | str, scale: int = 1000) -> Column:
    """array<float> → array<long> of round(x*scale) (exact int arithmetic)."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors: int dot / sqrt(int·int) — per-row
    IEEE double ops on exact integers → bit-deterministic everywhere."""
    return dot_q(a, b).cast("double") / (
        F.sqrt(norm_sq_q(a).cast("double")) * F.sqrt(norm_sq_q(b).cast("double"))
    )


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "q_id",
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    Output: q_id, neighbor_id, score — ties broken by neighbor_id asc.
    """
    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"), quantized(vec_col).alias("__cq")
    )
    qry = queries.select(
        F.col(id_col).alias(query_id), quantized(vec_col).alias("__qq")
    )
    scored = cand.crossJoin(F.broadcast(qry)).filter(
        F.col("neighbor_id") != F.col(query_id)
    )
    scored = scored.withColumn("score", cosine_q(F.col("__qq"), F.col("__cq")))
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(query_id, "neighbor_id", "score")
    )


def hyperplane_sign(vec_q: Column, plane: int, dim: int) -> Column:
    """Sign bit of <v, h_plane> where h_plane[d] = ±1 from md5('plane|d').

    Deterministic pseudo-random hyperplanes with no RNG: component d of
    plane p is +1 when the first hex digit of md5('p|d') is even.
    """
    signs = F.array(*[
        F.when(
            F.conv(F.substring(F.md5(F.lit(f"{plane}|{d}")), 1, 1), 16, 10)
            .cast("int") % 2 == 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).cast("long")
        for d in range(dim)
    ])
    proj = F.aggregate(
        F.zip_with(vec_q, signs, lambda x, s: x * s),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (proj > 0).cast("int")


def lsh_bucket(vec_q: Column, n_planes: int, dim: int) -> Column:
    """Sign-pattern bucket id: concatenated hyperplane sign bits."""
    bits = [hyperplane_sign(vec_q, p, dim) for p in range(n_planes)]
    return F.concat_ws("", *[b.cast("string") for b in bits])


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "q_id",
) -> DataFrame:
    """Approximate top-k: candidates considered only within the query's
    LSH bucket (equi-join on bucket key — the 100 TB path).

    Output: q_id, neighbor_id, score.
    """
    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"), quantized(vec_col).alias("__cq")
    ).withColumn("__bucket", lsh_bucket(F.col("__cq"), n_planes, dim))
    qry = queries.select(
        F.col(id_col).alias(query_id), quantized(vec_col).alias("__qq")
    ).withColumn("__bucket", lsh_bucket(F.col("__qq"), n_planes, dim))
    scored = cand.join(F.broadcast(qry), on="__bucket").filter(
        F.col("neighbor_id") != F.col(query_id)
    )
    scored = scored.withColumn("score", cosine_q(F.col("__qq"), F.col("__cq")))
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(query_id, "neighbor_id", "score")
    )


def _dist_matrix(vs, centroids):
    """(batch × n_lists) exact int64 squared-euclidean distance matrix."""
    C = np.asarray(centroids, dtype=np.int64)
    V = np.stack([np.asarray(v, dtype=np.int64) for v in vs.to_numpy()])
    return ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)


def _assign_to_centroid(vec_q: Column, centroids: list[list[int]]) -> Column:
    """Index of the nearest centroid by exact integer squared-euclidean
    distance; ties go to the lowest index (np.argmin is first-min).

    Vectorized Arrow-batched pandas UDF on purpose: the Column-expression
    formulation (transform/zip_with/aggregate over n_lists × dim) is
    evaluated as ~1000 interpreted lambda calls PER ROW — milliseconds per
    vector, hours at millions of vectors. The numpy broadcast distance
    matrix is one C-level op per batch, and int64 arithmetic keeps the
    result bit-identical to the unrolled-SQL oracle."""
    @F.pandas_udf("integer")
    def assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        d = _dist_matrix(vs, centroids)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    c = F.col(vec_q) if isinstance(vec_q, str) else vec_q
    return assign(c)


def _probe_lists(vec_q: Column, centroids: list[list[int]], n_probe: int) -> Column:
    """The n_probe nearest centroid indexes per vector, nearest first;
    ties by lowest index (stable argsort on the distance matrix)."""
    @F.pandas_udf("array<integer>")
    def probe(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        d = _dist_matrix(vs, centroids)
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    c = F.col(vec_q) if isinstance(vec_q, str) else vec_q
    return probe(c)


def train_ivf_centroids(
    df: DataFrame,
    n_lists: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[int]]:
    """Deterministic k-means-lite in quantized integer space.

    Init: the n_lists lowest-id vectors. Each Lloyd iteration assigns every
    vector to its nearest centroid (exact int distance) and recomputes the
    mean per (list, dimension) with exact decimal sums, re-quantized to
    longs — so the trained centroids are bit-reproducible run to run.
    Centroids are tiny (n_lists × dim) and travel as broadcast literals.
    """
    q = df.select(F.col(id_col), quantized(vec_col).alias("__q"))
    seed_rows = q.orderBy(id_col).limit(n_lists).collect()
    centroids = [list(r["__q"]) for r in seed_rows]
    for _ in range(iters):
        assigned = q.withColumn("__list", _assign_to_centroid(F.col("__q"), centroids))
        per_dim = (
            assigned.select(
                "__list", F.posexplode("__q").alias("__d", "__v")
            )
            .groupBy("__list", "__d")
            .agg(
                (F.sum(F.col("__v").cast("decimal(38,0)"))
                 / F.count(F.lit(1))).cast("long").alias("__m")
            )
            .collect()
        )
        new = {i: list(c) for i, c in enumerate(centroids)}
        for r in per_dim:
            new[r["__list"]][r["__d"]] = int(r["__m"])
        centroids = [new[i] for i in range(n_lists)]
    return centroids


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "q_id",
) -> DataFrame:
    """IVF approximate top-k: vectors are inverted-file-partitioned by
    nearest centroid; each query probes its ``n_probe`` closest lists and
    searches only there — candidate generation is an equi-join on the list
    id (the scale path; at 100 TB the assignment column is written once and
    the probe join prunes to ~n_probe/n_lists of the data).
    """
    centroids = train_ivf_centroids(
        candidates, n_lists=n_lists, iters=iters, id_col=id_col,
        vec_col=vec_col,
    )
    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"), quantized(vec_col).alias("__cq")
    ).withColumn("__list", _assign_to_centroid(F.col("__cq"), centroids))

    qry = queries.select(
        F.col(id_col).alias(query_id), quantized(vec_col).alias("__qq")
    )
    # probe lists: the n_probe nearest centroids per query
    qry = qry.withColumn(
        "__probe", _probe_lists(F.col("__qq"), centroids, n_probe)
    ).withColumn("__list", F.explode("__probe"))

    scored = cand.join(F.broadcast(qry.drop("__probe")), on="__list").filter(
        F.col("neighbor_id") != F.col(query_id)
    )
    scored = scored.withColumn("score", cosine_q(F.col("__qq"), F.col("__cq")))
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(query_id, "neighbor_id", "score")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets (id_a < id_b,
    score >= threshold). All-pairs only *within* buckets.

    ``max_bucket`` drops over-sized buckets (embedding-space boilerplate —
    e.g. millions of near-empty documents hashing to one corner) before
    the within-bucket self-join goes quadratic; ``None`` keeps every
    bucket (exact oracle parity)."""
    d = df.select(F.col(id_col), quantized(vec_col).alias("__q"))
    d = d.withColumn("__bucket", lsh_bucket(F.col("__q"), n_planes, dim))
    if max_bucket is not None:
        small = (
            d.groupBy("__bucket").count()
            .filter(F.col("count") <= max_bucket).select("__bucket")
        )
        d = d.join(F.broadcast(small), on="__bucket", how="left_semi")
    a = d.select(F.col(id_col).alias("id_a"), F.col("__q").alias("__qa"), "__bucket")
    b = d.select(F.col(id_col).alias("id_b"), F.col("__q").alias("__qb"), "__bucket")
    pairs = a.join(b, on="__bucket").filter(F.col("id_a") < F.col("id_b"))
    pairs = pairs.withColumn("score", cosine_q(F.col("__qa"), F.col("__qb")))
    return pairs.filter(F.col("score") >= threshold).select("id_a", "id_b", "score")
