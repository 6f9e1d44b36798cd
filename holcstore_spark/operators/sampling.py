"""Deterministic sampling / dataset splitting for training-data pipelines.

A 100 TB corpus is split into train/valid/test and down-sampled per
stratum *by content hash*, never by ``rand()``: the assignment must be
reproducible run-to-run, stable under re-partitioning, and identical on
every engine that processes the corpus. All functions here hash with
md5-hex (portable) and decide buckets by *lexicographic comparison of hex
prefixes* — md5 prefixes are uniform, and hex-string order equals numeric
order, so a fraction ``f`` maps to the threshold ``hex(floor(f * 16^8))``
zero-padded to 8 digits. No int conversion is needed on either engine.

Scale design: ``hash_split`` / ``sample_fraction`` are narrow maps (zero
shuffle, whole-stage codegen). ``stratified_sample`` shuffles once on the
strata columns (window top-k); AQE handles skewed strata.

Reference parity: the reference has no sampling surface — this module is
part of the beyond-reference LLM-pipeline layer (brief: training-data ops
are first-class).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_hex8",
    "hash_split",
    "rebalance_mix",
    "sample_fraction",
    "stratified_sample",
]

_HEX_SPAN = 16 ** 8  # 8 hex digits = 32 bits of the md5 prefix


def _frac_to_hex(frac: float) -> str:
    """Cumulative fraction -> 8-hex-digit threshold (lexicographic cut)."""
    v = min(max(int(frac * _HEX_SPAN), 0), _HEX_SPAN - 1)
    return format(v, "08x")


def hash_hex8(id_cols: list[Column | str], salt: str) -> Column:
    """First 8 md5 hex chars of ``salt|id1|id2|...`` — the portable,
    uniformly-distributed sort/bucket key used by every sampler here."""
    cols = [F.col(c) if isinstance(c, str) else c for c in id_cols]
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), *[c.cast("string") for c in cols])),
        1, 8,
    )


def hash_split(
    df: DataFrame,
    id_cols: list[str],
    weights: dict[str, float],
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Assign each row to a named split (e.g. train/valid/test) by content
    hash. Deterministic, partition-stable, engine-portable; weights are
    normalized. Zero shuffle — a pure projection.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("hash_split: weights must sum to > 0")
    h = hash_hex8(list(id_cols), salt)
    cum = 0.0
    expr: Column | None = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = h < F.lit(_frac_to_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out_col = last if expr is None else expr.otherwise(last)
    return df.withColumn(out, out_col)


def sample_fraction(
    df: DataFrame,
    id_cols: list[str],
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by content hash. Unlike
    ``df.sample()``, re-runs and re-partitions select the SAME rows, and a
    smaller fraction selects a subset of a larger one (nested samples).
    Zero shuffle — a pushdown-friendly filter."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("sample_fraction: fraction must be in [0, 1]")
    if fraction >= 1.0:
        return df
    return df.filter(hash_hex8(list(id_cols), salt) < F.lit(_frac_to_hex(fraction)))


def rebalance_mix(
    df: DataFrame,
    group_col: str,
    weights: dict[str, int | float],
    id_cols: list[str],
    salt: str = "mix",
) -> DataFrame:
    """Deterministically down-sample to a target group mix — the domain /
    language re-weighting pass of a pretraining pipeline ("make the kept
    corpus 50% en / 25% de / 25% fr").

    Maximizes the kept volume: with the largest total T satisfying
    ``share(g)·T ≤ count(g)`` for every target group, each group keeps
    ``share(g)·T / count(g)`` of its rows by content hash (so re-runs,
    re-partitions and other engines select the SAME rows). Groups not in
    ``weights`` are dropped.

    All threshold arithmetic is EXACT (``fractions.Fraction``): the
    resulting 8-hex-digit cut equals
    ``floor(w_g·M·16^8 / (W·count_g))`` with ``M = min_u count_u·W/w_u``
    — an integer formula any SQL engine reproduces with wide-integer
    ops, with no float-rounding drift.

    One metadata-sized aggregate (group counts) plus a zero-shuffle
    filter; the filter is a pushdown-friendly predicate on the hash.
    """
    from fractions import Fraction

    if not weights:
        raise ValueError("rebalance_mix: weights must be non-empty")
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(group_col).isin(list(weights)))
        .groupBy(group_col).count().collect()
    }
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"rebalance_mix: no rows for target groups {sorted(missing)}")
    wfr = {g: Fraction(w) for g, w in weights.items()}
    total_w = sum(wfr.values())
    if total_w <= 0:
        raise ValueError("rebalance_mix: weights must sum to > 0")
    m = min(Fraction(counts[g]) * total_w / wfr[g] for g in wfr)
    h = hash_hex8(list(id_cols), salt)
    keep: Column | None = None
    for g in wfr:
        frac = wfr[g] * m / (total_w * counts[g])
        cond = F.col(group_col) == g
        if frac < 1:
            thr = format(int(frac * _HEX_SPAN), "08x")
            cond = cond & (h < F.lit(thr))
        keep = cond if keep is None else keep | cond
    return df.filter(keep)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    id_cols: list[str],
    salt: str = "strat",
    out_rank: str | None = None,
) -> DataFrame:
    """Deterministic top-``n`` rows per stratum, ordered by content hash
    (uniform ⇒ an unbiased without-replacement sample per group).

    One shuffle on the strata columns; ties on the 32-bit hex prefix break
    on the id columns so the result is total-ordered and reproducible.
    """
    h = hash_hex8(list(id_cols), salt)
    w = Window.partitionBy(*strata).orderBy(
        h.asc(), *[F.col(c).asc() for c in id_cols]
    )
    ranked = df.withColumn("__rk", F.row_number().over(w))
    ranked = ranked.filter(F.col("__rk") <= n_per_stratum)
    if out_rank:
        return ranked.withColumnRenamed("__rk", out_rank)
    return ranked.drop("__rk")


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_cols: list[str],
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based domain flattening at alpha = 1/2 (the classic
    sqrt-rebalance of multilingual/multi-domain pretraining): each group
    keeps ``sqrt(n_min * n_g)`` rows — head domains are tamed toward the
    tail without upsampling anything (the smallest group is kept whole).

    Row selection is by content hash, EXACT across engines with no
    square root anywhere: keep iff ``h^2 * n_g < n_min * 2^64`` for the
    32-bit integer ``h`` of the md5-hex8 prefix — algebraically
    ``u < sqrt(n_min/n_g)`` for ``u = h/2^32``, but decided in pure
    (wide-)integer arithmetic any engine reproduces bit-for-bit. The
    engine precomputes each group's hex threshold with Python's exact
    ``isqrt``; a SQL twin states the quadratic inequality directly
    (HUGEINT / DECIMAL(38)).

    One metadata-sized aggregate (group counts, one row per domain) and
    a zero-shuffle pushdown-friendly hash filter — same scale shape as
    :func:`rebalance_mix`.
    """
    from math import isqrt

    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).count().collect()
        if r[0] is not None  # null-domain rows are dropped
    }
    if not counts:
        return df.filter(F.lit(False))
    n_min = min(counts.values())
    x = n_min << 64
    h = hash_hex8(list(id_cols), salt)
    # thresholds travel as a broadcast (group, hex-cut) frame rather than
    # an OR-chain with one branch per domain: per-row cost stays O(1) and
    # a high-cardinality domain column can never blow the codegen limit.
    # NULL cut = keep the whole group (the n_min group).
    rows = []
    for g, n_g in counts.items():
        # valid h: h^2 < x/n_g  ⇔  h <= isqrt(ceil(x/n_g) - 1)
        t = isqrt((x + n_g - 1) // n_g - 1) + 1
        rows.append((g, format(t, "08x") if t < _HEX_SPAN else None))
    spark = df.sparkSession
    gfield = df.schema[group_col]
    from pyspark.sql import types as T

    thr = spark.createDataFrame(
        rows,
        T.StructType([gfield, T.StructField("__thr", T.StringType())]),
    )
    return (
        df.join(F.broadcast(thr), on=group_col, how="inner")
        .filter(F.col("__thr").isNull() | (h < F.col("__thr")))
        .drop("__thr")
    )


def cap_per_group(
    df: DataFrame,
    group: str | list[str] = "source",
    cap: int = 100,
    order_by: "list[Column] | None" = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group document cap — the RefinedWeb/C4 per-DOMAIN cap that
    stops one crawl domain from dominating the training mix: keep at
    most ``cap`` rows per ``group``, best-first.

    ``order_by`` decides which rows survive (default: longest first by
    ``n_chars`` if present, then ``id_col`` ascending as the total
    tiebreak — the ordering must be total or the cap is
    non-deterministic). Returns the surviving rows with all columns.

    Scale shape: one hash shuffle on the group key + a bounded
    row_number window — no global sort, no collect. A mega-domain is
    one hot partition: AQE's skew handling does not split window
    partitions, so for web-scale domain skew pre-aggregate candidates
    per domain (filter obvious rejects first) or raise
    spark.sql.shuffle.partitions; the window itself streams rows and
    spills, it does not buffer the domain in memory.
    """
    groups = [group] if isinstance(group, str) else list(group)
    if order_by is None:
        order_by = (
            [F.col("n_chars").desc()] if "n_chars" in df.columns else []
        ) + [F.col(id_col).asc()]
    w = Window.partitionBy(*groups).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
