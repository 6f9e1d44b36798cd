"""Deduplication for large-scale training-data pipelines.

Four strategies, all shaped for 100 TB (never all-pairs):

- exact:   hash-groupBy on a content fingerprint — one shuffle on the hash.
- MinHash+LSH: shingle → minhash signature → band buckets → candidate pairs
  only within buckets (band-bucket equi-join, the classic
  Broder/LSH construction). Pair count is bounded by bucket sizes,
  not n².
- SimHash: 64-bit sign hash; near-dups share the exact simhash (or a
  banded prefix) — again an equi-join, not a cross join.
- embedding cosine: delegated to operators.similarity (bucketed ANN).

Hashes are md5-hex (portable) so the DuckDB oracle can replicate minhash
signatures bit-for-bit; hex-string min ≡ numeric min because the slices are
fixed-width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from holcstore_spark.sources.io_util import safe_local_checkpoint


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    content: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one representative (min id) per distinct content hash.

    One shuffle on the md5 hash; at 100 TB the hash column is 16 bytes/row
    and AQE handles the (rare) skew of a massively duplicated document.
    """
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__h", F.md5(F.col(content)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def token_shingles(text: Column | str, k: int = 3, sep: str = " ") -> Column:
    """k-token shingles of a document (portable construction: split on
    ``sep``, join k consecutive tokens). Documents shorter than k tokens
    yield the whole document as a single shingle."""
    import re

    c = F.col(text) if isinstance(text, str) else text
    # F.split takes a regex while concat_ws (and the SQL oracle's
    # string_split) use sep literally — escape so e.g. sep='.' works
    toks = F.split(c, re.escape(sep))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    # try_element_at: out-of-range → NULL → concat_ws skips it (ANSI-safe,
    # and identical to the SQL oracle's list-index semantics)
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            sep, *[F.try_element_at(toks, i + j) for j in range(k)]
        ),
    )


def minhash_signature(
    shingles: Column,
    n_hashes: int = 16,
) -> list[Column]:
    """n portable min-hashes of a shingle array: seed-prefixed md5, first 8
    hex chars. Fixed-width hex strings order like their numeric value, so
    ``array_min`` over hex ≡ numeric minhash.

    NB: the per-seed lambda must take exactly ONE parameter — a second
    parameter makes pyspark pass the element *index* into it."""

    def one(j: int) -> Column:
        prefix = f"{j}|"
        return F.array_min(
            F.transform(
                shingles,
                lambda s: F.substring(F.md5(F.concat(F.lit(prefix), s)), 1, 8),
            )
        ).alias(f"mh_{j}")

    return [one(j) for j in range(n_hashes)]


def _minhash_signature_agg(
    df: DataFrame,
    text: str,
    id_col: str,
    n_hashes: int,
    shingle_k: int,
    sep: str = " ",
) -> DataFrame:
    """Per-document minhash signature as (id, mh_0..mh_{n-1}) — shingle
    explode → n_hashes whole-stage-codegen JVM md5 projections → one
    map-side-combined ``min`` aggregate per document. Bit-identical to
    :func:`minhash_signature` over :func:`token_shingles` (same shingle
    construction, same seed-prefixed md5 / first-8-hex / min), so the
    DuckDB oracles are untouched — except NULL text, which this path
    coalesces to '' (empty-shingle signature) where the HOF path yields
    a NULL signature that joins nothing. Assumes ``id_col`` is unique
    per document (duplicate ids would merge signatures).

    Why this shape and not the alternatives, measured at sf0.1 (fresh
    lineage per run — repeated collects on one DataFrame reuse shuffle
    map outputs and lie):

    - the Column HOF formulation (``array_min(transform(...))`` per
      seed) re-evaluates the whole interpreted shingle expression once
      per seed per row — the sf0.1 band self-join spent 94 s in it;
    - a vectorized pandas UDF (one hashlib pass per (seed, shingle))
      pays Arrow transfer of the full text plus Python-loop md5 —
      within ~20% of the JVM path at equal parallelism;
    - this explode+agg keeps the ~n_hashes·shingles md5s JVM-side
      inside whole-stage codegen, and the added per-document shuffle is
      SIGNATURE-sized (n_docs × n_hashes × 8 B hex after map-side
      partial min), never text-sized.

    The hash work dominates, so parallelism is everything: a small
    corpus read as ONE parquet partition would hash single-task. When
    the source has fewer partitions than the cluster's parallelism, the
    (id, text) projection is hash-repartitioned by id FIRST — text-sized
    shuffle, but only in the small-input case where that is trivial —
    and the groupBy then reuses that partitioning (no second exchange).
    At 100 TB the input has thousands of partitions and the guard never
    fires: the only shuffle is the signature-sized aggregate.
    """
    # NULL text coalesces to '' BEFORE shingling: F.split(NULL) is a NULL
    # array and F.explode of it emits no rows, so a NULL-text document
    # would silently get no signature, no bands, and bypass minhash dedup
    # entirely. '' yields the single empty shingle — the same signature
    # the Column-HOF path assigns an empty document — so NULL and empty
    # text dedup against each other instead of escaping the net.
    src = df.select(
        F.col(id_col),
        F.coalesce(
            (F.col(text) if isinstance(text, str) else text), F.lit("")
        ).alias("__t"),
    )
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target, F.col(id_col))
    # distinct WITHIN each document before hashing: min over the distinct
    # shingle set equals min over the multiset, and a boilerplate-heavy
    # document stops paying n_hashes md5s per repeated occurrence
    sh = src.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(token_shingles("__t", shingle_k, sep))
        ).alias("__s"),
    )
    # the per-seed hash is aggregated as a BIGINT, not the 8-hex-char
    # string: min(string) has no mutable UnsafeRow buffer, so the string
    # form demotes the whole aggregate to Sort + SortAggregate (a full
    # sort of the exploded shingle-hash frame — the largest intermediate
    # of the minhash family). conv(hex,16,10) is order-preserving for
    # fixed-width hex, so min over the longs picks the identical hash,
    # and %08x formats it back to the exact lowercase-hex band key the
    # SQL oracles replay (guide §2: keep the big aggregate in
    # whole-stage-codegen HashAggregate with map-side partial min).
    #
    # The three steps (hash projection → min agg → hex format) are fused
    # into ONE agg() of SQL-string expressions: per-seed that is one
    # JVM-side parse instead of ~10 py4j Column round-trips, and one
    # analyzer pass over the 16-wide tree instead of three. The physical
    # plan is unchanged (partial_min below the exchange, format_string a
    # result expression of the final HashAggregate) — this trims
    # DRIVER-side plan-construction latency, which every foreachBatch
    # micro-batch carrying this gate re-pays (measured ~0.5 s/build at
    # n_hashes=16 for the unfused form).
    return sh.groupBy(id_col).agg(
        *[
            F.expr(
                "format_string('%08x', min(cast(conv(substring("
                f"md5(concat('{j}|', __s)), 1, 8), 16, 10) as bigint)))"
            ).alias(f"mh_{j}")
            for j in range(n_hashes)
        ]
    )


def minhash_bands(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band_id, band_key) — one row per document per band; documents
    sharing a band_key in a band are near-dup candidates.

    The signature is computed ONCE per document (see
    :func:`_minhash_signature_agg` for the measured plan choice) and
    exploded into band rows (a union of per-band branches would
    recompute the n_hashes md5 sweeps once per band — 4× the hash work
    at 100 TB)."""
    if n_hashes % bands:
        raise ValueError(f"n_hashes ({n_hashes}) must be divisible by bands ({bands})")
    rows_per_band = n_hashes // bands
    d = _minhash_signature_agg(df, text, id_col, n_hashes, shingle_k)
    bands_arr = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(
                "|",
                *[F.col(f"mh_{j}")
                  for j in range(b * rows_per_band, (b + 1) * rows_per_band)],
            ).alias("band_key"),
        )
        for b in range(bands)
    ])
    return d.select(
        F.col(id_col), F.explode(bands_arr).alias("__band")
    ).select(
        id_col,
        F.col("__band.band_id").alias("band_id"),
        F.col("__band.band_key").alias("band_key"),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from LSH band buckets.

    The join is an equi-join on (band_id, band_key) — candidate generation
    cost is Σ bucket² per band, never n².

    ``max_bucket`` is the 100 TB safety valve for pathological buckets
    (boilerplate collapses millions of docs into one band key → bucket²
    pairs AND a single multi-MB collect_list row): buckets larger than
    the cap are DROPPED from candidate generation — the standard
    large-scale practice, since such buckets are exact-or-near-identical
    boilerplate that ``exact_dedup`` (run first, as the composed
    ``clean_corpus`` pipeline does) already collapses. ``None`` keeps
    every bucket (exact parity with the SQL oracle).
    """
    b = minhash_bands(df, text, id_col, n_hashes, bands, shingle_k)
    return band_candidate_pairs(b, id_col, max_bucket)


def band_candidate_pairs(
    bands_df: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from generic
    ``(id, band_id, band_key)`` rows — the shared bucket-explosion tail
    of :func:`minhash_candidate_pairs` and the image-dHash near-dup
    path (:func:`~holcstore_spark.operators.multimodal.image_neardup_pairs`,
    r16).

    Pairs come from a per-bucket collect_list, NOT a band self-join: a
    self-join evaluates the band lineage on BOTH sides (2× the dominant
    cost) and shuffles the band rows twice. One groupBy shuffles once,
    and the in-bucket pair explosion is over tiny id lists (bucket
    sizes, which the banding construction keeps small by design).
    ``max_bucket`` drops pathological buckets (see
    :func:`minhash_candidate_pairs`)."""
    buckets = (
        bands_df.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("__ids"))
        .filter(F.size("__ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("__ids") <= max_bucket)
    pair_arr = F.flatten(
        F.transform(
            F.col("__ids"),
            lambda a, i: F.transform(
                F.slice(F.col("__ids"), i + 2, F.size(F.col("__ids"))),
                lambda bb: F.struct(a.alias("id_a"), bb.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arr).alias("__p"))
        .select(F.col("__p.id_a"), F.col("__p.id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs only (never all-pairs).

    Output: id_a, id_b, jaccard (double) filtered to >= threshold.
    """
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(token_shingles(text, k=shingle_k)).alias("__sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"))
    joined = pairs.join(a, on="id_a").join(b, on="id_b")
    inter = F.size(F.array_intersect("__sha", "__shb")).cast("double")
    union = F.size(F.array_union("__sha", "__shb")).cast("double")
    return (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: Column | str, sep: str = " ") -> Column:
    """64-bit SimHash from token md5s: per bit, sign of Σ±1 across tokens.

    Token → 15-hex md5 prefix → long; bit b of the simhash is 1 when
    Σ_tokens ((h >> b) & 1 ? 1 : -1) > 0. Near-duplicates differ in few
    bits; grouping on the full value (or a prefix band) gives an equi-join
    candidate structure like MinHash.

    When ``text`` is a column NAME the 60 per-bit vote expressions are
    built as ONE parsed SQL string — the per-bit Column formulation costs
    ~1.4 s of py4j round-trips per call (60 bits × aggregate/when chains),
    pure driver latency that batch pipelines re-pay per plan build (same
    fix as :func:`_minhash_signature_agg`; same expression tree, so plans
    and results are unchanged). A ``Column`` argument takes the
    structurally identical Column path.

    The SQL fast path is taken only when it is provably equivalent to
    the Column path: the name must be a plain top-level identifier
    (a dotted name like ``'meta.text'`` is a struct-field / multipart
    reference under ``F.col``, which backtick-quoting would break), and
    the escaped separator pattern must contain no backslash or quote —
    a literal with neither parses identically whether or not the
    session runs with ``spark.sql.parser.escapedStringLiterals``, so
    the embedded regex cannot silently diverge from the Column path.
    Anything else falls through to the Column formulation.
    """
    import re

    if isinstance(text, str) and "." not in text and "`" not in text:
        pat = re.escape(sep)
        if "\\" in pat or "'" in pat:
            text = F.col(text)  # literal-unsafe separator: Column path
            return simhash64(text, sep)
        qcol = "`" + text + "`"
        # F.split takes a regex — re.escape so the separator splits
        # literally (consistent with tokens()/token_shingles() and the
        # SQL oracle); the guard above ensures the escaped pattern
        # embeds verbatim in the SQL string literal
        hashes_sql = (
            f"transform(split({qcol}, '{pat}'), "
            "t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))"
        )
        bit_terms = [
            f"(CASE WHEN aggregate({hashes_sql}, 0, (acc, h) -> acc + "
            f"(CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
            f") > 0 THEN {1 << b} ELSE 0 END)"
            # 15 hex chars = 60 bits, keeps conv() exact
            for b in range(60)
        ]
        return F.expr(
            "CAST((" + " + ".join(bit_terms) + ") AS BIGINT)"
        )

    toks = F.split(text, re.escape(sep))
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    def vote_bit(b: int) -> Column:
        vote = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        return F.when(vote > 0, F.lit(2 ** b)).otherwise(F.lit(0))

    bits = [vote_bit(b) for b in range(60)]
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out.cast("long")


def simhash_groups(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents sharing an identical 60-bit simhash (id, simhash,
    group_size) — exact-ish near-dup clusters via one shuffle."""
    d = df.select(F.col(id_col), simhash64(text).alias("simhash"))
    w = Window.partitionBy("simhash")
    return d.withColumn("group_size", F.count(F.lit(1)).over(w))


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-cluster resolution: connected components of the candidate
    pair graph, as ``(node, comp)`` with ``comp`` = the cluster's minimum
    node id.

    A corpus-scale dedup pipeline needs this step between candidate pairs
    (MinHash/SimHash) and the keep-one-per-cluster decision — pairs alone
    over-delete when A~B and B~C but A!~C. Distributed min-label
    propagation: each round every node adopts the minimum label among its
    neighbours (one equi-join + one groupBy per round); rounds needed =
    graph diameter, and near-dup clusters are shallow (2-4 rounds in
    practice, the alternating-algorithm literature's motivating case).
    The label frame holds only nodes that appear in some pair — tiny next
    to the corpus — and is checkpointed per round to cut lineage. Raises
    after ``max_iter`` non-converged rounds rather than looping forever.
    """
    from holcstore_spark.sources.io_util import safe_local_checkpoint

    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = safe_local_checkpoint(sym)
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
    )
    labels = safe_local_checkpoint(labels)
    for _ in range(max_iter):
        nmin = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
            .groupBy("a")
            .agg(F.min("comp").alias("nmin"))
            .withColumnRenamed("a", "node")
        )
        new = labels.join(nmin, on="node", how="left").select(
            "node",
            F.least(
                F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
            ).alias("comp"),
        )
        new = safe_local_checkpoint(new)
        changed = (
            new.withColumnRenamed("comp", "comp_new")
            .join(labels, on="node")
            .filter(F.col("comp_new") != F.col("comp"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no convergence after {max_iter} rounds "
        "(pathological chain — raise max_iter or pre-partition the graph)"
    )


def cluster_representatives(
    components: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    score: str = "n_chars",
) -> DataFrame:
    """Survivor selection — the final step of a near-dup pipeline: one
    representative per duplicate cluster (highest ``score``, ties broken
    by lowest id) plus cluster size and drop count.

    Output: ``cluster_id, rep_id, cluster_size, n_dropped``.

    Scale shape: ``components`` is the ``(node, comp)`` frame from
    :func:`connected_components` — clustered docs only, tiny next to the
    corpus — so the ``docs`` join ships one score per *clustered* doc and
    the groupBy aggregates a metadata-sized frame. The argmax is a
    ``max_by`` over a ``(score, -id)`` struct: deterministic, map-side
    combinable, and never a window over the corpus. (No reference
    analogue; 100 TB dedup-pipeline infrastructure.)
    """
    j = components.join(
        docs.select(F.col(id_col).alias("node"), F.col(score).alias("__score")),
        on="node",
    )
    tie = F.struct(F.col("__score"), (-F.col("node")).alias("neg_id"))
    return (
        j.groupBy("comp")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max_by("node", tie).alias("rep_id"),
        )
        .select(
            F.col("comp").alias("cluster_id"),
            "rep_id",
            "cluster_size",
            (F.col("cluster_size") - F.lit(1)).alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# incremental dedup against a persisted signature index
# ---------------------------------------------------------------------------

def dedup_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Near-dup dedup of a NEW batch against a persisted LSH signature
    index — the production shape at 100 TB: the historical corpus is
    shingled/minhashed ONCE and its ``(id, band_id, band_key)`` bands
    (:func:`minhash_bands` output) are stored as a table; each ingest
    batch hashes only itself and joins band keys. Append the kept
    batch's bands to the index after each run and the cost per ingest
    stays O(batch), never O(corpus).

    Keep rule per new document: DROPPED iff it shares any band bucket
    with an indexed document (history wins — the id spaces need not be
    comparable), or with a lower-id NEW document (the batch-internal
    keep-the-first rule, bucket-local like
    :func:`minhash_candidate_pairs`). Returns the kept new rows with
    all their columns.

    Scale shape: the new batch's signature aggregate (signature-sized,
    map-side combined — see :func:`_minhash_signature_agg`) plus ONE
    wide shuffle — new bands union the (already hashed, text-free)
    index rows, grouped by band bucket; the per-bucket
    aggregate carries only new ids. ``max_bucket`` is the same
    pathological-bucket valve as the pairs path: oversized buckets are
    dropped from candidate generation, so their new docs are KEPT (run
    :func:`exact_dedup` first for boilerplate, as ``clean_corpus``
    does).

    Streaming recipe: run this INSIDE ``foreachBatch`` — each
    micro-batch is a "new batch", the index a static table the sink
    appends kept bands to::

        def sink(batch, batch_id):
            idx = spark.read.parquet(index_path)
            kept = dedup_incremental(batch, idx)
            kept.write.mode("append").parquet(out_path)
            minhash_bands(kept).write.mode("append").parquet(index_path)

    (a stream-static band join formulation would re-scan the
    corpus-sized index once per band per micro-batch; the foreachBatch
    shape reads it once per batch and keeps the within-batch
    lowest-id rule). For an EXACTLY-ONCE managed version of this loop
    (idempotent index appends surviving checkpoint-loss replays, plus
    small-file binpack) use :class:`holcstore_spark.sources.band_index.
    BandIndex` instead of hand-rolling the sink.

    ``exclude_self``: an index row whose id EQUALS the new doc's id
    never counts as a history hit (min/max-old-id bookkeeping — no
    extra shuffle). This is what makes a replayed batch idempotent
    against an index that already contains the batch's own bands
    (BandIndex.ingest sets it); the default False keeps the two-sided
    rule where id spaces need not be comparable. In this mode
    ``max_bucket`` counts ONLY the bucket's NEW rows: (a) that is the
    actual cost driver here (the old side contributes constant-space
    min/max aggregates; only the new ids are collect_list'ed), and
    (b) counting old rows would let a replay — whose bucket now also
    holds the batch's own committed bands — flip the valve and change
    the kept set, breaking the exactly-once contract.
    """
    nb = minhash_bands(new_docs, text, id_col, n_hashes, bands, shingle_k)
    return band_dedup_incremental(
        new_docs, nb, index, id_col, max_bucket, exclude_self
    )


def band_dedup_incremental(
    new_docs: DataFrame,
    new_bands: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Generic incremental band-bucket dedup tail shared by
    :func:`dedup_incremental` (MinHash text bands) and the image
    perceptual-hash path
    (:func:`~holcstore_spark.operators.multimodal.image_dedup_incremental`,
    r16): drop any new doc sharing a band bucket with the index or
    with a lower-id new doc, then anti-join the survivors back to
    ``new_docs``. ``new_bands``/``index`` are ``(id, band_id,
    band_key)`` rows; semantics, valve and plan shape are exactly
    :func:`dedup_incremental`'s (see its docstring)."""
    u = new_bands.withColumn("__new", F.lit(True)).unionByName(
        index.select(F.col(id_col), "band_id", "band_key")
        .withColumn("__new", F.lit(False))
    )
    g = u.groupBy("band_id", "band_key").agg(
        # min/max OLD id instead of a has-old flag: lets exclude_self
        # distinguish "the only indexed doc in this bucket is me" from a
        # genuine history hit without a countDistinct expand
        F.min(F.when(~F.col("__new"), F.col(id_col))).alias("__min_old"),
        F.max(F.when(~F.col("__new"), F.col(id_col))).alias("__max_old"),
        F.min(F.when(F.col("__new"), F.col(id_col))).alias("__min_new"),
        # collect_list skips nulls: only the NEW ids are carried
        F.collect_list(F.when(F.col("__new"), F.col(id_col))).alias("__new_ids"),
        # valve size: new-only under exclude_self (replay-invariant and
        # cost-accurate — see docstring), total rows otherwise (the r11
        # oracle-matched semantics)
        (F.count(F.when(F.col("__new"), 1)) if exclude_self
         else F.count(F.lit(1))).alias("__n"),
    )
    if max_bucket is not None:
        g = g.filter(F.col("__n") <= max_bucket)
    exploded = g.select(
        F.explode("__new_ids").alias(id_col),
        "__min_old", "__max_old", "__min_new",
    )
    if exclude_self:
        old_hit = F.col("__min_old").isNotNull() & (
            (F.col("__min_old") != F.col(id_col))
            | (F.col("__max_old") != F.col(id_col))
        )
    else:
        old_hit = F.col("__min_old").isNotNull()
    dropped = (
        exploded
        .filter(old_hit | (F.col(id_col) > F.col("__min_new")))
        .select(id_col)
        # deliberately NOT distinct(): LeftAnti ignores build-side
        # duplicates (an id dropped by several bands anti-joins the
        # same), and the distinct would cost a second full shuffle.
        # Typical plan (asserted at test sizes): the bucket-groupBy
        # Exchange plus the signature aggregates' signature-sized
        # Exchanges, then a broadcast of the dropped ids — but the
        # broadcast is SIZE-DEPENDENT, not structural: when the dropped
        # set outgrows autoBroadcastJoinThreshold Spark falls back to a
        # shuffled left-anti, which is the right trade (forcing
        # F.broadcast here would instead risk driver OOM on a batch
        # with a large dropped fraction)
    )
    # When new_docs is a multi-branch Union the optimizer pushes this
    # anti-join below the union, and the LAZY plan then carries one full
    # copy of the dropped-id lineage per branch. That duplication is
    # plan-deep only: the copies are canonically identical, so exchange
    # reuse dedupes them AT RUNTIME and the band pipeline computes once
    # (verified on the ACTUALLY-EXECUTED plan — collect() on the frame,
    # then queryExecution().executedPlan() shows isFinalPlan=true with
    # ReusedExchange nodes for every duplicate copy; wall-clock is flat
    # between the Union and single-frame shapes even at 4 cores where a
    # genuine 3× could not hide; asserted in tests/test_plans.py).
    # NOTE the measurement trap that once motivated a localCheckpoint
    # pin here: inspecting queryExecution() of a frame whose ACTION ran
    # through .count()/.write() shows the un-executed initial plan
    # (those actions build their own QueryExecution), where the copies
    # look un-reused. The pin was runtime-neutral in every interleaved
    # A/B and was removed: it cost a per-batch analyzed-plan render and
    # a catalyst pass for Union batches, and a localCheckpoint breaks
    # lineage (executor loss kills the query instead of recomputing).
    return new_docs.join(dropped, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# cross-document duplicate SPAN removal (exact-substring dedup)
# ---------------------------------------------------------------------------

_SPAN_POS_BITS = 20  # positions per doc fit in 2^20; keeps the keeper key a BIGINT


def _span_occurrences(
    df: DataFrame, text: str, id_col: str, k: int, sep: str
):
    """Shared gram-occurrence frame for the span-dedup family: one row
    per (doc, position) rolling k-token gram, with a portable 16-hex
    md5 gram hash and an encoded BIGINT occurrence key for the global
    keep-the-first rule. NULL text counts as zero tokens (matching the
    strip function's empty-clean-text treatment)."""
    from pyspark.sql.types import (
        ByteType, IntegerType, LongType, ShortType,
    )

    from holcstore_spark.operators.text import tokens

    key_type = df.schema[id_col].dataType
    if not isinstance(key_type, (ByteType, ShortType, IntegerType, LongType)):
        # fractional ids would truncate in the cast (5.2 and 5.7 collide
        # to the same key base, merging two documents' occurrences)
        raise TypeError(
            f"duplicate-span dedup requires an INTEGRAL id to encode the "
            f"keep-first occurrence key: {id_col!r} is "
            f"{key_type.simpleString()}"
        )
    # tokens() escapes sep, matching the literal-sep semantics of the
    # gram concat_ws, the strip rejoin and the SQL oracle
    tcol = F.col(text) if isinstance(text, str) else text
    toks = tokens(tcol, sep)
    limit = 1 << _SPAN_POS_BITS
    id_cap = 1 << (63 - _SPAN_POS_BITS)  # id·2^20 must not wrap BIGINT
    # NULL text → 0 tokens (F.size of a null array is -1, not NULL)
    n = F.when(tcol.isNull(), F.lit(0)).otherwise(F.size(toks))
    # fail loudly instead of corrupting keep-first keys: oversized docs
    # would collide positions; oversized |id| would WRAP the multiply
    # (silently electing an arbitrary occurrence as "globally first").
    # Two-sided compare, NOT F.abs — abs(Long.MIN_VALUE) wraps negative
    # in non-ANSI Spark and would slip through an abs() guard
    idl = F.col(id_col).cast("long")
    bad = (n >= limit) | (idl >= id_cap) | (idl <= -id_cap)
    n = F.when(
        ~bad, n
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"duplicate-span dedup: document exceeds {limit - 1} "
                      f"tokens or |id| >= 2^{63 - _SPAN_POS_BITS} (id="),
                F.col(id_col).cast("string"), F.lit(")"),
            )
        ).cast("int")
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
    )
    grams = base.select(
        id_col,
        "__n",
        # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, so a doc
        # shorter than k tokens must explode an empty array, not that
        F.explode(
            F.when(
                F.col("__n") >= k,
                F.sequence(F.lit(1), F.col("__n") - (k - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__pos"),
        "__toks",
    ).select(
        id_col,
        "__pos",
        F.substring(
            F.md5(F.concat_ws(sep, F.slice(F.col("__toks"), F.col("__pos"), k))),
            1, 16,
        ).alias("__h"),
        (F.col(id_col).cast("long") * limit + F.col("__pos")).alias("__key"),
    )
    per_doc = base.select(id_col, F.col("__n").alias("n_tokens"))
    return grams, per_doc


def _covered_positions(
    grams: DataFrame,
    id_col: str,
    k: int,
    gram_index: "DataFrame | None" = None,
) -> DataFrame:
    """Distinct (id, __pos) token positions covered by a REMOVED gram
    occurrence — the SINGLE home of the span-dedup removal rule, shared
    by all four family members (stats / strip × one-shot /
    incremental) so the rule can never drift between them (review
    r14): an occurrence is removed when its hash exists in
    ``gram_index`` (history always wins; ``None`` = one-shot, no
    history) OR a strictly smaller in-frame (id, position) key carries
    the same gram (keep-first)."""
    agg = grams.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__occ"),
        F.min("__key").alias("__first"),
    )
    joined = grams.join(agg, on="__h")
    in_frame_dup = (
        (F.col("__occ") >= 2) & (F.col("__key") != F.col("__first"))
    )
    if gram_index is None:
        removed = joined.filter(in_frame_dup)
    else:
        hist = (
            gram_index.select(F.col("gram_h").alias("__h"))
            .distinct()
            .withColumn("__in_hist", F.lit(True))
        )
        removed = joined.join(hist, on="__h", how="left").filter(
            F.col("__in_hist").isNotNull() | in_frame_dup
        )
    return (
        removed.select(
            id_col,
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + (k - 1))
            ).alias("__pos"),
        )
        .distinct()
    )


def _stats_from_covered(
    per_doc: DataFrame, covered: DataFrame, id_col: str
) -> DataFrame:
    """Shared per-document stats tail: covered positions → (id,
    n_tokens, dup_tokens, kept_tokens, dup_frac)."""
    dup = covered.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_tokens")
    )
    return (
        per_doc.join(dup, on=id_col, how="left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long")
            .alias("dup_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("dup_tokens"), F.lit(0)))
            .cast("long").alias("kept_tokens"),
            (F.coalesce(F.col("dup_tokens"), F.lit(0)) /
             F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
             ).alias("dup_frac"),
        )
    )


def duplicate_span_stats(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    sep: str = " ",
) -> DataFrame:
    """Cross-document duplicate-SPAN statistics — the exact-substring
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), re-expressed as rolling k-token gram
    hashing instead of a suffix array: a span of ``k`` consecutive
    tokens is DUPLICATED at a given occurrence when the same k-gram
    occurs anywhere else in the corpus (another document, or earlier in
    the same document) at a strictly smaller (id, position) key. The
    globally-first occurrence keeps its tokens; every later occurrence
    marks its k positions for removal.

    Output per document: ``n_tokens``, ``dup_tokens`` (distinct token
    positions covered by at least one removed occurrence),
    ``kept_tokens`` and ``dup_frac``. Use
    :func:`strip_duplicate_spans` to materialize the cleaned text.

    Scale shape (no suffix array, no cross join): explode to one row
    per gram occurrence (factor = tokens/doc, bounded) → ONE wide
    shuffle on the 16-hex gram hash computing (occurrences, min key)
    with map-side partial aggregation → hash equi-join back → the k×
    coverage explode stays partitioned by document for the final
    per-doc distinct+count. Skewed grams (boilerplate repeated millions
    of times) produce ONE aggregate row each — skew lives in the
    pre-aggregated explode, which AQE splits; there is no bucket-list
    materialization. Reference scope: beyond-reference (the reference
    engine has no substring dedup; SURVEY.md §2 dedup family D*)."""
    grams, per_doc = _span_occurrences(df, text, id_col, k, sep)
    return _stats_from_covered(
        per_doc, _covered_positions(grams, id_col, k), id_col
    )


def strip_duplicate_spans(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    sep: str = " ",
) -> DataFrame:
    """Materialize the cleaned corpus under the
    :func:`duplicate_span_stats` rule: every token position covered by
    a removed duplicate occurrence is dropped; survivors re-join in
    original order. Returns (id, text_clean, kept_tokens) — token
    count of ``text_clean`` equals ``kept_tokens`` from the stats op
    by construction (pytest-asserted).

    The rebuild is doc-partitioned: token positions and the covered
    set shuffle on the id, and the sort back into document order is an
    ``array_sort`` over an in-executor collected struct array — bounded
    by the (already enforced) per-document token cap, never by corpus
    size."""
    grams, _ = _span_occurrences(df, text, id_col, k, sep)
    return _rebuild_stripped(
        df, _covered_positions(grams, id_col, k), text, id_col, sep
    )


def strip_duplicate_spans_incremental(
    new_docs: DataFrame,
    gram_index: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    sep: str = " ",
) -> DataFrame:
    """Cleaned text of a NEW batch against a persisted gram index —
    the strip twin of :func:`duplicate_span_stats_incremental` (same
    removal rule: history hash always wins, in-batch keep-first on
    top) and the production materialization path: pair with
    :class:`~holcstore_spark.sources.gram_index.GramIndex` in a
    foreachBatch loop — ``idx.ingest(batch, ...)`` for the exactly-
    once index append, this over ``idx.grams()`` for the cleaned
    output. Output matches :func:`strip_duplicate_spans`:
    (id, text_clean, kept_tokens), where kept_tokens equals the stats
    op's by construction.

    Scale shape: identical to the stats twin (one batch gram shuffle,
    one hash equi-join against the index, coverage explode doc-
    partitioned) plus the doc-partitioned rebuild."""
    grams, _ = _span_occurrences(new_docs, text, id_col, k, sep)
    return _rebuild_stripped(
        new_docs,
        _covered_positions(grams, id_col, k, gram_index),
        text, id_col, sep,
    )


def _rebuild_stripped(
    df: DataFrame, covered: DataFrame, text: str, id_col: str, sep: str
) -> DataFrame:
    """Shared doc-partitioned rebuild for the strip family: drop the
    ``covered`` (id, __pos) token positions, re-join survivors in
    original order (array_sort over an in-executor struct array —
    bounded by the per-document token cap, never corpus size)."""
    from holcstore_spark.operators.text import tokens

    # same literal-sep tokens() as _span_occurrences: the position space
    # must be identical on both sides of the covered anti-join
    toks = tokens(text, sep)
    positions = df.select(
        F.col(id_col),
        F.posexplode(toks).alias("__p0", "__tok"),
    ).select(id_col, (F.col("__p0") + 1).alias("__pos"), "__tok")
    kept = positions.join(covered, on=[id_col, "__pos"], how="left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__tok")))
            ).alias("__arr")
        )
        .select(
            id_col,
            F.concat_ws(
                sep, F.transform(F.col("__arr"), lambda s: s["__tok"])
            ).alias("text_clean"),
            F.size(F.col("__arr")).cast("long").alias("kept_tokens"),
        )
    )
    # documents whose every token was stripped (or that had no tokens)
    # still belong to the corpus: left join from the source keeps them
    return (
        df.select(id_col)
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long")
            .alias("kept_tokens"),
        )
    )


def span_gram_index(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    sep: str = " ",
) -> DataFrame:
    """The persisted side of incremental duplicate-span dedup: the
    DISTINCT rolling k-gram hashes of a (kept) corpus — one 16-hex
    string per distinct gram, no ids, no positions. Store this once,
    append each ingest batch's kept grams, and per-batch span dedup
    stays O(batch grams + matched index rows) instead of re-hashing
    history (:func:`duplicate_span_stats_incremental`).

    Size note vs the MinHash band index: gram rows are O(corpus
    tokens) (~tokens-per-doc × docs), not O(4·docs) — at warehouse
    scale, bucket the stored table by a hash prefix so the per-batch
    join co-locates, and expect the index to be the same order of
    magnitude as the text itself."""
    grams, _ = _span_occurrences(df, text, id_col, k, sep)
    return grams.select("__h").distinct().withColumnRenamed("__h", "gram_h")


def duplicate_span_stats_incremental(
    new_docs: DataFrame,
    gram_index: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    sep: str = " ",
) -> DataFrame:
    """Duplicate-SPAN stats of a NEW batch against a persisted gram
    index (:func:`span_gram_index`) — the production shape of
    :func:`duplicate_span_stats` at 100 TB: history is gram-hashed
    ONCE; each ingest batch hashes only itself.

    Removal rule per occurrence: removed iff its k-gram hash exists in
    the index (history always wins — the id spaces need not be
    comparable), OR a strictly-smaller (id, position) key inside the
    batch carries the same gram (the batch-internal keep-first rule of
    the one-shot operator). Output matches
    :func:`duplicate_span_stats`: per batch doc — n_tokens,
    dup_tokens, kept_tokens, dup_frac.

    Scale shape: the batch's gram frame aggregates (occurrences, min
    key) per hash with map-side combine, LEFT-SEMI-joins the index on
    the 16-hex hash for the history verdict (hash equi-join — AQE
    picks broadcast only if the batch gram set is small), and the k×
    coverage explode stays partitioned by the batch document id. The
    index is never re-hashed and its ids/positions are never read —
    it has none."""
    grams, per_doc = _span_occurrences(new_docs, text, id_col, k, sep)
    return _span_stats_from_grams(grams, per_doc, gram_index, id_col, k)


def _span_stats_from_grams(
    grams: DataFrame,
    per_doc: DataFrame,
    gram_index: DataFrame,
    id_col: str,
    k: int,
) -> DataFrame:
    """The stats tail of :func:`duplicate_span_stats_incremental` over a
    PRE-BUILT gram-occurrence frame — split out so
    :class:`~holcstore_spark.sources.gram_index.GramIndex.ingest` can
    materialize ``_span_occurrences`` ONCE and feed both this and its
    new-gram append from the same checkpointed frame (the batch's md5
    explode is the dominant per-batch cost; recomputing it per consumer
    would double it)."""
    return _stats_from_covered(
        per_doc,
        _covered_positions(grams, id_col, k, gram_index),
        id_col,
    )
