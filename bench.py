"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Warm-up: one JVM warm-up job, then each headline query once at sf0.001 —
whole-stage-codegen compilation of each plan shape is a one-time session
cost (~2 s/query) that a long-lived cluster never re-pays, so the measured
sf0.1 numbers reflect steady-state execution. Timed runs cover
plan + execute + collect at the target SF.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "top_revenue",
    "regional_revenue",
    "overlay_merge",
    "completeness_holes",
    "constant_runs",
    "merge_intervals",
    "disaggregate",
    "store_roundtrip",
]

#: round 12: the LLM-pipeline ops, timed as a SEPARATE metric block —
#: the headline list (and its total, the baseline gate) is unchanged so
#: BENCH_r* stays comparable across rounds, but the dedup family is
#: where new code lands round over round and a perf regression there
#: was previously invisible to the driver's per-round record
LLM_QUERIES = [
    "dedup_exact",
    "dedup_minhash",
    "semantic_dedup",
    "dedup_incremental",
    # round 13: the block grew by the two new heavy curation ops —
    # llm_total is therefore not comparable to r12's (per-query rows
    # are); the headline gate is still untouched
    "dedup_spans",
    "knn_graph",
    # round 14: the persisted-index read paths (each builds its index
    # in-query from scratch — ingest + search, the honest end-to-end
    # cost); llm_total again grows, per-query rows stay comparable
    "bm25_indexed",
    "knn_graph_indexed",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entry_mod
    from holcstore_spark import get_spark

    spark = get_spark(app_name="holcstore-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    qs = entry_mod.queries()
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001"
    )
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(sf_dir):
        t0 = time.perf_counter()
        for name in BENCH_QUERIES + LLM_QUERIES:
            qs[name](spark, warm_dir).count()   # codegen-compile each plan shape
        print(f"# warm-up at {warm_dir}: {time.perf_counter() - t0:.3f}s",
              file=sys.stderr)
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)
    # LLM-ops block: timed AFTER the headline total is closed so the
    # baseline-gate number is untouched
    llm_timings: dict[str, float] = {}
    t_llm = time.perf_counter()
    for name in LLM_QUERIES:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        llm_timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# llm {name}: {llm_timings[name]:.3f}s ({n} rows)",
              file=sys.stderr)
    llm_total = round(time.perf_counter() - t_llm, 3)
    spark.stop()
    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "llm_ops": {"metric": "llm_total", "value": llm_total,
                    "unit": "sec", "queries": llm_timings},
    }))


if __name__ == "__main__":
    main()
