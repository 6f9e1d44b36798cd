"""Capture ``explain('formatted')`` for declared queries into text files.

Usage::

    python scripts/capture_plans.py <out_dir> <suffix> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query (suffix is
``before`` / ``after``). Queries with in-query side effects (index
builds, store writes) execute those side effects during capture — the
captured plan is the plan of the RETURNED DataFrame, i.e. the read/query
tail, which is what the bench times after the build.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # headline bench
    "pricing_summary", "top_revenue", "regional_revenue", "overlay_merge",
    "completeness_holes", "constant_runs", "merge_intervals", "disaggregate",
    "store_roundtrip",
    # llm bench block
    "dedup_exact", "dedup_minhash", "semantic_dedup", "dedup_incremental",
    "dedup_spans", "knn_graph", "bm25_indexed", "knn_graph_indexed",
    # round-16 touched (sampling trio, salted cap, distance rewrite, images)
    "temperature_sample", "rebalance_mix", "cluster_balance", "domain_cap",
    "ivf_persisted", "ivfpq_persisted", "image_neardup",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from holcstore_spark import get_spark

    spark = get_spark(app_name="holcstore-plan-capture")
    qs = entry_mod.queries()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        if name not in qs:
            print(f"# {name}: NOT IN REGISTRY, skipped", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 - record, keep capturing
            txt = f"CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"# wrote {path} ({len(txt)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
