"""Anti-pattern audit over captured explain('formatted') plan files.

Usage::

    python scripts/audit_plans.py <plans_dir> [suffix]

Scans every ``*_<suffix>.txt`` (default ``audit``) for the guide's red
flags and prints one row per query:

- ``BatchEvalPython``  — row-at-a-time Python UDF in the plan (§4)
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — accidental cross
  joins (§3); BNLJ is only acceptable on explicitly tiny sides
- ``Exchange`` count — shuffle boundaries (§2)
- ``SortAggregate`` — aggregate demoted from hash aggregation
- ``PushedFilters: []`` on a filtered scan — pushdown failure (§6)
- ``rdd``/``ExistingRDD`` — materialization barriers (informational)
"""

from __future__ import annotations

import os
import re
import sys


def audit_file(path: str) -> dict:
    txt = open(path).read()

    def n(op: str) -> int:
        return len(re.findall(rf"^\(\d+\) {op}\b", txt, flags=re.MULTILINE))

    return {
        "batch_eval_python": n("BatchEvalPython"),
        "arrow_eval_python": n("ArrowEvalPython"),
        "cartesian": n("CartesianProduct"),
        "bnlj": n("BroadcastNestedLoopJoin"),
        "exchange": n("Exchange"),
        "broadcast_exchange": n("BroadcastExchange"),
        "sort_aggregate": n("SortAggregate"),
        "sort_merge_join": n("SortMergeJoin"),
        "existing_rdd": n("Scan ExistingRDD"),
        "empty_pushed": txt.count("PushedFilters: []"),
        "capture_failed": txt.startswith("CAPTURE FAILED"),
    }


def main() -> None:
    plans_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "audit"
    rows = []
    for f in sorted(os.listdir(plans_dir)):
        if not f.endswith(f"_{suffix}.txt"):
            continue
        q = f[: -len(f"_{suffix}.txt")]
        rows.append((q, audit_file(os.path.join(plans_dir, f))))
    flagged = 0
    print(f"{'query':34s} Exch BExch SMJ SortAgg PyRow PyArrow BNLJ Cart RDD flags")
    for q, a in rows:
        flags = []
        if a["capture_failed"]:
            flags.append("CAPTURE_FAILED")
        if a["batch_eval_python"]:
            flags.append("ROW_PYTHON_UDF")
        if a["cartesian"]:
            flags.append("CARTESIAN")
        if a["sort_aggregate"]:
            flags.append("SORT_AGG")
        if flags:
            flagged += 1
        print(f"{q:34s} {a['exchange']:4d} {a['broadcast_exchange']:5d} "
              f"{a['sort_merge_join']:3d} {a['sort_aggregate']:7d} "
              f"{a['batch_eval_python']:5d} {a['arrow_eval_python']:7d} "
              f"{a['bnlj']:4d} {a['cartesian']:4d} {a['existing_rdd']:3d} "
              f"{','.join(flags)}")
    print(f"# {len(rows)} plans audited, {flagged} flagged")


if __name__ == "__main__":
    main()
