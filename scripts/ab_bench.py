"""Paired A/B bench of two checkouts under identical host conditions.

Usage::

    python scripts/ab_bench.py <tree_a> <tree_b> [rounds] [--llm-only]

Runs ``bench.py`` alternately from each tree (A B B A ...), with a fixed
CPU-speed probe before each run, and prints a per-query comparison of the
MINIMA. The probe contextualizes host drift (this VM's neighbor load does
not appear as steal time); the interleaving cancels slow drift in the
paired comparison.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def probe() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


def run_bench(tree: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    seq = []
    for i in range(rounds):
        seq.extend([("A", a), ("B", b)] if i % 2 == 0 else [("B", b), ("A", a)])
    results: dict[str, list[dict]] = {"A": [], "B": []}
    for label, tree in seq:
        p = probe()
        r = run_bench(tree)
        r["_probe"] = p
        results[label].append(r)
        qs = {**r["queries"], **r["llm_ops"]["queries"]}
        print(f"# {label} probe={p} headline={r['value']} llm={r['llm_ops']['value']} "
              + " ".join(f"{k}={v}" for k, v in qs.items()), flush=True)

    def minq(rs, key_path):
        out: dict[str, float] = {}
        for r in rs:
            qs = r["queries"] if key_path == "headline" else r["llm_ops"]["queries"]
            for k, v in qs.items():
                out[k] = min(out.get(k, 1e9), v)
        return out

    for blk in ("headline", "llm"):
        ma, mb = minq(results["A"], blk), minq(results["B"], blk)
        print(f"== {blk} minima (A vs B):")
        for k in ma:
            ratio = mb[k] / ma[k] if ma[k] else float("inf")
            print(f"  {k}: A={ma[k]:.3f} B={mb.get(k, float('nan')):.3f} B/A={ratio:.2f}")
    print(json.dumps({"A": results["A"], "B": results["B"]}))


if __name__ == "__main__":
    main()
