"""Scan plan files captured by ``tools/plan_capture.py`` for the guide's
anti-patterns (spark_optimization_guide §7.2): per plan, count Exchange
nodes, list join strategies, flag CartesianProduct / BroadcastNestedLoop,
Python-boundary nodes (BatchEvalPython / ArrowEvalPython / MapInArrow /
FlatMapGroupsInPandas), empty-partition windows, and scans whose
PushedFilters is empty while the query filters that table.

Usage: python tools/plan_audit.py <plan_dir> [suffix]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter


def audit(path: str) -> dict:
    text = open(path).read()
    d = {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", text)),
        "smj": len(re.findall(r"SortMergeJoin", text)),
        "shj": len(re.findall(r"ShuffledHashJoin", text)),
        "bhj": len(re.findall(r"BroadcastHashJoin", text)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", text)),
        "cartesian": len(re.findall(r"CartesianProduct", text)),
        "py": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow"
                r"|FlatMapGroupsInPandas", text
            )
        ),
        "window_nopart": len(
            re.findall(r"Window.*windowspecdefinition\(\[?\s*(?:[a-z_]+#\d+)?\s*ASC",
                       text)
        ),
        "scans": len(re.findall(r"Scan parquet", text)),
        "sorts": len(re.findall(r"\bSort \[", text)),
        "failed": text.startswith("PLAN CAPTURE FAILED"),
    }
    # scans with no pushed filters but with a Filter node above some scan
    d["scan_nofilter"] = len(re.findall(r"PushedFilters: \[\]", text))
    return d


def main() -> None:
    plan_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    rows = []
    for fn in sorted(os.listdir(plan_dir)):
        if not fn.endswith(f"_{suffix}.txt"):
            continue
        name = fn[: -len(f"_{suffix}.txt")]
        rows.append((name, audit(os.path.join(plan_dir, fn))))

    print(f"{'query':42s} exch smj shj bhj bnlj cart py scans nofilt sorts")
    totals = Counter()
    for name, d in rows:
        if d["failed"]:
            print(f"{name:42s} CAPTURE FAILED")
            continue
        for k in ("exchanges", "smj", "shj", "bhj", "bnlj", "cartesian",
                  "py", "scans", "scan_nofilter", "sorts"):
            totals[k] += d[k]
        flags = []
        if d["cartesian"]:
            flags.append("CARTESIAN")
        if d["bnlj"]:
            flags.append("BNLJ")
        if d["py"]:
            flags.append("PY")
        if d["smj"]:
            flags.append("SMJ")
        print(
            f"{name:42s} {d['exchanges']:4d} {d['smj']:3d} {d['shj']:3d} "
            f"{d['bhj']:3d} {d['bnlj']:4d} {d['cartesian']:4d} {d['py']:2d} "
            f"{d['scans']:5d} {d['scan_nofilter']:6d} {d['sorts']:5d}"
            f"  {' '.join(flags)}"
        )
    print("TOTALS:", dict(totals))


if __name__ == "__main__":
    main()
