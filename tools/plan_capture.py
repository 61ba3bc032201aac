"""Capture ``.explain("formatted")`` for registry queries to text files.

Usage::

    python tools/plan_capture.py <out_dir> <suffix> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each named query (all
queries when none named). The judge reads these files to check plan
claims (guide §7.2): Exchange count, join strategy, PushedFilters /
ReadSchema, BatchEvalPython/ArrowEvalPython nodes.

The plan is captured on the DataFrame the query fn returns, on that
DataFrame's OWN session (some queries hand back a child-session frame).
Streaming/stateful queries whose fn executes work eagerly still return a
final DataFrame; its plan is what the noop sink materializes in bench.py,
so it is the right thing to capture.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dbt_decodable_spark.queries import load_all
    from dbt_decodable_spark.session import get_spark

    registry = load_all()
    if not names:
        names = sorted(registry)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_capture")

    for name in names:
        q = registry[name]
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = q.fn(spark, sf_dir)
            # mirror DataFrame.explain("formatted") without stdout capture
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "PLAN CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
