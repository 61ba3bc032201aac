"""Bench a subset of queries with bench.py's exact methodology (noop sink,
best-of-N, family-boundary resets) for fast optimization iteration.

Usage: python tools/bench_subset.py <query> [query ...]

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPEAT as in
bench.py. Prints one JSON line with per-query best seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dbt_decodable_spark.queries import load_all
    from dbt_decodable_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="bench_subset")

    # bench.py's warm-up
    a = spark.range(100_000).selectExpr("id", "id % 97 AS k")
    b = spark.range(97).selectExpr("id AS k", "id * 2 AS v")
    (a.join(b, "k").groupBy("k").agg({"v": "sum"})
     .write.format("noop").mode("overwrite").save())
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))
    timings: dict[str, float] = {}

    def reset() -> None:
        for sq in spark.streams.active:
            try:
                sq.stop()
            except Exception:
                pass
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.endswith("_sink"):
                try:
                    spark.catalog.dropTempView(t.name)
                except Exception:
                    pass
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    for name in names:
        reset()
        q = registry[name]
        best = -1.0
        for _ in range(repeat):
            t0 = time.time()
            try:
                df = q.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
            except Exception as e:
                print(f"{name} failed: {type(e).__name__}: {e}", file=sys.stderr)
                best = -1.0
                break
            best = dt if best < 0 else min(best, dt)
        timings[name] = round(best, 3)

    print(json.dumps({"queries": timings, "total": round(sum(t for t in timings.values() if t > 0), 3)}))


if __name__ == "__main__":
    main()
