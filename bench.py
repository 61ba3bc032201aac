"""Benchmark harness (driver contract): run the engine's queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print JSON::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two lines, same headline number: first the full per-query detail (~6 KB),
then a compact (<1 KB) summary whose tail survives the driver's capture
window — the driver parses the LAST complete JSON object on stdout.

Each query is materialized through the ``noop`` sink (full execution, no
driver collect). Every query runs ``$SPARK_GRAFT_BENCH_REPEAT`` times
(default 3) and reports the per-query BEST — separating real regressions
from run-to-run noise (VERDICT r2 #10). value = total of per-query best
wall seconds across all queries.

Round-14 harness additions (VERDICT r13 item 2 — measurement transparency,
no timing-methodology change): both JSON lines now echo the effective
``master`` / ``defaultParallelism`` under ``"scaling"``, and a synthetic
fixed-work CPU-bound calibration row ``calibrate_cpu_scaling`` (not a
registered query) is timed with the same repeat/best-of discipline and
reported inside ``queries`` so the driver's 8-vs-32-core probe has one row
whose ratio is ~cores-proportional. The canary is EXCLUDED from ``value``;
the headline number and every registered query's timing methodology are
unchanged, so BENCH_r14 remains directly comparable with BENCH_r13.

Isolation (VERDICT r5 #8): queries run grouped by family (name prefix), and
at every family boundary the harness stops any streaming query still
active, drops the memory-sink temp views earlier streaming runs parked in
the driver, clears the block-manager cache, and forces a JVM GC — so one
family's leftovers (sink rows pinned in driver memory, cached relations,
deferred GC debt) can't inflate a later family's timings. Cross-family
interference was the round-5 false-regression mode (subquery_* showed 2x
with an unchanged, optimal plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from dbt_decodable_spark.queries import load_all
    from dbt_decodable_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="bench")

    # warm-up: JVM/codegen/AQE spin-up + the Python/Arrow worker pool, so
    # one-time process costs don't land on the first queries. Synthetic data
    # only — no bench-table reads, so nothing data-dependent is cached.
    a = spark.range(100_000).selectExpr("id", "id % 97 AS k")
    b = spark.range(97).selectExpr("id AS k", "id * 2 AS v")
    (
        a.join(b, "k")  # broadcast join
        .groupBy("k")  # shuffle + partial/final hash agg under AQE
        .agg({"v": "sum"})
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))
    timings: dict[str, float] = {}
    total = 0.0

    def family(n: str) -> str:
        return n.split("_", 1)[0]

    def family_boundary_reset() -> None:
        """Drop cross-family state: leaked streams, memory-sink views,
        cached blocks; then ask the JVM for a GC so the next family starts
        from a clean heap instead of paying the previous family's debt."""
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

    # Host-drift sentinels (VERDICT r8 item 8 / r11 item 6): a fixed
    # 3-query calibration set, trivially-planned and untouched for rounds,
    # whose in-bench walls are compared against the r8 driver-bench
    # calibration. The BENCH series crosses hosts with 2-6x drift; the
    # sentinel ratio is the only way to read a total across sessions, so
    # every emitted JSON carries it — value_normalized = value / median
    # sentinel ratio is the cross-host-comparable headline.
    sentinel_cal = {
        "tpch_q14_promo_revenue": 0.266,
        "where_predicates": 0.147,
        "text_strip_markup": 0.110,
    }

    # CPU-scaling canary (VERDICT r13 item 2): the driver probes the bench
    # at 8 vs 32 cores, but at sf0.1 every registered query is fixed-cost
    # bound (planning, commit protocol, streaming micro-batch machinery) so
    # all ratios read ~1 and the driver cannot distinguish "honors
    # $SPARK_GRAFT_CPUS but overhead-bound at this SF" from "ignores it".
    # This row is a fixed-size (sf-independent), shuffle-free, hash-heavy
    # aggregate: ~55-60 core-seconds of pure JVM codegen work over
    # spark.range (24-deep xxhash64 chain x 300M rows — sized so real work
    # dominates the ~0.3 s scan/scheduling overhead; the original 8x200M
    # held only ~2.5 core-seconds of hashing and its 8-vs-32 ratio read
    # 1.8, which would NOT refute suspect_cpus_ignored; this sizing
    # measures 2.0 s @32 vs 6.1 s @8 = 3.1x on the build host),
    # embarrassingly parallel, so its wall time scales ~1/cores. It is NOT
    # a registered query and is EXCLUDED from `value` (kept out of
    # `timings`; reported separately and force-included in both `queries`
    # dicts) so the headline stays comparable with BENCH_r13 and earlier.
    def time_cpu_canary() -> float:
        from pyspark.sql import functions as F

        best_c = -1.0
        for _ in range(repeat):
            t0 = time.time()
            c = F.col("id")
            for _ in range(24):
                c = F.xxhash64(c)
            (
                spark.range(300_000_000)
                .select(c.alias("h"))
                .agg(F.expr("bit_xor(h)").alias("x"))  # xor: overflow-free under ANSI
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            dt = time.time() - t0
            best_c = dt if best_c < 0 else min(best_c, dt)
        return round(best_c, 3)

    prev_family = None
    for name, q in sorted(registry.items()):
        if family(name) != prev_family:
            family_boundary_reset()
            prev_family = family(name)
        best = -1.0
        for _ in range(repeat):
            t0 = time.time()
            try:
                df = q.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
            except Exception as e:  # a failing query gets a sentinel, not a crash
                print(f"bench: {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
                # a failure on ANY repeat marks the query failed — an earlier
                # repeat's success must not mask it in the compact summary
                best = -1.0
                break
            best = dt if best < 0 else min(best, dt)
        timings[name] = round(best, 3)
        if best > 0:
            total += best

    family_boundary_reset()
    canary_sec = time_cpu_canary()

    ratios = sorted(
        timings[n] / cal
        for n, cal in sentinel_cal.items()
        if timings.get(n, -1) > 0
    )
    sent_ratio = round(ratios[len(ratios) // 2], 3) if ratios else None
    sentinels = {
        "calibration": "r8 driver in-bench",
        "queries": {
            n: timings.get(n) for n in sentinel_cal
        },
        "ratio_median": sent_ratio,
    }
    value_norm = (
        round(total / sent_ratio, 3) if sent_ratio and sent_ratio > 0 else None
    )
    # Echo the EFFECTIVE master/parallelism (VERDICT r13 item 2) so the
    # driver's core-scaling probe can attest that $SPARK_GRAFT_CPUS was
    # honored instead of inferring it from overhead-bound query ratios.
    sc = spark.sparkContext
    scaling_echo = {
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        # synthetic fixed-work row; in `queries` for the probe, NOT in value
        "cpu_canary_not_in_value": "calibrate_cpu_scaling",
    }
    detail_queries = dict(timings)
    detail_queries["calibrate_cpu_scaling"] = canary_sec
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": detail_queries,
                "sf": sf,
                "n_queries": len(timings),
                "repeat": repeat,
                "aggregation": "best_of_n",
                "sentinels": sentinels,
                "value_normalized": value_norm,
                "scaling": scaling_echo,
            }
        )
    )
    # The driver's capture window keeps the TAIL of stdout and the ~6 KB
    # detail line above gets head-truncated (every BENCH_r1-r6 recorded
    # parsed: null). Emit a final COMPACT line (<1 KB) so the tail always
    # ends with one complete parseable JSON object carrying the headline
    # number plus the 10 slowest queries.
    slowest = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t > 0),
            key=lambda kv: kv[1],
            reverse=True,
        )[:10]
    )
    # force-include the canary so the driver's 8-vs-32-core probe always
    # sees it in the compact tail regardless of its slowest-10 rank
    slowest["calibrate_cpu_scaling"] = canary_sec
    failed = sorted(n for n, t in timings.items() if t < 0)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "n_failed": len(failed),
                "failed": failed,
                "repeat": repeat,
                "aggregation": "best_of_n",
                # the documented schema says "queries" carries a per-query
                # dict; the compact tail ships the slowest-10 subset so the
                # last parseable object still satisfies the contract
                # (full per-query timings are on the preceding detail line)
                "queries": slowest,
                "queries_truncated_to_slowest": 10,
                "sentinels": sentinels,
                "value_normalized": value_norm,
                "scaling": scaling_echo,
            }
        )
    )


if __name__ == "__main__":
    main()
