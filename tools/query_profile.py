"""Profile registry queries: run each with the Spark event log enabled in
a dedicated session, then decompose its wall time into jobs / stages /
tasks, per-stage task time, shuffle bytes, and gaps where NO job was
running (driver-side time: planning, commit protocol, py4j round-trips).

Usage: python tools/query_profile.py <query> [query ...]

The driver-gap number is the optimization guide's §7.3 signal: wall time
not covered by any running job = single-threaded driver work.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_eventlog(path: str) -> dict:
    jobs = []  # (start_ms, end_ms)
    stages = {}  # id -> dict
    n_tasks = 0
    task_ms = 0.0
    shuffle_read = 0
    shuffle_write = 0
    for line in open(path):
        try:
            ev = json.loads(line)
        except Exception:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jobs.append([ev["Submission Time"], None])
        elif e == "SparkListenerJobEnd":
            for j in reversed(jobs):
                if j[1] is None:
                    j[1] = ev["Completion Time"]
                    break
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                "tasks": si["Number of Tasks"],
            }
        elif e == "SparkListenerTaskEnd":
            n_tasks += 1
            ti = ev.get("Task Info", {})
            task_ms += ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            tm = ev.get("Task Metrics") or {}
            srm = tm.get("Shuffle Read Metrics") or {}
            swm = tm.get("Shuffle Write Metrics") or {}
            shuffle_read += srm.get("Remote Bytes Read", 0) + srm.get(
                "Local Bytes Read", 0
            )
            shuffle_write += swm.get("Shuffle Bytes Written", 0)
    # merge job intervals to find covered time
    iv = sorted((j for j in jobs if j[1] is not None), key=lambda x: x[0])
    covered = 0
    cur_s = cur_e = None
    for s, e in iv:
        if cur_s is None:
            cur_s, cur_e = s, e
        elif s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
    if cur_s is not None:
        covered += cur_e - cur_s
    span = (iv[-1][1] - iv[0][0]) if iv else 0
    return {
        "n_jobs": len(jobs),
        "n_stages": len(stages),
        "n_tasks": n_tasks,
        "task_time_s": round(task_ms / 1000.0, 2),
        "jobs_covered_s": round(covered / 1000.0, 2),
        "jobs_span_s": round(span / 1000.0, 2),
        "gap_within_span_s": round((span - covered) / 1000.0, 2),
        "shuffle_read_mb": round(shuffle_read / 1e6, 2),
        "shuffle_write_mb": round(shuffle_write / 1e6, 2),
    }


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dbt_decodable_spark.queries import load_all
    from dbt_decodable_spark.session import get_spark

    registry = load_all()
    log_dir = tempfile.mkdtemp(prefix="spark_evlog_")
    spark = get_spark(
        app_name="query_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    # warm-up (bench.py's)
    a = spark.range(100_000).selectExpr("id", "id % 97 AS k")
    b = spark.range(97).selectExpr("id AS k", "id * 2 AS v")
    (a.join(b, "k").groupBy("k").agg({"v": "sum"})
     .write.format("noop").mode("overwrite").save())
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        q = registry[name]
        # bracket the query with a marker job so per-query slices of the
        # single event log can be cut out
        spark.sparkContext.setJobDescription(f"__profile_start__{name}")
        spark.range(1).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        spark.sparkContext.setJobDescription(name)
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"=== {name}: wall={wall:.2f}s", flush=True)

    spark.stop()
    # one applications log file; parse per-query slices by marker
    cands = []
    for root, _dirs, files in os.walk(log_dir):
        for f in files:
            if "events" in f or f.startswith("local-") or f.startswith("app-"):
                cands.append(os.path.join(root, f))
    logf = max(cands, key=os.path.getsize)
    # split events at marker jobs
    slices: dict[str, list[str]] = {}
    current = None
    for line in open(logf):
        if '"__profile_start__' in line:
            try:
                ev = json.loads(line)
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                if desc.startswith("__profile_start__"):
                    current = desc[len("__profile_start__"):]
                    slices[current] = []
                    continue
            except Exception:
                pass
        if current is not None:
            slices[current].append(line)
    for name, lines in slices.items():
        tmp = tempfile.NamedTemporaryFile(
            "w", suffix=".evlog", delete=False
        )
        tmp.writelines(lines)
        tmp.close()
        stats = parse_eventlog(tmp.name)
        os.unlink(tmp.name)
        print(name, json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
