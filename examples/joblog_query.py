"""Run one registered query with the Spark event log enabled and
summarize where its wall-clock went: per-job durations, gaps between
jobs (driver think time: planning, collects-of-nothing, GC, Python),
and the slowest stages.

Usage: python examples/joblog_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = tempfile.mkdtemp(prefix="zs_eventlog_")
    from ziggurat_spark.queries import all_queries
    from ziggurat_spark.session import get_session

    spark = get_session(
        app_name=f"joblog_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    specs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("long", PandasUDFType.SCALAR)
    def _warm(v):
        return v

    spark.range(32).repartition(32).select(_warm("id")).collect()
    from ziggurat_spark.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()

    spark.sparkContext.setJobDescription(f"QUERY:{name}")
    t0 = time.perf_counter()
    df = specs[name].spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    t_end_unix = time.time()
    print(f"wall: {wall:.2f}s")
    spark.stop()

    # parse the event log (Spark 4 may write a rolling-log DIRECTORY)
    logf = [
        os.path.join(evdir, f)
        for f in os.listdir(evdir)
        if not f.startswith(".")
    ][0]
    if os.path.isdir(logf):
        parts = sorted(
            os.path.join(logf, f)
            for f in os.listdir(logf)
            if f.startswith("events_")
        )
        merged = os.path.join(evdir, "merged_events")
        with open(merged, "w") as out:
            for p in parts:
                with open(p) as fh:
                    out.write(fh.read())
        logf = merged
    jobs = []  # (start_ms, end_ms, jobid, desc, ntasks)
    stages = {}  # sid -> (name, submit, complete, ntasks)
    pystats = {"python_worker_ms": 0.0, "task_count": 0, "task_ms": 0.0}
    cur = {}
    with open(logf) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                cur[ev["Job ID"]] = (
                    ev["Submission Time"],
                    (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                )
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in cur:
                    st, desc = cur.pop(jid)
                    jobs.append((st, ev["Completion Time"], jid, desc))
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if si.get("Completion Time"):
                    stages[si["Stage ID"]] = (
                        si["Stage Name"],
                        si["Submission Time"],
                        si["Completion Time"],
                        si["Number of Tasks"],
                    )
            elif e == "SparkListenerTaskEnd":
                tm = ev.get("Task Metrics") or {}
                pystats["task_count"] += 1
                pystats["task_ms"] += (
                    tm.get("Executor Run Time", 0) or 0
                )

    # restrict to the measured query's window
    qjobs = sorted(
        (j for j in jobs if j[3].startswith("QUERY:")),
        key=lambda j: j[0],
    )
    if not qjobs:
        print("no labelled jobs found")
        return
    w0, w1 = qjobs[0][0], max(j[1] for j in qjobs)
    # include the stream/foreachBatch jobs: they run on unlabeled
    # threads inside the query window
    qjobs = [j for j in jobs if w0 <= j[0] <= w1]
    print(
        f"jobs in query window: {len(qjobs)}  "
        f"window: {(w1 - w0) / 1000:.2f}s"
    )
    busy = sum(j[1] - j[0] for j in qjobs)
    print(f"sum of job durations: {busy / 1000:.2f}s")
    # gap analysis: time between consecutive job ends and next starts
    qjobs_sorted = sorted(qjobs, key=lambda j: j[0])
    gaps = []
    prev_end = None
    for st, en, jid, _ in qjobs_sorted:
        if prev_end is not None and st > prev_end:
            gaps.append((st - prev_end, prev_end, jid))
        prev_end = max(prev_end or 0, en)
    gap_total = sum(g[0] for g in gaps)
    print(f"total inter-job gap (driver think): {gap_total / 1000:.2f}s")
    print("\nslowest 25 jobs:")
    for st, en, jid, _ in sorted(
        qjobs, key=lambda j: j[1] - j[0], reverse=True
    )[:25]:
        sids = [
            s
            for s, (nm, ss, sc, nt) in stages.items()
            if ss >= st and sc <= en
        ]
        nm = ""
        if sids:
            top = max(
                sids, key=lambda s: stages[s][2] - stages[s][1]
            )
            nm = stages[top][0][:70]
        print(f"  job {jid}: {(en - st) / 1000:6.2f}s  {nm}")
    print("\nbiggest 15 gaps:")
    for g, at, jid in sorted(gaps, reverse=True)[:15]:
        print(f"  {g / 1000:6.2f}s before job {jid}")
    print(f"\nevent log: {logf}")


if __name__ == "__main__":
    main()
