"""Profile one engine query: run it once with the Spark event log on,
then summarize where wall-clock went — per-job durations (JVM compute)
vs the gaps between jobs (driver-side Python: plan building, commit-log
IO, py4j round-trips).

Usage: python tools/profile_query.py <query> [sf_dir] [--jobs] [--warm]

``--warm`` runs the query once UNMEASURED first (queries are
self-contained lifecycles over fresh tmp tables, so a second run is
independent): the first execution of each distinct plan shape pays
one-time janino/codegen compilation that the bench amortizes across
its warm-up and 3 repeats — a cold single run overstates gap time by
several ×.

Prints total wall, job count, summed job time, gap time, and the top
jobs/gaps with their job descriptions, so optimization targets the
right layer (guide §1: measure first; §7.3: driver-side time is
invisible in stage metrics).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakesoul_spark.session import lakesoul_session  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    show_jobs = "--jobs" in sys.argv

    evdir = tempfile.mkdtemp(prefix="ls_eventlog_")
    spark = lakesoul_session(
        "profile_" + name,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": evdir,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = entrymod.queries()
    fn = qs[name]
    # warm the generic machinery once so the profile measures the query
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count() \
        .write.format("noop").mode("overwrite").save()

    if "--warm" in sys.argv:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 rolling layout: eventlog_v2_<appid>/events_*; fall back
    # to the single-file layout
    cand = [os.path.join(evdir, app_id),
            os.path.join(evdir, app_id + ".inprogress")]
    v2 = os.path.join(evdir, "eventlog_v2_" + app_id)
    lines: list[str] = []
    if os.path.isdir(v2):
        for f in sorted(os.listdir(v2)):
            if f.startswith("events_"):
                with open(os.path.join(v2, f)) as fh:
                    lines += fh.readlines()
    else:
        for path in cand:
            if os.path.exists(path):
                with open(path) as fh:
                    lines = fh.readlines()
                break
    jobs = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", "")[:90],
                    "stages": len(ev.get("Stage IDs", [])),
                }
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["end"] = ev["Completion Time"] / 1000.0

    done = sorted((j for j in jobs.values() if "end" in j),
                  key=lambda j: j["start"])
    # drop the warm-up job(s): everything before the measured t0
    done = [j for j in done if j["end"] >= t0 - 0.05]
    job_time = sum(j["end"] - j["start"] for j in done)
    gaps = []
    prev_end = t0
    for j in done:
        gaps.append((j["start"] - prev_end, j["desc"]))
        prev_end = max(prev_end, j["end"])
    tail_gap = t0 + wall - prev_end
    gap_time = sum(max(0.0, g) for g, _ in gaps) + max(0.0, tail_gap)

    print(f"query={name} wall={wall:.2f}s jobs={len(done)} "
          f"job_time={job_time:.2f}s gap_time={gap_time:.2f}s "
          f"(tail_gap={max(0.0, tail_gap):.2f}s)")
    if show_jobs:
        for j in done:
            print(f"  job {j['end']-j['start']:6.3f}s stages={j['stages']} "
                  f"{j['desc']}")
        print("top gaps:")
        for g, desc in sorted(gaps, key=lambda x: -x[0])[:15]:
            if g > 0.02:
                print(f"  gap {g:6.3f}s before job: {desc}")


if __name__ == "__main__":
    main()
