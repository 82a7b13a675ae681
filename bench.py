"""Benchmark harness: runs every engine query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query materializes fully through Spark's noop sink (honest
end-to-end cost: scan → shuffle → result, no driver collect skew).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from lakesoul_spark.session import lakesoul_session  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = lakesoul_session(
        "lakesoul_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # warm the JVM (codegen, shuffle machinery, parquet reader, window
    # exec) so per-query timings measure the query, not first-job
    # startup — same role as any JVM benchmark's warmup iterations
    from pyspark.sql import Window

    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count() \
        .write.format("noop").mode("overwrite").save()
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("n_regionkey").orderBy("n_nationkey")),
    ).join(F.broadcast(warm.select("n_nationkey")), "n_nationkey") \
        .write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_query_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
