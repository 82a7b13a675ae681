"""cProfile one engine query's DRIVER-side Python: run the query once
(after generic warm-up) under cProfile and print the top cumulative and
top tottime functions. Job/executor time shows up as py4j socket waits
(``recv``), so the interesting rows are everything that is NOT a socket
read — plan construction, commit-log IO, footer reads, pure-Python
bookkeeping (guide §7.3: driver-side time is invisible in stage
metrics).

Usage: python tools/cprofile_query.py <query> [sf_dir] [topN]

The query runs once UNMEASURED first (lifecycles are self-contained
over fresh tmp tables), so the profiled run is steady-state — first
runs pay one-time codegen/worker-fork costs that would drown the
recurring driver-side work being hunted here.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakesoul_spark.session import lakesoul_session  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    spark = lakesoul_session(
        "cprofile_" + name,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count() \
        .write.format("noop").mode("overwrite").save()

    fn = entrymod.queries()[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    prof = cProfile.Profile()
    prof.enable()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    prof.disable()

    for sort in ("cumulative", "tottime"):
        out = io.StringIO()
        st = pstats.Stats(prof, stream=out)
        st.sort_stats(sort).print_stats(top)
        print(f"==== sorted by {sort} ====")
        print(out.getvalue())


if __name__ == "__main__":
    main()
