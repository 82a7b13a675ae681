"""Interleaved A/B of runtime session confs over selected queries.

Runs each named query in alternating A/B cycles inside ONE warmed
session (same JVM, same codegen cache), toggling the given confs
between runs, and reports per-query paired medians — the variance
discipline SCALE.md derived in r13/r14 (single runs on this box swing
up to 2x; paired medians in one session are the only trustworthy
comparison).

Usage:
  python tools/ab_conf.py --conf k=v [--conf k2=v2] --cycles 3 q1 q2 ...

A = session defaults (current code), B = with the --conf overrides.
Order within a cycle is A,B for odd cycles and B,A for even ones so
neither side systematically rides the other's page-cache warmth.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakesoul_spark.session import lakesoul_session  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    confs: dict[str, str] = {}
    cycles = 3
    names: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--conf":
            k, _, v = args[i + 1].partition("=")
            confs[k] = v
            i += 2
        elif a == "--cycles":
            cycles = int(args[i + 1])
            i += 2
        else:
            names.append(a)
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = lakesoul_session(
        "ab_conf", extra_conf={"spark.ui.showConsoleProgress": "false"})
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count() \
        .write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    baseline = {k: spark.conf.get(k, None) for k in confs}

    def set_side(side: str) -> None:
        for k, v in confs.items():
            if side == "B":
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    res: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names}
    for c in range(cycles):
        order = ("A", "B") if c % 2 == 0 else ("B", "A")
        for side in order:
            set_side(side)
            for n in names:
                t0 = time.time()
                qs[n](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                res[n][side].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
                print(f"# cycle{c} {side} {n}: {res[n][side][-1]}s",
                      file=sys.stderr)

    out = {}
    for n in names:
        ma = statistics.median(res[n]["A"])
        mb = statistics.median(res[n]["B"])
        out[n] = {"A_median": ma, "B_median": mb,
                  "ratio_B_over_A": round(mb / ma, 3) if ma else None,
                  "A": res[n]["A"], "B": res[n]["B"]}
    print(json.dumps({"confs": confs, "cycles": cycles,
                      "results": out}, indent=1))


if __name__ == "__main__":
    main()
