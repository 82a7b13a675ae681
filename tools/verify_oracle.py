"""Local mimic of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet fixtures, then
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values canonicalized).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    # fixture-dependent oracles (ANN centroid literals) must train on
    # the SAME sf_dir the Spark queries run against
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lakesoul_spark.session import lakesoul_session

    import __spark_entry__ as e

    spark = lakesoul_session(
        "verify_oracle",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs, os_ = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in os_:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows "
                  f"({spark_s:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_hash = ok_rows and ok_cols and (
            value_hash(srows, scols) == value_hash(drows, dcols)
        )
        if ok_hash:
            print(f"PASS {name}: {len(srows)} rows ({spark_s:.1f}s)")
        else:
            failures.append(name)
            print(f"FAIL {name}: rows {len(srows)}/{len(drows)} "
                  f"cols_ok={ok_cols} hash_ok={ok_hash}")
            if not ok_cols:
                print(f"     spark cols: {sorted(scols)}")
                print(f"     duck  cols: {sorted(dcols)}")
            elif ok_rows and srows:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sl = sorted("\x1f".join(canon(r[i]) for i in order) for r in srows)
                dl = sorted("\x1f".join(canon(r[i]) for i in order) for r in drows)
                for a, b in zip(sl, dl):
                    if a != b:
                        print(f"     spark: {a[:220]}")
                        print(f"     duck : {b[:220]}")
                        break
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
