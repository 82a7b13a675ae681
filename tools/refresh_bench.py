"""Phase-level evidence for the O(changed cells) index refresh.

The query-pack pair (``ann_index_refresh`` vs ``ann_index_refresh_hot``)
compares total query walls, which bundle ~4.5 s of shared per-run
fixture rebuild (self-contained oracle contract). This tool isolates
the phases so the refresh delta is directly visible:

    python tools/refresh_bench.py [sf_dir]

prints ONE JSON line per churn shape with seconds per phase:

- ``write``    base-table bulk write
- ``build``    full index build (kmeans + cell-partitioned write)
- ``upsert``   the churn delta upsert
- ``refresh``  incremental refresh — THE number under test:
  ``hot`` churn touches 2 of 16 cells (×2.0 scaling, IEEE-exact and
  cosine-invariant, so old ∪ new cells = {0, 1}) and rewrites 2 cell
  partitions; ``uniform`` churn (vec_id % 7 reversed) touches all 16.
- ``search``   probe-pruned search over the refreshed index

At sf0.1 on local[32] the delta is bounded by per-job scheduler
overhead; at scale the rewrite volume (2 vs 16 partition overwrites)
dominates.

A second JSON line covers the DEDUP band index lifecycle
(``dedup_index_refresh`` bundles it all into one query wall):

- ``write``    corpus bulk write
- ``build``    full band-index build (shingle -> minhash -> postings)
- ``upsert``   churn delta upsert (docs with doc_id % 50 == 1 doubled)
- ``refresh``  incremental refresh — THE number under test: a delta
  upsert of exactly changed x bands posting rows, vs ``build`` which
  recomputes every corpus signature
- ``classify`` indexed ingest classification of the doc_id%5==0 batch
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakesoul_spark.session import lakesoul_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = lakesoul_session(
        "refresh_bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    from lakesoul_spark.operators.similarity import (
        build_vector_index, refresh_vector_index, vector_search,
    )
    from lakesoul_spark.table import LakeSoulTable, write

    base = tempfile.mkdtemp(prefix="lakesoul_refresh_bench_")
    try:
        # warm one full lifecycle so phase timings measure the phase,
        # not one-time machinery
        for rep, churn in enumerate(["hot", "uniform", "hot", "uniform"]):
            path = os.path.join(base, f"{churn}_{rep}")
            e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                "vec_id", "embedding"
            )
            t0 = time.time()
            write(e, path, mode="overwrite",
                  hash_partitions=["vec_id"], hash_bucket_num=4)
            t1 = time.time()
            t = LakeSoulTable.for_path(spark, path)
            idx_path = build_vector_index(t, nlist=16)
            t2 = time.time()
            if churn == "hot":
                idx = LakeSoulTable.for_path(spark, idx_path)
                hot_ids = idx.to_df().filter(F.col("cell") < 2).select("vec_id")
                delta = (
                    t.to_df().join(hot_ids, "vec_id", "semi")
                    .withColumn("embedding", F.transform(
                        "embedding", lambda x: (x * F.lit(2.0)).cast("float")))
                )
            else:
                delta = e.filter(F.col("vec_id") % 7 == 3).withColumn(
                    "embedding", F.reverse("embedding")
                )
            t.upsert(delta)
            t3 = time.time()
            info = refresh_vector_index(t)
            t4 = time.time()
            assert info["mode"] == "incremental", info
            queries = t.to_df().filter(F.col("vec_id") < 8)
            vector_search(t, queries, k=5, nprobe=8, rerank=64) \
                .write.format("noop").mode("overwrite").save()
            t5 = time.time()
            if rep < 2:
                continue  # warm-up pass, unrecorded
            print(json.dumps({
                "metric": "index_refresh_phases",
                "churn": churn,
                "affected_cells": len(info["affected_cells"]),
                "timings": {
                    "write": round(t1 - t0, 3),
                    "build": round(t2 - t1, 3),
                    "upsert": round(t3 - t2, 3),
                    "refresh": round(t4 - t3, 3),
                    "search": round(t5 - t4, 3),
                },
                "unit": "sec",
                "sf_dir": sf_dir,
            }))
        # --- dedup band index: refresh cost vs full signature rebuild
        from lakesoul_spark.operators import dedup

        for rep in range(2):  # first pass warms, second records
            path = os.path.join(base, f"dedup_{rep}")
            d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            )
            corpus = d.filter(F.col("doc_id") % 5 != 0)
            t0 = time.time()
            write(corpus, path, mode="overwrite",
                  hash_partitions=["doc_id"], hash_bucket_num=4)
            t1 = time.time()
            t = LakeSoulTable.for_path(spark, path)
            dedup.build_dedup_index(t, id_col="doc_id", text_col="text",
                                    n=3, num_hashes=32, rows_per_band=2)
            t2 = time.time()
            churn = corpus.filter(F.col("doc_id") % 50 == 1).withColumn(
                "text", F.concat_ws(" ", F.col("text"), F.col("text"))
            )
            t.upsert(churn)
            t3 = time.time()
            info = dedup.refresh_dedup_index(t)
            t4 = time.time()
            assert info["mode"] == "incremental", info
            new = d.filter(F.col("doc_id") % 5 == 0)
            dedup.dedup_against_corpus_indexed(new, t) \
                .write.format("noop").mode("overwrite").save()
            t5 = time.time()
            if rep == 0:
                continue
            print(json.dumps({
                "metric": "dedup_index_phases",
                "changed_ids": info["changed_ids"],
                "postings_rows": info["postings_rows"],
                "timings": {
                    "write": round(t1 - t0, 3),
                    "build": round(t2 - t1, 3),
                    "upsert": round(t3 - t2, 3),
                    "refresh": round(t4 - t3, 3),
                    "classify": round(t5 - t4, 3),
                },
                "unit": "sec",
                "sf_dir": sf_dir,
            }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
