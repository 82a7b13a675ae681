"""Training-set assembly operator tests: sequence packing, shard
shuffle, weighted mixing, vocabulary, duplicate n-gram coverage."""

import pytest
from pyspark.sql import functions as F

from lakesoul_spark.operators import training


def _docs(spark, n=60):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range((i % 9) + 3)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_invariants(spark):
    d = _docs(spark)
    budget = 20
    out = training.pack_sequences(
        d, budget=budget, num_streams=4, seed=7
    ).collect()
    assert sum(r.n_docs for r in out) == 60
    by_stream = {}
    for r in out:
        by_stream.setdefault(r.stream, []).append(r)
    for stream, seqs in by_stream.items():
        seqs.sort(key=lambda r: r.seq_id)
        # seq ids are the windows the stream's running offset visits:
        # strictly increasing, starting at 0
        assert seqs[0].seq_id == 0
        ids = [r.seq_id for r in seqs]
        assert ids == sorted(set(ids))
        # start-offset rule: every sequence except the last must reach
        # its window's start + enter the next (tokens >= 1); a packed
        # sequence can only overflow by its straddling last doc
        for r in seqs:
            assert r.seq_tokens >= 1
            assert 0.0 < r.fill_ratio <= 1.0


def test_pack_sequences_deterministic(spark):
    d = _docs(spark)
    a = sorted(map(tuple, training.pack_sequences(d, budget=32, num_streams=4).collect()))
    b = sorted(map(tuple, training.pack_sequences(
        d.repartition(7), budget=32, num_streams=4).collect()))
    assert a == b  # stable under repartitioning (md5 draw, not rand())


def test_shuffle_shards_partition_of_corpus(spark):
    d = _docs(spark)
    out = training.shuffle_shards(d, num_shards=8, seed=3).collect()
    assert sum(r.n_docs for r in out) == 60
    assert {r.shard for r in out} <= set(range(8))
    # same seed → same split; different seed → (almost surely) different
    again = training.shuffle_shards(d, num_shards=8, seed=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_weighted_mix_composition(spark):
    # 300 a / 100 b: weights .5/.5 → binding stratum b keeps all 100,
    # a keeps ~100 of 300
    rows = [(i, "a" if i < 300 else "b") for i in range(400)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = training.weighted_mix(
        d, id_col="doc_id", strata_col="lang",
        weights={"a": 0.5, "b": 0.5}, seed=1,
    )
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["b"] == 100  # binding stratum keeps 100%
    assert 70 <= counts["a"] <= 130  # ~1/3 rate, md5-draw variance


def test_weighted_mix_excludes_unweighted_strata(spark):
    rows = [(i, ["a", "b", "junk"][i % 3]) for i in range(90)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = training.weighted_mix(
        d, id_col="doc_id", strata_col="lang",
        weights={"a": 0.5, "b": 0.5}, seed=1,
    )
    assert out.filter(F.col("lang") == "junk").count() == 0


def test_vocab_topk_order_and_ties(spark):
    d = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c")], "doc_id long, text string"
    )
    out = [tuple(r) for r in training.vocab_topk(d, k=2).collect()]
    # tf: a=3 b=3 c=2 → tie a/b broken by token text
    assert out == [("a", 3, 2), ("b", 3, 1)]


def test_ngram_dup_coverage(spark):
    shared = "one two three four five"
    d = spark.createDataFrame(
        [(1, shared + " alpha beta gamma delta"),
         (2, shared + " epsilon zeta eta theta"),
         (3, "totally different words here now")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in training.ngram_dup_coverage(d, n=5).collect()}
    assert out[3].dup_shingles == 0 and out[3].dup_frac == 0.0
    # docs 1 and 2 share exactly the one 5-gram "one two three four five"
    assert out[1].dup_shingles == 1 and out[2].dup_shingles == 1
    assert out[1].n_shingles == 5  # 9 tokens → 5 windows
    assert out[1].dup_frac == pytest.approx(0.2)


def test_chunk_documents_coverage_and_overlap(spark):
    d = _docs(spark, n=20)
    out = training.chunk_documents(d, chunk_tokens=5, stride=3).collect()
    src = {r.doc_id: r.text.split(" ") for r in d.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(src)
    for doc_id, chunks in by_doc.items():
        toks = src[doc_id]
        chunks.sort(key=lambda r: r.chunk_id)
        # chunk ids are dense from 0; starts advance by the stride
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        covered = []
        for c in chunks:
            start = c.chunk_id * 3
            want = toks[start:start + 5]
            assert c.chunk_text.split(" ") == want
            assert c.n_tokens == len(want) > 0
            covered.extend(range(start, start + c.n_tokens))
        # every token position is covered at least once
        assert set(covered) == set(range(len(toks)))


def test_chunk_documents_short_doc_single_chunk(spark):
    d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = training.chunk_documents(d, chunk_tokens=10, stride=8).collect()
    assert len(out) == 1
    assert out[0].chunk_text == "a b" and out[0].n_tokens == 2


def test_cap_per_group(spark):
    rows = [(i, f"g{i % 3}") for i in range(90)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = training.cap_per_group(
        d, group_col="source", max_per_group=7, seed=1
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(v) == 7 for v in by_g.values()) and len(by_g) == 3
    # deterministic across invocations
    out2 = training.cap_per_group(
        d, group_col="source", max_per_group=7, seed=1
    ).collect()
    assert {(r.doc_id, r.source) for r in out} == {(r.doc_id, r.source) for r in out2}
    # groups under the cap pass through whole
    small = training.cap_per_group(
        d, group_col="source", max_per_group=100, seed=1
    ).count()
    assert small == 90
