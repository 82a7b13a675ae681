"""Training-set assembly operators: sequence packing, deterministic
shard shuffle, weighted mixture sampling, vocabulary building, and
duplicate n-gram coverage.

These are the steps BETWEEN a cleaned corpus and a training run:
pick the mixture, shuffle it, pack documents into context windows,
and export shards — plus the corpus-level statistics (vocabulary,
cross-document n-gram duplication) that drive those choices.

Scale design (the 100 TB contract):
- Everything is pure `pyspark.sql.functions` — no UDFs, no driver
  loops, no RNG state. Randomness is an md5 draw on the row id, so
  every selection/order is reproducible in any engine and stable
  across task retries and repartitioning (what a resumable pipeline
  needs; `df.sample()`/`rand()` are neither).
- Sequence packing windows are partitioned by a hashed stream id:
  each stream packs independently, so parallelism is `num_streams`
  (size it like a bucket count) and no global sort ever happens.
- The mixture sampler computes per-stratum rates inside the plan
  (aggregate → broadcast) — counting 100 TB never touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from lakesoul_spark.operators.text import token_count, tokens, word_shingles


def uniform_draw(col, seed: int = 42):
    """Uniform 32-bit draw from md5(seed|id) — the engine-portable
    pseudo-random primitive every operator here builds on."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    num_streams: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Pack documents into fixed token-budget training sequences.

    Documents are dealt into ``num_streams`` independent packing
    streams by a hash draw, pseudo-randomly ordered within each
    stream, and assigned to a sequence by their starting offset in
    the stream's running token count: a document starting inside
    window k belongs to sequence k (contiguous "next-fit" packing, a
    document may straddle its boundary). Returns one row per packed
    sequence: ``(stream, seq_id, n_docs, seq_tokens, fill_ratio)``.

    At 100 TB: the only shuffle is the hash partition by stream; each
    window sort sees ~1/num_streams of the data. ``num_streams`` is
    the parallelism knob (like a bucket count) — there is NO global
    sort or single-partition window anywhere.
    """
    d = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("tok"),
    )
    d = d.withColumn("stream", F.pmod(uniform_draw(F.col("id"), seed), F.lit(num_streams)))
    d = d.withColumn("ord", uniform_draw(F.col("id"), seed + 1))
    w = (
        Window.partitionBy("stream")
        .orderBy("ord", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum", F.sum("tok").over(w))
    d = d.withColumn("seq_id", F.floor((F.col("cum") - F.col("tok")) / F.lit(budget)))
    return (
        d.groupBy("stream", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("seq_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.least(F.col("seq_tokens") / F.lit(float(budget)), F.lit(1.0)), 6),
        )
    )


def shuffle_shards(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    export: shard = md5-draw(id) mod num_shards. Returns per-shard
    stats ``(shard, n_docs, shard_tokens, min_id, max_id)`` — the
    shape a shard-writer consumes (`.write.partitionBy("shard")`).

    The draw makes the shard split reproducible across engines and
    retries, and uniform regardless of input order or id clustering
    (a modulo on raw ids would inherit upstream skew)."""
    d = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("tok"),
    )
    d = d.withColumn("shard", F.pmod(uniform_draw(F.col("id"), seed), F.lit(num_shards)))
    return d.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("shard_tokens"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


def weighted_mix(
    df: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    weights: dict,
    seed: int = 42,
) -> DataFrame:
    """Sample the LARGEST corpus matching a target mixture without
    upsampling: given per-stratum weights (e.g. ``{"en": .6,
    "de": .2, "fr": .2}``), the achievable total is
    ``T = min_s(count_s / w_s)`` and each stratum keeps
    ``rate_s = w_s * T / count_s`` of its rows (the binding stratum
    keeps 100%). Selection is the deterministic md5 draw.

    Differs from ``stratified_sample`` (explicit fractions) in that
    rates are DERIVED from the corpus composition — the aggregate and
    the min fold run inside the plan (count → one-row broadcast), so
    nothing is collected at any scale.
    """
    in_mix = df.filter(F.col(strata_col).isin(*weights.keys()))
    wcol = F.lit(None).cast("double")
    for k, v in sorted(weights.items()):
        wcol = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(wcol)
    counts = (
        in_mix.groupBy(strata_col)
        .agg(F.count("*").alias("n"))
        .withColumn("w", wcol)
    )
    total = counts.agg(F.min(F.col("n") / F.col("w")).alias("t"))
    rates = counts.crossJoin(F.broadcast(total)).select(
        F.col(strata_col).alias("stratum"),
        (F.col("w") * F.col("t") / F.col("n")).alias("rate"),
    )
    draw = uniform_draw(F.col(id_col), seed)
    return (
        in_mix.join(
            F.broadcast(rates), in_mix[strata_col] == rates["stratum"]
        )
        .filter(draw < (F.col("rate") * F.lit(float(1 << 32))).cast("long"))
        .select(id_col, strata_col)
    )


def vocab_topk(
    df: DataFrame,
    *,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Corpus vocabulary: top-k tokens by term frequency with document
    frequency, ``(token, tf, df)``, ties broken by token text.

    One explode + one hash aggregate (map-side combined) + a
    distributed top-k (Spark's TakeOrdered — never a single-partition
    sort); the aggregated vocabulary is orders of magnitude smaller
    than the corpus, so the limit runs on the small side."""
    toks = df.select(
        F.col("doc_id").alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    agg = toks.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.countDistinct("id").alias("df"),
    )
    return agg.orderBy(F.desc("tf"), "token").limit(k)


def ngram_dup_coverage(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document duplicate n-gram coverage (the RefinedWeb-style
    "how much of this document appears elsewhere" signal): the
    fraction of a document's DISTINCT n-gram shingles whose corpus
    document-frequency is ≥ 2. Returns
    ``(doc_id, n_shingles, dup_shingles, dup_frac)``.

    Two hash aggregates + one shuffle join on the shingle — the same
    inverted-index shape as the contamination check; no all-pairs
    work anywhere. Hot shingles only widen their own join groups
    (bounded by doc-freq), and AQE's skew split handles the tail."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col(text_col)), n))
        ).alias("sh"),
    )
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("dfreq"))
    return (
        sh.join(dfreq, "sh")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("dfreq") >= 2, 1).otherwise(0)).alias("dup_shingles"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("dup_shingles") / F.col("n_shingles"), 6)
        )
    )


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking for retrieval/embedding training: each
    document's token stream is cut into windows of ``chunk_tokens``
    starting every ``stride`` tokens (overlap = chunk_tokens - stride),
    the standard prep before embedding long documents. Returns the 1:N
    fan-out ``(doc_id, chunk_id, chunk_text, n_tokens)`` with
    ``chunk_id`` the 0-based window index.

    Map-only at any scale: the window starts are generated per row with
    ``sequence`` and exploded — no shuffle, no UDF, no state. Windows
    that would start at/after the end of a document are never emitted;
    the final window is short rather than padded (padding policy
    belongs to the consumer)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokens(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias("__toks"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("__toks") - 1, F.lit(0)),
        F.lit(stride),
    )
    d = d.select(
        id_col,
        "__toks",
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, F.lit(chunk_tokens))
    return (
        d.filter(F.col("__start") < F.size("__toks"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("long").alias("n_tokens"),
        )
    )


def cap_per_group(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    max_per_group: int = 100,
    seed: int = 42,
) -> DataFrame:
    """Per-group document cap (the RefinedWeb/C4-style per-domain
    limit): keep at most ``max_per_group`` rows per ``group_col``,
    selected by the deterministic md5 draw (ties by id) so the kept
    set is reproducible in any engine and stable across retries.

    One shuffle (the window's partition by group). A pathologically
    hot group serializes its own partition's sort; at 100 TB pre-cap
    hot groups with an approximate count-min pass, or rely on the
    window sort spilling — correctness is unaffected either way."""
    w = Window.partitionBy(group_col).orderBy(
        uniform_draw(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.select(id_col, group_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_group)
        .select(id_col, group_col)
    )


def class_centroids(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-class embedding centroid in LONG FORM — one row per
    (label, dimension) with the member count and the component mean —
    the class-balance / embedding-drift audit a labeled corpus runs
    before training (are classes separable? did an ingest batch shift
    a class's centroid?).

    Determinism contract: components quantized to integer MICRO-UNITS
    (round(v·1e6) — double round(), the one rounding op proven
    identical across engines here; a direct float→decimal cast is
    not, it flipped 2/640 values by one ulp), exact bigint sums
    (order-insensitive), then PURE IEEE double divisions with no
    final rounding (a last round(x, 6) hit a half-way tie on one of
    1920 fixture groups; identical inputs through identical IEEE ops
    need no rounding to hash-match). Plan
    shape (100 TB): posexplode streams (rows × dims) through ONE
    map-side-combined hash agg keyed by (label, dim) — agg state is
    |labels| × dims regardless of corpus size; no driver-side
    vectors, no UDFs.
    """
    e = emb.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    micro = F.round(F.col("v").cast("double") * 1e6).cast("long")
    return e.groupBy(label_col, "pos").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(micro).cast("double") / F.lit(1e6) / F.count(F.lit(1)))
        .alias("mean_val"),
    )
