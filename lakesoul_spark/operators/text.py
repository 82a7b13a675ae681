"""Text-analysis operators: tokenization, shingles, language-ID
heuristic, quality scoring, token counting, document fingerprinting.

All pure `pyspark.sql.functions` expressions — JVM-side, codegen'd,
shuffle-free (per-row) — designed to run over a 100 TB `documents`
table with nothing but map tasks. Formulas are deliberately portable
ANSI SQL so each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


# the EXPLICIT ASCII whitespace class, spelled out because Java regex
# \s includes \x0B while RE2's (DuckDB's) does not — every tokenizing
# expression here and every DuckDB oracle twin must use this same
# class or a vertical-tab in a document silently shifts token
# boundaries between engines
WS_CLASS = " \t\n\x0B\f\r"


def tokens(col: Column) -> Column:
    """Lower-cased whitespace tokens (explicit ASCII class — see
    WS_CLASS)."""
    return F.split(F.lower(F.trim(col)), f"[{WS_CLASS}]+")


def word_shingles(tok_col: Column, n: int) -> Column:
    """Word n-gram shingles; documents shorter than n tokens collapse to
    a single whole-document shingle."""
    idx = F.sequence(F.lit(1), F.size(tok_col) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok_col, i, n)))
    return F.when(F.size(tok_col) >= n, grams).otherwise(
        F.array(F.concat_ws(" ", tok_col))
    )


def token_count(col: Column) -> Column:
    """Whitespace token count plus a BPE-ish subword estimate: long
    tokens cost extra units per 4 chars beyond the first 4."""
    toks = tokens(col)
    extra = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.floor((F.length(t) - 1) / 4).cast("long"),
    )
    return (F.size(toks) + extra).alias("token_est")


def occurrence_count(col: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whitespace-delimited token, via the
    portable pad-and-replace identity (identical in any SQL engine)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


# marker words per language for the n-gram/stopword language-ID
# heuristic; ties break by list order (deterministic argmax)
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of"]),
    ("de", ["der", "die", "und"]),
    ("es", ["el", "la", "de"]),
    ("fr", ["le", "la", "et"]),
    ("zh", ["zh0", "zh1", "zh2"]),
]


def lang_scores(col: Column) -> list[tuple[str, Column]]:
    out = []
    for lang, words in LANG_MARKERS:
        s = None
        for w in words:
            c = occurrence_count(col, w)
            s = c if s is None else s + c
        out.append((lang, s))
    return out


def lang_id(col: Column) -> Column:
    """Deterministic argmax over marker-word counts — earlier language
    in LANG_MARKERS wins ties; 'und' when no marker appears."""
    scores = lang_scores(col)
    expr = None
    for i, (lang, s) in enumerate(scores):
        cond = s > 0
        for j, (_, s2) in enumerate(scores):
            if j < i:
                cond = cond & (s > s2)   # must beat every earlier language
            elif j > i:
                cond = cond & (s >= s2)  # ties with later languages are ok
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: length credit, mean-token-length
    window, stopword presence — the standard cheap pre-filters of a
    training-data pipeline. Pure arithmetic → exact SQL oracle."""
    toks = tokens(col)
    n = F.size(toks)
    n_chars = F.length(col)
    mean_tok = n_chars / n
    stop = occurrence_count(col, "the") + occurrence_count(col, "a")
    len_credit = F.least(n / F.lit(64.0), F.lit(1.0))
    tok_credit = F.when((mean_tok >= 3) & (mean_tok <= 10), 1.0).otherwise(0.5)
    stop_credit = F.when(stop > 0, 1.0).otherwise(0.6)
    return F.round(
        0.4 * len_credit + 0.3 * tok_credit + 0.3 * stop_credit, 6
    )


def doc_fingerprint(col: Column, n: int = 5) -> Column:
    """Rolling-hash document fingerprint: min md5 over word 5-gram
    windows (a locality-stable content signature; equal for documents
    sharing their minimal window)."""
    sh = word_shingles(tokens(col), n)
    return F.array_min(F.transform(sh, F.md5))


# PII patterns: deliberately simple, deterministic regexes (a real
# pipeline swaps in model-based NER; the Spark-side shape — pure
# regexp_replace expressions, no UDF — is what matters at 100 TB).
PII_PATTERNS: list[tuple[str, str]] = [
    # email first so later rules never see the user@host text
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # 16-digit card-like runs (with optional space/dash groups)
    (r"\b(?:\d[ -]?){15}\d\b", "<CARD>"),
    # US-ish SSN
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # phone-like runs: optional +country, 9-12 digits with separators
    (r"(?:\+\d{1,3}[ -]?)?(?:\(\d{2,4}\)[ -]?)?\d{3}[ -]\d{3,4}[ -]?\d{0,4}\b", "<PHONE>"),
    # IPv4
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_pii(col: Column) -> Column:
    """Chained regexp_replace redaction — stays inside codegen; rule
    order is part of the contract (email before phone, etc.)."""
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def repetition_stats(col: Column) -> list[Column]:
    """Gopher/C4-style repetition + composition signals, as pure
    expressions (one projection, no shuffle):

    - ``dup_line_frac``: fraction of lines that are duplicates of an
      earlier line (line-level boilerplate detector),
    - ``mean_word_len``: mean token length in chars,
    - ``symbol_word_ratio``: non-alphanumeric-and-non-space chars per
      token,
    - ``top_token_frac``: occurrences of the most frequent token over
      all tokens (degenerate-repetition detector).
    """
    lines = F.split(col, r"\n")
    n_lines = F.size(lines)
    toks = tokens(col)
    n_toks = F.size(toks)
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    symbols = F.length(F.regexp_replace(col, f"[A-Za-z0-9{WS_CLASS}]", ""))
    # max token frequency via sort + run-length fold — O(n log n) per
    # row, not the O(n^2) distinct-x-count nested loop
    run = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
    )
    top_tf = run["best"]
    return [
        F.round(
            (n_lines - F.size(F.array_distinct(lines))) / n_lines, 6
        ).alias("dup_line_frac"),
        F.round(total_chars / n_toks, 6).alias("mean_word_len"),
        F.round(symbols / n_toks, 6).alias("symbol_word_ratio"),
        F.round(top_tf / n_toks, 6).alias("top_token_frac"),
    ]


def ngram_repetition_stats(col: Column, ns=(2, 3, 4)) -> list[Column]:
    """Gopher-style top-n-gram character fractions (Rae et al. 2021,
    table A1: "fraction of characters contained within the most
    frequently-occurring n-gram"), one expression-only projection per
    n — no shuffle, no UDF, map-only at any corpus size.

    Exact definition (both this and the DuckDB oracle implement it
    verbatim): tokens = lowercase text split on whitespace; the
    n-grams are every n consecutive tokens; among the most frequent
    n-grams the LEXICOGRAPHICALLY SMALLEST is chosen (determinism —
    engines disagree on hash-map iteration order, never on order);
    ``frac = freq × token_chars(gram) / total_token_chars`` where
    token_chars excludes the joining spaces. Documents with fewer
    than n tokens score 0.

    The single-pass max+argmax uses the same sort + run-length fold
    as :func:`repetition_stats` — O(tokens·log tokens) per row; an
    ascending sort makes "keep the first best" equal "smallest among
    the tied-best"."""
    toks = tokens(col)
    n_toks = F.size(toks)
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    out = []
    for n in ns:
        # the n_toks < n guard below means this branch only ever
        # evaluates where word_shingles returns the plain gram list
        # (its short-doc whole-document collapse is unreachable)
        grams = word_shingles(toks, n)
        run = F.aggregate(
            F.array_sort(grams),
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
                F.lit("").alias("best_gram"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long")).alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1)
                    .otherwise(F.lit(1).cast("long")),
                ).alias("best"),
                # strictly-greater keeps the FIRST (smallest) gram on ties
                F.when(
                    F.when(x == acc["prev"], acc["run"] + 1)
                    .otherwise(F.lit(1).cast("long")) > acc["best"],
                    x,
                ).otherwise(acc["best_gram"]).alias("best_gram"),
            ),
        )
        gram_chars = F.length(run["best_gram"]) - (n - 1)
        out.append(
            F.when(
                (n_toks < n) | (total_chars <= 0), F.lit(0.0)
            ).otherwise(
                F.round(run["best"] * gram_chars / total_chars, 6)
            ).alias(f"top{n}gram_char_frac")
        )
    return out


# Gopher's stop-word set (Rae et al. 2021, table A1): a document
# passing the rule contains at least 2 of these
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_rules(col: Column) -> list[Column]:
    """The remaining Gopher quality-rule signals (Rae et al. 2021,
    table A1) as pure expressions — with :func:`repetition_stats` and
    :func:`ngram_repetition_stats` this completes the standard
    pre-training quality-filter suite, all map-only:

    - ``bullet_line_frac``: fraction of lines starting with a bullet
      (•, -, *) after left-trim (rule: must be < 0.9),
    - ``ellipsis_line_frac``: fraction of lines ending with ... or …
      after right-trim (rule: < 0.3),
    - ``alpha_word_frac``: fraction of tokens containing at least one
      ASCII letter (rule: > 0.8),
    - ``stopword_hits``: how many DISTINCT words of Gopher's 8-word
      stop set appear (rule: >= 2).

    Empty documents score 0 everywhere (they fail the word-count rule
    before these apply)."""
    # split on \r?\n so CRLF documents don't leave a trailing \r on
    # every line (Java's $ matches before a final line terminator,
    # RE2's does not — suffix checks below avoid anchors entirely)
    lines = F.split(col, r"\r?\n")
    n_lines = F.size(lines)
    toks = tokens(col)
    n_toks = F.size(toks)

    def line_frac(pred):
        return F.when(n_lines <= 0, F.lit(0.0)).otherwise(
            F.round(F.size(F.filter(lines, pred)) / n_lines, 6)
        )

    bullet = line_frac(
        lambda ln: F.ltrim(ln).rlike(r"^[•\-\*]")
    )
    ellipsis = line_frac(
        lambda ln: F.endswith(F.rtrim(ln), F.lit("..."))
        | F.endswith(F.rtrim(ln), F.lit("…"))
    )
    alpha = F.when(n_toks <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n_toks,
            6,
        )
    )
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        lambda w: F.array_contains(toks, w),
    )).cast("long")
    return [
        bullet.alias("bullet_line_frac"),
        ellipsis.alias("ellipsis_line_frac"),
        alpha.alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    ]


def tfidf_top_terms(
    df: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document salient terms by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, the sklearn smoothing) — the
    standard corpus-statistics pass a training-data pipeline runs for
    keyword extraction / topic tagging / quality triage.

    Plan (scale notes for the 100 TB corpus):
    - explode → partial-aggregated ``count`` per (doc, term) and per
      term — map-side combine absorbs stopword skew before the
      shuffle;
    - the corpus size N rides the plan as a broadcast 1-row aggregate
      (never a driver collect);
    - the tf⋈df join shuffles on the term key (vocabulary-sized, far
      smaller than the corpus), then one window per doc ranks terms.

    Ranking key is ``round(score, 9)`` desc with a term tie-break: the
    9-digit round makes the ordering robust to last-ulp ``ln``
    differences across engines, keeping the operator value-hash
    oracle-checkable.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1) / (F.col("df_docs") + 1)) + 1),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("score"), 9).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col, "term", "tf", "df_docs",
            F.round("score", 6).alias("score"), "rank",
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval: score every document against a fixed query-term
    set and return the top ``k`` — the retrieval pass a training-data
    pipeline runs for contamination screens and targeted corpus pulls.
    Standard Okapi BM25 with the Lucene-robust IDF
    ``ln((N - df + 0.5)/(df + 0.5) + 1)`` (never negative) and the
    usual ``k1``/``b`` length normalization.

    Plan (100 TB corpus — two corpus scans total):
    - tokenize → explode → FILTER to the query terms **before** the
      shuffle — the per-(doc, term) aggregation state is bounded by
      |query| × matched docs, never the vocabulary; the doc length
      ``dl`` rides the same scan as a grouping key (constant per
      doc), so no separate length scan or join;
    - ``df`` per term and the (N, Σdl) corpus stats ride the plan as
      broadcast aggregates (one row / |query| rows — never a driver
      collect); the stats aggregate is the only other corpus scan
      (it must count docs with no query term); the matched ``tf`` set
      is persisted so the ``df`` branch reuses it instead of
      re-tokenizing the corpus;
    - per-term scores computed in pure double arithmetic (IEEE —
      bit-identical across engines), summed per doc through
      ``decimal(18,9)`` (exact, order-insensitive: a double is never
      exactly halfway between two decimal(·,9) neighbors, so the cast
      rounds identically everywhere), final cast back to double;
    - ranking on ``round(score, 9)`` desc with an ``id`` tie-break →
      value-hash-stable against a SQL oracle.

    Reference parity: the exact top-k discipline mirrors the
    reference's ``rerank_by_distance``
    (``python/src/lakesoul/vector_index.py:263-312``) — score
    everything cheaply, rank exactly, cut at k with a total order.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    stats = base.select(F.size("toks").cast("long").alias("dl")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    tf = (
        base.select(
            F.col(id_col),
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    ).persist()  # df_t AND the score join both read tf: without the
    # persist the df_t branch re-tokenizes the whole corpus (a third
    # scan); the matched set is |query|×docs and spills to disk
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    # norm = k1 * (1 - b + b * dl / avgdl); idf * (tf*(k1+1)) / (tf + norm)
    # — parenthesization mirrored verbatim in the oracle SQL
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df_docs") + 0.5) / (F.col("df_docs") + 0.5)
        + 1
    )
    tscore = (
        idf
        * (F.col("tf") * F.lit(k1 + 1))
        / (F.col("tf") + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * (F.col("dl") / avgdl)))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), tscore.alias("tscore"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(F.col("tscore").cast("decimal(18,9)")).cast("double").alias("score"),
    )
    # global top-k via sort+limit (TakeOrderedAndProject: per-partition
    # heads merged on the driver — no single-task global sort), THEN a
    # rank window over the k survivors only
    key = [F.round(F.col("score"), 9).desc(), F.col(id_col).asc()]
    topk = per_doc.orderBy(*key).limit(k)
    w = Window.orderBy(*key)
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(id_col, "n_terms", F.round("score", 6).alias("score"), "rank")
    )


def bm25_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """Batched BM25: score every document against a TABLE of queries
    (``query_id``, ``term`` rows — the shape of a contamination screen
    running thousands of query strings) and return each query's top
    ``k``. Scoring semantics are identical to :func:`bm25_topk`
    applied per query (same IDF, length normalization, decimal-exact
    sums, round(·,9)+id tie-break ranking).

    Plan (100 TB corpus, exactly TWO corpus scans regardless of query
    count):
    - the distinct term set joins the exploded token stream as a
      broadcast (thousands of terms stay off the plan text, unlike an
      ``isin`` literal), filtering BEFORE the shuffle — per-(doc,
      term) aggregation state is |matched (doc, term)|;
    - the matched ``tf`` set is **persisted** (memory+disk): per-term
      document frequencies and per-query scores both derive from it,
      so neither triggers a third tokenize-the-corpus pass — at scale,
      spilling the matched set is orders cheaper than re-reading the
      corpus (same discipline as :func:`bm25_topk`);
    - scores fan out to (query, doc, term) via a broadcast of the
      query table — aggregation state |matched (doc, term, query)|;
    - per-query top-k via ONE ``row_number <= k`` window partitioned
      by ``query_id``. Skew cap: because the rank filter is a
      row_number limit, Spark plans a PARTIAL ``WindowGroupLimit``
      below the exchange — each map task forwards at most ``k`` rows
      per query (a per-(query, partition) head), so a query matching
      most of the corpus ships and ranks at most ``k x partitions``
      rows instead of serializing its whole candidate set into one
      task. Exact (top-k of local top-ks under one deterministic
      total order: round(score, 9) desc, id asc), zero extra stages;
      the plan-shape test pins the Partial limit so a planner or
      ordering change that silently drops it fails CI.
    """
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.lower(F.col(term_col)).alias("term"),
    ).distinct()
    uniq = qt.select("term").distinct()
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    stats = base.select(F.size("toks").cast("long").alias("dl")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    tf = (
        base.select(
            F.col(id_col),
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .join(F.broadcast(uniq), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    ).persist()
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df_docs") + 0.5) / (F.col("df_docs") + 0.5)
        + 1
    )
    tscore = (
        idf
        * (F.col("tf") * F.lit(k1 + 1))
        / (F.col("tf") + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * (F.col("dl") / avgdl)))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qt), "term")
        .select("query_id", F.col(id_col), tscore.alias("tscore"))
    )
    per = scored.groupBy("query_id", id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(F.col("tscore").cast("decimal(18,9)")).cast("double").alias("score"),
    )
    key = [F.round(F.col("score"), 9).desc(), F.col(id_col).asc()]
    w = Window.partitionBy("query_id").orderBy(*key)
    return (
        per.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "n_terms",
                F.round("score", 6).alias("score"), "rank")
    )


def corpus_profile(
    df: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.9),
) -> DataFrame:
    """Per-source corpus audit: document counts, token/char totals, and
    EXACT rank-based quantiles (``percentile_disc`` semantics: the
    value at ascending rank ``ceil(p·n)``) over document length and
    quality score — the standard pre-training data-audit pass.

    Interpolating percentiles (``percentile_approx`` / ``quantile_cont``)
    don't hash-match across engines; the value at a rank in the sorted
    multiset does, and is deterministic regardless of tie order.

    Plan (skew-safe exact quantiles — no per-document window anywhere,
    one corpus scan, no self-joins):
    1. unpivot each doc to two (source, metric, value) rows — metric
       'dl' carries the char count alongside;
    2. ONE exchange keyed (source, metric, value) with map-side
       combine collapses duplicate values into counts — a huge source
       spreads across the cluster instead of serializing into a task;
    3. a cumulative-count window per (source, metric) runs over at
       most |distinct values| rows (quality rounds to 6 decimals with
       ~260 reachable values; dl is bounded by the longest document),
       never over documents;
    4. each quantile is ``min value whose running count ≥ ceil(p·n)``
       — identical ``percentile_disc`` semantics: the value at
       ascending multiset rank ``ceil(p·n)`` IS the smallest value
       whose cumulative count reaches that rank.
    """
    src = F.col(source_col)
    txt = F.col(text_col)
    per = df.select(
        src.alias("source"),
        F.size(tokens(txt)).cast("long").alias("dl"),
        F.length(txt).cast("long").alias("n_chars"),
        quality_score(txt).alias("quality"),
    )
    # unpivot: dl is exact in double (< 2^53), cast back to long on output
    expanded = per.select(
        "source",
        F.explode(F.array(
            F.struct(
                F.lit("dl").alias("metric"),
                F.col("dl").cast("double").alias("v"),
                F.col("n_chars").alias("chars"),
            ),
            F.struct(
                F.lit("q").alias("metric"),
                F.col("quality").alias("v"),
                F.lit(0).cast("long").alias("chars"),
            ),
        )).alias("e"),
    ).select("source", "e.metric", "e.v", "e.chars")
    cnt = expanded.groupBy("source", "metric", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("chars").alias("chars"),
    )
    w_cum = (
        Window.partitionBy("source", "metric").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy("source", "metric").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = cnt.select(
        "source", "metric", "v",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(w_all).alias("n"),
        F.sum(F.when(F.col("metric") == "dl",
                     F.col("v").cast("long") * F.col("c")))
        .over(w_all).alias("toks"),
        F.sum("chars").over(w_all).alias("tchars"),
    )
    is_dl = F.col("metric") == "dl"
    aggs = [
        F.max(F.when(is_dl, F.col("n"))).alias("n_docs"),
        F.max(F.when(is_dl, F.col("toks"))).alias("total_tokens"),
        F.max(F.when(is_dl, F.col("tchars"))).alias("total_chars"),
    ]
    for p in quantiles:
        tag = str(int(round(p * 100)))
        pos = F.ceil(F.lit(p) * F.col("n")).cast("long")
        hit = F.col("cc") >= pos
        aggs.append(
            F.min(F.when(is_dl & hit, F.col("v"))).cast("long")
            .alias(f"p{tag}_tokens")
        )
        aggs.append(
            F.min(F.when(~is_dl & hit, F.col("v")))
            .alias(f"p{tag}_quality")
        )
    return cum.groupBy("source").agg(*aggs)


def corpus_frequency_score(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_tf: int = 2,
) -> DataFrame:
    """Per-document corpus-frequency quality signals (the CCNet-style
    LM-familiarity filter, in exact integer arithmetic instead of a
    trained LM): how "typical" a document's vocabulary is of the corpus
    it sits in. Low mean corpus frequency / high rare-token fraction
    flags OCR noise, codes/IDs, boilerplate explosions, and off-corpus
    gibberish — the cheap first-pass quality screen before any model
    scorer.

    Returns ``(id_col, n_tokens, mean_tf, rare_frac)`` where
    ``mean_tf`` is the mean corpus term frequency of the document's
    tokens and ``rare_frac`` the fraction with corpus tf ≤
    ``rare_max_tf`` (both rounded to 6 — exact bigint sums, one double
    division, the repo determinism contract).

    Plan shape (100 TB): scan 1 builds corpus tf (explode + map-side-
    combined hash agg, state = vocabulary); scan 2 re-explodes and
    joins tokens to tf — keyed by token, so the exchange carries the
    token STREAM once, never a doc × vocab product — then one hash agg
    back to documents. No driver-side materialization, no UDFs.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t"))
    tf = tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__tf"))
    return (
        tok.join(tf, "__t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("__tf").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_tf"),
            F.round(
                F.sum((F.col("__tf") <= rare_max_tf).cast("int"))
                .cast("double") / F.count(F.lit(1)), 6
            ).alias("rare_frac"),
        )
    )
