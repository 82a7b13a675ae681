"""Similarity search over embedding columns (array<float>).

Reference: LakeSoul ships an IVF+RaBitQ ANN index built per
(partition × bucket) shard with exact re-ranking
(``python/src/lakesoul/vector_index.py:96-160,263-312``,
``rust/lakesoul-vector/src/rabitq/``). Spark-first re-expression:

- **brute-force top-k** (the exactness baseline = the reference's
  ``rerank_by_distance``): cosine via a sequential left-fold
  (`F.aggregate` over `F.zip_with`) — deterministic, engine-portable
  IEEE arithmetic, fully codegen'd, no UDFs; top-k per query via a
  rank window over the (queries × corpus) join. Queries are small →
  broadcast; corpus scan is embarrassingly parallel.
- **IVF top-k** (the scale path = reference's nlist=256 IVF): KMeans
  (MLlib) centroids as coarse cells; each vector is assigned to its
  cell once; a query probes only its ``nprobe`` nearest cells then
  exact-ranks within — the corpus side is pruned by the cell join
  instead of fully scanned. Approximate (same contract as the
  reference's ANN), so it ships with a rows-only correctness check.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

from lakesoul_spark.functions.local_df import local_df as _local_df


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over double elements —
    bit-reproducible in any engine that folds left (init 0.0)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance as a sequential left-fold (same
    bit-reproducibility contract as :func:`dot`)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_METRICS = ("cosine", "l2", "ip")


def _check_metric(metric: str) -> None:
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, got {metric!r}")


def _score_spec(metric: str, qv: Column, cv: Column):
    """(output column name, score expression, ascending?) per metric —
    the reference's Metric mapping (``vector_index.py:304-309`` accepts
    L2 / IP / INNER_PRODUCT; ``rabitq/mod.rs:29-33``): cosine and raw
    inner product rank descending, Euclidean distance ascending."""
    if metric == "l2":
        return "dist", F.sqrt(l2sq(qv, cv)), True
    if metric == "ip":
        return "score", dot(qv, cv), False
    return "cos", cosine(qv, cv), False


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    exclude_self: bool = True,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k of ``corpus`` for every row of ``queries``.

    ``metric`` is ``"cosine"`` (descending similarity, the default) or
    ``"l2"`` (ascending Euclidean distance) — the reference's Metric
    enum (``rust/lakesoul-vector/src/rabitq/mod.rs:29-33``; its Python
    surface defaults to L2, ``vector_index.py:104,304-309``). Output
    carries ``cos`` or ``dist`` accordingly.

    Plan shape: broadcast(queries) × corpus → per-row fold → rank
    window partitioned by query id. Ties break by corpus id, so output
    is fully deterministic."""
    _check_metric(metric)
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    joined = c.join(F.broadcast(q), F.lit(True))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    cname, sexpr, asc = _score_spec(metric, F.col("qv"), F.col("cv"))
    scored = joined.withColumn(cname, sexpr)
    key = F.col(cname).asc() if asc else F.col(cname).desc()
    w = Window.partitionBy("query_id").orderBy(key, F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round(cname, 6).alias(cname))
    )


def kmeans_lloyd(x, nlist: int, seed: int = 42, max_iter: int = 10) -> list[list[float]]:
    """Deterministic numpy Lloyd's loop with kmeans++ seeding: same
    input array + seed → bit-identical centroids on any host. Pure
    function so the DuckDB oracle side can reproduce the exact
    quantizer from the same sample (reference kernel:
    ``rust/lakesoul-vector/src/rabitq/kmeans.rs``)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = [x[rng.randint(len(x))]]
    for _ in range(1, min(nlist, len(x))):
        d2 = np.min(
            [((x - c) ** 2).sum(axis=1) for c in cents], axis=0
        )
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(x[rng.choice(len(x), p=p)])
    c = np.asarray(cents)
    for _ in range(max_iter):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new_c = np.array([
            x[assign == j].mean(axis=0) if (assign == j).any() else c[j]
            for j in range(len(c))
        ])
        if np.allclose(new_c, c):
            break
        c = new_c
    return [list(map(float, row)) for row in c]


def train_ivf_centroids(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    sample_limit: int = 100_000,
    sort_col: str | None = None,
) -> list[list[float]]:
    """KMeans coarse quantizer (reference nlist=256 defaults; its own
    kernel lives in ``rust/lakesoul-vector/src/rabitq/kmeans.rs``).

    Trains on a bounded sample pulled to the driver and runs a
    deterministic numpy Lloyd's loop — at 100 TB the sample, not the
    corpus, bounds the cost (the reference trains per partition×bucket
    shard the same way). Returns plain centroid lists so assignment is
    a broadcast expression, not an ML pipeline dependency at read
    time. Pass ``sort_col`` to make the sample order (hence the
    centroids) a pure function of the data, independent of partition
    layout — Spark's orderBy+limit plans as a TakeOrdered (per-partition
    top-N + merge), so this stays cheap at scale."""
    import numpy as np

    sample = corpus.select(*( [sort_col] if sort_col and sort_col != vec_col else [] ), vec_col)
    if sort_col:
        sample = sample.orderBy(sort_col)
    pdf = sample.limit(sample_limit).toPandas()
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    return kmeans_lloyd(x, nlist, seed=seed, max_iter=max_iter)


def pca_fit(x, k: int) -> tuple[list[list[float]], list[float]]:
    """Deterministic PCA on an in-memory sample: returns (components
    [k][dim] by descending eigenvalue, mean [dim]). Sign-fixed so each
    component's largest-magnitude element is positive — the
    factorization is unique, which lets the DuckDB oracle re-derive
    identical components from the same sample. Pure function (same
    contract as :func:`kmeans_lloyd`)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    k = min(int(k), x.shape[1])
    mu = x.mean(axis=0)
    xc = x - mu
    cov = (xc.T @ xc) / len(x)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = v[:, ::-1][:, :k].T
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return (
        [list(map(float, row)) for row in comps],
        list(map(float, mu)),
    )


def train_pca(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 16,
    sample_limit: int = 100_000,
    sort_col: str | None = None,
) -> tuple[list[list[float]], list[float]]:
    """PCA components from a bounded driver-side sample — the
    embedding-compression step a 100 TB pipeline runs before indexing
    (project 768→128 dims, then IVF). Like
    :func:`train_ivf_centroids`, the sample (not the corpus) bounds
    driver cost, and ``sort_col`` makes the result a pure function of
    the data independent of partition layout."""
    import numpy as np

    sample = corpus.select(
        *([sort_col] if sort_col and sort_col != vec_col else []), vec_col
    )
    if sort_col:
        sample = sample.orderBy(sort_col)
    pdf = sample.limit(sample_limit).toPandas()
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    return pca_fit(x, k)


def project_embeddings(
    df: DataFrame,
    components: list[list[float]],
    mean: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
    as_array: bool = True,
) -> DataFrame:
    """Project every vector onto the PCA components:
    ``proj[j] = Σ_i (v_i - mean_i) * comp_j_i`` as a sequential left
    fold over doubles — bit-identical to DuckDB's ``list_reduce``, so
    the projection is value-hash oracle-checkable. Map-only stage,
    zero shuffles; components ride the plan as literals (same pattern
    as the IVF centroid assignment). ``round_to=None`` keeps the raw
    doubles (for compositions that keep computing on the projection —
    e.g. PCA → IVF — where a mid-pipeline round would complicate the
    oracle twin). ``as_array=False`` returns the projection as scalar
    ``pc0..pcK`` double columns instead of one ``array<double>`` —
    the shape external hash-comparison harnesses can canonicalize
    (pandas cannot sort/hash list-valued cells)."""
    mean_arr = _vec_lit(mean)
    centered = F.zip_with(
        _to_double(F.col(vec_col)), mean_arr, lambda x, m: x - m
    )
    cols = []
    for j, comp in enumerate(components):
        comp_arr = _vec_lit(comp)
        s = F.aggregate(
            F.zip_with(centered, comp_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if round_to is not None:
            s = F.round(s, round_to)
        cols.append(s.alias(f"pc{j}"))
    if not as_array:
        return df.select(F.col(id_col), *cols)
    return df.select(F.col(id_col), F.array(*cols).alias("proj"))


def _vec_lit(values) -> Column:
    """Literal ``array<double>`` built as ONE parsed SQL expression —
    a ``F.array(*[F.lit(x) ...])`` comprehension costs one Py4J round
    trip per element (a 64-dim vector = 65 JVM calls; a 16x64 centroid
    table = 1000+, measured at ~2 s of pure driver time per plan), the
    expr string costs one. ``repr`` round-trips doubles exactly; the
    ``D`` suffix keeps Spark from lexing plain decimals as DECIMAL.

    Non-finite components are rejected up front: ``repr(nan)`` renders
    ``nanD`` which fails to PARSE, so a NaN embedding leaking into a
    kmeans/PCA fit would otherwise surface as an opaque SQL syntax
    error deep inside plan construction."""
    return F.expr("array(" + ",".join(map(_d_lit, values)) + ")")


def _d_lit(x) -> str:
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(
            f"non-finite vector component {v!r}: embeddings used in "
            "centroid / rotation / query literals must be finite"
        )
    return f"{v!r}D"


def _cents_lit(centroids) -> Column:
    """Literal ``array<array<double>>`` of centroids, one parsed expr."""
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(map(_d_lit, c)) + ")"
            for c in centroids
        ) + ")"
    )


def _nearest_cells(
    vec: Column, centroids: list[list[float]], nprobe: int,
    metric: str = "cosine",
) -> Column:
    """Indices of the ``nprobe`` nearest centroids as an array —
    computed as a pure expression over a literal centroid array.
    Tie-break contracts match the oracles: cosine ties pick the HIGHER
    cell id (the reversed ascending sort), l2 ties the lower."""
    _check_metric(metric)
    cents = _cents_lit(centroids)
    if metric == "l2":
        scored = F.transform(
            cents,
            lambda c, i: F.struct(l2sq(vec, c).alias("s"), i.alias("i")),
        )
        top = F.slice(F.array_sort(scored), 1, nprobe)
    else:
        sim = cosine if metric == "cosine" else dot
        scored = F.transform(
            cents,
            lambda c, i: F.struct(sim(vec, c).alias("s"), i.alias("i")),
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    return F.transform(top, lambda x: x["i"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    metric: str = "cosine",
) -> DataFrame:
    """IVF-pruned approximate top-k: corpus rows join queries only when
    the corpus row's cell is among the query's ``nprobe`` probed cells.
    ``metric`` as in :func:`brute_force_topk` (cell assignment AND the
    final ranking both follow it, like the reference's Metric-threaded
    IVF). At scale the corpus side is pre-partitioned by cell (write
    the assignment as a range partition of a LakeSoul table) so a probe
    reads only matching partitions."""
    _check_metric(metric)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.element_at(
            _nearest_cells(F.col(vec_col), centroids, 1, metric), 1
        ).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            _nearest_cells(F.col(vec_col), centroids, nprobe, metric)
        ).alias("cell"),
    )
    joined = c.join(F.broadcast(q), "cell")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    cname, sexpr, asc = _score_spec(metric, F.col("qv"), F.col("cv"))
    joined = joined.withColumn(cname, sexpr)
    key = F.col(cname).asc() if asc else F.col(cname).desc()
    w = Window.partitionBy("query_id").orderBy(key, F.col("neighbor_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round(cname, 6).alias(cname))
    )


# ----------------------------------------------------- persisted IVF index


def _residual_sign_codes(vec: Column, centroids: list[list[float]], cell: Column) -> list[Column]:
    """RaBitQ-style 1-bit-per-dim quantization of the residual
    (reference ``rust/lakesoul-vector/src/rabitq/``, reduced: sign bits
    without the learned rotation): bit i = [v_i > c_i] for the row's
    own cell centroid, packed into 32-bit words inside bigints. Pure
    codegen expressions — exact (doubles stay < 2^53)."""
    dim = len(centroids[0])
    cents = _cents_lit(centroids)
    own = F.element_at(cents, cell + 1)
    bits = F.zip_with(
        _to_double(vec), own, lambda x, y: (x > y).cast("double")
    )
    words = []
    for w in range(0, dim, 32):
        part = F.slice(bits, w + 1, min(32, dim - w))
        packed = F.aggregate(
            F.zip_with(
                part,
                F.transform(F.sequence(F.lit(0), F.lit(min(32, dim - w) - 1)),
                            lambda i: F.pow(F.lit(2.0), i.cast("double"))),
                lambda b, p: b * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).cast("long")
        words.append(packed.alias(f"code{w // 32}"))
    return words


def _np_sign_code(v, cent, rotation=None) -> list[int]:
    """Driver-side twin of :func:`_residual_sign_codes` for queries.
    With ``rotation`` (an orthogonal matrix) the residual is rotated
    first — the full RaBitQ recipe rather than the axis-aligned
    reduction."""
    import numpy as np

    resid = np.asarray(v, dtype=np.float64) - np.asarray(cent)
    if rotation is not None:
        resid = rotation @ resid
    bits = (resid > 0).astype(np.int64)
    out = []
    for w in range(0, len(bits), 32):
        part = bits[w:w + 32]
        out.append(int((part * (1 << np.arange(len(part), dtype=np.int64))).sum()))
    return out


def _byte_luts(qr):
    """256-entry lookup tables of masked partial sums of ``qr``, one
    per code BYTE: ``lut[b][v] = sum(qr[8b+j] for set bits j of v)``,
    accumulated in ascending bit order starting from 0.0 — the exact
    IEEE left-fold order the DuckDB oracle's nested byte fold uses, so
    ``qsel = sum_b lut[b][byte_b]`` is bit-identical to folding over
    every dimension. Turns the estimator's per-candidate cost from an
    O(d) interpreted fold into O(d/8) codegen array lookups (the SQL
    analog of RaBitQ's nibble-LUT fastscan,
    ``rust/lakesoul-vector/src/rabitq/fastscan.rs``)."""
    import numpy as np

    d = len(qr)
    luts = []
    for b in range(0, d, 8):
        seg = qr[b:b + 8]
        lut = np.zeros(256)
        for v in range(1, 256):
            h = v.bit_length() - 1  # highest set bit: added LAST,
            if h < len(seg):        # keeping ascending-index fold order
                lut[v] = lut[v & ~(1 << h)] + seg[h]
            else:
                lut[v] = lut[v & ~(1 << h)]
        luts.append(lut)
    return luts


def _lut_expr_cols(qr_col: Column, dim: int) -> list[Column]:
    """Expression twin of :func:`_byte_luts`: per-byte 256-entry LUT
    arrays built from a ``qr`` array column. O(256*8) interpreted work
    PER PROBE ROW (queries x nprobe, tiny) so the per-candidate path
    stays codegen."""
    def _entry(bi: int, nbits: int):
        # single-arg closure: pyspark maps the callback's arity onto
        # the SQL lambda's, so captured constants must not be params
        def entry(v):
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(nbits - 1)),
                F.lit(0.0),
                # v >> j & 1 arithmetically: shiftright needs a literal
                # shift count, but j is a lambda variable. Exact for
                # v < 256 (small ints in doubles).
                lambda acc, j: acc + F.when(
                    F.floor(
                        v.cast("double") / F.pow(F.lit(2.0), j.cast("double"))
                    ).cast("long") % 2 == 1,
                    F.element_at(qr_col, (j + F.lit(bi + 1)).cast("int")),
                ).otherwise(F.lit(0.0)),
            )

        return entry

    cols = []
    for b in range(0, dim, 8):
        cols.append(
            F.transform(
                F.sequence(F.lit(0), F.lit(255)), _entry(b, min(8, dim - b))
            ).alias(f"lut{b // 8}")
        )
    return cols


def _rotation_matrix(dim: int, seed: int):
    """Deterministic random orthogonal matrix (QR of a seeded Gaussian,
    sign-fixed so the factorization is unique) — the reference's RaBitQ
    rotation (``rust/lakesoul-vector/src/rabitq/quantizer.rs``): rotating
    residuals before sign-quantization decorrelates the dimensions, so
    the 1-bit codes lose less ranking information on skewed data."""
    import numpy as np

    rng = np.random.RandomState(seed)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q * np.sign(np.diag(r))


def _add_rotated_codes(df, vec_col: str, cents, rotation, *, words: int,
                       prefix: str = "code"):
    """Append packed sign codes of the ROTATED residual as ``prefix{w}``
    columns via an Arrow-batched pandas pass (a d×d matmul per row is a
    numpy job, not a codegen expression). Requires a ``cell`` column."""
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)
    R = np.asarray(rotation, dtype=np.float64)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema]
        + [f"{prefix}{w} long" for w in range(words)]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            resid = (V - C[pdf["cell"].to_numpy()]) @ R.T
            bits = (resid > 0).astype(np.int64)
            out = pdf.copy()
            for w in range(words):
                part = bits[:, w * 32:(w + 1) * 32]
                out[f"{prefix}{w}"] = part @ (
                    1 << np.arange(part.shape[1], dtype=np.int64)
                )
            yield out

    return df.mapInPandas(run, out_schema)


def build_vector_index(
    table,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    rotation_seed: int | None = None,
    hash_bucket_num: int = 4,
    total_bits: int = 1,
    metric: str = "cosine",
) -> str:
    """Build a persisted IVF index for a LakeSoul table (reference
    ``python/src/lakesoul/vector_index.py:96-160``
    build_table_vector_index): coarse quantizer + RaBitQ-style 1-bit
    residual codes (sign bits, without the learned rotation); search
    can Hamming-prefilter on the codes before the exact rerank
    (``rerank_by_distance``).

    The index IS a LakeSoul table at ``<table>/_vector_index``,
    range-partitioned by cell id: a probe of ``nprobe`` cells reads
    only those partitions via commit-metadata pruning — the same
    "per-shard index + pruned scan" shape the reference builds per
    (partition × bucket). Centroids live in the index table properties.

    The vector id is the table's PRIMARY KEY (``hash_bucket_num``
    murmur3 buckets inside each cell partition): incremental refresh
    can then discover the changed ids' OLD cells by reading only their
    buckets' files — O(changed ids' buckets), not O(index) — with the
    same bucket-pruned machinery as ``point_lookup``.
    """
    import json as _json

    from pyspark.sql import functions as F

    from lakesoul_spark.meta.store import MetaStore
    from lakesoul_spark.table import LakeSoulTable, write

    # the base-table version this index reflects, recorded BEFORE the
    # snapshot read (conservative: a commit racing the build gets
    # re-processed by the next refresh, never lost)
    if not 1 <= total_bits <= 8:
        raise ValueError(f"total_bits must be in [1, 8], got {total_bits}")
    _check_metric(metric)
    base_head = MetaStore(table.path).head_version()
    src = table.to_df().select(id_col, vec_col)
    cents = train_ivf_centroids(
        src, vec_col=vec_col, nlist=nlist, seed=seed, sort_col=id_col
    )
    assigned = _index_rows(
        src, cents, vec_col, rotation_seed, total_bits, metric
    )
    words = (len(cents[0]) + 31) // 32
    idx_path = f"{table.path}/_vector_index"
    import shutil

    shutil.rmtree(idx_path, ignore_errors=True)
    write(
        assigned, idx_path, mode="overwrite", range_partitions=["cell"],
        hash_partitions=[id_col], hash_bucket_num=hash_bucket_num,
    )
    t = LakeSoulTable.for_path(table.spark, idx_path)
    props = {
        "vector.centroids": _json.dumps(cents),
        "vector.id_col": id_col,
        "vector.vec_col": vec_col,
        "vector.code_words": str(words),
        "vector.base_version": str(base_head),
    }
    if total_bits > 1:
        props["vector.total_bits"] = str(total_bits)
    if metric != "cosine":
        props["vector.metric"] = metric
    if rotation_seed is not None:
        props["vector.rotation_seed"] = str(rotation_seed)
    t.set_properties(props)
    return idx_path


def _multibit_index_rows(
    assigned: DataFrame, cents, vec_col: str, rotation_seed: int | None,
    total_bits: int,
) -> DataFrame:
    """Multi-bit RaBitQ codes (reference ``quantize_with_centroid``,
    ``rust/lakesoul-vector/src/rabitq/quantizer.rs:110-235``; the
    reference defaults to ``total_bits=7``): per-dim code
    c_i = round(r_i/Δ − cb) ∈ [0, 2^B−1] on the symmetric half-integer
    grid u_i = c_i + cb, cb = −(2^(B−1) − 0.5), Δ = max|r_i|/(2^(B−1)−0.5),
    plus the least-squares scale ``delta`` = ⟨r,u⟩/⟨u,u⟩ (the reference's
    ``delta`` factor). Bit plane B−1 of c is exactly the sign plane
    ([r_i ≥ 0]) and is stored in the same ``code{w}`` columns the 1-bit
    index uses (Hamming prefilter keeps working); extension planes
    p < B−1 land in ``exc{p}_{w}``. Search estimates
    ⟨r, q_r⟩ ≈ delta·(Σ_p 2^p·S_p + cb·Σq_r) where each plane sum S_p
    reuses the byte-LUT fastscan — O(B·d/8) per candidate."""
    import numpy as np

    dim = len(cents[0])
    words = (dim + 31) // 32
    exb = total_bits - 1
    cb = -(2.0 ** exb - 0.5)
    C = np.asarray(cents, dtype=np.float64)
    R = (
        np.asarray(_rotation_matrix(dim, rotation_seed), dtype=np.float64)
        if rotation_seed is not None else None
    )
    code_cols = [f"code{w}" for w in range(words)]
    ex_cols = [f"exc{p}_{w}" for p in range(exb) for w in range(words)]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in assigned.schema]
        + [f"{c} long" for c in code_cols + ex_cols]
        + ["resid_norm double", "c_dot_resid double", "code_dot double",
           "delta double"]
    )
    weights = [
        (1 << np.arange(min(32, dim - w * 32), dtype=np.int64))
        for w in range(words)
    ]

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cown = C[pdf["cell"].to_numpy()]
            r = V - cown
            rr = r @ R.T if R is not None else r
            mx = np.abs(rr).max(axis=1)
            step = np.where(mx > 0, mx / (2.0 ** exb - 0.5), 1.0)
            c = np.rint(rr / step[:, None] - cb).astype(np.int64)
            np.clip(c, 0, (1 << total_bits) - 1, out=c)
            u = c + cb
            uu = (u * u).sum(axis=1)
            ru = (rr * u).sum(axis=1)
            norms = np.sqrt((r * r).sum(axis=1))
            out = pdf.copy()
            for p in range(total_bits):
                bits = (c >> p) & 1
                for w in range(words):
                    packed = bits[:, w * 32:(w + 1) * 32] @ weights[w]
                    name = (
                        f"code{w}" if p == exb else f"exc{p}_{w}"
                    )
                    out[name] = packed
            out["resid_norm"] = norms
            out["c_dot_resid"] = (cown * r).sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cd = np.abs(rr).sum(axis=1) / (np.sqrt(dim) * norms)
            out["code_dot"] = np.where(norms > 0, cd, 0.0)
            # step folded into delta: reconstruction is (delta·u_i) in
            # ORIGINAL residual units, so search needs no per-row step
            out["delta"] = np.where(uu > 0, step * ru / (step * uu), 0.0)
            yield out[
                list(pdf.columns) + code_cols + ex_cols
                + ["resid_norm", "c_dot_resid", "code_dot", "delta"]
            ]

    return assigned.mapInPandas(run, out_schema)


def _index_rows(
    src: DataFrame, cents, vec_col: str, rotation_seed: int | None,
    total_bits: int = 1, metric: str = "cosine",
) -> DataFrame:
    """(id, vec) rows → index rows (see :func:`_index_rows_columns`
    for the full contract). The common 1-bit / no-rotation path goes
    through :func:`_index_rows_fast_sql` — the same expressions
    rendered as FOUR selectExpr strings instead of hundreds of Py4J
    lambda round-trips (~0.8 s of driver time per plan, measured; it
    recurs in build, refresh, and search). Multi-bit and rotated
    builds keep the Column construction."""
    if total_bits == 1 and rotation_seed is None:
        return _index_rows_fast_sql(src, cents, vec_col, metric)
    return _index_rows_columns(
        src, cents, vec_col, rotation_seed, total_bits, metric
    )


def _index_rows_fast_sql(
    src: DataFrame, cents, vec_col: str, metric: str = "cosine",
) -> DataFrame:
    """SQL-text twin of the 1-bit no-rotation :func:`_index_rows_columns`
    path: identical operations in identical order (the parsed
    expressions ARE the same Catalyst nodes the Column API builds, so
    results are bit-identical — asserted in
    ``tests/test_pipeline_ops.py::test_index_rows_sql_matches_columns``),
    but the whole projection is four parsed strings. Helper columns
    (``__cents``/``__own``/``__resid``/``__bits``) materialize shared
    subexpressions by NAME, so the SQL text stays kilobytes instead of
    repeating the centroid literal once per use."""
    import math

    _check_metric(metric)
    dim = len(cents[0])
    words = (dim + 31) // 32
    cents_sql = "array(" + ",".join(
        "array(" + ",".join(_d_lit(x) for x in c) + ")" for c in cents
    ) + ")"

    def td(a: str) -> str:
        return f"transform({a}, x -> CAST(x AS DOUBLE))"

    def dot_sql(a: str, b: str) -> str:
        return (f"aggregate(zip_with({td(a)}, {td(b)}, (x, y) -> x * y), "
                "0.0D, (acc, x) -> acc + x)")

    def norm_sql(a: str) -> str:
        return f"sqrt({dot_sql(a, a)})"

    v = f"`{vec_col}`"
    if metric == "l2":
        l2 = ("aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
              "0.0D, (acc, x) -> acc + x)").format(a=td(v), b=td("c"))
        cell_sql = (
            "CAST(element_at(transform(slice(array_sort("
            f"transform(__cents, (c, i) -> struct({l2} AS s, i AS i))"
            "), 1, 1), x -> x.i), 1) AS INT)"
        )
    else:
        sim = (f"({dot_sql(v, 'c')} / ({norm_sql(v)} * {norm_sql('c')}))"
               if metric == "cosine" else dot_sql(v, "c"))
        cell_sql = (
            "CAST(element_at(transform(slice(reverse(array_sort("
            f"transform(__cents, (c, i) -> struct({sim} AS s, i AS i))"
            ")), 1, 1), x -> x.i), 1) AS INT)"
        )

    code_cols = []
    for w in range(0, dim, 32):
        wlen = min(32, dim - w)
        code_cols.append(
            f"CAST(aggregate(zip_with(slice(__bits, {w + 1}, {wlen}), "
            f"transform(sequence(0, {wlen - 1}), "
            "i -> power(2.0D, CAST(i AS DOUBLE))), (b, p) -> b * p), "
            f"0.0D, (acc, x) -> acc + x) AS BIGINT) AS code{w // 32}"
        )
    rnorm = ("sqrt(aggregate(transform(__resid, r -> r * r), 0.0D, "
             "(acc, x) -> acc + x))")
    cdotr = ("aggregate(zip_with(__own, __resid, (c, r) -> c * r), 0.0D, "
             "(acc, x) -> acc + x)")
    abs_sum = ("aggregate(transform(__resid, r -> abs(r)), 0.0D, "
               "(acc, x) -> acc + x)")
    code_dot = (
        f"CASE WHEN resid_norm > 0.0D THEN {abs_sum} / "
        f"({math.sqrt(dim)!r}D * resid_norm) ELSE 0.0D END AS code_dot"
    )
    # backtick-escape like vec_col: a source column named with a
    # space/dot/hyphen must not mis-parse in the final projection
    base = [f"`{c}`" for c in src.columns]
    out = (
        src.selectExpr("*", f"{cents_sql} AS __cents")
        .selectExpr("*", f"{cell_sql} AS cell")
        .selectExpr(
            "*",
            "element_at(__cents, cell + 1) AS __own",
        )
        .selectExpr(
            "*",
            f"zip_with({td(v)}, __own, (x, c) -> x - c) AS __resid",
            f"zip_with({td(v)}, __own, (x, y) -> CAST((x > y) AS DOUBLE)) "
            "AS __bits",
        )
        .selectExpr("*", *code_cols, f"{rnorm} AS resid_norm",
                    f"{cdotr} AS c_dot_resid")
        .selectExpr(
            *base, "cell", *[f"code{i}" for i in range(words)],
            "resid_norm", "c_dot_resid", code_dot,
        )
    )
    return out


def _index_rows_columns(
    src: DataFrame, cents, vec_col: str, rotation_seed: int | None,
    total_bits: int = 1, metric: str = "cosine",
) -> DataFrame:
    """(id, vec) rows → index rows: cell assignment + packed residual
    sign codes + RaBitQ estimator scalars (shared by full build and
    incremental refresh).

    The three per-vector scalars make the paper's unbiased inner-
    product estimator available at search time (RaBitQ, SIGMOD'24 —
    reference kernel ``rust/lakesoul-vector/src/rabitq/``):

    - ``resid_norm``  = ‖o − c‖
    - ``c_dot_resid`` = ⟨c, o − c⟩
    - ``code_dot``    = ⟨x̄, x⟩ where x = (o−c)/‖o−c‖ and x̄ is the
      quantized unit vector ((2b−1)/√d). For sign codes of r (possibly
      rotated to r'), ⟨x̄, x⟩ = Σ|r'_i| / (√d·‖r‖) — a closed form, no
      bit unpacking at build.
    """
    import math

    dim = len(cents[0])
    assigned = src.withColumn(
        "cell",
        F.element_at(
            _nearest_cells(F.col(vec_col), cents, 1, metric), 1
        ).cast("int"),
    )
    if total_bits > 1:
        return _multibit_index_rows(
            assigned, cents, vec_col, rotation_seed, total_bits
        )
    words = (dim + 31) // 32
    cents_arr = _cents_lit(cents)
    own = F.element_at(cents_arr, F.col("cell") + 1)
    resid = F.zip_with(_to_double(F.col(vec_col)), own, lambda x, c: x - c)
    resid_norm = F.sqrt(F.aggregate(
        F.transform(resid, lambda r: r * r), F.lit(0.0), lambda a, x: a + x
    ))
    c_dot_resid = F.aggregate(
        F.zip_with(own, resid, lambda c, r: c * r),
        F.lit(0.0), lambda a, x: a + x,
    )
    if rotation_seed is None:
        abs_sum = F.aggregate(
            F.transform(resid, F.abs), F.lit(0.0), lambda a, x: a + x
        )
        # axis-aligned sign bits: pure codegen, SQL-oracle-checkable
        out = assigned.select(
            "*", *_residual_sign_codes(F.col(vec_col), cents, F.col("cell"))
        ).withColumn("resid_norm", resid_norm) \
         .withColumn("c_dot_resid", c_dot_resid)
        return out.withColumn(
            "code_dot",
            F.when(
                F.col("resid_norm") > 0,
                abs_sum / (F.lit(math.sqrt(dim)) * F.col("resid_norm")),
            ).otherwise(F.lit(0.0)),
        )
    # full RaBitQ recipe: rotate the residual before quantizing
    # (build-time numpy pass; the stored codes are what search uses).
    # Rotation preserves resid_norm/c_dot_resid; code_dot uses |r'|.
    rot = _rotation_matrix(dim, rotation_seed)
    with_codes = _add_rotated_codes(assigned, vec_col, cents, rot, words=words)
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)
    R = np.asarray(rot, dtype=np.float64)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in with_codes.schema]
        + ["resid_norm double", "c_dot_resid double", "code_dot double"]
    )

    def add_scalars(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cown = C[pdf["cell"].to_numpy()]
            r = V - cown
            norms = np.sqrt((r * r).sum(axis=1))
            out = pdf.copy()
            out["resid_norm"] = norms
            out["c_dot_resid"] = (cown * r).sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cd = np.abs(r @ R.T).sum(axis=1) / (np.sqrt(len(C[0])) * norms)
            out["code_dot"] = np.where(norms > 0, cd, 0.0)
            yield out

    return with_codes.mapInPandas(add_scalars, out_schema)


def refresh_vector_index(table, *, on_rewrite: str = "rebuild") -> dict:
    """Incrementally maintain the persisted index after base-table
    commits (reference builds per-shard so new data rebuilds one shard,
    not the world — ``python/src/lakesoul/vector_index.py:96-160``;
    here the unit is the kmeans cell partition).

    Mechanics: the ids changed since ``vector.base_version`` come from
    the delta files of the commits in between (no base-table scan);
    their CURRENT vectors come from a semi-join against the MOR view;
    affected cells = the ids' old cells ∪ their new cells. Old-cell
    discovery reads ONLY the changed ids' murmur3 buckets of the
    id-PK'd index table (O(changed), bucket-pruned like
    ``point_lookup``; pre-PK legacy indexes fall back to a
    column-pruned full (id, cell) scan). Only those cells' partitions are
    rewritten — unchanged rows kept via anti-join, changed ids'
    fresh rows unioned in — through one dynamic-partition-overwrite
    commit; cells left empty are dropped with a metadata-only
    partition delete. Untouched cell partitions get NO new commit.

    The coarse quantizer is NOT retrained (same contract as the
    reference: the shard index is rebuilt under the existing recipe;
    re-train by calling :func:`build_vector_index` periodically when
    drift accumulates).

    UPDATE/DELETE rewrite commits on the base table cannot be read as
    a row delta; ``on_rewrite="rebuild"`` (default) falls back to a
    full rebuild with the STORED centroids/settings, ``"fail"``
    raises. CDC delete rows need no special case: the changed id
    vanishes from the MOR view, so its index entries are anti-joined
    away.

    Returns ``{"mode": "noop"|"incremental"|"rebuild",
    "changed_ids": n, "affected_cells": [...]}``.
    """
    import json as _json

    from lakesoul_spark.io import reader as rdr
    from lakesoul_spark.meta.store import DataRewriteError, MetaStore
    from lakesoul_spark.table import LakeSoulTable, write

    if on_rewrite not in ("rebuild", "fail"):
        raise ValueError(f"on_rewrite must be 'rebuild' or 'fail', got {on_rewrite!r}")
    spark = table.spark
    idx_path = f"{table.path}/_vector_index"
    idx = LakeSoulTable.for_path(spark, idx_path)
    props = idx.info.properties
    cents_list = _json.loads(props["vector.centroids"])
    id_col, vec_col = props["vector.id_col"], props["vector.vec_col"]
    rot_seed = props.get("vector.rotation_seed")
    rot_seed = int(rot_seed) if rot_seed is not None else None
    idx_bits = int(props.get("vector.total_bits", "1"))
    idx_metric = props.get("vector.metric", "cosine")
    base_v = int(props["vector.base_version"])

    base_store = MetaStore(table.path)
    head = base_store.head_version()
    if head <= base_v:
        return {"mode": "noop", "changed_ids": 0, "affected_cells": []}

    def _full_rebuild() -> dict:
        nlist = len(cents_list)
        build_vector_index(
            table, id_col=id_col, vec_col=vec_col, nlist=nlist,
            rotation_seed=rot_seed, total_bits=idx_bits, metric=idx_metric,
        )
        return {"mode": "rebuild", "changed_ids": -1, "affected_cells": []}

    try:
        delta_files = base_store.files_in_version_range(
            base_v, head, on_rewrite="fail"
        )
    except DataRewriteError:
        if on_rewrite == "fail":
            raise
        return _full_rebuild()

    import os as _os

    paths = [_os.path.join(table.path, f.path) for f in delta_files]
    if not paths:
        # e.g. only compaction commits since the build — nothing changed
        idx.set_properties({"vector.base_version": str(head)})
        return {"mode": "noop", "changed_ids": 0, "affected_cells": []}
    changed_ids = (
        spark.read.parquet(*paths).select(id_col).distinct()
    ).cache()

    # old cells: which cells did the changed ids USED to live in?
    # The index's PK is the vector id, so the answer lives in the
    # changed ids' murmur3 buckets only — prune to those buckets'
    # files (O(changed ids' buckets), not O(index)). Bucket ids are
    # computed distributed (pmod(hash) is the writer's own bucket
    # expression, io/writer.py:114); the driver payload is the
    # DISTINCT bucket set, bounded by hash_bucket_num. ONE fused job
    # (r15-opt) counts the changed ids AND collects their bucket set
    # — the r14 shape paid a second scheduler round-trip for the
    # buckets — and doubles as the cache materialization.
    idx_info = idx.info
    idx_snap = MetaStore(idx_path).snapshot()
    n_idx_files = len(idx_snap.files)
    if idx_info.hash_partitions:
        from lakesoul_spark.meta.store import Snapshot as _Snapshot

        n_b = idx_info.hash_bucket_num
        probe = changed_ids.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(
                F.pmod(F.hash(id_col), F.lit(n_b))).alias("bs"),
        ).collect()[0]
        n_changed, buckets = probe["n"], set(probe["bs"])
        scan_files = [
            f for f in idx_snap.files if f.bucket in buckets or f.bucket == -1
        ]
        old_src = rdr.merge_view(
            spark, idx_info,
            _Snapshot(
                version=idx_snap.version,
                timestamp_ms=idx_snap.timestamp_ms,
                files=scan_files,
            ),
        )
    else:
        # legacy index without a PK: column-pruned full (id, cell) scan
        scan_files = idx_snap.files
        old_src = idx.to_df()
        n_changed = changed_ids.count()
    n_scanned = len(scan_files)
    # fresh rows: current MOR values of the changed ids (a CDC-deleted
    # or rewritten-away id simply yields no row here)
    fresh_src = (
        table.to_df().select(id_col, vec_col)
        .join(changed_ids, id_col, "semi")
    )
    fresh = _index_rows(
        fresh_src, cents_list, vec_col, rot_seed, idx_bits, idx_metric
    )
    # forward-compat: an index built before the estimator scalars has a
    # narrower schema — refresh must keep writing ITS schema (rebuild
    # to adopt the new columns), not fail the write alignment
    from lakesoul_spark.io.writer import table_schema as _ts

    idx_cols = [f.name for f in _ts(idx.info).fields]
    fresh = fresh.select(*[c for c in fresh.columns if c in set(idx_cols)])
    fresh = fresh.cache()
    # affected = old cells (where changed ids USED to live) ∪ new cells
    # (where their fresh vectors land) — one fused job, driver payload
    # bounded by nlist
    affected = sorted(
        r["cell"] for r in
        old_src.select(id_col, "cell")
        .join(changed_ids, id_col, "semi")
        .select("cell")
        .unionByName(fresh.select("cell"))
        .distinct().collect()
    )
    if not affected:
        changed_ids.unpersist()
        idx.set_properties({"vector.base_version": str(head)})
        return {"mode": "noop", "changed_ids": n_changed, "affected_cells": []}

    # rebuild ONLY the affected cells' partitions: survivors + fresh
    snap = MetaStore(idx_path).snapshot(
        partition_descs={f"cell={c}" for c in affected}
    )
    survivors = (
        rdr.merge_view(spark, idx.info, snap)
        .join(changed_ids, id_col, "anti")
    )
    # ONE pass (r16-opt, guide §1.4): the written-cells set is read off
    # the write's own FileOps (each op's partition_desc is its
    # ``cell=<v>`` directory) — the r15 shape paid a separate probe job
    # (plus a checkpoint materialization) just to learn which cells
    # received rows before filtering the write to them; the filter was
    # a no-op (every content row's cell is written by definition), so
    # the probe's only real product was the written set. The
    # dynamic-partition-overwrite commit is gated on the ops actually
    # produced — an all-vanished window (no content rows) writes zero
    # files and commits NOTHING, exactly the r15 skip-the-write
    # behavior. (Not an df.observe() metric: AQE's empty-relation
    # propagation drops the CollectMetrics node on runtime-empty
    # frames, leaving the observation unreadable.)
    from lakesoul_spark.io.writer import write_table_data as _wtd
    from lakesoul_spark.meta.store import OP_UPDATE, FileOp as _FileOp

    content = survivors.select(*fresh.columns).unionByName(fresh)
    ops = _wtd(content, idx.info)
    written = {int(o.partition_desc.split("=", 1)[1]) for o in ops
               if o.op == "add"}
    if ops:
        # dynamic partition overwrite: expire exactly the partitions
        # that received files (the table.write overwrite contract)
        st = MetaStore(idx_path)
        written_parts = {o.partition_desc for o in ops}
        dels = [
            _FileOp(op="del", path=f.path,
                    partition_desc=f.partition_desc, bucket=f.bucket)
            for f in st.snapshot().files
            if f.partition_desc in written_parts
        ]
        st.commit(OP_UPDATE, dels + ops)
    empty = set(affected) - written
    if empty:
        # every row of these cells was a changed id that moved away —
        # metadata-only partition delete
        cond = " OR ".join(f"cell = {int(c)}" for c in sorted(empty))
        idx.delete(cond)
    changed_ids.unpersist()
    fresh.unpersist()
    idx.set_properties({"vector.base_version": str(head)})
    return {
        "mode": "incremental",
        "changed_ids": n_changed,
        "affected_cells": affected,
        "discovery_files_scanned": n_scanned,
        "index_files_total": n_idx_files,
    }


def vector_search(
    table,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 4,
    exclude_self: bool = True,
    rerank: int | None = None,
    assign: str = "auto",
    driver_assign_limit: int = 1024,
    rank: str = "hamming",
) -> DataFrame:
    """ANN search against a persisted index: nearest ``nprobe`` cells
    per query are computed from the stored centroids, ONLY those cells'
    partitions are read (metadata pruning — no full scan), and
    candidates are exact-reranked under the metric the index was BUILT
    with (``vector.metric`` property: cosine default, ``l2``/``ip`` per
    the reference's Metric enum — output column ``cos``/``dist``/
    ``score`` accordingly) (reference
    ``rerank_by_distance``, ``inject_vector_search_filter``).

    ``rerank=R`` enables the RaBitQ-style fast path: candidates are
    first ranked per (query, cell) by Hamming distance between the
    stored 1-bit residual codes and the query's code for that cell
    (``bit_count(xor)`` — codegen over 16 bytes/vector instead of the
    full vector), and only the best R go through the exact cosine.
    At 100 TB the exact fold touches R rows per probe instead of the
    whole cell.

    ``assign`` picks how query→cell probes are computed:

    - ``"driver"`` — collect the queries and assign with numpy. Fastest
      for an interactive handful of queries, but cost is O(#queries) on
      the driver.
    - ``"expression"`` — :func:`_nearest_cells` + the sign-code
      expressions run distributed over the queries DataFrame; the
      driver only collects the DISTINCT probed cell ids (bounded by
      nlist) for partition pruning. The 100 TB path when the query set
      is itself a table.
    - ``"auto"`` (default) — driver path iff the query set has at most
      ``driver_assign_limit`` rows (probed with a cheap limit+count).

    Both paths produce identical results: the expression twins
    (:func:`_nearest_cells`, :func:`_residual_sign_codes`) compute the
    same cosine ranking and exact bit-packing as the numpy code.

    ``rank`` picks how candidates are ORDERED before the exact rerank
    (only the pre-rerank candidate choice differs — the exact cosine
    re-scores whatever survives):

    - ``"hamming"`` (default) — XOR+popcount of the 1-bit codes; the
      cheapest signal, and SQL-oracle-checkable.
    - ``"estimator"`` — RaBitQ's unbiased inner-product estimator
      (SIGMOD'24; reference kernel ``rust/lakesoul-vector/src/rabitq/``):
      est⟨x,q⟩ = ⟨x̄,q_r⟩/⟨x̄,x⟩ from the stored codes plus the
      per-vector scalars (resid_norm/c_dot_resid/code_dot) written at
      build time, assembled into an estimated cosine. Norm-aware, so
      it ranks candidates Hamming cannot separate. The masked sum
      ⟨x̄,q_r⟩ is computed with per-byte 256-entry lookup tables
      precomputed per (query, cell) probe (:func:`_byte_luts`) — each
      candidate pays d/8 codegen array lookups, the SQL analog of the
      reference's LUT fastscan kernel
      (``rust/lakesoul-vector/src/rabitq/fastscan.rs``).
      Requires an index built by this version (scalar columns);
      rotation-seeded indexes need ``assign="driver"``."""
    import json as _json

    import numpy as np

    from lakesoul_spark.io import reader as rdr
    from lakesoul_spark.meta.store import MetaStore
    from lakesoul_spark.table import LakeSoulTable

    idx_path = f"{table.path}/_vector_index"
    idx = LakeSoulTable.for_path(table.spark, idx_path)
    props = idx.info.properties
    cents_list = _json.loads(props["vector.centroids"])
    cents = np.asarray(cents_list)
    id_col, vec_col = props["vector.id_col"], props["vector.vec_col"]
    words = int(props.get("vector.code_words", 0))
    idx_bits = int(props.get("vector.total_bits", "1"))
    metric = props.get("vector.metric", "cosine")
    rot_seed = props.get("vector.rotation_seed")
    rot = (
        _rotation_matrix(len(cents_list[0]), int(rot_seed))
        if rot_seed is not None
        else None
    )

    if assign not in ("auto", "driver", "expression"):
        raise ValueError(f"assign must be auto|driver|expression, got {assign!r}")
    if rank not in ("hamming", "estimator"):
        raise ValueError(f"rank must be hamming|estimator, got {rank!r}")
    if rank == "estimator":
        from lakesoul_spark.io.writer import table_schema as _ts

        if "resid_norm" not in {f.name for f in _ts(idx.info).fields}:
            raise ValueError(
                "rank='estimator' needs the estimator scalar columns — "
                "rebuild the index with build_vector_index()"
            )
        # estimator ranking only happens on the code-prefilter path;
        # without rerank bounds or packed codes the call would silently
        # fall through to exact-rerank-all (hamming-free), which is NOT
        # what the caller asked for — make the incompatibility explicit
        if rerank is None:
            raise ValueError(
                "rank='estimator' requires rerank=<n> (the estimator "
                "ranks the code-prefiltered candidate set; rerank=None "
                "means exact ranking of all candidates)"
            )
        if not words:
            raise ValueError(
                "rank='estimator' requires an index built with packed "
                "codes (code_words > 0) — rebuild it with "
                "build_vector_index() (current builds always pack codes)"
            )
    if assign == "auto":
        n = queries.limit(driver_assign_limit + 1).count()
        assign = "driver" if n <= driver_assign_limit else "expression"
    if rank == "estimator" and rot is not None and assign == "expression":
        raise ValueError(
            "rank='estimator' on a rotation-seeded index requires "
            "assign='driver' (the rotated query residual is a numpy "
            "matmul, not a codegen expression)"
        )

    qdf = None  # (query_id, cell[, qv][, qcode*]) — one row per probe
    if assign == "driver":
        qrows = queries.select(id_col, vec_col).collect()
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        probe_cells: set[int] = set()
        q_probe_rows = []  # (query_id, cell, [codes...]) per probed cell
        q_probe_pairs = []  # (query_id, qv ndarray, cell) for estimator
        for r in qrows:
            qv = np.asarray(r[vec_col], dtype=np.float64)
            if metric == "l2":
                # negate so the shared "descending = nearer" argsort holds
                sims = -((cents - qv) ** 2).sum(axis=1)
            elif metric == "ip":
                sims = cents @ qv
            else:
                sims = cn @ (qv / np.linalg.norm(qv))
            if metric == "l2":
                # ties → LOWER cell (plain ascending array_sort twin)
                order = np.argsort(-sims, kind="stable")
            else:
                # ties → HIGHER cell, matching _nearest_cells's reversed
                # ascending sort (and the oracles' ORDER BY … , cell DESC)
                order = np.lexsort((-np.arange(len(sims)), -sims))
            for c in order[:nprobe]:
                probe_cells.add(int(c))
                q_probe_rows.append(
                    (r[id_col], int(c),
                     *_np_sign_code(qv, cents[int(c)], rot))
                )
                q_probe_pairs.append((r[id_col], qv, int(c)))
    else:
        qdf = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(
                _nearest_cells(F.col(vec_col), cents_list, nprobe, metric)
            ).alias("cell"),
        ).withColumn("cell", F.col("cell").cast("int"))
        if rerank is not None and words:
            if rot is None:
                qdf = qdf.select(
                    "query_id", "qv", "cell",
                    *[c.alias(f"qcode{w}") for w, c in enumerate(
                        _residual_sign_codes(F.col("qv"), cents_list, F.col("cell"))
                    )],
                )
            else:
                qdf = _add_rotated_codes(
                    qdf.select("query_id", "qv", "cell"), "qv",
                    cents_list, rot, words=words, prefix="qcode",
                )
        qdf = qdf.cache()
        # distinct probed cells: bounded by nlist, tiny driver payload
        probe_cells = {r["cell"] for r in qdf.select("cell").distinct().collect()}

    # metadata partition pruning: read only the probed cells' files
    store = MetaStore(idx_path)
    descs = {f"cell={c}" for c in probe_cells}
    snap = store.snapshot(partition_descs=descs)
    cand = rdr.merge_view(table.spark, idx.info, snap)

    if rerank is not None and words and rank == "estimator":
        import math as _math

        dim = len(cents_list[0])
        nbytes = (dim + 7) // 8
        lut_names = [f"lut{b}" for b in range(nbytes)]
        if assign == "driver":
            rows = []
            for qid, qv, c in q_probe_pairs:
                cown = cents[c]
                qr = (rot @ (qv - cown)) if rot is not None else (qv - cown)
                rows.append((
                    qid, c,
                    *[[float(x) for x in lut] for lut in _byte_luts(qr)],
                    float(np.dot(qv, cown)),
                    float(qr.sum()),
                    float(np.linalg.norm(qv)),
                    float(np.dot(cown, cown)),
                ))
            qid_type = queries.schema[id_col].dataType.simpleString()
            lut_schema = ", ".join(f"{n} array<double>" for n in lut_names)
            est_qdf = _local_df(
                table.spark, rows,
                f"query_id {qid_type}, cell int, {lut_schema}, "
                "q_dot_c double, qsum double, q_norm double, "
                "cell_norm2 double",
            )
            est_qdf = F.broadcast(est_qdf)
        else:
            cents_arr = _cents_lit(cents_list)
            own = F.element_at(cents_arr, F.col("cell") + 1)
            qvd = _to_double(F.col("qv"))
            qr = F.zip_with(qvd, own, lambda x, c: x - c)
            est_qdf = qdf.select(
                "query_id", "qv", "cell", qr.alias("qr"),
                F.aggregate(
                    F.zip_with(qvd, own, lambda a, b: a * b),
                    F.lit(0.0), lambda a, x: a + x,
                ).alias("q_dot_c"),
                F.aggregate(qr, F.lit(0.0), lambda a, x: a + x).alias("qsum"),
                F.sqrt(F.aggregate(
                    F.transform(qvd, lambda v: v * v),
                    F.lit(0.0), lambda a, x: a + x,
                )).alias("q_norm"),
                F.aggregate(
                    F.transform(own, lambda v: v * v),
                    F.lit(0.0), lambda a, x: a + x,
                ).alias("cell_norm2"),
            ).select(
                "query_id", "qv", "cell",
                *_lut_expr_cols(F.col("qr"), dim),
                "q_dot_c", "qsum", "q_norm", "cell_norm2",
            )
        extra_cols = []
        if idx_bits > 1:
            extra_cols = ["delta"] + [
                f"exc{p}_{w}"
                for p in range(idx_bits - 1) for w in range(words)
            ]
        joined = cand.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            "cell", "resid_norm", "c_dot_resid", "code_dot",
            *[f"code{w}" for w in range(words)],
            *extra_cols,
        ).join(est_qdf, "cell")
        if exclude_self:
            joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))

        # ⟨x̄, q_r⟩ via per-byte LUTs: each candidate pays nbytes
        # integer shifts + array lookups (codegen) instead of a d-step
        # interpreted fold — the SQL analog of RaBitQ's LUT fastscan
        # (reference ``rust/lakesoul-vector/src/rabitq/fastscan.rs``).
        # Sum order (bytes ascending, bits ascending inside a byte)
        # matches the oracle's nested fold bit-for-bit.
        def _plane_sum(prefix: str):
            terms = []
            for b in range(nbytes):
                w, sh = b // 4, (b % 4) * 8
                byte_val = (
                    F.shiftright(F.col(f"{prefix}{w}"), sh)
                    .bitwiseAND(F.lit(255))
                    .cast("int")
                )
                terms.append(F.element_at(F.col(f"lut{b}"), byte_val + 1))
            s = terms[0]
            for tcol in terms[1:]:
                s = s + tcol
            return s

        qsel = _plane_sum("code")
        if idx_bits > 1:
            # multi-bit codes (reference total_bits>1, quantizer.rs):
            # Σ c_i·q_r,i = Σ_p 2^p·S_p — the sign plane is bit B−1,
            # extension planes reuse the SAME per-byte LUTs; the stored
            # least-squares ``delta`` scales the grid estimate back to
            # residual units. O(B·d/8) per candidate.
            exb = idx_bits - 1
            cbq = -(2.0 ** exb - 0.5)
            s_total = qsel * F.lit(float(1 << exb))
            for p in range(exb):
                s_total = s_total + _plane_sum(f"exc{p}_") * F.lit(float(1 << p))
            est_rip = F.col("delta") * (s_total + F.lit(cbq) * F.col("qsum"))
        else:
            est_xq = (
                F.lit(2.0) * qsel - F.col("qsum")
            ) / F.lit(_math.sqrt(dim))
            est_rip = F.when(
                (F.col("resid_norm") > 0) & (F.col("code_dot") > 0),
                F.col("resid_norm") * est_xq / F.col("code_dot"),
            ).otherwise(F.lit(0.0))
        est_dot = est_rip + F.col("q_dot_c") + F.col("c_dot_resid")
        o_norm = F.sqrt(
            F.col("cell_norm2") + 2 * F.col("c_dot_resid")
            + F.col("resid_norm") * F.col("resid_norm")
        )
        if metric == "l2":
            # est‖o−q‖² = ‖o‖² − 2·est⟨o,q⟩ + ‖q‖², all three pieces
            # already on the row — the estimator serves L2 for free
            # (reference Metric::L2 search path, rabitq/mod.rs:29-33)
            est_key = (
                F.col("cell_norm2") + 2 * F.col("c_dot_resid")
                + F.col("resid_norm") * F.col("resid_norm")
                - 2 * est_dot + F.col("q_norm") * F.col("q_norm")
            )
            wh = Window.partitionBy("query_id").orderBy(
                F.col("est_cos").asc(), F.col("neighbor_id").asc()
            )
        elif metric == "ip":
            # est⟨o,q⟩ IS the ranking key for raw inner product
            est_key = est_dot
            wh = Window.partitionBy("query_id").orderBy(
                F.col("est_cos").desc(), F.col("neighbor_id").asc()
            )
        else:
            est_key = F.when(
                o_norm > 0, est_dot / (F.col("q_norm") * o_norm)
            ).otherwise(F.lit(-1.0))
            wh = Window.partitionBy("query_id").orderBy(
                F.col("est_cos").desc(), F.col("neighbor_id").asc()
            )
        joined = (
            joined.withColumn("est_cos", est_key)
            .withColumn("hrank", F.row_number().over(wh))
            .filter(F.col("hrank") <= rerank)
        )
        if assign == "driver":
            qv_map = queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
            )
            joined = joined.join(F.broadcast(qv_map), "query_id")
    elif rerank is not None and words:
        # join candidates to (query, cell) probes: a candidate is only
        # scored for queries probing ITS cell — then Hamming-prefilter
        if assign == "driver":
            # probe-frame schema follows the indexed id column's type
            # (vector.id_col may be any type, not just bigint)
            qid_type = queries.schema[id_col].dataType.simpleString()
            qcode_cols = ", ".join(f"qcode{w} long" for w in range(words))
            qdf = _local_df(
                table.spark, q_probe_rows,
                f"query_id {qid_type}, cell int, {qcode_cols}",
            )
            qdf = F.broadcast(qdf)
        joined = cand.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            "cell",
            *[f"code{w}" for w in range(words)],
        ).join(qdf, "cell")
        if exclude_self:
            joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
        hamming = sum(
            F.bit_count(F.col(f"code{w}").bitwiseXOR(F.col(f"qcode{w}")))
            for w in range(words)
        )
        wh = Window.partitionBy("query_id").orderBy(
            F.col("hamming").asc(), F.col("neighbor_id").asc()
        )
        joined = (
            joined.withColumn("hamming", hamming)
            .withColumn("hrank", F.row_number().over(wh))
            .filter(F.col("hrank") <= rerank)
        )
        if assign == "driver":
            qv_map = queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
            )
            joined = joined.join(F.broadcast(qv_map), "query_id")
    else:
        # exact rerank of every candidate in the query's probed cells
        # (same per-query cell restriction as ivf_topk and the rerank
        # path — a candidate is only scored for queries probing ITS cell)
        if assign == "driver":
            qid_type = queries.schema[id_col].dataType.simpleString()
            probe = _local_df(
                table.spark, [(r[0], r[1]) for r in q_probe_rows],
                f"query_id {qid_type}, cell int",
            )
            qv_map = queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
            )
            q = F.broadcast(probe.join(qv_map, "query_id"))
        else:
            q = qdf.select("query_id", "qv", "cell")
        joined = cand.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            "cell",
        ).join(q, "cell").drop("cell")
        if exclude_self:
            joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    cname, sexpr, asc = _score_spec(metric, F.col("qv"), F.col("cv"))
    key = F.col(cname).asc() if asc else F.col(cname).desc()
    w = Window.partitionBy("query_id").orderBy(key, F.col("neighbor_id").asc())
    return (
        joined.withColumn(cname, sexpr)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round(cname, 6).alias(cname))
    )
