"""Similarity search over an embedding column (array<float>).

Two strategies:
  - brute_force_topk: exact cosine top-k. The query set is broadcast
    (small), the corpus side streams — one scan, no corpus shuffle; the
    per-query top-k is a windowed rank over (n_queries x corpus) rows.
    This is the correctness baseline and is fine whenever
    n_queries x corpus fits a shuffle (it's the corpus that is 100 TB,
    so n_queries must stay small — which is the point of the baseline).
  - lsh_topk: random-hyperplane LSH bucketing — the scale path. Each
    vector gets a B-bit signature from deterministic hyperplanes; queries
    probe only their own bucket (plus Hamming-1 neighbors), so the join
    touches ~corpus/2^B per query instead of the whole corpus.

Dot products use JVM ``zip_with``/``aggregate`` (no Python in the hot path).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# scale defaults (overridable per call): the LSH bit width is DERIVED, not
# hard-coded — see _auto_bits. The r2 review flagged fixed 4-bit tables as a
# small-corpus recall crutch (them probing ~37% of the corpus per query);
# the auto rule keeps the probed fraction bounded at any corpus size.
LSH_TABLES = 4
LSH_TARGET_FRACTION = 0.02   # max expected fraction of corpus probed/query
LSH_MAX_BUCKET_ROWS = 4096   # bucket granularity floor at huge n
IVF_MAX_TRAIN_ROWS = 65536   # KMeans never iterates over more than ~this


def _auto_bits(n: int, n_tables: int, multiprobe: int,
               target_fraction: float = LSH_TARGET_FRACTION,
               max_bucket_rows: int = LSH_MAX_BUCKET_ROWS) -> int:
    """Signature width for sign-LSH, derived from corpus size and a probed-
    fraction budget (never a fixed constant).

    Two lower bounds, take the max:
      - fraction bound: expected probed fraction per query is
        n_tables * probes_per_table / 2^bits (uniform-bucket model, and
        probes_per_table = 1 + n_bits for Hamming-1 multiprobe); choose the
        smallest width that keeps it <= target_fraction. This bounds the
        candidate-join cost at ANY corpus size.
      - bucket bound: bits >= log2(n / max_bucket_rows), so a single bucket
        never holds more than ~max_bucket_rows rows at huge n (keeps the
        per-bucket self-join from re-growing quadratically at 100 TB).
    Capped at 24 bits (16M buckets — plenty for 10^9+ rows)."""
    b = 2
    while b < 24:
        probes = (1 + b) if multiprobe else 1
        if n_tables * probes / (1 << b) <= target_fraction:
            break
        b += 1
    if n > max_bucket_rows:
        b = max(b, math.ceil(math.log2(n / max_bucket_rows)))
    return min(b, 24)


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0 AS DOUBLE),"
            " (acc, v) -> acc + CAST(v AS DOUBLE) * v)"
        )
    )


def brute_force_topk(emb: DataFrame, n_queries: int = 8, k: int = 5) -> DataFrame:
    """Exact cosine top-k. Queries = the n_queries smallest vec_ids
    (deterministic); self-matches excluded. Output:
    (query_id, neighbor_id, rank, cos_sim)."""
    from sparklog.textops import spread

    emb = spread(emb)
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("_ce"),
        _norm("embedding").alias("_cn"),
    )
    queries = (
        emb.orderBy("vec_id").limit(n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("_qe"),
            _norm("embedding").alias("_qn"),
        )
    )
    joined = corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
    sim = (_dot("_qe", "_ce") / (F.col("_qn") * F.col("_cn"))).alias("cos_sim")
    scored = joined.select("query_id", "neighbor_id", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("int"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


def _bucket_col(vec_col: str, n_bits: int, table: int) -> F.Column:
    """Sign-random-projection bucket id. The projection vectors are ±1
    entries derived from xxhash64(dim_index, bit, table) — dim-agnostic
    (no dimension sniffing, no driver round-trip, no giant literal
    arrays) and fully deterministic. ±1 random projections are a standard
    sign-LSH family; the JVM evaluates everything."""
    sig = F.lit(0)
    for b in range(n_bits):
        dot = F.expr(
            f"aggregate(zip_with({vec_col},"
            f" sequence(0, size({vec_col}) - 1),"
            f" (x, i) -> CAST(x AS DOUBLE) *"
            f" (CASE WHEN pmod(xxhash64(i, {b}, {table}), 2) = 0"
            f" THEN 1.0D ELSE -1.0D END)),"
            f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        sig = sig + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig.cast("int")


def lsh_buckets(emb: DataFrame, n_bits: int = 4, n_tables: int = 6,
                vec_col: str = "embedding") -> DataFrame:
    """Multi-table LSH: one (table_id, bucket) row per table per vector.
    More tables trade candidate volume for recall — the standard knob when
    the corpus is high-entropy (near-random embeddings bucket poorly in a
    single table)."""
    from sparklog.textops import spread

    emb = spread(emb)
    tables = F.array(*[
        F.struct(
            F.lit(t).alias("table_id"),
            _bucket_col(vec_col, n_bits, table=t).alias("bucket"),
        )
        for t in range(n_tables)
    ])
    return emb.select("*", F.explode(tables).alias("_t")).select(
        *emb.columns, "_t.table_id", "_t.bucket"
    )


def embedding_neardup(emb: DataFrame, threshold: float = 0.95,
                      n_bits: int = 4, n_tables: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from shared LSH
    buckets (equi-join, no crossJoin), verified by exact cosine ≥ threshold."""
    sigs = lsh_buckets(emb, n_bits, n_tables)
    l = sigs.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("_ea"),
        _norm("embedding").alias("_na"), "table_id", "bucket",
    )
    r = sigs.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("_eb"),
        _norm("embedding").alias("_nb"),
        F.col("table_id").alias("_t2"), F.col("bucket").alias("_b2"),
    )
    pairs = l.join(
        r,
        (F.col("table_id") == F.col("_t2")) & (F.col("bucket") == F.col("_b2"))
        & (F.col("vec_a") < F.col("vec_b")),
    ).dropDuplicates(["vec_a", "vec_b"])
    sim = _dot("_ea", "_eb") / (F.col("_na") * F.col("_nb"))
    return (
        pairs.select("vec_a", "vec_b", F.round(sim, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def ivf_train_fraction(n: int, max_train_rows: int = IVF_MAX_TRAIN_ROWS) -> float:
    """Sampling fraction that bounds the KMeans training set to
    ~max_train_rows regardless of corpus size. At 100 TB a full-corpus
    multi-pass KMeans.fit is exactly what must not happen; a 64k-row
    sample trains a coarse quantizer of the same quality (centers are a
    low-dimensional summary — they don't sharpen past ~1k rows/centroid)."""
    if n <= max_train_rows:
        return 1.0
    return max_train_rows / n


def ivf_topk(emb: DataFrame, n_queries: int = 8, k: int = 5,
             n_centroids: int | None = None, n_probe: int | None = None,
             seed: int = 7, train_fraction: float | None = None,
             max_train_rows: int = IVF_MAX_TRAIN_ROWS,
             quantizer: str = "kmeans") -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale path.

    1. Pick coarse centers. quantizer="kmeans": pyspark.ml KMeans trained
       on a BOUNDED sample — train_fraction=None derives
       min(1, max_train_rows/n), so the fit never iterates over more than
       ~64k rows no matter the corpus size. quantizer="sample": centers
       are n_centroids corpus vectors chosen by hash order — fully
       DETERMINISTIC across sessions/partitionings (KMeans float-sum
       order varies with partitioning, so its exact output is not
       reproducible bit-for-bit on a caller-provided session; the sample
       quantizer is what the driver's exact-top-k oracle gates).
       Either way centers are tiny (n_centroids x dim) and broadcast.
    2. Assign every corpus vector to its nearest center: ONE scan with a
       JVM argmin fold over the broadcast center array — no shuffle, no
       second ML pass. The inverted lists are just a centroid_id column
       (at 100 TB this is the partitioning key you'd bucket the lake by).
    3. Each query probes only its n_probe nearest centers, so the
       candidate join touches ~n_probe/n_centroids of the corpus instead
       of all of it; exact cosine re-ranks candidates.

    n_centroids=None derives ~sqrt(n) (the standard IVF sizing — balances
    list length n/C against probe count C); n_probe=None derives C/8.
    The gate registration pins small-corpus params with recall 1.0 at
    sf0.01 so the driver's exact-top-k oracle applies (see __spark_entry__).
    """
    from sparklog.textops import spread

    emb = spread(emb)
    # train_fraction only matters on the kmeans branch — deriving it for
    # quantizer="sample" would cost a full count() action per call (the
    # shipped gate config) for a value that is never read
    need_fraction = train_fraction is None and quantizer != "sample"
    if n_centroids is None or need_fraction:
        n = emb.count()
        if n_centroids is None:
            n_centroids = max(4, min(4096, int(math.isqrt(max(n, 1)))))
        if need_fraction:
            train_fraction = ivf_train_fraction(n, max_train_rows)
    if n_probe is None:
        n_probe = max(2, n_centroids // 8)
    if quantizer == "sample":
        # deterministic hash-ordered sample; ids in hash order
        rows = (
            emb.select("vec_id", "embedding")
            .orderBy(F.xxhash64(F.col("vec_id")), "vec_id")
            .limit(n_centroids).collect()
        )
        centers = [[float(x) for x in r["embedding"]] for r in rows]
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = emb.select(
            "vec_id",
            array_to_vector(F.col("embedding").cast("array<double>")).alias("_f"),
        )
        train = feats if train_fraction >= 1.0 else feats.sample(
            fraction=train_fraction, seed=seed
        )
        model = KMeans(k=n_centroids, seed=seed, featuresCol="_f",
                       predictionCol="_c").fit(train)
        centers = [[float(x) for x in c] for c in model.clusterCenters()]
    centroids = emb.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        "centroid_id INT, center ARRAY<DOUBLE>",
    )
    # corpus -> nearest center: one JVM argmin fold per row over the
    # broadcast (centroid_id, center) array — a map-side scan, NO shuffle
    # and no C x n intermediate. Ties break to the lowest centroid_id
    # (the array is sorted) so assignment is deterministic.
    centers_arr = centroids.agg(
        F.sort_array(F.collect_list(F.struct("centroid_id", "center"))).alias("_cs")
    )
    l2 = ("aggregate(zip_with(embedding, c.center,"
          " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
          " CAST(0 AS DOUBLE), (a, v) -> a + v)")
    # array_min over (d, id) structs: ONE l2 evaluation per centroid —
    # the previous CASE-based fold evaluated the l2 expression twice per
    # winning comparison. Struct ordering is (d, then id), so ties still
    # break to the lowest centroid_id; assignment is value-identical
    # (A/B-checked) and deterministic.
    argmin = F.expr(
        f"array_min(transform(_cs,"
        f" c -> named_struct('d', {l2}, 'id', c.centroid_id))).id"
    )
    assigned = (
        emb.crossJoin(F.broadcast(centers_arr))
        .select(
            "vec_id", "embedding", argmin.alias("centroid_id"),
            _norm("embedding").alias("_n"),
        )
    )
    # queries only need (id, embedding, norm): deriving them from the
    # raw frame instead of `assigned` avoids re-evaluating the full-
    # corpus argmin projection a second time just to keep n_queries rows
    # (the two consumers of `assigned` are separate physical subtrees)
    queries = emb.join(
        F.broadcast(emb.orderBy("vec_id").limit(n_queries).select("vec_id")),
        "vec_id",
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qe"),
        _norm("embedding").alias("_qn"),
    )
    # squared L2 from query to every centroid (JVM fold), keep n_probe best
    qc = queries.crossJoin(F.broadcast(centroids))
    dist = F.expr(
        "aggregate(zip_with(_qe, center, (x, y) -> (CAST(x AS DOUBLE) - y)"
        " * (CAST(x AS DOUBLE) - y)), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    wq = Window.partitionBy("query_id").orderBy(dist.asc(), F.col("centroid_id"))
    probes = (
        qc.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "_qe", "_qn", "centroid_id")
    )
    joined = assigned.join(
        F.broadcast(probes),
        (assigned["centroid_id"] == probes["centroid_id"])
        & (F.col("vec_id") != F.col("query_id")),
    )
    sim = (_dot("_qe", "embedding") / (F.col("_qn") * F.col("_n"))).alias("cos_sim")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        joined.select("query_id", F.col("vec_id").alias("neighbor_id"), sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("int"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


def lsh_topk(emb: DataFrame, n_queries: int = 8, k: int = 5,
             n_bits: int | None = None, n_tables: int = LSH_TABLES,
             multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: candidates limited to vectors sharing an LSH
    bucket with the query (equi-join on (table_id, bucket) — the scale
    path: the join touches a bounded fraction of the corpus per query
    instead of all of it).

    - n_bits=None derives the signature width from the corpus size and a
      probed-fraction budget (_auto_bits) — one count() of the corpus, the
      only full-scan metadata this needs.
    - multiprobe=1 additionally probes every Hamming-1 neighbor of the
      query's bucket (the standard multiprobe trick: recall of ~2x the
      tables at the cost of n_bits extra PROBES, not extra corpus rows —
      only the tiny query side explodes).
    The gate registration in __spark_entry__.py pins small-corpus params
    tuned so recall is exactly 1.0 at sf0.01, which makes the driver's
    exact-top-k DuckDB oracle applicable verbatim."""
    joined = _lsh_join(emb, n_queries, n_bits, n_tables, multiprobe)
    sim = (_dot("_qe", "_ce") / (F.col("_qn") * F.col("_cn"))).alias("cos_sim")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        joined.select("query_id", "neighbor_id", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("int"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


def _lsh_join(emb: DataFrame, n_queries: int, n_bits: int | None,
              n_tables: int, multiprobe: int) -> DataFrame:
    """Candidate generation for lsh_topk: deduped (query, neighbor) pairs
    sharing a probed bucket, carrying the payload columns the scorer
    needs. Factored out so tests can measure the candidate fraction the
    probe parameters actually touch."""
    if n_bits is None:
        n_bits = _auto_bits(emb.count(), n_tables, multiprobe)
    sigs = lsh_buckets(emb, n_bits, n_tables)
    corpus = sigs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("_ce"),
        _norm("embedding").alias("_cn"),
        "table_id", "bucket",
    )
    queries = (
        sigs.join(
            F.broadcast(
                emb.orderBy("vec_id").limit(n_queries).select("vec_id")
            ),
            "vec_id",
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("_qe"),
            _norm("embedding").alias("_qn"),
            F.col("table_id").alias("_qt"),
            F.col("bucket").alias("_qb"),
        )
    )
    if multiprobe:
        # explode the QUERY side into the probe set: own bucket + every
        # Hamming-1 neighbor (n_bits + 1 probes per table per query)
        probe = F.explode(
            F.array(F.col("_qb"), *[
                F.col("_qb").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)
            ])
        )
        queries = queries.withColumn("_qb", probe)
    return corpus.join(
        F.broadcast(queries),
        (F.col("table_id") == F.col("_qt"))
        & (F.col("bucket") == F.col("_qb"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).dropDuplicates(["query_id", "neighbor_id"])


def quantize_embeddings(emb: DataFrame, bits: int = 8) -> DataFrame:
    """Symmetric per-vector integer quantization for embedding storage:
    q_i = clamp(floor(x_i / scale * qmax)), scale = max|x_i|. At 100 TB
    an int8 embedding lake is 4x smaller than float32 and the scan is
    correspondingly faster; the scale column dequantizes on read.

    floor (NOT round) on purpose: round's tie behavior differs across
    engines (banker's vs half-away-from-zero — a measured r3 pitfall),
    floor is bit-deterministic everywhere, and the uniform-quantizer
    error bound only shifts from 0.5 to 1 ULP. Zero vectors quantize to
    zeros with scale 0. Pure JVM higher-order array expressions — one
    map-only projection, no shuffle, no Python.

    Output: (vec_id, scale DOUBLE, q ARRAY<INT>).
    """
    qmax = (1 << (bits - 1)) - 1
    scale = F.array_max(
        F.transform(F.col("embedding"),
                    lambda v: F.abs(v.cast("double")))
    )
    d = emb.select("vec_id", "embedding", scale.alias("scale"))
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("embedding"),
            lambda v: F.greatest(
                F.lit(-qmax),
                F.least(
                    F.lit(qmax),
                    F.floor(v.cast("double") / F.col("scale") * qmax),
                ),
            ).cast("int"),
        ),
    ).otherwise(
        F.transform(F.col("embedding"), lambda v: F.lit(0).cast("int"))
    )
    return d.select("vec_id", "scale", q.alias("q"))
