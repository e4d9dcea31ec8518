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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def ivf_topk(emb: DataFrame, n_queries: int = 8, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 7,
             train_fraction: float = 1.0) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the k-means scale path.

    1. Train a coarse quantizer (pyspark.ml KMeans, optionally on a
       sample) — centers are tiny (n_centroids x dim) and broadcast.
    2. Assign every corpus vector to its nearest centroid: ONE pass, the
       inverted lists are just a centroid_id column (at 100 TB this is
       the partitioning key you'd also bucket the lake by).
    3. Each query probes only its n_probe nearest centroids, so the
       candidate join touches ~n_probe/n_centroids of the corpus instead
       of all of it; exact cosine re-ranks candidates.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from sparklog.textops import spread

    emb = spread(emb)
    feats = emb.select(
        "vec_id", "embedding",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("_f"),
    )
    train = feats if train_fraction >= 1.0 else feats.sample(
        fraction=train_fraction, seed=seed
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="_f",
                   predictionCol="_c").fit(train)
    assigned = model.transform(feats).select(
        "vec_id", "embedding", F.col("_c").alias("centroid_id"),
        _norm("embedding").alias("_n"),
    )
    centers = model.clusterCenters()
    centroids = emb.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "centroid_id INT, center ARRAY<DOUBLE>",
    )
    queries = assigned.join(
        F.broadcast(emb.orderBy("vec_id").limit(n_queries).select("vec_id")),
        "vec_id",
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qe"),
        F.col("_n").alias("_qn"),
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
             n_bits: int = 4, n_tables: int = 6) -> DataFrame:
    """Approximate top-k: candidates limited to vectors sharing any LSH
    bucket with the query (equi-join on (table_id, bucket) — the scale
    path: the join touches ~n_tables * corpus / 2^n_bits rows per query
    instead of the whole corpus)."""
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
    joined = corpus.join(
        F.broadcast(queries),
        (F.col("table_id") == F.col("_qt"))
        & (F.col("bucket") == F.col("_qb"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).dropDuplicates(["query_id", "neighbor_id"])
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
