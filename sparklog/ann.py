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

import numpy as np
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


def _hyperplanes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim)).astype("float64")


def lsh_signature(emb: DataFrame, dim: int, n_bits: int = 8,
                  vec_col: str = "embedding") -> DataFrame:
    """Sign-random-projection signature as an int column (JVM arithmetic:
    the hyperplane matrix is folded into literal arrays)."""
    planes = _hyperplanes(dim, n_bits)
    sig = F.lit(0)
    for b in range(n_bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return emb.withColumn("lsh_bucket", sig.cast("int"))


def lsh_topk(emb: DataFrame, n_queries: int = 8, k: int = 5,
             n_bits: int = 8) -> DataFrame:
    """Approximate top-k: candidates limited to the query's own LSH bucket
    (single equi-join on bucket id — scale path for huge corpora)."""
    dim = len(emb.select("embedding").first()[0])
    sigs = lsh_signature(emb, dim, n_bits)
    corpus = sigs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("_ce"),
        _norm("embedding").alias("_cn"),
        "lsh_bucket",
    )
    queries = (
        sigs.orderBy("vec_id").limit(n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("_qe"),
            _norm("embedding").alias("_qn"),
            F.col("lsh_bucket").alias("_qb"),
        )
    )
    joined = corpus.join(
        F.broadcast(queries),
        (F.col("lsh_bucket") == F.col("_qb"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
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
