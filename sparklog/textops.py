"""Training-data pipeline operators over the ``documents`` table.

All hot paths are JVM built-ins (whole-stage codegen); Python appears only
in Arrow-batched pandas UDFs for the bit-twiddling ops (simhash,
fingerprint). Designed for 100 TB: every op is a single scan plus at most
one shuffle on a well-distributed key (hash buckets / band keys), no
driver-side loops, no crossJoins on the full corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# basic text analysis (all JVM expressions)
# ---------------------------------------------------------------------------


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token + char counts."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Cheap quality heuristics: length, word count, mean word length."""
    words = F.size(F.split(F.col("text"), " "))
    chars = F.length("text")
    return docs.select(
        "doc_id",
        chars.cast("long").alias("n_chars"),
        words.cast("long").alias("n_words"),
        F.round(chars.cast("double") / words, 4).alias("avg_word_len"),
        F.when((chars >= 100) & (words >= 20), 1).otherwise(0).alias("quality_ok"),
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy: one shuffle on md5(text).

    At 100 TB the md5 (16 bytes) shuffles instead of the document body;
    keep_doc_id = min(doc_id) is the canonical survivor.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# language-ID marker words (tiny per-language stopword sets; deterministic)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: score = |words ∩ markers| per language,
    argmax wins (ties broken by language order). Pure JVM set ops."""
    words = F.split(F.lower(F.col("text")), " ")
    scored = docs.select("doc_id", words.alias("_w"))
    for lg, markers in _LANG_MARKERS.items():
        scored = scored.withColumn(
            f"_s_{lg}",
            F.size(F.array_intersect("_w", F.array(*[F.lit(m) for m in markers]))),
        )
    best_score = F.greatest(*[F.col(f"_s_{lg}") for lg in _LANG_MARKERS])
    pred = F.lit("und")
    for lg in reversed(list(_LANG_MARKERS)):
        pred = F.when(
            (F.col(f"_s_{lg}") == best_score) & (best_score > 0), F.lit(lg)
        ).otherwise(pred)
    return scored.select(
        "doc_id", pred.alias("pred_lang"), best_score.cast("int").alias("score")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection
# ---------------------------------------------------------------------------

MINHASH_PERMS = 32
LSH_BANDS = 8  # 8 bands x 4 rows


def _shingles(text_col: str = "text", k: int = 5) -> F.Column:
    """Distinct k-char shingles, JVM-side: sequence + transform + substring."""
    return F.array_distinct(
        F.expr(
            f"CASE WHEN length({text_col}) >= {k} THEN "
            f"transform(sequence(0, length({text_col}) - {k}),"
            f" i -> substring({text_col}, i + 1, {k})) "
            f"ELSE array() END"
        )
    )


# Universal-hash permutations over the 31-bit Mersenne prime: shingles are
# string-hashed ONCE (xxhash64), then each "permutation" is (a*x + b) mod p
# with x, a, b < 2^31 so the product stays < 2^62 — no ANSI-mode long
# overflow. 1 string hash + 32 int mixes per shingle instead of 32 string
# hashes.
_MH_P = 2147483647  # 2^31 - 1
_MH_A = [(0x9E3779B9 * (j + 1) + 0x7F4A7C15) % (_MH_P - 1) + 1
         for j in range(MINHASH_PERMS)]
_MH_B = [(0xC2B2AE3D ^ (j * 0x165667B1)) % _MH_P for j in range(MINHASH_PERMS)]


def minhash_signature(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + minhash signature (array of MINHASH_PERMS longs), all JVM:
    sig[j] = min over shingles of ((a_j * x + b_j) mod p), x = h mod p."""
    sh = docs.select("doc_id", _shingles(text_col).alias("_sh")).filter(
        F.size("_sh") > 0
    )
    hashed = sh.withColumn(
        "_h", F.expr(f"transform(_sh, s -> pmod(xxhash64(s), {_MH_P}L))")
    )
    sig = F.array(
        *[
            F.array_min(
                F.expr(
                    f"transform(_h, x -> pmod(x * {_MH_A[j]}L + {_MH_B[j]}L,"
                    f" {_MH_P}L))"
                )
            )
            for j in range(MINHASH_PERMS)
        ]
    )
    return hashed.select("doc_id", sig.alias("sig"), "_sh")


def minhash_neardup(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """LSH candidate generation + exact shingle-Jaccard verification.

    Scale shape: explode to (band_id, band_key) — one shuffle on the band
    key; only same-bucket docs pair up (no full crossJoin). Candidate pairs
    are then verified with exact Jaccard on the shingle sets.
    """
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    sigs = minhash_signature(docs)
    bands = sigs.select(
        "doc_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[
                                F.col("sig")[i]
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ]
                        ).alias("band_key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "_sh", "band.band_id", "band.band_key")
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l._sh").alias("_sha"),
            F.col("r._sh").alias("_shb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
    union = F.size(F.array_union("_sha", "_shb")).cast("double")
    return (
        pairs.select(
            "doc_a", "doc_b", F.round(inter / union, 4).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard(docs: DataFrame, k: int = 5) -> DataFrame:
    """Exact k-gram Jaccard for consecutive-doc_id pairs (the deterministic
    verification kernel the LSH pipelines reuse; standalone here so the
    oracle can check it end-to-end with DuckDB list functions)."""
    sh = docs.select("doc_id", _shingles("text", k).alias("_s"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
    inter = F.size(F.array_intersect("a._s", "b._s")).cast("double")
    union = F.size(F.array_union("a._s", "b._s")).cast("double")
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(inter / union, 4).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# SimHash near-dup (pandas UDF for the bit ops) + banded pairing
# ---------------------------------------------------------------------------


@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (deterministic FNV-1a base)."""

    def fnv1a(tok: str) -> int:
        h = 0xCBF29CE484222325
        for b in tok.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for tok in t.split():
            h = np.uint64(fnv1a(tok))
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            acc += np.where(bits == 1, 1, -1)
        sig = 0
        for b in range(64):
            if acc[b] > 0:
                sig |= 1 << b
        out[i] = np.int64(np.uint64(sig).astype(np.int64))
    return pd.Series(out)


def simhash(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", _simhash64(F.col("text")).alias("simhash"))


def simhash_neardup(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Hamming-≤3 pairs via 4x16-bit chunk banding (pigeonhole: any pair
    within distance 3 shares at least one exact 16-bit chunk), then exact
    popcount verification — same one-shuffle shape as MinHash LSH."""
    sigs = simhash(docs)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk_val")
    l, r = chunks.alias("l"), chunks.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("_ha"),
            F.col("r.simhash").alias("_hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        pairs.select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# document fingerprint (rolling polynomial hash)
# ---------------------------------------------------------------------------

_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


@F.pandas_udf(T.LongType())
def _fingerprint64(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash of the normalized text (lowercase, collapsed
    whitespace) mod 2^61-1 — stable content identity for lineage."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        norm = " ".join(t.lower().split())
        h = 0
        for b in norm.encode("utf-8"):
            h = (h * _FP_BASE + b) % _FP_MOD
        out[i] = h
    return pd.Series(out)


def fingerprint(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", _fingerprint64(F.col("text")).alias("fp"))
