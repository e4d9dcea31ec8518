"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pages table carries ``html BINARY`` (stand-in for image/audio/video
payloads). Real decoders (PIL/ffmpeg) are not in this container, so the
decode step is STUBBED (deterministic fake features / NotImplementedError),
but the Spark-side plumbing is real and tested: schema, Arrow batch shape
(mapInPandas over binary columns), and partition-stable determinism.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("magic", T.StringType()),
    T.StructField("content_hash", T.LongType()),
    # stub "decoded" features — deterministic fakes keyed on content
    T.StructField("fake_width", T.IntegerType()),
    T.StructField("fake_height", T.IntegerType()),
])

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def _fnv1a_bytes(b: bytes) -> int:
    h = _FNV_OFFSET
    for x in b:
        h = ((h ^ x) * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def decode_binary(payload: bytes) -> np.ndarray:
    """REAL decoder stub: the image/audio libs are not in this container.

    At deployment this is the only function to replace (PIL.Image.open /
    soundfile.read / pyav frame sampling); everything around it — the
    mapInPandas batching, schema, and partitioning — is production-shaped.
    """
    raise NotImplementedError(
        "binary decode requires an image/audio codec not present in this "
        "container; extract_meta uses deterministic fake features instead"
    )


def extract_meta(pages: DataFrame, binary_col: str = "html") -> DataFrame:
    """mapInPandas over the binary column -> typed metadata rows.

    Arrow hands binary columns to pandas as Python ``bytes`` objects; the
    batch shape (one pd.DataFrame per Arrow batch) is asserted in tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            n = len(pdf)
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": payloads.map(lambda b: 0 if b is None else len(b)),
                "magic": payloads.map(
                    lambda b: "" if not b else b[:6].decode("latin-1")
                ),
                "content_hash": payloads.map(
                    lambda b: np.uint64(_fnv1a_bytes(b or b"")).astype(np.int64)
                ),
            })
            # deterministic fake decode (stands in for decode_binary)
            out["fake_width"] = (out["content_hash"].astype("uint64") % 1920).astype(
                "int32"
            )
            out["fake_height"] = (
                out["content_hash"].astype("uint64") % 1080
            ).astype("int32")
            yield out

    return pages.select("doc_id", binary_col).mapInPandas(run, META_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized", T.BinaryType()),
])


def resize_binary(pages: DataFrame, width: int, height: int,
                  binary_col: str = "html") -> DataFrame:
    """Decode -> resize -> re-encode plumbing (1 row in, 1 row out).

    The decode/re-encode kernel is the stub (decode_binary); the
    deterministic fake keeps output bytes a pure function of input bytes
    so lineage/dedup over resized payloads stays testable. Swapping in a
    real codec changes only the inner lambda."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = f"RSZ:{width}x{height}:".encode()
        for pdf in batches:
            payloads = pdf[binary_col]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": np.full(len(pdf), width, dtype="int32"),
                "height": np.full(len(pdf), height, dtype="int32"),
                # fake "resized" bytes: header + content hash + truncated
                # payload — deterministic, size-bounded like a real resize
                "resized": payloads.map(
                    lambda b: header
                    + _fnv1a_bytes(b or b"").to_bytes(8, "big")
                    + (b or b"")[: width * height // 64]
                ),
            })

    return pages.select("doc_id", binary_col).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_sec", T.DoubleType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(videos: DataFrame, fps: float = 1.0,
                  binary_col: str = "html",
                  duration_col: str | None = None) -> DataFrame:
    """Frame sampling plumbing: ONE input row explodes into ceil(dur*fps)
    output rows — the mapInPandas batch shape a real pyav sampler needs.
    Fake duration = byte_len/1000 s when no duration column exists; fake
    frames are content-hash-keyed slices (deterministic)."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for _, r in pdf.iterrows():
                b = r[binary_col] or b""
                dur = (float(r[duration_col]) if duration_col
                       else len(b) / 1000.0)
                n_frames = max(1, math.ceil(dur * fps))
                h = _fnv1a_bytes(b)
                for k in range(n_frames):
                    rows.append((
                        int(r["doc_id"]), k, k / fps,
                        f"FRAME:{k}:".encode() + h.to_bytes(8, "big"),
                    ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "ts_sec", "frame"]
            )

    cols = ["doc_id", binary_col] + ([duration_col] if duration_col else [])
    return videos.select(*cols).mapInPandas(run, FRAME_SCHEMA)


EMBED_DIM = 16

EMBED_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def embed_binary(pages: DataFrame, binary_col: str = "html",
                 dim: int = EMBED_DIM) -> DataFrame:
    """Feature-extraction plumbing: binary payload -> array<float> embedding
    (vec_id, embedding), directly consumable by sparklog.ann. The encoder
    is the stub (a real CLIP/wav2vec call goes in the inner loop); fake
    features are seeded from the content hash so identical payloads embed
    identically — which makes ann.embedding_neardup find exact dups."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            embs = []
            for b in payloads:
                rng = np.random.RandomState(
                    _fnv1a_bytes(b or b"") & 0x7FFFFFFF
                )
                embs.append(rng.standard_normal(dim).astype("float32"))
            yield pd.DataFrame({
                "vec_id": pdf["doc_id"].astype("int64"),
                "embedding": embs,
            })

    return pages.select("doc_id", binary_col).mapInPandas(run, EMBED_SCHEMA)
