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
