"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pages table carries ``html BINARY`` (stand-in for image/audio/video
payloads). Image/video decoders (PIL/ffmpeg) are not in this container,
so those decode paths are STUBBED (deterministic fake features /
NotImplementedError) — but AUDIO decode is REAL: RIFF/WAVE payloads are
encoded and decoded with the stdlib ``wave`` module + numpy (synth_wav /
decode_binary / audio_features), end-to-end tested and driver-verified.
The Spark-side plumbing is real throughout: schema, Arrow batch shape
(mapInPandas over binary columns), and partition-stable determinism.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


WAV_RATE = 16000
WAV_AMPLITUDE = 0.5


def synth_wav(doc_id: int, rate: int = WAV_RATE) -> bytes:
    """Deterministic mono PCM16 WAV payload for a doc: 8000 + doc_id%1000
    samples of a (220 + doc_id%440) Hz sine at amplitude 0.5, written by
    the REAL stdlib encoder — so decode tests exercise a genuine codec
    roundtrip, not a fake byte format."""
    n = 8000 + doc_id % 1000
    freq = 220.0 + (doc_id % 440)
    t = np.arange(n, dtype=np.float64) / rate
    pcm = (WAV_AMPLITUDE * np.sin(2 * np.pi * freq * t) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_binary(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decode for audio: RIFF/WAVE -> (float32 mono samples in
    [-1, 1], sample_rate), via the stdlib ``wave`` module + numpy — no
    external codec needed. Image/video formats still raise: PIL/ffmpeg
    are not in this container; at deployment those branches are the only
    code to add (the mapInPandas batching, schema, and partitioning
    around this function are production-shaped)."""
    if payload and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if sw != 2:
            raise NotImplementedError("only PCM16 WAV is supported")
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        return x, rate
    raise NotImplementedError(
        "image/video decode requires a codec not present in this "
        "container (PIL/ffmpeg); WAV audio decodes for real"
    )


AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_sec", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
])


def audio_features(audio: DataFrame, binary_col: str = "wav") -> DataFrame:
    """Real feature extraction over decoded audio: (doc_id, byte_len,
    sample_rate, n_samples, duration, rms, peak) — the audio analog of
    extract_meta, with an actual decoder in the loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf[binary_col]):
                x, rate = decode_binary(b)
                rows.append((
                    int(did), len(b), rate, len(x),
                    round(len(x) / rate, 4),
                    round(float(np.sqrt(np.mean(x * x))), 4),
                    round(float(np.max(np.abs(x))), 4),
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "byte_len", "sample_rate", "n_samples",
                "duration_sec", "rms", "peak",
            ])

    return audio.select("doc_id", binary_col).mapInPandas(run, AUDIO_SCHEMA)


def synth_audio_df(docs: DataFrame) -> DataFrame:
    """(doc_id) -> (doc_id, wav BINARY): deterministic WAV payloads
    synthesized per doc by the real encoder (mapInPandas; partitioning-
    independent since payload is a pure function of doc_id)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "wav": [synth_wav(int(d)) for d in pdf["doc_id"]],
            })

    return docs.select("doc_id").mapInPandas(
        run, "doc_id LONG, wav BINARY"
    )


def extract_meta(pages: DataFrame, binary_col: str = "html") -> DataFrame:
    """mapInPandas over the binary column -> typed metadata rows.

    Arrow hands binary columns to pandas as Python ``bytes`` objects; the
    batch shape (one pd.DataFrame per Arrow batch) is asserted in tests.
    content_hash is computed JVM-side (F.xxhash64 on the binary column)
    BEFORE the Python stage — hashing is exactly the kind of per-byte
    work that must not run in a Python loop at 100 TB; only the decode
    stand-in (magic sniff + fake dimensions) stays in the UDF, because
    that is the part a real codec would replace."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": payloads.map(lambda b: 0 if b is None else len(b)),
                "magic": payloads.map(
                    lambda b: "" if not b else b[:6].decode("latin-1")
                ),
                "content_hash": pdf["content_hash"].astype("int64"),
            })
            # deterministic fake decode (stands in for decode_binary)
            out["fake_width"] = (out["content_hash"].astype("uint64") % 1920).astype(
                "int32"
            )
            out["fake_height"] = (
                out["content_hash"].astype("uint64") % 1080
            ).astype("int32")
            yield out

    return pages.select(
        "doc_id", binary_col,
        F.xxhash64(F.col(binary_col)).alias("content_hash"),
    ).mapInPandas(run, META_SCHEMA)


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
