"""Checkpoint/resume for the batch pipeline (north-rule stage D9).

Unit of work = a deterministic chunk of the input keyed by
``pmod(xxhash64(doc_id), n_chunks)`` (at production scale: one Iceberg
day-partition of ``warc_ts`` per chunk — same mechanism, coarser key).

Protocol:
  1. planned chunks = all chunk ids; done chunks = manifest entries.
  2. each run processes only pending chunks; after a chunk's sinks are
     written, its manifest entry (chunk id, rows_in, rows_ok, rows_rejected,
     content fingerprint) is written ATOMICALLY (tmp file + rename) —
     a crash mid-chunk leaves no entry, so the chunk reruns idempotently
     (sink writes go to per-chunk subdirectories, overwrite mode).
  3. resume = anti-join of planned vs manifest — restart-safe with
     per-partition lineage preserved in the manifest itself.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


def chunk_col(n_chunks: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_chunks)).cast("int")


def manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, MANIFEST_DIR)


def done_chunks(checkpoint_dir: str) -> dict[int, dict]:
    mdir = manifest_path(checkpoint_dir)
    if not os.path.isdir(mdir):
        return {}
    out: dict[int, dict] = {}
    for fn in os.listdir(mdir):
        if fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                entry = json.load(f)
            out[entry["chunk"]] = entry
    return out


def write_manifest_entry(checkpoint_dir: str, entry: dict) -> None:
    """Atomic: write to a temp file in the same dir, then rename."""
    mdir = manifest_path(checkpoint_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"chunk-{entry['chunk']:05d}.json")
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, final)


def pending_chunks(checkpoint_dir: str, n_chunks: int) -> list[int]:
    done = done_chunks(checkpoint_dir)
    return [c for c in range(n_chunks) if c not in done]


def content_fingerprint(df: DataFrame) -> int:
    """Order-independent content hash of a chunk's parsed output: sum of
    per-row xxhash64 folded to 31 bits (keeps the ANSI-mode long sum safe
    for up to 2^32 rows per chunk)."""
    row_hash = F.xxhash64(
        F.col("doc_id"), F.coalesce(F.col("parse_error"), F.lit(""))
    )
    r = df.select(
        F.sum(F.pmod(row_hash, F.lit(2147483647))).alias("fp")
    ).collect()[0]
    return int(r["fp"] or 0)
