"""Deterministic synthesis rules, shared between Spark and the DuckDB oracle.

Every synthesized syslog field is a pure function of ``doc_id`` (and the
row's ``lang``/``text``), expressed as an ANSI-SQL fragment that both Spark
SQL and DuckDB evaluate identically (integer %, ||, CASE, CAST AS STRING).
This is what makes the driver's oracle a true end-to-end check: Spark runs
synth -> parse -> query, DuckDB computes the expected values directly from
the same arithmetic — if the parser mangled ANY field the hashes diverge.

Determinism is keyed on doc_id only (never partition/row index), so results
are stable across any partitioning/parallelism (FIXTURES.md §2).
"""

from __future__ import annotations

from sparklog.schema import FACILITY_NAMES, LANG_NAMES, SEVERITY_NAMES

# 2016-01-10T00:00:00Z — inside the reference tests' date window
EPOCH_START = 1452384000
WEEK_SECONDS = 604800

FACILITY = "CAST((doc_id * 13) % 24 AS INT)"
SEVERITY = "CAST((doc_id * 7) % 8 AS INT)"
PRI = "((doc_id * 13) % 24) * 8 + (doc_id * 7) % 8"
VERSION = "CAST(1 AS INT)"

# uniform over a 7-day window starting 2016-01-10 (FIXTURES.md §1)
WARC_SECS = f"({EPOCH_START} + (doc_id * 7919) % {WEEK_SECONDS})"

# timestamp rendering variant: Z / +00:00 / -05:00 / .frac Z / nil
TS_VARIANT = "doc_id % 5"
TS_SECS = f"CASE WHEN doc_id % 5 = 4 THEN NULL ELSE {WARC_SECS} END"
TS_NANOS = (
    "CASE WHEN doc_id % 5 = 4 THEN NULL "
    "WHEN doc_id % 5 = 3 THEN (doc_id % 1000) * 1000000 "
    "ELSE 0 END"
)

# Zipf-skewed host pool (40/20/10/10% head + tail) — exercises salted
# repartition; one dash-prefixed host covers parser.rs:623-639 semantics.
HOST = (
    "CASE WHEN doc_id % 20 < 8 THEN 'web-fe-01.example.com' "
    "WHEN doc_id % 20 < 12 THEN 'cache-02.example.com' "
    "WHEN doc_id % 20 < 14 THEN 'db-03.example.com' "
    "WHEN doc_id % 20 < 16 THEN '-edge-04.example.com' "
    "ELSE 'node-' || CAST(doc_id % 12 AS STRING) || '.example.net' END"
)
HOSTNAME = f"CASE WHEN doc_id % 29 = 7 THEN NULL ELSE {HOST} END"

URL = f"'https://' || ({HOST}) || '/p/' || CAST(doc_id AS STRING)"

_APPS = ("CROND", "mgd", "someservice", "nginx",
         "postfix", "sshd", "statsd", "kernelmon")
_APP_CASE = "CASE (doc_id * 3) % 8 " + " ".join(
    f"WHEN {i} THEN '{a}'" for i, a in enumerate(_APPS)
) + " END"
APPNAME = f"CASE WHEN doc_id % 15 = 4 THEN NULL ELSE {_APP_CASE} END"

PROCID_PID = (
    "CAST(CASE WHEN doc_id % 3 = 0 THEN 1000 + doc_id % 60000 ELSE NULL END AS INT)"
)
PROCID_NAME = (
    "CASE WHEN doc_id % 3 = 1 THEN 'worker-' || CAST(doc_id % 10 AS STRING) "
    "ELSE NULL END"
)
PROCID_TERM = (
    "CASE WHEN doc_id % 3 = 0 THEN CAST(1000 + doc_id % 60000 AS STRING) "
    "WHEN doc_id % 3 = 1 THEN 'worker-' || CAST(doc_id % 10 AS STRING) "
    "ELSE '-' END"
)

MSGID = (
    "CASE WHEN doc_id % 4 = 0 THEN 'MID' || CAST(doc_id % 100 AS STRING) "
    "ELSE NULL END"
)

# SD classes: nil / base [meta lang seq] / + origin / + duplicate-meta merge
# / + empty element / + escaped values
SD_NIL = "doc_id % 17 = 5"
SD_HAS_ORIGIN = "doc_id % 6 = 2"
SD_HAS_DUP = "doc_id % 11 = 3"
SD_HAS_EMPTY = "doc_id % 13 = 6"
SD_HAS_ESC = "doc_id % 19 = 7"

# expected value of sd['meta']['lang'] after parsing
SD_META_LANG = f"CASE WHEN {SD_NIL} THEN NULL ELSE lang END"
SD_META_SEQ = f"CASE WHEN {SD_NIL} THEN NULL ELSE CAST(doc_id AS STRING) END"
# duplicate [meta dup="…"] element merges into the same meta map
SD_META_DUP = (
    f"CASE WHEN NOT ({SD_NIL}) AND {SD_HAS_DUP} "
    "THEN CAST(doc_id % 2 AS STRING) ELSE NULL END"
)
# escaped param values: note="q\"v" -> q"v ; path="a\\b" -> a\b
SD_ESC_NOTE = (
    f"CASE WHEN NOT ({SD_NIL}) AND {SD_HAS_ESC} THEN 'q\"v' ELSE NULL END"
)

# number of distinct SD-IDs after the duplicate-meta merge
SD_LEN = (
    f"CASE WHEN {SD_NIL} THEN 0 ELSE "
    f"1 + (CASE WHEN {SD_HAS_ORIGIN} THEN 1 ELSE 0 END) "
    f"+ (CASE WHEN {SD_HAS_EMPTY} THEN 1 ELSE 0 END) "
    f"+ (CASE WHEN {SD_HAS_ESC} THEN 1 ELSE 0 END) END"
)

# corruption classes (only when synthesized with corrupt=True)
CORRUPT = "doc_id % 23 = 9"
CORRUPT_ERROR = (
    f"CASE WHEN NOT ({CORRUPT}) THEN NULL "
    "WHEN doc_id % 3 = 0 THEN 'ExpectedTokenErr:>' "
    "WHEN doc_id % 3 = 1 THEN 'TooFewDigits' "
    "ELSE 'UnexpectedEndOfInput' END"
)

HOUR_EPOCH = f"CASE WHEN doc_id % 5 = 4 THEN NULL ELSE {WARC_SECS} - ({WARC_SECS}) % 3600 END"


def name_case(expr: str, names) -> str:
    """CASE ladder mapping an int expr to its enum name (facility.rs:87-114,
    severity.rs:57-68 domains)."""
    arms = " ".join(f"WHEN {i} THEN '{n}'" for i, n in enumerate(names))
    return f"CASE {expr} {arms} END"


FACILITY_NAME = name_case(FACILITY, FACILITY_NAMES)
SEVERITY_NAME = name_case(SEVERITY, SEVERITY_NAMES)

_LANG_ARMS = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in LANG_NAMES.items())
LANG_NAME = f"CASE lang {_LANG_ARMS} ELSE 'Unknown' END"
