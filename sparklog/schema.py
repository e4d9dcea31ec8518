"""Canonical schemas and enum domains for the RFC 5424 log pipeline.

Data model derived from the reference record type (SURVEY.md §1):
  - SyslogMessage struct   -> /root/reference/src/message.rs:146-161
  - SyslogFacility domain  -> /root/reference/src/facility.rs:12-37,87-114
  - SyslogSeverity domain  -> /root/reference/src/severity.rs:11-20,57-68
  - ParseErr taxonomy      -> /root/reference/src/parser.rs:13-45

The reference's Rust sum type ``ProcId`` (message.rs:26-29) becomes two
nullable columns (``procid_pid``, ``procid_name``), exactly one non-null
when procid is present. Timestamps stay as (unix seconds BIGINT, nanos INT)
to match the reference exactly (parser.rs:375-376): Spark TIMESTAMP is
µs-precision so nanos must be a separate column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- enum domains (closed; out-of-range ints are parse errors) ------------

# facility.rs:87-114 — values per RFC 5424, names per Linux.
FACILITY_NAMES: tuple[str, ...] = (
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clockd",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6",
    "local7",
)

# severity.rs:57-68
SEVERITY_NAMES: tuple[str, ...] = (
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
)

# lang lookup used by the enrich stage (FIXTURES.md §4).
LANG_NAMES: dict[str, str] = {
    "en": "English", "de": "German", "fr": "French", "es": "Spanish",
    "zh": "Chinese", "ja": "Japanese", "ru": "Russian", "pt": "Portuguese",
    "und": "Unknown",
}

# --- error taxonomy (parser.rs:13-45), surfaced as errors-as-data ----------

ERR_BAD_SEVERITY = "BadSeverityInPri"
ERR_BAD_FACILITY = "BadFacilityInPri"
ERR_UNEXPECTED_EOF = "UnexpectedEndOfInput"
ERR_TOO_FEW_DIGITS = "TooFewDigits"
ERR_TOO_MANY_DIGITS = "TooManyDigits"
ERR_INVALID_UTC_OFFSET = "InvalidUTCOffset"
ERR_UNICODE = "UnicodeError"
ERR_INT_CONVERSION = "IntConversionErr"
ERR_INVALID_MONTH = "InvalidMonth"
ERR_INVALID_DATE = "InvalidDate"
ERR_INVALID_OFFSET = "InvalidOffset"


def err_expected_token(c: str) -> str:
    """ExpectedTokenErr(char) — parser.rs:33-34; the char is recorded."""
    return f"ExpectedTokenErr:{c}"


def err_invalid_month(n: int) -> str:
    """InvalidMonth(u8) — parser.rs:40,264; the bad month number is recorded."""
    return f"{ERR_INVALID_MONTH}:{n}"


def err_invalid_date(component: str) -> str:
    """InvalidDate(String) — parser.rs:42,268/283: the time crate's
    ComponentRange error name ('day'/'hour'/'minute'/'second')."""
    return f"{ERR_INVALID_DATE}:{component}"


# --- canonical parsed schema (SURVEY.md §1.1) ------------------------------

PARSED_FIELDS = [
    ("severity", T.IntegerType()),
    ("facility", T.IntegerType()),
    ("version", T.IntegerType()),
    ("timestamp", T.LongType()),
    ("timestamp_nanos", T.LongType()),
    ("hostname", T.StringType()),
    ("appname", T.StringType()),
    ("procid_pid", T.IntegerType()),
    ("procid_name", T.StringType()),
    ("msgid", T.StringType()),
    ("sd", T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType()))),
    ("msg", T.StringType()),
    ("parse_error", T.StringType()),
]

PARSED_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in PARSED_FIELDS])

PARSED_COLUMNS = [n for n, _ in PARSED_FIELDS]
