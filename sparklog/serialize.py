"""JSON serialization matching the reference's serde output byte-for-byte.

serde shape (message.rs:210-232, facility.rs:117-122, severity.rs:71-76,
message.rs:41-49):
  - struct field order: severity, facility, version, timestamp,
    timestamp_nanos, hostname, appname, procid, msgid, sd, msg
  - enums serialize as their name strings ("info", "kern")
  - procid serializes as a bare int (PID) or string (Name)
  - null fields are INCLUDED (serde emits "timestamp":null) — this is why
    Spark's built-in to_json (which drops nulls) cannot be used
  - sd map keys are sorted (BTreeMap order, message.rs:196-206); the parser
    already stores sd key-sorted
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparklog.schema import FACILITY_NAMES, SEVERITY_NAMES

_JSON_FIELDS = [
    "severity", "facility", "version", "timestamp", "timestamp_nanos",
    "hostname", "appname", "procid_pid", "procid_name", "msgid", "sd", "msg",
]


def _plain(v):
    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, float):
        return int(v)
    return v


def _sd_to_dict(sd):
    """Arrow hands maps to pandas as lists of (k, v) tuples; normalize."""
    if sd is None:
        return {}
    if isinstance(sd, dict):
        return {k: dict(v) if not isinstance(v, dict) else v for k, v in sd.items()}
    return {k: dict(v) for k, v in sd}


def message_to_json(row: dict) -> str:
    """One parsed record -> the reference's exact serde JSON string."""
    sev = _plain(row["severity"])
    fac = _plain(row["facility"])
    pid = _plain(row["procid_pid"])
    obj = {
        "severity": None if sev is None else SEVERITY_NAMES[sev],
        "facility": None if fac is None else FACILITY_NAMES[fac],
        "version": _plain(row["version"]),
        "timestamp": _plain(row["timestamp"]),
        "timestamp_nanos": _plain(row["timestamp_nanos"]),
        "hostname": row["hostname"],
        "appname": row["appname"],
        "procid": pid if pid is not None else row["procid_name"],
        "msgid": row["msgid"],
        "sd": _sd_to_dict(row["sd"]),
        "msg": row["msg"],
    }
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


@F.pandas_udf(T.StringType())
def to_json_udf(p: pd.DataFrame) -> pd.Series:
    # to_dict('records') materializes plain dicts in one C pass — an order
    # of magnitude cheaper than per-row pandas dispatch (.apply(axis=1))
    return pd.Series([message_to_json(r) for r in p.to_dict("records")],
                     index=p.index)


def with_json(parsed: DataFrame, out_col: str = "json") -> DataFrame:
    return parsed.withColumn(out_col, json_col(parsed))


def json_col(parsed: DataFrame) -> Column:
    return to_json_udf(F.struct(*[F.col(c) for c in _JSON_FIELDS]))
