"""Generic grok-style regex parsing (north rule: 'grok/regex parse').

The RFC5424 parser (sparklog/parse.py) is the hand-tuned specialized
instance; this module is the generic operator for everything else: a
named-group pattern becomes typed columns, entirely JVM-side
(regexp_extract — no Python in the hot path), with non-matching lines
surfaced errors-as-data style via a ``_grok_matched`` flag.

Grok-alias support: ``%{WORD:name}``-style aliases expand to named regex
groups before compilation, so common patterns read like logstash grok.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the handful of grok primitives needed for log work; extend freely
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
}

_ALIAS_RE = re.compile(r"%\{(\w+)(?::(\w+))?\}")

# types honored in %{PAT:name:type} — extracted strings are cast JVM-side
_CASTS = {"int": "long", "long": "long", "float": "double", "double": "double"}


def expand_grok(pattern: str) -> str:
    """Expand %{PRIMITIVE:name} aliases into named regex groups."""

    def sub(m: re.Match) -> str:
        prim, name = m.group(1), m.group(2)
        if prim not in GROK_PATTERNS:
            raise ValueError(f"unknown grok primitive %{{{prim}}}")
        body = GROK_PATTERNS[prim]
        return f"(?<{name}>{body})" if name else f"(?:{body})"

    return _ALIAS_RE.sub(sub, pattern)


def _group_names(java_style_pattern: str) -> list[tuple[str, int]]:
    # convert (?<name>...) (java) to (?P<name>...) (python) only to let
    # python's re tell us group names and their REAL group numbers; the JVM
    # gets the java form. Using groupindex (not enumeration order) keeps
    # extraction correct when the pattern mixes in unnamed capturing groups
    # like '(?<a>\\d+) (foo|bar) (?<b>\\d+)'.
    py = re.sub(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", r"(?P<\1>", java_style_pattern)
    compiled = re.compile(py)
    return sorted(compiled.groupindex.items(), key=lambda kv: kv[1])


def grok(df: DataFrame, col: str, pattern: str,
         types: dict[str, str] | None = None,
         keep: bool = True) -> DataFrame:
    """Extract named-group columns from ``col`` using a grok/regex pattern.

    - pattern may use %{PRIM:name} aliases or raw (?<name>...) groups
    - non-matching rows get null fields and _grok_matched = false
    - types maps group name -> spark cast type ("long", "double", ...)
    """
    java_pat = expand_grok(pattern)
    names = _group_names(java_pat)
    if not names:
        raise ValueError("pattern has no named groups")
    anchored = java_pat if java_pat.startswith("^") else f"^{java_pat}$"
    matched = F.col(col).rlike(anchored).alias("_grok_matched")
    cols: list[Column] = []
    for name, i in names:
        c = F.regexp_extract(F.col(col), anchored, i)
        # regexp_extract returns '' on no-match; null it out
        c = F.when(F.col("_grok_matched"), c)
        t = (types or {}).get(name)
        if t:
            c = c.cast(_CASTS.get(t, t))
        cols.append(c.alias(name))
    base = df.withColumn("_grok_matched", matched)
    out_cols = (list(df.columns) if keep else []) + cols + [F.col("_grok_matched")]
    return base.select(*out_cols)
