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
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|CRIT(?:ICAL)?|FATAL|SEVERE|EMERG(?:ENCY)?|ALERT)",
    "HOSTNAME": r"(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,62})?\.)*[A-Za-z0-9](?:[A-Za-z0-9-]{0,62})?",
    "URIPATH": r"/[^\s?#]*",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"',
    "SYSLOGTIMESTAMP": r"[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2}",
}

_ALIAS_RE = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")

# types honored in %{PAT:name:type} — extracted strings are cast JVM-side
_CASTS = {"int": "long", "long": "long", "float": "double", "double": "double"}


def _expand(pattern: str) -> tuple[str, dict[str, str]]:
    """Expand %{PRIMITIVE:name[:type]} aliases into named regex groups,
    collecting the inline :type declarations."""
    inferred: dict[str, str] = {}

    def sub(m: re.Match) -> str:
        prim, name, typ = m.group(1), m.group(2), m.group(3)
        if prim not in GROK_PATTERNS:
            raise ValueError(f"unknown grok primitive %{{{prim}}}")
        body = GROK_PATTERNS[prim]
        if typ and name:
            inferred[name] = typ
        return f"(?<{name}>{body})" if name else f"(?:{body})"

    return _ALIAS_RE.sub(sub, pattern), inferred


def expand_grok(pattern: str) -> str:
    """Expand %{PRIMITIVE:name} aliases into named regex groups."""
    return _expand(pattern)[0]


def _group_names(java_style_pattern: str) -> list[tuple[str, int]]:
    # convert (?<name>...) (java) to (?P<name>...) (python) only to let
    # python's re tell us group names and their REAL group numbers; the JVM
    # gets the java form. Using groupindex (not enumeration order) keeps
    # extraction correct when the pattern mixes in unnamed capturing groups
    # like '(?<a>\\d+) (foo|bar) (?<b>\\d+)'.
    py = re.sub(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", r"(?P<\1>", java_style_pattern)
    compiled = re.compile(py)
    return sorted(compiled.groupindex.items(), key=lambda kv: kv[1])


# ASCII record separator: joins group values in the single-pass rewrite.
# Not expressible in the printable-ASCII payloads grok targets; set
# single_pass=False for inputs that may legitimately contain \x1e.
_SEP = "\x1e"


def grok(df: DataFrame, col: str, pattern: str,
         types: dict[str, str] | None = None,
         keep: bool = True, single_pass: bool = False) -> DataFrame:
    """Extract named-group columns from ``col`` using a grok/regex pattern.

    - pattern may use %{PRIM:name} or %{PRIM:name:type} aliases, or raw
      (?<name>...) groups
    - non-matching rows get null fields and _grok_matched = false
    - types maps group name -> spark cast type ("long", "double", ...),
      merged over any inline :type declarations
    - single_pass=False (default): one regexp_extract per group. Unused
      groups are column-pruned AWAY by Catalyst, so a query touching 2 of
      10 groups pays for 2 — the right default for exploratory reads.
    - single_pass=True: ONE regexp_replace rewrites the line into a
      separator-joined group list which is then split — 2 regex
      evaluations per row instead of k+1. Measured ~1.6x faster when a
      pipeline consumes ALL groups (ETL materialization); choose it when
      nothing will be pruned.
    """
    java_pat, inferred_types = _expand(pattern)
    types = {**inferred_types, **(types or {})}
    names = _group_names(java_pat)
    if not names:
        raise ValueError("pattern has no named groups")
    anchored = java_pat if java_pat.startswith("^") else f"^{java_pat}$"
    matched = F.col(col).rlike(anchored).alias("_grok_matched")
    cols: list[Column] = []
    if single_pass:
        # Java replacement: non-participating optional groups render as ''
        # — identical to regexp_extract's no-capture result. The packed
        # array gets its OWN projection layer so the rewrite evaluates once
        # (CollapseProject keeps a multiply-referenced expensive alias).
        repl = _SEP.join(f"${i}" for _, i in names)
        packed = F.split(
            F.regexp_replace(F.col(col), anchored, repl), _SEP, -1
        )
        for pos, (name, _) in enumerate(names):
            # try_element_at: unmatched rows keep their original string in
            # `packed` (fewer elements) — must yield NULL, not an ANSI
            # out-of-bounds error, regardless of CSE/codegen evaluation order
            c = F.when(F.col("_grok_matched"),
                       F.try_element_at(F.col("_grok_packed"), F.lit(pos + 1)))
            t = (types or {}).get(name)
            if t:
                # try_cast, not cast: Spark 4 runs ANSI mode, where a typed
                # group whose text doesn't fit (e.g. %{NUMBER:x:int} on
                # '0.5', or '' from a non-participating optional group)
                # would throw and kill the query; grok semantics want null
                c = c.try_cast(_CASTS.get(t, t))
            cols.append(c.alias(name))
        base = df.withColumn("_grok_matched", matched).withColumn(
            "_grok_packed", packed
        )
        out_cols = (list(df.columns) if keep else []) + cols + [
            F.col("_grok_matched")
        ]
        return base.select(*out_cols)
    for name, i in names:
        c = F.regexp_extract(F.col(col), anchored, i)
        # regexp_extract returns '' on no-match; null it out
        c = F.when(F.col("_grok_matched"), c)
        t = (types or {}).get(name)
        if t:
            c = c.try_cast(_CASTS.get(t, t))  # ANSI-safe: bad fit -> null
        cols.append(c.alias(name))
    base = df.withColumn("_grok_matched", matched)
    out_cols = (list(df.columns) if keep else []) + cols + [F.col("_grok_matched")]
    return base.select(*out_cols)
