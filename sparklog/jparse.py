"""JVM (Tungsten) fast path for the RFC 5424 parser.

The measured bottleneck of the whole engine is the per-row Python loop
inside the Arrow batch (sparklog/parse.py:parse_lines — ~16.6k rows/s
per core vs the reference's 125k/core, README.md:15). This module
re-expresses the FULL grammar — header, timestamp arithmetic, ProcId
sum type, and structured data with escapes and duplicate-SD-ID merge —
as whole-stage-codegen'd Column expressions, so eligible rows never
cross the Python boundary at all.

Routing: one anchored Java-regex eligibility match per line (the exact
shape `parse.py:_HEADER_RE` proves well-formed, EXTENDED to cover the
SD grammar), plus the value checks regex cannot express (facility<=23,
real-calendar date, offset ranges) as Column predicates. Rows passing
everything are parsed 100% in the JVM; every other row — rejects
needing the reference's exact error taxonomy, and pathological shapes —
goes through the unchanged Python path (sparklog/udf.py:parse_df), so
behavior is byte-identical on every input by construction. Parity is
enforced by tests/test_jparse.py (golden corpus, the synth corpus with
all SD classes, corrupt lines, differential fuzz) and by the driver's
parse_fields_jvm / msg_byte_identity_jvm / rejects_jvm oracle rows.

Scale note (the honest trade): the source is scanned TWICE (once per
branch of the union) because eligibility is a row predicate, not a
partition predicate. A raw-text scan is cheap next to a Python parse —
the second scan costs ~2x IO on the line column only, while the fast
branch saves ~60 us/row of Python — but a caller whose upstream is
expensive (not a file scan) should materialize it first or stay on
parse_df. Measured A/B lives in bench.py ("parse_count_jvm" leg) and
BASELINE.md.

Grammar facts mirrored from the reference (same file:line cites as
parse.py): PRI 1-3 digits + facility cap (parser.rs:206-210), strict
timestamp widths with 1-9 fractional digits scaled to nanos
(parser.rs:244-254) and ±HH:MM offsets (parser.rs:291-308), nil-vs-
literal terms (parser.rs:318-341), i32 ProcId split (parser.rs:357-360),
SD duplicate-ID merge + last-write-wins params (parser.rs:187-204) via
spark.sql.mapKeyDedupPolicy=LAST_WIN (set in session.py), `\\x` -> `x`
param un-escaping for any x (parser.rs:120-157), optional single space
before MSG with BOM passthrough (parser.rs:365-369).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparklog.udf import parse_df

# --------------------------------------------------------------------------
# Java-regex building blocks. Java's \d is ASCII-only by default (unlike
# Python's), so \d here == [0-9] with no flag needed.
# --------------------------------------------------------------------------

# one SD-ELEMENT: [sd_id( name="value")*] — id/name stop-chars and length
# caps exactly as parse.py:_SDE_RE; values allow any escaped char
_ELEM = r'\[[^ =\]]{0,128}(?: [^ =\]]{1,128}="(?:[^"\\]|\\.)*")*\]'
_PARAM = r' ([^ =\]]{1,128})="((?:[^"\\]|\\.)*)"'
_TS = (
    r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
    r"(?:\.\d{1,9})?(?:Z|[+-]\d{2}:\d{2})"
)

# The full-line eligibility regex ((?s): MSG may contain newlines).
# Remainder alternatives mirror parse_sd (parser.rs:187-204): empty
# (message ends right after the 6th space), '-' + anything (nil SD,
# optional single space, MSG verbatim), or 1+ SD elements followed by
# EOF or a space + MSG. Anything else (including a malformed element)
# fails the match and routes to Python for the exact error variant.
# \z, not $: Java's $ also matches before a FINAL line terminator, so a
# trailing-newline line (which the Python/reference path rejects with
# ExpectedTokenErr) would be routed to the fast path and mis-accepted.
ELIGIBLE_RE = (
    r"(?s)^<\d{1,3}>\d{1,2} (?:-|" + _TS + r") "
    r"[!-~]{1,255} [!-~]{1,48} [!-~]{1,128} [!-~]{1,32} "
    r"(?:-.*|(?:" + _ELEM + r")+(?: .*)?)?\z"
)

_BIG = 1 << 30  # "rest of string" length for substring()

_EMPTY_SD = "CAST(map() AS MAP<STRING, MAP<STRING, STRING>>)"


def _fdiv(a: Column, b: int) -> Column:
    """Floor division (days_from_civil needs floor, not truncation, for
    the era of years <= Feb 0000 — `div` truncates toward zero)."""
    return F.floor(a.cast("double") / F.lit(float(b))).cast("long")


def _param_kv(p: Column) -> Column:
    """One well-formed param match ` key="value"` -> struct(key, value).
    NOTE (r6): a substring_index/substr rewrite of this extraction was
    A/B-measured SLOWER than the compiled regex (5.97s vs 5.46s minima
    on the sd-materializing leg) — same pattern as the header fields —
    so the regex stays; only the un-escape is now conditional on a
    backslash being present."""
    raw = F.regexp_extract(p, "(?s)" + _PARAM, 2)
    val = F.when(
        raw.contains("\\"),
        F.regexp_replace(raw, r"(?s)\\(.)", r"$1"),
    ).otherwise(raw)
    return F.struct(
        F.regexp_extract(p, "(?s)" + _PARAM, 1).alias("key"),
        val.alias("value"),
    )


def _sd_map(sd_str: Column) -> Column:
    """Well-formed SD string -> MAP<STRING, MAP<STRING, STRING>>, all in
    the JVM: element split via regexp_extract_all, per-element params,
    `\\x` -> `x` un-escape, duplicate-SD-ID merge, last-write-wins
    params (map_from_entries under mapKeyDedupPolicy=LAST_WIN — the
    BTreeMap insert semantics), and — like the Python path's _sort_sd —
    SD-IDs and param keys sorted into BTreeMap order, so to_json of the
    two paths is byte-identical."""
    # (?s): an escaped char inside a param value may be a newline
    elems = F.transform(
        F.regexp_extract_all(sd_str, F.lit("(?s)" + _ELEM), F.lit(0)),
        lambda s: F.struct(
            F.regexp_extract(s, r"^\[([^ =\]]*)", 1).alias("id"),
            F.transform(
                F.regexp_extract_all(s, F.lit("(?s)" + _PARAM), F.lit(0)),
                _param_kv,
            ).alias("kvs"),
        ),
    )
    ids = F.array_sort(F.array_distinct(F.transform(elems, lambda e: e["id"])))
    merged = F.map_from_entries(
        F.transform(
            ids,
            lambda i: F.struct(
                i.alias("key"),
                # LAST_WIN dedupe first (insert semantics), THEN sort the
                # surviving entries into key order (BTreeMap iteration)
                F.map_from_entries(
                    F.array_sort(
                        F.map_entries(
                            F.map_from_entries(
                                F.flatten(
                                    F.transform(
                                        F.filter(elems,
                                                 lambda e: e["id"] == i),
                                        lambda e: e["kvs"],
                                    )
                                )
                            )
                        )
                    )
                ).alias("value"),
            ),
        )
    )
    return F.coalesce(merged, F.expr(_EMPTY_SD))


def parse_df_jvm(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Drop-in alternative to parse_df: same output schema, same values
    on every input (parity-tested), with eligible rows parsed entirely
    JVM-side. See the module docstring for routing and the 2-scan
    trade."""
    passthrough = [c for c in df.columns if c != line_col]
    line = F.col(line_col)

    d = df.withColumn("_p", F.split(line, " ", 7))
    part = lambda i: F.coalesce(F.get(F.col("_p"), i), F.lit(""))  # noqa: E731

    # --- header scalars (try_cast: never throws under ANSI on the rows
    # the optimizer evaluates before the eligibility predicate).
    # NOTE (r6): replacing these header regexp_extracts with substring/
    # when arithmetic was A/B-measured SLOWER (3.41s vs 2.82s leg
    # median) — the compiled single-pattern extracts beat the longer
    # codegen'd when/length chains — so they stay.
    p0 = part(0)
    pri = F.regexp_extract(p0, r"^<(\d{1,3})>", 1).try_cast("int")
    ver = F.regexp_extract(p0, r">(\d{1,2})$", 1).try_cast("int")
    fac = F.shiftright(pri, 3)
    sev = pri % 8

    # --- timestamp: strict widths make every component position-fixed
    ts = part(1)
    ts_nil = ts == "-"
    y = F.substring(ts, 1, 4).try_cast("int")
    mo = F.substring(ts, 6, 2).try_cast("int")
    dd = F.substring(ts, 9, 2).try_cast("int")
    hh = F.substring(ts, 12, 2).try_cast("int")
    mi = F.substring(ts, 15, 2).try_cast("int")
    ss = F.substring(ts, 18, 2).try_cast("int")
    frac = F.regexp_extract(ts, r"\.(\d{1,9})", 1)
    tz = F.regexp_extract(ts, r"(Z|[+-]\d{2}:\d{2})$", 1)
    oh = F.substring(tz, 2, 2).try_cast("int")
    om = F.substring(tz, 5, 2).try_cast("int")
    leap = (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))
    dim = (
        F.when(mo == 2, F.when(leap, 29).otherwise(28))
        .when(mo.isin(4, 6, 9, 11), 30)
        .otherwise(31)
    )
    ts_ok = ts_nil | (
        mo.between(1, 12) & dd.between(1, dim) & (hh <= 23) & (mi <= 59)
        & (ss <= 59)
        & ((tz == "Z") | ((oh <= 25) & (om <= 59)))
    )
    # days_from_civil (proleptic Gregorian, parse.py:95-106), as Column
    # arithmetic with floor division
    y2 = (y - F.when(mo <= 2, 1).otherwise(0)).cast("long")
    era = _fdiv(y2, 400)
    yoe = y2 - era * 400
    doy = (
        _fdiv(
            (153 * (mo + F.when(mo > 2, -3).otherwise(9)) + 2).cast("long"),
            5,
        )
        + dd - 1
    )
    doe = yoe * 365 + _fdiv(yoe, 4) - _fdiv(yoe, 100) + doy
    days = era * 146097 + doe - 719468
    off = F.when(tz == "Z", F.lit(0)).otherwise(
        (oh * 3600 + om * 60)
        * F.when(F.substring(tz, 1, 1) == "-", -1).otherwise(1)
    )
    secs = F.when(
        ts_nil, F.lit(None).cast("long")
    ).otherwise(days * 86400 + hh * 3600 + mi * 60 + ss - off)
    nanos = F.when(ts_nil, F.lit(None).cast("long")).otherwise(
        F.when(frac == "", F.lit(0)).otherwise(
            F.rpad(frac, 9, "0").try_cast("long")
        )
    )

    # --- nil-vs-literal terms (regex already enforced charset + caps)
    def term(i: int) -> Column:
        t = part(i)
        return F.when(t == "-", F.lit(None).cast("string")).otherwise(t)

    host, app, msgid = term(2), term(3), term(5)

    # --- ProcId sum type: exact i32::from_str semantics. Leading zeros
    # are legal ('007' -> PID 7), so normalize before the width check;
    # >18 digits can't be i32 and won't fit a BIGINT cast either.
    praw = part(4)
    pneg = F.substring(praw, 1, 1) == "-"
    digits = F.when(
        F.substring(praw, 1, 1).isin("+", "-"),
        F.substring(praw, 2, _BIG),
    ).otherwise(praw)
    is_num = digits.rlike(r"^[0-9]+$")
    dtrim = F.regexp_replace(digits, r"^0+", "")
    val = F.when(F.length(dtrim) == 0, F.lit(0).cast("long")).when(
        F.length(dtrim) <= 18, dtrim.try_cast("long")
    )
    signed = F.when(pneg, -val).otherwise(val)
    pid_ok = is_num & signed.isNotNull() & signed.between(-(2**31), 2**31 - 1)
    pid = F.when(praw == "-", F.lit(None).cast("int")).when(
        pid_ok, signed.cast("int")
    )
    pname = F.when((praw == "-") | pid_ok, F.lit(None).cast("string")) \
        .otherwise(praw)

    # --- SD + MSG from the remainder (eligibility already proved shape)
    rem = part(6)
    c0 = F.substring(rem, 1, 1)
    sd_str = F.when(
        c0 == "[",
        F.regexp_extract(rem, r"(?s)^((?:" + _ELEM + r")+)", 1),
    ).otherwise(F.lit(""))
    after = F.substring(rem, F.length(sd_str) + F.lit(1), F.lit(_BIG))
    msg = (
        F.when(rem == "", F.lit(""))
        .when(
            c0 == "-",
            F.when(
                F.substring(rem, 2, 1) == " ", F.substring(rem, 3, _BIG)
            ).otherwise(F.substring(rem, 2, _BIG)),
        )
        .otherwise(  # '[' rows: after is '' or ' ' + MSG
            F.when(
                F.substring(after, 1, 1) == " ",
                F.substring(after, 2, _BIG),
            ).otherwise(after)
        )
    )
    sd = F.when(c0 == "[", _sd_map(sd_str)).otherwise(F.expr(_EMPTY_SD))

    route_fast = (
        line.isNotNull()
        & line.rlike(ELIGIBLE_RE)
        & (fac <= 23)
        & ts_ok
    )
    # Materialize the route predicate ONCE per row. Without this, the
    # optimizer pushes each branch's filter through the `_p` projection
    # and inlines the aliases into the condition — the executed plan
    # then held `split(line)` 17x and the tz regexp_extract 4x inside
    # ONE Filter node, and FilterExec codegen does no subexpression
    # elimination, so every reference re-ran (r6 measured: 3.55s leg
    # median vs 2.43s with the barrier). The always-true
    # monotonically_increasing_id() >= 0 conjunct (mono ids are
    # non-negative by construction) makes `_ok`'s defining expression
    # NON-DETERMINISTIC, which is the documented way (optimization
    # guide §4.4) to stop the optimizer from inlining/duplicating it —
    # row values are unchanged on any input, including under task
    # retries (the conjunct is constant-true regardless of the id
    # drawn).
    d2 = d.withColumn(
        "_ok", route_fast & (F.monotonically_increasing_id() >= F.lit(0))
    )

    fast = d2.filter(F.col("_ok")).select(
        *passthrough,
        sev.cast("int").alias("severity"),
        fac.cast("int").alias("facility"),
        ver.alias("version"),
        secs.cast("long").alias("timestamp"),
        nanos.cast("long").alias("timestamp_nanos"),
        host.alias("hostname"),
        app.alias("appname"),
        pid.alias("procid_pid"),
        pname.alias("procid_name"),
        msgid.alias("msgid"),
        sd.alias("sd"),
        msg.alias("msg"),
        F.lit(None).cast("string").alias("parse_error"),
    )
    slow = parse_df(
        d2.filter(~F.coalesce(F.col("_ok"), F.lit(False)))
        .drop("_p", "_ok"),
        line_col,
    )
    return fast.unionByName(slow)
