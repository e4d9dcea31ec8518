"""Property tests: parse(format(record)) == record for the full domain of
parser-reachable records, plus total-function safety on arbitrary input.

This is the strongest correctness statement the engine makes about the
grammar (SURVEY.md §5 extension beyond the reference's example-based
tests): the formatter (sparklog/format.py) renders any structurally valid
record and the parser must invert it exactly — every field, including
nanosecond timestamps, nil-vs-literal '-' terms, SD escapes, and the
empty-MSG no-trailing-space rule.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from sparklog.format import format_message
from sparklog.parse import _days_from_civil, _parse_slow, parse_lines
from sparklog.schema import PARSED_COLUMNS

# printable ASCII 33..126 (the term charset, parser.rs:327-334)
_PRINT = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1
)


def _term(max_len: int):
    # a parsed term is never exactly "-" (that is the nil form)
    return _PRINT.map(lambda s: s[:max_len]).filter(lambda s: s != "-")


_SD_ID = st.text(
    alphabet=st.characters(
        min_codepoint=33, max_codepoint=126, exclude_characters=" =]"
    ),
    min_size=0, max_size=32,
)
_PARAM_NAME = st.text(
    alphabet=st.characters(
        min_codepoint=33, max_codepoint=126, exclude_characters=" =]"
    ),
    min_size=0, max_size=16,
)
# param values may contain anything escapable incl. spaces/quotes/unicode
_PARAM_VALUE = st.text(max_size=40)

_MSG = st.text(max_size=200)


def _i32_like(s: str) -> bool:
    import re

    return bool(re.fullmatch(r"[+-]?[0-9]+", s)) and (
        -(2**31) <= int(s) <= 2**31 - 1
    )


@st.composite
def records(draw):
    has_ts = draw(st.booleans())
    if has_ts:
        y = draw(st.integers(0, 9999))
        mo = draw(st.integers(1, 12))
        dim = [31, 29 if (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)) else 28,
               31, 30, 31, 30, 31, 31, 30, 31, 30, 31][mo - 1]
        d = draw(st.integers(1, dim))
        h, mi, s = (draw(st.integers(0, 23)), draw(st.integers(0, 59)),
                    draw(st.integers(0, 59)))
        secs = int(_days_from_civil(y, mo, d)) * 86400 + h * 3600 + mi * 60 + s
        nanos = draw(st.integers(0, 999_999_999))
    else:
        secs, nanos = None, None

    pid_kind = draw(st.sampled_from(["nil", "pid", "name"]))
    procid_pid = draw(st.integers(-(2**31), 2**31 - 1)) if pid_kind == "pid" else None
    procid_name = (
        draw(_term(64).filter(lambda s: not _i32_like(s)))
        if pid_kind == "name" else None
    )

    sd = draw(
        st.dictionaries(
            _SD_ID,
            st.dictionaries(_PARAM_NAME, _PARAM_VALUE, max_size=3),
            max_size=3,
        )
    )
    return {
        "severity": draw(st.integers(0, 7)),
        "facility": draw(st.integers(0, 23)),
        "version": draw(st.integers(1, 99)),
        "timestamp": secs,
        "timestamp_nanos": nanos,
        "hostname": draw(st.none() | _term(255)),
        "appname": draw(st.none() | _term(48)),
        "procid_pid": procid_pid,
        "procid_name": procid_name,
        "msgid": draw(st.none() | _term(32)),
        "sd": {k: dict(sorted(v.items())) for k, v in sorted(sd.items())},
        "msg": draw(_MSG),
        "parse_error": None,
    }


@settings(max_examples=300, deadline=None)
@given(records())
def test_format_parse_roundtrip(rec):
    line = format_message(rec)
    got = _parse_slow(line)
    assert got["parse_error"] is None, (line, got["parse_error"])
    for c in PARSED_COLUMNS:
        assert got[c] == rec[c], (c, line, got[c], rec[c])


@settings(max_examples=60, deadline=None)
@given(st.lists(records(), min_size=1, max_size=8))
def test_vectorized_roundtrip_batch(recs):
    lines = [format_message(r) for r in recs]
    out = parse_lines(pd.Series(lines))
    for i, rec in enumerate(recs):
        row = out.iloc[i]
        assert row["parse_error"] is None, lines[i]
        assert row["msg"] == rec["msg"]
        assert row["sd"] == rec["sd"]
        assert int(row["severity"]) == rec["severity"]
        ts = row["timestamp"]
        assert (pd.isna(ts) and rec["timestamp"] is None) or int(ts) == rec["timestamp"]


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_parser_is_total(garbage):
    """Arbitrary input never raises — it parses or returns an error row."""
    row = _parse_slow(garbage)
    assert (row["parse_error"] is None) or all(
        row[c] is None for c in PARSED_COLUMNS if c != "parse_error"
    )
