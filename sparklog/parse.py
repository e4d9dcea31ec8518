"""Vectorized RFC 5424 parser (pure pandas/numpy — no Spark imports here).

Semantics are a from-scratch re-expression of the reference grammar
(/root/reference/src/parser.rs — see SURVEY.md §2A/§2B for the line-by-line
inventory). Two paths:

* ``_parse_slow(line)`` — an exact recursive-descent implementation of the
  grammar, producing the same accept/reject decisions and error taxonomy as
  the reference (parser.rs:343-384 and helpers). Used for lines the fast
  path cannot prove well-formed, so error variants are always exact.

* ``parse_lines(pd.Series)`` — the vectorized fast path: one anchored
  mega-regex over the whole header (pandas ``str.extract``, C-speed),
  numpy arithmetic for the timestamp (days-from-civil, no datetime range
  limits), and a compiled-regex SD scanner only for rows that carry
  structured data. Rows that fail any strictness check are re-parsed by
  ``_parse_slow`` so behavior is identical on every input.

Key grammar facts preserved (all verified by tests/golden_corpus.py):
  - PRI is 1-3 digits; prival>191 ⇒ facility>23 ⇒ BadFacilityInPri
    (parser.rs:206-210); `<4096>` fails earlier with ExpectedTokenErr('>').
  - TIMESTAMP: strict digit widths, real-calendar validation, 1-9
    fractional digits scaled to NANOSECONDS (parser.rs:244-254), offsets
    `Z`/`±HH:MM` with the sign applied to both fields (parser.rs:291-308),
    missing offset ⇒ UTC.
  - Header terms (HOSTNAME/APPNAME/PROCID/MSGID): nil iff the term is `-`
    followed by space/EOF — `-web1west` is a real hostname
    (parser.rs:318-341); chars are printable ASCII 33..126; length caps
    255/48/128/32.
  - PROCID: numeric-i32 terms become PID, everything else Name
    (parser.rs:357-360). Exact i32 semantics (optional sign, range check).
  - STRUCTURED-DATA: `-` ⇒ empty; repeated SD-IDs merge into one element;
    repeated param names last-write-wins (parser.rs:187-204,195-198);
    param values un-escape `\\x` ⇒ `x` for ANY x (parser.rs:120-157);
    empty elements like `[meta@1234]` are legal.
  - MSG: optional single space after SD, remainder taken verbatim —
    including a UTF-8 BOM (parser.rs:365-369); empty MSG when the line
    ends right after SD.
  - Parse failures become rows: all fields null, ``parse_error`` set to
    the reference's error-variant name (errors-as-data, SURVEY.md §1.4).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from sparklog import schema as S

I32_MIN = -(2**31)
I32_MAX = 2**31 - 1

# ---------------------------------------------------------------------------
# Fast path: one anchored header regex.
#
# Groups: 1 pri, 2 version, (3 y, 4 mo, 5 d, 6 h, 7 mi, 8 s, 9 frac, 10 tz),
# 11 hostname, 12 appname, 13 procid, 14 msgid, 15 remainder (SD + MSG).
# Any line this does not match goes to the exact slow path; terms equal to
# "-" are mapped to null afterwards (the nil rule).
# ---------------------------------------------------------------------------
_HEADER_RE = re.compile(
    # NOTE: the offset is mandatory here. In the reference, the "missing
    # offset => UTC" branch (parser.rs:286) only fires at EOF; inside a
    # full message the timestamp is always followed by ' ', which makes an
    # offsetless timestamp an InvalidUTCOffset error (parser.rs:296-298).
    r"\A<(\d{1,3})>"
    r"(\d{1,2}) "
    r"(?:-|(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})"
    r"(?:\.(\d{1,9}))?(Z|[+-]\d{2}:\d{2})) "
    r"([!-~]{1,255}) "
    r"([!-~]{1,48}) "
    r"([!-~]{1,128}) "
    r"([!-~]{1,32}) "
    r"(.*)\Z",
    # ASCII: \d must mean [0-9] exactly — Python's unicode \d would accept
    # digits the reference's is_ascii_digit scan rejects
    re.DOTALL | re.ASCII,
)

# One well-formed SD-ELEMENT at the match position: [sd_id( name="value")*]
_SDE_RE = re.compile(
    r"\[([^ =\]]{0,128})((?: [^ =\]]{1,128}=\"(?:[^\"\\]|\\.)*\")*)\]",
    re.DOTALL,
)
_PARAM_RE = re.compile(r" ([^ =\]]+)=\"((?:[^\"\\]|\\.)*)\"", re.DOTALL)
_UNESCAPE_RE = re.compile(r"\\(.)", re.DOTALL)

# ASCII-only digits: Python's \d matches unicode digits, Rust's
# i32::from_str does not — [0-9] keeps the PID/Name split identical.
_PROCID_INT_RE = re.compile(r"[+-]?[0-9]+\Z")


def _days_from_civil(y, m, d):
    """Proleptic-Gregorian days since 1970-01-01 (vectorized, any year).

    Howard Hinnant's public days_from_civil algorithm; works on numpy
    int64 arrays and on Python ints alike.
    """
    y = y - (m <= 2)
    era = y // 400
    yoe = y - era * 400
    doy = (153 * (m + (m > 2) * -3 + (m <= 2) * 9) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


_DAYS_IN_MONTH = np.array([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def _is_leap(y):
    return (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))


# ---------------------------------------------------------------------------
# Exact slow path (recursive descent; authoritative for error variants)
# ---------------------------------------------------------------------------


class _Err(Exception):
    def __init__(self, variant: str):
        self.variant = variant
        super().__init__(variant)


def _take_num(s: str, pos: int, min_d: int, max_d: int) -> tuple[int, int]:
    """Bounded ASCII-digit integer (parser.rs:213-226 semantics).

    Scans at most max_d digits; hitting EOF while still matching is
    UnexpectedEndOfInput (the reference's take_while returns None rest).
    """
    i = pos
    end = len(s)
    lim = pos + max_d
    while i < end and i < lim and "0" <= s[i] <= "9":
        i += 1
    if i == end:
        raise _Err(S.ERR_UNEXPECTED_EOF)
    if i - pos < min_d:
        raise _Err(S.ERR_TOO_FEW_DIGITS)
    return int(s[pos:i]), i


def _take_char(s: str, pos: int, c: str) -> int:
    if pos >= len(s):
        raise _Err(S.ERR_UNEXPECTED_EOF)
    if s[pos] != c:
        raise _Err(S.err_expected_token(c))
    return pos + 1


def _parse_i8(tok: str) -> int:
    """i8::from_str semantics: optional sign, digits, range -128..127."""
    if not _PROCID_INT_RE.fullmatch(tok):
        raise _Err(S.ERR_INT_CONVERSION)
    v = int(tok)
    if not (-128 <= v <= 127):
        raise _Err(S.ERR_INT_CONVERSION)
    return v


def _take_timestamp(s: str, pos: int):
    """parser.rs:256-316. Returns ((secs, nanos) | None, new_pos)."""
    if pos < len(s) and s[pos] == "-":
        return None, pos + 1
    year, pos = _take_num(s, pos, 4, 4)
    pos = _take_char(s, pos, "-")
    month, pos = _take_num(s, pos, 2, 2)
    if not (1 <= month <= 12):
        raise _Err(S.ERR_INVALID_MONTH)
    pos = _take_char(s, pos, "-")
    mday, pos = _take_num(s, pos, 2, 2)
    dim = _DAYS_IN_MONTH[month] + (1 if (month == 2 and _is_leap(year)) else 0)
    if not (1 <= mday <= dim):
        raise _Err(S.ERR_INVALID_DATE)
    pos = _take_char(s, pos, "T")
    hour, pos = _take_num(s, pos, 2, 2)
    pos = _take_char(s, pos, ":")
    minute, pos = _take_num(s, pos, 2, 2)
    pos = _take_char(s, pos, ":")
    second, pos = _take_num(s, pos, 2, 2)
    nanos = 0
    if pos < len(s) and s[pos] == ".":
        pos += 1
        start = pos
        # 1-9 digits; a 10th digit is left unconsumed and then rejected by
        # the offset matcher below (parser.rs:277-278 caps at 9, then
        # parser.rs:296-298 sees a digit => InvalidUTCOffset).
        val, pos = _take_num(s, pos, 1, 9)
        nanos = val * (10 ** (9 - (pos - start)))
    # hour/minute/second validated like time::Time::from_hms_nano
    if hour > 23 or minute > 59 or second > 59:
        raise _Err(S.ERR_INVALID_DATE)
    # UTC offset (parser.rs:285-308): EOF => UTC, 'Z' => UTC, '±HH?MM' with
    # the separator byte skipped unchecked (irest[3..5], parser.rs:300-302);
    # ANY other char (including the ' ' of a full message) is an error.
    offset = 0
    if pos < len(s):
        c = s[pos]
        if c == "Z":
            pos += 1
        elif c in "+-":
            sign = -1 if c == "-" else 1
            rest = s[pos + 1 :]
            oh = _parse_i8(rest[0:2])
            om = _parse_i8(rest[3:5])
            oh, om = oh * sign, om * sign
            # time::UtcOffset::from_hms component validation (±25:59 range,
            # consistent signs)
            if abs(oh) > 25 or abs(om) > 59 or (oh > 0 and om < 0) or (
                oh < 0 and om > 0
            ):
                raise _Err(S.ERR_INVALID_OFFSET)
            offset = oh * 3600 + om * 60
            pos = pos + 1 + 5
        else:
            raise _Err(S.ERR_INVALID_UTC_OFFSET)
    days = _days_from_civil(year, month, mday)
    secs = int(days) * 86400 + hour * 3600 + minute * 60 + second - offset
    return (secs, nanos), pos


def _take_term(s: str, pos: int, min_len: int, max_len: int):
    """parser.rs:318-341. Returns (value | None, new_pos)."""
    n = len(s)
    if pos < n and s[pos] == "-" and (pos + 1 >= n or s[pos + 1] == " "):
        return None, pos + 1
    i = pos
    while i < n:
        o = ord(s[i])
        if o < 33 or o > 126:
            if i - pos < min_len:
                raise _Err(S.ERR_TOO_FEW_DIGITS)
            return s[pos:i], i
        if i - pos >= max_len:
            return s[pos:i], i
        i += 1
    raise _Err(S.ERR_UNEXPECTED_EOF)


def _take_sd_id(s: str, pos: int):
    """parser.rs:108-117: scan until space/'='/']' (max 128); EOF is an error."""
    i = pos
    n = len(s)
    lim = pos + 128
    while i < n and i < lim and s[i] not in " =]":
        i += 1
    if i == n:
        raise _Err(S.ERR_UNEXPECTED_EOF)
    return s[pos:i], i


def _take_param_value(s: str, pos: int):
    """parser.rs:120-157: quoted string; backslash escapes ANY next char."""
    pos = _take_char(s, pos, '"')
    out = []
    i = pos
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            if i + 1 >= n:
                raise _Err(S.ERR_UNEXPECTED_EOF)
            out.append(s[i + 1])
            i += 2
            continue
        if c == '"':
            return "".join(out), i + 1
        out.append(c)
        i += 1
    raise _Err(S.ERR_UNEXPECTED_EOF)


def _take_sd(s: str, pos: int):
    """parser.rs:187-204. Returns (dict, new_pos)."""
    sd: dict[str, dict[str, str]] = {}
    n = len(s)
    if pos < n and s[pos] == "-":
        return sd, pos + 1
    while pos < n:
        pos = _take_char(s, pos, "[")
        sd_id, pos = _take_sd_id(s, pos)
        sub = sd.setdefault(sd_id, {})
        while pos < n and s[pos] == " ":
            pos += 1
            pname, pos = _take_sd_id(s, pos)
            pos = _take_char(s, pos, "=")
            pval, pos = _take_param_value(s, pos)
            sub[pname] = pval
        pos = _take_char(s, pos, "]")
        if pos < n and s[pos] == " ":
            break
    return sd, pos


def _procid_cols(term):
    """parser.rs:357-360: i32-parseable => PID else Name."""
    if term is None:
        return None, None
    if _PROCID_INT_RE.fullmatch(term):
        v = int(term)
        if I32_MIN <= v <= I32_MAX:
            return v, None
    return None, term


def _sort_sd(sd: dict[str, dict[str, str]]):
    """BTreeMap key order (message.rs:69) for byte-identical JSON output."""
    return {k: dict(sorted(v.items())) for k, v in sorted(sd.items())}


_NULL_ROW = {c: None for c in S.PARSED_COLUMNS}


def _parse_slow(line: str) -> dict:
    """Exact full-grammar parse of one line (parser.rs:343-384 order)."""
    try:
        pos = _take_char(line, 0, "<")
        prival, pos = _take_num(line, pos, 1, 3)
        pos = _take_char(line, pos, ">")
        sev = prival & 0x7
        fac = prival >> 3
        if fac > 23:
            raise _Err(S.ERR_BAD_FACILITY)
        version, pos = _take_num(line, pos, 1, 2)
        pos = _take_char(line, pos, " ")
        ts, pos = _take_timestamp(line, pos)
        pos = _take_char(line, pos, " ")
        hostname, pos = _take_term(line, pos, 1, 255)
        pos = _take_char(line, pos, " ")
        appname, pos = _take_term(line, pos, 1, 48)
        pos = _take_char(line, pos, " ")
        procid, pos = _take_term(line, pos, 1, 128)
        pos = _take_char(line, pos, " ")
        msgid, pos = _take_term(line, pos, 1, 32)
        pos = _take_char(line, pos, " ")
        sd, pos = _take_sd(line, pos)
        if pos < len(line) and line[pos] == " ":
            pos += 1
        msg = line[pos:]
        pid, pname = _procid_cols(procid)
        return {
            "severity": sev,
            "facility": fac,
            "version": version,
            "timestamp": None if ts is None else ts[0],
            "timestamp_nanos": None if ts is None else ts[1],
            "hostname": hostname,
            "appname": appname,
            "procid_pid": pid,
            "procid_name": pname,
            "msgid": msgid,
            "sd": _sort_sd(sd),
            "msg": msg,
            "parse_error": None,
        }
    except _Err as e:
        row = dict(_NULL_ROW)
        row["parse_error"] = e.variant
        return row


def parse_message(line: str) -> dict:
    """Single-message entry point (analog of parser.rs:405-407)."""
    return _parse_slow(line)


# ---------------------------------------------------------------------------
# SD fast scanner (per-line, compiled regex; falls back to slow path)
# ---------------------------------------------------------------------------


def _parse_sd_fast(rem: str):
    """Parse remainder that starts with '['. Returns (sd, msg) or None."""
    sd: dict[str, dict[str, str]] = {}
    pos = 0
    n = len(rem)
    while pos < n:
        m = _SDE_RE.match(rem, pos)
        if m is None:
            return None
        sub = sd.setdefault(m.group(1), {})
        params = m.group(2)
        if params:
            for pm in _PARAM_RE.finditer(params):
                v = pm.group(2)
                if "\\" in v:
                    v = _UNESCAPE_RE.sub(r"\1", v)
                sub[pm.group(1)] = v
        pos = m.end()
        if pos < n and rem[pos] == " ":
            break
    if pos < n and rem[pos] == " ":
        pos += 1
    return _sort_sd(sd), rem[pos:]


# ---------------------------------------------------------------------------
# Vectorized driver
# ---------------------------------------------------------------------------


def parse_lines(lines: pd.Series) -> pd.DataFrame:
    """Parse a Series of raw lines into a DataFrame with PARSED_COLUMNS.

    Vectorized fast path; per-line exact fallback. Null/None inputs yield
    UnexpectedEndOfInput error rows (a null line has no '<').
    """
    lines = lines.astype("object").reset_index(drop=True)
    n = len(lines)
    idx = lines.index
    safe = lines.fillna("")
    ext = safe.str.extract(_HEADER_RE)

    pri = pd.to_numeric(ext[0], errors="coerce")
    matched = pri.notna()
    fac = (pri // 8).where(matched)
    sev = (pri % 8).where(matched)
    bad_fac = matched & (fac > 23)
    ok = matched & ~bad_fac

    out = pd.DataFrame(index=idx, columns=S.PARSED_COLUMNS, dtype="object")

    # --- timestamp (numpy, proleptic Gregorian; no datetime range limits)
    has_ts = ok & ext[2].notna()
    ts_secs = pd.Series(np.nan, index=idx)
    ts_nanos = pd.Series(np.nan, index=idx)
    slow_mask = ~matched
    if has_ts.any():
        sub = ext.loc[has_ts]
        y = sub[2].astype("int64").to_numpy()
        mo = sub[3].astype("int64").to_numpy()
        d = sub[4].astype("int64").to_numpy()
        h = sub[5].astype("int64").to_numpy()
        mi = sub[6].astype("int64").to_numpy()
        sec = sub[7].astype("int64").to_numpy()
        dim = _DAYS_IN_MONTH[np.clip(mo, 0, 12)] + ((mo == 2) & _is_leap(y))
        valid = (
            (mo >= 1) & (mo <= 12) & (d >= 1) & (d <= dim)
            & (h <= 23) & (mi <= 59) & (sec <= 59)
        )
        # offset: '', NaN or 'Z' => 0; '±HH:MM' parsed positionally
        tz = sub[9].fillna("Z")
        zulu = (tz == "Z").to_numpy()
        sign = np.where(tz.str.slice(0, 1).eq("-").to_numpy(), -1, 1)
        oh = pd.to_numeric(tz.str.slice(1, 3), errors="coerce").fillna(0).to_numpy()
        om = pd.to_numeric(tz.str.slice(4, 6), errors="coerce").fillna(0).to_numpy()
        off = np.where(zulu, 0, sign * (oh * 3600 + om * 60)).astype("int64")
        days = _days_from_civil(y, mo, d)
        secs_arr = days * 86400 + h * 3600 + mi * 60 + sec - off
        frac = sub[8]
        nan_arr = np.where(
            frac.isna().to_numpy(),
            0,
            pd.to_numeric(
                frac.fillna("").str.pad(9, side="right", fillchar="0"),
                errors="coerce",
            ).fillna(0).to_numpy(),
        )
        ts_secs.loc[has_ts] = secs_arr.astype("float64")
        ts_nanos.loc[has_ts] = nan_arr.astype("float64")
        # rows failing calendar/clock validation go to the exact slow path
        bad_rows = sub.index[~valid]
        slow_mask.loc[bad_rows] = True

    # --- terms: '-' => nil (regex guarantees '-' capture is the nil form)
    def _nil(col: pd.Series) -> pd.Series:
        return col.where(col != "-")

    hostname = _nil(ext[10])
    appname = _nil(ext[11])
    procid = _nil(ext[12])
    msgid = _nil(ext[13])

    # --- procid: exact i32 => PID else Name (parser.rs:357-360)
    pid_like = procid.fillna("").str.fullmatch(r"[+-]?[0-9]+")
    pid_num = pd.to_numeric(procid.where(pid_like), errors="coerce")
    in_range = pid_num.ge(I32_MIN) & pid_num.le(I32_MAX)
    procid_pid = pid_num.where(in_range)
    procid_name = procid.where(procid.notna() & ~(pid_like & in_range))

    # --- SD + MSG from the remainder (positional object arrays: pandas
    # .loc/.at misinterpret dict values as alignable mappings)
    rem = ext[14]
    sd_arr = np.empty(n, dtype=object)
    msg_arr = np.empty(n, dtype=object)
    msg_arr[:] = None

    rem_ok = ok & rem.notna()
    nil_sd = (rem_ok & rem.str.startswith("-", na=False)).to_numpy()
    if nil_sd.any():
        rest = rem.str.slice(1)
        strip_sp = rest.str.startswith(" ", na=False)
        msgs = rest.where(~strip_sp, rest.str.slice(1)).to_numpy()
        msg_arr[nil_sd] = msgs[nil_sd]
        # shared empty dict is safe: rows are never mutated downstream
        empty: dict = {}
        for p in np.flatnonzero(nil_sd):
            sd_arr[p] = empty

    empty_rem = (rem_ok & (rem == "")).to_numpy()
    for p in np.flatnonzero(empty_rem):
        # parse_sd("") => empty sd, empty msg (parser.rs:193 loop no-op)
        sd_arr[p] = {}
        msg_arr[p] = ""

    has_sd = (rem_ok & rem.str.startswith("[", na=False)).to_numpy()
    slow = slow_mask.to_numpy().copy()
    if has_sd.any():
        rem_np = rem.to_numpy()
        for p in np.flatnonzero(has_sd):
            res = _parse_sd_fast(rem_np[p])
            if res is None:
                slow[p] = True
            else:
                sd_arr[p], msg_arr[p] = res

    # remainder starting with any other char: ExpectedTokenErr('[')
    bad_rem = rem_ok.to_numpy() & ~nil_sd & ~empty_rem & ~has_sd
    slow |= bad_rem

    # --- assemble
    out["severity"] = sev.where(ok)
    out["facility"] = fac.where(ok)
    out["version"] = pd.to_numeric(ext[1], errors="coerce").where(ok)
    out["timestamp"] = ts_secs
    out["timestamp_nanos"] = ts_nanos.where(has_ts)
    out["hostname"] = hostname.where(ok)
    out["appname"] = appname.where(ok)
    out["procid_pid"] = procid_pid.where(ok)
    out["procid_name"] = procid_name.where(ok)
    out["msgid"] = msgid.where(ok)
    err_arr = np.empty(n, dtype=object)
    err_arr[:] = None

    bad_fac_np = bad_fac.to_numpy()
    if bad_fac_np.any():
        for c in S.PARSED_COLUMNS:
            if c != "parse_error":
                col = out[c].to_numpy(dtype=object, copy=True)
                col[bad_fac_np] = None
                out[c] = col
        err_arr[bad_fac_np] = S.ERR_BAD_FACILITY

    # --- exact fallback for everything the fast path could not prove
    if slow.any():
        cols = {c: out[c].to_numpy(dtype=object, copy=True) for c in S.PARSED_COLUMNS
                if c not in ("sd", "msg", "parse_error")}
        safe_np = safe.to_numpy()
        for p in np.flatnonzero(slow):
            row = _parse_slow(safe_np[p])
            for c, arr in cols.items():
                arr[p] = row[c]
            sd_arr[p] = row["sd"]
            msg_arr[p] = row["msg"]
            err_arr[p] = row["parse_error"]
        for c, arr in cols.items():
            out[c] = arr

    out["sd"] = sd_arr
    out["msg"] = msg_arr
    out["parse_error"] = err_arr

    # normalize numerics to nullable pandas ints for Arrow
    for c in ("severity", "facility", "version", "procid_pid"):
        out[c] = pd.to_numeric(out[c], errors="coerce").astype("Int32")
    out["timestamp"] = pd.to_numeric(out["timestamp"], errors="coerce").astype("Int64")
    out["timestamp_nanos"] = pd.to_numeric(
        out["timestamp_nanos"], errors="coerce"
    ).astype("Int64")
    return out
