"""Inverse of the parser: render a parsed record back to an RFC 5424 line.

The reference has no formatter; this exists because it makes the strongest
possible correctness statement testable: for every structurally-valid
record r, parse(format(r)) == r (property-tested with hypothesis over the
full field domains in tests/test_roundtrip_property.py).

Formatting rules are the grammar read backwards (parser.rs:343-384):
  - nil fields render as '-'
  - timestamp renders as RFC3339 with 'Z'; nanos render as the shortest
    fractional form that still parses back exactly (trailing zeros are
    only kept in multiples that survive the ×10^(9-n) scaling)
  - SD params are escaped with backslash before '"' and '\\' and ']'
  - empty msg => the line ends right after SD with no trailing space
"""

from __future__ import annotations



_DAYS_PER_400 = 146097


def _civil_from_days(z: int) -> tuple[int, int, int]:
    """Inverse of days_from_civil (Howard Hinnant's civil_from_days)."""
    z += 719468
    # Python's // floors already; Hinnant's negative-z adjustment is for
    # C++ truncating division and must NOT be applied here
    era = z // _DAYS_PER_400
    doe = z - era * _DAYS_PER_400
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 if mp < 10 else mp - 9
    return y + (1 if m <= 2 else 0), m, d


def format_timestamp(secs: int | None, nanos: int | None) -> str:
    if secs is None:
        return "-"
    days, rem = divmod(secs, 86400)
    y, mo, d = _civil_from_days(days)
    h, rem = divmod(rem, 3600)
    mi, s = divmod(rem, 60)
    base = f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}"
    n = nanos or 0
    if n:
        frac = f"{n:09d}".rstrip("0")
        # the parser scales k digits by 10^(9-k); stripping zeros is exact
        base += f".{frac}"
    return base + "Z"


def _escape_param(v: str) -> str:
    out = []
    for c in v:
        if c in ('"', "\\", "]"):
            out.append("\\")
        out.append(c)
    return "".join(out)


def format_sd(sd: dict[str, dict[str, str]] | None) -> str:
    if not sd:
        return "-"
    parts = []
    for sd_id in sorted(sd):
        params = "".join(
            f' {k}="{_escape_param(v)}"' for k, v in sorted(sd[sd_id].items())
        )
        parts.append(f"[{sd_id}{params}]")
    return "".join(parts)


def format_message(r: dict) -> str:
    """Parsed-record dict (PARSED_COLUMNS keys) -> wire line."""
    pri = (r["facility"] << 3) | r["severity"]
    if r.get("procid_pid") is not None:
        procid = str(r["procid_pid"])
    elif r.get("procid_name") is not None:
        procid = r["procid_name"]
    else:
        procid = "-"
    head = (
        f"<{pri}>{r.get('version', 1)} "
        f"{format_timestamp(r.get('timestamp'), r.get('timestamp_nanos'))} "
        f"{r.get('hostname') or '-'} "
        f"{r.get('appname') or '-'} "
        f"{procid} "
        f"{r.get('msgid') or '-'} "
        f"{format_sd(r.get('sd'))}"
    )
    msg = r.get("msg") or ""
    return head if msg == "" else f"{head} {msg}"
