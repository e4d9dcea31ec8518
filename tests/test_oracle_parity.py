"""Replicates the driver's correctness gate locally: every queries() entry
is run through Spark AND its oracle_sql() through DuckDB on the same
parquet, then compared order-insensitively (sorted columns, sorted rows).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as E

from conftest import SF_CORRECT

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, 6))
            elif isinstance(v, bool):
                vals.append(int(v))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    q = E.queries()[name]
    sdf = q(spark, SF_CORRECT)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_CORRECT)
    res = con.execute(E.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) != {len(drows)} (duckdb)"
    )
    a = _normalize(srows, scols)
    b = _normalize(drows, dcols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_all_queries_return_rows(spark):
    """Every registered query runs, has a stable schema, AND returns rows
    at the gate SF — a 0-row green is vacuous (the r2 verdict flagged
    dedup_exact/embedding_neardup for exactly that; both now run over the
    augmented corpus and must be non-empty)."""
    may_be_empty: set[str] = set()
    for name, q in E.queries().items():
        df = q(spark, SF_CORRECT)
        n = df.count()
        assert df.columns, f"{name}: no columns"
        if name not in may_be_empty:
            assert n > 0, f"{name}: returned 0 rows"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
