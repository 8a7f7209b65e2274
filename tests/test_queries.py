"""Driver-contract check: every queries() entry matches its DuckDB oracle
(row count + sorted-column value multiset), mirroring the harness compare."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(normed,
                  key=lambda t: tuple((v is None, str(v)) for v in t))


def _kind(series):
    """Coarse dtype class for the driver-parity check.  The driver's
    value-hash treats 3 (int64) and 3.0 (float64) as different — the r01
    hash-fail mode when a DuckDB HUGEINT sum lands in pandas as float64 —
    but is insensitive to int width (int32 row_number vs BIGINT passed).
    Columns with nulls are exempt: both engines widen them unpredictably."""
    if series.isna().any():
        return "nullable"
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    return "other"


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows)
    got = _normalize(srows, scols)
    want = _normalize(drows, dcols)
    mismatches = [(g, w) for g, w in zip(got, want) if g != w][:5]
    assert got == want, mismatches

    # driver-parity dtype check: the pandas dtypes both sides must agree on
    # the int/float axis, else the driver's value-hash diverges even when
    # the values compare equal above
    spdf = sdf.toPandas()
    ddf = duck.execute(entrymod.oracle_sql()[name]).df()
    for c in sorted(scols):
        ks, kd = _kind(spdf[c]), _kind(ddf[c])
        if "nullable" in (ks, kd) or len(spdf) == 0:
            continue
        assert ks == kd, (name, c, spdf[c].dtype, ddf[c].dtype)


def test_every_query_has_an_oracle():
    """Since r04 every registry entry carries a DuckDB oracle — the driver
    never records a weaker rows-only row.  A new entry without an oracle
    should fail here, not silently downgrade the correctness gate."""
    names = set(entrymod.queries()) - set(entrymod.oracle_sql())
    assert names == set()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["lang", "source", "n_unique_docs",
                          "n_dupes_removed", "avg_chars"]
