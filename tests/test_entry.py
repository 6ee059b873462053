"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 alongside its oracle_sql() in DuckDB; compare row count + column names +
order-insensitive values (SURVEY.md §5.2.2)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF)
    spark_cols = df.columns
    spark_rows = df.collect()

    res = ddb.execute(entry_mod.oracle_sql()[name])
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(oracle_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(oracle_rows), f"{name}: row counts differ"
    got = _rowset([tuple(r) for r in spark_rows], spark_cols)
    exp = _rowset(oracle_rows, oracle_cols)
    assert got == exp, f"{name}: values differ\nspark[:3]={got[:3]}\noracle[:3]={exp[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql())))
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(entry_mod.extra_queries()))
def test_extra_queries_run(spark, name):
    """The bench-only surface (operators not in the capped graded registry)
    must stay runnable; smoke at the smallest corpus."""
    df = entry_mod.extra_queries()[name](spark, "/root/testdata/sf0.001")
    assert df.count() >= 0
