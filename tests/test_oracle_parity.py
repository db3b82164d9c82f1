"""Driver-contract parity: every queries() entry with an oracle_sql()
entry must match DuckDB on row count, schema width, and sorted values —
the same comparison the grading driver performs (at sf0.01; sf0.001 here
to keep the suite fast, plus a smoke of the full entry())."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def _rows_spark(df):
    return sorted(
        tuple(_norm(row[c]) for c in sorted(df.columns)) for row in df.collect()
    )


def _rows_duck(con, sql):
    res = con.sql(sql)
    cols = res.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in res.fetchall())


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    got = _rows_spark(sdf)
    want = _rows_duck(ddb, ORACLES[name])
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in ddb.sql(ORACLES[name]).columns
    ), f"{name}: column names differ"
    assert got == want, f"{name}: values differ; first diff: " + str(
        next((a, b) for a, b in zip(got, want) if a != b)
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"cell_id", "image_id", "n_points"} <= set(df.columns)
