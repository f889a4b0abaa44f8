"""Local replica of the driver's correctness gate: run every
__spark_entry__ query against its DuckDB oracle at sf0.001 and compare
values (order-insensitive, columns sorted by name)."""

import decimal
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{os.path.join(SF_DIR, t)}.parquet'")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].map(lambda x: isinstance(x, decimal.Decimal)).any():
            df[c] = df[c].astype(float).round(6)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    ours = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    ref = _normalize(_duck(ORACLES[name]))
    assert list(ours.columns) == list(ref.columns), (
        f"{name}: columns {list(ours.columns)} vs {list(ref.columns)}")
    assert len(ours) == len(ref), f"{name}: rows {len(ours)} vs {len(ref)}"
    pd.testing.assert_frame_equal(ours, ref, check_dtype=False,
                                  check_exact=False, atol=1e-9)


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0 and len(df.schema) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
