"""Replicates the driver's CORRECTNESS gate locally: every queries() entry is
run in Spark AND its oracle_sql() twin in DuckDB over the same parquet; row
count, column names, and an order-insensitive value hash must match."""

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        # duckdb may return decimal/object for sums; normalize numerics
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (int, float)):
            df[c] = pd.to_numeric(df[c])
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    csv = df.to_csv(index=False, float_format="%.9g")
    return hashlib.md5(csv.encode()).hexdigest()


@pytest.fixture(scope="module")
def con():
    c = _duck(SF_DIR)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"z", "tx", "ty", "n_images", "total_px"}


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    q = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    spark_df = q(spark, SF_DIR).toPandas()
    if name not in sqls:
        assert len(spark_df) >= 0  # rows-only check (driver's weak gate)
        return
    duck_df = con.execute(sqls[name]).fetchdf()
    a, b = _canon(spark_df), _canon(duck_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {a.columns} vs {b.columns}"
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    ha, hb = _value_hash(a), _value_hash(b)
    if ha != hb:
        merged = a.compare(b) if a.shape == b.shape else None
        raise AssertionError(f"{name}: value hash mismatch\n{merged}\n{a.head()}\n{b.head()}")
