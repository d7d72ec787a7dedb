"""Driver-contract emulation: every queries() entry must match its DuckDB
oracle exactly (row count, column names, values) — the same comparison the
driver runs at sf0.01, here at the test SF for speed."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def ducks(sf_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_all_queries_have_oracles():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, ducks):
    sdf = canon(QUERIES[name](spark, sf_dir).toPandas())
    odf = canon(ducks.sql(ORACLES[name]).df())
    assert list(sdf.columns) == list(odf.columns), name
    assert len(sdf) == len(odf), name
    for c in sdf.columns:
        a, b = sdf[c].values, odf[c].values
        if np.issubdtype(sdf[c].dtype, np.floating):
            assert np.allclose(a.astype(float), b.astype(float),
                               rtol=0, atol=0, equal_nan=True), (name, c)
        else:
            assert (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all(), (name, c)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"zone_id", "n_images", "n_tiles", "pix_sum"} <= set(df.columns)
