"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs a registered query's Spark plan and its DuckDB oracle SQL over the
same parquet tables and compares row count + canonicalized values
order-insensitively — so any query passing here should also pass the
driver's hash comparison.

Canonicalization: columns sorted by name, every value rendered to a
canonical string (floats via repr, timestamps/dates via isoformat,
arrays recursively), rows sorted lexicographically.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from kafkastreamsproject_spark.plans.registry import QuerySpec
from kafkastreamsproject_spark.schemas import TESTDATA_TABLES


def _canon_value(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [
        tuple(_canon_value(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(out)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the testdata tables registered as views."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_compare(
    spark: SparkSession, spec: QuerySpec, sf_dir: str
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Run Spark query + oracle; raise AssertionError with a diff on mismatch."""
    assert spec.oracle is not None, f"{spec.name} has no oracle"
    spark_df = spec.spark(spark, sf_dir)
    # The DRIVER's canonicalizer (unlike this local one) cannot hash
    # array/map columns — it pandas-sorts on every column and dies on
    # unhashable lists (round-1 daily_event_ids failure).  Reject the
    # shape here so it can never reach a CORRECTNESS round again:
    # serialize lists with array_join/sort_array on the Spark side and
    # array_to_string/list_sort in the oracle.
    from pyspark.sql import types as _T

    for f in spark_df.schema.fields:
        assert not isinstance(f.dataType, (_T.ArrayType, _T.MapType)), (
            f"{spec.name}: oracle-checked column '{f.name}' is "
            f"{f.dataType.simpleString()} — driver canonicalizer cannot hash it"
        )
    got = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(spec.oracle).df()
    finally:
        con.close()

    assert len(got) == len(want), (
        f"{spec.name}: row count {len(got)} (spark) != {len(want)} (oracle)"
    )
    assert sorted(got.columns) == sorted(want.columns), (
        f"{spec.name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    got_rows, want_rows = canonical_rows(got), canonical_rows(want)
    if got_rows != want_rows:
        diffs = [
            (g, w) for g, w in zip(got_rows, want_rows) if g != w
        ][:5]
        raise AssertionError(
            f"{spec.name}: value mismatch; first diffs (spark vs oracle): {diffs}"
        )
    return got, want
