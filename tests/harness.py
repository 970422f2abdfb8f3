"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark plan and its oracle SQL on the same parquet tables, then
compares row count, column-name schema, and an order-insensitive
value comparison (columns sorted by name, rows sorted by all
columns). Floats are compared with a tight relative tolerance but the
plans are designed to be *exactly* equal (see functions/exact.py) —
the tolerance only guards pandas/arrow representation noise.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pe_firm_investment_database_pipeline_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Pin the oracle's zone: if a fixture regeneration ships a
    # tz-annotated timestamp column, DuckDB's ts::TIMESTAMP converts
    # through its LOCAL TimeZone setting while Spark's unix_micros
    # does not — on a non-UTC host the oracle would silently shift by
    # the zone offset. (The engine side is tz-free by design.)
    con.execute("SET TimeZone='UTC'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
            drop=True
        )
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) or math.isnan(bf):
            return math.isnan(af) and math.isnan(bf)
        return af == bf or abs(af - bf) <= 1e-9 * max(abs(af), abs(bf))
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, op_id: str) -> None:
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{op_id}: column mismatch spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{op_id}: rowcount spark={len(sp)} duckdb={len(du)}"
    sp_c, du_c = _canon(sp), _canon(du)
    sp_rows = sp_c.where(pd.notna(sp_c), None).values.tolist()
    du_rows = du_c.where(pd.notna(du_c), None).values.tolist()
    for i, (ra, rb) in enumerate(zip(sp_rows, du_rows)):
        for col, va, vb in zip(sp_c.columns, ra, rb):
            assert _values_equal(va, vb), (
                f"{op_id}: value mismatch at canon-row {i} col {col}: "
                f"spark={va!r} duckdb={vb!r}"
            )
