"""Registry-wide oracle dtype invariant (r6 judge, What's-wrong #2).

The external driver canonicalizes cells with plain ``str(v)``, so a
Spark int64 ``123`` vs a DuckDB float64 ``123.0`` is a hash FAIL even
though the values are numerically identical. DuckDB silently promotes
``SUM(BIGINT)`` / ``SUM(...) OVER`` to HUGEINT (and any DECIMAL output)
— both materialize in pandas as float64. This suite catches that class
at author time, without executing either engine:

- DuckDB side: ``DESCRIBE <oracle sql>`` (plans the query, returns
  declared column types, executes nothing).
- Spark side: the plan function's analyzed schema (lazy).

Invariant, both directions: a column must not be declared integral on
one engine and float-materializing on the other. (Nullable-int →
NaN-float promotion at toPandas() time affects BOTH engines alike, so
declared-type agreement is the right level to pin.)
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import types as T

from pe_firm_investment_database_pipeline_spark.plans import all_queries

from .harness import duckdb_conn

_QUERIES = all_queries()
_WITH_ORACLE = sorted(op for op, spec in _QUERIES.items() if spec.oracle)

# DuckDB declared types that pandas materializes as exact integers.
_DUCK_INTEGRAL = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
# DuckDB declared types that pandas materializes as float64 (HUGEINT
# and every DECIMAL included — verified against duckdb .df()).
_DUCK_FLOATY = {"FLOAT", "REAL", "DOUBLE", "HUGEINT"}

_SPARK_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_SPARK_FLOATY = (T.FloatType, T.DoubleType)


def _duck_is_floaty(t: str) -> bool:
    return t in _DUCK_FLOATY or t.startswith("DECIMAL")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("op_id", _WITH_ORACLE)
def test_oracle_dtype_parity(spark, sf_dir, con, op_id):
    spec = _QUERIES[op_id]
    duck = {
        r[0]: r[1]
        for r in con.sql(f"DESCRIBE {spec.oracle}").fetchall()
    }
    sp = {f.name: f.dataType for f in spec.fn(spark, sf_dir).schema.fields}
    assert sorted(duck) == sorted(sp), (
        f"{op_id}: column sets differ spark={sorted(sp)} duckdb={sorted(duck)}"
    )
    bad = []
    for col, dt in duck.items():
        st = sp[col]
        base = re.split(r"[(\s]", dt, 1)[0]
        if isinstance(st, _SPARK_INTEGRAL) and _duck_is_floaty(dt):
            bad.append(f"{col}: spark {st.simpleString()} vs duckdb {dt} "
                       f"(materializes float64 -> str canon mismatch)")
        elif isinstance(st, _SPARK_FLOATY) and base in _DUCK_INTEGRAL:
            bad.append(f"{col}: spark {st.simpleString()} vs duckdb {dt} "
                       f"(spark emits '1.0', oracle '1')")
    assert not bad, f"{op_id}: declared-dtype drift: " + "; ".join(bad)
