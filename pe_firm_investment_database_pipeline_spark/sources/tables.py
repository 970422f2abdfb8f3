"""Typed parquet scans over the driver's star schema (repo:TESTDATA.md).

SURVEY.md §2.1 ``src_parquet_scan``. Schemas are declared in
repo:FIXTURES.md §B; we rely on parquet's self-describing footer (no
inference pass) and let Catalyst push filters/projections into the
scan. On a cluster these would be partitioned/bucketed tables; the
query plans only depend on logical schema, so swapping in a
``spark.read.table`` of a bucketed catalog table is a one-line change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region=5, nation=25 rows are fixed-cardinality in TPC-H-like schemas).
BROADCAST_DIMS = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark 4 cannot read
    natively — read it as raw int64 nanos
    (spark.sql.legacy.parquet.nanosAsLong) and expose timezone-free
    derived columns so every downstream result is independent of the
    session timezone (the driver's session may not be UTC):

    - ``ts_ns``  int64 nanoseconds since epoch (raw)
    - ``ts_us``  int64 microseconds (floor; matches DuckDB's
                 ns→us cast truncation)
    - ``ts_date`` DateType (tz-free calendar day of the naive value)
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer division end-to-end: int64 nanos exceed double precision,
    # so float division would corrupt the low bits.
    return (
        df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts_us", F.expr("ts_ns div 1000"))
        .withColumn(
            "ts_date",
            F.date_from_unix_date(F.expr("ts_ns div 86400000000000").cast("int")),
        )
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (for the SQL-expressed plans)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
