"""Partition pruning (SURVEY §4): a date-partitioned layout must
prune unread partitions at plan time — the other half of the 100 TB
scan story next to bucketing (tests/test_bucketing.py)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "orders_by_year")
    o = load_table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    o.write.partitionBy("o_year").mode("overwrite").parquet(out)

    part = spark.read.parquet(out)
    years = sorted(r["o_year"] for r in part.select("o_year").distinct().collect())
    assert len(years) >= 3  # multi-year data → real pruning opportunity

    pruned = part.where(F.col("o_year") == years[0]).select(
        "o_orderkey", "o_year"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert f"(o_year = {years[0]})" in plan or "isnotnull(o_year" in plan

    # pruning is also physical: only the matching partition dir is read
    n_full = part.count()
    n_pruned = pruned.count()
    assert 0 < n_pruned < n_full


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """At 100 TB the fact scan must be pruned by a JOIN-derived
    partition set, not only by literal predicates: a selective filter
    on the dimension side must reach the day-partitioned fact scan as
    a dynamicpruningexpression in PartitionFilters (Spark's DPP) so
    only the surviving days' files are read."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    out = str(tmp_path / "dpp_fact")
    spark.range(0, 100_000).select(
        (F.col("id") % 30).alias("day"), F.col("id").alias("v")
    ).write.mode("overwrite").partitionBy("day").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.range(0, 30).select(
        F.col("id").alias("day"), (F.col("id") % 7 == 0).alias("is_holiday")
    )
    j = (
        fact.join(dim, "day")
        .where("is_holiday")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruningexpression" in plan.lower()
    assert "PartitionFilters" in plan
