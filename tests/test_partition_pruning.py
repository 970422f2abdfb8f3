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
