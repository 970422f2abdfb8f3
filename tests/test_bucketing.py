"""Bucketed co-located join (SURVEY §4 / the 100 TB join strategy):
two tables bucketed on the join key must join WITHOUT a shuffle —
the bucketed scans already satisfy the join's required distribution.

This is the plan shape that matters at scale: a fact-fact join on a
shared bucket layout reads co-located buckets instead of reshuffling
terabytes. Broadcast is disabled for the test so the sort-merge path
(the at-scale path) is exercised.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_lsh_index_join_no_index_shuffle(spark):
    """dedup_incremental_lsh's scale contract: the persisted bucketed
    band index feeds the batch-vs-index join WITHOUT being shuffled
    (and without recomputing corpus signatures). With broadcast
    disabled the sort-merge plan must contain exactly ONE hash
    exchange — the small new-batch side — while the index side is the
    bucketed scan itself. A literal band-key filter must also prune
    buckets (the point of bucketing the key)."""
    from pe_firm_investment_database_pipeline_spark.plans import textops as T

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(T.dedup_incremental_lsh(spark, SF))
        assert "SortMergeJoin" in plan
        # formatted explain prints exchange args on their own line;
        # exactly one hash exchange on the join key = batch side only
        assert plan.count("hashpartitioning(ikey") == 1
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

        # bucket pruning on a literal key: only 1 of the 8 buckets read.
        # (the planner auto-disables bucketed scans for plain filters,
        # so pin it on for the probe — a join/agg consumer keeps it on
        # by itself, as the plan above shows)
        idx = spark.table(T._lsh_index_table(spark, SF))
        some_key = idx.select("ikey").first()["ikey"]
        auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            pruned = _plan(idx.where(F.col("ikey") == some_key))
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled", auto
            )
        assert f"SelectedBucketsCount: 1 out of {T._LSH_INDEX_BUCKETS}" in pruned
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ivf_postings_join_no_index_shuffle(spark):
    """sim_ann_join_indexed's scale contract: the persisted bucketed
    posting lists feed the probe join WITHOUT being shuffled. With
    broadcast disabled the SMJ plan must contain no hash exchange on
    the postings' `cell` column (the probe side exchanges on its own
    `probe_cell`), and the postings scan must be bucketed."""
    from pe_firm_investment_database_pipeline_spark.plans import similarity as S

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(S.sim_ann_join_indexed(spark, SF))
        assert "SortMergeJoin" in plan
        assert "hashpartitioning(cell" not in plan  # index side unshuffled
        assert "hashpartitioning(probe_cell" in plan  # probe side pays it
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark):
    orders = load_table(spark, SF, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.format("parquet").bucketBy(8, "o_custkey").sortBy(
        "o_custkey"
    ).mode("overwrite").saveAsTable("b_orders")
    cust.write.format("parquet").bucketBy(8, "c_custkey").sortBy(
        "c_custkey"
    ).mode("overwrite").saveAsTable("b_customer")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy(
            "c_mktsegment"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # the join itself consumes bucketed scans directly: no hash
        # repartitioning between scan and join
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

        # and it computes the right thing
        got = {r["c_mktsegment"]: r["n"] for r in joined.collect()}
        want = {
            r["c_mktsegment"]: r["n"]
            for r in load_table(spark, SF, "orders")
            .join(
                load_table(spark, SF, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
