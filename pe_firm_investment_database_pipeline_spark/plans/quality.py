"""Data-quality & audit operators — the checks a 100 TB lake runs on
every ingest: declarative constraint validation (the Deequ/dbt-test
shape) and a row-level snapshot diff (the audit behind every backfill
review). Both are pure DataFrame plans with exact DuckDB oracles.

- dq_constraint_check: ALL single-table constraints are conditional
  aggregates folded into ONE scan of orders (count/null/duplicate/
  domain/range checks share the same pass — at 100 TB you pay one
  read, not one per rule); the single cross-table rule (referential
  integrity to customer) adds one join against the key side only.
  Results unpivot to (constraint, violations, n_checked) rows via
  stack(), so adding a rule is adding a literal — no schema change.
- diff_snapshots: two table versions diff by key with ONE full outer
  join; every row classifies as added / removed / changed /
  unchanged, where `changed` compares a payload FINGERPRINT (md5 of
  the canonicalized row) instead of N per-column comparisons — the
  trick that keeps the diff O(columns) in codegen but O(1) in
  comparison logic, and lets the shuffle carry (key, fingerprint)
  instead of whole rows at scale. The output is the per-class count
  plus an order-insensitive key checksum so the oracle pins WHICH
  rows changed, not just how many.

The 'versions' diffed here are derived in-plan from the orders
fixture (deterministic modular slices: deletions, inserts, and
price-doubling updates), so both engines see identical inputs
without any side files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table

_ALLOWED_STATUS = ("F", "O", "P")
_STATUS_SQL = "('" + "','".join(_ALLOWED_STATUS) + "')"


def dq_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over orders, one scan + one RI join:
    not_null(o_custkey), unique(o_orderkey), domain(o_orderstatus),
    non_negative(o_totalprice), ref_integrity(o_custkey->customer)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    base = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("n_null_cust"),
        (
            F.count(F.lit(1)) - F.countDistinct("o_orderkey")
        ).alias("n_dup_key"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(*_ALLOWED_STATUS), 1)
            .otherwise(0)
        ).alias("n_bad_status"),
        F.sum(
            F.when(F.expr("round(o_totalprice * 100) < 0"), 1).otherwise(0)
        ).alias("n_negative"),
    )
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphan"))
    )
    return (
        base.crossJoin(F.broadcast(orphans))
        .select(
            F.expr(
                "stack(5,"
                " 'not_null_custkey', n_null_cust,"
                " 'unique_orderkey', n_dup_key,"
                " 'status_domain', n_bad_status,"
                " 'non_negative_total', n_negative,"
                " 'ref_integrity_customer', n_orphan)"
            ).alias("constraint", "violations"),
            F.col("n_rows").alias("n_checked"),
        )
        .select(
            "constraint",
            F.col("violations").cast("long").alias("violations"),
            "n_checked",
        )
    )


_DQ_CONSTRAINT_CHECK_SQL = f"""
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_cust,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_dup_key,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN {_STATUS_SQL}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status,
         CAST(SUM(CASE WHEN round(o_totalprice * 100) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
  FROM orders
), orph AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
)
SELECT t.constraint, t.violations, base.n_rows AS n_checked
FROM base, orph,
     LATERAL (VALUES
       ('not_null_custkey', n_null_cust),
       ('unique_orderkey', n_dup_key),
       ('status_domain', n_bad_status),
       ('non_negative_total', n_negative),
       ('ref_integrity_customer', n_orphan)
     ) AS t("constraint", violations)
"""


# deterministic in-plan "versions" of orders (see module docstring)
_DEL_MOD = 97   # rows deleted in the new snapshot
_INS_MOD = 89   # rows absent from the old snapshot (later inserts)
_UPD_MOD = 13   # rows whose price doubled in the new snapshot


def _order_fp(price_expr: str) -> str:
    """Canonical payload fingerprint: md5 over pipe-joined fields
    with exact integer cents — identical text, identical hash, in
    both engines."""
    return (
        "md5(concat_ws('|', CAST(o_custkey AS STRING), o_orderstatus, "
        f"CAST(CAST(round(({price_expr}) * 100) AS BIGINT) AS STRING)))"
    )


def diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot diff by key + payload fingerprint; emits
    per-class row counts and an order-insensitive key checksum
    (sum of key*prime-mixed hashes is associative)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    old = o.where(f"o_orderkey % {_INS_MOD} != 0").select(
        "o_orderkey", F.expr(_order_fp("o_totalprice")).alias("fp")
    )
    new = (
        o.where(f"o_orderkey % {_DEL_MOD} != 0")
        .select(
            "o_orderkey",
            F.expr(
                _order_fp(
                    f"CASE WHEN o_orderkey % {_UPD_MOD} = 0 "
                    "THEN o_totalprice * 2 ELSE o_totalprice END"
                )
            ).alias("fp"),
        )
    )
    joined = old.alias("a").join(
        new.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full"
    )
    classified = joined.select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .when(F.col("a.fp") != F.col("b.fp"), "changed")
        .otherwise("unchanged")
        .alias("diff_class"),
    )
    # per-row Knuth-mix REDUCED mod 1e9+7 before the sum: the raw
    # product overflows int64 once keys pass ~3.4e9 (and the SUM far
    # earlier under ANSI mode at sf0.1); the reduced terms give the
    # int64 sum ~9e9-row headroom, plenty for a checksum column
    return classified.groupBy("diff_class").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("(k * 2654435761) % 1000000007")).alias("key_checksum"),
    )


def _diff_snapshots_sql() -> str:
    fp_old = _order_fp("o_totalprice")
    fp_new = _order_fp(
        f"CASE WHEN o_orderkey % {_UPD_MOD} = 0 "
        "THEN o_totalprice * 2 ELSE o_totalprice END"
    )
    return f"""
WITH old AS (
  SELECT o_orderkey, {fp_old} AS fp FROM orders
  WHERE o_orderkey % {_INS_MOD} != 0
), new AS (
  SELECT o_orderkey, {fp_new} AS fp FROM orders
  WHERE o_orderkey % {_DEL_MOD} != 0
), classified AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS k,
         CASE WHEN old.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN old.fp != new.fp THEN 'changed'
              ELSE 'unchanged' END AS diff_class
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
)
SELECT diff_class, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM((k * 2654435761) % 1000000007) AS BIGINT) AS key_checksum
FROM classified GROUP BY diff_class
"""


QUERIES = {
    "dq_constraint_check": QuerySpec(
        dq_constraint_check, _DQ_CONSTRAINT_CHECK_SQL, ("quality",)
    ),
    "diff_snapshots": QuerySpec(
        diff_snapshots, _diff_snapshots_sql(), ("quality", "audit")
    ),
}
