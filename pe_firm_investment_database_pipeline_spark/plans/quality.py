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
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import cents
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


# ---------------------------------------------------------------------------
# evt_ab_test — two-proportion experiment readout, exact rational z^2
# ---------------------------------------------------------------------------

def evt_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — the analysis every growth pipeline
    runs over the event log: users split into arms by a deterministic
    hash (parity of user_id here), the metric is user-level purchase
    conversion, and significance is the two-proportion z test. The
    z statistic itself is irrational (a square root), so the entry
    emits z^2 scaled to ppm — algebraically
    (c1*n2 - c2*n1)^2 * n * 1e6 / (n1*n2*c*(n-c)) — which is a pure
    integer rational both engines evaluate identically in
    DECIMAL(38,0)/HUGEINT (the numerator overflows int64 at modest
    user counts). z^2 >= 3.84 (chi-square 95%) <=> z2_ppm >= 3841459
    — significance thresholding stays exact too.

    Plan shape: one scan -> per-user conversion flag (groupBy
    user_id, partial-agg sum) -> 1-row conditional aggregate. At
    100 TB the user table is the only shuffle and the readout is
    O(1). The metric is 'heavy purchaser' (>= 14 purchase events —
    the fixture gives every user at least a few purchases, so a >=1
    flag would saturate and zero the pooled variance); the degenerate
    all-or-none case still guards the division with an explicit
    CASE."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    users = e.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("long")) >= 14
        )
        .cast("int")
        .alias("conv")
    )
    g = users.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(
            F.when(F.col("user_id") % 2 == 0, F.col("conv")).otherwise(0)
        ).alias("c_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("user_id") % 2 == 1, F.col("conv")).otherwise(0)
        ).alias("c_b"),
    )
    return g.select(
        F.expr("CAST(n_a AS BIGINT)").alias("n_a"),
        F.expr("CAST(c_a AS BIGINT)").alias("c_a"),
        F.expr("CAST(n_b AS BIGINT)").alias("n_b"),
        F.expr("CAST(c_b AS BIGINT)").alias("c_b"),
        F.expr(
            "(c_a * 1000000) div n_a - (c_b * 1000000) div n_b"
        ).alias("conv_diff_ppm"),
        F.expr(
            "CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL"
            " ELSE CAST((CAST(c_a * n_b - c_b * n_a AS DECIMAL(38,0))"
            " * (c_a * n_b - c_b * n_a) * (n_a + n_b) * 1000000)"
            " div (CAST(n_a AS DECIMAL(38,0)) * n_b * (c_a + c_b)"
            " * (n_a + n_b - c_a - c_b)) AS BIGINT) END"
        ).alias("z2_ppm"),
    )


_EVT_AB_TEST_SQL = """
WITH users AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
), g AS (
  SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT)
           AS c_a,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT)
           AS c_b
  FROM users
)
SELECT n_a, c_a, n_b, c_b,
       (c_a * 1000000) // n_a - (c_b * 1000000) // n_b AS conv_diff_ppm,
       CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
            ELSE CAST(((c_a * n_b - c_b * n_a)::HUGEINT
             * (c_a * n_b - c_b * n_a) * (n_a + n_b) * 1000000)
            // (n_a::HUGEINT * n_b * (c_a + c_b)
                * (n_a + n_b - c_a - c_b)) AS BIGINT) END AS z2_ppm
FROM g
"""


# ---------------------------------------------------------------------------
# profile_cardinality_report — one-scan per-column table profile
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
)


def profile_cardinality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile over orders — the ANALYZE TABLE /
    data-catalog summary every lake keeps per partition: row count,
    null count, exact distinct count, and min/max (as strings, so one
    schema fits every column type) for each profiled column, in ONE
    scan. The multi-column countDistincts share the pass through
    Spark's Expand (one shuffle carrying partial aggregates); the
    unpivot to (column, ...) rows is a stack() over the 1-row
    aggregate — free. At 100 TB the same plan profiles a partition at
    a time and the report table stays O(columns)."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.countDistinct(c).alias(f"{c}_nd"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nn"),
            F.min(F.col(c).cast("string")).alias(f"{c}_min"),
            F.max(F.col(c).cast("string")).alias(f"{c}_max"),
        ]
    g = o.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{c}', {c}_nd, {c}_nn, {c}_min, {c}_max" for c in _PROFILE_COLS
    )
    return g.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_distinct, n_nulls, min_str, max_str)"
        ),
    ).select(
        "column_name", "n_rows", "n_distinct", "n_nulls", "min_str", "max_str"
    )


def _profile_cardinality_sql() -> str:
    parts = [
        f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       MIN(CAST({c} AS VARCHAR)) AS min_str,
       MAX(CAST({c} AS VARCHAR)) AS max_str
FROM orders"""
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# dq_benford_check — first-digit distribution fraud screen
# ---------------------------------------------------------------------------

# Benford expected first-digit shares, ppm (floor of log10(1+1/d);
# public constants, sum exactly 1e6)
_BENFORD_PPM = {
    1: 301_030, 2: 176_091, 3: 124_939, 4: 96_910, 5: 79_181,
    6: 66_947, 7: 57_992, 8: 51_153, 9: 45_757,
}
# chi-square critical value, 8 df, alpha=0.05, ppm
_BENFORD_CHI2_CRIT_PPM = 15_507_000


def dq_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW screen on order totals — the forensic-accounting
    primitive (fabricated amounts drift from the logarithmic
    first-digit distribution). The leading digit comes from the
    int64-cents string (scale shifts don't move leading digits), the
    expected shares are public ppm constants folded in as a literal
    map, and the chi-square accumulates in DECIMAL(38,0)/HUGEINT —
    (obs·1e6 − n·exp)² overflows int64 — with the per-digit
    contribution and the 8-df critical-value flag both exact. One
    digit-grouped aggregate over one scan; the 9-row grid carries
    everything after."""
    digit_expr = (
        "CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)"
        " AS STRING), 1, 1) AS INT)"
    )
    exp_map = (
        "map(" + ", ".join(f"{d}, {p}" for d, p in _BENFORD_PPM.items()) + ")"
    )
    obs = (
        load_table(spark, sf_dir, "orders")
        .select(F.expr(digit_expr).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    total = obs.agg(F.sum("observed").alias("n_total"))
    base = (
        obs.crossJoin(F.broadcast(total))
        .withColumn("expected_ppm", F.expr(f"{exp_map}[digit]"))
        .withColumn(
            "contrib_ppm",
            F.expr(
                "CAST((CAST(observed * 1000000 - n_total * expected_ppm"
                " AS DECIMAL(38,0))"
                " * (observed * 1000000 - n_total * expected_ppm))"
                " div (n_total * expected_ppm) AS BIGINT)"
            ),
        )
    )
    wtot = W.partitionBy()
    return base.select(
        "digit",
        "observed",
        "expected_ppm",
        "contrib_ppm",
        F.sum("contrib_ppm").over(wtot).alias("chi2_total_ppm"),
        (
            F.sum("contrib_ppm").over(wtot) > F.lit(_BENFORD_CHI2_CRIT_PPM)
        ).alias("benford_violated"),
    )


def _benford_sql() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
    )
    return f"""
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                     AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM orders GROUP BY 1
), total AS (
  SELECT CAST(SUM(observed) AS BIGINT) AS n_total FROM obs
), base AS (
  SELECT o.digit, o.observed,
         CAST(CASE o.digit {cases} END AS BIGINT) AS expected_ppm,
         CAST((CAST(o.observed * 1000000
                    - t.n_total * (CASE o.digit {cases} END)
               AS HUGEINT)
               * (o.observed * 1000000
                  - t.n_total * (CASE o.digit {cases} END)))
              // (t.n_total * (CASE o.digit {cases} END)) AS BIGINT)
           AS contrib_ppm
  FROM obs o CROSS JOIN total t
)
SELECT digit, observed, expected_ppm, contrib_ppm,
       CAST(SUM(contrib_ppm) OVER () AS BIGINT) AS chi2_total_ppm,
       SUM(contrib_ppm) OVER () > {_BENFORD_CHI2_CRIT_PPM}
         AS benford_violated
FROM base
"""


# ---------------------------------------------------------------------------
# evt_ab_srm_check — sample-ratio-mismatch guardrail
# ---------------------------------------------------------------------------

# chi-square(1df) critical value 3.841459 at alpha=0.05, in ppm
_SRM_CHI2_CRIT_PPM = 3_841_459


def evt_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH check for the A/B assignment — the
    guardrail that must run BEFORE any experiment readout (a biased
    split invalidates evt_ab_test's z-statistic entirely): with an
    expected 50/50 split, the one-degree chi-square statistic
    reduces to (n_a − n_b)² / (n_a + n_b), computed here in exact
    integer ppm and compared against the 3.84 critical value. Arms
    use the same deterministic user-parity hash as evt_ab_test so
    the two entries describe the same experiment. One distinct-user
    aggregate; everything after is a 2-row reduction."""
    arms = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(F.expr("user_id % 2").alias("arm"))
        .groupBy("arm")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wide = arms.groupBy().agg(
        F.sum(F.expr("CASE WHEN arm = 0 THEN n ELSE 0 END")).alias("n_a"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN n ELSE 0 END")).alias("n_b"),
    )
    return wide.select(
        "n_a",
        "n_b",
        F.expr(
            "((n_a - n_b) * (n_a - n_b) * 1000000) div (n_a + n_b)"
        ).alias("chi2_ppm"),
        F.expr(
            "((n_a - n_b) * (n_a - n_b) * 1000000) div (n_a + n_b)"
            f" > {_SRM_CHI2_CRIT_PPM}"
        ).alias("srm_detected"),
    )


_EVT_AB_SRM_CHECK_SQL = f"""
WITH arms AS (
  SELECT user_id % 2 AS arm, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1
), wide AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n_b
  FROM arms
)
SELECT n_a, n_b,
       ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b) AS chi2_ppm,
       ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b)
         > {_SRM_CHI2_CRIT_PPM} AS srm_detected
FROM wide
"""


# ---------------------------------------------------------------------------
# sec_row_mask_policy — row-level security + column masking
# ---------------------------------------------------------------------------

_BLOCKED_TENANT, _MASKED_TENANT = 3, 2


def sec_row_mask_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOVERNANCE POLICY enforcement as a plan rewrite — the
    row-filter + column-mask shape every governed lakehouse applies
    between storage and consumer: rows of the BLOCKED tenant never
    leave the scan (row-level security as a pushable predicate, not
    post-hoc redaction), and the MASKED tenant's monetary value is
    nulled while its row survives for aggregate-shape fidelity
    (column masking). Tenancy derives deterministically from
    user_id % 4 (the fixture's stand-in for an ACL dimension — in
    production this predicate comes from a broadcast entitlement
    table, same plan shape). The policy is pure projection+filter:
    it fuses into whole-stage codegen with zero extra shuffles, and
    the blocked-tenant predicate reaches the parquet scan."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("user_id % 4").alias("tenant"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    return (
        e.where(F.col("tenant") != _BLOCKED_TENANT)
        .select(
            "event_id",
            "user_id",
            "tenant",
            F.expr(
                f"CASE WHEN tenant = {_MASKED_TENANT} THEN NULL"
                " ELSE v END"
            ).alias("value_c"),
            (F.col("tenant") == _MASKED_TENANT).alias("is_masked"),
        )
    )


_SEC_ROW_MASK_POLICY_SQL = f"""
SELECT event_id, user_id, user_id % 4 AS tenant,
       CASE WHEN user_id % 4 = {_MASKED_TENANT} THEN NULL
            ELSE CAST(round(value * 100) AS BIGINT) END AS value_c,
       user_id % 4 = {_MASKED_TENANT} AS is_masked
FROM events
WHERE user_id % 4 != {_BLOCKED_TENANT}
"""


_KANON_MIN = 5  # k-anonymity floor: suppress token groups below k


_FRESH_SLA_DAYS = 1  # a feed is "fresh" if its last event is <= 1 day old
_FRESH_RECENT_DAYS = 7


def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEED FRESHNESS AUDIT — per event type: when did it last emit,
    how stale is it relative to the newest data in the corpus, does
    it meet the freshness SLA, and what share of its volume landed
    in the trailing week — the ops dashboard behind 'is this
    upstream dead or just quiet'. The scan compresses to (type, day)
    counts FIRST (one partial-aggregable shuffle; the day grid is
    |types| x |days|, thousands of rows at any corpus size), the
    corpus high-water mark comes from a partitionBy()-less window
    over that tiny grid, and the rollup is conditional aggregation —
    the staleness reference never requires a second scan or a
    self-join. Day axis is tz-free epoch days (the `_load_events`
    discipline)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_date(ts_date)").alias("day")
    )
    pd_ = e.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("cnt"))
    m = pd_.withColumn(
        "corpus_last", F.max("day").over(W.partitionBy())
    )
    return m.groupBy("event_type").agg(
        F.sum("cnt").alias("n_events"),
        F.max("day").cast("long").alias("last_day"),
        (F.max("corpus_last") - F.max("day")).cast("long").alias("lag_days"),
        (F.max("corpus_last") - F.max("day") <= _FRESH_SLA_DAYS)
        .cast("long")
        .alias("fresh_ok"),
        F.expr(
            f"(SUM(CASE WHEN day > corpus_last - {_FRESH_RECENT_DAYS}"
            " THEN cnt ELSE 0 END) * 1000000) div SUM(cnt)"
        ).alias("recent_share_ppm"),
    )


_DQ_FRESHNESS_SLA_SQL = f"""
WITH pd AS (
  SELECT event_type, (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, day
), m AS (
  SELECT event_type, day, cnt, MAX(day) OVER () AS corpus_last FROM pd
)
SELECT event_type,
       CAST(SUM(cnt) AS BIGINT) AS n_events,
       CAST(MAX(day) AS BIGINT) AS last_day,
       CAST(MAX(corpus_last) - MAX(day) AS BIGINT) AS lag_days,
       CAST(CASE WHEN MAX(corpus_last) - MAX(day) <= {_FRESH_SLA_DAYS}
            THEN 1 ELSE 0 END AS BIGINT) AS fresh_ok,
       CAST((SUM(CASE WHEN day > corpus_last - {_FRESH_RECENT_DAYS}
                 THEN cnt ELSE 0 END) * 1000000) // SUM(cnt) AS BIGINT)
         AS recent_share_ppm
FROM m GROUP BY event_type
"""


_LDIV_L = 3  # minimum distinct sensitive values per QI class
_LDIV_BAND_C = 250000  # sensitive attribute banded to $2500 cents


def sec_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY AUDIT — the release gate one step past
    k-anonymity (`sec_col_tokenize`): a quasi-identifier class can
    be large (k-anonymous) yet still leak if everyone in it shares
    the same SENSITIVE value, so each (nation, market-segment) class
    must contain >= l distinct account-balance bands before the
    class is releasable. One grouped aggregate over the dimension
    table: per-class size, distinct-band count, and the release
    flag. The band uses (cents + 100000) div 250000 — the shift
    keeps the dividend strictly positive so truncating (Spark div)
    and flooring (DuckDB //) division agree; raw negative cents
    would silently band differently across engines."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000)"
            f" div {_LDIV_BAND_C}"
        ).alias("band"),
    )
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("band").alias("n_bands"),
        (F.countDistinct("band") >= _LDIV_L).cast("long").alias("l_ok"),
    )


_SEC_L_DIVERSITY_SQL = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT) + 100000)
                  // {_LDIV_BAND_C}) AS BIGINT) AS n_bands,
       CAST(CASE WHEN COUNT(DISTINCT
              (CAST(round(c_acctbal * 100) AS BIGINT) + 100000)
              // {_LDIV_BAND_C}) >= {_LDIV_L} THEN 1 ELSE 0 END AS BIGINT)
         AS l_ok
FROM customer GROUP BY c_nationkey, c_mktsegment
"""


def sec_col_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-PRESERVING TOKENIZATION + k-ANONYMITY suppression — the
    pseudonymization shape governed pipelines apply before data
    leaves the trust boundary: the raw identifier is replaced by a
    deterministic keyed digest (same user → same token, so joins,
    groupBys, and distinct counts still work downstream — here
    md5 over a salted rendering; production swaps in HMAC with a
    managed key, same plan), and token groups with fewer than k=5
    rows are SUPPRESSED into a '<rare>' bucket so no
    quasi-identifier singleton survives (k-anonymity). Tokenization
    is a pure scan-side projection (whole-stage codegen, zero extra
    shuffles); suppression is one token-keyed aggregate. Output is
    the per-(type, token) activity profile a consumer would get —
    with the rare tail rolled up."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.md5(F.concat(F.lit("pepper:"), F.col("user_id").cast("string")))
        .alias("token"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    counted = e.groupBy("event_type", "token").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("cents")
    )
    return (
        counted.withColumn(
            "token_out",
            F.when(F.col("n_rows") >= _KANON_MIN, F.col("token")).otherwise(
                F.lit("<rare>")
            ),
        )
        .groupBy("event_type", F.col("token_out").alias("token"))
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("cents").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n_merged_tokens"),
        )
    )


_SEC_COL_TOKENIZE_SQL = f"""
WITH e AS (
  SELECT event_type,
         md5('pepper:' || CAST(user_id AS VARCHAR)) AS token,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), counted AS (
  SELECT event_type, token, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(v) AS BIGINT) AS cents
  FROM e GROUP BY event_type, token
)
SELECT event_type,
       CASE WHEN n_rows >= {_KANON_MIN} THEN token
            ELSE '<rare>' END AS token,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(COUNT(*) AS BIGINT) AS n_merged_tokens
FROM counted
GROUP BY 1, 2
"""


def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFERENTIAL-INTEGRITY AUDIT — orphan counts for every foreign
    key edge of the star schema, the broken-ingest detector run
    after every load. Scale shape: each CHILD table is scanned ONCE
    no matter how many of its FKs are audited (lineitem's three
    edges are three left joins against DISTINCT parent key sets
    hanging off one scan, unpivoted with stack()) — never one scan
    per edge; parent build sides are the bare key column (each
    audited parent key is a primary key, so no distinct-compression
    aggregate is spent on it; a non-unique parent key would need
    one); counts are partial-aggregable conditional sums. Fixture integrity is clean
    by construction, so the interesting column — orphan_ppm — is the
    zero every healthy load shows; the mechanism (child-count
    reconciliation per edge, clean-audit zeros) is pinned in
    tests/test_round7_ops.py."""

    def keyset(tbl: str, col: str, alias: str) -> DataFrame:
        # every audited parent column is that table's PRIMARY key, so
        # the former .distinct() was a semantic no-op costing one
        # full aggregate+exchange per parent (4 in the plan) before
        # the broadcast — dropped in the r12 optimization round. For
        # a non-unique parent key a distinct-compression belongs
        # here (a duplicate build row would double-count children).
        return (
            load_table(spark, sf_dir, tbl)
            .select(F.col(col).alias(alias))
            .withColumn(f"hit_{alias}", F.lit(1))
        )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    li_audit = (
        li.join(keyset("orders", "o_orderkey", "ok"), li.l_orderkey == F.col("ok"), "left")
        .join(keyset("part", "p_partkey", "pk"), li.l_partkey == F.col("pk"), "left")
        .join(keyset("supplier", "s_suppkey", "sk"), li.l_suppkey == F.col("sk"), "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("hit_ok").isNull()).alias("orph_o"),
            F.count_if(F.col("hit_pk").isNull()).alias("orph_p"),
            F.count_if(F.col("hit_sk").isNull()).alias("orph_s"),
        )
        .select(
            F.expr(
                "stack(3,"
                " 'lineitem.l_orderkey->orders', n, orph_o,"
                " 'lineitem.l_partkey->part', n, orph_p,"
                " 'lineitem.l_suppkey->supplier', n, orph_s)"
                " AS (fk_edge, n_child, n_orphans)"
            )
        )
    )

    def single(child: str, ckey: str, parent: str, pkey: str) -> DataFrame:
        c = load_table(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        p = keyset(parent, pkey, "pk2")
        return (
            c.join(p, c.k == F.col("pk2"), "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.count_if(F.col("hit_pk2").isNull()).alias("n_orphans"),
            )
            .select(
                F.lit(f"{child}.{ckey}->{parent}").alias("fk_edge"),
                "n_child",
                "n_orphans",
            )
        )

    out = li_audit
    for args in (
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ):
        out = out.union(single(*args))
    return out.select(
        "fk_edge",
        "n_child",
        "n_orphans",
        F.expr("(n_orphans * 1000000) div n_child").alias("orphan_ppm"),
    )


def _fk_orphans_sql() -> str:
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    selects = [
        f"""SELECT '{c}.{ck}->{p}' AS fk_edge,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(COUNT(*) - COUNT(pk.k) AS BIGINT) AS n_orphans
FROM {c} ch LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {p}) pk
  ON ch.{ck} = pk.k"""
        for c, ck, p, pk in edges
    ]
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH audit AS (
{body}
)
SELECT fk_edge, n_child, n_orphans,
       CAST((n_orphans * 1000000) // n_child AS BIGINT) AS orphan_ppm
FROM audit
"""


# numeric lineitem columns profiled by describe; all are exact at
# 2 decimal places in the fixture, so x*100 rounds to exact int64
_DESCRIBE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def profile_describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-SCAN `describe()` — n/min/max/mean/std for every numeric
    column of lineitem, the table-profiling report ANALYZE-style
    tooling emits. All 4x5 aggregates compute in a SINGLE pass over
    one scan (partial-aggregable; never one scan per column) and
    unpivot via stack(). Exactness discipline: values quantize to
    integer centi-units; mean is truncating integer division;
    std (population) is the only double — computed from the
    DECIMAL(38,0)/HUGEINT sufficient statistics with an identical
    expression tree on both engines (sqrt is IEEE-correctly-rounded,
    so identical integers give bit-identical doubles)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        *[
            F.expr(f"CAST(round({c} * 100) AS BIGINT)").alias(c)
            for c in _DESCRIBE_COLS
        ]
    )
    aggs = []
    for c in _DESCRIBE_COLS:
        aggs += [
            F.count(F.col(c)).alias(f"n_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).cast("decimal(38,0)")).alias(f"sx_{c}"),
            F.sum((F.col(c) * F.col(c)).cast("decimal(38,0)")).alias(
                f"sxx_{c}"
            ),
        ]
    g = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_{c}, min_{c}, max_{c}, "
        f"CAST(sx_{c} div n_{c} AS BIGINT), "
        f"sqrt(CAST(CAST(n_{c} AS DECIMAL(38,0)) * sxx_{c} - sx_{c} * sx_{c}"
        f" AS DOUBLE)) / CAST(n_{c} AS DOUBLE)"
        for c in _DESCRIBE_COLS
    )
    return g.select(
        F.expr(
            f"stack({len(_DESCRIBE_COLS)}, {stack_args})"
            " AS (column, n, min_c, max_c, mean_c, std_c)"
        )
    )


def _describe_stats_sql() -> str:
    selects = [
        f"""SELECT '{c}' AS "column", CAST(COUNT(v) AS BIGINT) AS n,
       CAST(MIN(v) AS BIGINT) AS min_c, CAST(MAX(v) AS BIGINT) AS max_c,
       CAST(SUM(CAST(v AS HUGEINT)) // COUNT(v) AS BIGINT) AS mean_c,
       sqrt(CAST(COUNT(v) * SUM(CAST(v AS HUGEINT) * v)
                 - SUM(CAST(v AS HUGEINT)) * SUM(CAST(v AS HUGEINT))
            AS DOUBLE)) / CAST(COUNT(v) AS DOUBLE) AS std_c
FROM (SELECT CAST(round({c} * 100) AS BIGINT) AS v FROM lineitem)"""
        for c in _DESCRIBE_COLS
    ]
    return "\nUNION ALL\n".join(selects)


def dq_order_totals_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-TABLE TOTALS RECONCILIATION — does the order header's
    total agree with the sum of its line items? The classic
    fact-vs-fact financial audit (billing vs ledger, header vs
    detail), reported per order priority: order counts, childless
    headers, exact-match counts, and the absolute / net delta in
    exact integer cents. The fixture's totals are synthetic so the
    deltas are nonzero — the AUDIT MECHANISM is the operator, and
    every column is a deterministic integer. Scale shape: lineitem
    compresses to per-order sums FIRST (map-side partial agg — the
    shuffle carries one row per order, never per line), then ONE
    key-co-partitioned fact-fact join against headers; at 100 TB
    both sides bucket by orderkey and the join is shuffle-free. A
    LEFT join keeps childless headers visible — they are the audit's
    loudest signal."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
            "line_c"
        ),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("line_c").alias("items_c"),
        F.count(F.lit(1)).alias("n_items"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("total_c"),
    )
    j = o.join(per_order, o["o_orderkey"] == per_order["l_orderkey"], "left")
    delta = F.coalesce(F.col("items_c"), F.lit(0)) - F.col("total_c")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("items_c").isNull()).alias("n_childless"),
        F.sum(F.coalesce(F.col("n_items"), F.lit(0))).alias("n_items"),
        F.count_if(delta == 0).alias("n_exact"),
        F.sum(F.abs(delta)).alias("abs_delta_c"),
        F.sum(delta).alias("net_delta_c"),
    )


_DQ_ORDER_TOTALS_RECON_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS items_c,
         CAST(COUNT(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY l_orderkey
), o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
  FROM orders
), j AS (
  SELECT o.o_orderpriority, p.n_items, p.items_c,
         COALESCE(p.items_c, 0) - o.total_c AS delta
  FROM o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN items_c IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_childless,
       CAST(SUM(COALESCE(n_items, 0)) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(ABS(delta)) AS BIGINT) AS abs_delta_c,
       CAST(SUM(delta) AS BIGINT) AS net_delta_c
FROM j GROUP BY o_orderpriority
"""


_TCLOSE_T_PPM = 300_000  # release gate: TVD <= 0.3


def sec_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS AUDIT — the release gate one step past l-diversity
    (`sec_l_diversity`): a class can hold l distinct sensitive values
    yet still leak if its DISTRIBUTION over them diverges from the
    corpus (e.g. 95% of one band where the population holds 20%).
    Distance is the total variation distance (the categorical-domain
    EMD that defines t-closeness) between each (nation, segment)
    class's account-balance-band distribution and the global one,
    in exact ppm: TVD = ½ Σ_b |p_b − q_b|. Absent bands are never
    materialized — their Σ_b q_b contribution folds in via
    inclusion-exclusion (Σ_all g_b = N), so the only joined grid is
    the OBSERVED (class, band) cells. Cross-products n_cb·N form in
    DECIMAL(38,0)/HUGEINT; the quotient is ≤ 10⁶ so Spark's long
    `div` is safe. Global band counts broadcast (band cardinality is
    tiny by construction)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000)"
            f" div {_LDIV_BAND_C}"
        ).alias("band"),
    )
    cb = (
        c.groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(F.count(F.lit(1)).alias("n_cb"))
        # observed (class, band) grid — the sufficient statistic:
        # global band counts and N are its band-sums, so ONE
        # customer pass serves all three surfaces (the lazy form
        # scanned customer once per branch).
        .localCheckpoint(eager=True)
    )
    g = cb.groupBy("band").agg(F.sum("n_cb").alias("g_b"))
    n = g.agg(F.sum("g_b").alias("n_tot"))
    cb2 = cb.withColumn(
        "cls_n",
        F.sum("n_cb").over(W.partitionBy("c_nationkey", "c_mktsegment")),
    )
    per_class = (
        cb2.join(F.broadcast(g), "band")
        .crossJoin(F.broadcast(n))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("cls_n").alias("n_rows"),
            F.sum(
                F.abs(
                    F.col("n_cb").cast("decimal(38,0)") * F.col("n_tot")
                    - F.col("g_b").cast("decimal(38,0)") * F.col("cls_n")
                )
                - F.col("g_b").cast("decimal(38,0)") * F.col("cls_n")
            ).alias("part_num"),
            F.max("n_tot").alias("n_tot"),
        )
    )
    return per_class.select(
        "c_nationkey",
        "c_mktsegment",
        "n_rows",
        F.expr(
            "CAST(((part_num + CAST(n_rows AS DECIMAL(38,0)) * n_tot)"
            " * 1000000) div (2 * CAST(n_rows AS DECIMAL(38,0)) * n_tot)"
            " AS BIGINT)"
        ).alias("tvd_ppm"),
    ).withColumn(
        "t_ok", (F.col("tvd_ppm") <= _TCLOSE_T_PPM).cast("long")
    )


_SEC_T_CLOSENESS_SQL = f"""
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000)
           // {_LDIV_BAND_C} AS band
  FROM customer
), cb AS (
  SELECT c_nationkey, c_mktsegment, band,
         CAST(COUNT(*) AS BIGINT) AS n_cb
  FROM c GROUP BY 1, 2, 3
), g AS (
  SELECT band, CAST(COUNT(*) AS BIGINT) AS g_b FROM c GROUP BY band
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM c
), cls AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(SUM(n_cb) AS BIGINT) AS n_rows
  FROM cb GROUP BY 1, 2
), per_class AS (
  SELECT cb.c_nationkey, cb.c_mktsegment, cls.n_rows, n.n_tot,
         SUM(ABS(CAST(n_cb AS HUGEINT) * n_tot
                 - CAST(g_b AS HUGEINT) * cls.n_rows)
             - CAST(g_b AS HUGEINT) * cls.n_rows) AS part_num
  FROM cb
  JOIN g USING (band)
  JOIN cls ON cls.c_nationkey = cb.c_nationkey
          AND cls.c_mktsegment = cb.c_mktsegment
  CROSS JOIN n
  GROUP BY 1, 2, 3, 4
)
SELECT c_nationkey, c_mktsegment, n_rows,
       CAST(((part_num + CAST(n_rows AS HUGEINT) * n_tot) * 1000000)
            // (2 * CAST(n_rows AS HUGEINT) * n_tot) AS BIGINT) AS tvd_ppm,
       CAST(CASE WHEN ((part_num + CAST(n_rows AS HUGEINT) * n_tot)
                       * 1000000)
                      // (2 * CAST(n_rows AS HUGEINT) * n_tot)
                 <= {_TCLOSE_T_PPM} THEN 1 ELSE 0 END AS BIGINT) AS t_ok
FROM per_class
"""


# ---------------------------------------------------------------------------
# sec_k_anonymity — generalization-ladder k-anonymity audit
# ---------------------------------------------------------------------------

_KANON_K = 5


def sec_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY GENERALIZATION LADDER — the release audit that
    precedes `sec_l_diversity`/`sec_t_closeness`: at each
    generalization level of the quasi-identifier (L0 = nation x
    segment x balance band, L1 drops the band, L2 drops the
    segment), how many equivalence classes exist, how small is the
    smallest, and what share of rows would survive a k>=5
    suppression release. ONE scan computes all three levels: the
    ladder is exactly the prefix structure of ROLLUP(nation,
    segment, band), so Spark's Expand emits every class of every
    level from a single shuffle (the same grouping-sets machinery as
    `agg_grouping_sets`), and the per-level report is a tiny
    second aggregate over class rows — no re-scan per level, which
    is what makes the audit O(one pass) at 100 TB. grouping_id
    bits map rollup rows to ladder levels identically in both
    engines."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000)"
            f" div {_LDIV_BAND_C}"
        ).alias("band"),
    )
    classes = (
        c.rollup("c_nationkey", "c_mktsegment", "band")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.grouping_id().alias("gid"),
        )
        .where(F.col("gid").isin(0, 1, 3))
        .withColumn(
            "level",
            F.when(F.col("gid") == 0, 0)
            .when(F.col("gid") == 1, 1)
            .otherwise(2)
            .cast("long"),
        )
    )
    rep = classes.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("cnt").alias("n_rows"),
        F.min("cnt").alias("k_min"),
        F.sum(F.when(F.col("cnt") < _KANON_K, F.col("cnt")).otherwise(0)).alias(
            "rows_suppressed"
        ),
    )
    return rep.select(
        "level",
        F.col("n_classes").cast("long").alias("n_classes"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("k_min").cast("long").alias("k_min"),
        F.col("rows_suppressed").cast("long").alias("rows_suppressed"),
        F.expr(
            "CAST(((n_rows - rows_suppressed) * 1000000) div n_rows"
            " AS BIGINT)"
        ).alias("share_anon_ppm"),
        (F.col("k_min") >= _KANON_K).cast("long").alias("k_ok"),
    )


_SEC_K_ANONYMITY_SQL = f"""
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000)
           // {_LDIV_BAND_C} AS band
  FROM customer
), classes AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
         GROUPING(c_nationkey, c_mktsegment, band) AS gid
  FROM c GROUP BY ROLLUP (c_nationkey, c_mktsegment, band)
), leveled AS (
  SELECT cnt,
         CAST(CASE WHEN gid = 0 THEN 0 WHEN gid = 1 THEN 1 ELSE 2 END
              AS BIGINT) AS level
  FROM classes WHERE gid IN (0, 1, 3)
), rep AS (
  SELECT level,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(MIN(cnt) AS BIGINT) AS k_min,
         CAST(SUM(CASE WHEN cnt < {_KANON_K} THEN cnt ELSE 0 END)
              AS BIGINT) AS rows_suppressed
  FROM leveled GROUP BY level
)
SELECT level, n_classes, n_rows, k_min, rows_suppressed,
       CAST(((n_rows - rows_suppressed) * 1000000) // n_rows
            AS BIGINT) AS share_anon_ppm,
       CAST(CASE WHEN k_min >= {_KANON_K} THEN 1 ELSE 0 END AS BIGINT)
         AS k_ok
FROM rep
"""


# ---------------------------------------------------------------------------
# evt_cuped_adjust — variance-reduced experiment readout (CUPED)
# ---------------------------------------------------------------------------


def evt_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-ADJUSTED A/B READOUT — the variance-reduction step every
    mature experimentation platform runs on top of the plain
    two-arm readout (`evt_ab_test`): each user's PRE-period activity
    (purchases before the time-axis midpoint) is a covariate X for
    the POST-period metric Y; theta = cov(X,Y)/var(X) is fit POOLED
    across arms (the unbiased CUPED estimator), and the adjusted
    treatment delta is (mean_Yt - mean_Yc) - theta*(mean_Xt -
    mean_Xc). Everything is an exact integer rational over the
    per-user count table: theta and the deltas are signed ppm via
    sign-split truncating division; the variance-reduction factor
    corr^2 = theta * beta_yx composes the two ppm slopes instead of
    squaring the covariance (whose square overflows even HUGEINT at
    cluster user counts — the `ml_auc_rank` lesson applied at design
    time). Scale shape: ONE event scan -> per-user (pre, post)
    counts (the only data-sized shuffle) -> a single 1-row
    conditional aggregate; every division happens on the 1-row
    frame."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    lim = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid_us"))
    users = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts_us") < F.col("mid_us"), F.col("is_p")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ts_us") >= F.col("mid_us"), F.col("is_p")).otherwise(0)
            ).alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2 == 0).cast("long"))
    )
    g = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0)).alias("sx_t"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias("sy_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0)).alias("sx_c"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias("sy_c"),
    )
    # signed ppm ratio via sign-split truncating division (both
    # engines apply // to the absolute value and re-apply the sign)
    def _sdiv(num: str, den: str) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * 1000000) div ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * 1000000) div ({den}) AS BIGINT) END"
        )

    cov = "(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
    varx = "(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx)"
    vary = "(n * syy - CAST(sy AS DECIMAL(38,0)) * sy)"
    dy = "(CAST(sy_t AS DECIMAL(38,0)) * n_c - CAST(sy_c AS DECIMAL(38,0)) * n_t)"
    dx = "(CAST(sx_t AS DECIMAL(38,0)) * n_c - CAST(sx_c AS DECIMAL(38,0)) * n_t)"
    nn = "(CAST(n_t AS DECIMAL(38,0)) * n_c)"
    return g.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_c").cast("long").alias("n_c"),
        F.expr(_sdiv(dy, nn)).alias("dy_ppm"),
        F.expr(_sdiv(dx, nn)).alias("dx_ppm"),
        F.expr(
            f"CASE WHEN {varx} = 0 THEN NULL ELSE {_sdiv(cov, varx)} END"
        ).alias("theta_ppm"),
        F.expr(
            f"CASE WHEN {varx} = 0 OR {vary} = 0 THEN NULL ELSE "
            + _sdiv(
                f"CAST({_sdiv(cov, varx)} AS DECIMAL(38,0))"
                f" * {_sdiv(cov, vary)}",
                "1000000000000",
            )
            + " END"
        ).alias("var_red_ppm"),
        F.expr(
            f"CASE WHEN {varx} = 0 THEN {_sdiv(dy, nn)} ELSE "
            + _sdiv(
                f"CAST({_sdiv(dy, nn)} AS DECIMAL(38,0)) * 1000000"
                f" - CAST({_sdiv(cov, varx)} AS DECIMAL(38,0))"
                f" * {_sdiv(dx, nn)}",
                "1000000000000",
            )
            + " END"
        ).alias("adj_delta_ppm"),
    )


def _cuped_sql() -> str:
    def sdiv(num: str, den: str) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * 1000000) // ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * 1000000) // ({den}) AS BIGINT) END"
        )

    cov = "(n * sxy - CAST(sx AS HUGEINT) * sy)"
    varx = "(n * sxx - CAST(sx AS HUGEINT) * sx)"
    vary = "(n * syy - CAST(sy AS HUGEINT) * sy)"
    dy = "(CAST(sy_t AS HUGEINT) * n_c - CAST(sy_c AS HUGEINT) * n_t)"
    dx = "(CAST(sx_t AS HUGEINT) * n_c - CAST(sx_c AS HUGEINT) * n_t)"
    nn = "(CAST(n_t AS HUGEINT) * n_c)"
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
), lim AS (
  SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid_us FROM ev
), users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts_us < mid_us THEN is_p ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts_us >= mid_us THEN is_p ELSE 0 END)
              AS BIGINT) AS y,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm
  FROM ev CROSS JOIN lim GROUP BY user_id
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
         CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_t,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_c,
         CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_c
  FROM users
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(n_t AS BIGINT) AS n_t,
       CAST(n_c AS BIGINT) AS n_c,
       {sdiv(dy, nn)} AS dy_ppm,
       {sdiv(dx, nn)} AS dx_ppm,
       CASE WHEN {varx} = 0 THEN NULL
            ELSE {sdiv(cov, varx)} END AS theta_ppm,
       CASE WHEN {varx} = 0 OR {vary} = 0 THEN NULL
            ELSE {sdiv(
                f"CAST({sdiv(cov, varx)} AS HUGEINT)"
                f" * {sdiv(cov, vary)}",
                "1000000000000",
            )} END AS var_red_ppm,
       CASE WHEN {varx} = 0 THEN {sdiv(dy, nn)}
            ELSE {sdiv(
                f"CAST({sdiv(dy, nn)} AS HUGEINT) * 1000000"
                f" - CAST({sdiv(cov, varx)} AS HUGEINT)"
                f" * {sdiv(dx, nn)}",
                "1000000000000",
            )} END AS adj_delta_ppm
FROM g
"""


# ---------------------------------------------------------------------------
# dq_gap_inventory — per-user activity-gap completeness audit
# ---------------------------------------------------------------------------


def dq_gap_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTIVITY-GAP INVENTORY — the ingestion-completeness audit that
    row counts can't give: for every (user, event type), find the
    DAYS-LONG holes in their activity timeline (gaps between
    consecutive active days) and roll them up per type: how many
    gaps, how many user-days are missing, the single worst gap, and
    the coverage share of summed user spans. A feed that silently
    drops a shard shows up here as a synchronized gap long before
    totals drift. Scale shape: events compress to the DISTINCT
    (type, user, day) grid first (the only event-sized shuffle);
    the lead() window runs per (type, user) over active days — tiny
    partitions by construction; two further aggregates shrink
    monotonically. Pure integer day arithmetic end-to-end."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.expr("unix_date(ts_date)").alias("day")
    )
    grid = ev.distinct()
    lead = grid.withColumn(
        "nxt",
        F.lead("day").over(
            W.partitionBy("event_type", "user_id").orderBy("day")
        ),
    )
    per_user = lead.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("active_days"),
        (F.max("day") - F.min("day") + 1).alias("span_days"),
        F.sum(
            F.when(F.col("nxt") > F.col("day") + 1, 1).otherwise(0)
        ).alias("n_gaps"),
        F.sum(
            F.when(
                F.col("nxt") > F.col("day") + 1,
                F.col("nxt") - F.col("day") - 1,
            ).otherwise(0)
        ).alias("missing_days"),
        F.max(
            F.coalesce(F.col("nxt") - F.col("day") - 1, F.lit(0))
        ).alias("max_gap"),
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_gaps").alias("n_gaps"),
            F.sum("missing_days").alias("missing_days"),
            F.max("max_gap").alias("max_gap_days"),
            F.sum("active_days").alias("active_days"),
            F.sum("span_days").alias("span_days"),
        )
        .select(
            "event_type",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_gaps").cast("long").alias("n_gaps"),
            F.col("missing_days").cast("long").alias("missing_days"),
            F.col("max_gap_days").cast("long").alias("max_gap_days"),
            F.expr(
                "CAST((active_days * 1000000) div span_days AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


_DQ_GAP_INVENTORY_SQL = """
WITH grid AS (
  SELECT DISTINCT event_type, user_id,
         (CAST(ts AS DATE) - DATE '1970-01-01') AS day
  FROM events
), led AS (
  SELECT event_type, user_id, day,
         LEAD(day) OVER (PARTITION BY event_type, user_id
                         ORDER BY day) AS nxt
  FROM grid
), per_user AS (
  SELECT event_type, user_id,
         CAST(COUNT(*) AS BIGINT) AS active_days,
         CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS span_days,
         CAST(SUM(CASE WHEN nxt > day + 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_gaps,
         CAST(SUM(CASE WHEN nxt > day + 1 THEN nxt - day - 1 ELSE 0 END)
              AS BIGINT) AS missing_days,
         CAST(MAX(COALESCE(nxt - day - 1, 0)) AS BIGINT) AS max_gap
  FROM led GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_gaps) AS BIGINT) AS n_gaps,
       CAST(SUM(missing_days) AS BIGINT) AS missing_days,
       CAST(MAX(max_gap) AS BIGINT) AS max_gap_days,
       CAST((SUM(active_days) * 1000000) // SUM(span_days)
            AS BIGINT) AS coverage_ppm
FROM per_user GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# dq_rules_engine — config-table-driven metric alerting
# ---------------------------------------------------------------------------

# (rule_id, metric, op, threshold, scope) — the "config table". A real
# deployment loads this from a governance store; here it is a literal
# both engines inline, because the POINT of the entry is that rules
# are DATA: adding a rule is a row insert, not a code change, and the
# evaluation plan is invariant in the rule count.
_DQ_RULES = (
    (1, "n_events", "lt", 55, "*"),
    (2, "sum_value_c", "gt", 380_000, "purchase"),
    (3, "n_users", "lt", 45, "*"),
    (4, "n_events", "gt", 75, "click"),
    (5, "sum_value_c", "lt", 240_000, "error"),
)


def dq_rules_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RULES-ENGINE ALERTING — the config-driven monitor every data
    platform converges on: thresholds live in a RULE TABLE (metric,
    operator, threshold, scope), not in code, so on-call owns alerts
    without deploys. One scan computes the per-(type, day) metric
    grid (count / value cents / distinct users share the pass),
    stack() unpivots it to long form, and the broadcast rule join +
    operator CASE emits violations. The plan is invariant in rule
    count — 5 rules or 5000 evaluate in the same two steps, and the
    metric grid is days x types regardless of corpus size. Output:
    one row per (rule, type, day) violation."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_date(ts_date)").alias("day"),
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    grid = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").alias("sum_value_c"),
        F.countDistinct("user_id").alias("n_users"),
    )
    long = grid.select(
        "event_type",
        "day",
        F.expr(
            "stack(3, 'n_events', n_events, 'sum_value_c', sum_value_c,"
            " 'n_users', n_users) AS (metric, value)"
        ),
    )
    rules = spark.createDataFrame(
        list(_DQ_RULES), "rule_id LONG, metric STRING, op STRING,"
        " threshold LONG, scope STRING"
    )
    joined = long.join(
        F.broadcast(rules),
        (long.metric == rules.metric)
        & ((rules.scope == "*") | (rules.scope == long.event_type)),
    )
    return (
        joined.where(
            F.expr(
                "CASE WHEN op = 'lt' THEN value < threshold"
                " ELSE value > threshold END"
            )
        )
        .select(
            "rule_id",
            "event_type",
            "day",
            long.metric.alias("metric"),
            F.col("value").cast("long").alias("value"),
            "threshold",
        )
    )


def _rules_engine_sql() -> str:
    vals = ", ".join(
        f"({rid}, '{m}', '{op}', {th}, '{sc}')"
        for rid, m, op, th, sc in _DQ_RULES
    )
    return f"""
WITH ev AS (
  SELECT event_type, (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
         user_id, CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), grid AS (
  SELECT event_type, day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(v) AS BIGINT) AS sum_value_c,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM ev GROUP BY 1, 2
), long AS (
  SELECT event_type, day, 'n_events' AS metric, n_events AS value FROM grid
  UNION ALL
  SELECT event_type, day, 'sum_value_c', sum_value_c FROM grid
  UNION ALL
  SELECT event_type, day, 'n_users', n_users FROM grid
), rules(rule_id, metric, op, threshold, scope) AS (
  VALUES {vals}
)
SELECT CAST(r.rule_id AS BIGINT) AS rule_id, l.event_type, l.day,
       l.metric, l.value, CAST(r.threshold AS BIGINT) AS threshold
FROM long l
JOIN rules r ON r.metric = l.metric
            AND (r.scope = '*' OR r.scope = l.event_type)
WHERE CASE WHEN r.op = 'lt' THEN l.value < r.threshold
           ELSE l.value > r.threshold END
"""


# ---------------------------------------------------------------------------
# sec_dp_geometric — discrete-Laplace noisy counts (the DP mechanism)
# ---------------------------------------------------------------------------

# Truncated discrete Laplace (two-sided geometric), alpha = 1/2,
# support [-8, 8]. The UNtruncated alpha = 1/2 geometric is epsilon
# = ln 2 pure-DP; truncating to ±8 trades pure DP for bounded noise
# (edge outputs have zero mass under an adjacent dataset), so what
# ships is approximate / (epsilon, delta)-style, not pure ln 2.
# P(k) is proportional to 2^(8-|k|), so every mass is an exact
# integer: weights 1,2,...,128,256,128,...,2,1 summing to 766. The
# 16 inverse-CDF boundaries (cumulative mass through k = -8..7,
# scaled to the 2^30 draw space, floor) are computed HERE in exact
# Python integer arithmetic and shared literally by both engines —
# the ml_ndcg table discipline.
_DP_CUM = [1, 3, 7, 15, 31, 63, 127, 255, 511, 639, 703, 735, 751, 759, 763, 765]
_DP_BOUNDS = [(1 << 30) * c // 766 for c in _DP_CUM]
_DP_B_SPARK = "array(" + ", ".join(f"{b}L" for b in _DP_BOUNDS) + ")"
_DP_B_DUCK = "[" + ", ".join(f"CAST({b} AS BIGINT)" for b in _DP_BOUNDS) + "]"


def sec_dp_geometric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE NOISY COUNTS — the geometric mechanism
    (the integer-valued discrete Laplace) over the per-(type, day)
    event histogram, completing the privacy ladder next to
    k-anonymity / l-diversity / t-closeness (those bound RE-LINKING;
    DP bounds what any SINGLE row can change in the release). Each
    cell's true count gets noise drawn by inverse-CDF from a
    truncated alpha = 1/2 two-sided geometric (support ±8, masses
    proportional to 2^(8-|k|) — all-integer, so the 16 CDF
    boundaries over the 2^30 draw space are EXACT shared literals,
    no libm). Privacy accounting: epsilon = ln 2 holds for the
    UNtruncated geometric; the ±8 truncation makes edge outputs
    unreachable under an adjacent dataset, so the shipped mechanism
    is approximate-DP-style with bounded noise, NOT pure
    epsilon = ln 2 (an honest trade, chosen so the release is
    integer-exact and oracle-replayable).
    The draw is a seeded md5 of the cell key —
    deterministic REPLAY for the oracle and tests; a production
    release swaps in a secure RNG, everything else unchanged (same
    honest-stub stance as the multimodal codecs). Post-processing:
    released cells below 10 suppress to NULL (suppression after
    noise is DP-sound — it's pure post-processing). Scale shape: one
    partial-aggregable grid shuffle; the noise is map-side
    expression work on the grid."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_date(ts_date)").alias("day")
    )
    grid = e.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    u = (
        "CAST(conv(substring(md5(event_type || ':' || CAST(day AS STRING)"
        " || ':dp'), 1, 12), 16, 10) AS BIGINT) % 1073741824"
    )
    k = f"-8 + CAST(size(filter({_DP_B_SPARK}, t -> ({u}) >= t)) AS BIGINT)"
    noisy = f"greatest(n + ({k}), CAST(0 AS BIGINT))"
    return grid.select(
        "event_type",
        "day",
        F.expr(
            f"CASE WHEN {noisy} >= 10 THEN {noisy} ELSE NULL END"
        ).alias("noisy_count"),
        F.expr(f"CAST({noisy} < 10 AS BIGINT)").alias("suppressed"),
    )


def _sec_dp_geometric_sql() -> str:
    u = (
        "CAST(('0x' || substr(md5(event_type || ':' || CAST(day AS VARCHAR)"
        " || ':dp'), 1, 12)) AS BIGINT) % 1073741824"
    )
    k = (
        f"-8 + CAST(len(list_filter({_DP_B_DUCK}, t -> ({u}) >= t))"
        " AS BIGINT)"
    )
    noisy = f"GREATEST(n + ({k}), CAST(0 AS BIGINT))"
    return f"""
WITH grid AS (
  SELECT event_type, (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day
)
SELECT event_type, day,
       CASE WHEN {noisy} >= 10 THEN {noisy} ELSE NULL END AS noisy_count,
       CAST({noisy} < 10 AS BIGINT) AS suppressed
FROM grid
"""


# ---------------------------------------------------------------------------
# sec_rtbf_purge_audit — right-to-be-forgotten cascade audit
# ---------------------------------------------------------------------------

_RTBF_HASH = (
    "CAST(conv(substring(md5(CAST(user_id AS STRING) || ':rtbf'), 1, 12),"
    " 16, 10) AS BIGINT) % 20"
)
_RTBF_HASH_DUCK = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':rtbf'), 1, 12))"
    " AS BIGINT) % 20"
)


def sec_rtbf_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-BE-FORGOTTEN CASCADE AUDIT — the deletion-compliance
    report a regulator actually asks for: given a forget set (~5% of
    users, hash-selected deterministically), purge them from the raw
    event log AND every derived surface (per-user daily activity,
    per-user current state), and PROVE zero residue per table. The
    audit runs as anti-join row counts — rows_before, rows_purged,
    rows_after, and a residue recount that must be 0 — one row per
    purged surface. At 100 TB each purge is one anti-join on the
    partitioned user key (broadcast forget-set when small, the usual
    shape) and the residue check rides the same pass; nothing here
    is corpus-quadratic. The entry's value is the CASCADE: derived
    tables silently retaining purged users is the standard GDPR
    audit finding."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_date(ts_date)").alias("day"),
        "ts_us", "event_id",
    )
    forget = (F.expr(_RTBF_HASH) == 0).cast("long")
    tagged = ev.withColumn("fg", forget).localCheckpoint(eager=True)
    daily = tagged.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n"), F.max("fg").alias("fg")
    )
    state = tagged.groupBy("user_id").agg(
        F.max(F.struct("ts_us", "event_id")).alias("b"), F.max("fg").alias("fg")
    )
    rows = []
    for name, df in (("events", tagged), ("user_daily", daily),
                     ("user_state", state)):
        rows.append(
            df.agg(
                F.lit(name).alias("surface"),
                F.count(F.lit(1)).alias("rows_before"),
                F.sum(F.col("fg").cast("long")).alias("rows_purged"),
                # residue: forget-flag sum over the rows that SURVIVE
                # the purge filter — computed from data row by row, so
                # a broken forget predicate (or a derived surface that
                # lost the flag) makes this nonzero and hash-fails
                F.sum(
                    F.when(F.col("fg") == 0, F.col("fg")).otherwise(0)
                ).alias("residue"),
            ).select(
                "surface",
                F.col("rows_before").cast("long").alias("rows_before"),
                F.col("rows_purged").cast("long").alias("rows_purged"),
                (F.col("rows_before") - F.col("rows_purged"))
                .cast("long")
                .alias("rows_after"),
                F.col("residue").cast("long").alias("residue"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


_SEC_RTBF_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
         epoch_us(ts::TIMESTAMP) AS ts_us, event_id,
         CASE WHEN {_RTBF_HASH_DUCK} = 0 THEN 1 ELSE 0 END AS fg
  FROM events
), daily AS (
  SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MAX(fg) AS BIGINT) AS fg
  FROM ev GROUP BY 1, 2
), state AS (
  SELECT user_id, CAST(MAX(fg) AS BIGINT) AS fg
  FROM ev GROUP BY user_id
), per AS (
  SELECT 'events' AS surface, CAST(COUNT(*) AS BIGINT) AS rows_before,
         CAST(SUM(fg) AS BIGINT) AS rows_purged,
         CAST(SUM(CASE WHEN fg = 0 THEN fg ELSE 0 END) AS BIGINT)
           AS residue
  FROM ev
  UNION ALL
  SELECT 'user_daily', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(fg) AS BIGINT),
         CAST(SUM(CASE WHEN fg = 0 THEN fg ELSE 0 END) AS BIGINT)
  FROM daily
  UNION ALL
  SELECT 'user_state', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(fg) AS BIGINT),
         CAST(SUM(CASE WHEN fg = 0 THEN fg ELSE 0 END) AS BIGINT)
  FROM state
)
SELECT surface, rows_before, rows_purged,
       CAST(rows_before - rows_purged AS BIGINT) AS rows_after, residue
FROM per
"""


# ---------------------------------------------------------------------------
# evt_attribution_shapley — exact Shapley multi-touch attribution
# ---------------------------------------------------------------------------


def evt_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHAPLEY MULTI-TOUCH ATTRIBUTION — the game-theoretic answer
    to 'which channel gets credit for the conversion' that
    last-touch (`evt_attribution`) systematically biases: with the
    3-channel exposure game (view/click/signup; conversion = the
    >= 14-purchases convention), every coalition value v(T) =
    CONVERTED USERS WHOSE EXPOSURE SET ⊆ T is an integer count, all
    8 coalition values come from ONE conditional-aggregate scan of
    the per-user flag table, and the |C|=3 Shapley weights
    (1/3, 1/6, 1/6, 1/3) are cleared by emitting phi x6 — the whole
    computation is exact int64, closed-form, no sampling. The
    efficiency axiom Σ phi_x6 = 6(v(full) - v(empty)) rides along
    as the falsifiable audit column."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
    )
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("long")).alias("hv"),
        F.max((F.col("event_type") == "click").cast("long")).alias("hc"),
        F.max((F.col("event_type") == "signup").cast("long")).alias("hs"),
        (
            F.sum((F.col("event_type") == "purchase").cast("long")) >= 14
        )
        .cast("long")
        .alias("conv"),
    )

    def v(tv: int, tc: int, ts: int) -> str:
        # v(T): converted users whose exposure set is CONTAINED in T
        return (
            f"SUM(CASE WHEN conv = 1 AND hv <= {tv} AND hc <= {tc}"
            f" AND hs <= {ts} THEN 1 ELSE 0 END)"
        )

    aggs = [F.count(F.lit(1)).alias("n_users")]
    for label, t in {
        "v000": (0, 0, 0), "v100": (1, 0, 0), "v010": (0, 1, 0),
        "v001": (0, 0, 1), "v110": (1, 1, 0), "v101": (1, 0, 1),
        "v011": (0, 1, 1), "v111": (1, 1, 1),
    }.items():
        aggs.append(F.expr(v(*t)).alias(label))
    # ONE row — but the per-channel union below reads it three
    # times, and each read re-planned the events scan + per-user
    # rollup. The eager checkpoint keeps "all 8 coalition values
    # from ONE scan" true in the physical plan, not just the
    # logical one.
    g = users.agg(*aggs).localCheckpoint(eager=True)

    # phi x6 for channel i: 2[v(i)-v(0)] + [v(ij)-v(j)] + [v(ik)-v(k)]
    # + 2[v(full)-v(full\i)]
    phi = {
        "view": (
            "2*(v100 - v000) + (v110 - v010) + (v101 - v001)"
            " + 2*(v111 - v011)"
        ),
        "click": (
            "2*(v010 - v000) + (v110 - v100) + (v011 - v001)"
            " + 2*(v111 - v101)"
        ),
        "signup": (
            "2*(v001 - v000) + (v101 - v100) + (v011 - v010)"
            " + 2*(v111 - v110)"
        ),
    }
    rows = None
    for ch, expr in phi.items():
        r = g.select(
            F.lit(ch).alias("channel"),
            F.expr(f"CAST({expr} AS BIGINT)").alias("phi_x6"),
            F.col("v111").cast("long").alias("v_full"),
            F.col("v000").cast("long").alias("v_empty"),
            F.expr("CAST(6 * (v111 - v000) AS BIGINT)").alias(
                "phi_sum_x6"
            ),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def _shapley_sql() -> str:
    def v(tv: int, tc: int, ts: int) -> str:
        return (
            f"CAST(SUM(CASE WHEN conv = 1 AND hv <= {tv} AND hc <= {tc}"
            f" AND hs <= {ts} THEN 1 ELSE 0 END) AS BIGINT)"
        )

    labels = {
        "v000": (0, 0, 0), "v100": (1, 0, 0), "v010": (0, 1, 0),
        "v001": (0, 0, 1), "v110": (1, 1, 0), "v101": (1, 0, 1),
        "v011": (0, 1, 1), "v111": (1, 1, 1),
    }
    cols = ", ".join(f"{v(*t)} AS {lab}" for lab, t in labels.items())
    phi = {
        "view": (
            "2*(v100 - v000) + (v110 - v010) + (v101 - v001)"
            " + 2*(v111 - v011)"
        ),
        "click": (
            "2*(v010 - v000) + (v110 - v100) + (v011 - v001)"
            " + 2*(v111 - v101)"
        ),
        "signup": (
            "2*(v001 - v000) + (v101 - v100) + (v011 - v010)"
            " + 2*(v111 - v110)"
        ),
    }
    sels = "\nUNION ALL\n".join(
        f"SELECT '{ch}' AS channel, CAST({e} AS BIGINT) AS phi_x6,"
        " v111 AS v_full, v000 AS v_empty,"
        " CAST(6 * (v111 - v000) AS BIGINT) AS phi_sum_x6 FROM g"
        for ch, e in phi.items()
    )
    return f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS hs,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
), g AS (
  SELECT {cols} FROM users
)
{sels}
"""


# ---------------------------------------------------------------------------
# evt_att_stratified — stratified matching estimator (ATT)
# ---------------------------------------------------------------------------


def evt_att_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED ATT — the confounder-adjustment leg of the causal
    quartet (`evt_ab_test` tests, `evt_cuped_adjust` de-noises,
    `evt_did_analysis` removes time trends, THIS removes selection
    on observables): users are stratified EXACTLY on the confounder
    (pre-period purchase count, capped at 5 — small-int confounders
    need no binning model), the treated-vs-control post-period mean
    gap is computed inside each stratum, and the ATT reweights the
    per-stratum gaps by treated counts — the classic
    subclassification estimator. Per-stratum gaps are signed
    millicents via sign-split truncating division; the ATT applies
    one more truncating division over the treated-weighted sum
    (documented double truncation, identical in both engines).
    Strata missing an arm are excluded on both engines. One event
    scan -> per-user counts -> a stratum-grid aggregate; the ATT
    window runs over <= 6 stratum rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    lim = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid_us"))
    users = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts_us") < F.col("mid_us"), F.col("is_p"))
                .otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ts_us") >= F.col("mid_us"), F.col("is_p"))
                .otherwise(0)
            ).alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2 == 0).cast("long"))
        .withColumn("stratum", F.least(F.col("x"), F.lit(5)))
    )
    g = (
        users.groupBy("stratum")
        .agg(
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_t"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias(
                "sy_t"
            ),
            F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias(
                "sy_c"
            ),
        )
        .where((F.col("n_t") > 0) & (F.col("n_c") > 0))
    )

    def _sdiv(num: str, den: str) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * 1000) div ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * 1000) div ({den}) AS BIGINT) END"
        )

    dnum = (
        "(CAST(sy_t AS DECIMAL(38,0)) * n_c"
        " - CAST(sy_c AS DECIMAL(38,0)) * n_t)"
    )
    nn = "(CAST(n_t AS DECIMAL(38,0)) * n_c)"
    per = g.select(
        F.col("stratum").cast("long").alias("stratum"),
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_c").cast("long").alias("n_c"),
        F.expr(_sdiv("CAST(sy_t AS DECIMAL(38,0))", "n_t")).alias(
            "mean_y_t_mc"
        ),
        F.expr(_sdiv("CAST(sy_c AS DECIMAL(38,0))", "n_c")).alias(
            "mean_y_c_mc"
        ),
        F.expr(_sdiv(dnum, nn)).alias("delta_mc"),
    )
    return per.withColumn(
        "att_mc",
        F.expr(
            "CASE WHEN sum(CAST(n_t AS DECIMAL(38,0)) * delta_mc)"
            " OVER () >= 0"
            " THEN CAST((sum(CAST(n_t AS DECIMAL(38,0)) * delta_mc)"
            "   OVER ()) div (sum(n_t) OVER ()) AS BIGINT)"
            " ELSE -CAST((-(sum(CAST(n_t AS DECIMAL(38,0)) * delta_mc)"
            "   OVER ())) div (sum(n_t) OVER ()) AS BIGINT) END"
        ),
    )


def _att_sql() -> str:
    def sdiv(num: str, den: str) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * 1000) // ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * 1000) // ({den}) AS BIGINT) END"
        )

    dnum = (
        "(CAST(sy_t AS HUGEINT) * n_c - CAST(sy_c AS HUGEINT) * n_t)"
    )
    nn = "(CAST(n_t AS HUGEINT) * n_c)"
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
), lim AS (
  SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid_us FROM ev
), users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts_us < mid_us THEN is_p ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts_us >= mid_us THEN is_p ELSE 0 END)
              AS BIGINT) AS y,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm
  FROM ev CROSS JOIN lim GROUP BY user_id
), g AS (
  SELECT LEAST(x, 5) AS stratum,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
           AS sy_t,
         CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
           AS sy_c
  FROM users GROUP BY 1
  HAVING SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 0
     AND SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 0
), per AS (
  SELECT CAST(stratum AS BIGINT) AS stratum, n_t, n_c,
         {sdiv("CAST(sy_t AS HUGEINT)", "n_t")} AS mean_y_t_mc,
         {sdiv("CAST(sy_c AS HUGEINT)", "n_c")} AS mean_y_c_mc,
         {sdiv(dnum, nn)} AS delta_mc
  FROM g
)
SELECT *,
       CASE WHEN SUM(CAST(n_t AS HUGEINT) * delta_mc) OVER () >= 0
            THEN CAST((SUM(CAST(n_t AS HUGEINT) * delta_mc) OVER ())
                 // (SUM(n_t) OVER ()) AS BIGINT)
            ELSE -CAST((-(SUM(CAST(n_t AS HUGEINT) * delta_mc)
                 OVER ())) // (SUM(n_t) OVER ()) AS BIGINT) END
         AS att_mc
FROM per
"""


# ---------------------------------------------------------------------------
# ml_permutation_test — md5-seeded permutation test for the arm delta
# ---------------------------------------------------------------------------

_PERM_B = 20


def ml_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMUTATION TEST — the assumption-free significance check for
    the A/B delta (`evt_ab_test` assumes the z approximation; this
    entry asks the data directly): B=20 label permutations, each
    re-assigning every user's arm from md5(user:b) % 2, re-compute
    the treated-minus-control mean-purchases delta under each, and
    the p-value is the rank of |observed| among |permuted| with the
    add-one correction — (count(|perm| >= |obs|) + 1) / (B + 1).
    All 20 permuted deltas accumulate in ONE scan of the per-user
    table as conditional aggregates (the `ml_bootstrap_ci` trick —
    no B-fold explosion), each delta is signed millicounts via the
    cross-multiplied rational and ONE truncating division, and the
    comparison runs on those identically-truncated ints. Under the
    parity null the observed delta is itself exchangeable, so the
    test pins mechanics (replay), not significance."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    users = ev.groupBy("user_id").agg(F.sum("is_p").alias("y"))

    def _sdiv(num: str, den: str) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * 1000) div ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * 1000) div ({den}) AS BIGINT) END"
        )

    def _delta(arm: str, tag: str) -> list:
        return [
            F.sum(F.expr(f"CASE WHEN {arm} = 1 THEN 1 ELSE 0 END")).alias(
                f"nt_{tag}"
            ),
            F.sum(F.expr(f"CASE WHEN {arm} = 0 THEN 1 ELSE 0 END")).alias(
                f"nc_{tag}"
            ),
            F.sum(F.expr(f"CASE WHEN {arm} = 1 THEN y ELSE 0 END")).alias(
                f"st_{tag}"
            ),
            F.sum(F.expr(f"CASE WHEN {arm} = 0 THEN y ELSE 0 END")).alias(
                f"sc_{tag}"
            ),
        ]

    aggs = [F.count(F.lit(1)).alias("n_users")]
    aggs += _delta("CAST(user_id % 2 = 0 AS INT)", "obs")
    for b in range(_PERM_B):
        arm = (
            "CAST(conv(substring(md5(CAST(user_id AS STRING)"
            f" || ':{b}'), 1, 12), 16, 10) AS BIGINT) % 2"
        )
        aggs += _delta(f"({arm})", f"p{b}")
    g = users.agg(*aggs)

    def d_mc(tag: str) -> str:
        num = (
            f"(CAST(st_{tag} AS DECIMAL(38,0)) * nc_{tag}"
            f" - CAST(sc_{tag} AS DECIMAL(38,0)) * nt_{tag})"
        )
        den = f"(CAST(nt_{tag} AS DECIMAL(38,0)) * nc_{tag})"
        return _sdiv(num, den)

    n_ge = " + ".join(
        f"CASE WHEN abs({d_mc(f'p{b}')}) >= abs({d_mc('obs')})"
        " THEN 1 ELSE 0 END"
        for b in range(_PERM_B)
    )
    return g.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.expr(d_mc("obs")).alias("obs_delta_mc"),
        F.lit(_PERM_B).cast("long").alias("n_perm"),
        F.expr(f"CAST({n_ge} AS BIGINT)").alias("n_ge"),
        F.expr(
            f"CAST((({n_ge}) + 1) * 1000000 AS BIGINT)"
            f" div {_PERM_B + 1}"
        )
        .cast("long")
        .alias("p_ppm"),
    )


def _perm_sql() -> str:
    def sdiv(num: str, den: str) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * 1000) // ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * 1000) // ({den}) AS BIGINT) END"
        )

    def arm(tag: str) -> str:
        if tag == "obs":
            return "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END"
        b = tag[1:]
        return (
            "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)"
            f" || ':{b}'), 1, 12)) AS BIGINT) % 2"
        )

    tags = ["obs"] + [f"p{b}" for b in range(_PERM_B)]
    cols = []
    for t in tags:
        a = arm(t)
        cols += [
            f"CAST(SUM(CASE WHEN ({a}) = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS nt_{t}",
            f"CAST(SUM(CASE WHEN ({a}) = 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS nc_{t}",
            f"CAST(SUM(CASE WHEN ({a}) = 1 THEN y ELSE 0 END) AS BIGINT)"
            f" AS st_{t}",
            f"CAST(SUM(CASE WHEN ({a}) = 0 THEN y ELSE 0 END) AS BIGINT)"
            f" AS sc_{t}",
        ]

    def d_mc(tag: str) -> str:
        num = (
            f"(CAST(st_{tag} AS HUGEINT) * nc_{tag}"
            f" - CAST(sc_{tag} AS HUGEINT) * nt_{tag})"
        )
        den = f"(CAST(nt_{tag} AS HUGEINT) * nc_{tag})"
        return sdiv(num, den)

    n_ge = " + ".join(
        f"CASE WHEN abs({d_mc(f'p{b}')}) >= abs({d_mc('obs')})"
        " THEN 1 ELSE 0 END"
        for b in range(_PERM_B)
    )
    return f"""
WITH users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users, {", ".join(cols)}
  FROM users
)
SELECT n_users,
       {d_mc("obs")} AS obs_delta_mc,
       CAST({_PERM_B} AS BIGINT) AS n_perm,
       CAST({n_ge} AS BIGINT) AS n_ge,
       CAST((({n_ge}) + 1) * 1000000 // {_PERM_B + 1} AS BIGINT)
         AS p_ppm
FROM g
"""


# ---------------------------------------------------------------------------
# dq_duplicate_payments — near-duplicate transaction audit
# ---------------------------------------------------------------------------


def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATE-PAYMENT AUDIT — the finance-ops detector for
    double-submitted transactions: same customer, same exact amount,
    within 2 days, different order ids. Natural exact-amount
    repeats are rare in the fixture, so known duplicates are PLANTED
    in-plan (every 41st order re-submitted next day under a shifted
    id — the deterministic-injection discipline), and the detector
    must find at least that planted population plus whatever natural
    collisions exist. The join is BLOCKED on (custkey, amount) exact
    equality — at 100 TB candidate volume is Σ per-(cust, amount)
    multiplicity², which real amount distributions keep tiny — and
    the 2-day proximity is a filter inside blocks, never a range
    join over the table. Output: each flagged pair with its day gap
    and an is_planted marker so precision is auditable."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("unix_date(CAST(o_orderdate AS DATE))").alias("day"),
        cents("o_totalprice").alias("price_c"),
    )
    planted = o.where(F.col("o_orderkey") % 41 == 0).select(
        "o_custkey",
        (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
        (F.col("day") + 1).alias("day"),
        "price_c",
    )
    reg = o.unionByName(planted)
    pairs = (
        reg.alias("l")
        .join(
            reg.alias("r"),
            (F.col("l.o_custkey") == F.col("r.o_custkey"))
            & (F.col("l.price_c") == F.col("r.price_c"))
            & (F.col("l.o_orderkey") < F.col("r.o_orderkey")),
        )
        .where(F.abs(F.col("l.day") - F.col("r.day")) <= 2)
        .select(
            F.col("l.o_custkey").alias("o_custkey"),
            F.col("l.o_orderkey").alias("k1"),
            F.col("r.o_orderkey").alias("k2"),
            F.col("l.price_c").alias("price_c"),
            F.abs(F.col("l.day") - F.col("r.day"))
            .cast("long")
            .alias("day_gap"),
            (
                (F.col("r.o_orderkey") - F.col("l.o_orderkey"))
                == 1_000_000_000
            )
            .cast("long")
            .alias("is_planted"),
        )
    )
    return pairs


_DQ_DUP_PAY_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
), reg AS (
  SELECT * FROM o
  UNION ALL
  SELECT o_custkey, o_orderkey + 1000000000, day + 1, price_c
  FROM o WHERE o_orderkey % 41 = 0
)
SELECT l.o_custkey, l.o_orderkey AS k1, r.o_orderkey AS k2,
       l.price_c,
       CAST(ABS(l.day - r.day) AS BIGINT) AS day_gap,
       CAST(CASE WHEN r.o_orderkey - l.o_orderkey = 1000000000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_planted
FROM reg l JOIN reg r
  ON l.o_custkey = r.o_custkey AND l.price_c = r.price_c
 AND l.o_orderkey < r.o_orderkey
WHERE ABS(l.day - r.day) <= 2
"""


# ---------------------------------------------------------------------------
# evt_alert_debounce — cooldown-debounced alert admission
# ---------------------------------------------------------------------------

_DEBOUNCE_DAYS = 3


def evt_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALERT DEBOUNCE — the pager-dedup rule 'fire at most once per
    3 days per alert': candidate days (a type's daily volume below
    its own all-days mean, the integer cross-multiplied compare
    n*days < total) pass through a minimum-separation greedy — fire
    at the first candidate, suppress anything closer than 3 days to
    the LAST FIRE, fire again at the next eligible candidate.
    Unlike `evt_frequency_capping`'s budget caps this selection has
    no prefix closed form (each fire re-anchors the window), so it
    is the third genuine fold in the repo: `aggregate()` over the
    per-type candidate-day array vs a recursive-CTE oracle. Output:
    every fired alert with its fire index, plus per-type candidate
    and fired counts riding along. Fold length is the day grid —
    calendar-bounded at any data scale; the (type, day) compression
    is the only data-sized shuffle."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.expr("ts_us div 86400000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("days")
    )
    cand = (
        daily.join(stats, "event_type")
        .where(F.col("n") * F.col("days") < F.col("total"))
        .groupBy("event_type")
        .agg(F.expr("array_sort(collect_list(day))").alias("s"))
    )
    fold = (
        "aggregate("
        " slice(s, 2, greatest(size(s) - 1, 0)),"
        " named_struct('fires', array(element_at(s, 1)),"
        "              'last', element_at(s, 1)),"
        f" (acc, d) -> CASE WHEN d >= acc.last + {_DEBOUNCE_DAYS}"
        "   THEN named_struct('fires', array_append(acc.fires, d),"
        "                     'last', d)"
        "   ELSE acc END)"
    )
    fired = cand.select(
        "event_type",
        F.expr("CAST(size(s) AS BIGINT)").alias("n_candidates"),
        F.expr(f"{fold}.fires").alias("fires"),
    )
    return (
        fired.select(
            "event_type",
            "n_candidates",
            F.expr("CAST(size(fires) AS BIGINT)").alias("n_fired"),
            F.posexplode("fires").alias("p", "fire_day"),
        )
        .select(
            "event_type",
            "n_candidates",
            "n_fired",
            (F.col("p") + 1).cast("long").alias("fire_idx"),
            F.col("fire_day").cast("long").alias("fire_day"),
        )
    )


_EVT_DEBOUNCE_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS days
  FROM daily GROUP BY event_type
), cand AS (
  SELECT d.event_type, list_sort(list(d.day)) AS s
  FROM daily d JOIN stats t ON d.event_type = t.event_type
  WHERE d.n * t.days < t.total
  GROUP BY d.event_type
), n AS (
  SELECT event_type, CAST(len(s) AS BIGINT) AS n_candidates, s
  FROM cand
), rec(event_type, i, last, fired) AS (
  SELECT event_type, CAST(1 AS BIGINT), s[1], s[1] FROM n
  UNION ALL
  SELECT r.event_type, r.i + 1,
         CASE WHEN n.s[CAST(r.i + 1 AS INT)] >= r.last + {_DEBOUNCE_DAYS}
              THEN n.s[CAST(r.i + 1 AS INT)] ELSE r.last END,
         CASE WHEN n.s[CAST(r.i + 1 AS INT)] >= r.last + {_DEBOUNCE_DAYS}
              THEN n.s[CAST(r.i + 1 AS INT)] ELSE NULL END
  FROM rec r JOIN n ON n.event_type = r.event_type
  WHERE r.i < n.n_candidates
), fires AS (
  SELECT event_type, fired AS fire_day,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY fired) AS BIGINT) AS fire_idx,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
           AS n_fired
  FROM rec WHERE fired IS NOT NULL
)
SELECT f.event_type, n.n_candidates, f.n_fired, f.fire_idx,
       CAST(f.fire_day AS BIGINT) AS fire_day
FROM fires f JOIN n ON n.event_type = f.event_type
"""


# ---------------------------------------------------------------------------
# dq_late_arrival_report — out-of-orderness audit for watermark sizing
# ---------------------------------------------------------------------------


def dq_late_arrival_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-ARRIVAL AUDIT — the measurement that SIZES streaming
    watermarks: an event is LATE if something with a larger event
    time already arrived (arrival order = event_id), and its
    lateness is the gap to the running event-time high-water mark —
    exactly the delay a `withWatermark` would have needed to keep
    it. The fixture generates events in timestamp order, so
    out-of-orderness is INJECTED deterministically in-plan (the
    `txt_pii_redact` trick): every 17th event's timestamp is pulled
    back two hours — a late replay of known shape both engines see
    identically, against which the audit's numbers are exactly
    checkable. Per event type: late share (ppm) and the max /
    truncating-mean lateness in microseconds. One ordered window
    per type over arrival order + one aggregate; the lateness sum
    forms in DECIMAL(38,0)/HUGEINT (an int64 sum of microsecond
    gaps overflows at cluster event counts)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.when(
            F.col("event_id") % 17 == 0,
            F.col("ts_us") - F.lit(7_200_000_000),
        )
        .otherwise(F.col("ts_us"))
        .alias("ts_us"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    d = ev.withColumn("hwm", F.max("ts_us").over(w)).withColumn(
        "late_us",
        F.when(
            F.col("hwm").isNotNull() & (F.col("ts_us") < F.col("hwm")),
            F.col("hwm") - F.col("ts_us"),
        ).otherwise(0),
    )
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("late_us") > 0).cast("long")).alias("n_late"),
        F.max("late_us").alias("max_late_us"),
        F.sum(F.expr("CAST(late_us AS DECIMAL(38,0))")).alias("s_late"),
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("n_late").cast("long").alias("n_late"),
        F.expr("(n_late * 1000000) div n").cast("long").alias("late_ppm"),
        F.col("max_late_us").cast("long").alias("max_late_us"),
        F.expr("CAST(s_late div n AS BIGINT)").alias("mean_late_us"),
    )


_DQ_LATE_SQL = """
WITH ev AS (
  SELECT event_type, event_id,
         CASE WHEN event_id % 17 = 0
              THEN epoch_us(ts::TIMESTAMP) - 7200000000
              ELSE epoch_us(ts::TIMESTAMP) END AS ts_us
  FROM events
), d AS (
  SELECT event_type, ts_us,
         MAX(ts_us) OVER (PARTITION BY event_type ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS hwm
  FROM ev
), l AS (
  SELECT event_type,
         CASE WHEN hwm IS NOT NULL AND ts_us < hwm
              THEN hwm - ts_us ELSE 0 END AS late_us
  FROM d
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST((SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS late_ppm,
       CAST(MAX(late_us) AS BIGINT) AS max_late_us,
       CAST(SUM(CAST(late_us AS HUGEINT)) // COUNT(*) AS BIGINT)
         AS mean_late_us
FROM l GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# evt_did_analysis — difference-in-differences readout
# ---------------------------------------------------------------------------


def evt_did_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator
    for when randomization isn't available: treatment (user_id % 2,
    the standing arm assignment of `evt_ab_test`/`evt_cuped_adjust`)
    x period (pre/post the time-axis midpoint) on per-user purchase
    REVENUE; the causal estimate is the treated arm's pre-to-post
    change minus the control arm's, cancelling any shared time
    trend. All four cell means are signed millicents-per-user via
    sign-split truncating division, and the DiD itself is computed
    from the CROSS-MULTIPLIED exact rational ((dS_t)*n_c -
    (dS_c)*n_t) / (n_t*n_c) — never as a difference of
    already-truncated means, so one division bounds the total
    truncation error. Scale shape: one event scan -> per-user
    conditional sums (the only data-sized shuffle) -> a 1-row
    conditional aggregate; every division happens on the 1-row
    frame (the `evt_cuped_adjust` discipline)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        F.when(
            F.col("event_type") == "purchase", cents("value")
        )
        .otherwise(0)
        .alias("rev_c"),
    )
    lim = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid_us"))
    users = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts_us") < F.col("mid_us"), F.col("rev_c"))
                .otherwise(0)
            ).alias("pre_c"),
            F.sum(
                F.when(F.col("ts_us") >= F.col("mid_us"), F.col("rev_c"))
                .otherwise(0)
            ).alias("post_c"),
        )
        .withColumn("arm", (F.col("user_id") % 2 == 0).cast("long"))
    )
    g = users.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("arm") == 1, F.col("pre_c")).otherwise(0)).alias(
            "s_pre_t"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("post_c")).otherwise(0)).alias(
            "s_post_t"
        ),
        F.sum(F.when(F.col("arm") == 0, F.col("pre_c")).otherwise(0)).alias(
            "s_pre_c"
        ),
        F.sum(F.when(F.col("arm") == 0, F.col("post_c")).otherwise(0)).alias(
            "s_post_c"
        ),
    )

    def _sdiv(num: str, den: str) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * 1000) div ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * 1000) div ({den}) AS BIGINT) END"
        )

    dnum = (
        "(CAST(s_post_t - s_pre_t AS DECIMAL(38,0)) * n_c"
        " - CAST(s_post_c - s_pre_c AS DECIMAL(38,0)) * n_t)"
    )
    nn = "(CAST(n_t AS DECIMAL(38,0)) * n_c)"
    return g.select(
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_c").cast("long").alias("n_c"),
        F.expr(_sdiv("CAST(s_pre_t AS DECIMAL(38,0))", "n_t")).alias(
            "mean_pre_t_mc"
        ),
        F.expr(_sdiv("CAST(s_post_t AS DECIMAL(38,0))", "n_t")).alias(
            "mean_post_t_mc"
        ),
        F.expr(_sdiv("CAST(s_pre_c AS DECIMAL(38,0))", "n_c")).alias(
            "mean_pre_c_mc"
        ),
        F.expr(_sdiv("CAST(s_post_c AS DECIMAL(38,0))", "n_c")).alias(
            "mean_post_c_mc"
        ),
        F.expr(_sdiv(dnum, nn)).alias("did_mc"),
    )


def _did_sql() -> str:
    def sdiv(num: str, den: str) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * 1000) // ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * 1000) // ({den}) AS BIGINT) END"
        )

    dnum = (
        "(CAST(s_post_t - s_pre_t AS HUGEINT) * n_c"
        " - CAST(s_post_c - s_pre_c AS HUGEINT) * n_t)"
    )
    nn = "(CAST(n_t AS HUGEINT) * n_c)"
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS rev_c
  FROM events
), lim AS (
  SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid_us FROM ev
), users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts_us < mid_us THEN rev_c ELSE 0 END)
              AS BIGINT) AS pre_c,
         CAST(SUM(CASE WHEN ts_us >= mid_us THEN rev_c ELSE 0 END)
              AS BIGINT) AS post_c,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm
  FROM ev CROSS JOIN lim GROUP BY user_id
), g AS (
  SELECT CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN arm = 1 THEN pre_c ELSE 0 END) AS BIGINT)
           AS s_pre_t,
         CAST(SUM(CASE WHEN arm = 1 THEN post_c ELSE 0 END) AS BIGINT)
           AS s_post_t,
         CAST(SUM(CASE WHEN arm = 0 THEN pre_c ELSE 0 END) AS BIGINT)
           AS s_pre_c,
         CAST(SUM(CASE WHEN arm = 0 THEN post_c ELSE 0 END) AS BIGINT)
           AS s_post_c
  FROM users
)
SELECT CAST(n_t AS BIGINT) AS n_t,
       CAST(n_c AS BIGINT) AS n_c,
       {sdiv("CAST(s_pre_t AS HUGEINT)", "n_t")} AS mean_pre_t_mc,
       {sdiv("CAST(s_post_t AS HUGEINT)", "n_t")} AS mean_post_t_mc,
       {sdiv("CAST(s_pre_c AS HUGEINT)", "n_c")} AS mean_pre_c_mc,
       {sdiv("CAST(s_post_c AS HUGEINT)", "n_c")} AS mean_post_c_mc,
       {sdiv(dnum, nn)} AS did_mc
FROM g
"""


# ---------------------------------------------------------------------------
# evt_att_nn_matching — 1-NN caliper matching on a continuous covariate
# ---------------------------------------------------------------------------

_NN_BLK = 5000  # cents — block width AND caliper (equal by design)


def evt_att_nn_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-NEIGHBOR CALIPER MATCHING ATT — the causal quintet's
    continuous-confounder leg (`evt_att_stratified` subclassifies an
    exact small-int confounder; matching is what you do when the
    confounder — pre-period SPEND in cents — is continuous and
    stratification would need a binning model): each treated user is
    matched to the control with the closest pre-spend within a
    5000-cent caliper, and the ATT is the matched-pair mean of
    post-spend deltas. THE SCALE TRICK is the blocked 1-D NN join:
    treated users explode into their covariate block and both
    neighbors (x div B - 1, x div B, x div B + 1) and candidates
    equi-join on the block — with caliper == block width B, any
    control within the caliper is in one of the three blocks, so the
    blocked argmin EQUALS the global caliper-NN (exactness by
    construction) while the join stays O(pairs-within-3-blocks),
    never treated x control (the join_interval_bin identity on the
    covariate axis). Deterministic match: min over
    struct(|dx|, control_x, control_id); unmatched treated
    (no control within the caliper) are counted, not imputed. Signed
    millicent means via sign-split truncating division. Output is the
    one-row matching ledger (n_treated / n_matched / n_unmatched /
    att_mc / mean |dx|)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        F.when(F.col("event_type") == "purchase", cents("value"))
        .otherwise(0)
        .alias("v"),
    )
    lim = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid"))
    users = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts_us") < F.col("mid"), F.col("v")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ts_us") >= F.col("mid"), F.col("v")).otherwise(
                    0
                )
            ).alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("long"))
        # referenced by BOTH arm branches (t3 / c) — without this the
        # events scan + per-user aggregation re-planned twice (the
        # multi-referenced-frame class). The frame is the compressed
        # per-user grid (user-count sized, never event-sized), so the
        # eager checkpoint is one events pass + a grid materialize.
        .localCheckpoint(eager=True)
    )
    t3 = (
        users.where(F.col("arm") == 1)
        .select(
            F.col("user_id").alias("t_id"),
            F.col("x").alias("tx"),
            F.col("y").alias("ty"),
            F.explode(
                F.expr(
                    f"array(x div {_NN_BLK} - 1, x div {_NN_BLK},"
                    f" x div {_NN_BLK} + 1)"
                )
            ).alias("blk"),
        )
    )
    c = users.where(F.col("arm") == 0).select(
        F.col("user_id").alias("c_id"),
        F.col("x").alias("cx"),
        F.col("y").alias("cy"),
        F.expr(f"x div {_NN_BLK}").alias("blk"),
    )
    cand = (
        t3.join(c, "blk")
        .withColumn("adx", F.expr("abs(tx - cx)"))
        .where(F.col("adx") <= _NN_BLK)
    )
    best = cand.groupBy("t_id").agg(
        F.max("ty").alias("ty"),
        F.min(F.struct("adx", "cx", "c_id", "cy")).alias("b"),
    )
    nt = users.where(F.col("arm") == 1).agg(
        F.count(F.lit(1)).alias("n_treated")
    )
    agg = best.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum(F.expr("ty - b.cy")).alias("s_delta"),
        F.sum(F.expr("b.adx")).alias("s_adx"),
    )
    return (
        nt.crossJoin(F.broadcast(agg))
        .select(
            "n_treated",
            "n_matched",
            (F.col("n_treated") - F.col("n_matched")).alias("n_unmatched"),
            F.expr(
                "CASE WHEN s_delta >= 0"
                " THEN (s_delta * 1000) div n_matched"
                " ELSE -((-s_delta * 1000) div n_matched) END"
            ).alias("att_mc"),
            F.expr("(s_adx * 1000) div n_matched").alias("mean_adx_mc"),
        )
    )


_EVT_ATT_NN_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS us,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS v
  FROM events
), lim AS (
  SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM e
), users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN us < mid THEN v ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN us >= mid THEN v ELSE 0 END) AS BIGINT) AS y,
         CAST(user_id % 2 AS BIGINT) AS arm
  FROM e CROSS JOIN lim GROUP BY user_id
), t3 AS (
  SELECT user_id AS t_id, x AS tx, y AS ty,
         unnest([x // {_NN_BLK} - 1, x // {_NN_BLK}, x // {_NN_BLK} + 1])
           AS blk
  FROM users WHERE arm = 1
), c AS (
  SELECT user_id AS c_id, x AS cx, y AS cy, x // {_NN_BLK} AS blk
  FROM users WHERE arm = 0
), cand AS (
  SELECT t_id, tx, ty, c_id, cx, cy, abs(tx - cx) AS adx
  FROM t3 JOIN c USING (blk)
  WHERE abs(tx - cx) <= {_NN_BLK}
), best AS (
  SELECT t_id, MAX(ty) AS ty,
         min(struct_pack(adx := adx, cx := cx, c_id := c_id, cy := cy)) AS b
  FROM cand GROUP BY t_id
), nt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_treated FROM users WHERE arm = 1
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
         CAST(SUM(ty - b.cy) AS BIGINT) AS s_delta,
         CAST(SUM(b.adx) AS BIGINT) AS s_adx
  FROM best
)
SELECT nt.n_treated, agg.n_matched,
       CAST(nt.n_treated - agg.n_matched AS BIGINT) AS n_unmatched,
       CAST(CASE WHEN agg.s_delta >= 0
            THEN (agg.s_delta * 1000) // agg.n_matched
            ELSE -((-agg.s_delta * 1000) // agg.n_matched) END
         AS BIGINT) AS att_mc,
       CAST((agg.s_adx * 1000) // agg.n_matched AS BIGINT) AS mean_adx_mc
FROM nt CROSS JOIN agg
"""


# ---------------------------------------------------------------------------
# sec_aes_roundtrip — field-level encryption boundary
# ---------------------------------------------------------------------------

_AES_KEY = "0123456789abcdef"
_AES_WRONG_KEY = "fedcba9876543210"


def sec_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIELD-LEVEL ENCRYPTION boundary — Spark's native aes_encrypt /
    aes_decrypt / try_aes_decrypt over the customer name column, the
    encrypt-at-rest column pattern (`sec_col_tokenize` is the
    one-way-digest sibling; this is the reversible one). ECB mode is
    chosen DELIBERATELY: GCM's random IV makes ciphertext
    nondeterministic, which would put engine-local randomness on the
    comparison surface (for real deployments GCM is the right mode —
    the docstring trade-off is determinism-for-testability, the same
    stance as sec_dp_geometric's seeded draw). The oracle cannot run
    AES, so the comparison surface is the ROUNDTRIP INVARIANTS,
    every one closed-form: ciphertext length is the plaintext length
    rounded up to the next 16-byte block (PKCS#7 always pads, so
    exact multiples gain a full block), decrypt(encrypt(x)) == x
    flags 1, try_aes_decrypt under the WRONG key never RECOVERS the
    plaintext (flags 0 — the flag tests recovery, not NULLness: a
    wrong-key ECB decrypt passes PKCS#7 padding by accident ~1/256
    of the time and returns garbage bytes, so an IS NULL test would
    flake at scale while garbage == original never holds), and the
    plaintext md5 checksum pins which value was protected. All
    map-side expression work on one scan; no shuffle at all beyond
    the scan."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    enc = f"aes_encrypt(c_name, '{_AES_KEY}', 'ECB')"
    return c.select(
        "c_custkey",
        F.expr(f"CAST(length({enc}) AS BIGINT)").alias("ct_len"),
        F.expr(
            f"CAST(CAST(aes_decrypt({enc}, '{_AES_KEY}', 'ECB')"
            " AS STRING) = c_name AS BIGINT)"
        ).alias("roundtrip_ok"),
        F.expr(
            "CAST(coalesce("
            f"CAST(try_aes_decrypt({enc}, '{_AES_WRONG_KEY}', 'ECB')"
            " AS STRING) = c_name, false) AS BIGINT)"
        ).alias("wrong_key_recovers"),
        F.expr("md5(c_name)").alias("plain_md5"),
    )


_SEC_AES_SQL = """
SELECT c_custkey,
       CAST((length(c_name) // 16 + 1) * 16 AS BIGINT) AS ct_len,
       CAST(1 AS BIGINT) AS roundtrip_ok,
       CAST(0 AS BIGINT) AS wrong_key_recovers,
       md5(c_name) AS plain_md5
FROM customer
"""


# ---------------------------------------------------------------------------
# sec_bloom_psi — private-set-intersection cardinality from Blooms
# ---------------------------------------------------------------------------

_BLOOM_M = 4096  # bloom width (bits)
_BLOOM_K = 3  # hash count
_LN2_PPM = 693147  # floor(ln 2 * 1e6) — shared literal, both engines


def sec_bloom_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIVATE-SET-INTERSECTION CARDINALITY from Bloom filters — the
    privacy-preserving audience-overlap primitive (two parties learn
    |A intersect B| without exchanging member ids, only m-bit
    sketches): party A = purchasing users, party B = clicking users;
    each inserts members at k = 3 md5-salted positions mod m = 4096,
    and the classic estimator n(t) = -(m/k) ln(1 - t/m) inverts each
    popcount t, with the intersection from inclusion-exclusion
    n_A + n_B - n_OR. EVERYTHING IS EXACT INTEGERS: the popcounts
    and the true intersection are plain distinct counts, and the ln
    is the shared bin()-length + mantissa-table log2 times the
    floor(ln 2 * 1e6) literal — so even the ESTIMATES hash-compare
    across engines (the `agg_distinct_approx` exact-twin discipline,
    except here the estimator itself is reproducible, not just
    flagged). Scale shape: one event scan -> per-party member sets
    -> position sets bounded by m bits; every join after the scan is
    over <= m rows."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    # party membership must be SELF-NORMALIZING (a raw has-event-type
    # predicate makes A == B == all users at any SF — every fixture
    # user has every type): A = users who purchase more than they
    # click, B = users who click more than they view — scale-free
    # overlapping cohorts from one per-user rollup
    prof = (
        ev.groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "np"
            ),
            F.sum((F.col("event_type") == "click").cast("long")).alias("nc"),
            F.sum((F.col("event_type") == "view").cast("long")).alias("nv"),
        )
        # referenced SIX times (two member predicates x pos/exact
        # branches) — each re-planned the events scan + rollup (6
        # scans / 18 exchanges). The frame is the compressed per-user
        # grid, so one events pass materializes it for all consumers.
        .localCheckpoint(eager=True)
    )
    members = {
        "a": prof.where("np > nc"),
        "b": prof.where("nc > nv"),
    }
    pos = {}
    for tag, df in members.items():
        pos[tag] = (
            df.select(F.col("user_id").cast("string").alias("u"))
            .distinct()
            .select(
                F.explode(
                    F.expr(
                        f"transform(sequence(0, {_BLOOM_K - 1}), s ->"
                        " CAST(conv(substring(md5(concat(u, ':',"
                        " CAST(s AS STRING))), 1, 12), 16, 10) AS BIGINT)"
                        f" % {_BLOOM_M})"
                    )
                ).alias("p")
            )
            .distinct()
            # <= m = 4096 rows, referenced twice (own popcount + the
            # OR union): small-slate eager checkpoint.
            .localCheckpoint(eager=True)
        )
    t_a = pos["a"].agg(F.count(F.lit(1)).cast("long").alias("t_a"))
    t_b = pos["b"].agg(F.count(F.lit(1)).cast("long").alias("t_b"))
    t_or = (
        pos["a"]
        .union(pos["b"])
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("t_or"))
    )
    exact = (
        members["a"]
        .select("user_id")
        .distinct()
        .join(members["b"].select("user_id").distinct(), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    def est(t: str) -> str:
        # n(t) = (m/k) * ln(m / (m - t)), in exact integer x1000:
        # ln x = log2u(x) [micro-log2] * LN2_PPM [ppm] -> 1e-12 scale
        return (
            f"({_BLOOM_M} * ({_log2u(str(_BLOOM_M))} - {_log2u(f'greatest({_BLOOM_M} - {t}, 1)')})"
            f" * CAST({_LN2_PPM} AS DECIMAL(38,0)))"
            f" div (CAST({_BLOOM_K} AS DECIMAL(38,0)) * 1000000000)"
        )

    one = (
        t_a.crossJoin(F.broadcast(t_b))
        .crossJoin(F.broadcast(t_or))
        .crossJoin(F.broadcast(exact))
    )
    return one.select(
        "t_a",
        "t_b",
        "t_or",
        F.expr(f"CAST({est('t_a')} AS BIGINT)").alias("est_a_x1000"),
        F.expr(f"CAST({est('t_b')} AS BIGINT)").alias("est_b_x1000"),
        F.expr(f"CAST({est('t_or')} AS BIGINT)").alias("est_or_x1000"),
        F.expr(
            f"CAST({est('t_a')} + {est('t_b')} - {est('t_or')} AS BIGINT)"
        ).alias("est_inter_x1000"),
        "exact_inter",
    )


def _bloom_psi_sql() -> str:
    from .textops import _LOG2U_DUCK

    def log2u(x: str) -> str:
        e = f"CAST(length(bin({x})) - 1 AS BIGINT)"
        m = f"(({x}) * 64) // (CAST(1 AS BIGINT) << ({e}))"
        return f"({e} * 1000000 + {_LOG2U_DUCK}[CAST({m} - 63 AS INT)])"

    def est(t: str) -> str:
        return (
            f"({_BLOOM_M} * ({log2u(str(_BLOOM_M))} - {log2u(f'GREATEST({_BLOOM_M} - {t}, 1)')})"
            f" * CAST({_LN2_PPM} AS HUGEINT))"
            f" // (CAST({_BLOOM_K} AS HUGEINT) * 1000000000)"
        )

    def posq(pred: str) -> str:
        return f"""
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
           || ':' || CAST(s.s AS VARCHAR)), 1, 12)) AS BIGINT)
           % {_BLOOM_M} AS p
  FROM (SELECT user_id FROM prof WHERE {pred}) u
  CROSS JOIN (SELECT unnest(range(0, {_BLOOM_K})) AS s) s"""

    return f"""
WITH prof AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nc,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nv
  FROM events GROUP BY user_id
), pa AS ({posq("np > nc")}
), pb AS ({posq("nc > nv")}
), t AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pa) AS t_a,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM pb) AS t_b,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM
            (SELECT p FROM pa UNION SELECT p FROM pb)) AS t_or,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM
            (SELECT user_id FROM prof WHERE np > nc
             INTERSECT
             SELECT user_id FROM prof WHERE nc > nv)) AS exact_inter
)
SELECT t_a, t_b, t_or,
       CAST({est("t_a")} AS BIGINT) AS est_a_x1000,
       CAST({est("t_b")} AS BIGINT) AS est_b_x1000,
       CAST({est("t_or")} AS BIGINT) AS est_or_x1000,
       CAST({est("t_a")} + {est("t_b")} - {est("t_or")} AS BIGINT)
         AS est_inter_x1000,
       exact_inter
FROM t
"""


# ---------------------------------------------------------------------------
# profile_psi_bits — Population Stability Index in exact micro-bits
# ---------------------------------------------------------------------------


def _log2u(x: str) -> str:
    """floor(log2({x}) * 1e6) for a positive int64 expression, exact:
    exponent from the bin()-string length, mantissa from the shared
    64-entry Python-precomputed table (the txt_doc_perplexity
    decomposition — never libm inside a hash-compared query)."""
    from .textops import _LOG2U_SPARK

    e = f"CAST(length(bin({x})) - 1 AS BIGINT)"
    m = f"(({x}) * 64) div shiftleft(CAST(1 AS BIGINT), {e})"
    return f"({e} * 1000000 + element_at({_LOG2U_SPARK}, CAST({m} - 63 AS INT)))"


def profile_psi_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX — the drift metric every ML
    monitoring stack reports (banking's standard go/no-go for model
    retraining): PSI = sum over bins of (actual_share -
    expected_share) * log(actual_share / expected_share), here in
    exact integer MICRO-BITS (log base 2 — a fixed log2(e) factor
    off the nats convention, monotone in it, and hash-identical
    across engines). Bins are the event types; expected = early-
    epoch share, actual = late-epoch share (the `profile_drift`
    epoch split at the in-plan time-axis midpoint), both
    Laplace-smoothed ((cnt+1)/(tot+bins)) so an absent bin never
    hits log(0). Each bin's term is >= 0 by construction (both
    factors share a sign; the floor-log2 is weakly monotone). Scale
    shape: one event scan -> per-(type, epoch) counts; everything
    after is type-grid expressions + one 1-row broadcast of the
    epoch totals and the PSI total."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts_us")
    lim = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid_us"))
    # the (type, epoch) count grid is bins-sized but its lineage is
    # corpus-sized and three consumers read it (totals, shares, PSI
    # total) — flatten once per call (the ml_bradley_terry grid-
    # checkpoint discipline)
    cnt = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("ts_us") < F.col("mid_us"), 1).otherwise(0)
            ).alias("cnt_early"),
            F.sum(
                F.when(F.col("ts_us") >= F.col("mid_us"), 1).otherwise(0)
            ).alias("cnt_late"),
        )
        .localCheckpoint(eager=True)
    )
    tot = cnt.agg(
        F.sum("cnt_early").alias("tot_early"),
        F.sum("cnt_late").alias("tot_late"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    shares = cnt.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("cnt_early").cast("long").alias("cnt_early"),
        F.col("cnt_late").cast("long").alias("cnt_late"),
        # greatest(..., 1): the Laplace-smoothed ppm share floors to 0
        # once an epoch total exceeds ~1e6*(cnt+1) (possible at large
        # SF for a bin absent from one epoch), and _log2u(0) would
        # index the log table at -63 — a garbage term (r11 ADVICE).
        # Same guard sec_bloom_psi uses (greatest(m - t, 1)).
        F.expr(
            "greatest(((cnt_early + 1) * 1000000)"
            " div (tot_early + n_bins), CAST(1 AS BIGINT))"
        ).alias("e_ppm"),
        F.expr(
            "greatest(((cnt_late + 1) * 1000000)"
            " div (tot_late + n_bins), CAST(1 AS BIGINT))"
        ).alias("a_ppm"),
    )
    term = (
        f"CAST((a_ppm - e_ppm) * ({_log2u('a_ppm')} - {_log2u('e_ppm')})"
        " div 1000000 AS BIGINT)"
    )
    perbin = shares.withColumn("psi_term_ubits", F.expr(term))
    psi = perbin.agg(
        F.sum("psi_term_ubits").cast("long").alias("psi_total_ubits")
    )
    return (
        perbin.crossJoin(F.broadcast(psi))
        .select(
            "event_type",
            "cnt_early",
            "cnt_late",
            "e_ppm",
            "a_ppm",
            "psi_term_ubits",
            "psi_total_ubits",
        )
        .orderBy("event_type")
    )


def _psi_sql() -> str:
    from .textops import _LOG2U_DUCK

    def log2u(x: str) -> str:
        e = f"CAST(length(bin({x})) - 1 AS BIGINT)"
        m = f"(({x}) * 64) // (CAST(1 AS BIGINT) << ({e}))"
        return f"({e} * 1000000 + {_LOG2U_DUCK}[CAST({m} - 63 AS INT)])"

    term = (
        f"CAST((a_ppm - e_ppm) * ({log2u('a_ppm')} - {log2u('e_ppm')})"
        " // 1000000 AS BIGINT)"
    )
    return f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts::TIMESTAMP) AS ts_us FROM events
), lim AS (
  SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid_us FROM ev
), cnt AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN ts_us < mid_us THEN 1 ELSE 0 END)
              AS BIGINT) AS cnt_early,
         CAST(SUM(CASE WHEN ts_us >= mid_us THEN 1 ELSE 0 END)
              AS BIGINT) AS cnt_late
  FROM ev CROSS JOIN lim GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(cnt_early) AS BIGINT) AS tot_early,
         CAST(SUM(cnt_late) AS BIGINT) AS tot_late,
         CAST(COUNT(*) AS BIGINT) AS n_bins
  FROM cnt
), shares AS (
  SELECT event_type, cnt_early, cnt_late,
         GREATEST(((cnt_early + 1) * 1000000)
                  // (tot_early + n_bins), 1) AS e_ppm,
         GREATEST(((cnt_late + 1) * 1000000)
                  // (tot_late + n_bins), 1) AS a_ppm
  FROM cnt CROSS JOIN tot
), perbin AS (
  SELECT *, {term} AS psi_term_ubits FROM shares
)
SELECT event_type, cnt_early, cnt_late, e_ppm, a_ppm, psi_term_ubits,
       CAST((SELECT SUM(psi_term_ubits) FROM perbin) AS BIGINT)
         AS psi_total_ubits
FROM perbin
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# evt_uplift_qini — uplift-by-decile readout with the Qini curve
# ---------------------------------------------------------------------------

_QINI_DECILES = 10


def evt_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPLIFT-MODEL QINI CURVE — the readout that decides whether a
    targeting model is worth deploying: rank users by a model score
    (here: PRE-period activity, the natural engagement prior), cut
    the ranking into deciles, and report per-decile treatment uplift
    (treated minus control POST-period conversion) plus the running
    Qini numerator — the cumulative extra conversions the treatment
    bought among the targeted top-k, control-normalized. Complements
    the existing causal ladder (`evt_ab_test` -> `evt_cuped_adjust`
    -> `evt_did_analysis` -> `evt_att_*`): those estimate ONE
    effect; this ranks WHO to treat.

    Determinism / scale shape: the decile cut is NOT a global
    ntile() over raw users (that would single-partition-shuffle the
    user table). Instead the score distribution compresses to its
    VALUE GRID (one row per distinct score — bounded by max per-user
    activity, never user-count-sized), a grid-window running sum
    yields each value's global rank offset, and each user's position
    is offset + row_number within its score partition (partitioned
    window, tie-broken by user_id) — the compressed-grid ntile both
    engines reproduce bit-for-bit. All rates are exact integer ppm
    via sign-split truncating division (the `evt_cuped_adjust`
    discipline). One event scan, one user-level shuffle, grid-sized
    windows everywhere else."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    lim = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid_us"))
    users = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts_us") < F.col("mid_us"), 1).otherwise(0)
            ).alias("score"),
            F.sum(
                F.when(F.col("ts_us") < F.col("mid_us"), F.col("is_p")).otherwise(0)
            ).alias("pre_p"),
            F.sum(
                F.when(F.col("ts_us") >= F.col("mid_us"), F.col("is_p")).otherwise(0)
            ).alias("post_p"),
        )
        # conversion = the user ACCELERATED (more post- than pre-period
        # purchases) — self-normalizing at any data scale, so the
        # readout never saturates at 0%/100% the way a fixed count
        # threshold would as per-user volume grows with the corpus
        .withColumn("conv", (F.col("post_p") > F.col("pre_p")).cast("long"))
        .withColumn("treated", (F.col("user_id") % 2 == 0).cast("long"))
        # referenced THREE times (score grid / n_tot / decile cut) —
        # each re-planned the events scan + rollup (6 scans per
        # call). Compressed per-user grid: one events pass
        # materializes it for all three consumers.
        .localCheckpoint(eager=True)
    )
    # score-value grid: global rank offset of each distinct score
    # (higher score ranks first); the frame is the DISTINCT-score
    # grid, not users — bounded by max per-user event count
    grid = users.groupBy("score").agg(F.count(F.lit(1)).alias("cnt"))
    gw = (
        W.orderBy(F.desc("score"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    grid = grid.select(
        "score", F.coalesce(F.sum("cnt").over(gw), F.lit(0)).alias("rk_off")
    )
    n_tot = users.agg(F.count(F.lit(1)).alias("n_users"))
    rnw = W.partitionBy("score").orderBy("user_id")
    dec = (
        users.withColumn("rn", F.row_number().over(rnw))
        .join(F.broadcast(grid), "score")
        .crossJoin(F.broadcast(n_tot))
        .withColumn(
            "decile",
            F.expr(
                f"((rk_off + rn - 1) * {_QINI_DECILES}) div n_users + 1"
            ),
        )
        .groupBy("decile")
        .agg(
            F.sum("treated").cast("long").alias("n_t"),
            F.sum(F.expr("1 - treated")).cast("long").alias("n_c"),
            F.sum(F.expr("treated * conv")).cast("long").alias("conv_t"),
            F.sum(F.expr("(1 - treated) * conv")).cast("long").alias("conv_c"),
        )
    )
    cw = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = (
        dec.withColumn("cum_n_t", F.sum("n_t").over(cw))
        .withColumn("cum_n_c", F.sum("n_c").over(cw))
        .withColumn("cum_conv_t", F.sum("conv_t").over(cw))
        .withColumn("cum_conv_c", F.sum("conv_c").over(cw))
    )

    def _sdiv(num: str, den: str, scale: int = 1000000) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * {scale}) div ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * {scale}) div ({den}) AS BIGINT) END"
        )

    up = "(CAST(conv_t AS DECIMAL(38,0)) * n_c - CAST(conv_c AS DECIMAL(38,0)) * n_t)"
    nn = "(CAST(n_t AS DECIMAL(38,0)) * n_c)"
    cup = (
        "(CAST(cum_conv_t AS DECIMAL(38,0)) * cum_n_c"
        " - CAST(cum_conv_c AS DECIMAL(38,0)) * cum_n_t)"
    )
    cnn = "(CAST(cum_n_t AS DECIMAL(38,0)) * cum_n_c)"
    return cum.select(
        F.col("decile").cast("long").alias("decile"),
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.expr(
            f"CASE WHEN {nn} = 0 THEN NULL ELSE {_sdiv(up, nn)} END"
        ).alias("uplift_ppm"),
        F.expr(
            f"CASE WHEN {cnn} = 0 THEN NULL ELSE {_sdiv(cup, cnn)} END"
        ).alias("cum_uplift_ppm"),
        F.expr(
            f"CASE WHEN cum_n_c = 0 THEN NULL"
            f" ELSE {_sdiv(cup, 'cum_n_c', 1000)} END"
        ).alias("qini_x1000"),
    )


def _qini_sql() -> str:
    def sdiv(num: str, den: str, scale: int = 1000000) -> str:
        return (
            f"CASE WHEN ({num}) >= 0"
            f" THEN CAST((({num}) * {scale}) // ({den}) AS BIGINT)"
            f" ELSE -CAST(((-({num})) * {scale}) // ({den}) AS BIGINT) END"
        )

    up = "(CAST(conv_t AS HUGEINT) * n_c - CAST(conv_c AS HUGEINT) * n_t)"
    nn = "(CAST(n_t AS HUGEINT) * n_c)"
    cup = (
        "(CAST(cum_conv_t AS HUGEINT) * cum_n_c"
        " - CAST(cum_conv_c AS HUGEINT) * cum_n_t)"
    )
    cnn = "(CAST(cum_n_t AS HUGEINT) * cum_n_c)"
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
), lim AS (
  SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid_us FROM ev
), users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts_us < mid_us THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
         CASE WHEN SUM(CASE WHEN ts_us >= mid_us THEN is_p ELSE 0 END)
                   > SUM(CASE WHEN ts_us < mid_us THEN is_p ELSE 0 END)
              THEN 1 ELSE 0 END AS conv,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated
  FROM ev CROSS JOIN lim GROUP BY user_id
), grid AS (
  SELECT score,
         CAST(COALESCE(SUM(cnt) OVER (
           ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS rk_off
  FROM (SELECT score, COUNT(*) AS cnt FROM users GROUP BY score)
), n_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM users
), pos AS (
  SELECT u.treated, u.conv,
         ((g.rk_off + row_number() OVER (
             PARTITION BY u.score ORDER BY u.user_id) - 1)
          * {_QINI_DECILES}) // n.n_users + 1 AS decile
  FROM users u JOIN grid g ON g.score = u.score CROSS JOIN n_tot n
), dec AS (
  SELECT decile,
         CAST(SUM(treated) AS BIGINT) AS n_t,
         CAST(SUM(1 - treated) AS BIGINT) AS n_c,
         CAST(SUM(treated * conv) AS BIGINT) AS conv_t,
         CAST(SUM((1 - treated) * conv) AS BIGINT) AS conv_c
  FROM pos GROUP BY decile
), cum AS (
  SELECT *,
         CAST(SUM(n_t) OVER w AS BIGINT) AS cum_n_t,
         CAST(SUM(n_c) OVER w AS BIGINT) AS cum_n_c,
         CAST(SUM(conv_t) OVER w AS BIGINT) AS cum_conv_t,
         CAST(SUM(conv_c) OVER w AS BIGINT) AS cum_conv_c
  FROM dec
  WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT CAST(decile AS BIGINT) AS decile, n_t, n_c, conv_t, conv_c,
       CASE WHEN {nn} = 0 THEN NULL ELSE {sdiv(up, nn)} END AS uplift_ppm,
       CASE WHEN {cnn} = 0 THEN NULL
            ELSE {sdiv(cup, cnn)} END AS cum_uplift_ppm,
       CASE WHEN cum_n_c = 0 THEN NULL
            ELSE {sdiv(cup, "cum_n_c", 1000)} END AS qini_x1000
FROM cum
"""


QUERIES = {
    "sec_bloom_psi": QuerySpec(
        sec_bloom_psi,
        _bloom_psi_sql(),
        ("security", "privacy", "bloom", "psi"),
    ),
    "profile_psi_bits": QuerySpec(
        profile_psi_bits,
        _psi_sql(),
        ("profile", "drift", "psi", "monitoring"),
    ),
    "evt_uplift_qini": QuerySpec(
        evt_uplift_qini,
        _qini_sql(),
        ("events", "causal", "uplift", "qini"),
    ),
    "evt_att_nn_matching": QuerySpec(
        evt_att_nn_matching,
        _EVT_ATT_NN_SQL,
        ("events", "causal", "matching"),
    ),
    "sec_aes_roundtrip": QuerySpec(
        sec_aes_roundtrip,
        _SEC_AES_SQL,
        ("security", "encryption", "crypto"),
    ),
    "sec_rtbf_purge_audit": QuerySpec(
        sec_rtbf_purge_audit,
        _SEC_RTBF_SQL,
        ("security", "gdpr", "deletion"),
    ),
    "evt_did_analysis": QuerySpec(
        evt_did_analysis,
        _did_sql(),
        ("experimentation", "causal", "did"),
    ),
    "dq_late_arrival_report": QuerySpec(
        dq_late_arrival_report,
        _DQ_LATE_SQL,
        ("quality", "watermark", "lateness"),
    ),
    "evt_alert_debounce": QuerySpec(
        evt_alert_debounce,
        _EVT_DEBOUNCE_SQL,
        ("events", "alerting", "debounce"),
    ),
    "dq_duplicate_payments": QuerySpec(
        dq_duplicate_payments,
        _DQ_DUP_PAY_SQL,
        ("quality", "finance", "duplicates"),
    ),
    "evt_att_stratified": QuerySpec(
        evt_att_stratified,
        _att_sql(),
        ("experimentation", "causal", "stratification"),
    ),
    "ml_permutation_test": QuerySpec(
        ml_permutation_test,
        _perm_sql(),
        ("ml", "significance", "permutation"),
    ),
    "evt_attribution_shapley": QuerySpec(
        evt_attribution_shapley,
        _shapley_sql(),
        ("events", "attribution", "shapley"),
    ),
    "dq_rules_engine": QuerySpec(
        dq_rules_engine,
        _rules_engine_sql(),
        ("quality", "alerting", "rules"),
    ),
    "dq_gap_inventory": QuerySpec(
        dq_gap_inventory,
        _DQ_GAP_INVENTORY_SQL,
        ("quality", "completeness", "gaps"),
    ),
    "sec_k_anonymity": QuerySpec(
        sec_k_anonymity,
        _SEC_K_ANONYMITY_SQL,
        ("security", "privacy", "k-anonymity"),
    ),
    "evt_cuped_adjust": QuerySpec(
        evt_cuped_adjust,
        _cuped_sql(),
        ("events", "ab", "cuped", "variance-reduction"),
    ),
    "sec_t_closeness": QuerySpec(
        sec_t_closeness,
        _SEC_T_CLOSENESS_SQL,
        ("security", "privacy", "t-closeness"),
    ),
    "dq_order_totals_recon": QuerySpec(
        dq_order_totals_recon,
        _DQ_ORDER_TOTALS_RECON_SQL,
        ("quality", "reconciliation", "audit"),
    ),
    "sec_row_mask_policy": QuerySpec(
        sec_row_mask_policy,
        _SEC_ROW_MASK_POLICY_SQL,
        ("security", "governance", "mask"),
    ),
    "dq_fk_orphans": QuerySpec(
        dq_fk_orphans, _fk_orphans_sql(), ("quality", "integrity")
    ),
    "profile_describe_stats": QuerySpec(
        profile_describe_stats,
        _describe_stats_sql(),
        ("profile", "describe"),
    ),
    "sec_l_diversity": QuerySpec(
        sec_l_diversity,
        _SEC_L_DIVERSITY_SQL,
        ("security", "privacy", "l-diversity"),
    ),
    "dq_freshness_sla": QuerySpec(
        dq_freshness_sla,
        _DQ_FRESHNESS_SLA_SQL,
        ("quality", "freshness", "sla"),
    ),
    "sec_col_tokenize": QuerySpec(
        sec_col_tokenize,
        _SEC_COL_TOKENIZE_SQL,
        ("security", "governance", "tokenize"),
    ),
    "sec_dp_geometric": QuerySpec(
        sec_dp_geometric,
        _sec_dp_geometric_sql(),
        ("security", "privacy", "differential-privacy"),
    ),
    "evt_ab_srm_check": QuerySpec(
        evt_ab_srm_check, _EVT_AB_SRM_CHECK_SQL, ("events", "ab", "srm")
    ),
    "dq_benford_check": QuerySpec(
        dq_benford_check, _benford_sql(), ("quality", "benford", "fraud")
    ),
    "dq_constraint_check": QuerySpec(
        dq_constraint_check, _DQ_CONSTRAINT_CHECK_SQL, ("quality",)
    ),
    "diff_snapshots": QuerySpec(
        diff_snapshots, _diff_snapshots_sql(), ("quality", "audit")
    ),
    "evt_ab_test": QuerySpec(
        evt_ab_test, _EVT_AB_TEST_SQL, ("quality", "experiment")
    ),
    "profile_cardinality_report": QuerySpec(
        profile_cardinality_report,
        _profile_cardinality_sql(),
        ("quality", "profile"),
    ),
}
