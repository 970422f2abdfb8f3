"""Enrichment algebra — the reference's founded-year resolution and
scored-ranking logic (SURVEY.md §2.2/§2.4/§2.8, P2/P3) as pure column
expressions.

The reference computes, per firm, four per-source year lists and then
resolves them by (1) set-intersection consensus
(founded_year.py:203-217), (2) weighted voting with google-weight 10 /
threshold 11 (founded_year.py:231-247), (3) priority coalesce in
source-reliability order (founded_year.py:250-266). Here the "four
sources" are recast onto the star schema (order years per
order-priority class; event days per user) so the driver's DuckDB
oracle can check the exact same algebra at sf=0.01.

Everything is built-in array HOFs / conditional aggregates — no Python
UDFs, fully codegen'd, and shapes that scale: one shuffle per groupBy,
array work is per-row and bounded.

DuckDB-literal note: float literals in the oracles are written
``::DOUBLE`` because DuckDB types bare ``1.0`` as DECIMAL, which would
break value-hash comparison against Spark's double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.resolution import (
    consensus_min,
    priority_coalesce,
    rank_label,
    rank_points,
)
from ..registry import QuerySpec
from ..sources.tables import load_table

# Anchor/suppression regexes — semantics of founded_year.py:16-23
# (YEAR_RE, anchor words, address/date keyword suppression). Same
# pattern source for Spark (Java regex) and DuckDB (RE2); only
# constructs with identical semantics in both are used.
YEAR_RE = r"\b(?:18|19|20)\d{2}\b"
ANCHOR_RE = r"(?i)\b(?:founded|established|since|est\.?|copyright)\b"
ADDR_RE = r"(?i)\b(?:street|suite|road|avenue|po box|level)\b"
DATE_RE = (
    r"(?i)\b(?:monday|tuesday|wednesday|thursday|friday|saturday|sunday|"
    r"january|february|march|april|may|june|july|august|september|october|"
    r"november|december)\b"
)

_PRIORITY_BUCKET_SQL = """
CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
     WHEN o_orderpriority = '2-HIGH' THEN 'high'
     WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
     ELSE 'other' END
"""


def _method_col():
    return (
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent")
        .when(F.col("o_orderpriority") == "2-HIGH", "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("other")
    )


def _per_method_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → per-customer year SET per priority class — the shared
    'four per-source year lists' base of agg_consensus and
    enrich_year_cascade (one shuffle builds all four)."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate").cast("long")
    base = o.select(
        F.col("o_custkey").alias("custkey"), _method_col().alias("m"), y.alias("y")
    )
    return base.groupBy("custkey").agg(
        F.collect_set(F.when(F.col("m") == "urgent", F.col("y"))).alias("urgent"),
        F.collect_set(F.when(F.col("m") == "high", F.col("y"))).alias("high"),
        F.collect_set(F.when(F.col("m") == "medium", F.col("y"))).alias("medium"),
        F.collect_set(F.when(F.col("m") == "other", F.col("y"))).alias("other"),
    )


# ---------------------------------------------------------------------------
# str_year_extract — YEAR_RE.findall + range filter (founded_year.py:16,83,91)
# ---------------------------------------------------------------------------

def str_year_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract all 4-digit years 18xx-20xx from text, keep 1800..2024,
    in match order. Text synthesized deterministically from orders so
    the oracle sees the same input. regexp_extract_all is JVM-side."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate").cast("long")
    text = F.concat(
        F.lit("Established in "),
        y.cast("string"),
        F.lit(" (see also 1750 and "),
        (y + 1).cast("string"),
        F.lit(")"),
    )
    arr = F.regexp_extract_all(text, F.lit(YEAR_RE), 0)
    years = F.filter(
        F.transform(arr, lambda x: x.cast("long")),
        lambda v: v.between(1800, 2024),
    )
    return o.select(
        "o_orderkey",
        F.array_join(F.transform(years, lambda v: v.cast("string")), ",").alias(
            "years_csv"
        ),
        F.size(years).cast("long").alias("n_years"),
        F.array_min(years).alias("min_year"),
    )


_STR_YEAR_EXTRACT_SQL = rf"""
WITH texts AS (
  SELECT o_orderkey,
         'Established in ' || CAST(CAST(year(o_orderdate) AS BIGINT) AS VARCHAR)
           || ' (see also 1750 and '
           || CAST(CAST(year(o_orderdate) AS BIGINT) + 1 AS VARCHAR) || ')' AS text
  FROM orders
), extracted AS (
  SELECT o_orderkey,
         list_filter(
           list_transform(regexp_extract_all(text, '{YEAR_RE}'),
                          x -> CAST(x AS BIGINT)),
           v -> v BETWEEN 1800 AND 2024) AS years
  FROM texts
)
SELECT o_orderkey,
       array_to_string(list_transform(years, v -> CAST(v AS VARCHAR)), ',') AS years_csv,
       CAST(len(years) AS BIGINT) AS n_years,
       list_min(years) AS min_year
FROM extracted
"""


# ---------------------------------------------------------------------------
# flt_kw_suppress + str_anchor_detect (founded_year.py:17-23,87-95)
# ---------------------------------------------------------------------------

def flt_kw_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """check_Anchors semantics: years count only when an anchor word is
    present AND no address/date keyword suppresses the snippet.
    Five deterministic text shapes are synthesized per customer
    (anchored, address-suppressed, double-anchored, date-suppressed,
    yearless) so every branch is exercised."""
    c = load_table(spark, sf_dir, "customer")
    yr = (1900 + F.col("c_custkey") % 120).cast("long")
    yr2 = (1850 + F.col("c_custkey") % 170).cast("long")
    text = (
        F.when(
            F.col("c_custkey") % 5 == 0,
            F.concat(F.lit("Founded in "), yr.cast("string")),
        )
        .when(
            F.col("c_custkey") % 5 == 1,
            F.concat(yr.cast("string"), F.lit(" Example Street, Suite 200")),
        )
        .when(
            F.col("c_custkey") % 5 == 2,
            F.concat(
                F.lit("Copyright "),
                yr.cast("string"),
                F.lit(" All rights reserved. Est. "),
                yr2.cast("string"),
            ),
        )
        .when(
            F.col("c_custkey") % 5 == 3,
            F.concat(
                F.lit("Monday, March "),
                yr.cast("string"),
                F.lit(" — since "),
                yr2.cast("string"),
            ),
        )
        .otherwise(F.lit("no year in this snippet"))
    )
    has_anchor = text.rlike(ANCHOR_RE)
    suppressed = text.rlike(ADDR_RE) | text.rlike(DATE_RE)
    raw_years = F.filter(
        F.transform(
            F.regexp_extract_all(text, F.lit(YEAR_RE), 0), lambda x: x.cast("long")
        ),
        lambda v: v.between(1800, 2024),
    )
    years = F.when(suppressed | ~has_anchor, F.array().cast("array<bigint>")).otherwise(
        raw_years
    )
    return c.select(
        "c_custkey",
        text.alias("text"),
        has_anchor.alias("has_anchor"),
        suppressed.alias("suppressed"),
        F.array_join(F.transform(years, lambda v: v.cast("string")), ",").alias(
            "years_csv"
        ),
        F.size(years).cast("long").alias("n_years"),
    )


_FLT_KW_SUPPRESS_SQL = rf"""
WITH texts AS (
  SELECT c_custkey,
         CASE
           WHEN c_custkey % 5 = 0 THEN 'Founded in ' || CAST(1900 + c_custkey % 120 AS VARCHAR)
           WHEN c_custkey % 5 = 1 THEN CAST(1900 + c_custkey % 120 AS VARCHAR) || ' Example Street, Suite 200'
           WHEN c_custkey % 5 = 2 THEN 'Copyright ' || CAST(1900 + c_custkey % 120 AS VARCHAR)
                || ' All rights reserved. Est. ' || CAST(1850 + c_custkey % 170 AS VARCHAR)
           WHEN c_custkey % 5 = 3 THEN 'Monday, March ' || CAST(1900 + c_custkey % 120 AS VARCHAR)
                || ' — since ' || CAST(1850 + c_custkey % 170 AS VARCHAR)
           ELSE 'no year in this snippet'
         END AS text
  FROM customer
), flags AS (
  SELECT c_custkey, text,
         regexp_matches(text, '{ANCHOR_RE}') AS has_anchor,
         (regexp_matches(text, '{ADDR_RE}') OR regexp_matches(text, '{DATE_RE}')) AS suppressed,
         list_filter(list_transform(regexp_extract_all(text, '{YEAR_RE}'),
                                    x -> CAST(x AS BIGINT)),
                     v -> v BETWEEN 1800 AND 2024) AS raw_years
  FROM texts
)
SELECT c_custkey, text, has_anchor, suppressed,
       CASE WHEN suppressed OR NOT has_anchor THEN ''
            ELSE array_to_string(list_transform(raw_years, v -> CAST(v AS VARCHAR)), ',')
       END AS years_csv,
       CASE WHEN suppressed OR NOT has_anchor THEN 0
            ELSE CAST(len(raw_years) AS BIGINT) END AS n_years
FROM flags
"""


# ---------------------------------------------------------------------------
# agg_consensus — intersect non-empty per-method sets, min (fy.py:203-217)
# ---------------------------------------------------------------------------

def agg_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer: four per-method year sets (order years by priority
    class); consensus = min of the intersection of all NON-EMPTY sets,
    null if the intersection is empty. Implemented with array HOFs —
    collect_set + fold(array_intersect) — exactly the reference's set
    algebra, one shuffle."""
    per_method = _per_method_sets(spark, sf_dir)
    methods = [F.col(c) for c in ("urgent", "high", "medium", "other")]
    non_empty = F.filter(F.array(*methods), lambda a: F.size(a) > 0)
    return per_method.select(
        "custkey",
        F.size(non_empty).cast("long").alias("n_methods"),
        consensus_min(methods).alias("consensus_year"),
    )


_AGG_CONSENSUS_SQL = f"""
WITH yrs AS (
  SELECT o_custkey AS custkey, {_PRIORITY_BUCKET_SQL} AS m,
         CAST(year(o_orderdate) AS BIGINT) AS y
  FROM orders GROUP BY ALL
), mc AS (
  SELECT custkey, CAST(COUNT(DISTINCT m) AS BIGINT) AS n_methods FROM yrs GROUP BY custkey
), yc AS (
  SELECT custkey, y, COUNT(DISTINCT m) AS cm FROM yrs GROUP BY custkey, y
)
SELECT mc.custkey, mc.n_methods,
       MIN(CASE WHEN yc.cm = mc.n_methods THEN yc.y END) AS consensus_year
FROM mc JOIN yc ON mc.custkey = yc.custkey
GROUP BY mc.custkey, mc.n_methods
"""


# ---------------------------------------------------------------------------
# agg_weighted_vote — google-weight 10, threshold >= 11 (fy.py:231-247)
# ---------------------------------------------------------------------------

def agg_weighted_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: weighted day votes (purchase events weigh 10, all
    others 1 — the reference's google=10 rule); candidate days need
    total weight >= 11 (i.e. a purchase plus at least one
    corroborating event, or 11 plain events); answer = min candidate
    day (epoch day — timezone-free). Null when nothing qualifies."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr("ts_ns div 86400000000000").alias("d")
    w = F.when(F.col("event_type") == "purchase", F.lit(10)).otherwise(F.lit(1))
    votes = (
        e.select("user_id", day, w.alias("w"))
        .groupBy("user_id", "d")
        .agg(F.sum("w").alias("wsum"))
    )
    qual = (
        votes.where(F.col("wsum") >= 11)
        .groupBy("user_id")
        .agg(F.min("d").alias("vote_day"))
    )
    users = e.select("user_id").distinct()
    return users.join(qual, "user_id", "left").select("user_id", "vote_day")


_AGG_WEIGHTED_VOTE_SQL = """
WITH votes AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) // 86400000000 AS d,
         SUM(CASE WHEN event_type = 'purchase' THEN 10 ELSE 1 END) AS wsum
  FROM events GROUP BY 1, 2
), qual AS (
  SELECT user_id, MIN(d) AS vote_day FROM votes WHERE wsum >= 11 GROUP BY user_id
)
SELECT u.user_id, qual.vote_day
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN qual USING (user_id)
"""


# ---------------------------------------------------------------------------
# agg_priority_coalesce — first non-empty source in reliability order
# (fy.py:250-266); also covers topk_first_success (main_portCo.py:58-111)
# ---------------------------------------------------------------------------

def agg_priority_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First non-empty source in reliability order urgent > high >
    medium > other, then min of that source — a lazy coalesce over
    conditional aggregates (no second pass over the data)."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate").cast("long")
    m = _method_col()
    agged = o.select(F.col("o_custkey").alias("custkey"), m.alias("m"), y.alias("y")).groupBy(
        "custkey"
    ).agg(
        F.min(F.when(F.col("m") == "urgent", F.col("y"))).alias("u"),
        F.min(F.when(F.col("m") == "high", F.col("y"))).alias("h"),
        F.min(F.when(F.col("m") == "medium", F.col("y"))).alias("md"),
        F.min(F.when(F.col("m") == "other", F.col("y"))).alias("ot"),
    )
    src = (
        F.when(F.col("u").isNotNull(), "urgent")
        .when(F.col("h").isNotNull(), "high")
        .when(F.col("md").isNotNull(), "medium")
        .when(F.col("ot").isNotNull(), "other")
    )
    return agged.select(
        "custkey",
        F.coalesce("u", "h", "md", "ot").alias("resolved_year"),
        src.alias("source"),
    )


_AGG_PRIORITY_COALESCE_SQL = f"""
WITH agged AS (
  SELECT o_custkey AS custkey,
         MIN(CASE WHEN {_PRIORITY_BUCKET_SQL} = 'urgent' THEN CAST(year(o_orderdate) AS BIGINT) END) AS u,
         MIN(CASE WHEN {_PRIORITY_BUCKET_SQL} = 'high' THEN CAST(year(o_orderdate) AS BIGINT) END) AS h,
         MIN(CASE WHEN {_PRIORITY_BUCKET_SQL} = 'medium' THEN CAST(year(o_orderdate) AS BIGINT) END) AS md,
         MIN(CASE WHEN {_PRIORITY_BUCKET_SQL} = 'other' THEN CAST(year(o_orderdate) AS BIGINT) END) AS ot
  FROM orders GROUP BY o_custkey
)
SELECT custkey, COALESCE(u, h, md, ot) AS resolved_year,
       CASE WHEN u IS NOT NULL THEN 'urgent'
            WHEN h IS NOT NULL THEN 'high'
            WHEN md IS NOT NULL THEN 'medium'
            WHEN ot IS NOT NULL THEN 'other' END AS source
FROM agged
"""


# ---------------------------------------------------------------------------
# math_score + win_rank_label — weighted feature sum, thresholds, points
# (step3_attempt1.py:289-304,415-443; .portCo_research.py:45-50)
# ---------------------------------------------------------------------------

def math_score_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted feature sum with the reference's weights
    (1.0/0.9/0.7/0.6/0.3), thresholded into ordinal ranks
    (>=1.8 A, >=1.2 B, >=0.6 C, else D) with the A..F -> 6..1 points
    map. Pure codegen'd expression — no shuffle at all."""
    li = load_table(spark, sf_dir, "lineitem")
    z = F.lit(0.0)
    score = (
        F.when(F.col("l_returnflag") == "N", F.lit(1.0)).otherwise(z)
        + F.when(F.col("l_linestatus") == "O", F.lit(0.9)).otherwise(z)
        + F.when(F.col("l_discount") <= 0.02, F.lit(0.7)).otherwise(z)
        + F.when(F.col("l_quantity") > 25.0, F.lit(0.6)).otherwise(z)
        + F.when(F.col("l_tax") >= 0.04, F.lit(0.3)).otherwise(z)
    )
    rank = rank_label(score)
    points = rank_points(rank)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        score.alias("score"),
        rank.alias("match_rank"),
        points.alias("points"),
    )


_MATH_SCORE_RANK_SQL = """
WITH scored AS (
  SELECT l_orderkey, l_linenumber,
         (CASE WHEN l_returnflag = 'N' THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END
          + CASE WHEN l_linestatus = 'O' THEN 0.9::DOUBLE ELSE 0.0::DOUBLE END
          + CASE WHEN l_discount <= 0.02 THEN 0.7::DOUBLE ELSE 0.0::DOUBLE END
          + CASE WHEN l_quantity > 25.0 THEN 0.6::DOUBLE ELSE 0.0::DOUBLE END
          + CASE WHEN l_tax >= 0.04 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS score
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, score,
       CASE WHEN score >= 1.8 THEN 'A' WHEN score >= 1.2 THEN 'B'
            WHEN score >= 0.6 THEN 'C' ELSE 'D' END AS match_rank,
       CAST(CASE WHEN score >= 1.8 THEN 6 WHEN score >= 1.2 THEN 5
                 WHEN score >= 0.6 THEN 4 ELSE 3 END AS BIGINT) AS points
FROM scored
"""


# ---------------------------------------------------------------------------
# enrich_year_cascade — the reference's full resolution cascade
# (founded_year.py:268-277: consensus, else weighted vote, else
# priority coalesce)
# ---------------------------------------------------------------------------

def enrich_year_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete Finding_Founded_Year resolution in one plan: per
    customer, (1) set-intersection consensus over the four per-method
    year sets; if null (2) weighted vote with the 'other' class
    playing google (weight 10, threshold 11); if null (3) priority
    coalesce in reliability order. One shuffle builds every per-method
    aggregate; the cascade itself is pure column logic — the
    reference's three passes collapse into one job."""
    per_method = _per_method_sets(spark, sf_dir)
    methods = [F.col(c) for c in ("urgent", "high", "medium", "other")]
    consensus = consensus_min(methods)
    # weighted vote over the union of years: weight 10 when the year
    # appears in 'other' (the google stand-in), +1 per other method
    # containing it; candidates need >= 11
    all_years = F.array_distinct(
        F.flatten(F.array(*methods))
    )
    weight_of = lambda yy: (  # noqa: E731
        F.when(F.array_contains(F.col("other"), yy), 10).otherwise(0)
        + F.when(F.array_contains(F.col("urgent"), yy), 1).otherwise(0)
        + F.when(F.array_contains(F.col("high"), yy), 1).otherwise(0)
        + F.when(F.array_contains(F.col("medium"), yy), 1).otherwise(0)
    )
    qualified = F.filter(all_years, lambda yy: weight_of(yy) >= 11)
    vote = F.array_min(qualified)
    coalesced = priority_coalesce(methods)
    resolved = F.coalesce(consensus, vote, coalesced)
    source = (
        F.when(consensus.isNotNull(), "consensus")
        .when(vote.isNotNull(), "vote")
        .when(coalesced.isNotNull(), "priority")
    )
    return per_method.select(
        "custkey", resolved.alias("founded_year"), source.alias("resolution")
    )


_ENRICH_YEAR_CASCADE_SQL = f"""
WITH yrs AS (
  SELECT DISTINCT o_custkey AS custkey, {_PRIORITY_BUCKET_SQL} AS m,
         CAST(year(o_orderdate) AS BIGINT) AS y
  FROM orders
), mc AS (
  SELECT custkey, COUNT(DISTINCT m) AS n_methods FROM yrs GROUP BY custkey
), consensus AS (
  SELECT yc.custkey, MIN(CASE WHEN yc.cm = mc.n_methods THEN yc.y END) AS v
  FROM (SELECT custkey, y, COUNT(DISTINCT m) AS cm FROM yrs GROUP BY custkey, y) yc
  JOIN mc ON yc.custkey = mc.custkey
  GROUP BY yc.custkey
), vote AS (
  SELECT custkey, MIN(y) AS v FROM (
    SELECT custkey, y,
           SUM(CASE WHEN m = 'other' THEN 10 ELSE 1 END) AS w
    FROM yrs GROUP BY custkey, y
  ) WHERE w >= 11 GROUP BY custkey
), prio AS (
  SELECT custkey,
         COALESCE(MIN(CASE WHEN m = 'urgent' THEN y END),
                  MIN(CASE WHEN m = 'high' THEN y END),
                  MIN(CASE WHEN m = 'medium' THEN y END),
                  MIN(CASE WHEN m = 'other' THEN y END)) AS v
  FROM yrs GROUP BY custkey
)
SELECT mc.custkey,
       COALESCE(consensus.v, vote.v, prio.v) AS founded_year,
       CASE WHEN consensus.v IS NOT NULL THEN 'consensus'
            WHEN vote.v IS NOT NULL THEN 'vote'
            WHEN prio.v IS NOT NULL THEN 'priority' END AS resolution
FROM mc
LEFT JOIN consensus ON mc.custkey = consensus.custkey
LEFT JOIN vote ON mc.custkey = vote.custkey
LEFT JOIN prio ON mc.custkey = prio.custkey
"""


QUERIES = {
    "str_year_extract": QuerySpec(
        str_year_extract, _STR_YEAR_EXTRACT_SQL, ("string", "regex")
    ),
    "enrich_year_cascade": QuerySpec(
        enrich_year_cascade, _ENRICH_YEAR_CASCADE_SQL, ("enrichment", "cascade")
    ),
    "flt_kw_suppress": QuerySpec(
        flt_kw_suppress, _FLT_KW_SUPPRESS_SQL, ("filter", "regex")
    ),
    "agg_consensus": QuerySpec(agg_consensus, _AGG_CONSENSUS_SQL, ("agg", "array")),
    "agg_weighted_vote": QuerySpec(
        agg_weighted_vote, _AGG_WEIGHTED_VOTE_SQL, ("agg",)
    ),
    "agg_priority_coalesce": QuerySpec(
        agg_priority_coalesce, _AGG_PRIORITY_COALESCE_SQL, ("agg", "coalesce")
    ),
    "math_score_rank": QuerySpec(
        math_score_rank, _MATH_SCORE_RANK_SQL, ("scalar", "score")
    ),
}
