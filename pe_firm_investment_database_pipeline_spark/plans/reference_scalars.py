"""Remaining reference scalar/filter surface (SURVEY.md §2.2/§2.4/
§2.8): type whitelist/blacklist filters, DOM-class blacklists and
rank buckets, public-suffix domain extraction, slug→name extraction
(the step3 attempt-3/4 specs), and backoff scheduling — all pure
column expressions with DuckDB oracles.

Reference parity (file:line vs /root/reference/):
- flt_type_wb          step3_attempt1.py:72-73,364-367 (blacklist
                       rejects unless whitelist also hits)
- flt_class_blacklist  step2_attempt1.py:55-58,66-67 (noise-token
                       regex on DOM class lists)
- html_class_rank      step2_attempt1.py:44-77 (conjunctive token-set
                       containment → rank A/B/C)
- agg_bucket_stats     step2_attempt1.py:97-115 (distinct class
                       strings per rank + totals)
- url_tld_domain       step1_attempt3.py:58-60 (tldextract registered
                       domain — here via a broadcast public-suffix
                       list, longest-match)
- url_src_name         step3_attempt3.py:32-43 (spec): img-src slug →
                       display name
- url_href_name        step3_attempt4.py:32-46 (spec): href slug →
                       display name
- math_backoff         helper_functions.py:23-38 (exponential backoff
                       2^attempt, ≤5 retries)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table

WHITELIST = ("Organization", "Corporation", "LocalBusiness")
BLACKLIST = ("Person", "Article", "NewsArticle")
_WL_SQL = "['" + "','".join(WHITELIST) + "']"
_BL_SQL = "['" + "','".join(BLACKLIST) + "']"

NOISE_RE = "(footer|header|nav|menu|cookie|banner|social)"


# ---------------------------------------------------------------------------
# flt_type_wb — JSON-LD @type whitelist/blacklist
# ---------------------------------------------------------------------------

def flt_type_wb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-type gate: reject when a blacklisted type is present
    UNLESS a whitelisted type is also present (the reference's
    asymmetric rule). Four deterministic type-array shapes exercise
    every branch; kept rows only (it is a filter)."""
    p = load_table(spark, sf_dir, "part")
    types = (
        F.when(F.col("p_partkey") % 4 == 0, F.array(F.lit("Organization")))
        .when(F.col("p_partkey") % 4 == 1, F.array(F.lit("Person")))
        .when(
            F.col("p_partkey") % 4 == 2,
            F.array(F.lit("Organization"), F.lit("Person")),
        )
        .otherwise(F.array(F.lit("Article"), F.lit("NewsArticle")))
    )
    wl = F.arrays_overlap(types, F.array(*[F.lit(t) for t in WHITELIST]))
    bl = F.arrays_overlap(types, F.array(*[F.lit(t) for t in BLACKLIST]))
    keep = wl | ~bl
    return (
        p.select(
            "p_partkey",
            F.array_join(types, ",").alias("types_csv"),
            keep.alias("keep"),
        )
        .where(F.col("keep"))
    )


_FLT_TYPE_WB_SQL = f"""
WITH t AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 4 = 0 THEN ['Organization']
              WHEN p_partkey % 4 = 1 THEN ['Person']
              WHEN p_partkey % 4 = 2 THEN ['Organization','Person']
              ELSE ['Article','NewsArticle'] END AS types
  FROM part
)
SELECT p_partkey, array_to_string(types, ',') AS types_csv,
       (list_has_any(types, {_WL_SQL}) OR NOT list_has_any(types, {_BL_SQL})) AS keep
FROM t
WHERE list_has_any(types, {_WL_SQL}) OR NOT list_has_any(types, {_BL_SQL})
"""


# ---------------------------------------------------------------------------
# flt_class_blacklist + html_class_rank + agg_bucket_stats
# ---------------------------------------------------------------------------

def _classed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized DOM class strings per customer — mix of portfolio
    grids, investment lists, team cards, and noise elements."""
    c = load_table(spark, sf_dir, "customer")
    cls = (
        F.when(F.col("c_custkey") % 6 == 0, "portfolio-grid cards wide")
        .when(F.col("c_custkey") % 6 == 1, "investment-list row")
        .when(F.col("c_custkey") % 6 == 2, "site-footer dark")
        .when(F.col("c_custkey") % 6 == 3, "company-team cards")
        .when(F.col("c_custkey") % 6 == 4, "nav-menu top cookie-banner")
        .otherwise("content-main article")
    )
    return c.select("c_custkey", cls.alias("class_string"))


_CLASSED_SQL = """
  SELECT c_custkey,
         CASE WHEN c_custkey % 6 = 0 THEN 'portfolio-grid cards wide'
              WHEN c_custkey % 6 = 1 THEN 'investment-list row'
              WHEN c_custkey % 6 = 2 THEN 'site-footer dark'
              WHEN c_custkey % 6 = 3 THEN 'company-team cards'
              WHEN c_custkey % 6 = 4 THEN 'nav-menu top cookie-banner'
              ELSE 'content-main article' END AS class_string
  FROM customer
"""


def flt_class_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reject elements whose class tokens match the noise regex
    (footer/header/nav/menu/cookie/banner/social)."""
    d = _classed(spark, sf_dir)
    toks = F.split("class_string", " ")
    noisy = F.exists(toks, lambda t: t.rlike(NOISE_RE))
    return d.where(~noisy).select("c_custkey", "class_string")


_FLT_CLASS_BLACKLIST_SQL = f"""
WITH d AS ({_CLASSED_SQL})
SELECT c_custkey, class_string FROM d
WHERE len(list_filter(string_split(class_string, ' '),
                      t -> regexp_matches(t, '{NOISE_RE}'))) = 0
"""


def html_class_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive token-set containment → ordinal rank
    (step2_attempt1.py:44-52): A needs a 'portfolio' token AND a
    layout token; B an investment token; C a company/team token;
    else D."""
    d = _classed(spark, sf_dir)
    s = F.col("class_string")
    rank = (
        F.when(
            s.contains("portfolio")
            & (s.contains("grid") | s.contains("list") | s.contains("cards")),
            "A",
        )
        .when(s.contains("invest"), "B")
        .when(s.contains("company") | s.contains("team"), "C")
        .otherwise("D")
    )
    return d.select("c_custkey", "class_string", rank.alias("rank"))


_HTML_CLASS_RANK_SQL = f"""
WITH d AS ({_CLASSED_SQL})
SELECT c_custkey, class_string,
       CASE WHEN contains(class_string, 'portfolio')
                 AND (contains(class_string, 'grid') OR contains(class_string, 'list')
                      OR contains(class_string, 'cards')) THEN 'A'
            WHEN contains(class_string, 'invest') THEN 'B'
            WHEN contains(class_string, 'company') OR contains(class_string, 'team') THEN 'C'
            ELSE 'D' END AS rank
FROM d
"""


def agg_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct class strings + element counts per rank bucket
    (step2_attempt1.py:97-115's summary table)."""
    ranked = html_class_rank(spark, sf_dir)
    return ranked.groupBy("rank").agg(
        F.countDistinct("class_string").alias("n_distinct_classes"),
        F.count(F.lit(1)).alias("n_elements"),
    )


_AGG_BUCKET_STATS_SQL = f"""
WITH ranked AS ({_HTML_CLASS_RANK_SQL})
SELECT rank, COUNT(DISTINCT class_string) AS n_distinct_classes,
       COUNT(*) AS n_elements
FROM ranked GROUP BY rank
"""


# ---------------------------------------------------------------------------
# url_tld_domain — registered domain via broadcast public-suffix list
# ---------------------------------------------------------------------------

_SUFFIXES = ("com.au", "net.au", "org.au", "com", "org", "io")  # longest first


def url_tld_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tldextract semantics (step1_attempt3.py:58-60) without the
    library: longest-matching public suffix from a (broadcastable)
    suffix list, registered domain = last pre-suffix label + suffix.
    At scale the suffix list is a broadcast lookup, exactly as here —
    it is a literal in the plan."""
    s = load_table(spark, sf_dir, "supplier")
    slug = F.lower(F.regexp_replace("s_name", r"[^A-Za-z0-9]", ""))
    tld = (
        F.when(F.col("s_suppkey") % 4 == 0, "com.au")
        .when(F.col("s_suppkey") % 4 == 1, "net.au")
        .when(F.col("s_suppkey") % 4 == 2, "com")
        .otherwise("io")
    )
    host = F.concat(F.lit("portal.www."), slug, F.lit("."), tld)
    # longest-match over the suffix list, encoded as an ordered CASE
    suffix = F.lit(None).cast("string")
    for suf in _SUFFIXES:
        suffix = F.coalesce(
            suffix, F.when(host.endswith("." + suf), F.lit(suf))
        )
    staged = s.select(
        "s_suppkey", host.alias("host"), suffix.alias("public_suffix")
    )
    stem = F.expr("substring(host, 1, length(host) - length(public_suffix) - 1)")
    last_label = F.element_at(F.split(stem, r"\."), -1)
    return staged.select(
        "s_suppkey",
        "host",
        "public_suffix",
        F.concat(last_label, F.lit("."), F.col("public_suffix")).alias(
            "registered_domain"
        ),
    )


_URL_TLD_DOMAIN_SQL = """
WITH u AS (
  SELECT s_suppkey,
         'portal.www.' || lower(regexp_replace(s_name, '[^A-Za-z0-9]', '', 'g'))
           || '.' || CASE WHEN s_suppkey % 4 = 0 THEN 'com.au'
                          WHEN s_suppkey % 4 = 1 THEN 'net.au'
                          WHEN s_suppkey % 4 = 2 THEN 'com'
                          ELSE 'io' END AS host
  FROM supplier
), m AS (
  SELECT s_suppkey, host,
         CASE WHEN host LIKE '%.com.au' THEN 'com.au'
              WHEN host LIKE '%.net.au' THEN 'net.au'
              WHEN host LIKE '%.org.au' THEN 'org.au'
              WHEN host LIKE '%.com' THEN 'com'
              WHEN host LIKE '%.org' THEN 'org'
              WHEN host LIKE '%.io' THEN 'io' END AS public_suffix
  FROM u
)
SELECT s_suppkey, host, public_suffix,
       list_extract(string_split(substr(host, 1, length(host) - length(public_suffix) - 1), '.'), -1)
         || '.' || public_suffix AS registered_domain
FROM m
"""


# ---------------------------------------------------------------------------
# url_src_name / url_href_name — slug → display name (step3 specs)
# ---------------------------------------------------------------------------

def url_src_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """step3_attempt3 spec: portCo name from an uploads img src — the
    first alphabetic path component under /uploads, dashes to spaces,
    title-cased."""
    p = load_table(spark, sf_dir, "part")
    slug = F.lower(F.regexp_replace(F.substring("p_name", 1, 12), r"\s+", "-"))
    src = F.concat(
        F.lit("/uploads/2024/03/"), slug, F.lit("-logo.png")
    )
    raw = F.regexp_extract(src, r"/uploads/(?:[^/]*/)*?([A-Za-z][A-Za-z-]*)", 1)
    name = F.initcap(F.replace(raw, F.lit("-"), F.lit(" ")))
    return p.select("p_partkey", src.alias("img_src"), name.alias("portco_name"))


# DuckDB has no initcap: rebuild it word-wise (upper first letter,
# lower rest — matching Spark's initcap on our lowercase slugs).
_INITCAP_DUCK = (
    "array_to_string(list_transform(string_split({col}, ' '), "
    "w -> CASE WHEN length(w) = 0 THEN w "
    "ELSE upper(w[1]) || lower(w[2:]) END), ' ')"
)

_URL_SRC_NAME_SQL = f"""
WITH u AS (
  SELECT p_partkey,
         '/uploads/2024/03/'
           || lower(regexp_replace(substr(p_name, 1, 12), '\\s+', '-', 'g'))
           || '-logo.png' AS img_src
  FROM part
), x AS (
  SELECT p_partkey, img_src,
         replace(regexp_extract(img_src, '/uploads/(?:[^/]*/)*?([A-Za-z][A-Za-z-]*)', 1),
                 '-', ' ') AS raw
  FROM u
)
SELECT p_partkey, img_src, {_INITCAP_DUCK.format(col="raw")} AS portco_name
FROM x
"""


def url_href_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """step3_attempt4 spec: portCo name from an investments/portfolio
    href slug."""
    p = load_table(spark, sf_dir, "part")
    slug = F.lower(F.regexp_replace(F.substring("p_name", 1, 12), r"\s+", "-"))
    section = (
        F.when(F.col("p_partkey") % 3 == 0, "investments")
        .when(F.col("p_partkey") % 3 == 1, "portfolio")
        .otherwise("companies")
    )
    href = F.concat(
        F.lit("https://firm.com.au/"), section, F.lit("/"), slug, F.lit("/")
    )
    raw = F.regexp_extract(
        href, r"(?:investments|portfolio|companies)/([^/\"]+)", 1
    )
    name = F.initcap(F.replace(raw, F.lit("-"), F.lit(" ")))
    return p.select("p_partkey", href.alias("href"), name.alias("portco_name"))


_URL_HREF_NAME_SQL = f"""
WITH u AS (
  SELECT p_partkey,
         'https://firm.com.au/'
           || CASE WHEN p_partkey % 3 = 0 THEN 'investments'
                   WHEN p_partkey % 3 = 1 THEN 'portfolio'
                   ELSE 'companies' END
           || '/' || lower(regexp_replace(substr(p_name, 1, 12), '\\s+', '-', 'g'))
           || '/' AS href
  FROM part
), x AS (
  SELECT p_partkey, href,
         replace(regexp_extract(href, '(?:investments|portfolio|companies)/([^/"]+)', 1),
                 '-', ' ') AS raw
  FROM u
)
SELECT p_partkey, href, {_INITCAP_DUCK.format(col="raw")} AS portco_name
FROM x
"""


# ---------------------------------------------------------------------------
# math_backoff — exponential retry schedule
# ---------------------------------------------------------------------------

def math_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backoff schedule (helper_functions.py:23-38): delay 2^attempt
    capped at 5 retries; cumulative wait 2^(n+1)-1. Exact integer
    shifts — no float pow."""
    e = load_table(spark, sf_dir, "events")
    attempt = (F.col("event_id") % 6).cast("int")
    # SQL-form shiftleft: the Python F.shiftleft only takes a literal
    # shift amount, the SQL function takes a column.
    delay = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(event_id % 6 AS INT))")
    cumulative = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(event_id % 6 AS INT) + 1)"
    ) - F.lit(1)
    gave_up = attempt >= 5
    return e.select(
        "event_id",
        attempt.cast("long").alias("attempt"),
        delay.alias("delay_s"),
        cumulative.alias("total_wait_s"),
        gave_up.alias("gave_up"),
    )


_MATH_BACKOFF_SQL = """
SELECT event_id,
       CAST(event_id % 6 AS BIGINT) AS attempt,
       CAST(1 AS BIGINT) << CAST(event_id % 6 AS INT) AS delay_s,
       (CAST(1 AS BIGINT) << (CAST(event_id % 6 AS INT) + 1)) - 1 AS total_wait_s,
       event_id % 6 >= 5 AS gave_up
FROM events
"""


QUERIES = {
    "flt_type_wb": QuerySpec(flt_type_wb, _FLT_TYPE_WB_SQL, ("filter", "array")),
    "flt_class_blacklist": QuerySpec(
        flt_class_blacklist, _FLT_CLASS_BLACKLIST_SQL, ("filter", "regex")
    ),
    "html_class_rank": QuerySpec(
        html_class_rank, _HTML_CLASS_RANK_SQL, ("html", "rank")
    ),
    "agg_bucket_stats": QuerySpec(
        agg_bucket_stats, _AGG_BUCKET_STATS_SQL, ("agg",)
    ),
    "url_tld_domain": QuerySpec(url_tld_domain, _URL_TLD_DOMAIN_SQL, ("url",)),
    "url_src_name": QuerySpec(url_src_name, _URL_SRC_NAME_SQL, ("url",)),
    "url_href_name": QuerySpec(url_href_name, _URL_HREF_NAME_SQL, ("url",)),
    "math_backoff": QuerySpec(math_backoff, _MATH_BACKOFF_SQL, ("math",)),
}
