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

# Full reference blacklist (step2_attempt1.py:55-58), verbatim.
NOISE_RE = (
    "(footer|header|nav|menu|cookie|subscribe|social|share|breadcrumb|"
    "search|hero|banner|modal|popup)"
)

# Conjunctive rank sets (step2_attempt1.py:44-52): a class list ranks
# A/B/C when, for EVERY word in some tuple, SOME token contains that
# word as a substring; ranks are tried A -> B -> C; blacklisted class
# lists rank None.
RANK_SETS = {
    "A": (
        ("portfolio", "card"),
        ("portfolio", "item"),
        ("investment", "card"),
        ("investment", "item"),
        ("investment", "box"),
    ),
    "B": (("portfolio",), ("investment",), ("company",)),
    "C": (("item",), ("box",), ("card",), ("logo",)),
}


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

# One class string per residue, chosen to exercise every semantic
# branch: conjunctive A (portfolio+card, investment+card,
# portfolio+item), bare B (investment, company — company beats the C
# 'card' token because ranks try A->B->C), C (logo), every new
# blacklist token (breadcrumb, modal/popup, hero/search/subscribe),
# and an unranked residue.
_CLASS_CASES = (
    "portfolio-grid cards wide",   # 0: A via (portfolio, card)
    "investment-list row",         # 1: B (investment; no card/item/box token)
    "site-footer dark",            # 2: None (footer)
    "company-team cards",          # 3: B (company — checked before C's 'card')
    "nav-menu top cookie-banner",  # 4: None
    "content-main article",        # 5: None (no match, not blacklisted)
    "investment-card col",         # 6: A via (investment, card)
    "breadcrumb-list items",       # 7: None (breadcrumb beats 'item')
    "modal popup-overlay",         # 8: None
    "logo-wall grid",              # 9: C (logo)
    "hero search-bar subscribe",   # 10: None
    "portfolio-item box",          # 11: A via (portfolio, item)
)


def _classed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized DOM class strings per customer — mix of portfolio
    grids, investment cards, noise containers, and unranked content,
    covering every step2 rank/blacklist branch."""
    c = load_table(spark, sf_dir, "customer")
    cls = F.when(F.col("c_custkey") % 12 == 0, _CLASS_CASES[0])
    for i in range(1, 11):
        cls = cls.when(F.col("c_custkey") % 12 == i, _CLASS_CASES[i])
    cls = cls.otherwise(_CLASS_CASES[11])
    return c.select("c_custkey", cls.alias("class_string"))


_CLASSED_SQL = (
    "  SELECT c_custkey, CASE "
    + " ".join(
        f"WHEN c_custkey % 12 = {i} THEN '{s}'" for i, s in enumerate(_CLASS_CASES[:11])
    )
    + f" ELSE '{_CLASS_CASES[11]}' END AS class_string FROM customer"
)


def flt_class_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reject elements ANY of whose class tokens matches the full
    reference noise regex (step2_attempt1.py:55-58,66-67) — including
    subscribe/share/breadcrumb/search/hero/modal/popup."""
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


def _has_word(toks, word: str):
    """Reference has_all() atom: SOME token contains `word` as a
    substring (step2_attempt1.py:69-71)."""
    return F.exists(toks, lambda t: t.contains(word))


def _rank_expr(toks):
    blacklisted = F.exists(toks, lambda t: t.rlike(NOISE_RE))
    has = {
        w: _has_word(toks, w)
        for w in ("portfolio", "investment", "company", "card", "item", "box", "logo")
    }
    rank_a = F.lit(False)
    for w1, w2 in RANK_SETS["A"]:
        rank_a = rank_a | (has[w1] & has[w2])
    rank_b = has["portfolio"] | has["investment"] | has["company"]
    rank_c = has["item"] | has["box"] | has["card"] | has["logo"]
    return (
        F.when(blacklisted, F.lit(None).cast("string"))
        .when(rank_a, "A")
        .when(rank_b, "B")
        .when(rank_c, "C")
        .otherwise(F.lit(None).cast("string"))
    )


def _has_word_duck(word: str) -> str:
    return f"len(list_filter(toks, t -> contains(t, '{word}'))) > 0"


def _rank_sql_duck() -> str:
    bl = f"len(list_filter(toks, t -> regexp_matches(t, '{NOISE_RE}'))) > 0"
    a = " OR ".join(
        f"({_has_word_duck(w1)} AND {_has_word_duck(w2)})" for w1, w2 in RANK_SETS["A"]
    )
    b = " OR ".join(_has_word_duck(w) for w, in RANK_SETS["B"])
    c = " OR ".join(_has_word_duck(w) for w, in RANK_SETS["C"])
    return (
        f"CASE WHEN {bl} THEN NULL WHEN {a} THEN 'A' "
        f"WHEN {b} THEN 'B' WHEN {c} THEN 'C' ELSE NULL END"
    )


def html_class_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact step2_attempt1.py:40-77 semantics: lowercase tokens; a
    blacklist hit on ANY token -> rank NULL; else the first rank
    (A->B->C) one of whose word-tuples is fully covered, where a word
    is covered when SOME token CONTAINS it (substring, not equality) —
    so ('investment','card') ranks 'investment-card col' A. No match
    -> NULL (the reference returns None and drops the element from
    the buckets)."""
    d = _classed(spark, sf_dir)
    toks = F.transform(F.split("class_string", " "), F.lower)
    return d.select(
        "c_custkey", "class_string", _rank_expr(toks).alias("rank")
    )


_HTML_CLASS_RANK_SQL = f"""
WITH d AS ({_CLASSED_SQL}),
t AS (SELECT c_custkey, class_string,
             list_transform(string_split(class_string, ' '), t -> lower(t)) AS toks
      FROM d)
SELECT c_custkey, class_string, {_rank_sql_duck()} AS rank
FROM t
"""


def agg_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct class strings + element counts per rank bucket
    (step2_attempt1.py:97-115's summary table). Unranked elements
    (rank NULL) are excluded, as in the reference's A/B/C buckets."""
    ranked = html_class_rank(spark, sf_dir).where(F.col("rank").isNotNull())
    return ranked.groupBy("rank").agg(
        F.countDistinct("class_string").alias("n_distinct_classes"),
        F.count(F.lit(1)).alias("n_elements"),
    )


_AGG_BUCKET_STATS_SQL = f"""
WITH ranked AS ({_HTML_CLASS_RANK_SQL})
SELECT rank, COUNT(DISTINCT class_string) AS n_distinct_classes,
       COUNT(*) AS n_elements
FROM ranked WHERE rank IS NOT NULL GROUP BY rank
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
