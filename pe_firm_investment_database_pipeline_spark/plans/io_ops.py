"""I/O-shaped operators (SURVEY.md §2 P7): the rate-limited HTTP fetch
stage, the HTML→rows extraction UDTF, and the page-accessibility
predicate — the reference's three non-relational operators
(src_http_fetch seed via step2_attempt1.py:121-124 /
step3_attempt1.py:516-524; html_extract step3_attempt1.py:226-275;
flt_accessible helper_functions.py:82-113).

No network exists in this environment, so the TRANSPORT is a
deterministic fake (status/body derived from the key), but everything
the engine is responsible for is real:

- ``mapInPandas`` fetch stage with a PER-PARTITION token bucket
  (helper_functions.py:23-38 backoff semantics are a transport retry;
  the engine-side contract is "never more than R requests/sec per
  partition", enforced here with a monotonic-clock bucket — never
  per-row sleeps).
- HTML parsing to a DOM-node table with regex extraction in Arrow
  batches (bs4 is unavailable; the node grammar below is regular, and
  a real lxml parser would slot into the same batch signature).
- Accessibility rules: HEAD 200 + content-length > 0 + non-document
  extension, with GET fallback on 405/501/202.

Because the fakes are pure functions of the input keys, all three ops
keep exact DuckDB oracles — the Python stages are verified end-to-end,
not just smoke-tested.
"""

from __future__ import annotations

import re
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table


class TokenBucket:
    """Per-partition rate limiter: ``rate`` tokens/sec, burst ``burst``.
    One instance per task (created inside the mapInPandas closure), so
    a 1000-partition job fetches at <= 1000*rate req/s cluster-wide —
    the distributed-safe version of the reference's sleep+backoff."""

    def __init__(self, rate: float, burst: int) -> None:
        self.rate = rate
        self.capacity = float(burst)
        self.tokens = float(burst)
        self.last = time.monotonic()

    def acquire(self, n: int = 1) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= n:
                self.tokens -= n
                return
            time.sleep((n - self.tokens) / self.rate)


def _fake_transport(url: str, key: int) -> tuple[int, str]:
    """Deterministic stand-in for requests.get: status from the key,
    body synthesized from the url slug."""
    status = 404 if key % 7 == 0 else 200
    slug = url.split("//")[1].split(".")[0]
    body = (
        f'<html><body><div class="portfolio-grid">'
        f'<a href="https://{slug}.com.au/companies/alpha">Alpha</a>'
        f'<img src="https://cdn.{slug}.com.au/logos/alpha.png"/>'
        f"</div></body></html>"
    )
    return status, body if status == 200 else ""


# ---------------------------------------------------------------------------
# io_http_fetch — rate-limited fetch stage
# ---------------------------------------------------------------------------

def io_http_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch stage over supplier candidate URLs: mapInPandas with a
    per-partition TokenBucket (500 req/s here so tests stay fast; the
    production rate is a config). Output is (key, url, status,
    content_length, ok) — body bytes stay in the stage unless a
    downstream parse needs them (column pruning for I/O)."""
    s = load_table(spark, sf_dir, "supplier")
    urls = s.select(
        "s_suppkey",
        F.concat(
            F.lit("https://"),
            F.lower(F.regexp_replace("s_name", r"[^A-Za-z0-9]", "")),
            F.lit(".com.au/portfolio"),
        ).alias("url"),
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(rate=500.0, burst=50)
        for pdf in batches:
            statuses, lengths = [], []
            for key, url in zip(pdf["s_suppkey"], pdf["url"]):
                bucket.acquire()
                status, body = _fake_transport(url, int(key))
                statuses.append(status)
                lengths.append(len(body))
            yield pd.DataFrame(
                {
                    "s_suppkey": pdf["s_suppkey"],
                    "url": pdf["url"],
                    "status": pd.Series(statuses, dtype="int64"),
                    "content_length": pd.Series(lengths, dtype="int64"),
                    "ok": pd.Series([st == 200 for st in statuses], dtype="bool"),
                }
            )

    return urls.mapInPandas(
        fetch,
        schema="s_suppkey long, url string, status long, content_length long, ok boolean",
    )


_IO_HTTP_FETCH_SQL = """
WITH u AS (
  SELECT s_suppkey,
         lower(regexp_replace(s_name, '[^A-Za-z0-9]', '', 'g')) AS slug
  FROM supplier
)
SELECT s_suppkey,
       'https://' || slug || '.com.au/portfolio' AS url,
       CAST(CASE WHEN s_suppkey % 7 = 0 THEN 404 ELSE 200 END AS BIGINT) AS status,
       CAST(CASE WHEN s_suppkey % 7 = 0 THEN 0 ELSE
         length('<html><body><div class="portfolio-grid">'
                || '<a href="https://' || slug || '.com.au/companies/alpha">Alpha</a>'
                || '<img src="https://cdn.' || slug || '.com.au/logos/alpha.png"/>'
                || '</div></body></html>') END AS BIGINT) AS content_length,
       s_suppkey % 7 != 0 AS ok
FROM u
"""


# ---------------------------------------------------------------------------
# html_extract — HTML → DOM-node table (UDTF shape)
# ---------------------------------------------------------------------------

_CLASS_RE = re.compile(r'<(\w+)[^>]*\bclass="([^"]*)"[^>]*>')
_HREF_RE = re.compile(r'<a\s[^>]*href="([^"]*)"')
_SRC_RE = re.compile(r'<img\s[^>]*src="([^"]*)"')
_DOMAIN_RE = re.compile(r"^https?://(?:www\.)?([^/]+)")


def html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→rows (step3_attempt1.py:226-275: per element with a class
    attr, first link href domain + first img src domain): synthesized
    per-supplier pages parsed in Arrow batches, one output row per
    classed element. The reference's card-signal table."""
    s = load_table(spark, sf_dir, "supplier")
    slug = F.lower(F.regexp_replace("s_name", r"[^A-Za-z0-9]", ""))
    html = F.concat(
        F.lit('<html><body><div class="portfolio-grid cards">'),
        F.lit('<a href="https://'),
        slug,
        F.lit('.com.au/companies/alpha">Alpha Co</a>'),
        F.lit('<img src="https://cdn.'),
        slug,
        F.lit('.com.au/logos/a.png"/></div>'),
        F.lit('<footer class="site-footer"><a href="https://example.org/about">x</a></footer>'),
        F.lit("</body></html>"),
    )
    pages = s.select("s_suppkey", html.alias("html"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, tags, classes, link_doms, img_doms = [], [], [], [], []
            for key, doc in zip(pdf["s_suppkey"], pdf["html"]):
                for m in _CLASS_RE.finditer(doc):
                    tag, cls = m.group(1), m.group(2)
                    rest = doc[m.end():]
                    href = _HREF_RE.search(rest)
                    src = _SRC_RE.search(rest)
                    ld = _DOMAIN_RE.match(href.group(1)) if href else None
                    im = _DOMAIN_RE.match(src.group(1)) if src else None
                    keys.append(int(key))
                    tags.append(tag)
                    classes.append(cls)
                    link_doms.append(ld.group(1) if ld else "")
                    img_doms.append(im.group(1) if im else "")
            yield pd.DataFrame(
                {
                    "s_suppkey": pd.Series(keys, dtype="int64"),
                    "tag": tags,
                    "class_string": classes,
                    "link_domain": link_doms,
                    "img_domain": img_doms,
                }
            )

    return pages.mapInPandas(
        parse,
        schema=(
            "s_suppkey long, tag string, class_string string, "
            "link_domain string, img_domain string"
        ),
    )


_HTML_EXTRACT_SQL = """
WITH u AS (
  SELECT s_suppkey,
         lower(regexp_replace(s_name, '[^A-Za-z0-9]', '', 'g')) AS slug
  FROM supplier
)
SELECT s_suppkey, 'div' AS tag, 'portfolio-grid cards' AS class_string,
       slug || '.com.au' AS link_domain,
       'cdn.' || slug || '.com.au' AS img_domain
FROM u
UNION ALL
SELECT s_suppkey, 'footer', 'site-footer', 'example.org', ''
FROM u
"""


# ---------------------------------------------------------------------------
# flt_accessible — HEAD/GET accessibility predicate
# ---------------------------------------------------------------------------

def flt_accessible(spark: SparkSession, sf_dir: str) -> DataFrame:
    """helper_functions.py:82-113: a page is accessible iff HEAD gives
    200 with content-length > 0 and the URL is not a document
    download; on HEAD 405/501/202 fall back to GET. Statuses are
    simulated from the key; the rule composition is the operator."""
    s = load_table(spark, sf_dir, "supplier")
    head_status = (
        F.when(F.col("s_suppkey") % 11 == 0, 404)
        .when(F.col("s_suppkey") % 11 == 1, 405)
        .when(F.col("s_suppkey") % 11 == 2, 501)
        .when(F.col("s_suppkey") % 11 == 3, 202)
        .otherwise(200)
        .cast("long")
    )
    get_status = (
        F.when(F.col("s_suppkey") % 3 == 0, 404).otherwise(200).cast("long")
    )
    content_len = (F.col("s_suppkey") % 5 * 1000).cast("long")
    is_doc = F.col("s_suppkey") % 13 == 0  # stands in for .pdf/.docx URLs
    needs_get = head_status.isin(405, 501, 202)
    effective = F.when(needs_get, get_status).otherwise(head_status)
    accessible = (
        (effective == 200) & (content_len > 0) & ~is_doc
    )
    return s.select(
        "s_suppkey",
        head_status.alias("head_status"),
        F.when(needs_get, get_status).alias("get_status"),
        content_len.alias("content_length"),
        is_doc.alias("is_document_url"),
        accessible.alias("accessible"),
    )


_FLT_ACCESSIBLE_SQL = """
WITH t AS (
  SELECT s_suppkey,
         CAST(CASE WHEN s_suppkey % 11 = 0 THEN 404
                   WHEN s_suppkey % 11 = 1 THEN 405
                   WHEN s_suppkey % 11 = 2 THEN 501
                   WHEN s_suppkey % 11 = 3 THEN 202
                   ELSE 200 END AS BIGINT) AS head_status,
         CAST(CASE WHEN s_suppkey % 3 = 0 THEN 404 ELSE 200 END AS BIGINT) AS get_raw,
         CAST(s_suppkey % 5 * 1000 AS BIGINT) AS content_length,
         s_suppkey % 13 = 0 AS is_document_url
  FROM supplier
)
SELECT s_suppkey, head_status,
       CASE WHEN head_status IN (405, 501, 202) THEN get_raw END AS get_status,
       content_length, is_document_url,
       ((CASE WHEN head_status IN (405, 501, 202) THEN get_raw
              ELSE head_status END) = 200
        AND content_length > 0 AND NOT is_document_url) AS accessible
FROM t
"""


QUERIES = {
    "io_http_fetch": QuerySpec(
        io_http_fetch, _IO_HTTP_FETCH_SQL, ("io", "pandas_udf")
    ),
    "html_extract": QuerySpec(html_extract, _HTML_EXTRACT_SQL, ("io", "udtf")),
    "flt_accessible": QuerySpec(
        flt_accessible, _FLT_ACCESSIBLE_SQL, ("io", "filter")
    ),
}
