"""Edge-corpus guards: documents with empty / 1-token / 2-token text
must not crash the text operators (Spark's sequence(0, -1) is
DESCENDING, so unguarded window builders index out of bounds under
ANSI mode — found and fixed via review; pinned here)."""

from __future__ import annotations

from pe_firm_investment_database_pipeline_spark.plans import textops


def _tiny_docs(spark, tmp_path):
    rows = [
        (0, "", "en"),
        (1, "one", "en"),
        (2, "two tokens", "en"),
        (3, "three whole tokens", "en"),
        (4, "now five tokens are here exactly yes", "en"),
        (5, "now five tokens are here exactly yes", "en"),  # exact dup of 4
    ]
    rows = [(i, t, lang, f"src{i}", len(t)) for i, t, lang in rows]
    df = spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_text_ops_survive_short_docs(spark, tmp_path):
    sf = _tiny_docs(spark, tmp_path)
    # each op must execute without INVALID_ARRAY_INDEX
    assert textops.txt_ngram_stats(spark, sf).count() >= 1
    assert textops.txt_token_count(spark, sf).count() == 6
    assert textops.txt_rolling_hash(spark, sf).count() == 6
    assert textops.txt_bpe_tokens(spark, sf).count() == 6


def test_dedup_ops_survive_short_docs(spark, tmp_path):
    sf = _tiny_docs(spark, tmp_path)
    # docs with < 3 tokens have empty shingle sets and simply drop out
    lsh = textops.dedup_minhash_lsh(spark, sf).collect()
    assert {(r["doc1"], r["doc2"]) for r in lsh} == {(4, 5)}
    jac = textops.dedup_ngram_jaccard(spark, sf).collect()
    assert {(r["doc1"], r["doc2"]) for r in jac} == {(4, 5)}
    assert all(r["jaccard"] == 1.0 for r in jac)
    exact = textops.dedup_exact(spark, sf)
    assert exact.where("n_copies = 2").count() == 1


def test_round5_ops_survive_short_docs(spark, tmp_path):
    """Round-5 text/dedup/curation entries on the degenerate corpus:
    containment pairs the planted exact dup, the incremental index
    join runs with a near-empty batch, the weighted sampler never
    keeps an empty doc (weight 0), and the composed curation pipeline
    must survive its quality gate rejecting EVERY document (empty
    cumsum input — the COALESCE/GREATEST guards)."""
    sf = _tiny_docs(spark, tmp_path)
    cont = textops.dedup_containment(spark, sf).collect()
    assert {(r["doc_small"], r["doc_big"]) for r in cont} == {(4, 5)}
    assert all(r["containment"] == 1.0 for r in cont)
    # batch = doc_id % 10 == 0 -> only doc 0 (empty text, no shingles)
    assert textops.dedup_incremental_lsh(spark, sf).count() == 0
    from pe_firm_investment_database_pipeline_spark.plans import datapipe

    sampled = datapipe.samp_weighted_quality(spark, sf).collect()
    assert all(r["doc_id"] != 0 for r in sampled)  # empty doc: weight 0
    # every tiny doc is under the 20-token quality gate -> empty plan out
    assert datapipe.curation_pipeline_e2e(spark, sf).count() == 0


def test_repetition_filter_short_docs(spark, tmp_path):
    """txt_repetition_filter on the degenerate corpus: the empty doc
    labels 'empty' with NULL fractions (no divide-by-zero), <2-token
    docs take the guarded zero-bigram path (Spark's sequence(0, -1)
    descends — the guard is load-bearing), and a one-token doc is
    top_token_frac = 1.0 -> repetitive."""
    sf = _tiny_docs(spark, tmp_path)
    rows = {r["doc_id"]: r for r in textops.txt_repetition_filter(spark, sf).collect()}
    assert len(rows) == 6
    assert rows[0]["repetition_label"] == "empty"
    assert rows[0]["top_token_frac"] is None and rows[0]["dup_bigram_frac"] is None
    assert rows[0]["dup_bigram_excess"] == 0 and rows[0]["n_bigrams"] == 0
    assert rows[1]["repetition_label"] == "repetitive"  # 1/1 > 0.2
    assert rows[1]["n_bigrams"] == 0 and rows[1]["dup_bigram_excess"] == 0
    assert rows[2]["top_token_frac"] == 0.5 and rows[2]["dup_bigram_excess"] == 0
    assert rows[4]["repetition_label"] == "ok"  # 1/7 < 0.2, all bigrams unique


def test_round5b_ops_survive_short_docs(spark, tmp_path):
    """Late round-5 entries on the degenerate corpus: the mixture
    sampler's integer rate math must survive a single-language corpus
    (w_i = w_all -> share = 1000 permille) and the PII redactor must
    scrub its injected spans even when the document text is empty."""
    sf = _tiny_docs(spark, tmp_path)
    from pe_firm_investment_database_pipeline_spark.plans import datapipe

    mix = datapipe.samp_domain_mixture(spark, sf).collect()
    # one lang: rate = min(1000, (1000 * (2*6 div 5)) div 6) = 333
    assert all(r["rate_permille"] == 333 for r in mix)
    red = textops.txt_pii_redact(spark, sf).collect()
    assert all(r["n_emails"] == 1 and r["n_ips"] == 1 for r in red)
    assert all(
        "<EMAIL>" in r["redacted"]
        and "<IP>" in r["redacted"]
        and "<PHONE>" in r["redacted"]
        and "@" not in r["redacted"]
        for r in red
    )


def test_round5c_ops_survive_short_docs(spark, tmp_path):
    """Retrieval + survivor-selection entries on the degenerate
    corpus: BM25 with zero query-term hits returns an empty top-k
    (not an error), the inverted index only indexes non-empty docs,
    KWIC emits nothing when the keyword is absent, and canonical
    pick classifies every document with exactly one canonical per
    cluster (the planted dup pair collapses to its smaller id on an
    n_chars tie)."""
    sf = _tiny_docs(spark, tmp_path)
    from pe_firm_investment_database_pipeline_spark.plans import (
        components,
        io_ops,
        retrieval,
    )

    assert retrieval.rag_bm25_topk(spark, sf).count() == 0
    inv = {r["term"]: r["df"] for r in retrieval.idx_inverted(spark, sf).collect()}
    assert inv["tokens"] == 4 and "" not in inv  # docs 2,3,4,5
    assert io_ops.udtf_kwic(spark, sf).count() == 0
    pick = components.dedup_canonical_pick(spark, sf).collect()
    assert len(pick) == 6
    assert {r["doc_id"] for r in pick if not r["is_canonical"]} == {5}


def test_train_split_keeps_duplicates_together(spark, tmp_path):
    """samp_train_split keys the split on the CONTENT digest, so the
    planted exact-duplicate pair (docs 4 and 5) can never straddle
    train/test — the eval-leakage property id-keyed splits lack.
    Verified on the per-doc assignment (recomputing the entry's split
    expression over the tiny corpus)."""
    sf = _tiny_docs(spark, tmp_path)
    from pyspark.sql import functions as F

    from pe_firm_investment_database_pipeline_spark.plans import datapipe
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    manifest = datapipe.samp_train_split(spark, sf).collect()
    assert sum(r["n_docs"] for r in manifest) == 6
    bucket = F.expr(
        "CAST(conv(substring(md5(concat('split:', md5(text))), 1, 12),"
        " 16, 10) AS BIGINT) % 100"
    )
    per_doc = {
        r["doc_id"]: r["b"]
        for r in load_table(spark, sf, "documents")
        .select("doc_id", bucket.alias("b"))
        .collect()
    }
    assert per_doc[4] == per_doc[5]  # identical text -> identical split


def test_winnowing_short_docs(spark, tmp_path):
    """txt_winnowing on the degenerate corpus: <3-token docs have
    zero grams and zero fingerprints with NULL min/max (the guarded
    empty-array path — an unguarded hs column would hit Spark's
    descending sequence under ANSI); docs with fewer than w windows
    keep the single global min; the planted identical pair shares an
    identical fingerprint checksum (the winnowing guarantee)."""
    sf = _tiny_docs(spark, tmp_path)
    rows = {r["doc_id"]: r for r in textops.txt_winnowing(spark, sf).collect()}
    assert len(rows) == 6
    for did in (0, 1, 2):
        assert rows[did]["n_grams"] == 0 and rows[did]["n_fps"] == 0
        assert rows[did]["fp_min"] is None and rows[did]["fp_checksum"] == 0
    assert rows[3]["n_grams"] == 1 and rows[3]["n_fps"] == 1  # < w windows
    assert rows[4]["fp_checksum"] == rows[5]["fp_checksum"]  # identical docs
    assert rows[4]["n_fps"] >= 1


def test_text_scan_roundtrips_empty_doc(spark, tmp_path):
    """src_text_scan on the degenerate corpus: the EMPTY document
    must survive the text-format round trip (its line is 'id<TAB>'
    with nothing after) — 6 docs out, per-bucket char totals equal to
    the source lengths."""
    sf = _tiny_docs(spark, tmp_path)
    from pe_firm_investment_database_pipeline_spark.plans.io_ops import src_text_scan

    rows = src_text_scan(spark, sf).collect()
    assert sum(r["n_docs"] for r in rows) == 6
    total = sum(r["total_chars"] for r in rows)
    assert total == sum(len(t) for t in (
        "", "one", "two tokens", "three whole tokens",
        "now five tokens are here exactly yes",
        "now five tokens are here exactly yes",
    ))
