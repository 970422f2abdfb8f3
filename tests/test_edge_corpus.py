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
    df = spark.createDataFrame(rows, schema="doc_id long, text string, lang string")
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
