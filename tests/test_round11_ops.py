"""Behavior pins for round-11 operators — mechanism-level assertions
beyond the registry-wide oracle parity sweep (tests/test_parity.py).

- dedup_passage_runs: every emitted passage is a REAL token-for-token
  match at the claimed positions, and maximal (extending one token in
  either direction breaks the match or leaves a document).
- fin_irr_bisection: 12 rounds land a width-1 bracket whose sign
  invariant (s(lo) >= 0 > s(hi)) replays in exact Python ints.
- ml_boost_stumps: the weight-doubling recurrence is visible in the
  ledger (wtot_{r+1} = wtot_r + werr_r) and round 1 beats chance.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pe_firm_investment_database_pipeline_spark.plans import all_queries
from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

_Q = all_queries()


def _doc_tokens(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    return {r["doc_id"]: re.findall(r"\S+", r["text"]) for r in rows}


def test_passage_runs_match_and_are_maximal(spark, sf_dir):
    out = _Q["dedup_passage_runs"].fn(spark, sf_dir).collect()
    assert out, "fixture corpus plants clone passages; none found"
    toks = _doc_tokens(spark, sf_dir)
    for r in out:
        assert r["doc1"] < r["doc2"]
        assert r["n_tokens"] >= 12
        t1, t2 = toks[r["doc1"]], toks[r["doc2"]]
        s1, s2, n = r["start1"] - 1, r["start2"] - 1, r["n_tokens"]
        assert t1[s1 : s1 + n] == t2[s2 : s2 + n], (r, "span mismatch")
        # maximality: one more token on either side breaks the match
        # or runs off a document (df-banded grams can also end a run,
        # so only assert when both extensions exist AND match — that
        # would mean the run should have continued)
        if s1 > 0 and s2 > 0:
            assert t1[s1 - 1] != t2[s2 - 1], (r, "left-extensible")
        if s1 + n < len(t1) and s2 + n < len(t2):
            assert t1[s1 + n] != t2[s2 + n], (r, "right-extensible")


def test_irr_bracket_and_sign_replay(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _IRR_BASE_YEAR,
        _IRR_HORIZON,
        _IRR_OUTLAY_PCT,
    )

    rows = _Q["fin_irr_bisection"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["irr_hi_ppk"] == r["irr_ppk"] + 1, "12 rounds -> width-1"
        assert 0 <= r["irr_ppk"] < 1000
        assert r["outlay_c"] == (_IRR_OUTLAY_PCT * r["nominal_c"]) // 100

    # exact-integer sign replay for one nation: s(lo) >= 0 > s(hi)
    target = rows[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.expr("year(CAST(l_shipdate AS DATE))") - _IRR_BASE_YEAR).alias("t"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cf_c"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == target["n_name"]
    )
    grid = {
        r["t"]: r["cf"]
        for r in li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .where((F.col("t") >= 1) & (F.col("t") <= _IRR_HORIZON))
        .groupBy("t")
        .agg(F.sum("cf_c").alias("cf"))
        .collect()
    }
    grid[0] = -((_IRR_OUTLAY_PCT * sum(grid.values())) // 100)

    def sign_poly(rate: int) -> int:
        return sum(
            cf * 1000**t * (1000 + rate) ** (_IRR_HORIZON - t)
            for t, cf in grid.items()
        )

    assert sign_poly(target["irr_ppk"]) >= 0
    assert sign_poly(target["irr_hi_ppk"]) < 0


def test_boost_ledger_weight_recurrence(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _BOOST_CAND,
    )

    rows = sorted(
        _Q["ml_boost_stumps"].fn(spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [1, 2, 3]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert rows[0]["wtot"] == n_docs, "round-1 weights are all 1"
    for prev, nxt in zip(rows, rows[1:]):
        # doubling misclassified weight adds exactly werr to the pool
        assert nxt["wtot"] == prev["wtot"] + prev["werr"]
    for r in rows:
        assert (r["feat"], r["thr"], r["pol"]) in _BOOST_CAND
        assert r["err_ppm"] == (r["werr"] * 1_000_000) // r["wtot"]
    # the planted n_chars signal: round 1 is clearly better than chance
    assert rows[0]["err_ppm"] < 300_000


def test_amortization_replays_in_python(spark, sf_dir):
    """Every nation's 48-month schedule replays exactly in plain
    Python ints from (principal, pmt), and the ledger identities
    hold: principal = interest + payments-net, payoff month in
    bounds, balance zero iff paid off."""
    rows = _Q["fin_loan_amortization"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["principal_c"] == (80 * r["nominal_c"]) // 100
        assert r["pmt_c"] == r["principal_c"] // (24 + r["nominal_c"] % 13)
        bal, interest, payoff = r["principal_c"], 0, None
        for m in range(1, 49):
            if bal == 0:
                break
            i = bal // 100
            interest += i
            nb = max(bal + i - r["pmt_c"], 0)
            if nb == 0 and payoff is None:
                payoff = m
            bal = nb
        assert bal == r["final_balance_c"]
        assert interest == r["total_interest_c"]
        assert (payoff if payoff is not None else -1) == r["payoff_month"]
        assert 24 <= r["payoff_month"] <= 48


def test_naive_bayes_confusion_is_consistent_and_beats_majority(
    spark, sf_dir
):
    rows = _Q["ml_naive_bayes"].fn(spark, sf_dir).collect()
    langs = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_docs = sum(langs.values())
    # confusion matrix covers every doc exactly once
    assert sum(r["n_docs"] for r in rows) == n_docs
    per_actual = {}
    for r in rows:
        assert r["lang_actual"] in langs and r["lang_pred"] in langs
        per_actual[r["lang_actual"]] = (
            per_actual.get(r["lang_actual"], 0) + r["n_docs"]
        )
    assert per_actual == langs
    correct = sum(
        r["n_docs"] for r in rows if r["lang_actual"] == r["lang_pred"]
    )
    assert correct > max(langs.values()), (
        "NB must beat the majority-class baseline"
    )


def test_aes_roundtrip_invariants(spark, sf_dir):
    rows = _Q["sec_aes_roundtrip"].fn(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == n
    for r in rows:
        assert r["roundtrip_ok"] == 1
        assert r["wrong_key_recovers"] == 0
        assert r["ct_len"] % 16 == 0 and r["ct_len"] > 0


def test_passage_overlap_consistent_with_runs(spark, sf_dir):
    runs = _Q["dedup_passage_runs"].fn(spark, sf_dir).collect()
    overlap = _Q["dedup_passage_overlap"].fn(spark, sf_dir).collect()
    by_pair = {}
    for r in runs:
        k = (r["doc1"], r["doc2"])
        by_pair.setdefault(k, []).append(r["n_tokens"])
    assert len(overlap) == len(by_pair)
    for o in overlap:
        lens = by_pair[(o["doc1"], o["doc2"])]
        assert o["n_runs"] == len(lens)
        assert o["run_tokens"] == sum(lens)
        assert o["max_run"] == max(lens)
        assert 0 < o["containment_ppm"]


def test_ivm_merge_equals_full_recompute(spark, sf_dir):
    """The IVM theorem end-to-end: merge(standing view, delta agg)
    equals a from-scratch recompute, and the standing view is served
    from the memoized checkpoint on the second call (same Python
    object — the 'read from disk, never recompute' property)."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _ivm_base,
    )

    rows = {r["event_type"]: r for r in _Q["ivm_agg_merge"].fn(spark, sf_dir).collect()}
    full = {
        r["event_type"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        )
        .collect()
    }
    assert set(rows) == set(full)
    for et, r in rows.items():
        assert r["n_base"] + r["n_delta"] == r["n_total"] == full[et]["n"]
        assert r["sum_total_c"] == full[et]["s"]
        assert r["n_base"] > 0 and r["n_delta"] > 0, "both epochs non-empty"
    assert _ivm_base(spark, sf_dir) is _ivm_base(spark, sf_dir)


def test_wfq_head_realizes_mixture(spark, sf_dir):
    """WFQ invariants: dense positions, nondecreasing virtual finish
    times, each domain consumed as a PREFIX of its in-domain order
    (ks are exactly 1..count), and the head is a genuine mixture
    (many domains present), not one domain's batch."""
    rows = sorted(
        _Q["samp_interleave_wfq"].fn(spark, sf_dir).collect(),
        key=lambda r: r["pos"],
    )
    assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(a["vft"] <= b["vft"] for a, b in zip(rows, rows[1:]))
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["k"])
    for src, ks in by_src.items():
        assert sorted(ks) == list(range(1, len(ks) + 1)), (
            src,
            "not a prefix of the domain stream",
        )
    assert len(by_src) >= 15, "head must realize the mixture"


def test_dsir_ranking_favors_target_domain(spark, sf_dir):
    """The importance ranking must over-represent the target language
    relative to its corpus share (the DSIR point), weights must be
    sorted descending with the doc_id tiebreak, and every weight must
    replay the tf x (bits_raw - bits_tgt) sum shape (non-trivial,
    bounded)."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _DSIR_TARGET_LANG,
        _DSIR_TOP,
    )

    rows = _Q["samp_dsir_importance"].fn(spark, sf_dir).collect()
    assert len(rows) == _DSIR_TOP
    ws = [(r["w_microbits"], r["doc_id"]) for r in rows]
    assert ws == sorted(ws, key=lambda t: (-t[0], t[1]))
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    n_tgt = docs.where(F.col("lang") == _DSIR_TARGET_LANG).count()
    top_tgt = sum(1 for r in rows if r["lang"] == _DSIR_TARGET_LANG)
    assert top_tgt / len(rows) > n_tgt / n, (
        "top-k must over-represent the target domain"
    )


def test_semdedup_finds_planted_copies_with_clusters(spark, sf_dir):
    """Every original must rediscover exactly its planted copy
    (keeper + 1e6 == dup — identical vectors always share cluster
    AND cell), and the cluster bookkeeping must be consistent with
    the shared k-means front."""
    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        _km_assign,
    )

    rows = _Q["dedup_semdedup"].fn(spark, sf_dir).collect()
    n_vecs = _km_assign(spark, sf_dir).count()
    assert len(rows) == n_vecs
    asg = {
        r["vec_id"]: r["cluster_id"]
        for r in _km_assign(spark, sf_dir).select("vec_id", "cluster_id").collect()
    }
    sizes = {}
    for c in asg.values():
        sizes[c] = sizes.get(c, 0) + 1
    for r in rows:
        assert r["dup_id"] == r["keeper_id"] + 1_000_000
        assert r["cosine"] >= 0.9999
        assert r["cluster_id"] == asg[r["keeper_id"]]
        assert r["n_cluster"] == sizes[r["cluster_id"]]


def test_nn_matching_replays_in_python(spark, sf_dir):
    """Brute-force 1-NN caliper matching in plain Python over the
    collected user table must reproduce the ledger exactly — the
    blocked join is an exactness-preserving optimization, not an
    approximation."""
    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _NN_BLK,
    )

    row = _Q["evt_att_nn_matching"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(0)
        .alias("v"),
    )
    mid = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2")).collect()[0][0]
    users = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts_us") < mid, F.col("v")).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("ts_us") >= mid, F.col("v")).otherwise(0)).alias("y"),
        )
        .collect()
    )
    treated = [(u["user_id"], u["x"], u["y"]) for u in users if u["user_id"] % 2 == 1]
    control = [(u["user_id"], u["x"], u["y"]) for u in users if u["user_id"] % 2 == 0]
    s_delta, s_adx, n_matched = 0, 0, 0
    for tid, tx, ty in treated:
        cands = [
            (abs(tx - cx), cx, cid, cy)
            for cid, cx, cy in control
            if abs(tx - cx) <= _NN_BLK
        ]
        if not cands:
            continue
        adx, cx, cid, cy = min(cands)
        n_matched += 1
        s_delta += ty - cy
        s_adx += adx
    assert row["n_treated"] == len(treated)
    assert row["n_matched"] == n_matched
    assert row["n_unmatched"] == len(treated) - n_matched
    att = (
        (s_delta * 1000) // n_matched
        if s_delta >= 0
        else -((-s_delta * 1000) // n_matched)
    )
    assert row["att_mc"] == att
    assert row["mean_adx_mc"] == (s_adx * 1000) // n_matched
    assert row["n_matched"] > 0


def test_binseg_levels_nest(spark, sf_dir):
    """Level-2 splits live strictly inside their level-1 segment,
    every event type emits exactly one L1 row, and each segment's
    width bookkeeping is consistent (children partition the
    parent)."""
    rows = _Q["ts_changepoint_binseg"].fn(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        l1 = [r for r in rs if r["level"] == 1]
        l2 = {r["segment"]: r for r in rs if r["level"] == 2}
        assert len(l1) == 1
        d1 = l1[0]["split_day"]
        assert set(l2) <= {0, 1}
        if 0 in l2:
            assert l2[0]["split_day"] <= d1
        if 1 in l2:
            assert l2[1]["split_day"] > d1
        assert sum(r["seg_days"] for r in l2.values()) == l1[0]["seg_days"]
        for r in rs:
            assert r["score"] >= 0
