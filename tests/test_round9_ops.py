"""Behavior pins for round-9 operators — mechanism-level assertions
beyond the registry-wide oracle parity sweep (tests/test_parity.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pe_firm_investment_database_pipeline_spark.plans import all_queries

_Q = all_queries()


def test_txt_doc_perplexity_log_table_is_exact_floor():
    """The shared mantissa table must be floor(log2(m/64) * 1e6) for
    every step — the entry's exactness claim rests on both engines
    consuming these literals, so the literals themselves are pinned
    against a fresh libm evaluation here (test-side only)."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _LOG2U_TABLE,
    )

    assert len(_LOG2U_TABLE) == 64
    assert _LOG2U_TABLE[0] == 0
    for i, v in enumerate(_LOG2U_TABLE):
        assert v == math.floor(math.log2((64 + i) / 64) * 1_000_000)
    assert all(b > a for a, b in zip(_LOG2U_TABLE, _LOG2U_TABLE[1:]))


def test_txt_doc_perplexity_python_replay(spark, sf_dir):
    """Full Python replay of the exact log decomposition on a sample
    of documents: train the bigram LM from the corpus, recompute each
    sampled doc's micro-bit cross-entropy with plain ints, and demand
    equality with the plan's output."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _LOG2U_TABLE,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {
        r["doc_id"]: r
        for r in _Q["txt_doc_perplexity"].fn(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"].split()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1

    def bits(a: str, b: str) -> int:
        ps = max((c2[(a, b)] * 1048576) // c1[a], 1)
        e = ps.bit_length() - 1
        m = (ps * 64) // (1 << e)
        return 20_000_000 - (e * 1_000_000 + _LOG2U_TABLE[m - 64])

    checked = 0
    for doc_id, toks in sorted(docs.items())[:25]:
        if len(toks) < 2:
            assert doc_id not in rows
            continue
        bs = [bits(a, b) for a, b in zip(toks, toks[1:])]
        r = rows[doc_id]
        assert r["n_bigrams"] == len(bs)
        assert r["xent_microbits"] == sum(bs) // len(bs), doc_id
        checked += 1
    assert checked >= 10


def test_rag_query_expansion_improves_or_matches_recall_shape(spark, sf_dir):
    """Structural pins: 10 ranked rows, dense ranks, scores
    non-increasing, and the slate differs from plain BM25's only by
    re-scoring (expansion can reorder/replace, but the top hit for
    the original query must still score > 0 in the expanded run —
    original terms kept full weight)."""
    exp = _Q["rag_query_expansion"].fn(spark, sf_dir).collect()
    assert len(exp) == 10
    assert [r["rank"] for r in exp] == list(range(1, 11))
    scores = [r["bm25e_scaled"] for r in exp]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    base = _Q["rag_bm25_topk"].fn(spark, sf_dir).collect()
    base_top = {r["doc_id"] for r in base[:3]}
    # feedback docs keep scoring: at least one of the three feedback
    # docs survives in the expanded top-10 (they match the original
    # terms by construction)
    assert base_top & {r["doc_id"] for r in exp}


def test_fin_avg_cost_basis_python_replay(spark, sf_dir):
    """Greedy replay of the monthly weighted-average pool per
    supplier with plain ints — receipts before issues, truncating
    cost relief, proportional revenue, unfilled audit."""
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {
        r["l_suppkey"]: r
        for r in _Q["fin_avg_cost_basis"].fn(spark, sf_dir).collect()
    }
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            F.expr(
                "year(CAST(l_shipdate AS DATE)) * 12"
                " + month(CAST(l_shipdate AS DATE))"
            ).alias("ym"),
            (F.col("l_returnflag") == "R").alias("is_issue"),
            F.expr("CAST(round(l_quantity) AS BIGINT)").alias("q"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
                "p_c"
            ),
        )
        .collect()
    )
    flows: dict[int, dict[int, list[int]]] = {}
    for r in li:
        f = flows.setdefault(r["l_suppkey"], {}).setdefault(
            r["ym"], [0, 0, 0, 0]
        )
        if r["is_issue"]:
            f[2] += r["q"]
            f[3] += r["p_c"]
        else:
            f[0] += r["q"]
            f[1] += r["p_c"]
    for supp, months in sorted(flows.items())[:20]:
        qty = cost = realized = unfilled = 0
        for ym in sorted(months):
            bq, bc, sq, sr = months[ym]
            qty += bq
            cost += bc
            fill = min(sq, qty)
            if fill > 0:
                cos = (cost * fill) // qty
                rev = (sr * fill) // sq
                realized += rev - cos
                cost -= cos
                qty -= fill
            unfilled += sq - fill
        r = rows[supp]
        assert r["n_months"] == len(months)
        assert r["end_qty"] == qty
        assert r["end_cost_c"] == cost
        assert r["realized_pnl_c"] == realized
        assert r["unfilled_qty"] == unfilled


def test_ts_kalman_gain_converges_to_steady_state(spark, sf_dir):
    """With Q=1.0, R=4.0 the steady-state gain solves
    k = (p+Q)/((p+Q)+R) with p = (1-k)(p+Q): p* = (Q + sqrt(Q² +
    4QR))/2 ≈ 2.562, k* ≈ 0.3904. After a day-grid-long run every
    type's gain must sit within one truncation step of that fixed
    point, and the variance must be far below the R seed."""
    rows = _Q["ts_kalman_1d"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 2
        assert 385_000 <= r["gain_ppm"] <= 395_000, r
        assert 0 < r["var_milli"] < 4000, r


def test_sec_dp_geometric_mechanism_properties(spark, sf_dir):
    """The release must (a) never publish a sub-threshold count,
    (b) stay within ±8 of the true histogram, and (c) actually add
    nonzero noise somewhere (a no-op mechanism is not a mechanism)."""
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = _Q["sec_dp_geometric"].fn(spark, sf_dir).collect()
    truth = {
        (r["event_type"], r["day"]): r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.expr("unix_date(ts_date)").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(rows) == len(truth)
    noise_seen = set()
    for r in rows:
        n = truth[(r["event_type"], r["day"])]
        if r["suppressed"]:
            assert r["noisy_count"] is None
        else:
            assert r["noisy_count"] >= 10
            assert abs(r["noisy_count"] - n) <= 8
            noise_seen.add(r["noisy_count"] - n)
    assert noise_seen - {0}, "mechanism never added noise"


def test_sec_dp_geometric_bounds_table():
    """The 16 inverse-CDF boundaries must be the exact floor-scaled
    cumulative masses of the truncated alpha=1/2 discrete Laplace."""
    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _DP_BOUNDS,
        _DP_CUM,
    )

    weights = [2 ** (8 - abs(j)) for j in range(-8, 9)]
    assert sum(weights) == 766
    cum = 0
    expect = []
    for w in weights[:-1]:
        cum += w
        expect.append(cum)
    assert _DP_CUM == expect
    assert _DP_BOUNDS == [(1 << 30) * c // 766 for c in expect]


def test_ml_decision_stump_recovers_planted_feature(spark, sf_dir):
    """The label is (n_chars >= 300) with 25% hash flips, and the
    feature set includes an uninformative control — the stump must
    pick n_chars with a threshold near the planted boundary and a
    gain in the flip-discounted band (perfect split = 500k ppm,
    25% flips put the ceiling near (1-2*0.25)^2 * 500k = 125k)."""
    rows = _Q["ml_decision_stump"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["feature"] == "n_chars"
    assert 280 <= r["split_at"] <= 320, r
    assert 40_000 <= r["gain_ppm"] <= 130_000, r
    assert 0 < r["n_left"] < r["n"]
    assert 0 <= r["pos_left"] <= r["n_left"]
