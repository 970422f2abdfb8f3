"""Behavior pins for round-8 operators — mechanism-level assertions
beyond the registry-wide oracle parity sweep (tests/test_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pe_firm_investment_database_pipeline_spark.plans import all_queries

_Q = all_queries()


def test_dq_order_totals_recon_accounting_identities(spark, sf_dir):
    """Per-priority counters must reconcile against directly-computed
    table totals: order counts partition, n_exact <= n_orders, and
    |net| <= abs delta by the triangle inequality."""
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = _Q["dq_order_totals_recon"].fn(spark, sf_dir).collect()
    n_orders_total = load_table(spark, sf_dir, "orders").count()
    n_items_total = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_orders"] for r in rows) == n_orders_total
    # every lineitem's order exists (fixture FK-clean), so item counts
    # partition too
    assert sum(r["n_items"] for r in rows) == n_items_total
    for r in rows:
        assert 0 <= r["n_exact"] <= r["n_orders"]
        assert 0 <= r["n_childless"] <= r["n_orders"]
        assert abs(r["net_delta_c"]) <= r["abs_delta_c"]


def test_graph_neighbor_jaccard_replay(spark, sf_dir):
    """Python replay of J = |N(x) cap N(y)| / |N(x) cup N(y)| over the
    same LSH edge set, including the inclusion-exclusion union size."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        dedup_minhash_lsh,
    )

    edges = {
        tuple(sorted((r["doc1"], r["doc2"])))
        for r in dedup_minhash_lsh(spark, sf_dir)
        .where(F.col("est_jaccard") >= 0.5)
        .collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {
        (r["doc1"], r["doc2"]): r
        for r in _Q["graph_neighbor_jaccard"].fn(spark, sf_dir).collect()
    }
    import itertools

    all_pairs = set()
    for ns in adj.values():
        for x, y in itertools.combinations(sorted(ns), 2):
            all_pairs.add((x, y))
    assert set(got) == all_pairs
    for (x, y), r in got.items():
        inter = len(adj[x] & adj[y])
        union = len(adj[x] | adj[y])
        assert r["inter"] == inter
        assert r["deg1"] == len(adj[x]) and r["deg2"] == len(adj[y])
        assert union == r["deg1"] + r["deg2"] - inter
        assert r["jaccard_ppm"] == inter * 1_000_000 // union
        assert 0 < r["jaccard_ppm"] <= 1_000_000


def test_ts_theil_sen_replay_and_robustness(spark, sf_dir):
    """Doubled-median of pairwise slopes replayed in Python with
    trunc-toward-zero division — the sign-split contract."""
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.expr("unix_date(ts_date)").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["y"]))
    got = {r["event_type"]: r for r in _Q["ts_theil_sen"].fn(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, pts in series.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                num = (pts[j][1] - pts[i][1]) * 1_000_000
                den = pts[j][0] - pts[i][0]
                q = abs(num) // den
                slopes.append(q if num >= 0 else -q)
        slopes.sort()
        n = len(slopes)
        med2 = (
            2 * slopes[n // 2]
            if n % 2 == 1
            else slopes[n // 2 - 1] + slopes[n // 2]
        )
        assert got[et]["n_pairs"] == n
        assert got[et]["slope_ppm_x2"] == med2


def test_ml_chi2_feature_select_contingency_replay(spark, sf_dir):
    """chi2_milli recomputed from scratch contingency tables; top-5
    per language with (chi2 desc, token asc) tie order."""
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    import re

    tok_docs = [
        (r["doc_id"], r["lang"], set(re.findall(r"\S+", r["text"])))
        for r in docs
    ]
    n_tot = len(tok_docs)
    c_tot: dict = {}
    t_tot: dict = {}
    a_cnt: dict = {}
    for _, lang, toks in tok_docs:
        c_tot[lang] = c_tot.get(lang, 0) + 1
        for t in toks:
            t_tot[t] = t_tot.get(t, 0) + 1
            a_cnt[(lang, t)] = a_cnt.get((lang, t), 0) + 1
    expect: dict = {}
    for (lang, t), a in a_cnt.items():
        tt, ct = t_tot[t], c_tot[lang]
        if tt < n_tot and ct < n_tot:
            d = n_tot - tt - ct + a
            b, c = tt - a, ct - a
            chi2 = (
                1000 * n_tot * (a * d - b * c) ** 2
                // (tt * (n_tot - tt) * ct * (n_tot - ct))
            )
        else:
            chi2 = 0
        expect.setdefault(lang, []).append((-chi2, t, a))
    got = _Q["ml_chi2_feature_select"].fn(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["rank"])
        top = sorted(expect[lang])[:5]
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        for r, (neg_chi2, tok, a) in zip(rows, top):
            assert r["token"] == tok
            assert r["chi2_milli"] == -neg_chi2
            assert r["a_docs"] == a
