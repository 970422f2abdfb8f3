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


def test_sec_t_closeness_tvd_replay(spark, sf_dir):
    """TVD recomputed in Python from raw band histograms, including
    the inclusion-exclusion fold for bands absent from a class."""
    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _LDIV_BAND_C,
        _TCLOSE_T_PPM,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000)"
                f" div {_LDIV_BAND_C}"
            ).alias("band"),
        )
        .collect()
    )
    from collections import Counter

    g = Counter(r["band"] for r in rows)
    n_tot = len(rows)
    cls: dict = {}
    for r in rows:
        cls.setdefault((r["c_nationkey"], r["c_mktsegment"]), Counter())[
            r["band"]
        ] += 1
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in _Q["sec_t_closeness"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(cls)
    for key, hist in cls.items():
        n_c = sum(hist.values())
        num = sum(
            abs(hist.get(b, 0) * n_tot - gb * n_c) for b, gb in g.items()
        )
        tvd = num * 1_000_000 // (2 * n_c * n_tot)
        r = got[key]
        assert r["n_rows"] == n_c
        assert r["tvd_ppm"] == tvd
        assert r["t_ok"] == int(tvd <= _TCLOSE_T_PPM)


def test_ml_lift_gains_partitions_and_monotone_gains(spark, sf_dir):
    """Deciles partition the corpus, gains are monotone to 1e6, and
    no score cell straddles a band (grid-decile invariant)."""
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = sorted(
        _Q["ml_lift_gains"].fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    assert all(0 <= r["decile"] <= 9 for r in rows)
    gains = [r["gain_ppm"] for r in rows]
    assert gains == sorted(gains)
    assert gains[-1] == 1_000_000
    assert rows[-1]["cum_pos"] == sum(r["n_pos"] for r in rows)


def test_ml_target_encode_shrinks_toward_global_mean(spark, sf_dir):
    """Encoded means sit strictly between the raw category mean and
    the global mean (shrinkage), replayed exactly in Python."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _TENC_M,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    raw = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("t_c"),
        )
        .collect()
    )
    sums: dict = {}
    for r in raw:
        s, n = sums.get(r["o_orderpriority"], (0, 0))
        sums[r["o_orderpriority"]] = (s + r["t_c"], n + 1)
    gsum = sum(s for s, _ in sums.values())
    n_tot = sum(n for _, n in sums.values())
    gmean = gsum // n_tot
    got = {
        r["o_orderpriority"]: r
        for r in _Q["ml_target_encode"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(sums)
    for cat, (s, n) in sums.items():
        r = got[cat]
        assert r["n"] == n
        assert r["raw_mean_c"] == s // n
        assert r["enc_c"] == (s + _TENC_M * gmean) // (n + _TENC_M)
        lo, hi = sorted((r["raw_mean_c"], gmean))
        assert lo - 1 <= r["enc_c"] <= hi + 1  # integer-division slack


def test_txt_zipf_check_head_replay(spark, sf_dir):
    """Top-20 head replayed from raw token counts with the pinned
    (freq desc, token asc) tie order."""
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )
    import re
    from collections import Counter

    texts = (
        load_table(spark, sf_dir, "documents").select("text").collect()
    )
    counts = Counter()
    for r in texts:
        counts.update(re.findall(r"\S+", r["text"]))
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = sorted(
        _Q["txt_zipf_check"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    f1 = head[0][1]
    assert [r["token"] for r in rows] == [t for t, _ in head]
    for i, (r, (tok, f)) in enumerate(zip(rows, head), start=1):
        assert r["rank"] == i and r["freq"] == f
        assert r["rf"] == i * f
        assert r["zipf_ratio_ppm"] == i * f * 1_000_000 // f1


def test_evt_stickiness_dau_mau_replay(spark, sf_dir):
    """MAU replayed brute-force in Python: for every observed day,
    count users active in the trailing 30-day window — the interval
    sweep must match the naive definition exactly."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _MAU_WINDOW_D,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("unix_date(ts_date)").alias("day"))
        .distinct()
        .collect()
    )
    by_user: dict = {}
    days = set()
    for r in ud:
        by_user.setdefault(r["user_id"], set()).add(r["day"])
        days.add(r["day"])
    got = {
        r["day"]: r
        for r in _Q["evt_stickiness_dau_mau"].fn(spark, sf_dir).collect()
    }
    assert set(got) == days
    for d in days:
        dau = sum(1 for s in by_user.values() if d in s)
        mau = sum(
            1
            for s in by_user.values()
            if any(d - _MAU_WINDOW_D + 1 <= a <= d for a in s)
        )
        r = got[d]
        assert r["dau"] == dau
        assert r["mau"] == mau
        assert r["mau"] >= r["dau"] > 0
        assert r["stickiness_ppm"] == dau * 1_000_000 // mau


def test_evt_calendar_heatmap_partitions(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = _Q["evt_calendar_heatmap"].fn(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == total
    assert all(0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23 for r in rows)
    for r in rows:
        assert r["share_ppm"] == r["n"] * 1_000_000 // total


def test_sketch_cms_heavy_one_sided_error(spark, sf_dir):
    """CMS guarantee: est >= exact for every token; with a 16-bucket
    table and 31-token vocab at least one bucket collides, so SOME
    token must show a strictly positive overcount."""
    rows = _Q["sketch_cms_heavy"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r["bound_ok"] == 1 for r in rows)
    assert all(r["est"] >= r["freq"] for r in rows)
    assert all(r["overcount"] == r["est"] - r["freq"] for r in rows)
    assert any(r["overcount"] > 0 for r in rows)


def test_ml_cv_folds_exact_balance(spark, sf_dir):
    """Every (lang, fold) cell holds floor(n/k) or ceil(n/k) docs —
    the exact-balance property the stratified rank-mod gives."""
    from pe_firm_investment_database_pipeline_spark.plans.datapipe import (
        _CV_K,
    )

    rows = _Q["ml_cv_folds"].fn(spark, sf_dir).collect()
    assert rows
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, cells in by_lang.items():
        n_lang = cells[0]["n_lang"]
        assert sum(c["n_docs"] for c in cells) == n_lang
        for c in cells:
            assert c["n_docs"] in (n_lang // _CV_K, -(-n_lang // _CV_K))
            assert c["balanced_ok"] == 1
