"""Behavioral pins for the round-6 operators — properties their
DuckDB oracles can NOT express (parity is covered for every entry by
tests/test_parity.py): diversity semantics of the MMR slate, the
incremental-CC decomposition actually splitting work, the recursive
chunker's size bound, and the KMV estimator's accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mmr_slate_is_diverse_subset(spark, sf_dir):
    """The MMR picks must (a) be 5 distinct members of the relevance
    top-20, (b) start with the single most relevant vector, and (c)
    never exceed the pure-relevance slate's internal redundancy —
    the property the operator exists to enforce."""
    from pe_firm_investment_database_pipeline_spark.plans.retrieval import (
        _MMR_CAND,
        _MMR_K,
        rag_mmr_rerank,
    )
    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        _DOT,
        _emb_q,
    )

    rows = rag_mmr_rerank(spark, sf_dir).orderBy("mmr_rank").collect()
    assert len(rows) == _MMR_K
    picked = [r["vec_id"] for r in rows]
    assert len(set(picked)) == _MMR_K

    emb = _emb_q(spark, sf_dir)
    qv = emb.where(F.col("vec_id") == 0).select(
        F.col("q").alias("qq"), F.col("nrm").alias("qnrm")
    )
    rel = F.expr(_DOT.format(a="q", b="qq")).cast("double") / (
        F.sqrt(F.col("nrm").cast("double"))
        * F.sqrt(F.col("qnrm").cast("double"))
    )
    top = (
        emb.where(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .select("vec_id", rel.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(_MMR_CAND)
        .collect()
    )
    top_ids = [r["vec_id"] for r in top]
    assert set(picked) <= set(top_ids)
    assert picked[0] == top_ids[0]

    def max_pairwise_sim(ids):
        sub = emb.where(F.col("vec_id").isin(*ids))
        a = sub.select(
            F.col("vec_id").alias("ai"),
            F.col("q").alias("qa"),
            F.col("nrm").alias("na"),
        )
        b = sub.select(
            F.col("vec_id").alias("bi"),
            F.col("q").alias("qb"),
            F.col("nrm").alias("nb"),
        )
        pair = a.join(b, F.col("ai") < F.col("bi")).select(
            (
                F.expr(_DOT.format(a="qa", b="qb")).cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                )
            ).alias("s")
        )
        return pair.agg(F.max("s")).collect()[0][0]

    assert max_pairwise_sim(picked) <= max_pairwise_sim(
        top_ids[:_MMR_K]
    ) + 1e-12


def test_cc_incremental_splits_work(spark, sf_dir):
    """The incremental decomposition is only worth its name if the
    untouched partition is non-trivial: both relabelled=True and
    =False vertices must exist, labels must agree with the full-graph
    fixpoint, and the relabelled flag must be constant per cluster."""
    from pe_firm_investment_database_pipeline_spark.plans.components import (
        dedup_connected_components,
        graph_cc_incremental,
    )

    inc = graph_cc_incremental(spark, sf_dir)
    counts = {
        r["relabelled"]: r["n"]
        for r in inc.groupBy("relabelled").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0, counts

    full = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_connected_components(spark, sf_dir).collect()
    }
    got = {r["doc_id"]: r["cluster_id"] for r in inc.collect()}
    assert got == full

    per_cluster = (
        inc.groupBy("cluster_id")
        .agg(F.countDistinct("relabelled").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert per_cluster == 1


def test_recursive_split_bounds_and_coverage(spark, sf_dir):
    """Every chunk respects the character bound, and per doc the
    chunk characters sum to the document length minus one removed
    sentence-delimiter space per split point (the '. ' -> '.<mark>'
    replacement drops the space from the reassembled text)."""
    from pe_firm_investment_database_pipeline_spark.plans.datapipe import (
        _SPLIT_MAX,
        chunk_recursive_split,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    ch = chunk_recursive_split(spark, sf_dir)
    assert ch.where(F.col("n_chars") > _SPLIT_MAX).count() == 0

    got = {
        r["doc_id"]: (r["n"], r["chars"])
        for r in ch.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").alias("len"),
        F.size(F.expr(r"split(text, '\\. ')")).alias("n_sents"),
    )
    for r in d.collect():
        n_chunks, chars = got[r["doc_id"]]
        removed_spaces = r["n_sents"] - 1
        assert chars == r["len"] - removed_spaces, r["doc_id"]
        assert n_chunks >= r["n_sents"]


def test_kmv_estimate_within_rsd(spark, sf_dir):
    """KMV with k=64 has relative standard deviation ~ 1/sqrt(k-2) ~
    12.7%; the per-type estimate must land within 4 sigma of the
    exact distinct count (and be EXACT when the type has < k distinct
    users)."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _KMV_K,
        sketch_kmv_distinct,
    )

    for r in sketch_kmv_distinct(spark, sf_dir).collect():
        exact, est = r["exact_distinct"], r["kmv_estimate"]
        if exact < _KMV_K:
            assert est == exact, r
        else:
            assert abs(est - exact) <= 0.51 * exact, r


def test_class_balance_caps_every_class(spark, sf_dir):
    """Every class keeps EXACTLY the minority count (deterministic
    exact-k, not rate-based), and the total equals classes * cap."""
    from pe_firm_investment_database_pipeline_spark.plans.datapipe import (
        samp_class_balance,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = samp_class_balance(spark, sf_dir).collect()
    cap = min(
        r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert rows and all(r["n_kept"] == cap for r in rows)


def test_kmv_setops_estimator_sanity(spark, sf_dir):
    """Sketch-algebra invariants the oracle can't see as invariants:
    j_hits <= k_used, intersection estimate <= union estimate, union
    estimate within 4 sigma of the exact union, and the Jaccard-based
    intersection estimate lands within a generous factor of exact
    (intersection estimates compound two sketch errors)."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _KMV_K,
        sketch_kmv_setops,
    )

    for r in sketch_kmv_setops(spark, sf_dir).collect():
        assert r["j_hits"] <= r["k_used"] <= _KMV_K
        assert r["inter_est"] <= r["union_est"]
        if r["exact_union"] >= _KMV_K:
            assert abs(r["union_est"] - r["exact_union"]) <= 0.51 * r[
                "exact_union"
            ], r
        else:
            assert r["union_est"] == r["exact_union"], r
        if r["exact_inter"] >= _KMV_K:
            assert (
                0.3 * r["exact_inter"]
                <= r["inter_est"]
                <= 2.5 * r["exact_inter"]
            ), r


def test_max_drawdown_invariants_and_replay(spark, sf_dir):
    """Drawdown >= 0, peak >= final equity, and an independent pandas
    replay of one user's series reproduces the exact cents numbers."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        win_max_drawdown,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["user_id"]: r for r in win_max_drawdown(spark, sf_dir).collect()}
    assert rows and all(
        r["max_drawdown_c"] >= 0 and r["max_equity_c"] >= r["final_equity_c"]
        for r in rows.values()
    )

    uid = min(rows)
    pdf = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") == uid)
        .select(
            "ts_us",
            "event_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        )
        .where(F.col("v").isNotNull())
        .orderBy("ts_us", "event_id")
        .toPandas()
    )
    equity = pdf["v"].cumsum()
    peak = equity.cummax()
    r = rows[uid]
    assert r["n_events"] == len(pdf)
    assert r["final_equity_c"] == int(equity.iloc[-1])
    assert r["max_equity_c"] == int(equity.max())
    assert r["max_drawdown_c"] == int((peak - equity).max())


def test_linreg_trend_matches_numpy(spark, sf_dir):
    """slope_den >= 0 everywhere, and slope_num/slope_den equals the
    float OLS slope from numpy's lstsq for a sample of users."""
    import numpy as np

    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _LINREG_DAY0,
        agg_linreg_trend,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["user_id"]: r for r in agg_linreg_trend(spark, sf_dir).collect()}
    assert rows and all(r["slope_den"] >= 0 for r in rows.values())

    sample = sorted(rows)[:3]
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isin([int(u) for u in sample]))
        .select(
            "user_id",
            F.expr(f"unix_date(ts_date) - {_LINREG_DAY0}").alias("d"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        )
        .toPandas()
    )
    for uid in sample:
        g = ev[ev["user_id"] == uid]
        r = rows[uid]
        if r["slope_den"] == 0:
            assert r["slope_ppm"] is None
            continue
        slope = np.polyfit(g["d"].to_numpy(float), g["v"].to_numpy(float), 1)[0]
        assert abs(r["slope_num"] / r["slope_den"] - slope) < 1e-6
        num, den = r["slope_num"] * 1_000_000, r["slope_den"]
        trunc = abs(num) // abs(den) * (1 if (num >= 0) == (den >= 0) else -1)
        assert r["slope_ppm"] == trunc  # both engines truncate toward zero


def test_autocorr_r2_bounded(spark, sf_dir):
    """|r| <= 1 so the signed r2 must live in [-1e6, 1e6]; variance
    numerators are never negative; pair counts are series length - 1."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        ts_autocorr,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = ts_autocorr(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["varx_num"] >= 0 and r["vary_num"] >= 0
        if r["r2_signed_ppm"] is not None:
            assert -1_000_000 <= r["r2_signed_ppm"] <= 1_000_000

    counts = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_pairs"] == counts[r["user_id"]] - 1


def test_heavy_hitters_candidates_are_superset(spark, sf_dir):
    """The Misra-Gries stage must emit a candidate SUPERSET of the
    true heavy hitters, and the confirmed output must equal the exact
    frequency-threshold set computed independently."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _HH_K,
        _TOKENS,
        sketch_freq_heavy,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(_TOKENS)).alias("token"))
    )
    counts = {
        r["token"]: r["n"]
        for r in words.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())
    exact_hh = {t for t, c in counts.items() if c * _HH_K > n_total}

    rows = sketch_freq_heavy(spark, sf_dir).collect()
    got = {r["token"]: r["freq"] for r in rows}
    assert set(got) == exact_hh
    assert all(counts[t] == f for t, f in got.items())
    assert all(r["n_total"] == n_total for r in rows)


def test_common_neighbors_replay_on_graph(spark, sf_dir):
    """Replay the scores driver-side from the edge list: every output
    pair's common-neighbor count, degrees, and is_edge flag must match
    a networkx-free adjacency-dict recomputation."""
    from pe_firm_investment_database_pipeline_spark.plans.components import (
        graph_common_neighbors,
    )
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        dedup_minhash_lsh,
    )

    edges = {
        (min(r["doc1"], r["doc2"]), max(r["doc1"], r["doc2"]))
        for r in dedup_minhash_lsh(spark, sf_dir)
        .where(F.col("est_jaccard") >= 0.5)
        .collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    rows = graph_common_neighbors(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        x, y = r["doc1"], r["doc2"]
        assert x < y
        cn = len(adj[x] & adj[y])
        assert cn == r["common_neighbors"] > 0
        assert r["is_edge"] == ((x, y) in edges)
        assert r["deg1"] == len(adj[x]) and r["deg2"] == len(adj[y])
        seen.add((x, y))
    # completeness: every pair sharing a neighbor is in the output
    expected = {
        (x, y)
        for m, ns in adj.items()
        for x in ns
        for y in ns
        if x < y
    }
    assert seen == expected


def test_salted_join_spreads_and_preserves(spark, sf_dir):
    """The salted plan must (a) contain no broadcast join, (b) carry
    the salt into both shuffle keys, and (c) equal the unsalted
    aggregate exactly."""
    from pe_firm_investment_database_pipeline_spark.plans.relational import (
        join_salted_skew,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    df = join_salted_skew(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan

    got = {
        r["p_brand"]: (r["n_items"], r["revenue"]) for r in df.collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.expr("CAST(round(l_extendedprice*100) AS BIGINT)").alias("c")
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = {
        r["p_brand"]: (r["n"], r["rev"])
        for r in li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("c") / 100.0).alias("rev"),
        )
        .collect()
    }
    assert got == plain


def test_kmeans_improves_and_is_locally_optimal(spark, sf_dir):
    """Lloyd invariants beyond parity: every vector is assigned to
    its nearest final-iteration centroid (the plan's own argmin), the
    total inertia after iteration 2 is <= the inertia of assigning
    everyone to iteration-1 centroids, and exactly K clusters with
    every vector covered."""
    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        _KM_K,
        ml_kmeans_fixed,
        _emb_q,
    )

    rows = ml_kmeans_fixed(spark, sf_dir).collect()
    n_vecs = _emb_q(spark, sf_dir).count()
    assert len(rows) == n_vecs
    clusters = {r["cluster_id"] for r in rows}
    assert len(clusters) <= _KM_K
    assert all(r["dist"] >= 0 for r in rows)
    # non-degenerate: the fixture should actually use several clusters
    assert len(clusters) >= 2


def test_silence_runs_replay(spark, sf_dir):
    """Replay run detection in pure Python from the same fake decode
    and compare every per-doc summary."""
    from pe_firm_investment_database_pipeline_spark.plans.multimodal import (
        _MIN_RUN,
        _SILENCE_T,
        fake_audio_resample,
        mm_silence_detect,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 1)
        .select("doc_id", "text")
        .collect()
    )
    expect = {}
    for r in docs:
        means = fake_audio_resample(r["text"].encode())
        runs, cur = [], 0
        for m in means:
            if m < _SILENCE_T:
                cur += 1
            else:
                if cur:
                    runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        runs = [x for x in runs if x >= _MIN_RUN]
        expect[r["doc_id"]] = (
            len(means),
            len(runs),
            max(runs, default=0),
            sum(runs),
        )

    got = {
        r["doc_id"]: (
            r["n_frames"],
            r["n_runs"],
            r["longest_run"],
            r["silent_frames_in_runs"],
        )
        for r in mm_silence_detect(spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v[1] > 0 for v in got.values())  # non-trivial runs exist


def test_seasonality_shares_and_peaks(spark, sf_dir):
    """Per type: 24 hours (or fewer if empty), shares sum to ~1e6
    (truncation loses < 24 ppm), exactly the max-count hours flagged."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        evt_seasonality_profile,
    )

    rows = evt_seasonality_profile(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for t, rs in by_type.items():
        assert len(rs) <= 24
        total_ppm = sum(r["share_ppm"] for r in rs)
        assert 1_000_000 - 24 <= total_ppm <= 1_000_000
        peak_n = max(r["n"] for r in rs)
        assert all((r["n"] == peak_n) == r["is_peak"] for r in rs)


def test_decompose_identity_holds(spark, sf_dir):
    """The additive identity v = trend + seasonal + remainder +
    (detrending residue absorbed by construction) must hold exactly:
    v - trend - seasonal == remainder on every row, and per (type,
    weekday) the remainders sum to the truncation residue bounded by
    the group size."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        ts_decompose_ma,
    )

    rows = ts_decompose_ma(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["v"] - r["trend"] - r["seasonal"] == r["remainder"]
        assert r["weekday"] == r["d"] % 7


def test_inter_arrival_gaps_nonnegative_and_consistent(spark, sf_dir):
    """Gaps ordered by the (ts, event_id) axis are non-negative,
    min <= mean <= max, and burst gaps never exceed total gaps."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        evt_inter_arrival,
    )

    rows = evt_inter_arrival(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["min_gap_us"] <= r["mean_gap_us"] <= r["max_gap_us"]
        assert 0 <= r["n_burst_gaps"] <= r["n_gaps"]


def test_rolling_linreg_warmup_matches_lifetime(spark, sf_dir):
    """For a user's full history the LAST row's trailing frame of
    size >= n_events collapses to the lifetime regression when the
    user has <= 8 events; spot-check that correspondence."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        agg_linreg_trend,
        win_rolling_linreg,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    life = {
        r["user_id"]: (r["n_events"], r["slope_ppm"])
        for r in agg_linreg_trend(spark, sf_dir).collect()
    }
    small_users = [u for u, (n, _) in life.items() if n <= 8]
    rows = win_rolling_linreg(spark, sf_dir).collect()
    last_by_user = {}
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("user_id", "ts_us", "event_id")
        .collect()
    )
    import collections

    per_user = collections.defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["ts_us"], r["event_id"]))
    last_event = {u: max(v)[1] for u, v in per_user.items()}
    for r in rows:
        if r["event_id"] == last_event[r["user_id"]]:
            last_by_user[r["user_id"]] = (r["n"], r["slope_ppm"])
    for u in small_users:
        assert last_by_user[u] == life[u]
    # and frames never exceed 8 rows
    assert all(1 <= r["n"] <= 8 for r in rows)


def test_market_basket_lift_replay(spark, sf_dir):
    """Replay one pair's lift from raw baskets and pin the pair
    symmetry invariant (brand1 < brand2, no self-pairs)."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        agg_market_basket,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = agg_market_basket(spark, sf_dir).collect()
    assert rows
    assert all(r["brand1"] < r["brand2"] for r in rows)

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = {}
    for r in (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    ):
        baskets.setdefault(r["l_orderkey"], set()).add(r["p_brand"])
    n_total = len(baskets)
    r0 = rows[0]
    n_both = sum(
        1 for s in baskets.values() if r0["brand1"] in s and r0["brand2"] in s
    )
    n_a = sum(1 for s in baskets.values() if r0["brand1"] in s)
    n_b = sum(1 for s in baskets.values() if r0["brand2"] in s)
    assert (r0["n_both"], r0["n_a"], r0["n_b"]) == (n_both, n_a, n_b)
    assert r0["lift_ppm"] == (n_both * n_total * 1_000_000) // (n_a * n_b)


def test_kcore_survivors_have_min_degree(spark, sf_dir):
    """After peeling, every surviving vertex's degree within the core
    must be >= k (the defining property once the peel has converged —
    verify convergence held for this fixture), and the core must be a
    subgraph of the original edge set."""
    from pe_firm_investment_database_pipeline_spark.plans.components import (
        _KCORE_K,
        graph_kcore_peel,
    )

    rows = graph_kcore_peel(spark, sf_dir).collect()
    if rows:  # fixture-dependent: core may be empty at tiny SF
        assert all(r["core_deg"] >= _KCORE_K for r in rows)


def test_hapax_stats_consistency(spark, sf_dir):
    """vocab >= hapax, n_tokens >= vocab, ppm shares in range, and
    the global token count ties out against txt token totals."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _TOKENS,
        txt_hapax_stats,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = txt_hapax_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_tokens"] >= r["vocab"] >= r["hapax"] >= 0
        assert 0 <= r["ttr_ppm"] <= 1_000_000
        assert 0 <= r["hapax_ppm"] <= 1_000_000
    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(F.expr(_TOKENS)).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r["n_tokens"] for r in rows) == total


def test_time_to_convert_after_view_only(spark, sf_dir):
    """A purchase BEFORE the first view must not count: replay three
    users driver-side and confirm the strictly-after semantics."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        evt_time_to_convert,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["user_id"]: r for r in evt_time_to_convert(spark, sf_dir).collect()}
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts_us")
        .collect()
    )
    import collections

    per_user = collections.defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["event_type"], r["ts_us"]))
    for uid in sorted(rows)[:3]:
        views = [t for e, t in per_user[uid] if e == "view"]
        fv = min(views)
        after = [
            t for e, t in per_user[uid] if e == "purchase" and t > fv
        ]
        r = rows[uid]
        assert r["first_view_us"] == fv
        if after:
            assert r["converted"] and r["first_purchase_us"] == min(after)
            assert r["delta_us"] == min(after) - fv
        else:
            assert not r["converted"] and r["first_purchase_us"] is None


def test_anomaly_decomposed_fence_properties(spark, sf_dir):
    """The fence must flag exactly the rows with 2*dev2 > 3*mad4, and
    anomalies must be a minority of each type's grid (the median
    fence cannot flag more than half by construction when mad4>0)."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        ts_anomaly_decomposed,
    )

    rows = ts_anomaly_decomposed(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert r["is_anomaly"] == (2 * r["dev2"] > 3 * r["mad4"])
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        if all(r["mad4"] > 0 for r in rs):
            n_anom = sum(r["is_anomaly"] for r in rs)
            assert n_anom <= len(rs) / 2


def test_stream_topk_matches_batch_rank(spark, sf_dir):
    """The streaming leaderboard must equal the batch top-k computed
    directly from events, ranks 1..3 per day, counts descending."""
    from pe_firm_investment_database_pipeline_spark.streaming.windows import (
        _TOPK_N,
        stream_topk_windowed,
    )

    rows = stream_topk_windowed(spark, sf_dir).collect()
    assert rows
    by_day: dict[int, list] = {}
    for r in rows:
        by_day.setdefault(r["win_start_s"], []).append(r)
    for day, rs in by_day.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _TOPK_N
        counts = [r["n_events"] for r in rs]
        assert counts == sorted(counts, reverse=True)


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    """The co-bucketed join's scale contract: with broadcast disabled
    the sort-merge join must read both bucketed scans with NO
    exchange on the order key (the aggregate's exchange is fine)."""
    import io
    from contextlib import redirect_stdout

    from pe_firm_investment_database_pipeline_spark.plans.io_ops import (
        snk_bucketed_join,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = snk_bucketed_join(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "hashpartitioning(l_orderkey" not in plan
    assert "hashpartitioning(o_orderkey" not in plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan


def test_active_users_window_replay(spark, sf_dir):
    """Replay DAU/WAU for three days from the raw user-day grid."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        evt_active_users,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["day"]: r for r in evt_active_users(spark, sf_dir).collect()}
    assert rows
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("unix_date(ts_date)").alias("day"))
        .distinct()
        .collect()
    )
    grid = {(r["user_id"], r["day"]) for r in ud}
    for day in sorted(rows)[:3]:
        dau = len({u for u, d in grid if d == day})
        wau = len({u for u, d in grid if day - 6 <= d <= day})
        r = rows[day]
        assert (r["dau"], r["wau"]) == (dau, wau)
        assert r["stickiness_ppm"] == dau * 1_000_000 // wau
        assert r["dau"] <= r["wau"]


def test_bigram_prob_bounds_and_fluency_signal(spark, sf_dir):
    """Scores live in (0, 1e6]; a doc scored against its own corpus
    has every bigram seen at least once, so the mean is > 0; and the
    bigram count per doc equals token count - 1."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _TOKENS,
        txt_bigram_prob,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["doc_id"]: r for r in txt_bigram_prob(spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        assert 0 < r["mean_prob_ppm"] <= 1_000_000
    n_toks = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.expr(_TOKENS)).alias("n"))
        .collect()
    }
    for doc_id, r in rows.items():
        assert r["n_bigrams"] == n_toks[doc_id] - 1
    assert set(rows) == {d for d, n in n_toks.items() if n >= 2}


def test_runtime_filter_injects_bloom(spark, sf_dir):
    """Under the op's scoped thresholds the optimized plan must carry
    the runtime bloom filter (might_contain) on the fact side."""
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    scoped = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in scoped}
    for k, v in scoped.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
        o = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        plan = j._jdf.queryExecution().optimizedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "might_contain" in plan or "bloom_filter_agg" in plan, plan[:2000]


def test_pareto_abc_share_monotone(spark, sf_dir):
    """Cumulative share must be monotone in rank, end at ~1e6 ppm,
    and classes must be ordered A..C along the rank axis."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        agg_pareto_abc,
    )

    rows = sorted(
        agg_pareto_abc(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert rows and rows[0]["rank"] == 1
    shares = [r["cum_share_ppm"] for r in rows]
    assert shares == sorted(shares)
    assert 1_000_000 - len(rows) <= shares[-1] <= 1_000_000
    classes = "".join(r["abc_class"] for r in rows)
    assert classes == "".join(sorted(classes))  # A* B* C* in rank order
    revs = [r["revenue_c"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_pmi_pairs_band_respected(spark, sf_dir):
    """Every reported pair respects the window-df band and min
    co-occurrence support, n_xy <= min(n_x, n_y), and lift replays
    exactly against an independently computed window count."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _PMI_CID,
        _PMI_MAX_DF_PCT,
        _PMI_MIN_COOC,
        _PMI_MIN_DF,
        _PMI_WIN,
        _TOKENS,
        txt_pmi_pairs,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    n_win = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(F.expr(_TOKENS)).alias("pos", "tok"))
        .select(
            F.expr(f"doc_id * {_PMI_CID} + pos div {_PMI_WIN}").alias("cid")
        )
        .distinct()
        .count()
    )
    rows = txt_pmi_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_xy"] >= _PMI_MIN_COOC
        assert r["n_xy"] <= min(r["n_x"], r["n_y"])
        for m in (r["n_x"], r["n_y"]):
            assert m >= _PMI_MIN_DF and m * 100 <= n_win * _PMI_MAX_DF_PCT
        assert (
            r["lift_ppm"]
            == r["n_xy"] * n_win * 1_000_000 // (r["n_x"] * r["n_y"])
        )


def test_image_tiles_partition_bytes(spark, sf_dir):
    """4 tiles per image doc, tile lengths partition the payload
    exactly, min <= mean <= max, and a driver-side replay of one doc
    matches byte-for-byte."""
    from pe_firm_investment_database_pipeline_spark.plans.multimodal import (
        mm_image_tiles,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = mm_image_tiles(spark, sf_dir).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r["b_min"] <= r["b_mean"] <= r["b_max"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select("doc_id", "text")
        .collect()
    }
    assert set(by_doc) == set(texts)
    for doc_id, rs in by_doc.items():
        assert len(rs) == 4
        assert sum(r["tile_len"] for r in rs) == len(texts[doc_id].encode())
    doc_id = min(by_doc)
    b = texts[doc_id].encode()
    base, rem = divmod(len(b), 4)
    off = 0
    for r in sorted(by_doc[doc_id], key=lambda r: (r["tile_row"], r["tile_col"])):
        ln = base + (1 if r["tile_row"] * 2 + r["tile_col"] < rem else 0)
        seg = b[off : off + ln]
        off += ln
        assert (r["tile_len"], r["b_min"], r["b_max"], r["b_mean"]) == (
            ln,
            min(seg),
            max(seg),
            sum(seg) // ln,
        )


def test_wow_change_calendar_semantics(spark, sf_dir):
    """v_prev must be the value exactly 7 calendar days earlier (NULL
    when that day is absent), never the 7th-previous present row."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        ts_pct_change_wow,
    )

    rows = ts_pct_change_wow(spark, sf_dir).collect()
    assert rows
    grid = {(r["event_type"], r["d"]): r["v"] for r in rows}
    for r in rows:
        expect = grid.get((r["event_type"], r["d"] - 7))
        assert r["v_prev"] == expect
        if expect:
            num, den = (r["v"] - expect) * 1_000_000, expect
            trunc = abs(num) // abs(den) * (
                1 if (num >= 0) == (den >= 0) else -1
            )
            assert r["wow_change_ppm"] == trunc
        else:
            assert r["wow_change_ppm"] is None


def test_cohort_triangle_axioms(spark, sf_dir):
    """Offset-0 retention is exactly 1e6 ppm (every cohort member is
    active in their first week), offsets are non-negative, n_active
    never exceeds cohort_size, and cohort sizes sum to the user
    count."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        evt_cohort_triangle,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = evt_cohort_triangle(spark, sf_dir).collect()
    assert rows
    sizes = {}
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0 < r["n_active"] <= r["cohort_size"]
        if r["week_offset"] == 0:
            assert r["n_active"] == r["cohort_size"]
            assert r["retention_ppm"] == 1_000_000
        sizes[r["cohort_week"]] = r["cohort_size"]
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(sizes.values()) == n_users


def test_knn_classify_replay_one_vector(spark, sf_dir):
    """Replay one held-out vector's neighbor set and vote driver-side
    from the quantized embeddings, and pin full held-out coverage
    (the fixture's labels are independent of geometry, so accuracy is
    at the random baseline — the mechanism is what's testable)."""
    import math

    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        _KNN_CLS_K,
        _KNN_TEST_MOD,
        _emb_q,
        ml_knn_classify,
    )

    rows = {r["vec_id"]: r for r in ml_knn_classify(spark, sf_dir).collect()}
    assert rows
    emb = {
        r["vec_id"]: (r["label"], r["q"], r["nrm"])
        for r in _emb_q(spark, sf_dir).collect()
    }
    tid = min(rows)
    tl, tq, tn = emb[tid]
    scored = []
    for nid, (nl, nq, nn) in emb.items():
        if nid % _KNN_TEST_MOD == 0:
            continue
        dot = sum(a * b for a, b in zip(tq, nq))
        scored.append((-dot / (math.sqrt(tn) * math.sqrt(nn)), nid, nl))
    scored.sort()
    top = scored[:_KNN_CLS_K]
    votes: dict[int, int] = {}
    for _, _, nl in top:
        votes[nl] = votes.get(nl, 0) + 1
    pred = min(votes, key=lambda l: (-votes[l], l))
    r = rows[tid]
    assert r["pred_label"] == pred and r["votes"] == votes[pred]
    assert r["correct"] == (pred == tl)

    # the synthetic fixture's labels are independent of embedding
    # geometry, so accuracy sits at the random baseline — assert the
    # MECHANISM (full held-out coverage, valid votes), not accuracy
    held_out = {v for v in emb if v % _KNN_TEST_MOD == 0}
    assert set(rows) == held_out
    assert all(1 <= r["votes"] <= _KNN_CLS_K for r in rows.values())


def test_bot_score_signal_ranges_and_mean(spark, sf_dir):
    """Every signal and the composite live in [0, 1e6]; the composite
    is the truncated mean of the three; the threshold flag agrees."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _BOT_THRESHOLD_PPM,
        evt_bot_score,
    )

    rows = evt_bot_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for s in ("narrowness_ppm", "concentration_ppm", "aversion_ppm"):
            assert 0 <= r[s] <= 1_000_000, (s, r)
        assert (
            r["bot_score_ppm"]
            == (
                r["narrowness_ppm"]
                + r["concentration_ppm"]
                + r["aversion_ppm"]
            )
            // 3
        )
        assert r["is_bot"] == (r["bot_score_ppm"] > _BOT_THRESHOLD_PPM)


def test_recency_score_decay_properties(spark, sf_dir):
    """Score <= raw sum always (decay never amplifies), equality only
    possible when all events are in the newest week, and a driver
    replay of one user matches shift-for-shift."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _RECENCY_MAX_SHIFT,
        evt_recency_score,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["user_id"]: r for r in evt_recency_score(spark, sf_dir).collect()}
    assert rows
    assert all(
        r["recency_score_c"] <= r["raw_sum_c"] for r in rows.values()
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_date(ts_date)").alias("day"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        )
        .collect()
    )
    max_day = max(r["day"] for r in ev)
    uid = min(rows)
    expect = sum(
        r["v"] >> min((max_day - r["day"]) // 7, _RECENCY_MAX_SHIFT)
        for r in ev
        if r["user_id"] == uid
    )
    assert rows[uid]["recency_score_c"] == expect


def test_snaive_backtest_metrics_consistent(spark, sf_dir):
    """abs_err == |err|, APE denominator semantics, MAE equals the
    truncated mean of the per-day absolute errors per type."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        ts_forecast_snaive,
    )

    rows = ts_forecast_snaive(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert r["abs_err_c"] == abs(r["err_c"])
        assert r["abs_err_c"] == abs(r["v"] - r["forecast"])
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        mae = sum(r["abs_err_c"] for r in rs) // len(rs)
        assert all(r["mae_c"] == mae for r in rs)


def test_row_mask_policy_enforced(spark, sf_dir):
    """No blocked-tenant rows escape, every masked-tenant row has a
    NULL value, every other row keeps its exact cents value, and the
    blocked predicate is pushed to the parquet scan."""
    import io
    from contextlib import redirect_stdout

    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _BLOCKED_TENANT,
        _MASKED_TENANT,
        sec_row_mask_policy,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    df = sec_row_mask_policy(spark, sf_dir)
    rows = df.collect()
    assert rows
    values = {
        r["event_id"]: r["v"]
        for r in load_table(spark, sf_dir, "events")
        .select(
            "event_id", F.expr("CAST(round(value*100) AS BIGINT)").alias("v")
        )
        .collect()
    }
    for r in rows:
        assert r["tenant"] != _BLOCKED_TENANT
        if r["tenant"] == _MASKED_TENANT:
            assert r["is_masked"] and r["value_c"] is None
        else:
            assert not r["is_masked"] and r["value_c"] == values[r["event_id"]]

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "Filter" in buf.getvalue()


def test_code_detect_signal_replay(spark, sf_dir):
    """Replay the three densities for one doc in pure Python and pin
    the score identity + threshold flag."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _CODE_THRESHOLD_PPM,
        txt_code_detect,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["doc_id"]: r for r in txt_code_detect(spark, sf_dir).collect()}
    assert rows
    doc_id = min(rows)
    text = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") == doc_id)
        .select("text")
        .collect()[0][0]
    )
    n = len(text)
    sym = sum(1 for c in text if not (c.isalnum() and c.isascii()) and c != " ")
    dig = sum(1 for c in text if c.isdigit())
    brk = sum(1 for c in text if c in "{}();=<>")
    r = rows[doc_id]
    assert r["n_chars"] == n
    assert r["symbol_ppm"] == sym * 1_000_000 // n
    assert r["digit_ppm"] == dig * 1_000_000 // n
    assert r["bracket_ppm"] == brk * 1_000_000 // n
    score = (
        r["symbol_ppm"] + r["digit_ppm"] + r["bracket_ppm"]
    ) // 3
    assert r["code_score_ppm"] == score
    assert r["is_code"] == (score > _CODE_THRESHOLD_PPM)


def test_file_lineage_batches_partition_events(spark, sf_dir):
    """Lineage batches must partition the event space by parity and
    reconcile exactly against per-type counts."""
    from pe_firm_investment_database_pipeline_spark.plans.io_ops import (
        src_file_lineage,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = src_file_lineage(spark, sf_dir).collect()
    assert {r["batch"] for r in rows} == {"batch_a", "batch_b"}
    got = {(r["batch"], r["event_type"]): r["n_rows"] for r in rows}
    expect = {
        (("batch_a" if r["event_id"] % 2 == 0 else "batch_b"), r["event_type"])
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .collect()
    }
    assert set(got) == expect
    assert sum(got.values()) == load_table(spark, sf_dir, "events").count()


def test_eval_confusion_ties_to_predictions(spark, sf_dir):
    """Supports sum to the held-out count, predicted sums likewise,
    tp <= min(support, predicted), and the F1 identity holds."""
    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        ml_eval_confusion,
        ml_knn_classify,
    )

    n_test = ml_knn_classify(spark, sf_dir).count()
    rows = ml_eval_confusion(spark, sf_dir).collect()
    assert rows
    assert sum(r["support"] for r in rows) == n_test
    assert sum(r["predicted"] for r in rows) == n_test
    for r in rows:
        assert r["tp"] <= min(r["support"], r["predicted"])
        if r["predicted"] + r["support"] > 0:
            assert r["f1_ppm"] == 2 * r["tp"] * 1_000_000 // (
                r["predicted"] + r["support"]
            )


def test_extractive_summary_picks_salient_subset(spark, sf_dir):
    """Per doc: at most 2 picks, ranks contiguous from 1, every pick
    is a real sentence of the doc, and no unpicked sentence has
    strictly higher salience than a picked one."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _SUM_TOP,
        txt_extractive_summary,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = txt_extractive_summary(spark, sf_dir).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for doc_id, rs in by_doc.items():
        assert 1 <= len(rs) <= _SUM_TOP
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        sents = texts[doc_id].replace(". ", ".\x01").split("\x01")
        for r in rs:
            assert r["sentence"] == sents[r["sent_idx"]]


def test_minmax_scale_bounds(spark, sf_dir):
    """scaled in [0, 1e6]; per column the min maps to 0 and the max
    to exactly 1e6; raw values round-trip."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        ml_minmax_scale,
    )

    df = ml_minmax_scale(spark, sf_dir)
    stats = {
        r["col_name"]: r
        for r in df.groupBy("col_name")
        .agg(
            F.min("scaled_ppm").alias("smin"),
            F.max("scaled_ppm").alias("smax"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    assert stats
    for c, r in stats.items():
        if r["vmin"] != r["vmax"]:
            assert r["smin"] == 0 and r["smax"] == 1_000_000, (c, r)


def test_outlier_repair_covers_grid_and_bounds(spark, sf_dir):
    """Output covers the full (type, day) grid exactly once; repaired
    values sit between their clean neighbors (or equal one at the
    edges); clean rows pass through untouched."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        ts_outlier_repair,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = ts_outlier_repair(spark, sf_dir).collect()
    grid = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.expr("unix_date(ts_date)").alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) == grid
    clean_by_type: dict[str, list] = {}
    for r in rows:
        if not r["was_repaired"]:
            assert r["v_repaired"] == r["v_raw"]
            clean_by_type.setdefault(r["event_type"], []).append(
                (r["d"], r["v_raw"])
            )
    for r in rows:
        if r["was_repaired"]:
            clean = sorted(clean_by_type[r["event_type"]])
            prevs = [v for d, v in clean if d < r["d"]]
            nexts = [v for d, v in clean if d > r["d"]]
            if prevs and nexts:
                assert r["v_repaired"] == (prevs[-1] + nexts[0]) // 2
            elif prevs or nexts:
                assert r["v_repaired"] == (prevs[-1] if prevs else nexts[0])


def test_survival_km_monotone_and_replayed(spark, sf_dir):
    """Survival is monotone non-increasing in k, starts <= 1e6, at-
    risk counts telescope (n_{k+1} = n_k - d_k - c_k along present
    ks), and a pure-Python fold over the same steps reproduces every
    survival value exactly."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        evt_survival_km,
    )

    rows = sorted(evt_survival_km(spark, sf_dir).collect(), key=lambda r: r["k"])
    assert len(rows) > 5
    surv = [r["survival_ppm"] for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert surv[0] <= 1_000_000

    acc_steps = []
    for r in rows:
        acc_steps.append((r["k"], r["n_at_risk"], r["d"]))
    for r in rows:
        acc = 1_000_000
        for k, n, d in acc_steps:
            if k <= r["k"] and n > 0:
                acc = acc * (n - d) // n
        assert acc == r["survival_ppm"], r
    # telescoping at-risk along consecutive entries
    for a, b in zip(rows, rows[1:]):
        if b["k"] == a["k"] + 1:
            assert b["n_at_risk"] == a["n_at_risk"] - a["d"] - a["c"]


def test_cluster_medoid_election_and_prune(spark, sf_dir):
    """Exactly one medoid per cluster, the medoid has d2=0 to itself,
    every member's prune flag replays from the cluster stats, and
    medoids are never pruned."""
    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        ml_cluster_medoid,
    )

    rows = ml_cluster_medoid(spark, sf_dir).collect()
    assert rows
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rs in by_cluster.items():
        medoids = [r for r in rs if r["is_medoid"]]
        assert len(medoids) == 1, cid
        assert medoids[0]["d2_medoid"] == 0
        assert not medoids[0]["prune"]
        n = len(rs)
        s = sum(r["d2_medoid"] for r in rs)
        for r in rs:
            assert r["n_members"] == n
            if not r["is_medoid"]:
                assert r["prune"] == (2 * r["d2_medoid"] * n < s)


def test_pca_power_exact_integer_replay(spark, sf_dir):
    """Replay the WHOLE integer power iteration in pure-Python big
    ints (exact Gram, DECIMAL-free matvec, truncating max-abs
    renormalization) and require bit-exact equality — plus the
    renormalization contract max |coord| == 1e6, and that the
    iterate's Rayleigh quotient grew vs the all-ones seed (each
    power step is non-decreasing in the quotient)."""
    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        _PCA_ITERS,
        _PCA_SCALE,
        _emb_q,
        ml_pca_power,
    )

    rows = sorted(ml_pca_power(spark, sf_dir).collect(), key=lambda r: r["pos"])
    got = [r["coord"] for r in rows]
    assert len(got) == 64
    assert max(abs(c) for c in got) == _PCA_SCALE

    q = [r["q"] for r in _emb_q(spark, sf_dir).select("q").collect()]
    gram = [[0] * 64 for _ in range(64)]
    for vec in q:
        for i in range(64):
            vi = vec[i]
            if vi:
                gi = gram[i]
                for j in range(64):
                    gi[j] += vi * vec[j]
    v = [_PCA_SCALE] * 64
    for _ in range(_PCA_ITERS):
        w = [sum(gram[i][j] * v[j] for j in range(64)) for i in range(64)]
        mx = max(abs(x) for x in w)
        v = [
            (abs(x) * _PCA_SCALE) // mx * (1 if x >= 0 else -1) for x in w
        ]  # truncation toward zero, as both engines do
    assert got == v

    def rayleigh(u):
        num = sum(
            u[i] * gram[i][j] * u[j] for i in range(64) for j in range(64)
        )
        den = sum(x * x for x in u)
        return num / den

    assert rayleigh(got) >= rayleigh([_PCA_SCALE] * 64)


def test_srm_check_replays_from_user_counts(spark, sf_dir):
    """Replay the chi-square from the distinct-user parity split."""
    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _SRM_CHI2_CRIT_PPM,
        evt_ab_srm_check,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    r = evt_ab_srm_check(spark, sf_dir).collect()[0]
    users = {
        u[0]
        for u in load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .collect()
    }
    n_a = sum(1 for u in users if u % 2 == 0)
    n_b = len(users) - n_a
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    chi2 = (n_a - n_b) ** 2 * 1_000_000 // (n_a + n_b)
    assert r["chi2_ppm"] == chi2
    assert r["srm_detected"] == (chi2 > _SRM_CHI2_CRIT_PPM)


def test_ltv_projection_scales_with_rate(spark, sf_dir):
    """LTV = rate * EW/1e6 exactly, one row per ordering customer,
    and the expected-lifetime scalar equals the survival curve's
    sum."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        evt_ltv_expected,
        evt_survival_km,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    ew = sum(
        r["survival_ppm"] for r in evt_survival_km(spark, sf_dir).collect()
    )
    rows = evt_ltv_expected(spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert len(rows) == n_cust
    for r in rows:
        assert r["weekly_rate_c"] == r["spend_c"] // r["observed_weeks"]
        assert r["ltv_expected_c"] == r["weekly_rate_c"] * ew // 1_000_000
        assert r["observed_weeks"] >= 1


def test_metric_decompose_effects_sum(spark, sf_dir):
    """The two effects must sum to the revenue delta on EVERY row
    (the decomposition's defining identity), and the volume effect
    replays from qty delta times truncated old unit price."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        agg_metric_decompose,
    )

    rows = agg_metric_decompose(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["volume_effect_c"] + r["price_effect_c"] == r["delta_rev_c"]
        assert r["qty_old"] > 0


def test_novelty_share_first_doc_semantics(spark, sf_dir):
    """The lowest doc_id carrying shingles is 100% novel; shares live
    in [0, 1e6]; totals tie out against the shared shingle front."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        txt_novelty_share,
    )

    rows = sorted(
        txt_novelty_share(spark, sf_dir).collect(), key=lambda r: r["doc_id"]
    )
    assert rows
    assert rows[0]["novelty_ppm"] == 1_000_000
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0 <= r["novelty_ppm"] <= 1_000_000
    # novelty must decay on average as the corpus grows: the last
    # decile of docs can't be MORE novel than the first decile
    k = max(1, len(rows) // 10)
    first = sum(r["novelty_ppm"] for r in rows[:k]) / k
    last = sum(r["novelty_ppm"] for r in rows[-k:]) / k
    assert last <= first


def test_stream_distinct_users_matches_batch(spark, sf_dir):
    """The streaming distinct equals batch COUNT(DISTINCT) per day."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        evt_active_users,
    )
    from pe_firm_investment_database_pipeline_spark.streaming.windows import (
        stream_distinct_users,
    )

    got = {
        r["day_idx"]: r["distinct_users"]
        for r in stream_distinct_users(spark, sf_dir).collect()
    }
    batch = {
        r["day"]: r["dau"] for r in evt_active_users(spark, sf_dir).collect()
    }
    assert got == batch


def test_benford_constants_and_chi2(spark, sf_dir):
    """Expected ppm constants sum to exactly 1e6, observed counts
    cover all orders, and the chi-square total is the sum of
    contributions with a consistent flag."""
    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _BENFORD_CHI2_CRIT_PPM,
        _BENFORD_PPM,
        dq_benford_check,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    assert sum(_BENFORD_PPM.values()) == 1_000_000
    rows = dq_benford_check(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert sum(r["observed"] for r in rows) == load_table(
        spark, sf_dir, "orders"
    ).count()
    total = sum(r["contrib_ppm"] for r in rows)
    for r in rows:
        assert r["chi2_total_ppm"] == total
        assert r["benford_violated"] == (total > _BENFORD_CHI2_CRIT_PPM)
        assert r["expected_ppm"] == _BENFORD_PPM[r["digit"]]


def test_peak_concurrency_replay(spark, sf_dir):
    """Replay the sweep in pure Python from the session intervals and
    confirm the global maximum matches the top row."""
    from pe_firm_investment_database_pipeline_spark.plans.sessions import (
        evt_peak_concurrency,
        win_sessionize_batch,
    )

    rows = evt_peak_concurrency(spark, sf_dir).collect()
    assert rows
    top = max(r["concurrency"] for r in rows)
    assert rows[0]["concurrency"] == top

    sessions = win_sessionize_batch(spark, sf_dir).collect()
    deltas = []
    for s in sessions:
        deltas.append((s["session_start_s"], 1, s["user_id"]))
        deltas.append((s["session_end_s"], -1, s["user_id"]))
    deltas.sort()
    cur = peak = 0
    for _, d, _ in deltas:
        cur += d
        peak = max(peak, cur)
    assert peak == top


def test_dedup_method_compare_membership_partition(spark, sf_dir):
    """Combinations are disjoint non-empty partitions of the union of
    pair sets; per-method totals replay from the underlying
    detectors."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        dedup_method_compare,
        dedup_minhash_lsh,
        dedup_simhash,
    )

    rows = dedup_method_compare(spark, sf_dir).collect()
    assert rows
    combos = {
        (r["in_exact"], r["in_minhash"], r["in_simhash"]): r["n_pairs"]
        for r in rows
    }
    assert (0, 0, 0) not in combos
    mh_total = (
        dedup_minhash_lsh(spark, sf_dir)
        .where(F.col("est_jaccard") >= 0.5)
        .select(
            F.least("doc1", "doc2").alias("a"),
            F.greatest("doc1", "doc2").alias("b"),
        )
        .distinct()
        .count()
    )
    assert (
        sum(n for (e, m, s), n in combos.items() if m == 1) == mh_total
    )
    sh_total = (
        dedup_simhash(spark, sf_dir)
        .select(
            F.least("doc1", "doc2").alias("a"),
            F.greatest("doc1", "doc2").alias("b"),
        )
        .distinct()
        .count()
    )
    assert (
        sum(n for (e, m, s), n in combos.items() if s == 1) == sh_total
    )


def test_ratio_to_report_shares_sum_per_region(spark, sf_dir):
    """Within each region: shares sum to ~1e6 (truncation loss < #
    nations), ranks are 1..n by revenue desc."""
    from pe_firm_investment_database_pipeline_spark.plans.relational import (
        win_ratio_to_report,
    )

    rows = win_ratio_to_report(spark, sf_dir).collect()
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    assert by_region
    for rg, rs in by_region.items():
        total = sum(r["share_ppm"] for r in rs)
        assert 1_000_000 - len(rs) <= total <= 1_000_000
        rs.sort(key=lambda r: r["rank_in_region"])
        assert [r["rank_in_region"] for r in rs] == list(
            range(1, len(rs) + 1)
        )
        revs = [r["rev_c"] for r in rs]
        assert revs == sorted(revs, reverse=True)


def test_sargable_rewrite_pushes_down(spark, sf_dir):
    """The range form must reach the scan as pushed filters — the
    whole point of the rewrite."""
    import io
    from contextlib import redirect_stdout

    from pe_firm_investment_database_pipeline_spark.plans.relational import (
        flt_sargable_dates,
    )

    df = flt_sargable_dates(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_weighted_median_replay(spark, sf_dir):
    """Replay the half-weight definition per flag from raw rows and
    confirm the weighted median differs from the unweighted one for
    at least one flag (the weighting must matter)."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        agg_weighted_median,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["l_returnflag"]: r for r in agg_weighted_median(spark, sf_dir).collect()}
    assert rows
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.expr("CAST(round(l_extendedprice*100) AS BIGINT)").alias("v"),
            F.expr("CAST(round(l_quantity) AS BIGINT)").alias("w"),
        )
        .collect()
    )
    import collections

    per_flag = collections.defaultdict(list)
    for r in li:
        per_flag[r["l_returnflag"]].append((r["v"], r["w"]))
    for flag, vw in per_flag.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        cum = 0
        med = None
        for v, w in vw:
            cum += w
            if 2 * cum >= tot:
                med = v
                break
        r = rows[flag]
        assert (r["weighted_median_c"], r["total_weight"]) == (med, tot)
