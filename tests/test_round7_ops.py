"""Behavioral pins for the round-7 operators — properties their
DuckDB oracles can NOT express (value parity is covered for every
entry by tests/test_parity.py and the driver sweep): the DPP entry's
partition filter actually being dynamic, BFS distances being valid
shortest-path witnesses, the reset window restarting exactly at
purchases, and k-anonymity suppression holding."""

from __future__ import annotations

from pyspark.sql import functions as F

from pe_firm_investment_database_pipeline_spark.plans import all_queries

_Q = all_queries()


def test_join_dpp_prune_partition_filter_is_dynamic(spark, sf_dir):
    """The fact scan must carry a dynamicpruningexpression partition
    filter — the entire point of the entry. A static IN-list would
    still be value-correct (the oracle can't tell), so the plan is
    the only witness."""
    df = _Q["join_dpp_prune"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_join_dpp_prune_skips_legacy_partitions(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.io_ops import (
        _DPP_ERA_START,
    )

    years = {
        r["o_year"]
        for r in _Q["join_dpp_prune"].fn(spark, sf_dir).collect()
    }
    assert years and min(years) >= _DPP_ERA_START


def test_graph_bfs_distances_are_shortest_path_witnesses(spark, sf_dir):
    """Every dist-0 vertex is a seed; every dist d>0 vertex has a
    neighbor at d-1 (a valid BFS parent) and no neighbor closer than
    d-1 (else d wouldn't be minimal)."""
    from pe_firm_investment_database_pipeline_spark.plans.components import (
        _BFS_SEED_MOD,
        graph_bfs_distance,
    )
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        dedup_minhash_lsh,
    )

    dist = {
        r["doc_id"]: r["dist"]
        for r in graph_bfs_distance(spark, sf_dir).collect()
    }
    assert dist, "BFS reached nothing — seed modulus matches no vertex"
    pairs = (
        dedup_minhash_lsh(spark, sf_dir)
        .where(F.col("est_jaccard") >= 0.5)
        .select("doc1", "doc2")
        .collect()
    )
    adj: dict[int, set[int]] = {}
    for r in pairs:
        adj.setdefault(r["doc1"], set()).add(r["doc2"])
        adj.setdefault(r["doc2"], set()).add(r["doc1"])
    for v, d in dist.items():
        assert 0 <= d <= 3
        if d == 0:
            assert v % _BFS_SEED_MOD == 0
        else:
            nbr_dists = [dist[n] for n in adj[v] if n in dist]
            assert min(nbr_dists) == d - 1, (v, d, nbr_dists)


def test_win_cumsum_reset_restarts_after_purchase(spark, sf_dir):
    """Within each user, the segment id is non-decreasing in event
    time, increments by exactly 1 right after a purchase row, and
    the running total equals the sum of values since the segment
    started."""
    from pe_firm_investment_database_pipeline_spark.plans.relational import (
        win_cumsum_reset,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
            (F.col("event_type") == "purchase").alias("is_p"),
        )
        .collect()
    )
    out = {
        r["event_id"]: (r["segment"], r["cents_since_reset"])
        for r in win_cumsum_reset(spark, sf_dir).collect()
    }
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts_us"], r["event_id"]))
        seg_prev, run = -1, 0
        expect_seg = 0
        for r in rows:
            seg, cum = out[r["event_id"]]
            assert seg == expect_seg
            if seg != seg_prev:
                run = 0
                seg_prev = seg
            run += r["v"]
            assert cum == run, (r["event_id"], cum, run)
            if r["is_p"]:
                expect_seg += 1


def test_sec_col_tokenize_k_anonymity_holds(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _KANON_MIN,
        sec_col_tokenize,
    )

    rows = sec_col_tokenize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["token"] == "<rare>":
            continue
        assert len(r["token"]) == 32 and int(r["token"], 16) >= 0
        assert r["n_rows"] >= _KANON_MIN
        assert r["n_merged_tokens"] == 1


def test_ml_feature_hashing_partitions_the_token_stream(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _FH_BUCKETS,
        _TOKENS,
        ml_feature_hashing,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = ml_feature_hashing(spark, sf_dir).collect()
    assert all(0 <= r["bucket"] < _FH_BUCKETS for r in rows)
    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(_TOKENS)).alias("t"))
        .count()
    )
    assert sum(r["n_hits"] for r in rows) == total


def test_ml_auc_rank_bounds_and_degenerates(spark, sf_dir):
    rows = _Q["ml_auc_rank"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["n_pos"] > 0 and r["n_neg"] > 0:
            assert 0 <= r["auc_ppm"] <= 1_000_000
        else:
            assert r["auc_ppm"] is None


def test_dedup_savings_report_accounting_closes(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = _Q["dedup_savings_report"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["saved_chars"] == r["total_chars"] - r["kept_chars"]
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        if r["cluster_size"] == 1:
            assert r["saved_chars"] == 0


def test_ts_cross_correlation_symmetric_window(spark, sf_dir):
    rows = {
        r["lag"]: r for r in _Q["ts_cross_correlation"].fn(spark, sf_dir).collect()
    }
    assert 0 in rows
    for r in rows.values():
        if r["xcorr"] is not None:
            assert -1.0 <= r["xcorr"] <= 1.0


def test_ml_calibration_bins_cover_the_corpus(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = _Q["ml_calibration_bins"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    assert {r["bin"] for r in rows} <= set(range(10))
    for r in rows:
        assert r["gap_permille"] == abs(
            r["mean_pred_permille"] - r["obs_pos_permille"]
        )


def test_txt_readability_grades_latin_langs(spark, sf_dir):
    rows = {r["lang"]: r for r in _Q["txt_readability"].fn(spark, sf_dir).collect()}
    assert rows["en"]["fk_grade_centi"] is not None
    for r in rows.values():
        assert r["total_sentences"] >= r["n_docs"]  # floor of 1/doc


def test_ml_ndcg_bounds_and_ideal_dominance(spark, sf_dir):
    rows = _Q["ml_ndcg_at_k"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["n_rel"] > 0:
            assert 0 <= r["dcg_ppm"] <= r["idcg_ppm"]
            assert 0 <= r["ndcg_ppm"] <= 1_000_000
        else:
            assert r["ndcg_ppm"] is None


def test_kcenter_coverage_radius_is_non_increasing(spark, sf_dir):
    """The defining property of greedy farthest-point traversal: each
    successive pick's distance-to-selected-set is <= the previous
    pick's (the coverage radius shrinks monotonically), picks are
    distinct, and the seed is vec 0."""
    rows = sorted(
        _Q["samp_kcenter_coreset"].fn(spark, sf_dir).collect(),
        key=lambda r: r["pick_rank"],
    )
    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        _KCENTER_K,
    )

    assert len(rows) == _KCENTER_K
    assert rows[0]["vec_id"] == 0 and rows[0]["d2_at_pick"] is None
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == _KCENTER_K
    d2s = [r["d2_at_pick"] for r in rows[1:]]
    assert all(d2s[i] >= d2s[i + 1] for i in range(len(d2s) - 1)), d2s


def test_fk_orphans_clean_fixture_and_reconciled_counts(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["fk_edge"]: r for r in _Q["dq_fk_orphans"].fn(spark, sf_dir).collect()}
    assert len(rows) == 6
    li_n = load_table(spark, sf_dir, "lineitem").count()
    for edge, r in rows.items():
        assert r["n_orphans"] == 0 and r["orphan_ppm"] == 0, edge
        if edge.startswith("lineitem."):
            assert r["n_child"] == li_n


def test_sql_udf_scalar_inlines_into_codegen(spark, sf_dir):
    """The SQL UDF body must be inlined by Catalyst — no UDF eval
    node (python or JVM) may survive into the physical plan; that
    inlining is the entry's whole point vs a Python UDF."""
    df = _Q["sql_udf_scalar"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UDF" not in plan and "PythonEval" not in plan, plan[:1500]


def test_sql_pipe_syntax_is_sugar_not_a_different_plan(spark, sf_dir):
    """The pipe-syntax chain must optimize to the same plan shape as
    the classic nested form: one aggregate pair (partial+final), one
    exchange, same pushed filter."""
    df = _Q["sql_pipe_syntax"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one hash exchange (the aggregate's); the only other
    # exchange is load_table's round-robin parallelism floor
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]
    assert "partial_count" in plan  # map-side combine survived the sugar
    # the piped WHERE reached the parquet scan as a pushed filter
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan, plan[:1500]


def test_evt_window_funnel_matches_definitional_semantics(spark, sf_dir):
    """Replay the definition in Python: level k iff a strictly
    (ts, event_id)-increasing chain signup -> view -> purchase of
    depth k exists with last.ts - first.ts <= 1h."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _WF_WINDOW_US,
        evt_window_funnel,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    got = {
        r["user_id"]: r["funnel_level"]
        for r in evt_window_funnel(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts_us")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts_us"], r["event_id"], r["event_type"])
        )
    assert set(got) == set(by_user)
    for u, rows in by_user.items():
        rows.sort()
        sign = [(t, e) for t, e, ty in rows if ty == "signup"]
        views = [(t, e) for t, e, ty in rows if ty == "view"]
        purch = [(t, e) for t, e, ty in rows if ty == "purchase"]
        lvl = 1 if sign else 0
        if lvl and any(
            s < v and v[0] - s[0] <= _WF_WINDOW_US
            for s in sign
            for v in views
        ):
            lvl = 2
        if lvl == 2 and any(
            s < v < p and p[0] - s[0] <= _WF_WINDOW_US
            for s in sign
            for v in views
            for p in purch
        ):
            lvl = 3
        assert got[u] == lvl, (u, got[u], lvl)


def test_ts_backtest_wape_identity(spark, sf_dir):
    rows = _Q["ts_backtest_wape"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["wape_ppm"] == r["sum_abs_err"] * 1_000_000 // r["sum_actual"]
        assert r["n_eval_days"] > 0 and r["sum_actual"] > 0


def test_sim_reciprocal_nn_pairs_are_mutual(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        sim_knn_blocked_full,
    )

    knn = {
        (r["vec_id"], r["nbr_id"]): r["nn_rank"]
        for r in sim_knn_blocked_full(spark, sf_dir).collect()
    }
    pairs = _Q["sim_reciprocal_nn"].fn(spark, sf_dir).collect()
    assert pairs
    for r in pairs:
        a, b = r["vec1"], r["vec2"]
        assert a < b
        assert knn[(a, b)] == r["rank_ab"]
        assert knn[(b, a)] == r["rank_ba"]
    # completeness: every mutual top-3 pair is reported
    expect = {
        (a, b) for (a, b) in knn if a < b and (b, a) in knn
    }
    assert {(r["vec1"], r["vec2"]) for r in pairs} == expect


def test_profile_describe_stats_sanity(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _DESCRIBE_COLS,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {r["column"]: r for r in _Q["profile_describe_stats"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(_DESCRIBE_COLS)
    n_li = load_table(spark, sf_dir, "lineitem").count()
    for r in rows.values():
        assert r["n"] == n_li
        assert r["min_c"] <= r["mean_c"] <= r["max_c"]
        assert r["std_c"] >= 0.0


def test_ml_pr_curve_monotone_and_identities(spark, sf_dir):
    """Recall is non-decreasing as the threshold drops; the endpoint
    where every row is predicted positive has recall = 1e6; P/R/F1
    satisfy their defining identities row by row."""
    rows = _Q["ml_pr_curve"].fn(spark, sf_dir).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: -r["score"])  # thresholds high -> low
        prev_recall = -1
        for r in rs:
            assert r["precision_ppm"] == r["tp"] * 1_000_000 // (r["tp"] + r["fp"])
            assert r["recall_ppm"] >= prev_recall
            prev_recall = r["recall_ppm"]
        assert rs[-1]["recall_ppm"] == 1_000_000  # lowest cut catches all


def test_txt_boilerplate_strip_ledger_consistency(spark, sf_dir):
    """The per-doc ledger must agree with a direct recompute from the
    chunk frame: kept + removed partitions every chunk, and at least
    one document actually loses boilerplate in the fixture."""
    from pe_firm_investment_database_pipeline_spark.plans.datapipe import (
        _BOILER_MIN_DOCS,
        chunk_recursive_split,
    )

    ch = chunk_recursive_split(spark, sf_dir).collect()
    docs_per_fp: dict[int, set] = {}
    for c in ch:
        docs_per_fp.setdefault(c["chunk_fp"], set()).add(c["doc_id"])
    boiler = {fp for fp, ds in docs_per_fp.items() if len(ds) >= _BOILER_MIN_DOCS}
    assert boiler, "fixture has no cross-doc repeated chunks"

    exp: dict[int, list] = {}
    for c in ch:
        e = exp.setdefault(c["doc_id"], [0, 0, 0, 0, 0])
        e[0] += 1
        if c["chunk_fp"] in boiler:
            e[3] += c["n_chars"]
        else:
            e[1] += 1
            e[2] += c["n_chars"]
            e[4] = (e[4] + (c["chunk_idx"] + 1) * c["chunk_fp"]) % 1_000_000_007
    got = {r["doc_id"]: r for r in _Q["txt_boilerplate_strip"].fn(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    removed_total = 0
    for doc_id, e in exp.items():
        r = got[doc_id]
        assert (r["n_chunks"], r["kept_chunks"], r["kept_chars"],
                r["removed_chars"], r["kept_checksum"]) == tuple(e)
        removed_total += e[0] - e[1]
    assert removed_total > 0


def test_sim_threshold_sweep_is_monotone_and_exact(spark, sf_dir):
    """Every counter is non-increasing in tau, and each rung matches
    a Python recompute over the canonical pair set."""
    from pe_firm_investment_database_pipeline_spark.plans.similarity import (
        _SWEEP_TAUS,
        sim_knn_blocked_full,
    )

    pairs = {
        (min(r["vec_id"], r["nbr_id"]), max(r["vec_id"], r["nbr_id"]), r["cosine"])
        for r in sim_knn_blocked_full(spark, sf_dir).collect()
    }
    got = {r["tau_ppm"]: r for r in _Q["sim_threshold_sweep"].fn(spark, sf_dir).collect()}
    prev = None
    for tau in sorted(_SWEEP_TAUS):
        hit = [(a, b) for a, b, c in pairs if c >= tau / 1_000_000.0]
        if not hit:
            assert tau not in got
            continue
        r = got[tau]
        assert r["n_pairs"] == len(hit)
        assert r["n_removed"] == len({b for _, b in hit})
        assert r["n_docs"] == len({v for p in hit for v in p})
        if prev is not None:
            assert r["n_pairs"] <= prev["n_pairs"]
            assert r["n_docs"] <= prev["n_docs"]
            assert r["n_removed"] <= prev["n_removed"]
        prev = r


def test_ml_quantize_int8_error_bounds(spark, sf_dir):
    """|reconstruction error| < maxabs per lane (truncating int8
    scale), sse <= 64 * max_abs_err^2, and a direct Python recompute
    matches on every row."""
    rows = _Q["ml_quantize_int8"].fn(spark, sf_dir).collect()
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table
    import math

    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    assert len(rows) == len(emb)
    for r in rows[:50]:
        q = [int(math.floor(float(x) * 1_000_000.0)) for x in emb[r["vec_id"]]]
        maxabs = max(abs(x) for x in q)
        assert r["maxabs_q"] == maxabs
        if maxabs == 0:
            assert r["sse"] == 0 and r["nnz8"] == 0
            continue
        q8 = [
            -((-x * 127) // maxabs) if x < 0 else (x * 127) // maxabs
            for x in q
        ]
        errs = [x * 127 - y * maxabs for x, y in zip(q, q8)]
        assert r["sse"] == sum(e * e for e in errs)
        assert r["max_abs_err"] == max(abs(e) for e in errs)
        assert r["max_abs_err"] < maxabs
        assert r["nnz8"] == sum(1 for y in q8 if y != 0)


def test_graph_label_propagation_replay(spark, sf_dir):
    """Python replay of the 2-round frozen-frontier majority spread:
    seeds carry their own lang at round 0; each later round labels
    exactly the unlabeled vertices with a labeled neighbor, by
    (count desc, label asc) majority."""
    from pe_firm_investment_database_pipeline_spark.plans.components import (
        _LPA_ROUNDS,
        _LPA_SEED_MOD,
    )
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        dedup_minhash_lsh,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    pairs = dedup_minhash_lsh(spark, sf_dir).where(F.col("est_jaccard") >= 0.5)
    nbrs: dict[int, set] = {}
    for r in pairs.collect():
        nbrs.setdefault(r["doc1"], set()).add(r["doc2"])
        nbrs.setdefault(r["doc2"], set()).add(r["doc1"])
    lang = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    labels = {
        v: (lang[v], 0) for v in nbrs if v % _LPA_SEED_MOD == 0
    }
    for rnd in range(1, _LPA_ROUNDS + 1):
        new = {}
        for v in nbrs:
            if v in labels:
                continue
            counts: dict[str, int] = {}
            for n in nbrs[v]:
                if n in labels and labels[n][1] < rnd:
                    counts[labels[n][0]] = counts.get(labels[n][0], 0) + 1
            if counts:
                best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
                new[v] = (best[0], rnd)
        labels.update(new)
    got = {
        r["doc_id"]: (r["label"], r["rnd"])
        for r in _Q["graph_label_propagation"].fn(spark, sf_dir).collect()
    }
    assert got == labels
    assert any(rnd > 0 for _, rnd in got.values()), "nothing propagated"


def test_samp_neyman_alloc_exhausts_budget(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.datapipe import (
        _NEYMAN_BUDGET,
    )

    rows = _Q["samp_neyman_alloc"].fn(spark, sf_dir).collect()
    assert rows
    assert sum(r["alloc"] for r in rows) == _NEYMAN_BUDGET
    tot_w = sum(r["weight"] for r in rows)
    for r in rows:
        base = _NEYMAN_BUDGET * r["weight"] // tot_w
        assert r["alloc"] in (base, base + 1)
        assert r["weight"] == r["n_rows"] * r["s_milli"]


def test_sec_l_diversity_matches_recompute(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _LDIV_BAND_C,
        _LDIV_L,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").collect()
    exp: dict[tuple, set] = {}
    for c in cust:
        band = (round(c["c_acctbal"] * 100) + 100000) // _LDIV_BAND_C
        exp.setdefault((c["c_nationkey"], c["c_mktsegment"]), set()).add(band)
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in _Q["sec_l_diversity"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for k, bands in exp.items():
        assert got[k]["n_bands"] == len(bands)
        assert got[k]["l_ok"] == int(len(bands) >= _LDIV_L)


def test_evt_hhi_concentration_bounds(spark, sf_dir):
    """1/n_users <= HHI <= 1 (in ppm, up to floor), and HHI >= the
    largest single share squared."""
    rows = _Q["evt_hhi_concentration"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["hhi_ppm"] <= 1_000_000
        assert r["hhi_ppm"] >= 1_000_000 // r["n_users"] - 1
        assert r["hhi_ppm"] >= r["top_share_ppm"] ** 2 // 1_000_000 - 1
        assert r["top_share_ppm"] * r["n_users"] >= 1_000_000 - r["n_users"]


def test_dq_freshness_sla_replay(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.quality import (
        _FRESH_RECENT_DAYS,
        _FRESH_SLA_DAYS,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.expr("unix_date(ts_date)").alias("day"))
        .collect()
    )
    corpus_last = max(r["day"] for r in ev)
    per: dict[str, list] = {}
    for r in ev:
        per.setdefault(r["event_type"], []).append(r["day"])
    got = {r["event_type"]: r for r in _Q["dq_freshness_sla"].fn(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for t, days in per.items():
        r = got[t]
        assert r["n_events"] == len(days)
        assert r["last_day"] == max(days)
        assert r["lag_days"] == corpus_last - max(days)
        assert r["fresh_ok"] == int(r["lag_days"] <= _FRESH_SLA_DAYS)
        recent = sum(1 for d in days if d > corpus_last - _FRESH_RECENT_DAYS)
        assert r["recent_share_ppm"] == recent * 1_000_000 // len(days)
    assert any(r["lag_days"] == 0 for r in got.values())


def test_agg_wilson_rank_is_conservative(spark, sf_dir):
    """The lower bound never exceeds the raw rate, shrinks toward it
    as n grows (same rate), and the rank column is a permutation
    ordered by (lb desc, brand)."""
    rows = _Q["agg_wilson_rank"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["wilson_lb_ppm"] <= r["raw_ppm"] + 2_000_000 // r["n"] + 1
        assert r["wilson_lb_ppm"] <= 1_000_000
    ordered = sorted(rows, key=lambda r: (-r["wilson_lb_ppm"], r["p_brand"]))
    assert [r["rank"] for r in ordered] == list(range(1, len(rows) + 1))
    # 2-of-2 must rank below 90-of-100 in lb terms (the motivating case)
    import math

    def lb(s, n):
        return math.floor(
            1e6 * (s + 2.0 - 2.0 * math.sqrt(s * float(n - s) / n + 1.0)) / (n + 4.0)
        )

    assert lb(2, 2) < lb(90, 100)


def test_graph_clustering_coeff_replay(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        dedup_minhash_lsh,
    )

    pairs = dedup_minhash_lsh(spark, sf_dir).where(F.col("est_jaccard") >= 0.5)
    edges = set()
    for r in pairs.collect():
        edges.add((min(r["doc1"], r["doc2"]), max(r["doc1"], r["doc2"])))
    nbrs: dict[int, set] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    got = {r["doc_id"]: r for r in _Q["graph_clustering_coeff"].fn(spark, sf_dir).collect()}
    assert set(got) == set(nbrs)
    saw_closed = False
    for v, ns in nbrs.items():
        r = got[v]
        assert r["deg"] == len(ns)
        ns_sorted = sorted(ns)
        tri = sum(
            1
            for i, x in enumerate(ns_sorted)
            for y in ns_sorted[i + 1 :]
            if (x, y) in edges
        )
        assert r["tri"] == tri
        if len(ns) >= 2:
            assert r["coeff_ppm"] == 2 * tri * 1_000_000 // (len(ns) * (len(ns) - 1))
            saw_closed = saw_closed or tri > 0
        else:
            assert r["coeff_ppm"] is None
    assert saw_closed, "no closed wedge in fixture graph"


def test_win_interval_merge_replay(spark, sf_dir):
    """Python replay of the 1-h-hold interval union per user: merged
    count, covered time, and longest stretch all match, and merging
    actually collapses overlaps somewhere in the fixture."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _IVM_HOLD_US,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts_us")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts_us"], r["event_id"]))
    got = {r["user_id"]: r for r in _Q["win_interval_merge"].fn(spark, sf_dir).collect()}
    assert set(got) == set(by_user)
    merged_somewhere = False
    for u, evs in by_user.items():
        evs.sort()
        islands = []
        for s, _ in evs:
            t = s + _IVM_HOLD_US
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], t)
            else:
                islands.append([s, t])
        r = got[u]
        assert r["n_events"] == len(evs)
        assert r["n_intervals"] == len(islands)
        assert r["covered_us"] == sum(b - a for a, b in islands)
        assert r["longest_us"] == max(b - a for a, b in islands)
        merged_somewhere = merged_somewhere or len(islands) < len(evs)
    assert merged_somewhere


def test_txt_vocab_coverage_curve_properties(spark, sf_dir):
    from collections import Counter

    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _VOCAB_LADDER,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    import re as _re

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    counts = Counter(t for doc in texts for t in _re.findall(r"\S+", doc))
    order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    rows = {r["k"]: r for r in _Q["txt_vocab_coverage"].fn(spark, sf_dir).collect()}
    assert set(rows) == {k for k in _VOCAB_LADDER if k <= len(order)}
    prev_cov = 0
    for k in sorted(rows):
        r = rows[k]
        assert r["vocab_size"] == len(order)
        assert r["total_tokens"] == total
        assert r["boundary_token"] == order[k - 1][0]
        assert r["cnt"] == order[k - 1][1]
        assert r["cum_cnt"] == sum(c for _, c in order[:k])
        assert r["coverage_ppm"] == r["cum_cnt"] * 1_000_000 // total
        assert r["coverage_ppm"] >= prev_cov
        prev_cov = r["coverage_ppm"]
    assert prev_cov <= 1_000_000


def test_graph_assortativity_matches_rational_recompute(spark, sf_dir):
    from fractions import Fraction

    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        dedup_minhash_lsh,
    )

    edges = set()
    for r in dedup_minhash_lsh(spark, sf_dir).where(F.col("est_jaccard") >= 0.5).collect():
        edges.add((min(r["doc1"], r["doc2"]), max(r["doc1"], r["doc2"])))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ends = [(deg[a], deg[b]) for a, b in edges] + [(deg[b], deg[a]) for a, b in edges]
    n = len(ends)
    sx = sum(x for x, _ in ends)
    sxx = sum(x * x for x, _ in ends)
    sxy = sum(x * y for x, y in ends)
    [row] = _Q["graph_assortativity"].fn(spark, sf_dir).collect()
    assert row["n_edge_ends"] == n
    assert row["sum_deg"] == sx
    den = n * sxx - sx * sx
    if den > 0:
        # truncating (div) semantics on a possibly negative numerator
        num = (n * sxy - sx * sx) * 1_000_000
        expect = abs(num) // den * (1 if num >= 0 else -1)
        assert row["assortativity_ppm"] == expect
        assert -1_000_000 <= row["assortativity_ppm"] <= 1_000_000
    else:
        assert row["assortativity_ppm"] is None


def test_ts_holt_linear_replay(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _HOLT_H,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.expr("unix_date(ts_date)").alias("day"))
        .count()
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["count"]))

    def tdiv2(a):
        return -((-a) // 2) if a < 0 else a // 2

    got = {r["event_type"]: r for r in _Q["ts_holt_linear"].fn(spark, sf_dir).collect()}
    assert set(got) == {t for t, s in series.items() if len(s) >= 2}
    for t, s in series.items():
        if len(s) < 2:
            continue
        xs = [x for _, x in sorted(s)]
        l, b = xs[0], xs[1] - xs[0]
        for x in xs[2:]:
            lp = tdiv2(x + l + b)
            b = tdiv2(lp - l + b)
            l = lp
        r = got[t]
        assert (r["n_days"], r["level"], r["trend"]) == (len(xs), l, b)
        assert r["forecast_7d"] == l + _HOLT_H * b


def test_evt_error_budget_burn_replay(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _BURN_WINDOW_D,
        _SLO_ERR_PPM,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.expr("unix_date(ts_date)").alias("day"))
        .agg(
            F.sum((F.col("event_type") == "error").cast("long")).alias("e"),
            F.count(F.lit(1)).alias("t"),
        )
        .collect()
    )
    grid = sorted((r["day"], r["e"], r["t"]) for r in daily)
    got = {r["day"]: r for r in _Q["evt_error_budget_burn"].fn(spark, sf_dir).collect()}
    assert set(got) == {d for d, _, _ in grid}
    for i, (d, e, t) in enumerate(grid):
        r = got[d]
        w = grid[max(0, i - _BURN_WINDOW_D + 1) : i + 1]
        e7, t7 = sum(x[1] for x in w), sum(x[2] for x in w)
        assert r["err_ppm"] == e * 1_000_000 // t
        assert r["burn_1d_permille"] == (e * 1_000_000 // t) * 1000 // _SLO_ERR_PPM
        assert r["burn_7d_permille"] == (e7 * 1_000_000 // t7) * 1000 // _SLO_ERR_PPM
        assert r["alert"] == int(r["burn_7d_permille"] > 1000)
    assert {r["alert"] for r in got.values()} == {0, 1}


def test_rag_context_packing_is_budgeted_prefix(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.retrieval import (
        _PACK_BUDGET_TOKENS,
        rag_bm25_topk,
    )
    from pe_firm_investment_database_pipeline_spark.plans.textops import _TOKENS
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    top = sorted(
        rag_bm25_topk(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    dl = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(f"CAST(size({_TOKENS}) AS BIGINT)").alias("n"))
        .collect()
    }
    packed = sorted(
        _Q["rag_context_packing"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert packed, "budget admits nothing — raise _PACK_BUDGET_TOKENS"
    assert [r["rank"] for r in packed] == list(range(1, len(packed) + 1))
    cum = 0
    for r in packed:
        cum += dl[r["doc_id"]]
        assert r["dl"] == dl[r["doc_id"]]
        assert r["cum_tokens"] == cum <= _PACK_BUDGET_TOKENS
    if len(packed) < len(top):  # the cut is tight: next doc overflows
        nxt = top[len(packed)]["doc_id"]
        assert cum + dl[nxt] > _PACK_BUDGET_TOKENS


def test_dedup_cluster_purity_replay(spark, sf_dir):
    from pe_firm_investment_database_pipeline_spark.plans.components import (
        dedup_connected_components,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import load_table

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_connected_components(spark, sf_dir).collect()
    }
    lang = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    clusters: dict[int, list] = {}
    for d, c in labels.items():
        clusters.setdefault(c, []).append(lang[d])
    got = {r["cluster_id"]: r for r in _Q["dedup_cluster_purity"].fn(spark, sf_dir).collect()}
    expect_ids = {c for c, members in clusters.items() if len(members) >= 2}
    assert set(got) == expect_ids
    for c in expect_ids:
        members = clusters[c]
        counts: dict[str, int] = {}
        for lg in members:
            counts[lg] = counts.get(lg, 0) + 1
        top_lang, top_n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0], max(counts.values())
        r = got[c]
        assert r["sz"] == len(members)
        assert r["n_langs"] == len(counts)
        assert r["top_lang"] == top_lang
        assert r["top_share_ppm"] == top_n * 1_000_000 // len(members)
        assert r["is_pure"] == int(len(counts) == 1)


def test_join_star_q5_plan_is_one_shuffle_join(spark, sf_dir):
    """Exactly one non-broadcast join (lineitem x orders); customer,
    supplier, and nation all broadcast — the 100 TB star shape."""
    df = _Q["join_star_q5_local"].fn(spark, sf_dir)
    rows = df.collect()  # run first: AQE finalizes join strategies lazily
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_bcast = plan.count("BroadcastHashJoin")
    n_shuffle_join = plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    )
    assert n_bcast >= 3, plan[:3000]
    assert n_shuffle_join <= 1, plan[:3000]
    assert rows and all(r["revenue_c"] > 0 and r["n_items"] > 0 for r in rows)


def test_graph_resource_alloc_replay(spark, sf_dir):
    """RA(x,y) = sum over shared neighbors z of floor(1e6/deg(z)) —
    Python replay over the same LSH edge set, plus the hub-vs-bridge
    ordering property (a low-degree bridge outweighs a hub)."""
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
        for r in _Q["graph_resource_alloc"].fn(spark, sf_dir).collect()
    }
    # replay: every output pair must match the exact ppm sum
    for (x, y), r in got.items():
        shared = adj[x] & adj[y]
        assert shared, (x, y)
        assert r["common_neighbors"] == len(shared)
        assert r["ra_ppm"] == sum(1_000_000 // len(adj[z]) for z in shared)
        assert r["is_edge"] == ((x, y) in edges)
    # completeness: every x<y pair with a shared neighbor appears
    import itertools

    all_pairs = set()
    for z, ns in adj.items():
        for x, y in itertools.combinations(sorted(ns), 2):
            all_pairs.add((x, y))
    assert set(got) == all_pairs
