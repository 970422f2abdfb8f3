"""Behavior pins for round-10 operators — mechanism-level assertions
beyond the registry-wide oracle parity sweep (tests/test_parity.py)."""

from __future__ import annotations

from pe_firm_investment_database_pipeline_spark.plans import all_queries

_Q = all_queries()


def test_npv_discount_table_is_exact_integer_power():
    """df_ppm(m) must equal floor(1e6 * (100/101)^m) computed in exact
    integer arithmetic — monotone decreasing from exactly 1e6, never
    touched by libm."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _NPV_DF_PPM,
        _NPV_MONTHS,
    )

    assert len(_NPV_DF_PPM) == _NPV_MONTHS == 96
    assert _NPV_DF_PPM[0] == 1_000_000
    for m, v in enumerate(_NPV_DF_PPM):
        assert v == (10**6 * 100**m) // (101**m)
    assert all(b < a for a, b in zip(_NPV_DF_PPM, _NPV_DF_PPM[1:]))


def test_npv_bounds_and_python_replay(spark, sf_dir):
    """Every nation's NPV is positive and strictly below nominal (the
    origin month is never the only cashflow month), the loss column
    is the exact difference, and one nation's NPV replays in plain
    Python from the raw grid."""
    from pe_firm_investment_database_pipeline_spark.plans.advanced_aggs import (
        _NPV_BASE_YM,
        _NPV_DF_PPM,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    rows = _Q["fin_npv_schedule"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert 0 < r["npv_c"] < r["nominal_c"]
        assert r["discount_loss_c"] == r["nominal_c"] - r["npv_c"]

    target = rows[0]["n_name"]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr(
            "year(CAST(l_shipdate AS DATE)) * 12"
            " + month(CAST(l_shipdate AS DATE))"
        ).alias("ym"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cf_c"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == target
    )
    grid = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .groupBy("ym")
        .agg(F.sum("cf_c").alias("cf"))
        .collect()
    )
    npv = sum(
        (r["cf"] * _NPV_DF_PPM[r["ym"] - _NPV_BASE_YM]) // 10**6
        for r in grid
    )
    assert npv == next(r["npv_c"] for r in rows if r["n_name"] == target)


def test_bpe_merge_rounds_ledger_shape(spark, sf_dir):
    """Three rounds, strictly decreasing corpus symbol counts, and
    round 1's merge equals txt_bpe_train_step's rank-1 pair (the loop
    generalizes the step, it doesn't redefine it)."""
    rows = sorted(
        _Q["txt_bpe_merge_rounds"].fn(spark, sf_dir).collect(),
        key=lambda r: r["merge_round"],
    )
    assert [r["merge_round"] for r in rows] == [1, 2, 3]
    assert all(r["pair_count"] > 0 for r in rows)
    syms = [r["symbols_after"] for r in rows]
    assert syms[0] > syms[1] > syms[2]

    step = _Q["txt_bpe_train_step"].fn(spark, sf_dir).collect()
    top1 = next(r for r in step if r["rank"] == 1)
    assert rows[0]["merge_pair"] == top1["pair"]


def test_bpe_merge_rounds_python_replay(spark, sf_dir):
    """Full greedy replay in plain Python: rebuild the word table,
    run three merge rounds with leftmost non-overlapping replace, and
    demand the exact (pair, count, symbols) ledger."""
    from pe_firm_investment_database_pipeline_spark.plans.textops import (
        _BPE_MARKS,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    words: dict[str, int] = {}
    for r in docs:
        for t in r["text"].split():
            w = t.lower()
            words[w] = words.get(w, 0) + 1

    ledger = []
    for mark in _BPE_MARKS:
        pairs: dict[str, int] = {}
        for w, cnt in words.items():
            for i in range(len(w) - 1):
                pairs[w[i : i + 2]] = pairs.get(w[i : i + 2], 0) + cnt
        mp = min(pairs, key=lambda p: (-pairs[p], p))
        nxt: dict[str, int] = {}
        for w, cnt in words.items():
            w2 = w.replace(mp, mark)  # leftmost non-overlapping
            nxt[w2] = nxt.get(w2, 0) + cnt
        words = nxt
        ledger.append(
            (mp, pairs[mp], sum(cnt * len(w) for w, cnt in words.items()))
        )

    rows = sorted(
        _Q["txt_bpe_merge_rounds"].fn(spark, sf_dir).collect(),
        key=lambda r: r["merge_round"],
    )
    got = [
        (r["merge_pair"], r["pair_count"], r["symbols_after"]) for r in rows
    ]
    assert got == ledger
