"""Truth-table unit tests for the reference's resolution algebra
(SURVEY §5 'unit fixtures from reference semantics'): cases derived
directly from founded_year.py:203-266 and
step3_attempt1.py:277-304,415-443 against the shared expression
builders in functions/resolution.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from pe_firm_investment_database_pipeline_spark.functions.resolution import (
    consensus_min,
    name_matches,
    priority_coalesce,
    rank_label,
    rank_points,
    weighted_vote_min,
)

ARR = "array<bigint>"


def _one(df, col):
    return df.select(col.alias("v")).first()["v"]


def _arrays_df(spark, a, b, c, d):
    row = [(a, b, c, d)]
    return spark.createDataFrame(row, schema=f"a {ARR}, b {ARR}, c {ARR}, d {ARR}")


def _cons(spark, a, b, c, d):
    df = _arrays_df(spark, a, b, c, d)
    return _one(df, consensus_min([F.col("a"), F.col("b"), F.col("c"), F.col("d")]))


def test_consensus_intersection_of_non_empty(spark):
    # empty sets are EXCLUDED from the intersection (fy.py:207-213)
    assert _cons(spark, [2000, 2001], [2001, 2002], [], [2001]) == 2001


def test_consensus_min_of_multi_element_intersection(spark):
    assert _cons(spark, [1999, 2001], [1999, 2001], [], []) == 1999


def test_consensus_disjoint_is_null(spark):
    assert _cons(spark, [2000], [2001], [], []) is None


def test_consensus_single_source_wins(spark):
    assert _cons(spark, [], [], [2005, 1998], []) == 1998


def test_consensus_all_empty_is_null(spark):
    assert _cons(spark, [], [], [], []) is None


def test_priority_coalesce_order(spark):
    df = _arrays_df(spark, [], [2003, 2001], [1990], [])
    got = _one(
        df, priority_coalesce([F.col("a"), F.col("b"), F.col("c"), F.col("d")])
    )
    # first NON-EMPTY source in order wins (b), answer = its min
    assert got == 2001


def test_priority_coalesce_all_empty(spark):
    df = _arrays_df(spark, [], [], [], [])
    assert (
        _one(df, priority_coalesce([F.col("a"), F.col("b"), F.col("c"), F.col("d")]))
        is None
    )


def test_weighted_vote_google_weight(spark):
    # google=10 + one corroborating hit -> 11 >= threshold (fy.py:233-247)
    df = spark.createDataFrame(
        [([2001, 2001, 2002], [10, 1, 1])], schema=f"ys {ARR}, ws {ARR}"
    )
    assert _one(df, weighted_vote_min(F.col("ys"), F.col("ws"))) == 2001


def test_weighted_vote_google_alone_insufficient(spark):
    # a bare google hit (10) misses the 11 threshold
    df = spark.createDataFrame(
        [([2001, 2002], [10, 1])], schema=f"ys {ARR}, ws {ARR}"
    )
    assert _one(df, weighted_vote_min(F.col("ys"), F.col("ws"))) is None


def test_weighted_vote_min_of_qualified(spark):
    df = spark.createDataFrame(
        [([1999, 1999, 2003, 2003], [10, 1, 10, 5])], schema=f"ys {ARR}, ws {ARR}"
    )
    # both qualify (11 and 15) -> min year wins (fy.py:247)
    assert _one(df, weighted_vote_min(F.col("ys"), F.col("ws"))) == 1999


def test_name_match_truth_table(spark):
    cases = [
        ("Adamantem Capital", "adamantem   capital", True),  # normalize+lower
        ("Allegro Funds", "Allegro", True),  # >=3-char containment
        ("Allegro Funds", "al", False),  # <3 chars never matches
        ("Anacacia", "Quadrant", False),
        ("abc", "zabcz", True),  # containment either direction
    ]
    df = spark.createDataFrame(cases, schema="a string, b string, want boolean")
    got = df.select(name_matches(F.col("a"), F.col("b")).alias("m"), "want").collect()
    for r in got:
        assert r["m"] == r["want"]


def test_rank_thresholds_exact_boundaries(spark):
    cases = [(1.8, "A"), (1.79, "B"), (1.2, "B"), (1.19, "C"), (0.6, "C"), (0.59, "D")]
    df = spark.createDataFrame(cases, schema="s double, want string")
    for r in df.select(rank_label(F.col("s")).alias("r"), "want").collect():
        assert r["r"] == r["want"]


def test_rank_points_full_map(spark):
    cases = [("A", 6), ("B", 5), ("C", 4), ("D", 3), ("E", 2), ("F", 1)]
    df = spark.createDataFrame(cases, schema="r string, want long")
    for row in df.select(rank_points(F.col("r")).alias("p"), "want").collect():
        assert row["p"] == row["want"]


def test_fuzzy_join_recovers_true_master(spark):
    """join_fuzzy_name must link EVERY dirty name back to a master row
    carrying its own original name (the fixture's part names repeat
    across keys, so the deterministic tie-break may pick an earlier
    key with the identical name — name-level recall is the right
    invariant, and the block must never lose the true match)."""
    from pyspark.sql import functions as F

    from pe_firm_investment_database_pipeline_spark.plans.matching import (
        join_fuzzy_name,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.01"
    names = {
        r["p_partkey"]: r["n"]
        for r in load_table(spark, sf, "part")
        .select("p_partkey", F.lower("p_name").alias("n"))
        .collect()
    }
    rows = join_fuzzy_name(spark, sf).collect()
    assert len(rows) == sum(1 for k in names if k % 10 == 0)  # no dirty row lost
    assert all(r["edit_distance"] <= 1 for r in rows)
    assert all(names[r["master_key"]] == names[r["dirty_key"]] for r in rows)
