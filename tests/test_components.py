"""Exactness tests for the iterative connected-components operator
(rows-only at the driver, so correctness is pinned here)."""

from __future__ import annotations

from pe_firm_investment_database_pipeline_spark.plans.components import (
    connected_components,
    dedup_connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, schema="s long, d long")
    got = connected_components(df, "s", "d").collect()
    return {r["v"]: r["comp"] for r in got}


def test_two_chains_and_isolated_pair(spark):
    # chain 1-2-3-4, pair 10-11, triangle 20-21-22
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    comp = _cc(spark, edges)
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_chain_converges(spark):
    # a 200-edge path has diameter 200 — plain O(diameter) propagation
    # would blow the 20-round cap; pointer jumping must close it in
    # O(log n) rounds.
    edges = [(i, i + 1) for i in range(200)]
    comp = _cc(spark, edges)
    assert set(comp.values()) == {0}
    assert len(comp) == 201


def test_bridge_merges_clusters(spark):
    edges = [(1, 2), (3, 4), (2, 3)]
    comp = _cc(spark, edges)
    assert set(comp.values()) == {1}


def test_dedup_clusters_planted_dups(spark):
    """Each planted near-dup pair must land in one cluster with
    exactly one keeper."""
    out = dedup_connected_components(spark, "/root/testdata/sf0.001").collect()
    assert out
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m["is_keeper"]]
        assert len(keepers) == 1
        assert keepers[0]["doc_id"] == cid == min(m["doc_id"] for m in members)


def test_canonical_pick_survivors(spark):
    """Survivor selection: every cluster has exactly one canonical
    member, and it is the longest document (ties to smallest doc_id);
    unclustered docs are their own canonical singletons."""
    from pe_firm_investment_database_pipeline_spark.plans.components import (
        dedup_canonical_pick,
    )
    from pe_firm_investment_database_pipeline_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    out = dedup_canonical_pick(spark, sf).collect()
    nchars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf, "documents").collect()
    }
    assert len(out) == len(nchars)  # every document classified
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    multi = 0
    for cid, members in by_cluster.items():
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1
        if len(members) > 1:
            multi += 1
            best = min(
                members, key=lambda m: (-nchars[m["doc_id"]], m["doc_id"])
            )
            assert canon[0]["doc_id"] == best["doc_id"]
    assert multi > 0  # fixture plants near-dups, so clusters exist


def test_pagerank_star_graph(spark):
    """Hand-checkable PageRank on a 4-leaf star: the hub aggregates
    the leaves' full ranks (deg 1), leaves split the hub's rank four
    ways — hub rank must exceed leaf rank, leaves must tie, and the
    exact integer recurrence must reproduce by hand."""
    from pe_firm_investment_database_pipeline_spark.plans.components import (
        _PR_BASE,
        _PR_ITERS,
    )
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "a long, b long"
    )
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    e = sym.join(deg, "a")
    ranks = deg.select(F.col("a").alias("v"), F.lit(_PR_BASE).cast("long").alias("r"))
    teleport = (15 * _PR_BASE) // 100
    for _ in range(_PR_ITERS):
        contrib = (
            e.join(ranks, e.a == ranks.v)
            .select("b", F.expr("r div deg").alias("c"))
            .groupBy("b")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.select(
            F.col("b").alias("v"),
            (F.lit(teleport) + F.expr("(85 * s) div 100")).cast("long").alias("r"),
        )
    got = {r["v"]: r["r"] for r in ranks.collect()}
    # hand recurrence
    hub, leaf = _PR_BASE, _PR_BASE
    for _ in range(_PR_ITERS):
        hub, leaf = (
            teleport + (85 * (4 * (leaf // 1))) // 100,
            teleport + (85 * (hub // 4)) // 100,
        )
    assert got[0] == hub
    assert all(got[i] == leaf for i in range(1, 5))
    assert hub > leaf


def test_triangles_on_planted_clique(spark, tmp_path):
    """graph_triangles on a planted 3-clique (three identical docs →
    all three near-dup pairs): exactly one triangle, so each of the
    three documents has n_triangles = 1; the lone extra dup pair
    (a 2-clique) contributes none."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en"),
        (1, "alpha beta gamma delta epsilon zeta", "en"),
        (2, "alpha beta gamma delta epsilon zeta", "en"),
        (3, "one two three four five six seven", "en"),
        (4, "one two three four five six seven", "en"),
        (5, "totally different words appear in this document here", "en"),
    ]
    rows = [(i, t, lang, f"src{i}", len(t)) for i, t, lang in rows]
    df = spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    from pe_firm_investment_database_pipeline_spark.plans.components import (
        graph_triangles,
    )

    got = {r["doc_id"]: r["n_triangles"] for r in graph_triangles(spark, d).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
