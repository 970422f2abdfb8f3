"""Reusable column-expression builders for the reference's resolution
algebra (founded_year.py:203-282, step3_attempt1.py:277-304,415-443).

These are the reference's most intricate *logic* — set-intersection
consensus, priority fallback, fuzzy name equality, weighted scoring
with ordinal thresholds — extracted as pure Column builders so the
query plans (plans/enrichment.py, plans/matching.py) and the
truth-table unit tests (tests/test_resolution_semantics.py) share one
implementation. Everything is built-in expressions: codegen'd,
shuffle-free, oracle-friendly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def consensus_min(arrays: Sequence[Column]) -> Column:
    """founded_year.py:203-217: intersect all NON-EMPTY per-method
    sets; answer = min of the intersection, null when empty/none."""
    non_empty = F.filter(F.array(*arrays), lambda a: F.size(a) > 0)
    inter = F.aggregate(
        non_empty,
        F.lit(None).cast("array<bigint>"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(F.array_intersect(acc, x)),
    )
    return F.array_min(inter)


def priority_coalesce(arrays: Sequence[Column]) -> Column:
    """founded_year.py:250-266: first non-empty source in reliability
    order, then min of that source."""
    picked = None
    for a in arrays:
        term = F.when(F.size(a) > 0, F.array_min(a))
        picked = term if picked is None else F.coalesce(picked, term)
    return picked


def weighted_vote_min(
    years: Column, weights: Column, threshold: int = 11
) -> Column:
    """founded_year.py:231-247 in array form: per-row zipped
    (year, weight) pairs; candidate years accumulate weight; answer =
    min year with total weight >= threshold. The relational form
    (explode + groupBy + HAVING) lives in plans/enrichment.py —
    this array form is its per-group semantics."""
    distinct_years = F.array_distinct(years)
    totals = F.transform(
        distinct_years,
        lambda y: F.struct(
            y.alias("y"),
            F.aggregate(
                F.zip_with(years, weights, lambda yy, w: F.when(yy == y, w).otherwise(F.lit(0))),
                F.lit(0).cast("long"),
                lambda acc, w: acc + w,
            ).alias("wsum"),
        ),
    )
    qualified = F.filter(totals, lambda t: t.getField("wsum") >= threshold)
    return F.array_min(F.transform(qualified, lambda t: t.getField("y")))


def name_matches(a: Column, b: Column) -> Column:
    """step3_attempt1.py:277-287: normalize (collapse ws, trim,
    lower); equal OR >=3-char substring containment either way."""
    n1 = F.lower(F.trim(F.regexp_replace(a, r"\s+", " ")))
    n2 = F.lower(F.trim(F.regexp_replace(b, r"\s+", " ")))
    return (n1 == n2) | (
        (F.length(n1) >= 3)
        & (F.length(n2) >= 3)
        & (n1.contains(n2) | n2.contains(n1))
    )


def rank_label(score: Column) -> Column:
    """step3_attempt1.py:415-443 thresholds: >=1.8 A, >=1.2 B,
    >=0.6 C, else D."""
    return (
        F.when(score >= 1.8, "A")
        .when(score >= 1.2, "B")
        .when(score >= 0.6, "C")
        .otherwise("D")
    )


def rank_points(rank: Column) -> Column:
    """.portCo_research.py:45-50: A..F -> 6..1 points map."""
    return (
        F.when(rank == "A", 6)
        .when(rank == "B", 5)
        .when(rank == "C", 4)
        .when(rank == "D", 3)
        .when(rank == "E", 2)
        .otherwise(1)
        .cast("long")
    )
