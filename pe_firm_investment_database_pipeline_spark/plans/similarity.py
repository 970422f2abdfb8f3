"""Similarity search over the embeddings table (array<float>[64]) —
the ANN extension surface (repo:BASELINE.json:6).

Engine-parity trick: embeddings are quantized to integer micro-units
(floor(x * 1e6)) before any arithmetic. Dot products and norms then
run in exact int64 (order-insensitive, engine-independent); the final
cosine is a division of identical integers — bit-identical doubles on
Spark and DuckDB, so ranking and top-k are fully deterministic.

Scale notes:
- brute-force top-k: one broadcast of the query vector, a single
  narrow projection per row, TakeOrderedAndProject for the top-k —
  the right baseline even at 10^9 vectors when k is small.
- blocked kNN / near-dup / IVF: candidate pairs are generated ONLY
  inside a random-hyperplane LSH cell (equi-join on the cell id). The
  cell id is the low `nbits` bits of a 16-bit sign signature, and
  `nbits` is derived IN-PLAN from the corpus count (log2(N/target)),
  so the number of cells GROWS with the data — per-cell population
  stays ~constant and the pair count stays O(N), never O(N^2/k) with
  a fixed k. At 100 TB the same plan shape holds: signature map-side,
  one shuffle on cell, AQE skew-join splits hot cells.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table

_QUANT = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
_QUANT_DUCK = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
)
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
_DOT_DUCK = "CAST(list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i])) AS BIGINT)"


def _emb_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.expr(_QUANT).alias("q"),
        F.expr(_DOT.format(a=_QUANT, b=_QUANT)).alias("nrm"),
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH signature (the scale-bearing blocking key)
# ---------------------------------------------------------------------------
#
# 16 fixed hyperplanes over the 64 dims, integer weights in
# {-2,-1,1,2} from a seeded RNG, embedded as LITERAL arrays in both
# the Spark expression and the DuckDB SQL — the sign pattern of the
# 16 integer dot products is therefore bit-identical across engines
# (all-int64 arithmetic, no float rounding). Identical vectors always
# land in the same cell, so exact/near-exact duplicates are never
# split by the blocking.
#
# The cell id keeps only the low `nbits` bits of the signature, and
# `nbits` is computed IN-PLAN from COUNT(*) of the blocked set:
#   nbits = clamp(lo, 16, floor(log2(N / target_cell_rows)))
# so cell count scales ~N/target (pair blocking) or ~sqrt(N) (IVF) —
# the property the 100 TB path needs. Cost: one tiny scalar aggregate
# broadcast onto the scan (Spark) / a CROSS JOIN on a 1-row CTE
# (DuckDB).

_N_PLANES = 16


def _make_planes() -> list[list[int]]:
    out = []
    for i in range(_N_PLANES):
        rng = random.Random(715 + i)  # one RNG per plane, fresh draw per dim
        out.append([rng.choice([-2, -1, 1, 2]) for _ in range(64)])
    return out


_PLANES = _make_planes()


def _sig_spark() -> str:
    terms = []
    for i, ws in enumerate(_PLANES):
        arr = ",".join(str(w) for w in ws)
        dot = (
            f"aggregate(zip_with(q, array({arr}), (x, y) -> x * y), "
            "0L, (acc, v) -> acc + v)"
        )
        terms.append(f"IF({dot} > 0, {1 << i}L, 0L)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _sig_duck() -> str:
    terms = []
    for i, ws in enumerate(_PLANES):
        arr = ",".join(str(w) for w in ws)
        dot = f"list_sum(list_transform(range(1, 65), i -> q[i] * ([{arr}])[i]))"
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_SIG = _sig_spark()
_SIG_DUCK = _sig_duck()

# nbits formulas over the blocked-set count `n`; the GREATEST guards
# tiny inputs, 16 is the signature width. Both engines evaluate
# IEEE-double log2/sqrt + floor on the same integer count — identical
# results. _NBITS_PAIR targets ~32 rows/cell (cells ~ N/32, pair cost
# O(N)); _NBITS_IVF targets ~sqrt(N) cells (per-probe scan ~sqrt(N)).
_NBITS_PAIR = (
    "GREATEST(1, LEAST(16, CAST(floor(log2(CAST(n AS DOUBLE) / 32.0)) AS INT)))"
)
_NBITS_IVF = (
    "GREATEST(3, LEAST(16, CAST(floor(log2(sqrt(CAST(n AS DOUBLE)))) AS INT)))"
)


def _celled(df: DataFrame, nbits_sql: str) -> DataFrame:
    """Attach `cell` = low-nbits bits of the LSH signature, with nbits
    derived from COUNT(*) of `df` via a broadcast 1-row scalar."""
    sigs = df.withColumn("sig", F.expr(_SIG))
    params = (
        df.agg(F.count(F.lit(1)).alias("n"))
        .select(F.expr(nbits_sql).alias("nbits"))
    )
    return (
        sigs.crossJoin(F.broadcast(params))
        .withColumn("cell", F.expr("sig % shiftleft(1, nbits)"))
    )


def _celled_duck(src: str, nbits_sql: str) -> str:
    """DuckDB twin of `_celled`: CTE text producing (src.*, cell)."""
    return f"""
  SELECT s.*, s.sig % (1 << p.nbits) AS cell
  FROM (SELECT *, {_SIG_DUCK} AS sig FROM {src}) s
  CROSS JOIN (SELECT {nbits_sql} AS nbits
              FROM (SELECT COUNT(*) AS n FROM {src})) p
"""

def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 to the query vector (vec_id=0).
    The single-row query side is broadcast; the scan side computes one
    fused projection per row; top-k is TakeOrderedAndProject (no full
    sort). Ties broken by vec_id for determinism."""
    emb = _emb_q(spark, sf_dir)
    q = (
        emb.where(F.col("vec_id") == 0)
        .select(F.col("q").alias("qq"), F.col("nrm").alias("qnrm"))
    )
    dot = F.expr(_DOT.format(a="q", b="qq"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("nrm").cast("double")) * F.sqrt(F.col("qnrm").cast("double"))
    )
    return (
        emb.where(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


_SIM_COSINE_TOPK_SQL = f"""
WITH eq AS (
  SELECT vec_id, label, {_QUANT_DUCK} AS q,
         {_DOT_DUCK.format(a=_QUANT_DUCK, b=_QUANT_DUCK)} AS nrm
  FROM embeddings
), query AS (
  SELECT q AS qq, nrm AS qnrm FROM eq WHERE vec_id = 0
)
SELECT vec_id, label,
       CAST({_DOT_DUCK.format(a="q", b="qq")} AS DOUBLE)
         / (sqrt(CAST(nrm AS DOUBLE)) * sqrt(CAST(qnrm AS DOUBLE))) AS cosine
FROM eq CROSS JOIN query
WHERE vec_id != 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def sim_knn_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked kNN: top-3 cosine neighbors per vector within its
    random-hyperplane cell. Pairs exist only inside a cell (equi-join
    on the cell id), ranked with a per-vector window. The cell count
    is derived in-plan from COUNT(*) (target ~32 rows/cell), so the
    candidate set stays O(N), not O(N^2 / constant) — the property
    the old 10-value `label` blocking lacked at 100 TB.
    Restricted to vec_id < 200 to keep the test-scale result compact."""
    emb = _celled(_emb_q(spark, sf_dir).where(F.col("vec_id") < 200), _NBITS_PAIR)
    a = emb.select(
        F.col("vec_id").alias("vec_id"),
        F.col("label").alias("label"),
        F.col("cell").alias("cell"),
        F.col("q").alias("qa"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("cell").alias("cell"),
        F.col("q").alias("qb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.expr(_DOT.format(a="qa", b="qb"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("vec_id") != F.col("nbr_id"))
        .select("vec_id", "label", "nbr_id", cos.alias("cosine"))
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        pairs.withColumn("nn_rank", F.row_number().over(w).cast("long"))
        .where(F.col("nn_rank") <= 3)
        .select("vec_id", "label", "nbr_id", "cosine", "nn_rank")
    )


_SIM_KNN_BLOCKED_SQL = f"""
WITH eq AS (
  SELECT vec_id, label, {_QUANT_DUCK} AS q,
         {_DOT_DUCK.format(a=_QUANT_DUCK, b=_QUANT_DUCK)} AS nrm
  FROM embeddings WHERE vec_id < 200
), celled AS ({_celled_duck("eq", _NBITS_PAIR)}
), pairs AS (
  SELECT a.vec_id, a.label, b.vec_id AS nbr_id,
         CAST({_DOT_DUCK.format(a="a.q", b="b.q")} AS DOUBLE)
           / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cosine
  FROM celled a JOIN celled b ON a.cell = b.cell AND a.vec_id != b.vec_id
)
SELECT vec_id, label, nbr_id, cosine, nn_rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cosine DESC, nbr_id) AS BIGINT) AS nn_rank
  FROM pairs)
WHERE nn_rank <= 3
"""


def sim_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics (norm distribution) — the
    aggregate shape used to size IVF cells."""
    emb = _emb_q(spark, sf_dir)
    nrm_d = F.sqrt(F.col("nrm").cast("double")) / 1000000.0
    return (
        emb.select("label", nrm_d.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
    )


_SIM_EMBEDDING_STATS_SQL = f"""
WITH eq AS (
  SELECT label,
         sqrt(CAST({_DOT_DUCK.format(a=_QUANT_DUCK, b=_QUANT_DUCK)} AS DOUBLE))
           / 1000000.0 AS norm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs, MIN(norm) AS min_norm, MAX(norm) AS max_norm
FROM eq GROUP BY label
"""


def sim_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN with multi-probe: the hyperplane sign quantizer
    assigns every vector to one of ~sqrt(N) cells (nbits =
    floor(log2(sqrt(N))), computed in-plan — the coarse 'inverted
    file' GROWS with the corpus); each query probes its OWN cell plus
    the 3 single-bit-flip neighbor cells (multi-probe recovers recall
    lost at cell boundaries), then ranks candidates by exact cosine
    and keeps top-3. Cost is |queries| x 4 x N/sqrt(N) = O(|queries| x
    sqrt(N)) — never the full database. At 100 TB the same plan holds
    with cells as partition keys (partition pruning per probe); swap
    the quantizer for sampled k-means centroids without changing the
    explode-probes -> equi-join-on-cell -> window-top-k shape. Queries
    restricted to vec_id < 20 for test-scale output."""
    emb = _celled(_emb_q(spark, sf_dir), _NBITS_IVF)
    queries = (
        emb.where(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("nrm").alias("qnrm"),
            F.explode(
                F.expr("array(cell, cell ^ 1, cell ^ 2, cell ^ 4)")
            ).alias("probe_cell"),
        )
    )
    db = emb.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("nbr_label"),
        F.col("q").alias("qb"),
        F.col("nrm").alias("nb"),
        F.col("cell").alias("cell"),
    )
    cos = F.expr(_DOT.format(a="qq", b="qb")).cast("double") / (
        F.sqrt(F.col("qnrm").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    cands = (
        queries.join(db, queries.probe_cell == db.cell)
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", "nbr_label", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        cands.withColumn("nn_rank", F.row_number().over(w).cast("long"))
        .where(F.col("nn_rank") <= 3)
        .select("query_id", "nbr_id", "nbr_label", "cosine", "nn_rank")
    )


_SIM_IVF_MULTIPROBE_SQL = f"""
WITH eq AS (
  SELECT vec_id, label, {_QUANT_DUCK} AS q,
         {_DOT_DUCK.format(a=_QUANT_DUCK, b=_QUANT_DUCK)} AS nrm
  FROM embeddings
), celled AS ({_celled_duck("eq", _NBITS_IVF)}
), probes AS (
  SELECT vec_id AS query_id, q AS qq, nrm AS qnrm,
         unnest([cell, xor(cell, 1), xor(cell, 2), xor(cell, 4)]) AS probe_cell
  FROM celled WHERE vec_id < 20
), cands AS (
  SELECT p.query_id, d.vec_id AS nbr_id, d.label AS nbr_label,
         CAST({_DOT_DUCK.format(a="p.qq", b="d.q")} AS DOUBLE)
           / (sqrt(CAST(p.qnrm AS DOUBLE)) * sqrt(CAST(d.nrm AS DOUBLE))) AS cosine
  FROM probes p JOIN celled d ON p.probe_cell = d.cell
  WHERE p.query_id != d.vec_id
)
SELECT query_id, nbr_id, nbr_label, cosine, nn_rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, nbr_id) AS BIGINT) AS nn_rank
  FROM cands)
WHERE nn_rank <= 3
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection (the dedup north-star op):
    candidate pairs are generated ONLY within a hyperplane-LSH cell
    (equi-join blocking on a key whose cardinality grows with the
    corpus — never a global cross join, never a fixed-k block) and
    kept when cosine >= 0.9999. Identical embeddings always share a
    cell, so planted exact duplicates are never missed. The natural
    corpus has no near-dups (max within-label cosine ≈ 0.41), so each
    vector is planted a duplicate copy (vec_id + 1_000_000, identical
    embedding) — every original must rediscover exactly its copy,
    making the result a full functional check of the pipeline. Keeper
    = lower vec_id (deterministic survivor)."""
    emb = _emb_q(spark, sf_dir)
    planted = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "label", "q", "nrm"
    )
    allv = _celled(emb.unionByName(planted), _NBITS_PAIR)
    a = allv.select(
        F.col("vec_id").alias("keeper_id"),
        "label",
        F.col("cell").alias("cell"),
        F.col("q").alias("qa"),
        F.col("nrm").alias("na"),
    )
    b = allv.select(
        F.col("vec_id").alias("dup_id"),
        F.col("cell").alias("cell"),
        F.col("q").alias("qb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.expr(_DOT.format(a="qa", b="qb")).cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        a.join(b, "cell")
        .where(F.col("keeper_id") < F.col("dup_id"))
        .select("keeper_id", "dup_id", "label", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.9999)
    )


_DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH eq AS (
  SELECT vec_id, label, {_QUANT_DUCK} AS q,
         {_DOT_DUCK.format(a=_QUANT_DUCK, b=_QUANT_DUCK)} AS nrm
  FROM embeddings
), allv AS (
  SELECT vec_id, label, q, nrm FROM eq
  UNION ALL
  SELECT vec_id + 1000000, label, q, nrm FROM eq
), celled AS ({_celled_duck("allv", _NBITS_PAIR)}
), pairs AS (
  SELECT a.vec_id AS keeper_id, b.vec_id AS dup_id, a.label,
         CAST({_DOT_DUCK.format(a="a.q", b="b.q")} AS DOUBLE)
           / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cosine
  FROM celled a JOIN celled b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT keeper_id, dup_id, label, cosine FROM pairs WHERE cosine >= 0.9999
"""


QUERIES = {
    "sim_cosine_topk": QuerySpec(
        sim_cosine_topk, _SIM_COSINE_TOPK_SQL, ("similarity", "topk")
    ),
    "dedup_embedding_cosine": QuerySpec(
        dedup_embedding_cosine, _DEDUP_EMBEDDING_COSINE_SQL, ("similarity", "dedup")
    ),
    "sim_knn_blocked": QuerySpec(
        sim_knn_blocked, _SIM_KNN_BLOCKED_SQL, ("similarity", "knn")
    ),
    "sim_ivf_multiprobe": QuerySpec(
        sim_ivf_multiprobe, _SIM_IVF_MULTIPROBE_SQL, ("similarity", "ann")
    ),
    "sim_embedding_stats": QuerySpec(
        sim_embedding_stats, _SIM_EMBEDDING_STATS_SQL, ("similarity", "agg")
    ),
}
