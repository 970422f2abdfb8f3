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
- blocked kNN (IVF-style): `label` acts as the coarse quantizer cell;
  pairs are generated only within a cell (equi-join on label) and
  ranked per vector with a window — the partition-pruned ANN shape.
  At 100 TB, replace label with k-means cell ids and add multi-probe.
"""

from __future__ import annotations

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
    """IVF-style blocked kNN: top-3 cosine neighbors per vector within
    its label cell. Pairs exist only inside a cell (equi-join on
    label), ranked with a per-vector window — partition-pruned ANN.
    Restricted to vec_id < 200 to keep the test-scale result compact."""
    emb = _emb_q(spark, sf_dir).where(F.col("vec_id") < 200)
    a = emb.select(
        F.col("vec_id").alias("vec_id"),
        F.col("label").alias("label"),
        F.col("q").alias("qa"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("label"),
        F.col("q").alias("qb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.expr(_DOT.format(a="qa", b="qb"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    pairs = (
        a.join(b, "label")
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
), pairs AS (
  SELECT a.vec_id, a.label, b.vec_id AS nbr_id,
         CAST({_DOT_DUCK.format(a="a.q", b="b.q")} AS DOUBLE)
           / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cosine
  FROM eq a JOIN eq b ON a.label = b.label AND a.vec_id != b.vec_id
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


# Spark [] is 0-based, DuckDB [] is 1-based: these index the SAME six
# leading dimensions.
_CELL = (
    "CAST(IF(q[0] + q[1] > 0, 1, 0) + IF(q[2] + q[3] > 0, 2, 0) "
    "+ IF(q[4] + q[5] > 0, 4, 0) AS BIGINT)"
)
_CELL_DUCK = (
    "CAST(CASE WHEN q[1] + q[2] > 0 THEN 1 ELSE 0 END "
    "+ CASE WHEN q[3] + q[4] > 0 THEN 2 ELSE 0 END "
    "+ CASE WHEN q[5] + q[6] > 0 THEN 4 ELSE 0 END AS BIGINT)"
)


def sim_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN with multi-probe: a 3-bit sign quantizer over
    fixed dimension pairs assigns every vector to one of 8 cells (the
    coarse 'inverted file'); each query probes its OWN cell plus the 3
    single-bit-flip neighbor cells (multi-probe recovers recall lost
    at cell boundaries), then ranks candidates by exact cosine and
    keeps top-3. Cost is |queries| x 4 cells x cell-size — never the
    full database. At 100 TB the quantizer becomes k-means centroids
    and cells become partition keys (partition pruning per probe);
    the plan shape — explode probes, equi-join on cell, window top-k —
    is identical. Queries restricted to vec_id < 20 for test-scale
    output."""
    emb = _emb_q(spark, sf_dir).withColumn("cell", F.expr(_CELL))
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
), celled AS (
  SELECT vec_id, label, q, nrm, {_CELL_DUCK} AS cell FROM eq
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
    candidate pairs are generated ONLY within a label cell (equi-join
    blocking — never a global cross join) and kept when cosine >=
    0.9999. The natural corpus has no near-dups (max within-label
    cosine ≈ 0.41), so each vector is planted a duplicate copy
    (vec_id + 1_000_000, identical embedding) — every original must
    rediscover exactly its copy, making the result a full functional
    check of the pipeline. Keeper = lower vec_id (deterministic
    survivor)."""
    emb = _emb_q(spark, sf_dir)
    planted = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "label", "q", "nrm"
    )
    allv = emb.unionByName(planted)
    a = allv.select(
        F.col("vec_id").alias("keeper_id"),
        "label",
        F.col("q").alias("qa"),
        F.col("nrm").alias("na"),
    )
    b = allv.select(
        F.col("vec_id").alias("dup_id"),
        "label",
        F.col("q").alias("qb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.expr(_DOT.format(a="qa", b="qb")).cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        a.join(b, "label")
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
), pairs AS (
  SELECT a.vec_id AS keeper_id, b.vec_id AS dup_id, a.label,
         CAST({_DOT_DUCK.format(a="a.q", b="b.q")} AS DOUBLE)
           / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cosine
  FROM allv a JOIN allv b ON a.label = b.label AND a.vec_id < b.vec_id
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
