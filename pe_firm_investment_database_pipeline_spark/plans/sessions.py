"""Batch sessionization + interval joins (SURVEY §2.5/§2.3 extension
surface): the batch twins of the streaming session window, and the
bin-bucketed form of the range join — the two patterns that replace
non-equi joins at 100 TB.

- win_sessionize_batch: gaps-and-islands with lag + running sum — one
  window pass, equals stream_session's output shape (the streaming op
  merges state; the batch op runs where history is already at rest).
- join_interval_bin: event-in-interval containment WITHOUT a
  BroadcastNestedLoopJoin: intervals are exploded into the fixed-width
  day bins they cover, events join their single bin (equi-join), and
  an exact containment filter removes bin-edge false positives. Join
  cost is O(events + intervals x bins-per-interval), not
  O(events x intervals).
- map_entry_ops: MapType column surface (map_from_entries /
  element_at / map_concat), emitted as sorted CSV so the value hash
  is entry-order-free.
- merge_scd2: the warehouse CDC shape — fold an event/change stream
  into a type-2 slowly-changing dimension (validity intervals,
  change suppression, is_current flag) with two window passes on the
  dimension key. The batch twin of a streaming MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table
from ..streaming.windows import GAP_S  # single source of truth for the gap


def win_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessions over the at-rest event table:
    lag() marks session starts, a running sum assigns session ids, one
    aggregate emits (start, end=last+gap, n). Exactly two shuffles
    (window + groupBy), both on user_id."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts_us")
    w = W.partitionBy("user_id").orderBy("ts_us")
    new_s = F.when(
        (F.col("ts_us") - F.lag("ts_us").over(w)) >= GAP_S * 1_000_000, 1
    ).otherwise(0)
    marked = e.withColumn(
        "sid",
        F.sum(new_s).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return marked.groupBy("user_id", "sid").agg(
        F.expr("min(ts_us) div 1000000").alias("session_start_s"),
        F.expr(f"(max(ts_us) + {GAP_S * 1_000_000}) div 1000000").alias(
            "session_end_s"
        ),
        F.count(F.lit(1)).alias("n_events"),
    ).select("user_id", "session_start_s", "session_end_s", "n_events")


_WIN_SESSIONIZE_BATCH_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS us FROM events
), flagged AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= {GAP_S}::BIGINT * 1000000 THEN 1 ELSE 0 END AS new_s
  FROM e
), sessioned AS (
  SELECT user_id, us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(us) // 1000000 AS session_start_s,
       (MAX(us) + {GAP_S}::BIGINT * 1000000) // 1000000 AS session_end_s,
       COUNT(*) AS n_events
FROM sessioned GROUP BY user_id, sid
"""


def join_interval_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which promo interval contains each purchase event? Intervals
    (one 4-day window per region-week, synthesized deterministically)
    are exploded to the day bins they cover; each event equi-joins its
    own day bin; exact containment filters bin-edge rows. The
    BroadcastNestedLoopJoin a naive `BETWEEN` join would produce never
    appears — candidate pairs exist only inside shared bins."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", F.expr("ts_ns div 86400000000000").alias("day"))
    # deterministic promo calendar: one interval per (week w, slot k):
    # [start, start + 4 days), start = epoch-day 19720 + 7*w + k
    weeks = spark.range(0, 5).select(F.col("id").alias("w"))
    slots = spark.range(0, 2).select(F.col("id").alias("k"))
    intervals = (
        weeks.crossJoin(slots)
        .select(
            (F.lit(19720) + F.col("w") * 7 + F.col("k")).alias("start_day"),
            (F.lit(19720) + F.col("w") * 7 + F.col("k") + 4).alias("end_day"),
            (F.col("w") * 10 + F.col("k")).alias("promo_id"),
        )
    )
    binned = intervals.select(
        "promo_id",
        "start_day",
        "end_day",
        F.explode(F.expr("sequence(start_day, end_day - 1)")).alias("day"),
    )
    return (
        e.join(binned, "day")
        .where((F.col("day") >= F.col("start_day")) & (F.col("day") < F.col("end_day")))
        .select("event_id", "user_id", "promo_id", "day")
    )


_JOIN_INTERVAL_BIN_SQL = """
WITH e AS (
  SELECT event_id, user_id,
         epoch_us(ts::TIMESTAMP) * 1000 // 86400000000000 AS day
  FROM events WHERE event_type = 'purchase'
), intervals AS (
  SELECT 19720 + w * 7 + k AS start_day, 19720 + w * 7 + k + 4 AS end_day,
         w * 10 + k AS promo_id
  FROM (SELECT unnest(range(0, 5)) AS w), (SELECT unnest(range(0, 2)) AS k)
)
SELECT event_id, user_id, promo_id, day
FROM e JOIN intervals
  ON e.day >= intervals.start_day AND e.day < intervals.end_day
"""


def map_entry_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map from entries, merge a literal
    map, read with element_at; emitted as key-sorted CSV (map entry
    order is engine-specific, sorted text is not)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.map_concat(
        F.map_from_entries(
            F.array(
                F.struct(F.lit("name").alias("k"), F.col("n_name").alias("v")),
                F.struct(
                    F.lit("region").alias("k"),
                    F.col("n_regionkey").cast("string").alias("v"),
                ),
            )
        ),
        F.create_map(F.lit("source"), F.lit("nation_table")),
    )
    entries_csv = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(m), lambda e: F.concat_ws("=", e.getField("key"), e.getField("value"))
            )
        ),
        ",",
    )
    return n.select(
        "n_nationkey",
        entries_csv.alias("props_csv"),
        F.element_at(m, "name").alias("name_value"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


_MAP_ENTRY_OPS_SQL = """
SELECT n_nationkey,
       array_to_string(list_sort([
         'name=' || n_name,
         'region=' || CAST(n_regionkey AS VARCHAR),
         'source=nation_table'
       ]), ',') AS props_csv,
       n_name AS name_value,
       CAST(3 AS BIGINT) AS n_keys
FROM nation
"""


def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension from a change stream: each
    user's event_type is treated as their tracked state; consecutive
    events with an unchanged state are SUPPRESSED (no new version),
    and each surviving change opens a validity interval
    [valid_from_us, valid_to_us) closed by the next change (NULL and
    is_current=true for the open head). The reference's pipelines
    rebuild enrichment tables from scratch per run
    (reference: main_portCo.py's full-refresh loop); this is the
    incremental-warehouse alternative: history at rest + two window
    passes, both on the SAME partition key (user_id), so Catalyst
    plans ONE exchange and both sorts/windows run co-partitioned.
    At 100 TB the change stream arrives date-partitioned and the
    windows stay key-local; the streaming twin is
    stream_custom_state (applyInPandasWithState).

    Determinism: event ties are broken by event_id (fixture ts_us may
    collide); versions are then a total order both engines agree on.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts_us", "event_id", F.col("event_type").alias("state")
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    changed = (
        F.lag("state").over(w).isNull() | (F.col("state") != F.lag("state").over(w))
    )
    kept = e.withColumn("chg", changed).where(F.col("chg"))
    w2 = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        kept.withColumn("version", F.row_number().over(w2).cast("long"))
        .withColumn("valid_from_us", F.col("ts_us"))
        .withColumn("valid_to_us", F.lead("ts_us").over(w2))
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .select(
            "user_id", "version", "state", "valid_from_us", "valid_to_us",
            "is_current",
        )
    )


_MERGE_SCD2_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_id,
         event_type AS state
  FROM events
), flagged AS (
  SELECT *,
         (lag(state) OVER w IS NULL OR state != lag(state) OVER w) AS chg
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), kept AS (
  SELECT * FROM flagged WHERE chg
)
SELECT user_id,
       CAST(row_number() OVER w2 AS BIGINT) AS version,
       state,
       ts_us AS valid_from_us,
       lead(ts_us) OVER w2 AS valid_to_us,
       lead(ts_us) OVER w2 IS NULL AS is_current
FROM kept
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


QUERIES = {
    "win_sessionize_batch": QuerySpec(
        win_sessionize_batch, _WIN_SESSIONIZE_BATCH_SQL, ("window", "session")
    ),
    "join_interval_bin": QuerySpec(
        join_interval_bin, _JOIN_INTERVAL_BIN_SQL, ("join", "range")
    ),
    "map_entry_ops": QuerySpec(map_entry_ops, _MAP_ENTRY_OPS_SQL, ("map",)),
    "merge_scd2": QuerySpec(merge_scd2, _MERGE_SCD2_SQL, ("cdc", "window")),
}
