"""Custom stateful streaming operator (SURVEY §2.9 / §2.10 UDF
surface): ``applyInPandasWithState`` — the escape hatch for operator
semantics the built-in windows can't express.

The operator is a per-user event profile (count, first/last event
time, purchase count) maintained in explicit GroupState and emitted
after each batch in which the key appears. With an availableNow
replay (single batch: the file source takes everything available),
each key emits exactly once with its full profile — equal to the
batch aggregate, giving this custom stateful operator a DuckDB
oracle, which `applyInPandasWithState` examples almost never have.

Determinism notes: the pandas function sees only int64 columns
(epoch-micro timestamps are derived with ``unix_micros`` BEFORE the
grouping) — Spark's timestamp→pandas conversion is session-timezone
dependent and must never reach a hashed output. State is one small
tuple per user_id — bounded by key cardinality, not traffic; the
grouping shuffles once. A production variant would use
``GroupStateTimeout.EventTimeTimeout`` to emit and evict continuously
instead of per-batch emission.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import QuerySpec
from .windows import _prepare_input, _read_stream, _run

_OUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, first_ts_us BIGINT, "
    "last_ts_us BIGINT, n_purchases BIGINT"
)
_STATE_SCHEMA = "n BIGINT, first_us BIGINT, last_us BIGINT, purch BIGINT"


def _profile_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, first_us, last_us, purch = (
        state.get if state.exists else (0, None, None, 0)
    )
    for pdf in pdfs:
        ts = pdf["ts_us"].astype("int64")
        n += len(pdf)
        lo, hi = int(ts.min()), int(ts.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
        purch += int((pdf["event_type"] == "purchase").sum())
    state.update((n, first_us, last_us, purch))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "first_ts_us": [first_us],
            "last_ts_us": [last_us],
            "n_purchases": [purch],
        }
    )


def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _prepare_input(spark, sf_dir)
    ev = _read_stream(spark, path).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    profiles = ev.groupBy("user_id").applyInPandasWithState(
        _profile_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run(profiles, "append")
    # batching-robust: if the source ever splits into multiple
    # micro-batches (a global maxFilesPerTrigger, incremental staging),
    # a key emits one cumulative row per batch — keep only the final
    # (max n_events) emission per key, which is the full profile under
    # any batching.
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


_STREAM_CUSTOM_STATE_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       MIN(epoch_us(ts::TIMESTAMP)) AS first_ts_us,
       MAX(epoch_us(ts::TIMESTAMP)) AS last_ts_us,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchases
FROM events
GROUP BY user_id
"""


QUERIES = {
    "stream_custom_state": QuerySpec(
        stream_custom_state, _STREAM_CUSTOM_STATE_SQL, ("streaming", "stateful")
    ),
}
