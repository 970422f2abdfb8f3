"""Sinks (SURVEY.md §2.1 snk_*): CSV export, JSONL append-log, nested
JSON documents.

Reference parity: ``snk_csv`` seed_aic.py:356-366 (header CSV without
index), ``snk_jsonl_append`` seed_aic.py:146-155 (metadata-wrapped
compact JSON lines appended per record), ``snk_json_nested``
main_portCo.py:133-138 (grouped nested result dumped as JSON).

All three are thin, partition-parallel writers — every task writes its
own file; there is no driver-side collect. The JSONL appender uses
``mode("append")`` text output, the streaming twin of which is a
``writeStream.format("json")`` sink (stream_ingest, §2.9).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """snk_csv: header CSV (the pandas ``to_csv(index=False)`` shape)."""
    out = df.coalesce(1) if single_file else df
    out.write.option("header", True).mode("overwrite").csv(path)


def append_jsonl(
    df: DataFrame,
    path: str,
    wrap_meta: bool = True,
    source: str = "pe-pipeline",
) -> None:
    """snk_jsonl_append: each row becomes one compact JSON line,
    wrapped with capture metadata (seed_aic.py:146-155 wraps payloads
    with datetime/url/status/headers). Append mode — an idempotent
    re-run discipline comes from run-scoped paths, as in the
    reference's timestamped filenames (seed_aic.py:13-17)."""
    payload = F.struct(*df.columns)
    if wrap_meta:
        line = F.to_json(
            F.struct(
                F.date_format(
                    F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
                ).alias("datetime"),
                F.lit(source).alias("source"),
                payload.alias("JSON"),
            )
        )
    else:
        line = F.to_json(payload)
    df.select(line.alias("value")).write.mode("append").text(path)


def write_nested_json(
    df: DataFrame,
    group_cols: Sequence[str],
    nest_cols: Sequence[str],
    path: str,
    nested_name: str = "items",
) -> None:
    """snk_json_nested: group rows into documents — one JSON object
    per group with the nested records collected as an array of
    structs (main_portCo.py:115-122,133-138). The collect_list is
    per-group (bounded by group size), never per-partition."""
    nested = df.groupBy(*group_cols).agg(
        F.collect_list(F.struct(*nest_cols)).alias(nested_name),
        F.count(F.lit(1)).alias(f"n_{nested_name}"),
    )
    nested.write.mode("overwrite").json(path)
