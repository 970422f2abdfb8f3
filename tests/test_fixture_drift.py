"""Fixture-drift guard: the driver regenerates /root/testdata between
rounds and has changed physical types before (events.ts went parquet
TIMESTAMP(NANOS) -> TIMESTAMP(MICROS) in round 3, silently killing every
events consumer). This test makes the NEXT regeneration fail loudly in
pytest instead of silently in the driver: every table in TABLES must
load, and the normalized events time axis must match DuckDB's
epoch_us(ts::TIMESTAMP) on the same file regardless of physical type.
"""

from __future__ import annotations

import duckdb
import pytest

from pe_firm_investment_database_pipeline_spark.sources.tables import (
    TABLES,
    load_table,
)


@pytest.mark.parametrize("name", TABLES)
def test_every_table_loads(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    # Force analysis + one actual scan task so physical-type surprises
    # (not just schema drift) surface here.
    assert len(df.columns) > 0
    assert df.limit(1).count() >= 0


def test_events_time_axis_matches_duckdb(spark, sf_dir):
    """ts_us/ts_ns/ts_date must be session-timezone-independent and agree
    with the DuckDB oracle's epoch_us(ts::TIMESTAMP) derivation."""
    ev = load_table(spark, sf_dir, "events")
    for col in ("ts_us", "ts_ns", "ts_date", "event_id"):
        assert col in ev.columns, f"events missing normalized column {col}"
    got = {
        r["event_id"]: (r["ts_us"], r["ts_ns"], r["ts_date"])
        for r in ev.select("event_id", "ts_us", "ts_ns", "ts_date")
        .orderBy("event_id")
        .limit(50)
        .collect()
    }
    want = duckdb.sql(
        f"""
        SELECT event_id,
               epoch_us(ts::TIMESTAMP) AS ts_us,
               epoch_us(ts::TIMESTAMP) * 1000 AS ts_ns,
               (ts::TIMESTAMP)::DATE AS ts_date
        FROM '{sf_dir}/events.parquet'
        ORDER BY event_id LIMIT 50
        """
    ).fetchall()
    assert len(got) == len(want) > 0
    for event_id, ts_us, ts_ns, ts_date in want:
        g_us, g_ns, g_date = got[event_id]
        assert g_us == ts_us, f"ts_us mismatch for event {event_id}"
        assert g_ns == ts_ns, f"ts_ns mismatch for event {event_id}"
        assert g_date == ts_date, f"ts_date mismatch for event {event_id}"
