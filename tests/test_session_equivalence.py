"""The batch gaps-and-islands sessionizer and the Structured
Streaming session_window operator implement the SAME semantics — they
must produce identical sessions on the same data."""

from __future__ import annotations

from pe_firm_investment_database_pipeline_spark.plans.sessions import (
    win_sessionize_batch,
)
from pe_firm_investment_database_pipeline_spark.streaming.windows import (
    stream_session,
)

SF = "/root/testdata/sf0.001"


def test_batch_and_streaming_sessions_agree(spark):
    batch = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in win_sessionize_batch(spark, SF).collect()
    }
    stream = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in stream_session(spark, SF).collect()
    }
    assert batch == stream
    assert len(batch) > 0
