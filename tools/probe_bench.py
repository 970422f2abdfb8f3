"""Isolated warm-timing probe for a few registry entries.

Times each named entry with the noop sink at $SPARK_GRAFT_SF_DIR
(default sf0.1): one untimed cold run (staging/index builds), then
best-of-N warm runs (default 4, $SPARK_GRAFT_PROBE_RUNS). Prints one
JSON line per entry plus a calibration probe (the bench.py fixed-work
CPU hash) before and after, so A/B pairs carry their own host band.

Usage:
    PYTHONPATH=/root/repo python tools/probe_bench.py op1 [op2 ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "4"))


def _cpu_hash() -> float:
    t0 = time.perf_counter()
    h = b"seed"
    for _ in range(500_000):
        h = hashlib.sha256(h).digest()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    ops = sys.argv[1:]
    from pe_firm_investment_database_pipeline_spark.plans import all_queries
    from pe_firm_investment_database_pipeline_spark.session import get_spark

    spark = get_spark("pe-pipeline-probe")
    registry = all_queries()
    print(json.dumps({"calib_start_cpu_hash": _cpu_hash()}), flush=True)
    for op in ops:
        fn = registry[op].fn
        spark.sparkContext.setJobDescription(f"probe:{op}")

        def run() -> float:
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        cold = run()
        best = min(run() for _ in range(RUNS))
        print(
            json.dumps({"op": op, "cold": round(cold, 3), "warm": round(best, 3)}),
            flush=True,
        )
    print(json.dumps({"calib_end_cpu_hash": _cpu_hash()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
