"""Golden replay: the Spark seed pipeline over the reference's own
captured logs must reproduce output/PE_firms.csv exactly (SURVEY §5
test strategy — log-replay + golden outputs)."""

from __future__ import annotations

import csv
from pathlib import Path

from pyspark.sql import functions as F

from pe_firm_investment_database_pipeline_spark.plans.seed_pipeline import (
    extract_pe_firms,
    read_response_log,
)

GOLDEN_MAIN = Path("/root/reference/output/PE_firms.csv")
GOLDEN_DETAILED = Path("/root/reference/output/detailed_PE.csv")


def _read_golden(path: Path) -> list[dict]:
    with path.open(newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def test_golden_pe_firms(spark):
    got = {
        (r["FullName"], r["Website"])
        for r in extract_pe_firms(spark).select("FullName", "Website").collect()
    }
    want = {(r["FullName"], r["Website"]) for r in _read_golden(GOLDEN_MAIN)}
    assert got == want
    assert len(got) == 28


def test_golden_detailed_pe(spark):
    """7-col detailed view matches detailed_PE.csv (string columns;
    lat/lon compared as floats — CSV text vs JSON double)."""
    rows = {r["FullName"]: r for r in extract_pe_firms(spark).collect()}
    golden = _read_golden(GOLDEN_DETAILED)
    assert set(rows) == {g["FullName"] for g in golden}
    for g in golden:
        r = rows[g["FullName"]]
        assert (r["Website"] or "") == g["Website"]
        assert (r["Phone"] or "") == g["Phone"]
        assert (r["Email"] or "") == g["Email"]
        assert abs(float(r["Latitude"]) - float(g["Latitude"])) < 1e-9
        assert abs(float(r["Longitude"]) - float(g["Longitude"])) < 1e-9
        assert (r["LongLatAddress"] or "") == g["LongLatAddress"]


def test_corrupt_line_tolerance(spark, tmp_path):
    """PERMISSIVE scan skips bad lines the way seed_aic.py:318-321
    does (skip + continue), rather than failing the job."""
    p = tmp_path / "log.jsonl"
    good = (
        '{"datetime":"2025-01-01T00:00:00","url":"u","status":200,'
        '"headers":{},"JSON":{"Items":{"$values":[{"FullName":"X",'
        '"Website":"https://x.com","LongLatAddress":"Sydney Australia",'
        '"filter-Member Type":"PE"}]}}}'
    )
    p.write_text(good + "\n{not json at all\n" + good + "\n")
    # Spark disallows referencing only _corrupt_record on an uncached
    # PERMISSIVE scan (SPARK-21610) — cache first, as documented.
    df = read_response_log(spark, str(p)).cache()
    assert df.count() == 3
    assert df.where(F.col("_corrupt_record").isNotNull()).count() == 1
    firms = extract_pe_firms(spark, str(p))
    assert firms.count() == 1
    assert firms.first()["FullName"] == "X"


def test_csv_roundtrip_sink(spark, tmp_path):
    """snk_csv: 2-col projection written with header, read back equal
    (seed_aic.py:356-366 export shape)."""
    out = str(tmp_path / "pe_firms_csv")
    firms = extract_pe_firms(spark).select("FullName", "Website")
    firms.coalesce(1).write.option("header", True).mode("overwrite").csv(out)
    back = spark.read.option("header", True).csv(out)
    assert back.columns == ["FullName", "Website"]
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in firms.collect()}
