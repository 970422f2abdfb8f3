"""Registry-wide physical-plan audit: the 100 TB anti-pattern scan,
machine-checked over EVERY registry entry instead of spot-checked by
tests/test_plan_shapes.py.

For each queries() entry the tool builds the DataFrame at sf0.001
(cheap — some entries execute eager staging on construction),
captures `explain("formatted")`, and counts the node classes that are
forbidden or budgeted at cluster scale:

- ``CartesianProduct`` — a data-sized cartesian is a scale-killer.
  Allowed ONLY for entries in ``CARTESIAN_ALLOWED``, each of which is
  a BOUNDED grid by construction (documented next to the entry).
- ``BatchEvalPython`` — a row-at-a-time Python UDF in any plan is a
  bug (the package's Python boundary is Arrow-batched: pandas_udf /
  mapInPandas / mapInArrow / applyInPandas*).

Every entry's counts land in PLAN_AUDIT.json so the audit is
diffable round over round; the process exits non-zero on any
violation.

Usage:
    PYTHONPATH=/root/repo python tools/plan_audit.py [--out FILE] [op ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")

# Entries whose CartesianProduct is a BOUNDED grid by construction:
#   join_nested_loop     — the deliberate 5x5 region BNLJ/cartesian demo
#                          (plans/relational.py:447)
#   evt_peak_concurrency — weeks x in-week slot grid, both sides tiny
#                          fixed cardinality (plans/sessions.py:96)
CARTESIAN_ALLOWED = {"join_nested_loop", "evt_peak_concurrency"}

# No entry may plan a row-at-a-time Python UDF.
BATCH_EVAL_ALLOWED: set[str] = set()


def main() -> None:
    argv = sys.argv[1:]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.json")
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)

    from pe_firm_investment_database_pipeline_spark.plans import all_queries
    from pe_firm_investment_database_pipeline_spark.session import get_spark

    spark = get_spark("pe-pipeline-plan-audit")
    results: dict[str, dict] = {}
    violations: list[str] = []
    for name, spec in all_queries().items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # an unplannable entry is itself a finding
            results[name] = {"err": str(ex)[:300]}
            violations.append(f"{name}: plan error")
            print(f"ERR  {name}: {ex}", flush=True)
            continue
        row = {
            "cartesian": plan.count("(1) CartesianProduct")
            + plan.count(" CartesianProduct"),
            "batch_eval_python": plan.count("BatchEvalPython"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "exchanges": plan.count("ENSURE_REQUIREMENTS"),
            # the declared (Arrow-batched) Python boundary, budgeted
            # not forbidden — formatted plans print each node twice
            # (tree + detail), so counts are 2x the node count
            "arrow_python": sum(
                plan.count(n)
                for n in (
                    "ArrowEvalPython",
                    "MapInPandas",
                    "PythonMapInArrow",
                    "MapInArrow",
                    "FlatMapGroupsInPandas",
                    "FlatMapGroupsInArrow",
                )
            ),
            "parquet_scans": plan.count("Scan parquet"),
        }
        results[name] = row
        bad = []
        if row["cartesian"] and name not in CARTESIAN_ALLOWED:
            bad.append(f"CartesianProduct x{row['cartesian']}")
        if row["batch_eval_python"] and name not in BATCH_EVAL_ALLOWED:
            bad.append(f"BatchEvalPython x{row['batch_eval_python']}")
        if bad:
            violations.append(f"{name}: {', '.join(bad)}")
            print(f"FAIL {name}: {', '.join(bad)}", flush=True)
        else:
            print(f"ok   {name}", flush=True)

    # subset runs MERGE into an existing artifact (the scale-suite
    # convention) so re-auditing a few changed entries never drops
    # the rest of the registry's rows
    audited = len(results)
    if only:
        try:
            merged = json.load(open(out))
        except (OSError, json.JSONDecodeError):
            merged = {}
        merged.update(results)
        results = merged
    json.dump(results, open(out, "w"), indent=1, sort_keys=True)
    print(f"\n{audited} plans audited, {len(violations)} violations")
    for v in violations:
        print(f"  {v}")
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
