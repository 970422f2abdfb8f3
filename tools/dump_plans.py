"""Dump ``explain("formatted")`` for registry entries to text files.

Used to produce the optimization-round plan evidence
(``plans/r12/<op>_{before,after}.txt``): run once from a worktree at
the pre-optimization commit with ``--suffix before`` and once from
HEAD with ``--suffix after``.

Usage:
    PYTHONPATH=<tree> python tools/dump_plans.py --dir plans/r12 \
        --suffix after [op1 op2 ...]

No positional ops = every registry entry. Entries whose constructor
executes eager staging (localCheckpoint fronts) run that staging at
dump time — the captured plan is the plan the entry SERVES, the same
accounting as PLAN_AUDIT.json.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    argv = sys.argv[1:]
    out_dir = "plans/r12"
    suffix = "after"
    if "--dir" in argv:
        i = argv.index("--dir")
        out_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--suffix" in argv:
        i = argv.index("--suffix")
        suffix = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = list(argv)

    from pe_firm_investment_database_pipeline_spark.plans import all_queries
    from pe_firm_investment_database_pipeline_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("pe-pipeline-plan-dump")
    registry = all_queries()
    names = only or list(registry)
    for name in names:
        if name not in registry:
            print(f"SKIP {name}: not in registry", flush=True)
            continue
        try:
            df = registry[name].fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:
            plan = f"PLAN ERROR: {ex}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({suffix}) at {SF_DIR} ==\n\n{plan}")
        print(f"ok {name} -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
