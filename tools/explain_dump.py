#!/usr/bin/env python
"""Dump .explain("formatted") for bench HEADLINE queries (r14 deliverable:
plans/r14/<query>_{before,after}.txt — the judge checks plan claims against
these files without running Spark).

Usage: python tools/explain_dump.py <outdir> [suffix] [name ...]
  outdir: e.g. plans/r14
  suffix: "before" | "after" (default "before")
  names:  subset of query names (default: the full bench HEADLINE list)

Formatted-plan capture goes through PythonSQLUtils.explainString (the
plain queryExecution().toString() truncates long FileScan lines, losing
ReadSchema/PushedFilters — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    from bench import HEADLINE
    from ultimate_data_engineering_project_spark.session import get_spark
    from ultimate_data_engineering_project_spark.plans.catalog import queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="udep-explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    os.makedirs(outdir, exist_ok=True)
    names = [n for n in HEADLINE if not only or n in only] + sorted(
        n for n in only if n not in HEADLINE
    )
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        # quick shape summary on stderr for the measuring loop
        n_ex = txt.count("Exchange")
        joins = [
            k
            for k in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if k in txt
        ]
        py = [
            k
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "FlatMapGroupsInPandas", "MapInPandas")
            if k in txt
        ]
        print(
            f"{name}: Exchange={n_ex} joins={joins or '-'} python={py or '-'}",
            file=sys.stderr,
        )
    print(f"wrote {len(names)} plans to {outdir}/*_{suffix}.txt")


if __name__ == "__main__":
    main()
