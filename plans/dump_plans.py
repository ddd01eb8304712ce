#!/usr/bin/env python3
"""Dump .explain("formatted") for headline (or named) queries to
plans/r15/<name>_<tag>.txt — the optimization round's plan evidence.

Usage: python plans/dump_plans.py <tag> [name ...]
  tag: 'before' | 'after' (file suffix)
  name: query names; default = all headline batch queries
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hz_csv2parquet_spark.queries import REGISTRY
    from hz_csv2parquet_spark.session import get_spark
    from hz_csv2parquet_spark.tables import memo_clear

    spark = get_spark(app="hz_plan_dump")
    if not names:
        names = [n for n, q in REGISTRY.items() if q.headline and not q.streaming]
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r16")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        memo_clear()
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        joins = [
            k
            for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin")
            if k in plan
        ]
        print(f"{name}: exchanges={n_ex} joins={joins}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
