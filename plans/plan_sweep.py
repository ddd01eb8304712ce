#!/usr/bin/env python3
"""Plan red-flag sweep over every batch query in the catalog: counts
Exchange nodes, join strategies, Python-eval nodes, global (empty
partition-spec) windows, and cartesian products per query — the
evidence table for the optimization round's checklist.

Usage: python plans/plan_sweep.py [name ...]   (default: all batch)
Prints one TSV line per query to stdout."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hz_csv2parquet_spark.queries import REGISTRY
    from hz_csv2parquet_spark.session import get_spark
    from hz_csv2parquet_spark.tables import memo_clear

    spark = get_spark(app="hz_plan_sweep")
    names = sys.argv[1:] or [
        n for n, q in REGISTRY.items() if not q.streaming
    ]
    print("query\texchanges\tjoins\tpyeval\tglobal_window\tcartesian\tsorts")
    for name in names:
        memo_clear()
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERR\t{type(e).__name__}")
            continue
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = ",".join(
            f"{k}:{plan.count(k)}"
            for k in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if k in plan
        )
        pyeval = sum(
            plan.count(k) for k in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas", "FlatMapGroupsInPandas")
        )
        # a Window whose partition spec is empty moves ALL rows to one
        # task — the classic non-scalable shape
        gwin = len(re.findall(r"Window.*\[\], \[", plan)) + len(
            re.findall(r"partitionBy=\[\]", plan)
        )
        cart = plan.count("CartesianProduct")
        sorts = plan.count("Sort [")
        print(f"{name}\t{n_ex}\t{joins}\t{pyeval}\t{gwin}\t{cart}\t{sorts}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
