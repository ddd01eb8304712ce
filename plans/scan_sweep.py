#!/usr/bin/env python3
"""Duplicate-scan sweep: for every batch query, count how many times
each fixture table's parquet scan appears in the executed plan. A
table appearing more than once means a shared subtree is re-executed
per consumer (DataFrame plans share no common subexpressions) — the
round-15 session-3 finder that surfaced the lm_bigram / bm25 /
collocations / boilerplate / PCA / keywords / mad_outliers rework.

Scans whose text sits inside an ``InMemoryRelation`` description are
the SAME cached relation printed once per consumer — the ``inmem``
count is printed alongside so those rows can be discounted. Remaining
multi-scan rows are either by-design (tiny pushed-filter branch
reads: query-side filters, planted-duplicate unions, funnel steps) or
real targets; the adjudication lives in OPTIMIZATION_r15.md.

Usage: python plans/scan_sweep.py [sf_dir]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from hz_csv2parquet_spark.queries import REGISTRY
    from hz_csv2parquet_spark.session import get_spark
    from hz_csv2parquet_spark.tables import memo_clear

    spark = get_spark(app="hz_scan_sweep")
    try:
        for name, q in REGISTRY.items():
            if q.streaming:
                continue
            try:
                memo_clear()
                plan = (
                    q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
                )
            except Exception as exc:  # noqa: BLE001 - report, keep sweeping
                print(f"{name}: ERR {type(exc).__name__}")
                continue
            tables = re.findall(r"file:[^\]]*?/(\w+)\.parquet", plan)
            cnt = collections.Counter(tables)
            if any(c > 1 for c in cnt.values()):
                print(f"{name}: {dict(cnt)} inmem={plan.count('InMemoryRelation')}")
    finally:
        # the last query's memo_persist frames otherwise stay in the
        # CacheManager when the sweep exits (advisor r15)
        memo_clear()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
