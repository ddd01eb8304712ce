"""Bit-identical results under different partitioning — the claim the
DECIMAL-routed sums and integer-exact gates make (functions/exact.py)
is that task count and reduction order never change a value. Checked
directly: run float-bearing catalog queries under two co-prime
shuffle-partition settings and compare collected values exactly.

At 100 TB this is the property that makes results reproducible across
cluster sizes, speculative re-execution, and AQE re-planning.
"""

from __future__ import annotations

import pandas as pd
import pytest

from hz_csv2parquet_spark.queries import REGISTRY
from hz_csv2parquet_spark.queries_ir import (
    benford_first_digit_orders,
    interarrival_stats_users,
    quantile_normalize_events,
    trimmed_mean_by_type,
)
from hz_csv2parquet_spark.queries_tpch2 import revenue_share_of_region

#: catalog rows retired from the driver registry whose exactness
#: claim this sweep still pins (the functions are kept, undecorated)
RETIRED_FNS = {
    "interarrival_stats_users": interarrival_stats_users,
    "benford_first_digit_orders": benford_first_digit_orders,
    # round-14 retirements (see queries.py ROUND 14 WINDOW header)
    "quantile_normalize_events": quantile_normalize_events,
    "trimmed_mean_by_type": trimmed_mean_by_type,
    "revenue_share_of_region": revenue_share_of_region,
}

#: exact-arithmetic queries with float output and no cross-call memo
#: (a memo would serve the first run's blocks to the second, making
#: the check vacuous)
QUERIES = [
    "correlation_matrix_lineitem",
    "embedding_centroids_by_label",
    "trend_slope_by_type",
    "quantile_normalize_events",
    "seasonal_anomaly_events",
    "trimmed_mean_by_type",
    # late-round-5 float-bearing additions
    "q7_volume_shipping",
    "q8_market_share",
    "q22_idle_rich_customers",
    "dedup_substring_spans",
    # ann_recall_eval was retired in round 12; ivf_recall_eval keeps
    # the identical float recall reduction under the invariance check
    "ivf_recall_eval",
    "pca_power_iteration_embeddings",
    # round-6 additions ahead of their round-7 driver debut — the
    # table checksum's whole contract is partition-order
    # insensitivity; the rest are float-bearing ratio outputs
    "checksum_orders_table",
    "event_diversity_users",
    "interarrival_stats_users",
    "revenue_share_of_region",
    "benford_first_digit_orders",
]


def _run(spark, name: str, sf_dir: str, parts: int) -> pd.DataFrame:
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        fn = RETIRED_FNS[name] if name in RETIRED_FNS else REGISTRY[name].fn
        pdf = fn(spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return pdf.sort_values(by=sorted(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )[sorted(pdf.columns)]


@pytest.mark.parametrize("name", QUERIES)
def test_result_identical_across_partitionings(spark, sf_dir, name):
    a = _run(spark, name, sf_dir, 3)
    b = _run(spark, name, sf_dir, 29)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
