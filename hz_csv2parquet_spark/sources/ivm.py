"""Incremental materialized-view maintenance over the change feed.

``IncrementalAggView`` keeps a grouped aggregate of a
:class:`~.txlog.TxTable` up to date by consuming ``changes()``
deltas instead of recomputing the aggregate from the table — THE
workload the change data feed exists for. Cost per refresh is
O(rows changed since the last refresh), never O(source table): at
100 TB the nightly report over a table that gained 0.1% new rows
reads 0.1% of the data.

Only delta-able aggregates are supported — COUNT and SUM (AVG is
``sum/count`` at read time): an insert adds, a delete subtracts,
an update is preimage-subtract + postimage-add, all expressible as
one signed aggregation of the feed. MIN/MAX are refused at
construction: a deleted extremum forces a group re-scan, which is
exactly the O(table) work this class exists to avoid.

The view is itself a TxTable, so it is queryable/time-travelable
like any table, and refreshes are EXACTLY-ONCE: each refresh
commits with a txn marker whose batch id is the source version it
advanced to — a crashed/re-run refresh of the same range is a
no-op, and the marker doubles as the "last applied version"
watermark (no side-channel state file).

Groups whose row count reaches zero LEAVE the view (the resolver
simply does not re-emit them), so the view never accumulates dead
groups.

Reference: no view layer exists in hz_csv2parquet — §2-beyond
(the Delta/Materialize incremental-view-maintenance shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .txlog import TxTable

__all__ = ["IncrementalAggView"]

#: change types that ADD a row's contribution; everything else
#: (delete, update_preimage) subtracts it.
_ADDS = ("insert", "update_postimage")

#: internal null-safe surrogate merge key. A NULL group value is a
#: perfectly legal group (GROUP BY treats NULLs as one group), but a
#: MERGE join on the raw group columns never matches NULL keys — the
#: NULL group would duplicate on every refresh instead of upserting,
#: and an all-NULL delta once tripped merge_upsert's null-bounds
#: emptiness shortcut and was silently discarded (advisor r12 high).
#: The view therefore merges on ONE derived never-NULL column: the
#: canonical JSON of the group tuple (``ignoreNullFields=false`` keeps
#: NULL fields explicit, so ``{"g":null}`` is a distinct, stable key).
#: It also serves as the view's stat column, so refresh pruning works
#: on string ranges regardless of the group columns' types.
_GK = "__gk"


def _any_sum_moved(sum_cols: list[str]):
    """True iff any sum contribution is non-zero/non-null — keeps
    count-cancelling groups whose sums still moved."""
    expr = F.lit(False)
    for c in sum_cols:
        expr = expr | (F.coalesce(F.col(f"sum_{c}"), F.lit(0)) != 0)
    return expr


class IncrementalAggView:
    """A sum/count aggregate of ``source`` grouped by ``group_cols``,
    materialized at ``path`` and advanced by :meth:`refresh`.

    The view's columns are ``group_cols + [count_col] +
    [f"sum_{c}" for c in sum_cols]``.
    """

    def __init__(
        self,
        source: TxTable,
        path: str,
        group_cols: list[str] | str,
        sum_cols: list[str] | str | None = None,
        count_col: str = "n_rows",
    ):
        self.source = source
        self.group_cols = (
            [group_cols] if isinstance(group_cols, str) else list(group_cols)
        )
        if not self.group_cols:
            raise ValueError("group_cols must name at least one column")
        self.sum_cols = (
            [sum_cols]
            if isinstance(sum_cols, str)
            else list(sum_cols or [])
        )
        self.count_col = count_col
        overlap = set(self.group_cols) & set(self.sum_cols)
        if overlap:
            raise ValueError(f"columns cannot be both group and sum: {sorted(overlap)}")
        if _GK in self.group_cols or _GK in self.sum_cols:
            raise ValueError(f"{_GK!r} is reserved for the view's merge key")
        self.view = TxTable(source.spark, path, stat_cols=[_GK])
        #: txn app id — markers under it record applied source versions
        self.app_id = "hz_ivm"

    # ---------------- state ----------------

    def last_applied(self) -> int:
        """Source version the view reflects (-1 = never refreshed)."""
        if self.view.version() < 0:
            return -1
        return max(self.view.committed_txns(self.app_id), default=-1)

    def read(self) -> DataFrame:
        """The materialized aggregate (a plain snapshot read; the
        internal merge key stays internal)."""
        return self.view.snapshot().drop(_GK)

    # ---------------- maintenance ----------------

    def _gk(self, df: DataFrame) -> "F.Column":
        """Canonical never-NULL encoding of the group tuple (see
        ``_GK``). Deterministic: field order is the declared
        group-column order, NULL fields kept explicit. TIMESTAMP
        group columns encode as epoch micros — ``to_json`` would
        otherwise format them in the SESSION timezone, and a tz
        change between refreshes would silently re-key every
        time-bucketed group."""
        from pyspark.sql.types import TimestampType

        fields = []
        for c in self.group_cols:
            col = F.col(c)
            if isinstance(df.schema[c].dataType, TimestampType):
                col = F.unix_micros(col)
            fields.append(col.alias(c))
        return F.to_json(F.struct(*fields), {"ignoreNullFields": "false"})

    def _signed_delta(self, feed: DataFrame) -> DataFrame:
        """One signed aggregation of the change feed: +1 for
        insert/update_postimage, -1 for delete/update_preimage. The
        single shuffle is on the group key, sized by rows CHANGED."""
        sign = F.when(F.col("_change_type").isin(*_ADDS), F.lit(1)).otherwise(
            F.lit(-1)
        )
        return (
            # GROUP BY on the raw columns (NULLs collapse into one
            # group, as in any aggregate); the surrogate key is a
            # function of the group tuple, attached after the agg
            feed.groupBy(*self.group_cols)
            .agg(
                F.sum(sign).cast("long").alias(self.count_col),
                *[
                    F.sum(F.col(c) * sign).alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
            # a group whose feed contributions cancel exactly (equal
            # inserts and deletes of identical values) is a no-op —
            # keeping it would touch view files for nothing
            .filter(
                (F.col(self.count_col) != 0)
                | _any_sum_moved(self.sum_cols)
            )
            .withColumn(_GK, self._gk(feed))
        )

    def refresh(self) -> int | None:
        """Advance the view to the source's current version. Returns
        the view's committed version, or None when already current
        (or a replayed refresh found its marker). Raises if the feed
        range is no longer serveable (source vacuumed past the
        unapplied commits) — re-materialize from scratch then."""
        src_v = self.source.version()
        last = self.last_applied()
        if src_v <= last:
            return None
        feed = self.source.changes(last, src_v).select(
            *self.group_cols, *self.sum_cols, "_change_type"
        )
        delta = self._signed_delta(feed)
        if self.view.version() < 0:
            # bootstrap: an empty view table with the delta's schema
            # (commit 0 carries schema meta only; the first merge
            # below does the data work with its exactly-once marker)
            self.view.create(
                self.source.spark.createDataFrame([], delta.schema)
            )

        group_cols, count_col, sum_cols = (
            self.group_cols,
            self.count_col,
            self.sum_cols,
        )

        def apply_delta(matched: DataFrame, updates: DataFrame) -> DataFrame:
            # current + delta, then drop groups whose count hits 0 —
            # the resolver owns the per-key contract: a key it does
            # not re-emit leaves the view. Grouping includes the
            # surrogate key (a pure function of the group tuple, and
            # GROUP BY is null-safe) so it survives into the rewrite.
            return (
                matched.unionByName(updates)
                .groupBy(_GK, *group_cols)
                .agg(
                    F.sum(count_col).cast("long").alias(count_col),
                    *[
                        F.sum(f"sum_{c}").alias(f"sum_{c}")
                        for c in sum_cols
                    ],
                )
                .filter(F.col(count_col) != 0)
            )

        return self.view.merge_upsert(
            delta,
            _GK,
            txn=(self.app_id, src_v),
            resolve=apply_delta,
        )


