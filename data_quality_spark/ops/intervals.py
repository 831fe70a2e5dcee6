"""Scalable GLOBAL period-intersection check.

The reference's period-overlap check (period_intersection.py:31-50) sorts by
start and flags a row when the previous row's end overlaps its start, then
propagates the flag to the predecessor (`chk OR LEAD(chk)`). With id groups
this is a keyed window (fine at scale — rules/checks.py). WITHOUT id groups
it is a GLOBAL total-order computation, and `Window.partitionBy(lit(1))`
funnels the whole table through ONE task.

This module is the scale path for the global case:

  1. repartitionByRange + sortWithinPartitions on (start, end, tiebreak) —
     a total order split across P ordered partitions (Spark samples range
     boundaries; partition ids ascend with the range).
  2. ONE slim pass collects each partition's first/last boundary rows
     (2 rows per partition → driver).
  3. Driver stitches the lag/lead chain across partitions: the first row of
     partition p lags against the last row of the nearest non-empty
     predecessor; the last row's lead(chk) is the (driver-computed) chk of
     the successor partition's first row.
  4. A mapInPandas pass computes chk/double-chk wholly within partitions,
     patched at the two boundary rows from the broadcast stitch table.

Only the boundary rows (2P) ever leave the executors; per-partition work is
a vectorized pandas shift — the same relational result as the global window,
pinned by tests against the single-partition window variant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlapping_periods_global(
    df: DataFrame,
    start_col: str,
    end_col: str,
    tiebreak_cols: list[str] | None = None,
    extremes_exclude: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows participating in a global period overlap (KO rows): a row is KO
    if it overlaps its predecessor in the (start, end, tiebreak) total
    order, OR its successor does (reference `chk OR LEAD(chk)`,
    period_intersection.py:45-50). extremes_exclude=True counts touching
    endpoints (prev_end >= start) as overlap, False requires strict
    (prev_end > start) — the reference's `:29` operator choice."""
    flagged = overlap_flags_global(
        df, start_col, end_col, tiebreak_cols, extremes_exclude,
        num_partitions, flag_col="__overlap_ko",
    )
    return flagged.where(F.col("__overlap_ko")).drop("__overlap_ko")


def overlap_flags_global(
    df: DataFrame,
    start_col: str,
    end_col: str,
    tiebreak_cols: list[str] | None = None,
    extremes_exclude: bool = False,
    num_partitions: int | None = None,
    flag_col: str = "__overlap_ko",
) -> DataFrame:
    """Same computation, but ANNOTATES every row with a boolean `flag_col`
    instead of filtering — the shape the Rule engine needs (a rule's
    violation is a boolean column over a 1:1-preserved frame, so the
    un-keyed period check can route here via `prepare` instead of funnelling
    the table through Window.partitionBy(lit(1))'s single task)."""
    tiebreak_cols = tiebreak_cols or []
    sort_cols = [start_col, end_col, *tiebreak_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2

    ordered = df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
    ordered = ordered.sortWithinPartitions(*sort_cols)
    ordered = ordered.withColumn("__pid", F.spark_partition_id())
    # PIN the partitioning: repartitionByRange SAMPLES its boundaries with a
    # per-job seed (derived from the RDD id), so re-executing the exchange in
    # the later flag job can place rows in different partitions than the
    # bounds job saw — the driver stitch would then patch the wrong rows.
    # Materializing once freezes both the boundaries and the row order; the
    # flag job reads the same partitions the bounds came from. (Production
    # analogue at 100 TB: write the range-sorted frame to a temp table and
    # read it for both passes.)
    ordered = ordered.localCheckpoint(eager=True)

    # phase 1: boundary rows (first/last per partition, tiny)
    bounds = (
        ordered.groupBy("__pid")
        .agg(
            F.min(F.struct(*sort_cols)).alias("__first"),
            F.max(F.struct(*sort_cols)).alias("__last"),
            F.count(F.lit(1)).alias("__n"),
        )
        .collect()
    )
    info = {r["__pid"]: r for r in sorted(bounds, key=lambda r: r["__pid"])}

    def _cmp(prev_end, start) -> bool:
        if prev_end is None or start is None:
            return False
        return prev_end >= start if extremes_exclude else prev_end > start

    # driver stitch: for each partition, the predecessor's last end and the
    # successor-first-row's chk (computed here from boundary rows alone)
    prev_end_for: dict[int, object] = {}
    next_first_chk: dict[int, bool] = {}
    last_end_so_far = None
    pids = sorted(info)
    for pid in pids:
        prev_end_for[pid] = last_end_so_far
        last_end_so_far = info[pid]["__last"][end_col]
    for i, pid in enumerate(pids):
        nxt = next((q for q in pids[i + 1:] if info[q]["__n"] > 0), None)
        if nxt is None:
            next_first_chk[pid] = False
        else:
            next_first_chk[pid] = _cmp(
                info[pid]["__last"][end_col], info[nxt]["__first"][start_col]
            )

    from pyspark.sql.types import BooleanType, StructField

    base_schema = ordered.drop("__pid").schema
    out_schema = base_schema.add(StructField(flag_col, BooleanType(), False))

    def patch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas hands ONE partition as a stream of Arrow batches
        # (spark.sql.execution.arrow.maxRecordsPerBatch rows each) — the
        # lag/lead chain must run across batch boundaries, stitching only at
        # true partition edges. State carried between batches: the running
        # predecessor end, and the partition's last-seen row (its lead(chk)
        # is unknown until the next batch's first chk, so emission is
        # deferred one batch). O(batch) memory, never the whole partition.
        pid = None
        carry_end = None  # end value of the last row seen so far
        pending_row: pd.DataFrame | None = None  # deferred last row
        pending_chk = False

        def _chk(prev_end: pd.Series, start: pd.Series) -> pd.Series:
            if extremes_exclude:
                return (prev_end >= start).fillna(False)
            return (prev_end > start).fillna(False)

        for pdf in it:
            if not len(pdf):
                continue
            if pid is None:
                pid = int(pdf["__pid"].iloc[0])
                carry_end = prev_end_for.get(pid)
            prev_end = pdf[end_col].shift(1)
            if carry_end is not None:
                prev_end.iloc[0] = carry_end
            chk = _chk(prev_end, pdf[start_col])
            if pending_row is not None:
                # previous batch's last row: its lead(chk) is this batch's
                # first chk
                pending_row[flag_col] = bool(pending_chk or bool(chk.iloc[0]))
                yield pending_row
            # rows [0, n-2] have their lead within this batch
            lead_chk = chk.shift(-1, fill_value=False)
            out = pdf.iloc[:-1].drop(columns=["__pid"])
            if len(out):
                out[flag_col] = (chk | lead_chk).iloc[:-1].values
                yield out
            pending_row = pdf.iloc[[-1]].drop(columns=["__pid"])
            pending_chk = bool(chk.iloc[-1])
            carry_end = pdf[end_col].iloc[-1]
        if pending_row is not None:
            # partition's true last row: lead(chk) comes from the driver
            # stitch (the successor partition's first-row chk)
            pending_row[flag_col] = bool(
                pending_chk or next_first_chk.get(pid, False)
            )
            yield pending_row

    return ordered.mapInPandas(patch, out_schema)
