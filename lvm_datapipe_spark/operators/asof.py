"""As-of and range joins — temporal operators Spark lacks natively
(SURVEY.md §2.5 J4 notes the frame-span containment semantics; the extension
layer exposes them as first-class operators).

``asof_join`` uses the union + window trick, NOT a join-then-rank:

    tag both sides → unionByName → per-key sort by (ts, side, tie)
    → last_value(right attrs, ignorenulls) over the ordered window
    → keep left rows

One shuffle keyed on the join key, linear in |L|+|R| — a join-then-rank
explodes to |L|×|R/key| intermediate rows, which at 100 TB is the difference
between a sort and an OOM.  Semantics: for each left row, the right row with
the greatest (ts, tie) such that right.ts <= left.ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    tie_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows keep all columns, gaining ``right_values`` from
    the nearest right row per ``key`` — the most recent with
    ``right_ts <= left_ts`` (``direction="backward"``, ties break by
    ``tie_col`` greatest-wins) or the earliest with ``right_ts >= left_ts``
    (``direction="forward"``, ties break least-wins).  Both directions are
    the same single keyed union+window shuffle — linear, never
    join-then-rank."""
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    tie = tie_col if tie_col is not None else right_values[0]

    # All right value columns travel in ONE struct so the window fill picks a
    # single right ROW atomically.  Filling each column independently with
    # last(ignorenulls) would backfill a column that is NULL in the newest
    # right row from an OLDER row — a torn row that diverges from
    # join-then-rank semantics.  The struct is non-null for every right row
    # even when its fields are null, so ignorenulls only skips LEFT rows.
    rv_type = T.StructType([T.StructField(v, right.schema[v].dataType) for v in right_values])

    backward = direction == "backward"
    # at equal ts the left row must SEE the right row: left sorts after
    # right for backward (<=), before right for forward (>=)
    l_side = 1 if backward else 0
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(right.schema[tie].dataType).alias("_tie"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1 - l_side).alias("_side"),
        F.col(tie).alias("_tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        F.struct(*[F.col(v).alias(v) for v in right_values]).alias("_rv"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_tie").asc()]
    if backward:
        w = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = F.last("_rv", ignorenulls=True)
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = F.first("_rv", ignorenulls=True)
    filled = unioned.select("*", fill.over(w).alias("_rvf"))
    return filled.filter(F.col("_side") == l_side).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_rvf.{v}").alias(v) for v in right_values],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Interval containment join: right rows whose [start, end] span contains
    left's point, equi-keyed on ``key`` (the clip→frame-span shape,
    macvid.py:21).  The equi-key keeps it a hash join with a range residual —
    without one, bucketize the range into bins and join on (key, bin)."""
    l, r = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"l.{point_col}") >= F.col(f"r.{start_col}"))
        & (F.col(f"l.{point_col}") <= F.col(f"r.{end_col}"))
    )
    return l.join(r, cond).select(
        "l.*", *[F.col(f"r.{c}").alias(c) for c in right.columns if c != key]
    )
