"""Aggregation operators (SURVEY.md §2.4, A1-A9).

All are stock Catalyst aggregations: partial (map-side) aggregation happens
automatically, so each is one shuffle keyed on the group-by columns.

Float determinism convention: aggregate sums/averages that feed the DuckDB
oracle go through an exact DECIMAL accumulation and are cast back to DOUBLE
(`decimal_sum`), because double summation is order-dependent and Spark's
partial aggregation order differs run-to-run and engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Exact decimal accumulator wide enough for sf-scaled sums of ~1e5-magnitude
# doubles with 6 fractional digits.
_DEC = "decimal(27,6)"


def decimal_sum(col: Column | str) -> Column:
    """Order-insensitive exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def decimal_avg(col: Column | str) -> Column:
    """Order-insensitive mean: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


#: Row ceiling for :func:`exact_percentiles_driver`: 8M doubles is a 64 MB
#: Arrow collect and a ~0.5 s numpy sort on the driver — comfortably
#: driver-sized; above it the distributed ``percentile`` aggregate carries
#: the query.  Env-overridable (``SPARK_GRAFT_DRIVER_PCT_MAX_ROWS``).
DRIVER_PCT_MAX_ROWS = 8_000_000


def exact_percentiles_driver(
    df: DataFrame,
    col: str,
    fractions: list[float],
    max_rows: int | None = None,
) -> list[float] | None:
    """Exact linear-interpolated percentiles of a DOUBLE column computed on
    the driver — bit-identical to Spark's ``percentile()`` aggregate (and
    DuckDB's ``quantile_cont``): one numpy sort plus the same IEEE
    interpolation ``(hi − pos)·arr[lo] + (pos − lo)·arr[hi]`` at
    ``pos = p·(n−1)`` (exactly ``Percentile.getPercentile``'s float
    expression — Python floats are the same IEEE doubles, so every
    operation matches to the last ULP).

    Why: the exact ``percentile`` aggregate holds a boxed value→count
    OpenHashMap per partition and finishes with a single-task merge+sort of
    every distinct value — measured ~4.5 s on 600k rows/583k distinct at
    sf0.1 while the Arrow column collect + ``np.sort`` costs ~1 s.  Same
    size-gated driver-finish pattern as the dense triangle kernel; returns
    ``None`` above the row gate (or on an empty column — the caller's
    distributed aggregate handles both)."""
    import os

    import numpy as np

    if max_rows is None:
        max_rows = int(
            os.environ.get("SPARK_GRAFT_DRIVER_PCT_MAX_ROWS", DRIVER_PCT_MAX_ROWS)
        )
    n = df.where(F.col(col).isNotNull()).count()
    if n == 0 or n > max_rows:
        return None
    arr = np.sort(
        df.where(F.col(col).isNotNull())
        .select(F.col(col).cast("double").alias("v"))
        .toPandas()["v"]
        .to_numpy()
    )
    out = []
    for p in fractions:
        pos = p * (n - 1)
        lo = int(pos)
        hi = lo if pos == lo else lo + 1
        if lo == hi:
            out.append(float(arr[lo]))
        else:
            out.append(float((hi - pos) * arr[lo] + (pos - lo) * arr[hi]))
    return out


def find_breakpoint(
    clips: DataFrame,
    video_col: str = "video_id",
    video_duration_col: str = "video_duration",
    clip_duration_col: str = "clip_duration",
    tolerance_s: float = 0.5,
) -> DataFrame:
    """A1 — per-video completeness check: a video is "done" when the sum of
    its clip durations is within ``tolerance_s`` of the video duration.

    Reference: ``evaluations/scene_cut.py:175-187`` (``find_breakpoint`` —
    a hand-written dict accumulation loop).  Spark: one groupBy + HAVING.
    """
    return (
        clips.groupBy(video_col)
        .agg(
            F.first(video_duration_col).alias("video_duration"),
            decimal_sum(clip_duration_col).alias("clips_duration"),
        )
        .filter(F.col("video_duration") - F.col("clips_duration") < tolerance_s)
    )


def corpus_stats(df: DataFrame, col: str) -> DataFrame:
    """A5 — corpus totals (``analyze/analyze_vids.py:42``:
    ``sum(durations), mean(durations)``)."""
    return df.agg(
        decimal_sum(col).alias("total"),
        decimal_avg(col).alias("mean"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.count(F.lit(1)).alias("n"),
    )


def histogram(df: DataFrame, col: str, bins: list[float], bucket_col: str = "bucket") -> DataFrame:
    """A6 — histogram with custom bucket edges.

    Reference: ``np.histogram(durations, bins=[0,5,10,60,300,600,1800,3600,
    inf])`` (``analyze/analyze_vids.py:43-51``).  Implemented as a CASE
    ladder (`F.when` chain) + groupBy-count so the whole thing is one
    map-side-combined aggregation; buckets are labeled by their ordinal so
    output order/naming is deterministic.  Buckets follow numpy semantics:
    left-closed, right-open, last bin unbounded.
    """
    expr = None
    for i in range(len(bins)):
        lo = bins[i]
        hi = bins[i + 1] if i + 1 < len(bins) else None
        cond = F.col(col) >= lo if hi is None else (F.col(col) >= lo) & (F.col(col) < hi)
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    return (
        df.withColumn(bucket_col, expr)
        .filter(F.col(bucket_col).isNotNull())
        .groupBy(bucket_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """A7 — category value-counts (``analyze/analyze_vids.py:11-26`` dict
    counter)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))


def count_consistency(records: DataFrame, files: DataFrame, lo: int = 1, hi: int = 3) -> DataFrame:
    """A8 — post-stage sanity check: file count minus metadata record count
    must be within [lo, hi] (``evaluations/check/check_secne.py:12-27``).
    Returns a single row (record_count, file_count, delta, ok)."""
    r = records.agg(F.count(F.lit(1)).alias("record_count"))
    f = files.agg(F.count(F.lit(1)).alias("file_count"))
    return (
        r.crossJoin(f)
        .withColumn("delta", F.col("file_count") - F.col("record_count"))
        .withColumn("ok", (F.col("delta") >= lo) & (F.col("delta") <= hi))
    )


def with_object_count(clips: DataFrame, objects_col: str = "scene.objects") -> DataFrame:
    """A9 — derived ``num_of_objects = len(objects)``
    (``data_schema/macvid.py:29-30``)."""
    return clips.withColumn("num_of_objects", F.size(objects_col))


def hll_partials(
    df: DataFrame, key_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Build MERGEABLE HyperLogLog sketches per key group — the
    pre-aggregation pattern for distinct counts at 100 TB.

    A plain COUNT(DISTINCT user) over a month of data re-reads the month
    every time the window moves.  The sketch pattern instead materializes
    one small binary sketch per (day, ...) partition ONCE; any coarser
    rollup (week, month, all-time) is then a cheap
    :func:`hll_merge` over the stored sketches — no re-scan, and the
    union is lossless for HLL (estimate(merge(a,b)) ==
    estimate(sketch(a ∪ b))).  Spark's built-in ``hll_sketch_agg`` is a
    Datasketches HllSketch: partial aggregation works map-side, the
    sketch column is a few KB per group.

    Approximate by nature, so this family is TEST-verified (merge
    associativity + error bound vs exact) rather than oracle-paired —
    the engine's deterministic twin for the same question is
    ``count_distinct``.
    """
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_merge(
    partials: DataFrame,
    key_cols: list[str],
    sketch_col: str = "hll",
    count_col: str | None = "n_rows",
) -> DataFrame:
    """Roll stored HLL partials up to coarser keys: union-merge the binary
    sketches and estimate.  ``allowDifferentLgConfigK`` stays False — all
    partials come from :func:`hll_partials` with one lg_k, and a silent
    precision downgrade on mixed configs is exactly the kind of surprise
    a pipeline should fail loudly on.  ``count_col=None`` (or a column
    absent from ``partials``) skips the row-count rollup — sketch tables
    that renamed or dropped the companion count still merge."""
    grouped = (
        partials.groupBy(*key_cols)
        if key_cols
        else partials.groupBy()
    )
    aggs = [
        F.hll_sketch_estimate(
            F.hll_union_agg(sketch_col, F.lit(False))
        ).alias("approx_distinct")
    ]
    if count_col and count_col in partials.columns:
        aggs.append(F.sum(count_col).alias(count_col))
    return grouped.agg(*aggs)


def agg_state(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Build incremental aggregate STATE: (keys..., n_rows, sum_value) with
    the sum kept as DECIMAL(27,6) — not double — so that states merge
    EXACTLY (see :func:`merge_agg_state`)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(27,6)")).alias("sum_value"),
    )


def merge_agg_state(state: DataFrame, delta_state: DataFrame, keys: list[str]) -> DataFrame:
    """Merge a persisted aggregate state with a new batch's state — the
    incremental-view-maintenance pattern: a daily pipeline keeps
    (key, n, Σ) materialized and folds each new partition in with ONE
    |keys|-sized full-outer join instead of re-scanning the history.

    Exactness is why the state holds DECIMAL sums: each input value is
    quantized to 6 dp once, on entry; decimal addition is associative, so
    state ⊕ delta is bit-identical to a from-scratch aggregate over the
    union — a DOUBLE state would drift (float addition is
    order-sensitive), and the invariant "incremental == full recompute"
    is the whole point of the pattern.  Count-distinct fits the same
    shape via :func:`hll_partials` (mergeable sketches).
    """
    a = state.select(
        *[F.col(k).alias(f"_ka_{k}") for k in keys],
        F.col("n_rows").alias("_n_a"),
        F.col("sum_value").alias("_s_a"),
    )
    b = delta_state.select(
        *[F.col(k).alias(f"_kb_{k}") for k in keys],
        F.col("n_rows").alias("_n_b"),
        F.col("sum_value").alias("_s_b"),
    )
    # NULL-SAFE key equality: groupBy treats NULL as a real group, so the
    # merge must too — a plain equi-join would leave a null-key state row
    # and a null-key delta row unmerged, breaking the "incremental == full
    # recompute" invariant exactly where dirty data lives.
    cond = None
    for k in keys:
        c = F.col(f"_ka_{k}").eqNullSafe(F.col(f"_kb_{k}"))
        cond = c if cond is None else (cond & c)
    zero = F.lit(0).cast("decimal(27,6)")
    return (
        a.join(b, cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(f"_ka_{k}"), F.col(f"_kb_{k}")).alias(k)
                for k in keys
            ],
            (
                F.coalesce(F.col("_n_a"), F.lit(0))
                + F.coalesce(F.col("_n_b"), F.lit(0))
            ).alias("n_rows"),
            (
                F.coalesce(F.col("_s_a"), zero)
                + F.coalesce(F.col("_s_b"), zero)
            )
            .cast("decimal(27,6)")
            .alias("sum_value"),
        )
    )


def heavy_hitters(
    df: DataFrame, value_col: str, k: int = 20
) -> DataFrame:
    """Misra-Gries heavy hitters: every value occurring more than n/k times
    is GUARANTEED present in the result (the classic streaming summary,
    public algorithm) — with count estimates that undercount by at most
    n/k.

    Scale shape: one ``mapInPandas`` pass builds a k-counter summary PER
    PARTITION (bounded memory, no shuffle of raw values — the point: a
    groupBy-count of a high-cardinality column shuffles |distinct| rows,
    the summary ships k·n_partitions rows), then the per-partition
    summaries merge by key in one tiny aggregation.  Merged Misra-Gries
    summaries keep the containment guarantee with error ≤ n/k summed
    across partitions (bounded by the same n/k bound on the whole
    corpus).  Exact counts for the surviving candidates can be
    recovered with one semi-joined recount when needed — candidates are
    ≤ k·n_partitions keys, so the recount is a broadcast semi-join, not
    a full shuffle.

    Approx family: test-verified (guarantee + error bound vs exact), like
    the HLL sketches.  Returns (value, est_count) — est_count ≤ true
    count, true count ≤ est_count + n/k·(summary merges).
    """
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            # vectorized per batch: collapse to a (distinct value, count)
            # table first, then MG-fold each distinct value's count in
            # bulk — identical guarantee to per-item processing (MG is
            # order-independent: any arrival order is a valid run), but
            # the python loop runs per batch-DISTINCT value, not per row
            for v, c in pdf[value_col].value_counts(dropna=True).items():
                c = int(c)
                if v in counters:
                    counters[v] += c
                    continue
                while c > 0:
                    if len(counters) < k:
                        counters[v] = c
                        break
                    # bulk decrement: d untracked copies consume
                    # themselves and decrement every counter by d, where
                    # d empties the smallest counter (making room) or
                    # exhausts the copies — exactly d repetitions of the
                    # classic per-item decrement-all step
                    d = min(c, min(counters.values()))
                    c -= d
                    dead = []
                    for key in counters:
                        counters[key] -= d
                        if counters[key] <= 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"value": list(counters), "est": list(counters.values())}
            )

    summaries = df.select(value_col).mapInPandas(
        summarize, schema=f"value {df.schema[value_col].dataType.simpleString()}, est long"
    )
    # merging MG summaries by summing shared keys preserves containment;
    # a final k-truncation would re-introduce error, so keep all
    # candidates (≤ k·n_partitions rows — tiny)
    return (
        summaries.groupBy("value")
        .agg(F.sum("est").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col("value"))
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 64,
) -> DataFrame:
    """Mergeable fixed-bin QUANTILE sketch — the third member of the
    no-rescan sketch family next to :func:`hll_partials` (distinct counts)
    and :func:`heavy_hitters` (top keys).  The sketch for a group is its
    per-bin count vector over ``n_bins`` equal-width bins spanning the
    group's [min, max]: shard sketches merge by SUMMING counts (exact
    associativity — proven in tests), so incremental corpora never rescan
    history to maintain quantile estimates.

    Returns one row per (group, bin) with ``(group_col, bin, c, mn, width,
    n)`` — everything downstream (:func:`sketch_median`) derives from this
    table.  Deterministic: bin edges come from one min/max aggregate
    (exact doubles both engines), bin index is exact-IEEE arithmetic."""
    rng = df.groupBy(group_col).agg(
        F.min(F.col(value_col).cast("double")).alias("mn"),
        F.max(F.col(value_col).cast("double")).alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(n_bins))
    b = (
        df.join(F.broadcast(rng), group_col)
        .withColumn("width", width)
        .withColumn(
            "bin",
            F.when(F.col("width") == 0.0, F.lit(0)).otherwise(
                F.least(
                    F.lit(n_bins - 1),
                    F.floor(
                        (F.col(value_col).cast("double") - F.col("mn"))
                        / F.col("width")
                    ).cast("int"),
                )
            ),
        )
    )
    return b.groupBy(group_col, "bin", "mn", "width", "n").agg(
        F.count(F.lit(1)).alias("c")
    )


def sketch_median(sketch: DataFrame, group_col: str) -> DataFrame:
    """Median estimate from a :func:`quantile_sketch` table: the first bin
    whose cumulative count reaches the lower-median rank ceil(n/2), estimated
    at the bin midpoint — error is bounded by half a bin width (asserted
    against the exact percentile in tests).  The rank is INTEGER arithmetic
    ((n+1) DIV 2) and the cumulative window runs over <= n_bins rows per
    group — sketch-sized, never corpus-sized."""
    wc = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.withColumn("cum", F.sum("c").over(wc))
    hit = cum.filter(F.col("cum") >= F.expr("(n + 1) DIV 2"))
    wr = Window.partitionBy(group_col).orderBy("bin")
    first = hit.withColumn("_r", F.row_number().over(wr)).filter(F.col("_r") == 1)
    est = F.col("mn") + (F.col("bin").cast("double") + F.lit(0.5)) * F.col("width")
    return first.select(
        group_col,
        F.col("n").alias("n"),
        F.when(F.col("width") == 0.0, F.col("mn")).otherwise(est).alias("median_est"),
    )


def cm_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan) of a value column's
    frequency distribution — the mergeable point-frequency companion to
    the HLL (distinct), Misra-Gries (top-k) and fixed-bin quantile
    sketches.  Returns the ``depth x width`` counter table as rows
    ``(d, bucket, cnt)`` (absent cells are implicit zeros), built with
    ONE scan: each value fans out to ``depth`` md5-derived buckets
    (deterministic, engine-portable — same idiom as
    ``sampling.hash_bucket``) and a single keyed count aggregates them.

    Sketches MERGE by summing cell-wise (:func:`cm_merge`) — the
    no-rescan rollup property: materialize one sketch per day partition,
    answer any coarser window by summing sketches.  Estimates
    (:func:`cm_estimate`) are min-over-rows and NEVER undercount;
    overcount is bounded by e·N/width with prob 1-(1/e)^depth.
    Approximate by nature → TEST-verified (overestimate-only + bound +
    merge == whole-corpus sketch), like the other sketches."""
    rows = []
    for d in range(depth):
        h = F.md5(
            F.concat(F.lit(f"{salt}{d}:"), F.col(value_col).cast("string")).cast(
                "binary"
            )
        )
        b = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width
        rows.append(F.struct(F.lit(d).alias("d"), b.alias("bucket")))
    return (
        df.select(F.explode(F.array(*rows)).alias("cell"))
        .select("cell.d", "cell.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Sum count-min sketches cell-wise (all must share depth/width/salt)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a count-min sketch:
    min over the depth rows of the addressed cells (missing cells are
    true zeros).  The sketch is sketch-sized — broadcast — so lookup is
    a scan of ``keys``, never of the sketched corpus."""
    cells = []
    for d in range(depth):
        h = F.md5(
            F.concat(F.lit(f"{salt}{d}:"), F.col(key_col).cast("string")).cast(
                "binary"
            )
        )
        b = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width
        cells.append(F.struct(F.lit(d).alias("d"), b.alias("bucket")))
    addressed = keys.select(
        key_col, F.explode(F.array(*cells)).alias("cell")
    ).select(key_col, "cell.d", "cell.bucket")
    joined = addressed.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )
