"""Named queries for the driver contract (__spark_entry__.queries()).

One entry per implemented operator family from SURVEY.md §2, each exercised
on the driver's TPC-H-ish synthetic tables, with an equivalent DuckDB oracle
SQL string in ORACLE_SQL.  Naming convention: the key prefix is the SURVEY §2
operator id (f1, a1, j2, w1, c1, ...).

Cross-engine determinism rules (every query here follows them):
- double sums/averages go through exact DECIMAL accumulation
  (aggregates.decimal_sum) so partial-aggregation order can't change bits;
- every computed column is aliased identically in Spark and SQL;
- ROW_NUMBER orderings always carry a unique tie-break column;
- integer-ish results are cast to BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lvm_datapipe_spark.catalog import load_table
from lvm_datapipe_spark.functions import strings as S
from lvm_datapipe_spark.operators import aggregates as A
from lvm_datapipe_spark.operators import relational as R

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

#: Exact-but-scale-weak forms DEMOTED from the declared surface (VERDICT r5
#: item 4, same playbook as the r5 quadratic-dedup demotion): each entry is
#: (query fn, DuckDB oracle SQL) and is checked against DuckDB at sf0.001 in
#: tests/test_oracle_queries.py — the semantics stay pinned, but no user
#: copying queries() can pick up a plan that dies at 100 TB.  The declared
#: scale-safe twin is named in each docstring.
PYTEST_ORACLES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str]] = {}

_DEC_SUM = "CAST(SUM(CAST({x} AS DECIMAL(27,6))) AS DOUBLE)"


def _q(name: str, sql: str | None = None):
    def deco(fn):
        assert name not in QUERIES, f"duplicate query registration: {name}"
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _pytest_q(name: str, sql: str):
    """Register a pytest-only semantics oracle (NOT part of queries())."""

    def deco(fn):
        PYTEST_ORACLES[name] = (fn, sql)
        return fn

    return deco


def _dsum(x: str) -> str:
    return _DEC_SUM.format(x=x)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (the reference's corpus-stats
# analog at scale: one full-table scan + 4-way aggregate, analyze_vids.py:42).
# ---------------------------------------------------------------------------


@_q(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity')} AS sum_qty,
           {_dsum('l_extendedprice')} AS sum_base_price,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {_dsum('l_quantity')} / COUNT(l_quantity) AS avg_qty,
           {_dsum('l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
           {_dsum('l_discount')} / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            A.decimal_sum("l_quantity").alias("sum_qty"),
            A.decimal_sum("l_extendedprice").alias("sum_base_price"),
            A.decimal_sum(disc_price).alias("sum_disc_price"),
            A.decimal_sum(charge).alias("sum_charge"),
            A.decimal_avg("l_quantity").alias("avg_qty"),
            A.decimal_avg("l_extendedprice").alias("avg_price"),
            A.decimal_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# F1 — pushdown filter before the expensive stage (coca_caption.py:72)
# ---------------------------------------------------------------------------


@_q(
    "f1_duration_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 45.0
    """,
)
def f1_duration_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return R.filter_min_duration(li, min_s=45.0, col="l_quantity").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# F2/J1 — resume anti-join (aesthetic_score.py:98): orders with no 'R'
# lineitem are "not yet done".
# ---------------------------------------------------------------------------


@_q(
    "f2_resume_anti_join",
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    """,
)
def f2_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    done = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return R.resume_anti_join(orders, done, key="o_orderkey").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


# ---------------------------------------------------------------------------
# A1 — find_breakpoint (scene_cut.py:175-187): per-"video" duration
# completeness; orders=videos, lineitems=clips.
# ---------------------------------------------------------------------------


@_q(
    "a1_breakpoint",
    f"""
    WITH per AS (
      SELECT l.l_orderkey AS o_orderkey,
             MIN(o.o_totalprice) AS video_duration,
             {_dsum('l.l_extendedprice')} AS clips_duration
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_orderkey)
    SELECT o_orderkey, video_duration, clips_duration
    FROM per WHERE video_duration - clips_duration < 0.5
    """,
)
def a1_breakpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey).select(
        "o_orderkey",
        F.col("o_totalprice").alias("video_duration"),
        F.col("l_extendedprice").alias("clip_duration"),
    )
    return A.find_breakpoint(
        joined,
        video_col="o_orderkey",
        video_duration_col="video_duration",
        clip_duration_col="clip_duration",
        tolerance_s=0.5,
    )


# ---------------------------------------------------------------------------
# J2 — score-enrichment join (aesthetic_score.py:130-132): broadcast dim join
# + aggregate.
# ---------------------------------------------------------------------------


@_q(
    "j2_enrichment_join",
    f"""
    SELECT p.p_brand,
           {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def j2_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            A.decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J4 — dimension-chain join (clip→video→category analog): revenue per region,
# TPC-H Q5 shape. All dims broadcast; the only shuffle is the final agg.
# ---------------------------------------------------------------------------


@_q(
    "j4_region_revenue",
    f"""
    SELECT r.r_name,
           {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j4_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    # nation/region are constant-size dims — hint them.  customer GROWS
    # linearly with scale factor (~15 M rows at sf100): a forced broadcast
    # hint would override Spark's size check and OOM at 100× scale, so its
    # join is size-gated (planner stats + AQE pick broadcast vs shuffled
    # join) — asserted hint-free in tests/test_plan_quality.py.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            A.decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# A5 — corpus stats (analyze_vids.py:42)
# ---------------------------------------------------------------------------


@_q(
    "a5_corpus_stats",
    f"""
    SELECT {_dsum('l_extendedprice')} AS total,
           {_dsum('l_extendedprice')} / COUNT(l_extendedprice) AS mean,
           MIN(l_extendedprice) AS min,
           MAX(l_extendedprice) AS max,
           COUNT(*) AS n
    FROM lineitem
    """,
)
def a5_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.corpus_stats(load_table(spark, sf_dir, "lineitem"), "l_extendedprice")


# ---------------------------------------------------------------------------
# A6 — histogram with custom buckets (analyze_vids.py:43-51)
# ---------------------------------------------------------------------------

_QTY_BINS = [0.0, 5.0, 10.0, 20.0, 30.0, 40.0, 45.0]


@_q(
    "a6_histogram",
    """
    SELECT CASE
             WHEN l_quantity >= 0.0 AND l_quantity < 5.0 THEN 0
             WHEN l_quantity >= 5.0 AND l_quantity < 10.0 THEN 1
             WHEN l_quantity >= 10.0 AND l_quantity < 20.0 THEN 2
             WHEN l_quantity >= 20.0 AND l_quantity < 30.0 THEN 3
             WHEN l_quantity >= 30.0 AND l_quantity < 40.0 THEN 4
             WHEN l_quantity >= 40.0 AND l_quantity < 45.0 THEN 5
             WHEN l_quantity >= 45.0 THEN 6
           END AS bucket,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity >= 0.0
    GROUP BY 1
    """,
)
def a6_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.histogram(load_table(spark, sf_dir, "lineitem"), "l_quantity", _QTY_BINS)


# ---------------------------------------------------------------------------
# A7 — value counts (analyze_vids.py:11-26)
# ---------------------------------------------------------------------------


@_q(
    "a7_value_counts",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def a7_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.value_counts(load_table(spark, sf_dir, "events"), "event_type")


# ---------------------------------------------------------------------------
# A8 — count-consistency check (check_secne.py:12-27)
# ---------------------------------------------------------------------------


@_q(
    "a8_count_consistency",
    """
    SELECT r.record_count, f.file_count,
           f.file_count - r.record_count AS delta,
           (f.file_count - r.record_count) BETWEEN 1 AND 3 AS ok
    FROM (SELECT COUNT(*) AS record_count FROM orders) r,
         (SELECT COUNT(*) AS file_count FROM lineitem) f
    """,
)
def a8_count_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.count_consistency(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


# ---------------------------------------------------------------------------
# A9 — derived size column (macvid.py:29-30: num_of_objects = len(objects))
# ---------------------------------------------------------------------------


@_q(
    "a9_derived_size",
    """
    SELECT CAST(len(embedding) AS INTEGER) AS n_dims, COUNT(*) AS n
    FROM embeddings GROUP BY 1
    """,
)
def a9_derived_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(F.size("embedding").alias("n_dims")).groupBy("n_dims").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# C1 + window — clip-id formatting over a per-group row_number
# (scene_cut.py:82: f'{video_id}_{idx:07d}' == row_number per video)
# ---------------------------------------------------------------------------


@_q(
    "w1_clip_numbering",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                ORDER BY l_linenumber, l_partkey) AS INTEGER) AS clip_index,
           printf('%d_%07d', l_orderkey,
                  ROW_NUMBER() OVER (PARTITION BY l_orderkey
                  ORDER BY l_linenumber, l_partkey)) AS clip_id
    FROM lineitem
    """,
)
def w1_clip_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("clip_index"),
        F.format_string(
            "%d_%07d", F.col("l_orderkey"), F.row_number().over(w)
        ).alias("clip_id"),
    )


# ---------------------------------------------------------------------------
# top-k per group — best_ocr_only.json materialization (macvid.py:114)
# ---------------------------------------------------------------------------


@_q(
    "w2_best_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) = 1
    """,
)
def w2_best_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return R.best_per_group(orders, "o_custkey", "o_totalprice", "o_orderkey").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# set ops — shard union (macvid.py:152-157) and finished-set difference
# (scene_cut.py:238)
# ---------------------------------------------------------------------------


@_q(
    "set_union_shards",
    """
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def set_union_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    shard1 = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    shard2 = orders.filter(F.col("o_orderpriority") == "2-HIGH")
    return R.union_shards(shard1, shard2)


@_q(
    "set_except_finished",
    """
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey AS p_partkey FROM lineitem
    """,
)
def set_except_finished(spark: SparkSession, sf_dir: str) -> DataFrame:
    all_parts = load_table(spark, sf_dir, "part").select("p_partkey")
    ordered = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey")
    )
    return R.finished_set_difference(all_parts, ordered)


# ---------------------------------------------------------------------------
# sort + limit — top-k (debug limiter sum_caption_llama.py:108 + orderBy)
# ---------------------------------------------------------------------------


@_q(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return R.top_k(
        orders.select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        10,
    )


# ---------------------------------------------------------------------------
# C7 — regex answer-word extraction (sum_caption_llama.py:42-50), applied to a
# synthesized LLM-output string so the fixture is deterministic.
# ---------------------------------------------------------------------------


@_q(
    "c7_extract_answer",
    """
    SELECT p_partkey,
           array_to_string(COALESCE(list_filter(
             list_transform(
               string_split_regex(regexp_extract(
                 'noise text Answer: ["' || p_name || '", "' || p_type || '"] trailing',
                 'Answer:\\s*\\[(.*?)\\]', 1), '\\s*,\\s*'),
               w -> regexp_replace(trim(w), '["'']', '', 'g')),
             w -> w <> ''), []), '|') AS words_csv
    FROM part
    """,
)
def c7_extract_answer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Answer-word extraction (C7).  The driver's canonicalizer hashes the
    result in pandas, which cannot hash list cells — so the *declared* query
    projects the array to a deterministic '|'-joined string.  The
    array-returning builder (`S.extract_answer_words`) stays the API for
    programmatic use."""
    part = load_table(spark, sf_dir, "part")
    raw = F.concat(
        F.lit('noise text Answer: ["'),
        F.col("p_name"),
        F.lit('", "'),
        F.col("p_type"),
        F.lit('"] trailing'),
    )
    return part.select(
        "p_partkey",
        F.array_join(S.extract_answer_words(raw), "|").alias("words_csv"),
    )


# ---------------------------------------------------------------------------
# Streaming-shaped batch: tumbling-window aggregation over the events table
# (Structured Streaming extension, SURVEY.md §2.9 — same plan batch/stream).
# ---------------------------------------------------------------------------


@_q(
    "events_tumbling_window",
    f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {_dsum('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), A.decimal_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


# ---------------------------------------------------------------------------
# Streaming SINK verification: the same tumbling-window aggregation executed
# as a real Structured Streaming query (file source → watermark → window agg
# → checkpointed parquet sink), then the sink read back and hash-compared to
# the batch oracle.  Batch/stream equivalence, oracle-visible.
# ---------------------------------------------------------------------------


@_q(
    "stream_sink_tumbling_window",
    f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {_dsum('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_sink_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs windowed_counts as an actual streaming job into a checkpointed
    parquet sink (streaming/events.py:start_to_parquet), then returns the
    sink contents.  A far-future sentinel row lands as a second micro-batch
    so the watermark passes every real window's end and append mode flushes
    them; the sentinel's own (never-emitted) window is filtered out.  Temp
    dirs are per-invocation (mkdtemp) so checkpoint state can never leak
    between runs."""
    import datetime as _dt
    import tempfile

    from pyspark.sql import Row

    from lvm_datapipe_spark.streaming import events as EV

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="stream_sink_q_")
    landing, sink, ckpt = f"{base}/landing", f"{base}/sink", f"{base}/ckpt"
    ev.write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema(ev.schema).parquet(landing)
    agg = EV.windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = EV.start_to_parquet(agg, sink, ckpt)
    q.processAllAvailable()

    sentinel = {f.name: None for f in ev.schema.fields}
    sentinel.update(
        event_id=-1,
        ts=_dt.datetime(2100, 1, 1),
        user_id=-1,
        event_type="flush_sentinel",
        value=0.0,
    )
    spark.createDataFrame(
        [Row(**{f.name: sentinel[f.name] for f in ev.schema.fields})], ev.schema
    ).write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()

    out = spark.read.parquet(sink).filter(F.col("event_type") != "flush_sentinel")
    # The stream casts an NTZ event-time to TIMESTAMP for the watermark
    # (streaming/events.py:ensure_event_time); cast the window back so the
    # result schema matches the batch/oracle form regardless of which flavor
    # the source parquet carried.  Session tz is UTC, so this is value-exact.
    from pyspark.sql import types as T

    if isinstance(ev.schema["ts"].dataType, T.TimestampNTZType):
        out = out.withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))
    return out


# ---------------------------------------------------------------------------
# Sessionization — gaps-and-islands with a 30-minute inactivity gap (the
# streaming session-window semantics, computed identically in batch SQL).
# ---------------------------------------------------------------------------


@_q(
    "w3_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def w3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    flagged = ev.withColumn("is_new", is_new)
    sessions = flagged.withColumn(
        "session_id", F.sum(F.col("is_new").cast("long")).over(w)
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ===========================================================================
# Extension layer: text analysis, deduplication, similarity search
# (BASELINE.json north-star: LLM-data-pipeline operators at 100 TB scale)
# ===========================================================================

# SQL fragments shared by the oracles (DuckDB dialect), mirroring the Column
# builders in operators/text.py and operators/dedup.py expression-for-
# expression so float/int results are bit-identical.

_SQL_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
_SQL_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)
_EMB_DIM = 64


def _dot_sql(a: str, b: str, dim: int = _EMB_DIM) -> str:
    """Explicit left-associated sum chain — same fold order as the Spark
    aggregate() in operators/similarity.py, so results are bit-identical."""
    return " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, dim + 1))


def _cos_sql(a: str, b: str, dim: int = _EMB_DIM) -> str:
    return (
        f"({_dot_sql(a, b, dim)}) / "
        f"(sqrt({_dot_sql(a, a, dim)}) * sqrt({_dot_sql(b, b, dim)}))"
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@_q(
    "text_token_count",
    f"SELECT doc_id, CAST(len({_SQL_TOKS}) AS INTEGER) AS n_tokens FROM documents",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.token_count("text").alias("n_tokens"))


@_q(
    "text_quality",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
             CAST(length(text) AS INTEGER) AS n_chars_actual,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
             CAST(len(list_filter(toks,
               x -> list_contains(['the','a','and','of','is'], lower(x)))) AS INTEGER) AS n_stop
      FROM t)
    SELECT doc_id, n_chars_actual, n_tokens, n_punct,
           CASE WHEN n_chars_actual > 0 THEN n_punct / n_chars_actual ELSE 0.0 END AS punct_ratio,
           CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END AS stopword_ratio,
           least(1.0, n_tokens / 100.0)
             * (1.0 - CASE WHEN n_chars_actual > 0 THEN n_punct / n_chars_actual ELSE 0.0 END)
             * (1.0 - CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END / 2.0)
             AS quality_score
    FROM m
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return X.quality_features(docs)


@_q(
    "text_langid",
    """
    WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') toks
               FROM documents),
    h AS (
      SELECT doc_id,
        CAST(len(list_filter(toks, x -> list_contains(['the','a','and','of','is'], lower(x)))) AS INTEGER) AS hits_en,
        CAST(len(list_filter(toks, x -> list_contains(['le','la','les','et','une'], lower(x)))) AS INTEGER) AS hits_fr,
        CAST(len(list_filter(toks, x -> list_contains(['el','los','y','que','una'], lower(x)))) AS INTEGER) AS hits_es,
        CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], lower(x)))) AS INTEGER) AS hits_de
      FROM t)
    SELECT doc_id, hits_en, hits_fr, hits_es, hits_de,
           CASE WHEN greatest(hits_en, hits_fr, hits_es, hits_de) = 0 THEN 'und'
                WHEN hits_en = greatest(hits_en, hits_fr, hits_es, hits_de) THEN 'en'
                WHEN hits_fr = greatest(hits_en, hits_fr, hits_es, hits_de) THEN 'fr'
                WHEN hits_es = greatest(hits_en, hits_fr, hits_es, hits_de) THEN 'es'
                ELSE 'de' END AS predicted_lang
    FROM h
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return X.language_id(docs)


@_q(
    "text_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return X.fingerprint_docs(docs)


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def _jaccard_pairs_sql() -> str:
    """Shared oracle SQL for the capped n-gram Jaccard pair set (threshold
    0.6, stop-shingle cap 1000) — used by dedup_ngram_jaccard and the
    method-agreement composition."""
    return f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= 1000),
    exk AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN keep USING (shingle)),
    sz AS (SELECT doc_id, CAST(len(s) AS INTEGER) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM exk a JOIN exk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           n_common / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE n_common / (sa.n + sb.n - n_common) >= 0.6
    """


def _minhash_pairs_sql() -> str:
    """Shared oracle SQL for the MinHash-LSH candidate pair set (16
    hashes, 4 bands x 4 rows)."""
    return f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
    sig AS (
      SELECT doc_id,
             list_transform(generate_series(0, 15),
               i -> list_min(list_transform(s, x -> md5(CAST(i AS VARCHAR) || ':' || x)))) AS sig
      FROM sh),
    bands AS (
      SELECT doc_id, b.b AS band,
             md5(sig[b.b*4+1] || ',' || sig[b.b*4+2] || ',' || sig[b.b*4+3] || ',' || sig[b.b*4+4]) AS bucket
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) b)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """




@_q(
    "dedup_exact",
    r"""
    SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.exact_duplicate_groups(docs)


@_q(
    "dedup_ngram_jaccard",
    _jaccard_pairs_sql(),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup with the stop-shingle skew cap ACTIVE (the
    oracle mirrors the cap with a HAVING df <= 1000 filter, so the check
    exercises the capped plan — the one that survives a skewed corpus)."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.6, max_shingle_freq=1000)


@_q(
    "dedup_minhash_lsh",
    _minhash_pairs_sql(),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs)


_SIMHASH_FP_CTES = """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS tok
      FROM documents),
    bits AS (
      SELECT doc_id, b.b AS bit,
             SUM(2 * ((CAST(instr('0123456789abcdef',
                   substr(md5(tok), b.b // 4 + 1, 1)) AS INTEGER) - 1 >> (b.b % 4)) & 1) - 1) AS vote
      FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
      GROUP BY doc_id, b.b),
    fp AS (
      SELECT doc_id,
             string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY bit) AS simhash
      FROM bits GROUP BY doc_id)
"""


def _simhash_sql() -> str:
    """Brute-force SQL mirror of the banded SimHash pipeline (banding is an
    exact optimization for hamming <= bands-1, so results are identical)."""
    return _SIMHASH_FP_CTES + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_filter(generate_series(1, 32),
                i -> substr(a.simhash, i, 1) <> substr(b.simhash, i, 1))) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE len(list_filter(generate_series(1, 32),
          i -> substr(a.simhash, i, 1) <> substr(b.simhash, i, 1))) <= 3
    """


@_q("dedup_simhash", _simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, max_hamming=3, bands=4)


@_q(
    "dedup_levenshtein",
    f"""
    SELECT p.id_a, p.id_b,
           CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_distance
    FROM ({_simhash_sql()}) p
    JOIN documents a ON a.doc_id = p.id_a
    JOIN documents b ON b.doc_id = p.id_b
    WHERE levenshtein(a.text, b.text) <= 50
    """,
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup verification: SimHash banding generates the
    candidate pairs (exact for hamming ≤ bands−1, keyed equi-joins only),
    then the exact Levenshtein distance filters them — the classic
    candidate→verify shape, since all-pairs edit distance is O(n²·len²) and
    unrunnable at corpus scale.  Both engines implement the same classic
    edit distance, so the result hash-matches."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_pairs(docs, max_hamming=3, bands=4).select("id_a", "id_b")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_tb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("edit_distance", F.levenshtein("_ta", "_tb"))
        .filter(F.col("edit_distance") <= 50)
        .select("id_a", "id_b", "edit_distance")
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@_q(
    "ann_cosine_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_cos_sql('qv', 'v')} AS cos_sim
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators import similarity as V

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return V.brute_force_topk(emb, queries, k=10)


def _lsh_near_dup_sql(
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    threshold: float = 0.4,
    dim: int = _EMB_DIM,
) -> str:
    """DuckDB replay of the LSH scale path: the hyperplanes are fixed-seed
    numpy draws embedded as literals on BOTH engines, so the candidate set
    (sign-bit bucket collisions) is deterministic and the verify stage's
    exact cosine is bit-identical (same left-to-right fold order)."""
    from lvm_datapipe_spark.operators.similarity import lsh_table_planes

    selects = []
    for t, planes in enumerate(lsh_table_planes(n_planes, n_tables, dim, seed)):
        bits = " || ".join(
            "(CASE WHEN ("
            + " + ".join(f"v[{i + 1}]*('{float(planes[b][i])!r}'::DOUBLE)" for i in range(dim))
            + ") >= 0 THEN '1' ELSE '0' END)"
            for b in range(n_planes)
        )
        selects.append(f"SELECT vec_id, {t} AS tbl, {bits} AS bucket FROM e")
    buckets_sql = "\nUNION ALL\n".join(selects)
    # verify stage mirrors the Spark plan: normalize once, then one dot
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    nr AS (SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS nrm FROM e),
    u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM nr),
    buckets AS ({buckets_sql}),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT c.id_a, c.id_b, {_dot_sql('ua.vn', 'ub.vn')} AS cos_sim
    FROM cand c
    JOIN u ua ON ua.vec_id = c.id_a
    JOIN u ub ON ub.vec_id = c.id_b
    WHERE {_dot_sql('ua.vn', 'ub.vn')} >= {threshold}
    """


# Scale-path embedding near-dup (hyperplane LSH candidates → exact cosine
# verify).  Fully oracle-checked: fixed seeds make the candidate set
# deterministic, so DuckDB replays the same plane literals (no corpus×corpus
# crossJoin anywhere in this plan — see tests/test_plan_quality.py).
@_q("ann_lsh_near_dup", _lsh_near_dup_sql())
def ann_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators import similarity as V

    emb = load_table(spark, sf_dir, "embeddings")
    return V.lsh_near_dup_pairs(emb, threshold=0.4)


# The DECLARED embedding near-dup operator: since r5 this is the LSH scale
# path (12 tables for recall — its candidate set strictly contains the
# 8-table ``ann_lsh_near_dup`` primitive's, tables 0-7 share the same seeded
# draws).  The exact-but-quadratic all-pairs form
# (similarity.embedding_near_dup_pairs) is DEMOTED to a pytest-only recall
# oracle (tests/test_dedup_similarity.py) — no query a user can copy from
# ``queries()`` contains a corpus×corpus CartesianProduct (plan-asserted for
# every declared query in tests/test_plan_quality.py).
@_q("dedup_embedding_cosine", _lsh_near_dup_sql(n_tables=12))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at cosine ≥ 0.4 — LSH candidates (12
    hyperplane tables) → exact-cosine verify; deterministic given the fixed
    seed, so fully oracle-checked.  One corpus scan computes every table's
    bucket, candidates meet on a (table, bucket) equi-join — no quadratic
    pair source anywhere."""
    from lvm_datapipe_spark.operators import similarity as V

    emb = load_table(spark, sf_dir, "embeddings")
    return V.lsh_near_dup_pairs(emb, threshold=0.4, n_tables=12)


def _lsh_clusters_sql(n_tables: int = 8) -> str:
    """Recursive-CTE transitive closure over the SAME deterministic LSH pair
    list the Spark plan produces (seeded plane literals replayed in DuckDB)."""
    return f"""
    WITH RECURSIVE pairs AS ({_lsh_near_dup_sql(n_tables=n_tables)}),
    edges AS (SELECT id_a AS u, id_b AS w FROM pairs
              UNION SELECT id_b AS u, id_a AS w FROM pairs),
    reach AS (SELECT u, w FROM edges
              UNION SELECT r.u AS u, e2.w AS w
              FROM reach r JOIN edges e2 ON r.w = e2.u)
    SELECT u AS id, least(u, min(w)) AS cluster_id FROM reach GROUP BY u
    """


@_q("dedup_clusters", _lsh_clusters_sql(n_tables=12))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: every vector with at least one
    cosine-0.4 near-dup is labeled with the minimum vec_id reachable through
    the near-dup graph (the dedup decision "keep one per cluster").  Since
    r5 the pair source is the 12-table LSH scale path (the quadratic
    all-pairs source is a pytest-only recall oracle); clustering is
    iterative min-label propagation (operators/graph.py — one keyed shuffle
    per round, diameter-bounded).  The oracle replays the identical seeded
    pair list through a recursive-CTE transitive closure."""
    from lvm_datapipe_spark.operators import similarity as V
    from lvm_datapipe_spark.operators.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4, n_tables=12)
    return connected_components(pairs)


def _lsh_representatives_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_lsh_near_dup_sql()}),
    edges AS (SELECT id_a AS u, id_b AS w FROM pairs
              UNION SELECT id_b AS u, id_a AS w FROM pairs),
    reach AS (SELECT u, w FROM edges
              UNION SELECT r.u AS u, e2.w AS w
              FROM reach r JOIN edges e2 ON r.w = e2.u),
    cc AS (SELECT u AS id, least(u, min(w)) AS cluster_id FROM reach GROUP BY u)
    SELECT e.vec_id, CAST(e.label AS BIGINT) AS label
    FROM embeddings e LEFT JOIN cc ON cc.id = e.vec_id
    WHERE cc.cluster_id IS NULL OR cc.cluster_id = e.vec_id
    """


@_q("dedup_representatives", _lsh_representatives_sql())
def dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE dedup decision a 100 TB run ships: LSH near-dup pairs →
    connected components → keep exactly one row per cluster (minimum id)
    plus every row with no near-dup.  One left join of the corpus against
    the (small) cluster table; no corpus×corpus product anywhere."""
    from lvm_datapipe_spark.operators import similarity as V
    from lvm_datapipe_spark.operators.graph import dedup_keep_representatives

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4)
    corpus = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    return dedup_keep_representatives(corpus, pairs, "vec_id")


@_q("dedup_clusters_lsh", _lsh_clusters_sql())
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment over the 8-table LSH primitive's pair list
    (equi-join on (table, bucket) — no corpus×corpus product, plan-asserted
    in tests/test_plan_quality.py) feeding min-label-propagation connected
    components.  ``dedup_clusters`` is the declared operator twin at 12
    tables (higher recall); this entry pins the 8-table primitive so both
    recall settings hold green oracle rows."""
    from lvm_datapipe_spark.operators import similarity as V
    from lvm_datapipe_spark.operators.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4)
    return connected_components(pairs)


# ---------------------------------------------------------------------------
# Temporal joins: as-of and range (extension operators, operators/asof.py)
# ---------------------------------------------------------------------------


@_q(
    "asof_last_view_before_purchase",
    """
    WITH v AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view'),
         p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT event_id, user_id, ts, last_view_id, last_view_value FROM (
      SELECT p.event_id, p.user_id, p.ts,
             v.event_id AS last_view_id, v.value AS last_view_value,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                  ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts)
    WHERE rn = 1
    """,
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join via the union+window plan (linear, one shuffle) —
    the oracle states the same semantics as a join-then-rank, which is only
    viable at oracle scale."""
    from lvm_datapipe_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("last_view_id"),
        F.col("value").alias("last_view_value"),
    )
    out = asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["last_view_id", "last_view_value"],
        tie_col="last_view_id",
    )
    return out.filter(F.col("last_view_id").isNotNull())


@_q(
    "range_join_first_day_events",
    """
    WITH iv AS (SELECT user_id, MIN(ts) AS start_ts,
                       MIN(ts) + INTERVAL 1 DAY AS end_ts
                FROM events GROUP BY user_id)
    SELECT e.user_id, COUNT(*) AS n_first_day
    FROM events e JOIN iv ON e.user_id = iv.user_id
     AND e.ts >= iv.start_ts AND e.ts <= iv.end_ts
    GROUP BY e.user_id
    """,
)
def range_join_first_day_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (equi-keyed on user → hash join with range
    residual, the clip→frame-span shape of macvid.py:21)."""
    from lvm_datapipe_spark.operators.asof import range_join

    ev = load_table(spark, sf_dir, "events")
    intervals = ev.groupBy("user_id").agg(
        F.min("ts").alias("start_ts"),
        (F.min("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
    )
    joined = range_join(
        ev.select("user_id", "ts"), intervals, "user_id", "ts", "start_ts", "end_ts"
    )
    return joined.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_first_day"))


# ---------------------------------------------------------------------------
# Grouping-set aggregates + distinct aggregation (free in Catalyst; exposed
# per SURVEY.md §2.4's note — the reference has none of these)
# ---------------------------------------------------------------------------


@_q(
    "agg_rollup",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), A.decimal_sum("l_quantity").alias("sum_qty")
    )


@_q(
    "agg_cube",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), A.decimal_sum("l_quantity").alias("sum_qty")
    )


@_q(
    "agg_distinct_count",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# C2/C3/C5 string-function coverage on synthesized path/caption columns
# ---------------------------------------------------------------------------


@_q(
    "c2_path_functions",
    r"""
    WITH p AS (SELECT doc_id,
                      'data/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.Mp4' AS path
               FROM documents)
    SELECT doc_id,
           string_split(path, '/')[-1] AS base,
           regexp_replace(path, '/[^/]*$', '') AS dir,
           lower(string_split(path, '.')[-1]) AS ext,
           regexp_replace(string_split(path, '/')[-1], '\.[^.]*$', '') AS stem
    FROM p
    """,
)
def c2_path_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("data/"), F.col("source"), F.lit("/doc_"), F.col("doc_id"), F.lit(".Mp4")
    )
    return docs.select(
        "doc_id",
        S.path_basename(path).alias("base"),
        S.path_dirname(path).alias("dir"),
        S.file_extension(path).alias("ext"),
        S.file_stem(path).alias("stem"),
    )


@_q(
    "c5_clean_caption",
    """
    SELECT p_partkey,
           trim(replace(split_part('<start_of_text>a ' || p_name || ' scene <end_of_text>junk',
                '<end_of_text>', 1), '<start_of_text>', '')) AS caption
    FROM part
    """,
)
def c5_clean_caption(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    raw = F.concat(
        F.lit("<start_of_text>a "), F.col("p_name"), F.lit(" scene <end_of_text>junk")
    )
    return part.select("p_partkey", S.clean_caption(raw).alias("caption"))


@_q(
    "c9_frame_indices",
    """
    WITH n AS (SELECT l_orderkey, l_linenumber,
                      CAST(l_quantity * 10 AS INTEGER) AS frame_count
               FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           array_to_string([CAST(floor(frame_count * 0.2) AS INTEGER),
            CAST(floor(frame_count * 0.5) AS INTEGER),
            CAST(floor(frame_count * 0.8) AS INTEGER)], ',') AS key_frames_csv
    FROM n
    """,
)
def c9_frame_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-frame index math (C9).  Declared form projects the index array to
    a ','-joined string so the driver's pandas canonicalizer can hash it;
    `S.frame_indices_at_fractions` remains the array-valued API."""
    li = load_table(spark, sf_dir, "lineitem")
    n = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") * 10).cast("int").alias("frame_count"),
    )
    return n.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(
            S.frame_indices_at_fractions("frame_count", [0.2, 0.5, 0.8]), ","
        ).alias("key_frames_csv"),
    )


# ---------------------------------------------------------------------------
# BPE-ish regex token counting + rolling-hash (winnowing) fingerprints
# ---------------------------------------------------------------------------

# ASCII-only classes so Java regex (Spark) and RE2 (DuckDB) agree exactly
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@_q(
    "text_bpe_token_count",
    rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS INTEGER) AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex (letter runs | digit runs |
    single punctuation) — the pre-tokenizer shape of GPT-2-style BPE,
    restricted to ASCII classes so both engines' regex dialects agree."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


@_q(
    "text_winnow_fingerprint",
    r"""
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
      FROM documents),
    wins AS (
      SELECT doc_id, md5(substr(t, w.i, 16)) AS wh
      FROM norm CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, greatest(length(t) - 15, 1))) AS i) w)
    SELECT doc_id, MIN(wh) AS winnow_fp, COUNT(*) AS n_windows
    FROM wins GROUP BY doc_id
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via rolling k-char window hashes (winnowing
    signature = min window hash): normalize → hash every 16-char window →
    min per doc.  Row-shaped (posexplode of window starts → flat md5 →
    groupBy MIN with map-side partial aggregation)."""
    docs = load_table(spark, sf_dir, "documents")
    k = 16
    norm = docs.select(
        "doc_id",
        F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("t"),
    )
    starts = norm.select(
        "doc_id",
        F.col("t"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("t") - (k - 1), F.lit(1)))
        ).alias("i"),
    )
    hashed = starts.select(
        "doc_id", F.md5(F.substring(F.col("t"), F.col("i").cast("int"), k).cast("binary")).alias("wh")
    )
    return hashed.groupBy("doc_id").agg(
        F.min("wh").alias("winnow_fp"), F.count(F.lit(1)).alias("n_windows")
    )


_SQL_LTOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"


@_q(
    "text_normalize",
    r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 \t\n\r\f]', '', 'g'),
                '[ \t\n\r\f]+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization chain (lower → ASCII class strip → whitespace
    collapse) as one codegen'd projection — the step every downstream dedup
    or fingerprint consumes."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.normalize_text("text").alias("norm_text"))


@_q(
    "vocab_top_tokens",
    f"""
    WITH tok AS (SELECT unnest({_SQL_LTOKS}) AS token FROM documents)
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM tok GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: corpus token frequencies → top 50.  Zipf-skewed
    keys are absorbed by map-side partial aggregation (one partial row per
    distinct token per task), then TakeOrdered — no global sort."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    freq = X.token_frequencies(docs)
    return R.top_k(freq, [F.desc("n"), F.asc("token")], 50)


@_q(
    "vocab_stats",
    f"""
    WITH tok AS (SELECT unnest({_SQL_LTOKS}) AS token FROM documents),
    freq AS (SELECT token, count(*) AS n FROM tok GROUP BY token)
    SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           count(*) / CAST(sum(n) AS DOUBLE) AS type_token_ratio
    FROM freq
    """,
)
def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row vocabulary summary (total tokens, vocab size, type-token
    ratio) over the shared token-frequency shuffle."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return X.vocab_stats(docs)


# ---------------------------------------------------------------------------
# Additional relational coverage: Q3 shape, semi join, cumulative window,
# JSON extraction (C14 on real data)
# ---------------------------------------------------------------------------


@_q(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → joins → aggregate → top-k.
    The segment filter broadcasts a pruned customer set, so only matching
    orders/lineitems survive the probe side."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            A.decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )
    return R.top_k(
        joined.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"),
        [F.desc("revenue"), F.asc("l_orderkey")],
        10,
    )


@_q(
    "semi_join_high_value_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 90000.0)
    """,
)
def semi_join_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — the EXISTS dual of the F2 anti-join."""
    orders = load_table(spark, sf_dir, "orders")
    big = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 90000.0)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return orders.join(big, "o_orderkey", "left_semi").select("o_orderkey", "o_totalprice")


@_q(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-table join with a LOCAL-supplier equi-condition
    (customer and supplier share a nation).  Fact-fact joins shuffle on
    their keys; nation/region broadcast; the date filter pushes to the
    orders scan so only one year of the fact table survives."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            A.decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@_q(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter —
    selective fact filters, customer-side enrichment, top-k with a unique
    tie-break so the LIMIT is deterministic on both engines."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            A.decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    return R.top_k(agg, [F.desc("revenue"), F.asc("c_custkey")], 20)


@_q(
    "w4_running_total",
    f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def w4_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window aggregate (running per-customer spend).  Decimal
    accumulation inside the frame keeps every prefix sum bit-identical to
    the oracle regardless of physical ordering."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(27,6)")).over(w).cast("double").alias("running_total"),
    )


@_q(
    "c14_json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
    FROM events
    """,
)
def c14_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 — embedded-JSON parsing on the events ``props`` column (the
    reference round-trips records through json.load/dump everywhere; here a
    native JSON path expression, no Python)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


# ---------------------------------------------------------------------------
# Hypertable-style continuous aggregate: one pass, multiple time
# granularities via GROUPING SETS (the TimescaleDB rollup shape)
# ---------------------------------------------------------------------------


@_q(
    "hypertable_rollup",
    f"""
    WITH b AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 day', ts) AS day_bucket,
             time_bucket(INTERVAL '1 hour', ts) AS hour_bucket,
             value
      FROM events)
    SELECT event_type, day_bucket, hour_bucket,
           COUNT(*) AS n, {_dsum('value')} AS total_value
    FROM b
    GROUP BY GROUPING SETS ((event_type, day_bucket),
                            (event_type, day_bucket, hour_bucket))
    """,
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup in ONE aggregation pass: hour- and
    day-level rows produced together via GROUPING SETS (hour rows carry the
    day bucket; day rows have hour_bucket NULL).  At scale this replaces N
    separate scans with one — the continuous-aggregate/hypertable pattern.
    """
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_events_rollup_src")
    return spark.sql(
        """
        WITH b AS (
          SELECT event_type,
                 date_trunc('DAY', ts) AS day_bucket,
                 date_trunc('HOUR', ts) AS hour_bucket,
                 value
          FROM _events_rollup_src)
        SELECT event_type, day_bucket, hour_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
        FROM b
        GROUP BY GROUPING SETS ((event_type, day_bucket),
                                (event_type, day_bucket, hour_bucket))
        """
    )


# Approximate distinct (HLL) — engine-specific sketches can't hash-match an
# oracle; rows-only check + the exact dual (agg_distinct_count) is oracle-
# checked above.
@_q("approx_distinct_users")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


# IVF ANN scale path (k-means coarse quantizer + cell probing). Clustering-
# dependent → rows-only check; tests/test_dedup_similarity asserts recall vs
# the exact baseline and probe-all == exact.
@_q("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4)


def _ivf_fixed_sql(
    n_cells: int = 16, n_probe: int = 4, k: int = 10, seed: int = 42, dim: int = _EMB_DIM
) -> str:
    """DuckDB replay of the fixed-quantizer IVF: centroid literals from the
    same seeded draw, first-index argmax cell assignment (list_indexof of
    list_max = array_position of array_max), probe ranking and final cosine
    ranking with identical tie-breaks."""
    from lvm_datapipe_spark.operators.similarity import ivf_fixed_centroids

    cents = ivf_fixed_centroids(n_cells, dim, seed)

    def cos_lit(v: str, c) -> str:
        dot_vc = " + ".join(
            f"{v}[{i + 1}]*('{float(c[i])!r}'::DOUBLE)" for i in range(dim)
        )
        dot_cc = sum(float(x) * float(x) for x in c)
        return f"(({dot_vc}) / (sqrt({_dot_sql(v, v)}) * sqrt('{dot_cc!r}'::DOUBLE)))"

    sims = lambda v: "[" + ", ".join(cos_lit(v, c) for c in cents) + "]"  # noqa: E731
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT vec_id AS neighbor_id, v AS nv, {sims('v')} AS sims FROM e),
    c AS (SELECT neighbor_id, nv,
                 CAST(list_indexof(sims, list_max(sims)) - 1 AS INTEGER) AS cell
          FROM c0),
    q0 AS (SELECT vec_id AS query_id, v AS qv, {sims('v')} AS sims
           FROM e WHERE vec_id < 10),
    qs AS (SELECT query_id, qv, u.i AS cell, sims[u.i + 1] AS cell_sim
           FROM q0 CROSS JOIN (SELECT unnest(generate_series(0, {n_cells - 1})) AS i) u),
    probe AS (
      SELECT query_id, qv, cell FROM (
        SELECT query_id, qv, cell,
               ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cell_sim DESC, cell) AS rn
        FROM qs) WHERE rn <= {n_probe}),
    cand AS (
      SELECT p.query_id, c.neighbor_id, {_cos_sql('p.qv', 'c.nv')} AS cos_sim
      FROM probe p JOIN c ON c.cell = p.cell AND c.neighbor_id <> p.query_id)
    SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
    FROM cand
    QUALIFY rank <= {k}
    """


# Fixed-quantizer IVF: deterministic centroid literals make the whole
# pipeline (cell argmax, probe ranking, final cosine rank) SQL-replayable —
# the oracle-checked counterpart of the k-means ivf_topk above.
@_q("ann_ivf_fixed_topk", _ivf_fixed_sql())
def ann_ivf_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lvm_datapipe_spark.operators.similarity import ivf_fixed_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_fixed_topk(emb, queries, k=10, n_cells=16, n_probe=4)


@_q(
    "f6_training_pairs",
    """
    SELECT text AS caption, 'docs/' || CAST(doc_id AS VARCHAR) || '.txt' AS clip_path
    FROM documents WHERE lang = 'en'
    """,
)
def f6_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F7 — the (caption, path) training-pair projection
    (macvid.py:183-190): a pure column-pruned select; the scan reads only
    the two referenced columns."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("lang") == "en").select(
        F.col("text").alias("caption"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias(
            "clip_path"
        ),
    )


@_q(
    "agg_pivot",
    """
    SELECT date_trunc('DAY', ts) AS day,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-day event counts spread into one column per type.  With
    the value list given explicitly, Spark skips the distinct-values
    pre-scan — one aggregation pass (matters when the pivot source is
    billions of rows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_trunc("DAY", F.col("ts")))
        .groupBy("day")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0, ["click", "error", "purchase", "signup", "view"])
    )


@_q(
    "agg_collect_set",
    """
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses_csv
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collecting aggregation: distinct values gathered, sorted, and joined
    into a CSV string.  Sorting makes the result deterministic —
    collect_set's native order is partition-dependent.  The declared query
    is string-only because the driver's pandas canonicalizer cannot hash
    list cells (array form: F.sort_array(F.collect_set(...)))."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus"))).alias("statuses_csv"),
    )


@_q(
    "time_functions",
    """
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
           CAST(isodow(ts) - 1 AS INTEGER) AS weekday,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction: hour-of-day and weekday (Monday=0, the one
    numbering Spark's weekday() and DuckDB's isodow-1 agree on — dayofweek
    uses different conventions per engine)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.hour("ts").alias("hour_of_day"), F.weekday("ts").alias("weekday")
    ).agg(F.count(F.lit(1)).alias("n"))


@_q(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5) AS median,
           quantile_cont(l_extendedprice, 0.9) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (verified bit-identical to DuckDB's
    quantile_cont — both linear-interpolate on the sorted values)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
    )


@_q(
    "set_intersect",
    """
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics): orders containing both returned
    and non-returned items."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    n = li.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    return r.intersect(n)


@_q(
    "split_train_val_test",
    """
    WITH b AS (
      SELECT doc_id,
             ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM documents)
    SELECT doc_id,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split keyed on a content hash of doc_id —
    reproducible across engines, repartitions, and re-runs (operators/
    sampling.py); the oracle replays the identical md5-bucket arithmetic."""
    from lvm_datapipe_spark.operators.sampling import split_assign

    docs = load_table(spark, sf_dir, "documents")
    return split_assign(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@_q(
    "sample_stratified",
    """
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('strata' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM documents)
    SELECT doc_id, lang FROM b
    WHERE bucket < (CASE WHEN lang = 'en' THEN 2000 ELSE 10000 END)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language rebalancing: deterministically keep 20% of English docs and
    100% of everything else — the stable per-stratum downsampling a
    multilingual training-corpus build uses.  Membership is a pure function of
    doc_id, so the sample never changes under repartitioning."""
    from lvm_datapipe_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", "doc_id", {"en": 0.2}, default_fraction=1.0
    ).select("doc_id", "lang")


@_q(
    "text_repetition",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, len(toks) AS words_total,
             len(list_distinct(toks)) AS words_distinct, toks
      FROM t WHERE len(toks) >= 2),
    g AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM s),
    gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
    a AS (
      SELECT doc_id, max(c) AS top_c, sum(c) AS total_g,
             sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_g
      FROM gc GROUP BY doc_id)
    SELECT s.doc_id, words_total,
           1.0 - words_distinct::DOUBLE / words_total AS word_rep_ratio,
           top_c::DOUBLE / total_g AS top_ngram_frac,
           dup_g::DOUBLE / total_g AS dup_ngram_frac
    FROM s JOIN a ON s.doc_id = a.doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality metrics (boilerplate/template detection):
    word repetition ratio, top-bigram fraction, duplicate-bigram fraction
    per document (operators/text.py::repetition_features)."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return X.repetition_features(docs)


@_q(
    "pack_sequences_by_lang",
    """
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
             (sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING))::BIGINT - n_tokens AS start_offset
      FROM t)
    SELECT doc_id, lang, n_tokens, start_offset,
           start_offset // 512 AS pack_id,
           start_offset % 512 AS pack_offset,
           CASE WHEN n_tokens = 0 THEN 1
                ELSE (start_offset + n_tokens - 1) // 512 - start_offset // 512 + 1
           END AS n_packs
    FROM c
    """,
)
def pack_sequences_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing into 512-token windows, sharded by lang
    (operators/packing.py): each document's window id, offset, and span
    count — the layout step between a curated corpus and a training run.
    Window cumsum per shard; the oracle replays it as a SQL window query."""
    from lvm_datapipe_spark.operators.packing import pack_sequences
    from lvm_datapipe_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", "lang", token_count("text").cast("long").alias("n_tokens"))
    return pack_sequences(
        sized, "n_tokens", order_col="doc_id", shard_col="lang", ctx_len=512
    ).select(
        "doc_id", "lang", "n_tokens", "start_offset", "pack_id", "pack_offset", "n_packs"
    )


@_q(
    "text_scrub",
    """
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
             substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@example.com or https://site' || CAST(doc_id AS VARCHAR)
               || '.example/page?id=' || CAST(doc_id AS VARCHAR)
               || ' tel +1 (415) 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'),
             'https?://[^\\s]+', '<URL>', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed
    FROM documents
    """,
)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/link scrubbing (operators/text.py::scrub_text): the corpus text
    is decorated with synthetic deterministic PII (email, URL, phone derived
    from doc_id) and redacted with typed placeholders; both engines run the
    identical pattern chain, so the redacted text hash-matches."""
    from lvm_datapipe_spark.operators.text import scrub_text

    docs = load_table(spark, sf_dir, "documents")
    decorated = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or https://site"), F.col("doc_id").cast("string"),
        F.lit(".example/page?id="), F.col("doc_id").cast("string"),
        F.lit(" tel +1 (415) 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    return docs.select("doc_id", scrub_text(decorated).alias("scrubbed"))


@_q(
    "split_leakage_safe",
    f"""
    WITH RECURSIVE pairs AS ({_lsh_near_dup_sql()}),
    edges AS (SELECT id_a AS u, id_b AS w FROM pairs
              UNION SELECT id_b AS u, id_a AS w FROM pairs),
    reach AS (SELECT u, w FROM edges
              UNION SELECT r.u AS u, e2.w AS w
              FROM reach r JOIN edges e2 ON r.w = e2.u),
    cc AS (SELECT u AS id, least(u, min(w)) AS cluster_id FROM reach GROUP BY u),
    keyed AS (
      SELECT e.vec_id, coalesce(cc.cluster_id, e.vec_id) AS skey
      FROM embeddings e LEFT JOIN cc ON cc.id = e.vec_id),
    b AS (
      SELECT vec_id,
             ('0x' || substr(md5('split' || CAST(skey AS VARCHAR)), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM keyed)
    SELECT vec_id,
           CASE WHEN bucket < 9000 THEN 'train' ELSE 'holdout' END AS split
    FROM b
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/holdout split: the split key is the near-dup
    CLUSTER representative, not the row id, so near-duplicates can never
    straddle the holdout boundary (the classic eval-leakage bug).  Composes
    connected components (operators/graph.py) with the deterministic hash
    split (operators/sampling.py); rows with no near-dup key on their own
    id.  Pair source is the LSH scale path since r5 (one keyed shuffle —
    the quadratic all-pairs source is a pytest-only recall oracle)."""
    from lvm_datapipe_spark.operators import similarity as V
    from lvm_datapipe_spark.operators.graph import connected_components
    from lvm_datapipe_spark.operators.sampling import split_assign

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4)
    cc = connected_components(pairs)
    keyed = emb.join(
        cc.withColumnRenamed("id", "vec_id"), "vec_id", "left"
    ).select(
        "vec_id", F.coalesce("cluster_id", "vec_id").alias("skey")
    )
    return split_assign(keyed, "skey", {"train": 0.9, "holdout": 0.1}).select(
        "vec_id", "split"
    )


@_q(
    "decontaminate_overlap",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      FROM documents),
    s AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(generate_series(1, len(toks) - 4),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                         || toks[i+3] || ' ' || toks[i+4]))) AS shingle
      FROM t WHERE len(toks) >= 5)
    SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_common
    FROM s c JOIN s b ON c.shingle = b.shingle
    WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
    GROUP BY c.doc_id, b.doc_id
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontaminate.py): flag training
    docs sharing exact word 5-grams with the held-out eval slice (every 10th
    doc plays the benchmark).  The benchmark shingle table broadcasts, so
    the check is one corpus scan with map-side hash probes — no corpus
    shuffle."""
    from lvm_datapipe_spark.operators.decontaminate import contamination_pairs

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contamination_pairs(corpus, bench, n=5, min_common=1)


@_q(
    "sample_k_per_lang",
    """
    SELECT doc_id, lang FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY lang
      ORDER BY md5('topk' || CAST(doc_id AS VARCHAR)), doc_id) <= 20
    """,
)
def sample_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced subset curation: exactly 20 deterministically-chosen docs
    per language (operators/sampling.py::sample_k_per_group — hash-ranked,
    WindowGroupLimit plan, stable under repartitioning)."""
    from lvm_datapipe_spark.operators.sampling import sample_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    return sample_k_per_group(docs, "lang", "doc_id", 20).select("doc_id", "lang")


@_q(
    "embedding_quantize",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
          FROM e)
    SELECT vec_id, scale,
           CASE WHEN scale = 0
                THEN array_to_string(list_transform(v, x -> 0), ',')
                ELSE array_to_string(list_transform(v, x ->
                  CAST(least(greatest(floor(x / scale + 0.5), -127.0), 127.0) AS INTEGER)), ',')
           END AS q_csv
    FROM s
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the 4×
    storage format a 100 TB vector corpus persists (operators/similarity.py::
    quantize_embeddings).  floor(x+0.5) instead of round() keeps every step
    bit-portable across engines; codes projected to CSV for the hash gate."""
    from lvm_datapipe_spark.operators.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    return q.select(
        "vec_id",
        "scale",
        F.concat_ws(",", F.transform(F.col("q"), lambda x: x.cast("string"))).alias(
            "q_csv"
        ),
    )


@_q(
    "events_enriched",
    """
    SELECT e.event_id, e.event_type, e.value, c.c_mktsegment, c.c_acctbal
    FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join (streaming/events.py::
    enrich_stream — broadcast dim, no state, identical plan in both modes;
    the stream≡batch property is tested in tests/test_streaming.py)."""
    from lvm_datapipe_spark.streaming.events import enrich_stream

    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return enrich_stream(events, cust).select(
        "event_id", "event_type", "value", "c_mktsegment", "c_acctbal"
    )


@_q(
    "snapshot_diff_docs",
    """
    WITH old AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 11 <> 0),
    new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [edited]' ELSE text END) AS fp
      FROM documents WHERE doc_id % 13 <> 0)
    SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.fp IS NULL THEN 'added'
                WHEN new.fp IS NULL THEN 'removed'
                WHEN old.fp <> new.fp THEN 'modified'
                ELSE 'unchanged' END AS status
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
)
def snapshot_diff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot diff (operators/relational.py::snapshot_diff):
    two deterministic views of the documents table play consecutive corpus
    snapshots (every 11th doc absent from the old, every 13th from the new,
    every 7th edited in the new); the diff labels each doc added/removed/
    modified/unchanged by md5 fingerprint."""
    from lvm_datapipe_spark.operators.relational import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fingerprint")
    )
    new = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
            ).otherwise(F.col("text")).cast("binary")
        ).alias("fingerprint"),
    )
    return snapshot_diff(old, new)


@_q(
    "quality_gate_tokens",
    """
    WITH tc AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens
      FROM documents),
    thr AS (SELECT quantile_cont(n_tokens, 0.1) AS p10 FROM tc)
    SELECT doc_id, n_tokens FROM tc, thr WHERE n_tokens >= p10
    """,
)
def quality_gate_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-threshold quality gating: drop the shortest decile of the
    corpus.  The pattern at scale: aggregate ONE scalar (exact interpolated
    percentile), broadcast it, filter in a map-side probe — one corpus
    aggregate + one scan, no per-row shuffle.  percentile/quantile_cont are
    bit-identical linear interpolations in both engines."""
    from lvm_datapipe_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    tc = docs.select("doc_id", token_count("text").cast("long").alias("n_tokens"))
    thr = tc.agg(F.expr("percentile(n_tokens, 0.1)").alias("p10"))
    return (
        tc.crossJoin(F.broadcast(thr))
        .filter(F.col("n_tokens") >= F.col("p10"))
        .select("doc_id", "n_tokens")
    )


@_q(
    "events_sliding_window",
    f"""
    WITH g AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '30 minutes', ts) AS grid
      FROM events),
    x AS (
      SELECT event_type, value, grid - k.k * INTERVAL '30 minutes' AS window_start
      FROM g CROSS JOIN (SELECT unnest([0, 1]) AS k) k)
    SELECT window_start, event_type,
           COUNT(*) AS n, {_dsum('value')} AS total_value
    FROM x GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (1-hour window, 30-minute slide): every
    event lands in exactly window/slide = 2 overlapping windows.  Spark's
    F.window(slideDuration=...) expands the windows natively (same plan in
    batch and streaming); the oracle replays the expansion as an explicit
    2-offset cross join on the slide grid."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), A.decimal_sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@_q(
    "stream_interval_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
           v.event_id AS view_id, v.ts AS view_ts, v.value AS view_value
    FROM events p JOIN events v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (attribution: views in
    the hour before each purchase, same user).  The identical expression
    runs unbounded with watermarked state eviction
    (streaming/events.py::interval_join_views_purchases); here it is the
    oracle-checked form.  The equi-key (user_id) makes it a keyed
    sort-merge/hash join with the range as a residual filter — no
    cartesian."""
    from lvm_datapipe_spark.streaming.events import interval_join_views_purchases

    ev = load_table(spark, sf_dir, "events")
    out = interval_join_views_purchases(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    # match the source timestamp flavor (see stream_sink_tumbling_window)
    from pyspark.sql import types as T

    if isinstance(ev.schema["ts"].dataType, T.TimestampNTZType):
        out = out.withColumn(
            "purchase_ts", F.col("purchase_ts").cast("timestamp_ntz")
        ).withColumn("view_ts", F.col("view_ts").cast("timestamp_ntz"))
    return out


@_q(
    "asof_next_purchase_after_view",
    """
    WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
         p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT event_id, user_id, ts, next_purchase_id, next_purchase_value FROM (
      SELECT v.event_id, v.user_id, v.ts,
             p.event_id AS next_purchase_id, p.value AS next_purchase_value,
             ROW_NUMBER() OVER (PARTITION BY v.event_id
                  ORDER BY p.ts ASC, p.event_id ASC) AS rn
      FROM v JOIN p ON p.user_id = v.user_id AND p.ts >= v.ts)
    WHERE rn = 1
    """,
)
def asof_next_purchase_after_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (time-to-conversion: the first purchase at or
    after each view, per user) — same single union+window shuffle as the
    backward form, frame flipped to currentRow..unboundedFollowing."""
    from lvm_datapipe_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("next_purchase_id"),
        F.col("value").alias("next_purchase_value"),
    )
    out = asof_join(
        views,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["next_purchase_id", "next_purchase_value"],
        tie_col="next_purchase_id",
        direction="forward",
    )
    return out.filter(F.col("next_purchase_id").isNotNull())


@_pytest_q(
    "w5_quality_deciles",
    """
    WITH t AS (SELECT doc_id, lang, n_chars,
                      NTILE(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
               FROM documents)
    SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM t GROUP BY decile
    """,
)
def w5_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stratification: NTILE deciles over a quality proxy, then
    per-stratum stats — the 'keep the top-k% of the corpus' primitive.
    DEMOTED to a pytest-only semantics oracle in r6 (VERDICT r5 item 4):
    the global NTILE is an Exchange-SinglePartition window — every corpus
    row funnels through ONE reducer, the canonical scale-killer.  The
    DECLARED decile query is the scale-safe twin ``w5_deciles_bucketed``
    (one percentile aggregate broadcast + comparison ladder, no Window);
    this form stays here only to pin exact NTILE semantics against DuckDB
    at test scale."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    t = docs.select("doc_id", F.ntile(10).over(w).alias("decile"), "n_chars")
    return t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_DECILE_PS = [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]


@_q(
    "w5_deciles_bucketed",
    f"""
    WITH q AS (SELECT quantile_cont(n_chars, {_DECILE_PS}) AS t FROM documents),
    b AS (SELECT d.doc_id, d.n_chars,
                 1 + {' + '.join(f'(CASE WHEN d.n_chars < t[{i + 1}] THEN 1 ELSE 0 END)' for i in range(9))} AS decile
          FROM documents d CROSS JOIN q)
    SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM b GROUP BY decile
    """,
)
def w5_deciles_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE decile twin of ``w5_quality_deciles``: decile
    boundaries come from ONE exact-percentile aggregate (map-side partials →
    a single 9-double row), broadcast back over the corpus, and assignment
    is a literal comparison ladder — no global NTILE, no SinglePartition
    window anywhere (plan-asserted).  Deciles differ from NTILE only at tie
    boundaries (equal n_chars land in the same bucket here; NTILE splits
    them to equalize counts), which is the semantics a 100 TB stratification
    actually wants.  Spark's exact ``percentile`` and DuckDB's
    ``quantile_cont`` share the linear-interpolation definition, so the
    boundary doubles are bit-identical (verified at sf0.01)."""
    docs = load_table(spark, sf_dir, "documents")
    th = docs.agg(F.percentile("n_chars", F.lit(_DECILE_PS)).alias("t"))
    decile = F.lit(1)
    for i in range(9):
        decile = decile + (F.col("n_chars") < F.element_at("t", i + 1)).cast("int")
    b = docs.crossJoin(F.broadcast(th)).select(
        "doc_id", "n_chars", decile.alias("decile")
    )
    return b.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@_q(
    "agg_grouping_sets",
    f"""
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), (lang, source))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-lang, per-source,
    and per-(lang,source) aggregates in ONE pass — Spark's Expand operator
    replays each input row once per set, so it is a single scan + one
    shuffle, not three queries."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupingSets(
            [["lang"], ["source"], ["lang", "source"]], "lang", "source"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
    )


@_q(
    "tfidf_top_terms",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_LTOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    s AS (SELECT tf.doc_id, tf.token,
                 CAST(tf.tf * n.n_docs AS DOUBLE) / dft.df AS tfidf
          FROM tf JOIN dft USING (token) CROSS JOIN n)
    SELECT doc_id, token, tfidf FROM (
      SELECT s.*, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, token) AS rn FROM s)
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 salient terms by tf·idf with a LINEAR idf
    (tf·N/df): no log(), so the score is two exact integer ops and one
    division — bit-identical across engines, which a log-based idf is not
    guaranteed to be.  Shape: (doc,token) count, token df (map-side partial
    both), broadcast scalar N, one doc-keyed window."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(X.tokens(F.lower(F.col("text")))).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    s = (
        tf.join(dft, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tfidf")
    )


@_q(
    "skew_salted_event_stats",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           {_dsum('value')} AS total_value
    FROM events GROUP BY event_type
    """,
)
def skew_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a LOW-CARDINALITY hot key (5 event
    types over the whole table — every group is a hot key): phase 1
    aggregates on (key, salt) so each reducer takes 1/16th of a group,
    phase 2 merges partials per key.  Decimal accumulation keeps the
    re-aggregated sum bit-identical to the single-phase oracle."""
    from lvm_datapipe_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    aggs = [
        (F.count(F.lit(1)), lambda c: F.sum(c).cast("bigint"), "n"),
        (
            F.sum(F.col("value").cast("decimal(27,6)")),
            lambda c: F.sum(c).cast("double"),
            "total_value",
        ),
    ]
    return salted_aggregate(ev, "event_type", aggs)


@_q(
    "decontaminate_substring",
    r"""
    WITH norm AS (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g')) AS t
                  FROM documents),
    bench AS (SELECT doc_id AS bench_id, substr(t, 1, 30) AS snip
              FROM norm WHERE doc_id % 10 = 0 AND length(t) >= 30),
    corpus AS (SELECT doc_id, t FROM norm WHERE doc_id % 10 <> 0)
    SELECT c.doc_id, b.bench_id
    FROM corpus c JOIN bench b ON position(b.snip IN c.t) > 0
    """,
)
def decontaminate_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination (the verbatim-leak check next to the
    n-gram overlap mode): broadcast benchmark snippets probed with instr
    over one corpus scan."""
    from lvm_datapipe_spark.operators.decontaminate import contamination_substring

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contamination_substring(corpus, bench, snippet_len=30)


@_q(
    "w6_rolling_hour_value",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (
                PARTITION BY user_id
                ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS hour_value
    FROM events
    """,
)
def w6_rolling_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (vs w4's ROWS frame): per-user value sum over the
    trailing hour BY EVENT TIME — frame membership is a time distance, not a
    row count, so bursts and gaps are handled correctly.  Same-second rows
    are frame peers on both engines (epoch FLOORED to seconds — Spark's
    timestamp→long cast floors, while DuckDB's double→bigint cast rounds,
    so the oracle floors explicitly; caught at sf0.1 where fractional
    seconds land near frame boundaries).  One keyed window shuffle; decimal
    accumulation keeps the frame sums bit-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("hour_value"),
    )


@_q(
    "pipeline_curate",
    f"""
    WITH fp AS (
      SELECT doc_id, lang, text,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
      FROM documents),
    kept AS (
      SELECT doc_id, lang, text FROM (
        SELECT fp.*, min(doc_id) OVER (PARTITION BY f) AS keeper FROM fp)
      WHERE doc_id = keeper),
    scored AS (
      SELECT doc_id, lang,
             CAST(len({_SQL_TOKS}) AS INTEGER) AS n_tokens
      FROM kept),
    gated AS (SELECT * FROM scored WHERE n_tokens >= 20),
    b AS (
      SELECT gated.*,
             ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM gated)
    SELECT doc_id, lang, n_tokens,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline a real corpus run composes, as ONE
    declared query with a full SQL oracle: exact dedup (md5 fingerprint,
    keep min doc_id) → quality gate (token floor) → deterministic md5-bucket
    split.  Every stage reuses an oracle-checked operator; the composition
    is one scan + one fingerprint-keyed window + narrow projections — no
    extra shuffles beyond the dedup itself."""
    from lvm_datapipe_spark.operators import text as X
    from lvm_datapipe_spark.operators.sampling import split_assign

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "lang", "text", X.fingerprint("text").alias("f")
    )
    w = Window.partitionBy("f")
    kept = (
        fp.withColumn("keeper", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("keeper", "f")
    )
    scored = kept.select(
        "doc_id", "lang", X.token_count("text").alias("n_tokens")
    )
    gated = scored.filter(F.col("n_tokens") >= 20)
    return split_assign(
        gated, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "lang", "n_tokens", "split")


@_q(
    "sample_weighted",
    """
    WITH w AS (
      SELECT doc_id, lang, n_chars,
             least(n_chars / 400.0, 1.0) AS keep_p,
             ('0x' || substr(md5('wsample' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM documents)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM w WHERE bucket < keep_p * 10000
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling: per-row keep probability derived
    from a quality proxy (longer docs upweighted, capped at 1.0); the keep
    decision is a pure hash function of the key — shuffle-free, stable
    under repartition, engine-replayable."""
    from lvm_datapipe_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "keep_p", F.least(F.col("n_chars") / 400.0, F.lit(1.0))
    )
    return weighted_sample(docs, "doc_id", "keep_p").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


@_q(
    "w7_rank_functions",
    """
    SELECT doc_id, lang,
           rank() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
             AS rnk,
           dense_rank() OVER (PARTITION BY lang ORDER BY n_chars DESC)
             AS drnk,
           CAST(percent_rank() OVER (PARTITION BY lang
                ORDER BY n_chars DESC, doc_id) AS DOUBLE) AS prank,
           CAST(cume_dist() OVER (PARTITION BY lang
                ORDER BY n_chars DESC, doc_id) AS DOUBLE) AS cdist
    FROM documents
    """,
)
def w7_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-function window family (rank / dense_rank / percent_rank /
    cume_dist) in one keyed window pass — corpus percentile labeling
    without a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wd = Window.partitionBy("lang").orderBy(F.desc("n_chars"))
    return docs.select(
        "doc_id",
        "lang",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(wd).alias("drnk"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@_q(
    "unpivot_doc_metrics",
    """
    SELECT doc_id, metric, value FROM (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) AS chars,
             CAST(length(text) AS DOUBLE) AS actual_chars,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                  x -> x <> '')) AS DOUBLE) AS tokens
      FROM documents)
    UNPIVOT (value FOR metric IN (chars, actual_chars, tokens))
    """,
)
def unpivot_doc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of agg_pivot): wide per-doc metrics to
    long (doc_id, metric, value) — a narrow Expand, no shuffle."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    wide = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("chars"),
        F.length("text").cast("double").alias("actual_chars"),
        X.token_count("text").cast("double").alias("tokens"),
    )
    return wide.unpivot(
        "doc_id", ["chars", "actual_chars", "tokens"], "metric", "value"
    )


@_q(
    "stream_interval_join_outer",
    """
    SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
           v.event_id AS view_id, v.ts AS view_ts, v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval join: every purchase, with nulls where no view
    fell in the lookback — the attribution report that also counts
    unattributed conversions.  Streaming form emits the null rows once the
    watermark proves no future view can match."""
    from pyspark.sql import types as T

    from lvm_datapipe_spark.streaming.events import interval_join_views_purchases

    ev = load_table(spark, sf_dir, "events")
    out = interval_join_views_purchases(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    if isinstance(ev.schema["ts"].dataType, T.TimestampNTZType):
        out = out.withColumn(
            "purchase_ts", F.col("purchase_ts").cast("timestamp_ntz")
        ).withColumn("view_ts", F.col("view_ts").cast("timestamp_ntz"))
    return out


@_q(
    "agg_median_langs",
    """
    SELECT lang,
           CAST(median(n_chars) AS DOUBLE) AS median_chars,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def agg_median_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (Spark's native F.median — exact interpolated,
    not approx_percentile): even-count groups interpolate (a+b)/2, the same
    single double op on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.median("n_chars").cast("double").alias("median_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@_q(
    "c16_extract_all_numbers",
    """
    SELECT doc_id,
           coalesce(list_aggregate(regexp_extract_all(text, '[0-9]+'),
                    'string_agg', ','), '') AS nums,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_nums
    FROM documents
    """,
)
def c16_extract_all_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all — the multi-match sibling of C7's single extract:
    all digit runs per document plus the match count, one codegen'd
    projection."""
    docs = load_table(spark, sf_dir, "documents")
    nums = F.expr(r"regexp_extract_all(text, '[0-9]+', 0)")
    # array projected to a joined string: the driver's result hasher cannot
    # hash list cells (see tests/test_oracle_queries.py)
    return docs.select(
        "doc_id",
        F.array_join(nums, ",").alias("nums"),
        F.size(nums).alias("n_nums"),
    )


@_q(
    "w8_first_last_event",
    """
    SELECT DISTINCT user_id,
           first_value(value) OVER w AS first_value_seen,
           last_value(value) OVER w AS last_value_seen,
           CAST(count(*) OVER w AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w8_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over the full-partition frame (one row per
    user: entry and exit values) — the unbounded-following frame the default
    last_value footgun gets wrong; tie-broken by event_id for
    determinism."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("value").over(w).alias("first_value_seen"),
        F.last("value").over(w).alias("last_value_seen"),
        F.count(F.lit(1)).over(w).alias("n_events"),
    ).distinct()


@_q(
    "agg_conditional",
    f"""
    SELECT lang,
           CAST(count(*) FILTER (WHERE n_chars > 300) AS BIGINT) AS n_long,
           CAST(count(*) FILTER (WHERE n_chars <= 300) AS BIGINT) AS n_short,
           {_dsum('n_chars')} AS total_chars,
           CAST(coalesce(SUM(CAST(n_chars AS DECIMAL(27,6)))
                FILTER (WHERE source = 'web'), 0) AS DOUBLE) AS web_chars
    FROM documents GROUP BY lang
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER-clause semantics) in one pass:
    count_if plus a filtered decimal sum — no per-condition scans."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count_if(F.col("n_chars") > 300).alias("n_long"),
        F.count_if(F.col("n_chars") <= 300).alias("n_short"),
        A.decimal_sum("n_chars").alias("total_chars"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("source") == "web",
                    F.col("n_chars").cast("decimal(27,6)"),
                )
            ),
            F.lit(0).cast("decimal(27,6)"),
        )
        .cast("double")
        .alias("web_chars"),
    )


@_q(
    "langid_confusion",
    """
    WITH t AS (SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') toks
               FROM documents),
    h AS (
      SELECT doc_id, lang,
        CAST(len(list_filter(toks, x -> list_contains(['the','a','and','of','is'], lower(x)))) AS INTEGER) AS hits_en,
        CAST(len(list_filter(toks, x -> list_contains(['le','la','les','et','une'], lower(x)))) AS INTEGER) AS hits_fr,
        CAST(len(list_filter(toks, x -> list_contains(['el','los','y','que','una'], lower(x)))) AS INTEGER) AS hits_es,
        CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], lower(x)))) AS INTEGER) AS hits_de
      FROM t),
    p AS (
      SELECT lang,
           CASE WHEN greatest(hits_en, hits_fr, hits_es, hits_de) = 0 THEN 'und'
                WHEN hits_en = greatest(hits_en, hits_fr, hits_es, hits_de) THEN 'en'
                WHEN hits_fr = greatest(hits_en, hits_fr, hits_es, hits_de) THEN 'fr'
                WHEN hits_es = greatest(hits_en, hits_fr, hits_es, hits_de) THEN 'es'
                ELSE 'de' END AS predicted_lang
      FROM h)
    SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY lang, predicted_lang
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval pattern: confusion matrix of the heuristic language
    ID against the labeled lang column — one scan through the predictor,
    one keyed aggregate.  The shape every quality-model evaluation on a
    curated corpus runs."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    pred = X.language_id(docs).select("doc_id", "predicted_lang")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "dedup_incremental_cross",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
    sig AS (
      SELECT doc_id,
             list_transform(generate_series(0, 15),
               i -> list_min(list_transform(s, x -> md5(CAST(i AS VARCHAR) || ':' || x)))) AS sig
      FROM sh),
    bands AS (
      SELECT doc_id, b.b AS band,
             md5(sig[b.b*4+1] || ',' || sig[b.b*4+2] || ',' || sig[b.b*4+3] || ',' || sig[b.b*4+4]) AS bucket
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) b)
    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
    FROM bands n JOIN bands c ON n.band = c.band AND n.bucket = c.bucket
    WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
    """,
)
def dedup_incremental_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (new-batch vs corpus) MinHash-LSH candidates: every 10th
    doc plays the nightly arrival, the rest the standing corpus — the
    ingest-time dedup a 100 TB pipeline runs instead of re-deduping the
    world."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_cross(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
    )


@_q(
    "text_sentences",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                         x -> trim(x)), x -> x <> '') AS sents
      FROM documents)
    SELECT doc_id,
           CAST(len(sents) AS INTEGER) AS n_sentences,
           CAST(coalesce(list_aggregate(list_transform(sents,
                x -> length(x)), 'max'), 0) AS INTEGER) AS max_sentence_chars
    FROM s
    """,
)
def text_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats (regex terminator split, trimmed,
    empties dropped): per-doc sentence count and longest sentence — the
    pre-chunking pass before packing or windowed embedding."""
    docs = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(
            F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x)
        ),
        lambda x: x != "",
    )
    return docs.select(
        "doc_id",
        F.size(sents).alias("n_sentences"),
        F.coalesce(
            F.array_max(F.transform(sents, lambda x: F.length(x))), F.lit(0)
        ).alias("max_sentence_chars"),
    )


@_q(
    "events_zscore_outliers",
    """
    WITH stats AS (
      SELECT event_type,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,6)) * CAST(value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS s2,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.s1 / s.n)
             / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE s.n > 1
      AND abs((e.value - s.s1 / s.n)
          / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1))) > 3.0
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection with ENGINE-EXACT variance:
    stddev_samp's streaming (Welford) accumulation is not bit-stable across
    engines or partitionings, so the moments are exact DECIMAL sums (S1,
    S2) and the variance is computed from them in double — the same op
    sequence on both engines.  Plan: one aggregate, broadcast of the tiny
    stats table, map-side filter."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(27,6)")
    # decimal -> double via STRING: both engines correctly round
    # string->double, while their native decimal->double conversions differ
    # in the last ulp once the scaled integer exceeds 53 bits (s2 does)
    stats = ev.groupBy("event_type").agg(
        F.sum(dec).cast("string").cast("double").alias("s1"),
        F.sum(dec * dec).cast("string").cast("double").alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    j = ev.join(F.broadcast(stats), "event_type").filter(F.col("n") > 1)
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        j.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 3.0)
        .select("event_id", "event_type", "value", "zscore")
    )


@_q(
    "funnel_first_touch_counts",
    """
    WITH m AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id)
    SELECT
      CAST(count(*) FILTER (WHERE first_view IS NOT NULL) AS BIGINT) AS n_view,
      CAST(count(*) FILTER (WHERE first_view IS NOT NULL
           AND first_click > first_view) AS BIGINT) AS n_view_click,
      CAST(count(*) FILTER (WHERE first_view IS NOT NULL
           AND first_click > first_view
           AND first_purchase > first_click) AS BIGINT) AS n_view_click_purchase
    FROM m
    """,
)
def funnel_first_touch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-TOUCH conversion funnel (view → click → purchase, strictly
    increasing first-occurrence times) in ONE pass: conditional min per
    stage, then filtered counts — no joins, no sessionization needed.
    Differs from ``funnel_view_click_purchase`` (the staged-min per-user
    form): here each stage compares GLOBAL first occurrences, the
    classic first-touch attribution convention.  (Was shadowed by a
    duplicate registration of the staged form until r6 — ``_q`` now
    asserts name uniqueness.)"""
    ev = load_table(spark, sf_dir, "events")

    def first_of(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    m = ev.groupBy("user_id").agg(
        first_of("view").alias("first_view"),
        first_of("click").alias("first_click"),
        first_of("purchase").alias("first_purchase"),
    )
    step1 = F.col("first_view").isNotNull()
    step2 = step1 & (F.col("first_click") > F.col("first_view"))
    step3 = step2 & (F.col("first_purchase") > F.col("first_click"))
    return m.agg(
        F.count_if(step1).alias("n_view"),
        F.count_if(step2).alias("n_view_click"),
        F.count_if(step3).alias("n_view_click_purchase"),
    )


# ---------------------------------------------------------------------------
# r5 additions: two more TPC-H join-agg shapes, distributed embedding
# centroids, and a lead/lag event-delta window.
# ---------------------------------------------------------------------------


@_q(
    "q14_promo_revenue",
    f"""
    SELECT {_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")} AS promo_revenue,
           {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts —
    selective fact filter pushed to the scan, a single fact⋈dim equi-join
    (part grows with scale factor, so the join is SIZE-GATED like j4's
    customer side — no forced hint), and conditional decimal aggregation.
    The promo/total ratio is left to the consumer: emitting both exact
    decimal sums keeps the result bit-portable without dividing two
    decimals (engines disagree on decimal-division scale rules)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-02-01 00:00:00")))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            A.decimal_sum(promo).alias("promo_revenue"),
            A.decimal_sum(rev).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q(
    "q18_large_orders",
    f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 300)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {_dsum('l.l_quantity')} AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): group-by-HAVING over the fact
    produces a SMALL key set that semi-joins back — the pre-aggregation
    runs map-side partials on the lineitem shuffle, and the qualifying key
    list stays broadcast-sized at any scale factor (HAVING selectivity
    ~0.1%), so the composed plan is two keyed shuffles + broadcast
    semi-probe, never a re-scan of an unfiltered join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(A.decimal_sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    agg = (
        li.join(big.withColumnRenamed("l_orderkey", "_bk"), li.l_orderkey == F.col("_bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(A.decimal_sum("l_quantity").alias("sum_qty"))
    )
    return R.top_k(agg, [F.desc("o_totalprice"), F.asc("o_orderkey")], 20)


@_q(
    "embedding_centroid_by_label",
    """
    WITH ex AS (
      SELECT label, u.pos AS pos, embedding[u.pos]::DOUBLE AS x
      FROM embeddings
      CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) u)
    SELECT label, pos,
           CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(x)
             AS centroid_value,
           COUNT(x) AS n_vectors
    FROM ex GROUP BY label, pos
    """,
)
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class centroid of the embedding corpus — the building block for
    class-balanced sampling, label-noise detection, and IVF-style seeded
    quantizers.  Distributed shape: posexplode to (label, pos, x) rows,
    DECIMAL-sum per (label, pos) so partial-aggregation order can't change
    bits (the centroid stays oracle-checkable).  Declared form emits one
    scalar row per (label, dimension) — ONE keyed shuffle on a small key
    space (|labels| × 64 after partial aggregation), and no whole vector
    ever crosses a shuffle; callers that want `array<double>` centroids
    reassemble with a sorted collect per label (a |labels|-row second agg),
    kept out of the declared query because driver hashing is defined on
    scalar columns only."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x"),
    ).select("label", (F.col("pos0") + 1).alias("pos"), "x")
    return ex.groupBy("label", "pos").agg(
        (A.decimal_sum("x") / F.count("x")).alias("centroid_value"),
        F.count("x").alias("n_vectors"),
    )


@_q(
    "w9_lead_lag",
    """
    SELECT event_id, user_id, value,
           value - lag(value) OVER w AS delta_value,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w9_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD over per-user event streams (value delta + next action) —
    the per-entity sequential-context primitive behind session features.
    ONE hash-partitioned window shuffle on user_id serves both functions;
    the frame is the default entire-partition running frame, and ties are
    broken by event_id so both engines walk the identical order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@_q(
    "text_chunk_overlap",
    """
    SELECT d.doc_id, CAST(s.start AS INT) AS chunk_start,
           substr(d.text, s.start + 1, 200) AS chunk
    FROM documents d
    CROSS JOIN LATERAL (
      SELECT unnest(generate_series(0, d.n_chars - 1, 150)) AS start) s
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping document chunking (size 200, stride 150 → 50-char
    overlap) — the retrieval/pretraining chunker: every downstream unit
    (embedding, dedup, packing) operates on chunks, and the overlap keeps
    boundary-straddling content findable.  Pure narrow shape: sequence →
    explode → substring, zero shuffles, runs at scan speed; chunk_start is
    carried so chunks re-anchor into the source doc."""
    docs = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0), F.col("n_chars").cast("int") - 1, F.lit(150)
    )
    return docs.select(
        "doc_id", F.explode(starts).alias("chunk_start"), "text"
    ).select(
        "doc_id",
        "chunk_start",
        F.expr("substring(text, chunk_start + 1, 200)").alias("chunk"),
    )


@_q(
    "text_char_diversity",
    """
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
    cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c),
    s AS (SELECT doc_id,
                 CAST(sum(k * k) AS BIGINT) AS sum_k2,
                 CAST(sum(k) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_distinct_chars
          FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           1.0 - CAST(sum_k2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             AS char_gini,
           n_distinct_chars
    FROM s
    """,
)
def text_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution diversity as GINI IMPURITY (1 − Σp²) — the
    low-entropy-gibberish / repeated-char filter signal.  Gini is chosen
    over Shannon entropy deliberately: no log, so the whole score is exact
    integer sums (k², n — order-independent by construction) followed by
    ONE double division, bit-portable across engines (same trick as the
    linear-idf TF-IDF).  Shape: (doc, char)-keyed count — fan-out bounded
    by |alphabet| per doc — then a per-doc fold; two keyed shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    ch = docs.select("doc_id", F.explode(F.split("text", "")).alias("c"))
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    s = cnt.groupBy("doc_id").agg(
        F.sum(F.col("k") * F.col("k")).alias("sum_k2"),
        F.sum("k").alias("n"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
    )
    gini = F.lit(1.0) - F.col("sum_k2").cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    return s.select("doc_id", gini.alias("char_gini"), "n_distinct_chars")


# ---------------------------------------------------------------------------
# r5 batch 2 — the remaining classic join-shape family (TPC-H Q4/Q6/Q7/Q8/
# Q13/Q17/Q19/Q21/Q22 analogs on the driver tables).  Columns the synthetic
# schema lacks (l_commitdate/l_receiptdate/l_shipmode, c_phone, p_container)
# are substituted with semantically-equivalent predicates on existing
# columns; the JOIN SHAPES — EXISTS/NOT-EXISTS correlation, scalar
# subqueries, outer-join distributions, disjunctive pushdown — are the
# point, not the constants.
# ---------------------------------------------------------------------------


@_q(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS expressed
    as a LEFT SEMI join — the probe side is lineitem pre-filtered to the
    qualifying rows so the semi join shuffles only the matching subset, and
    the selective quarter filter on orders is pushed to the scan.  One
    keyed semi-join shuffle + one small group-by; no correlated re-scan
    per row (the classic subquery trap Spark/Catalyst de-correlates to
    exactly this plan)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_q(
    "q6_forecast_revenue",
    f"""
    SELECT {_dsum('l_extendedprice * l_discount')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= CAST(0.05 AS DOUBLE)
      AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(24.0 AS DOUBLE)
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (revenue-change forecast): the purest
    pushdown-or-die query — three range predicates and a two-column
    projection over the fact table, then one global decimal sum.  Every
    predicate reaches the parquet scan (PushedFilters) and the projection
    prunes to 4 columns (ReadSchema), so at 100 TB the scan does the work
    and the aggregate moves one row per partition.  Plan-asserted: filters
    pushed, single exchange (the one-row final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            A.decimal_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q(
    "q7_nation_volume",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {_dsum('volume')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (bi-directional volume shipping): the fact joins two
    INDEPENDENT dimension chains (supplier→nation, order→customer→nation)
    and the nation-pair disjunction filters both ends.  Nation is a fixed
    25-row table at every scale factor — explicitly broadcast, and
    pre-filtered to the two named nations so supplier/customer shrink
    BEFORE their fact joins; supplier and customer grow with SF and stay
    size-gated (AQE decides).  The date filter is pushed to the lineitem
    scan."""
    n_pair = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n_pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n_pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        )
        .select("l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            A.decimal_sum(volume).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q(
    "q8_market_share",
    f"""
    SELECT o_year,
           {_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
             AS nation_volume,
           {_dsum('volume')} AS total_volume,
           CAST(count(*) AS BIGINT) AS n_items
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the longest dimension chain
    in the suite — fact → part, supplier→nation, order→customer→nation→
    region — with the share computed as conditional/total decimal sums in
    ONE pass (no second scan, no division: engines disagree on decimal
    division scale).  Fixed-size dims (nation, region) broadcast; part,
    supplier, customer, orders grow with SF and stay size-gated.  The
    region and p_type filters shrink their chains before the fact joins."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    cust_asia = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            A.decimal_sum(nation_vol).alias("nation_volume"),
            A.decimal_sum(volume).alias("total_volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q(
    "q13_order_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
    with an extra join-time predicate (NOT a post-filter — customers whose
    only orders are urgent must still appear with count 0), then a
    two-level aggregation.  The outer join shuffles both sides on the
    customer key; the second group-by runs on the tiny (custkey, count)
    intermediate.  count(o_orderkey) counts non-null matches only — the
    outer-join NULL row contributes 0, identically in both engines."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_q(
    "q17_small_quantity_revenue",
    f"""
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
    li_b AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM brand_parts)),
    per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty
      FROM li_b GROUP BY l_partkey)
    SELECT {_dsum('li_b.l_extendedprice')} / CAST(7.0 AS DOUBLE) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM li_b JOIN per_part ON li_b.l_partkey = per_part.l_partkey
    WHERE li_b.l_quantity < CAST(0.2 AS DOUBLE) * per_part.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): a correlated scalar
    subquery (per-part average quantity) de-correlated into a group-by +
    self-join — the standard Catalyst rewrite, made explicit.  The brand
    filter shrinks the part keys first (semi join), so BOTH the average
    and the probe run over the brand's lineitems only; the per-part
    average uses decimal accumulation so the correlated threshold is
    bit-identical across engines.  Two keyed shuffles on l_partkey (agg +
    self-join) — AQE coalesces them onto the same partitioning."""
    parts_b = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(parts_b, li.l_partkey == parts_b.p_partkey, "left_semi")
    per_part = li_b.groupBy("l_partkey").agg(
        A.decimal_avg("l_quantity").alias("avg_qty")
    )
    joined = li_b.join(
        per_part.withColumnRenamed("l_partkey", "_pk"),
        F.col("l_partkey") == F.col("_pk"),
    ).filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
    return joined.agg(
        (A.decimal_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@_q(
    "q19_disjunctive_revenue",
    f"""
    SELECT {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= CAST(1.0 AS DOUBLE) AND l.l_quantity <= CAST(11.0 AS DOUBLE))
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= CAST(10.0 AS DOUBLE) AND l.l_quantity <= CAST(20.0 AS DOUBLE))
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= CAST(20.0 AS DOUBLE) AND l.l_quantity <= CAST(30.0 AS DOUBLE))
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an OR
    of three conjunctive brand/size/quantity windows across BOTH join
    sides.  The part-only portion of each disjunct is extracted and
    applied BEFORE the join (the CNF-pushdown Catalyst derives; written
    explicitly so the part scan shrinks regardless of optimizer version),
    the quantity envelope [1, 30] pre-filters the fact scan, and the full
    row-level disjunction re-applies after the join for exactness."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
            | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25))
            | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") >= 1.0) & (F.col("l_quantity") <= 30.0))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & (qty >= 1.0) & (qty <= 11.0))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & (qty >= 10.0) & (qty <= 20.0))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & (qty >= 20.0) & (qty <= 30.0))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            A.decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q(
    "q21_blocking_supplier",
    """
    WITH l1 AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_returnflag = 'R' AND o.o_orderstatus = 'F')
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q21_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept waiting orders): the hardest
    correlation pattern in the suite — an EXISTS and a NOT EXISTS against
    the SAME fact table with an inequality correlate (another supplier in
    the same order).  Expressed as LEFT SEMI + LEFT ANTI joins keyed on
    l_orderkey with the supplier-inequality as a secondary join predicate;
    all three legs shuffle on the same order key, so AQE lines them up on
    one partitioning.  (l_receiptdate > l_commitdate from the original is
    substituted with the returnflag/'F'-status pair — the shape is the
    multi-correlated semi/anti chain, not the date columns.)"""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    cand = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cand.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@_q(
    "q22_inactive_balance",
    f"""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(c_acctbal) AS a
      FROM customer WHERE c_acctbal > CAST(0.0 AS DOUBLE))
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS numcust,
           {_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY n.n_name
    """,
)
def q22_inactive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity): a GLOBAL scalar subquery
    (average positive balance) broadcast as a one-row literal over the
    corpus — the quality_gate_tokens pattern — combined with a NOT EXISTS
    anti-join against a filtered orders subset and a fixed-size nation dim
    (broadcast).  The scalar aggregate is one extra job over a pruned
    single column; the anti join shuffles on the customer key.  (The
    original's "customers with no orders at all" is empty on the driver's
    dense synthetic data, so the anti-join correlate is "no URGENT order"
    — same shape, non-degenerate result; c_phone country-code grouping
    becomes the nation dim.)"""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(A.decimal_avg("c_acctbal").alias("a"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            A.decimal_sum("c_acctbal").alias("totacctbal"),
        )
    )


@_q(
    "bloom_pruned_semi_join",
    f"""
    SELECT o.o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           {_dsum('o.o_totalprice')} AS total_price
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_acctbal > CAST(9500.0 AS DOUBLE))
    GROUP BY o.o_orderstatus
    """,
)
def bloom_pruned_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning (operators/bloom.py): orders from
    very-high-balance customers.  The selective dim predicate keeps ~5% of
    customers, so a 64 Kbit Bloom bitmap over the qualifying keys is built
    with one bounded aggregate (bitmap size is a PARAMETER — the collect
    cannot grow with the corpus), folded into a single parsed literal
    expression, and applied to the fact scan BEFORE the semi-join
    exchange: ~95% of fact rows die inside the scan stage instead of
    crossing the shuffle.  False positives are re-checked by the exact
    semi join above, so the result — and the oracle — is the plain
    EXISTS."""
    from lvm_datapipe_spark.operators import bloom as B

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500.0)
        .select("c_custkey")
    )
    return (
        B.bloom_prefiltered_semi_join(orders, dim, "o_custkey", "c_custkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            A.decimal_sum("o_totalprice").alias("total_price"),
        )
    )


@_q(
    "scd2_docs_merge",
    """
    WITH cur_open AS (
      SELECT doc_id, md5(text) AS fp, '2024-01-01' AS valid_from
      FROM documents WHERE doc_id % 13 <> 0),
    hist AS (
      SELECT doc_id, md5('v0' || text) AS fp,
             '2023-01-01' AS valid_from, '2024-01-01' AS valid_to
      FROM documents WHERE doc_id % 13 <> 0 AND doc_id % 17 = 0),
    upd AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [edited]'
                      ELSE text END) AS fp
      FROM documents WHERE doc_id % 11 <> 0),
    j AS (
      SELECT o.doc_id AS k, o.fp AS ofp, o.valid_from AS ofrom,
             u.doc_id AS uk, u.fp AS ufp
      FROM cur_open o FULL OUTER JOIN upd u ON o.doc_id = u.doc_id)
    SELECT doc_id, fingerprint, valid_from, valid_to FROM (
      SELECT k AS doc_id, ofp AS fingerprint, ofrom AS valid_from,
             CAST(NULL AS VARCHAR) AS valid_to
      FROM j WHERE k IS NOT NULL AND (uk IS NULL OR ofp = ufp)
      UNION ALL
      SELECT k, ofp, ofrom, '2024-06-01'
      FROM j WHERE k IS NOT NULL AND uk IS NOT NULL AND ofp <> ufp
      UNION ALL
      SELECT uk, ufp, '2024-06-01', CAST(NULL AS VARCHAR)
      FROM j WHERE uk IS NOT NULL AND (k IS NULL OR ofp <> ufp)
      UNION ALL
      SELECT doc_id, fp, valid_from, valid_to FROM hist
    ) merged
    """,
)
def scd2_docs_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge (operators/scd.py::scd2_merge): deterministic views
    of the documents table play an existing versioned corpus (every 13th
    doc absent; every 17th carrying a closed prior version) and an update
    snapshot (every 11th absent, every 7th edited).  Changed keys close
    their open row at the batch date and insert a fresh version; new keys
    insert; untouched and absent keys pass through; history rows survive
    verbatim.  ONE full-outer keyed shuffle + an inline array-explode —
    the incremental-pipeline-safe versioned-upsert primitive."""
    from lvm_datapipe_spark.operators.scd import scd2_merge

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 13 != 0)
    cur_open = base.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fingerprint"),
        F.lit("2024-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    hist = base.filter(F.col("doc_id") % 17 == 0).select(
        "doc_id",
        F.md5(F.concat(F.lit("v0"), F.col("text")).cast("binary")).alias(
            "fingerprint"
        ),
        F.lit("2023-01-01").alias("valid_from"),
        F.lit("2024-01-01").alias("valid_to"),
    )
    current = cur_open.unionByName(hist)
    updates = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
            )
            .otherwise(F.col("text"))
            .cast("binary")
        ).alias("fingerprint"),
    )
    return scd2_merge(current, updates, key="doc_id", batch_date="2024-06-01")


@_q(
    "text_zscore_by_lang",
    """
    WITH stats AS (
      SELECT lang,
             CAST(CAST(SUM(CAST(n_chars AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(n_chars AS DECIMAL(27,6)) * CAST(n_chars AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS s2,
             CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang, d.n_chars,
           (CAST(d.n_chars AS DOUBLE) - s.s1 / s.n)
             / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS z_chars
    FROM documents d JOIN stats s ON d.lang = s.lang
    WHERE s.n > 1
    """,
)
def text_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language feature normalization (z-score of document length) —
    the group-wise standardization step before cross-lingual quality
    thresholds can share one cutoff.  Same engine-exact moment trick as
    events_zscore_outliers: exact DECIMAL S1/S2 partials (order-free),
    decimal→double through a string so both engines round identically,
    then the variance arithmetic in double.  Plan: one small aggregate
    broadcast back over the corpus — a map-side transform, no second
    corpus shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    dec = F.col("n_chars").cast("decimal(27,6)")
    stats = docs.groupBy("lang").agg(
        F.sum(dec).cast("string").cast("double").alias("s1"),
        F.sum(dec * dec).cast("string").cast("double").alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    j = docs.join(F.broadcast(stats), "lang").filter(F.col("n") > 1)
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("n_chars").cast("double") - mean) / F.sqrt(var)
    return j.select("doc_id", "lang", "n_chars", z.alias("z_chars"))


@_q(
    "sample_match_target",
    """
    WITH cnt AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    tgt AS (
      SELECT * FROM (VALUES
        ('en', CAST(0.30 AS DOUBLE)), ('de', CAST(0.20 AS DOUBLE)),
        ('fr', CAST(0.20 AS DOUBLE)), ('es', CAST(0.15 AS DOUBLE)),
        ('zh', CAST(0.15 AS DOUBLE))) t(lang, frac)),
    rates AS (
      SELECT c.lang,
             (SELECT min(c2.n / t2.frac) FROM cnt c2 JOIN tgt t2 ON c2.lang = t2.lang)
               * t.frac / c.n AS rate
      FROM cnt c JOIN tgt t ON c.lang = t.lang)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE CAST(('0x' || substr(md5('resample' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          < r.rate * 10000
    """,
)
def sample_match_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic resampling to a TARGET language distribution — the
    mixture-rebalancing step of corpus curation (downsample the dominant
    language until the kept corpus matches the recipe).  The feasible
    scale is min over languages of n_l/target_l (no language can be
    upsampled), the per-language keep rate follows from it, and the keep
    DECISION is the md5 hash-bucket of the doc id (sampling.py
    convention): a pure function of the key — stable under repartitioning
    and engine changes, and exactly replayable in the oracle.  Plan: one
    tiny counts aggregate + a one-row scalar, both broadcast; the kept
    set is a map-side filter on the corpus scan."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    frac = (
        F.when(F.col("lang") == "en", 0.30)
        .when(F.col("lang") == "de", 0.20)
        .when(F.col("lang") == "fr", 0.20)
        .when(F.col("lang") == "es", 0.15)
        .when(F.col("lang") == "zh", 0.15)
    )
    cnt = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("frac", frac)
    )
    scale = cnt.agg(F.min(F.col("n") / F.col("frac")).alias("scale"))
    rates = cnt.join(F.broadcast(scale)).select(
        "lang", (F.col("scale") * F.col("frac") / F.col("n")).alias("rate")
    )
    bucket = hash_bucket("doc_id", salt="resample")
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("rate") * 10000)
        .select("doc_id", "lang")
    )


@_q(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events),
    cnt AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
    tot AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS total FROM cnt
      GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS p
    FROM cnt c JOIN tot t ON c.from_type = t.from_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences —
    the behavioral-model fingerprint (what follows what, how often) used
    for bot detection and funnel design.  ONE window shuffle on user_id
    produces the bigrams (w9's lead machinery), then the count and
    row-normalization aggregates run on the |event_types|² matrix — a
    25-row table here, never corpus-sized.  The probability is an exact
    bigint/bigint division performed identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("total"))
    return cnt.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("total").cast("double")).alias("p"),
    )


@_q(
    "agg_correlation",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6)) * CAST(l_extendedprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6)) * CAST(l_quantity AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6)) * CAST(l_extendedprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_price
    FROM m
    """,
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation with ENGINE-EXACT moments: corr() in
    any engine streams Welford-style partials whose float order differs
    per partitioning, so the five raw moments are exact DECIMAL sums
    (DECIMAL(27,6) factors — the proven events_zscore configuration, int128
    exact on both engines), converted decimal→double through a
    string (the events_zscore trick), then one fixed double-arithmetic
    formula.  One map-side-partial keyed aggregate over the fact scan —
    the same cost as any group-by — and bit-identical across engines and
    partitionings."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(27,6)")
    y = F.col("l_extendedprice").cast("decimal(27,6)")

    def d(c):
        return F.sum(c).cast("string").cast("double")

    m = li.groupBy("l_returnflag").agg(
        d(x * y).alias("sxy"),
        d(x).alias("sx"),
        d(y).alias("sy"),
        d(x * x).alias("sxx"),
        d(y * y).alias("syy"),
        F.count(F.lit(1)).alias("n"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    corr = (n * F.col("sxy") - sx * sy) / F.sqrt(
        (n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy)
    )
    return m.select("l_returnflag", "n", corr.alias("corr_qty_price"))


@_q(
    "sample_top_p_by_lang",
    """
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             SUM(n_chars) OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cum_before,
             SUM(n_chars) OVER (PARTITION BY lang) AS total
      FROM documents)
    SELECT doc_id, lang, n_chars
    FROM ranked
    WHERE coalesce(cum_before, 0) < CAST(0.8 AS DOUBLE) * total
    """,
)
def sample_top_p_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) corpus selection per language: keep the longest
    documents until they cover 80% of each language's character mass —
    the budgeted-curation primitive ("best docs up to N tokens per
    language").  A row is kept iff the mass BEFORE it is still under the
    budget, so the set is a deterministic prefix of the (n_chars DESC,
    doc_id) order and exactly one doc straddles the boundary.  ONE
    lang-keyed window shuffle serves the running sum AND the per-group
    total (same partitioning, integer sums — no float-order hazard);
    everything after is a map-side filter."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    cum_before = F.sum("n_chars").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    total = F.sum("n_chars").over(Window.partitionBy("lang"))
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.coalesce(cum_before, F.lit(0)).alias("_cb"),
            total.alias("_tot"),
        )
        .filter(F.col("_cb") < F.lit(0.8) * F.col("_tot"))
        .select("doc_id", "lang", "n_chars")
    )


def _pq_adc_sql(
    m: int = 32, ksub: int = 8, dim: int = _EMB_DIM, seed: int = 7, k: int = 10
) -> str:
    """DuckDB replay of the PQ/ADC path: the seeded codebooks embed as
    literals on BOTH engines (CAST('…' AS DOUBLE) — correctly-rounded
    string→double on both parsers), every squared-distance sum is written
    in the Spark fold's exact left-to-right order, so the argmin codes,
    the LUT lookups, and the final ranking are bit-identical."""
    from lvm_datapipe_spark.operators.similarity import pq_codebooks

    dsub = dim // m
    cbs = pq_codebooks(m, ksub, dsub, seed)

    def dist(vec: str, j: int, cent) -> str:
        s = j * dsub
        terms = " + ".join(
            f"(({vec}[{s + i + 1}] - CAST('{float(cent[i])!r}' AS DOUBLE))"
            f" * ({vec}[{s + i + 1}] - CAST('{float(cent[i])!r}' AS DOUBLE)))"
            for i in range(dsub)
        )
        return f"(0.0 + {terms})"

    def dlist(vec: str, j: int) -> str:
        return "[" + ", ".join(dist(vec, j, cbs[j][c]) for c in range(ksub)) + "]"

    code_cols = ",\n             ".join(
        f"(list_position({dlist('v', j)}, list_min({dlist('v', j)})) - 1) AS code_{j}"
        for j in range(m)
    )
    lut_cols = ",\n             ".join(
        f"{dlist('v', j)} AS lut_{j}" for j in range(m)
    )
    adc = " + ".join(f"l.lut_{j}[c.code_{j} + 1]" for j in range(m))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    codes AS (
      SELECT vec_id AS neighbor_id,
             {code_cols}
      FROM e),
    lut AS (
      SELECT vec_id AS query_id,
             {lut_cols}
      FROM e WHERE vec_id < 10),
    pairs AS (
      SELECT l.query_id, c.neighbor_id, ({adc}) AS adc_dist
      FROM codes c CROSS JOIN lut l
      WHERE c.neighbor_id <> l.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, adc_dist,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist ASC, neighbor_id ASC)
                  AS INTEGER) AS rank
      FROM pairs)
    SELECT query_id, neighbor_id, rank, adc_dist FROM ranked WHERE rank <= {k}
    """


# Product-quantization ANN (ADC): the canonical 100 TB embedding-compression
# search — the corpus is ranked through 8 int codes (8 B/vector instead of
# 256 B), queries keep full precision via per-subvector lookup tables.
# Fixed seeded codebooks make encode + search SQL-replayable end to end.
@_q("ann_pq_adc_topk", _pq_adc_sql())
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k (similarity.py::pq_encode/pq_adc_topk): corpus vectors
    compress to m=32 argmin-centroid codes in one scan (no shuffle); each
    of the 10 queries broadcasts its 32×8 distance LUT; the per-pair
    distance is 32 element_at lookups in whole-stage codegen and one
    query-keyed window takes the top-10.  The broadcast nested-loop is a
    10-row query-set side — the allowed shape (see
    test_no_cartesian_in_any_declared_query) — while the corpus side
    reads ONLY the code columns, which is the entire point of PQ."""
    from lvm_datapipe_spark.operators.similarity import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_adc_topk(emb, queries, k=10)


@_q(
    "pipeline_incremental",
    f"""
    WITH old AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 11 <> 0),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' [edited]' ELSE text END AS text,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [edited]' ELSE text END) AS fp
      FROM documents WHERE doc_id % 13 <> 0),
    diff AS (
      SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
             CASE WHEN old.fp IS NULL THEN 'added'
                  WHEN new.fp IS NULL THEN 'removed'
                  WHEN old.fp <> new.fp THEN 'modified'
                  ELSE 'unchanged' END AS status
      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id),
    reproc AS (
      SELECT d.doc_id,
             CAST(len({_SQL_TOKS.replace("text", "n.text")}) AS INTEGER) AS n_tokens
      FROM diff d JOIN new n ON n.doc_id = d.doc_id
      WHERE d.status IN ('added', 'modified'))
    SELECT d.doc_id, d.status, r.n_tokens
    FROM diff d LEFT OUTER JOIN reproc r ON r.doc_id = d.doc_id
    """,
)
def pipeline_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL re-processing composition — the reason
    snapshot_diff exists: diff two corpus snapshots by fingerprint, run
    the expensive stage (tokenization here, standing in for model
    scoring) ONLY on added/modified docs, and carry every other row
    through untouched (n_tokens NULL = served from the previous run's
    store).  At 100 TB this is the difference between re-scoring the
    corpus and re-scoring the ~1% that changed: the expensive projection
    sits ABOVE a status filter, so its input is the changed subset, never
    the full scan.  Shapes: one full-outer diff join + one keyed join of
    the small changed set back to its text + one left join of results."""
    from lvm_datapipe_spark.operators import text as X
    from lvm_datapipe_spark.operators.relational import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fingerprint")
    )
    new_text = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
    ).otherwise(F.col("text"))
    new = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        new_text.alias("text"),
        F.md5(new_text.cast("binary")).alias("fingerprint"),
    )
    diff = snapshot_diff(old, new)
    changed = (
        diff.filter(F.col("status").isin("added", "modified"))
        .join(new.select("doc_id", "text"), "doc_id")
        .select("doc_id", X.token_count("text").alias("n_tokens"))
    )
    return diff.join(changed, "doc_id", "left_outer").select(
        "doc_id", "status", "n_tokens"
    )


@_q(
    "text_dup_sentence_fraction",
    r"""
    WITH s AS (
      SELECT doc_id,
             unnest(list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                    x -> trim(x)), x -> x <> '')) AS sent
      FROM documents),
    h AS (SELECT doc_id, md5(sent) AS hs FROM s),
    g AS (SELECT hs, count(DISTINCT doc_id) AS nd FROM h GROUP BY hs),
    per AS (
      SELECT h.doc_id,
             CAST(count(*) AS BIGINT) AS n_sentences,
             CAST(sum(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM h JOIN g ON h.hs = g.hs GROUP BY h.doc_id)
    SELECT doc_id, n_sentences, n_dup,
           CAST(n_dup AS DOUBLE) / CAST(n_sentences AS DOUBLE) AS dup_fraction
    FROM per
    """,
)
def text_dup_sentence_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document sentence-duplication fraction — the RefinedWeb-style
    boilerplate signal (docs whose sentences mostly appear in OTHER docs
    are templates/mirrors, a different failure mode than whole-doc dups).
    Shape: explode sentences → md5 once per sentence row → one hs-keyed
    aggregate for the global document-frequency table → equi-join back on
    the hash → per-doc fold.  All shuffles are keyed on content hashes
    (uniform — no hot keys); nothing is quadratic in the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    h = docs.select(
        "doc_id", F.explode(sents).alias("sent")
    ).select("doc_id", F.md5(F.col("sent").cast("binary")).alias("hs"))
    g = h.groupBy("hs").agg(F.countDistinct("doc_id").alias("nd"))
    per = (
        h.join(g, "hs")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return per.select(
        "doc_id",
        "n_sentences",
        "n_dup",
        (F.col("n_dup").cast("double") / F.col("n_sentences").cast("double")).alias(
            "dup_fraction"
        ),
    )


@_q(
    "quality_logit",
    r"""
    WITH f AS (
      SELECT doc_id, lang, n_chars,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT doc_id, lang, n_tokens,
           (-2.0 + 0.004 * CAST(n_tokens AS DOUBLE))
             + 0.35 * (CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             AS logit,
           ((-2.0 + 0.004 * CAST(n_tokens AS DOUBLE))
             + 0.35 * (CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)))
             > 0.0 AS keep
    FROM f WHERE n_tokens > 0
    """,
)
def quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gating shape (the fastText-classifier stage of
    CCNet/RefinedWeb pipelines) with a LITERAL-weight linear model: the
    logit is plain double multiply/add over engineered features, so the
    score — unlike a sigmoid (exp differs in the last ulp across libm
    implementations) — is bit-portable, and thresholding the logit at 0
    is exactly thresholding the probability at 0.5.  Pure scan-shaped
    projection: the whole classifier costs nothing at 100 TB.  Real
    learned weights drop in as new literals (retraining changes
    constants, never the plan)."""
    docs = load_table(spark, sf_dir, "documents")
    from lvm_datapipe_spark.operators import text as X

    f = docs.select(
        "doc_id", "lang", "n_chars", X.token_count("text").cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    logit = (
        F.lit(-2.0) + F.lit(0.004) * F.col("n_tokens").cast("double")
    ) + F.lit(0.35) * (
        F.col("n_chars").cast("double") / F.col("n_tokens").cast("double")
    )
    return f.select(
        "doc_id", "lang", "n_tokens", logit.alias("logit"), (logit > 0.0).alias("keep")
    )


@_q(
    "events_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, CAST(median(value) AS DOUBLE) AS med
      FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type,
             CAST(median(abs(e.value - m.med)) AS DOUBLE) AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type),
    j AS (
      SELECT e.event_id, e.event_type, e.value, m.med, d.mad
      FROM events e
      JOIN med m ON e.event_type = m.event_type
      JOIN mad d ON e.event_type = d.event_type)
    SELECT event_id, event_type, value,
           0.6745 * (value - med) / mad AS robust_z
    FROM j
    WHERE mad > 0.0 AND abs(0.6745 * (value - med) / mad) > 3.5
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    mean/stddev z-score (events_zscore_outliers) breaks down when the
    outliers themselves inflate the variance; MAD is 50%-breakdown
    robust.  Exact interpolated medians (the agg_median_langs
    determinism argument) in TWO grouped aggregates, each broadcast back
    over the corpus — the corpus itself is never reshuffled; the 0.6745
    consistency constant scales MAD to sigma-equivalents, 3.5 is the
    standard Iglewicz-Hoaglin cutoff."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.median("value").cast("double").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).cast("double").alias("mad"))
    )
    j = ev.join(F.broadcast(med), "event_type").join(F.broadcast(mad), "event_type")
    rz = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        j.filter((F.col("mad") > 0.0) & (F.abs(rz) > 3.5))
        .select("event_id", "event_type", "value", rz.alias("robust_z"))
    )


@_q(
    "dq_report",
    """
    WITH rowchecks AS (
      SELECT * FROM (
        SELECT 'orders_totalprice_nonneg' AS check,
               CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS violations,
               CAST(count(*) AS BIGINT) AS n_checked
        FROM orders
        UNION ALL
        SELECT 'orders_status_domain',
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM orders)),
    uniq AS (
      SELECT 'lineitem_pk_unique' AS check,
             CAST(sum(c - 1) AS BIGINT) AS violations,
             CAST(sum(c) AS BIGINT) AS n_checked
      FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)),
    ref AS (
      SELECT 'orders_custkey_refs_customer' AS check,
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS violations,
             CAST(count(*) AS BIGINT) AS n_checked
      FROM orders o
      LEFT OUTER JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON o.o_custkey = c.c_custkey)
    SELECT * FROM rowchecks
    UNION ALL SELECT * FROM uniq
    UNION ALL SELECT * FROM ref
    """,
)
def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/validate.py): the
    dbt-test/Deequ shape — every check yields (check, violations,
    n_checked), the pipeline gates on violations = 0.  Scale discipline:
    BOTH row-level predicates on orders aggregate in ONE scan
    (conditional sums + stack unpivot — k checks never cost k jobs), key
    uniqueness is one keyed aggregate, and referential integrity is one
    outer join with a match marker.  The report is 4 rows at any corpus
    size."""
    from lvm_datapipe_spark.operators import validate as V

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    rows = V.row_checks(
        orders,
        {
            "orders_totalprice_nonneg": F.col("o_totalprice") < 0,
            "orders_status_domain": ~F.col("o_orderstatus").isin("O", "F", "P"),
        },
    )
    uniq = V.unique_check(li, ["l_orderkey", "l_linenumber"], "lineitem_pk_unique")
    ref = V.ref_check(orders, "o_custkey", cust, "c_custkey",
                      "orders_custkey_refs_customer")
    return V.dq_union(rows, uniq, ref)


@_q(
    "graph_supplier_triangles",
    """
    WITH e AS (
      SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM e e1
      JOIN e e2 ON e2.s1 = e1.s2
      JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2),
    nodes AS (
      SELECT a AS s FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
    SELECT s AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
    FROM nodes GROUP BY s
    """,
)
def graph_supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented triangle counting on the supplier co-occurrence graph
    (suppliers sharing an order) — the clustering-density diagnostic for
    any pairwise-similarity graph (dup clusters, co-citation).  The
    a<b orientation IS the classic optimization: each triangle is
    enumerated exactly once from its lowest vertex, so the 3-way
    self-join explores ordered wedges only — the same degree-ordered
    orientation trick production triangle counters use, here for free
    from the canonical-pair convention.  Edge building is bounded: ~4
    lines per order caps the per-order pair fan-out at 6.  All joins are
    keyed equi-joins on endpoints."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.select("l_orderkey", F.col("l_suppkey").alias("s1"))
    b = li.select("l_orderkey", F.col("l_suppkey").alias("s2"))
    e = (
        a.join(b, "l_orderkey")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    e1 = e
    e2 = e.select(F.col("s1").alias("_2a"), F.col("s2").alias("_2b"))
    e3 = e.select(F.col("s1").alias("_3a"), F.col("s2").alias("_3b"))
    tri = (
        e1.join(e2, F.col("s2") == F.col("_2a"))
        .join(e3, (F.col("s1") == F.col("_3a")) & (F.col("_2b") == F.col("_3b")))
        .select(F.col("s1").alias("a"), F.col("s2").alias("b"), F.col("_2b").alias("c"))
    )
    nodes = (
        tri.select(F.col("a").alias("s"))
        .unionAll(tri.select(F.col("b").alias("s")))
        .unionAll(tri.select(F.col("c").alias("s")))
    )
    return nodes.groupBy(F.col("s").alias("s_suppkey")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


@_q(
    "basket_part_lift",
    """
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b),
    item AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY l_partkey),
    pair AS (
      SELECT x.l_partkey AS p1, y.l_partkey AS p2, CAST(count(*) AS BIGINT) AS co
      FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY x.l_partkey, y.l_partkey
      HAVING count(*) >= 3)
    SELECT p.p1, p.p2, p.co,
           (CAST(p.co AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
             / (CAST(i1.cnt AS DOUBLE) * CAST(i2.cnt AS DOUBLE)) AS lift
    FROM pair p
    JOIN item i1 ON i1.l_partkey = p.p1
    JOIN item i2 ON i2.l_partkey = p.p2
    CROSS JOIN n
    """,
)
def basket_part_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (support + lift over co-purchased
    parts) — the co-occurrence-statistics shape behind token PMI,
    co-click analysis, and recommendation candidates.  The basket
    distinct caps fan-out at (lines-per-order choose 2); the pair
    aggregate shuffles on canonical (p1 < p2) part pairs with a support
    floor applied IN the aggregate (HAVING — pairs below support never
    leave the shuffle); item counts broadcast back and lift = co·N /
    (c1·c2) is one fixed double expression.  PMI is log(lift) — left to
    the consumer, keeping the result log-free and bit-portable."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.distinct()
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    x = b.select("l_orderkey", F.col("l_partkey").alias("p1"))
    y = b.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pair = (
        x.join(y, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 3)
    )
    i1 = item.select(F.col("l_partkey").alias("p1"), F.col("cnt").alias("c1"))
    i2 = item.select(F.col("l_partkey").alias("p2"), F.col("cnt").alias("c2"))
    lift = (F.col("co").cast("double") * F.col("n_orders").cast("double")) / (
        F.col("c1").cast("double") * F.col("c2").cast("double")
    )
    return (
        pair.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .join(F.broadcast(n))
        .select("p1", "p2", "co", lift.alias("lift"))
    )


@_q(
    "sample_temperature_mix",
    """
    WITH cnt AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source),
    wt AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM cnt),
    tot AS (SELECT sum(w) AS sw, sum(n) AS sn FROM wt),
    rates AS (
      SELECT wt.source,
             (wt.w / tot.sw) * (CAST(tot.sn AS DOUBLE) * CAST(0.5 AS DOUBLE))
               / CAST(wt.n AS DOUBLE) AS rate
      FROM wt CROSS JOIN tot)
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE CAST(('0x' || substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          < r.rate * 10000
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the T5/mT5 recipe): sample sources
    proportional to n^α so small sources are up-weighted relative to
    their share without drowning large ones.  α = 0.5 keeps the weight
    function at sqrt — correctly-rounded IEEE on every engine — where a
    general pow() differs across libm builds; the overall budget is half
    the corpus.  Same scale shape as sample_match_target: one tiny
    counts aggregate + a one-row total, both broadcast, and the keep
    decision is the md5 bucket of the doc id — a map-side filter, stable
    under repartitioning.  (Rates may exceed 1 for tiny sources — the
    hash test then keeps every row, the deterministic analog of
    sampling-with-clamp.)"""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    wt = cnt.withColumn("w", F.sqrt(F.col("n").cast("double")))
    tot = wt.agg(F.sum("w").alias("sw"), F.sum("n").alias("sn"))
    rates = wt.join(F.broadcast(tot)).select(
        "source",
        (
            (F.col("w") / F.col("sw"))
            * (F.col("sn").cast("double") * F.lit(0.5))
            / F.col("n").cast("double")
        ).alias("rate"),
    )
    bucket = hash_bucket("doc_id", salt="mix")
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("rate") * 10000)
        .select("doc_id", "source")
    )


@_q(
    "events_top_trigrams",
    """
    WITH seq AS (
      SELECT event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    """,
)
def events_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining lite: per-user event TRIGRAM counts (the
    navigation-path / behavior-motif table extending the Markov bigram
    matrix one step deeper).  ONE user-keyed window shuffle produces both
    lookaheads; the count aggregate runs on at most |event_types|³ rows —
    125 here, constant in the corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return seq.groupBy("t1", "t2", "t3").agg(F.count(F.lit(1)).alias("n"))


@_q(
    "dataset_card_by_source",
    f"""
    WITH t AS (
      SELECT source, lang, n_chars,
             CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(CAST(n_chars AS DECIMAL(27,6))) AS DOUBLE) / COUNT(n_chars)
             AS avg_chars,
           CAST(median(n_tokens) AS DOUBLE) AS median_tokens,
           CAST(quantile_cont(n_tokens, 0.9) AS DOUBLE) AS p90_tokens,
           CAST(SUM(CAST(n_tokens AS DECIMAL(27,6))) AS DOUBLE) AS total_tokens
    FROM t GROUP BY source
    """,
)
def dataset_card_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the summary block a corpus release ships
    (docs, language spread, length distribution, token budget) — in ONE
    grouped aggregate over one scan: decimal-exact mean and totals, exact
    interpolated median and p90 (Spark percentile ≡ DuckDB quantile_cont
    bit-identically, the w5_deciles_bucketed argument).  Report size =
    |sources| rows at any corpus scale."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "lang", "n_chars", X.token_count("text").cast("long").alias("n_tokens")
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        A.decimal_avg("n_chars").alias("avg_chars"),
        F.expr("percentile(n_tokens, 0.5)").cast("double").alias("median_tokens"),
        F.expr("percentile(n_tokens, 0.9)").cast("double").alias("p90_tokens"),
        A.decimal_sum("n_tokens").alias("total_tokens"),
    )


@_q(
    "match_view_purchase_mutual",
    """
    WITH v AS (
      SELECT user_id, event_id AS view_id, ts AS view_ts FROM events
      WHERE event_type = 'view'),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts FROM events
      WHERE event_type = 'purchase'),
    cand AS (
      SELECT v.user_id, v.view_id, v.view_ts, p.purchase_id, p.purchase_ts,
             abs(CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
                 - CAST(floor(epoch(v.view_ts)) AS BIGINT)) AS d
      FROM v JOIN p ON v.user_id = p.user_id
      WHERE abs(CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
                - CAST(floor(epoch(v.view_ts)) AS BIGINT)) <= 3600),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, view_id
                                ORDER BY d, purchase_ts, purchase_id) AS rv,
             row_number() OVER (PARTITION BY user_id, purchase_id
                                ORDER BY d, view_ts, view_id) AS rp
      FROM cand)
    SELECT user_id, view_id, purchase_id, CAST(d AS BIGINT) AS gap_s
    FROM r WHERE rv = 1 AND rp = 1
    """,
)
def match_view_purchase_mutual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-TO-ONE event matching: pair each view with its nearest purchase
    within an hour, each purchase used at most once — the attribution
    shape where as-of joins over-count (two views before one purchase
    both claim it) and plain nearest-neighbor double-spends the target.
    Deterministic mutual-nearest: candidates from a user-keyed range
    join (bounded by per-user event density, never corpus-quadratic),
    then two window passes keep a pair only when each side ranks the
    other first (distance, then time, then id tie-breaks — a total
    order, so both engines pick identical pairs).  Same machinery as the
    scene-boundary eval (operators/scenecut.py::boundary_f1), here on
    the analytics tables with a full oracle."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    d = F.abs(
        F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
    )
    cand = v.join(p, "user_id").withColumn("d", d).filter(F.col("d") <= 3600)
    wv = Window.partitionBy("user_id", "view_id").orderBy(
        "d", "purchase_ts", "purchase_id"
    )
    wp = Window.partitionBy("user_id", "purchase_id").orderBy(
        "d", "view_ts", "view_id"
    )
    return (
        cand.withColumn("rv", F.row_number().over(wv))
        .withColumn("rp", F.row_number().over(wp))
        .filter((F.col("rv") == 1) & (F.col("rp") == 1))
        .select("user_id", "view_id", "purchase_id", F.col("d").cast("long").alias("gap_s"))
    )


def _ivfpq_sql(
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    m: int = 32,
    ksub: int = 8,
    dim: int = _EMB_DIM,
    ivf_seed: int = 42,
    pq_seed: int = 7,
) -> str:
    """DuckDB replay of IVF-PQ: the IVF cell-assignment/probe CTEs from
    _ivf_fixed_sql composed with the PQ encode/LUT/ADC CTEs from
    _pq_adc_sql — both quantizers are the same seeded literals, every sum
    in the Spark fold's left-to-right order."""
    from lvm_datapipe_spark.operators.similarity import (
        ivf_fixed_centroids,
        pq_codebooks,
    )

    cents = ivf_fixed_centroids(n_cells, dim, ivf_seed)
    dsub = dim // m
    cbs = pq_codebooks(m, ksub, dsub, pq_seed)

    def cos_lit(v: str, c) -> str:
        dot_vc = " + ".join(
            f"{v}[{i + 1}]*('{float(c[i])!r}'::DOUBLE)" for i in range(dim)
        )
        dot_cc = sum(float(x) * float(x) for x in c)
        return f"(({dot_vc}) / (sqrt({_dot_sql(v, v)}) * sqrt('{dot_cc!r}'::DOUBLE)))"

    sims = lambda v: "[" + ", ".join(cos_lit(v, c) for c in cents) + "]"  # noqa: E731

    def dist(vec: str, j: int, cent) -> str:
        s = j * dsub
        terms = " + ".join(
            f"(({vec}[{s + i + 1}] - CAST('{float(cent[i])!r}' AS DOUBLE))"
            f" * ({vec}[{s + i + 1}] - CAST('{float(cent[i])!r}' AS DOUBLE)))"
            for i in range(dsub)
        )
        return f"(0.0 + {terms})"

    def dlist(vec: str, j: int) -> str:
        return "[" + ", ".join(dist(vec, j, cbs[j][c]) for c in range(ksub)) + "]"

    code_cols = ",\n             ".join(
        f"(list_position({dlist('v', j)}, list_min({dlist('v', j)})) - 1) AS code_{j}"
        for j in range(m)
    )
    lut_cols = ",\n             ".join(f"{dlist('qv', j)} AS lut_{j}" for j in range(m))
    adc = " + ".join(f"p.lut_{j}[c.code_{j} + 1]" for j in range(m))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT vec_id AS neighbor_id, v, {sims('v')} AS sims FROM e),
    c AS (SELECT neighbor_id,
                 CAST(list_indexof(sims, list_max(sims)) - 1 AS INTEGER) AS cell,
             {code_cols}
          FROM c0),
    q0 AS (SELECT vec_id AS query_id, v AS qv, {sims('v')} AS sims
           FROM e WHERE vec_id < 10),
    qs AS (SELECT query_id, qv, u.i AS cell, sims[u.i + 1] AS cell_sim
           FROM q0 CROSS JOIN (SELECT unnest(generate_series(0, {n_cells - 1})) AS i) u),
    probe0 AS (
      SELECT query_id, qv, cell FROM (
        SELECT query_id, qv, cell,
               ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cell_sim DESC, cell) AS rn
        FROM qs) WHERE rn <= {n_probe}),
    probe AS (
      SELECT query_id, cell,
             {lut_cols}
      FROM probe0),
    cand AS (
      SELECT p.query_id, c.neighbor_id, ({adc}) AS adc_dist
      FROM c JOIN probe p ON c.cell = p.cell
      WHERE c.neighbor_id <> p.query_id)
    SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adc_dist ASC, neighbor_id ASC) AS INTEGER) AS rank,
           adc_dist
    FROM cand
    QUALIFY rank <= {k}
    """


# IVF-PQ: the FAISS-standard layout — coarse cells prune WHICH corpus
# slices a query touches, PQ codes compress WHAT is read per candidate.
@_q("ann_ivfpq_topk", _ivfpq_sql())
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k (similarity.py::ivfpq_topk): composes the two seeded
    fixed quantizers — IVF cell pruning (keyed equi-join on the probed
    cells; at 100 TB, cell-partitioned storage turns this into partition
    pruning) and PQ/ADC ranking (the corpus side reads m int codes, not
    vectors).  Fully oracle-checked end to end: assignment argmax, probe
    ranking, argmin codes, LUT lookups, and the final ADC rank replay
    bit-identically in DuckDB."""
    from lvm_datapipe_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivfpq_topk(emb, queries, k=10)


@_q(
    "w10_share_of_group",
    """
    WITH s AS (
      SELECT event_type,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)
               AS type_total
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           e.value / s.type_total AS share_of_type
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE s.type_total <> 0.0
    """,
)
def w10_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report (share-of-group): each row's fraction of its
    group's total — the normalization behind mixture weights and
    traffic-share dashboards.  Written as a tiny decimal-exact aggregate
    BROADCAST back rather than a SUM-over-window: the window form
    re-shuffles the corpus on the group key, the broadcast form is a
    map-side division after a |groups|-row join — same result, one
    corpus shuffle fewer (the zscore/MAD discipline)."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(27,6)")
    s = ev.groupBy("event_type").agg(
        F.sum(dec).cast("string").cast("double").alias("type_total")
    )
    return (
        ev.join(F.broadcast(s), "event_type")
        .filter(F.col("type_total") != 0.0)
        .select(
            "event_id",
            "event_type",
            "value",
            (F.col("value") / F.col("type_total")).alias("share_of_type"),
        )
    )


@_q(
    "histogram2d_qty_price",
    """
    SELECT CAST(least(9, greatest(0, CAST(floor(l_quantity / 5.0) AS INTEGER))) AS INTEGER) AS qty_bin,
           CAST(least(9, greatest(0, CAST(floor(l_extendedprice / 10000.0) AS INTEGER))) AS INTEGER) AS price_bin,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def histogram2d_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional equi-width histogram (the heat-map/joint-density
    primitive): clamp-floor binning on both axes in the projection, ONE
    keyed aggregate with map-side partials on a key space bounded by
    bins² — never by rows.  The A6 1-D histogram's numpy-bin semantics
    extended to joint distributions."""
    li = load_table(spark, sf_dir, "lineitem")

    def bin_(col, width):
        return F.least(
            F.lit(9), F.greatest(F.lit(0), F.floor(F.col(col) / width).cast("int"))
        )

    return (
        li.select(
            bin_("l_quantity", 5.0).alias("qty_bin"),
            bin_("l_extendedprice", 10000.0).alias("price_bin"),
        )
        .groupBy("qty_bin", "price_bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "profile_lineitem_numeric",
    """
    WITH w AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_0,
             CAST(min(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS mn_0,
             CAST(max(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS mx_0,
             CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_quantity) AS av_0,
             CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_1,
             CAST(min(CAST(l_extendedprice AS DOUBLE)) AS DOUBLE) AS mn_1,
             CAST(max(CAST(l_extendedprice AS DOUBLE)) AS DOUBLE) AS mx_1,
             CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_extendedprice) AS av_1,
             CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_2,
             CAST(min(CAST(l_discount AS DOUBLE)) AS DOUBLE) AS mn_2,
             CAST(max(CAST(l_discount AS DOUBLE)) AS DOUBLE) AS mx_2,
             CAST(SUM(CAST(CAST(l_discount AS DOUBLE) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_discount) AS av_2
      FROM lineitem)
    SELECT 'l_quantity' AS column, n AS n_rows, nn_0 AS n_nulls,
           mn_0 AS min_value, mx_0 AS max_value, av_0 AS mean_value FROM w
    UNION ALL
    SELECT 'l_extendedprice', n, nn_1, mn_1, mx_1, av_1 FROM w
    UNION ALL
    SELECT 'l_discount', n, nn_2, mn_2, mx_2, av_2 FROM w
    """,
)
def profile_lineitem_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-health profiling (operators/analyze.py::profile_columns):
    nulls/min/max/decimal-exact mean for three numeric fact columns in
    ONE aggregate over one scan — the drop-intake report.  k columns
    never cost k jobs (stack unpivot of conditional aggregations, the
    validate.row_checks discipline)."""
    from lvm_datapipe_spark.operators.analyze import profile_columns

    li = load_table(spark, sf_dir, "lineitem")
    return profile_columns(li, ["l_quantity", "l_extendedprice", "l_discount"])


@_q(
    "text_novelty_score",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             t[u.i] || ' ' || t[u.i + 1] || ' ' || t[u.i + 2] AS s
      FROM toks
      CROSS JOIN (SELECT unnest(generate_series(1, 400)) AS i) u
      WHERE u.i + 2 <= len(t)),
    firstseen AS (
      SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS novelty
    FROM sh JOIN firstseen f ON f.s = sh.s
    GROUP BY sh.doc_id
    """,
)
def text_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle novelty — the fraction of a document's 3-gram shingles it
    introduces to the corpus (first occurrence under the doc_id total
    order): near-1 docs contribute new content, near-0 docs are
    recombinations of existing text — the contribution-scoring signal
    that catches template spam whole-doc dedup misses.  Shape: distinct
    (doc, shingle) rows → ONE shingle-keyed min aggregate (the global
    first-seen table) → equi-join back on the shingle hash → per-doc
    fold.  Same skeleton as text_dup_sentence_fraction; shingle keys are
    content-uniform, no hot keys."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("t"),
    )
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(t) - 2, 0)), "
                    "i -> concat(t[i-1], ' ', t[i], ' ', t[i+1]))"
                )
            ).alias("s"),
        )
        .distinct()
    )
    firstseen = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firstseen, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_shingles").cast("double")).alias(
                "novelty"
            ),
        )
    )


@_q(
    "dedup_soft_weights",
    """
    WITH fp AS (
      SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
      FROM documents),
    sz AS (SELECT f, CAST(count(*) AS BIGINT) AS cluster_size FROM fp GROUP BY f)
    SELECT fp.doc_id, sz.cluster_size,
           1.0 / CAST(sz.cluster_size AS DOUBLE) AS weight
    FROM fp JOIN sz ON fp.f = sz.f
    """,
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT deduplication: instead of dropping duplicates, weight each doc
    by 1/cluster_size so a dup group contributes one document's worth of
    gradient in expectation — the down-weighting alternative (SemDeDup-
    style) when hard dedup would lose paraphrase diversity.  One
    fingerprint-keyed aggregate + an equi-join back; the exact-dup
    fingerprint (pipeline_curate's normalization) keys the clusters here,
    and the LSH cluster machinery (dedup_clusters_lsh) swaps in for
    near-dup clusters with the same weight formula."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", X.fingerprint("text").alias("f"))
    sz = fp.groupBy("f").agg(F.count(F.lit(1)).alias("cluster_size"))
    return fp.join(sz, "f").select(
        "doc_id",
        "cluster_size",
        (F.lit(1.0) / F.col("cluster_size").cast("double")).alias("weight"),
    )


@_q(
    "events_native_session_window",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS sid
      FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           {_dsum('value')} AS session_value
    FROM sessions GROUP BY user_id, sid
    """,
)
def events_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation — the fourth and last
    sessionization surface (alongside the gaps-and-islands window, the
    applyInPandasWithState sessionizer, and the transformWithState
    processor), and a CROSS-VALIDATION of the built-in against the
    islands oracle: session_window merges an event iff it lands STRICTLY
    before the previous event's time + gap (an exact-boundary event
    starts a NEW session — hence >= in the oracle's new-session flag) and
    reports window.end as last_event + gap.  One keyed aggregate; in
    streaming mode the same expression runs with watermarked state."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n_events"),
        A.decimal_sum("value").alias("session_value"),
    )
    return g.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "session_value",
    )


@_q(
    "dedup_ppjoin_pairs",
    r"""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
      FROM documents),
    freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
    sized AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
    ranked AS (
      SELECT t.doc_id, t.tok, s.n,
             row_number() OVER (PARTITION BY t.doc_id ORDER BY f.tf, t.tok) AS r
      FROM toks t JOIN freq f ON f.tok = t.tok JOIN sized s ON s.doc_id = t.doc_id),
    prefix AS (
      SELECT doc_id, tok, n FROM ranked WHERE r <= n - ((9 * n + 9) // 10) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b
      FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id
      WHERE 10 * b.n >= 9 * a.n AND 10 * a.n >= 9 * b.n),
    inter AS (
      SELECT c.id_a, c.id_b, c.n_a, c.n_b, CAST(count(*) AS BIGINT) AS i
      FROM cand c
      JOIN toks ta ON ta.doc_id = c.id_a
      JOIN toks tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
      GROUP BY c.id_a, c.id_b, c.n_a, c.n_b)
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(n_a + n_b - i AS DOUBLE) AS jaccard
    FROM inter WHERE 10 * i >= 9 * (n_a + n_b - i)
    """,
)
def dedup_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT set-similarity join (operators/dedup.py::
    ppjoin_pairs, Jaccard ≥ 9/10 on distinct token sets — the tiny
    synthetic vocabulary makes token SETS broadly similar, so the
    realistic threshold sits high): the AllPairs/
    PPJoin candidate strategy — only each doc's rarest n − ⌈t·n⌉ + 1
    tokens are indexed, every qualifying pair provably collides there,
    and all thresholds are integer arithmetic (rational t) so membership
    never touches a float.  Exact like the posting-list join, but the
    index shrinks exactly where posting lists blow up (hot tokens sit at
    the END of the frequency order and rarely enter a prefix)."""
    from lvm_datapipe_spark.operators.dedup import ppjoin_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ppjoin_pairs(docs)


# ---------------------------------------------------------------------------
# r5 session-3: the remaining TPC-H join shapes (Q2/Q9/Q11/Q12/Q15/Q16/Q20),
# adapted to the driver's schema — the testdata has no partsupp table and no
# l_shipmode/l_commitdate/l_receiptdate columns, so each query keeps the
# ORIGINAL'S PLAN SHAPE (correlated min, global-scalar HAVING, nested
# semi-joins, conditional aggregation, scalar-max view, distinct-count with
# exclusion, multi-level quantity share) over the columns that exist.  The
# substitutions are named per query.
# ---------------------------------------------------------------------------


@_q(
    "q2_min_cost_supplier",
    """
    WITH parts_f AS (
      SELECT p_partkey, p_retailprice FROM part
      WHERE p_size = 5 AND p_type = 'STANDARD'),
    cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM parts_f)
      GROUP BY l.l_partkey, l.l_suppkey),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'),
    pc AS (
      SELECT c.l_partkey, c.unit_cost, eu.s_name, eu.s_acctbal, eu.n_name
      FROM cost c JOIN eu ON eu.s_suppkey = c.l_suppkey),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS best_cost
      FROM pc GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_retailprice, pc.s_name, pc.s_acctbal, pc.n_name,
           pc.unit_cost AS supply_cost
    FROM pc
    JOIN best ON best.l_partkey = pc.l_partkey
             AND pc.unit_cost = best.best_cost
    JOIN parts_f p ON p.p_partkey = pc.l_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN subquery —
    for each qualifying part, the supplier(s) in one region achieving the
    minimum supply cost.  No partsupp table exists here, so the supply
    cost is DERIVED from the fact table (min observed unit price per
    (part, supplier) — min_cost.py analog of the reference's cheapest-
    source selection): one keyed agg builds the ps view, a second keyed
    agg computes the per-part floor, and an equality self-join de-
    correlates the subquery (the Catalyst rewrite, written out).  The
    region→nation→supplier dim chain is broadcast (both dims are fixed
    size; supplier rows after the region filter are a few % of an
    already-small table); the part filter semi-joins the fact scan FIRST
    so both aggs run over the pruned key space.  Two shuffles, both on
    l_partkey-led keys — AQE lines them up."""
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 5) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    li_f = li.join(
        F.broadcast(part_f.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    cost = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pc = cost.join(
        F.broadcast(eu), cost.l_suppkey == eu.s_suppkey
    ).select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    best = pc.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    return (
        pc.join(
            best.withColumnRenamed("l_partkey", "_bk"),
            (F.col("l_partkey") == F.col("_bk"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_retailprice",
            "s_name",
            "s_acctbal",
            "n_name",
            F.col("unit_cost").alias("supply_cost"),
        )
    )


@_q(
    "q9_nation_profit",
    f"""
    SELECT n.n_name, CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
           {_dsum('(l.l_extendedprice * (1 - l.l_discount)) - ((CAST(0.6 AS DOUBLE) * p.p_retailprice) * l.l_quantity)')} AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name, year(l.l_shipdate)
    """,
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): the
    many-way star join with a derived measure — fact × part (name
    pattern) × supplier × nation, profit aggregated per (nation, year).
    ps_supplycost does not exist here, so cost is proxied as 60% of the
    part's retail price (explicitly parenthesised so both engines fold
    the doubles in the same order).  part after the LIKE filter and the
    supplier→nation chain are both broadcast — the only shuffle is the
    final (n_name, year) aggregate, which is 25×7 groups: partial maps
    collapse everything executor-side.  The name LIKE '%widget%' cannot
    push to parquet as a range but prunes rows before the join."""
    part_w = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    ) - ((F.lit(0.6) * F.col("p_retailprice")) * F.col("l_quantity"))
    return (
        li.join(F.broadcast(part_w), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name", F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(A.decimal_sum(profit).alias("profit"))
    )


@_q(
    "q11_important_parts",
    f"""
    WITH nat_sup AS (
      SELECT s.s_suppkey FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'),
    per_part AS (
      SELECT l.l_partkey, {_dsum('l.l_extendedprice')} AS part_value
      FROM lineitem l
      WHERE l.l_suppkey IN (SELECT s_suppkey FROM nat_sup)
      GROUP BY l.l_partkey),
    tot AS (
      SELECT CAST(SUM(CAST(part_value AS DECIMAL(27,6))) AS DOUBLE) AS t
      FROM per_part)
    SELECT per_part.l_partkey AS p_partkey, per_part.part_value
    FROM per_part CROSS JOIN tot
    WHERE per_part.part_value > CAST(0.001 AS DOUBLE) * tot.t
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): a grouped
    aggregate filtered by a GLOBAL scalar fraction of the SAME aggregate
    — the HAVING-over-global-subquery pattern.  Stock value (partsupp)
    does not exist, so "value" is the shipped value (sum of extended
    price) of each part via one nation's suppliers.  One keyed shuffle
    builds per-part values; the global total re-aggregates the per-part
    DOUBLES through DECIMAL(27,6) (order-insensitive, so the one-row
    scalar is bit-stable under any partitioning) and broadcasts back as
    a literal filter — the quality_gate_tokens pattern.  The nation's
    supplier set is a broadcast semi-join against the fact scan."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    nat_sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    per_part = (
        li.join(
            F.broadcast(nat_sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(A.decimal_sum("l_extendedprice").alias("part_value"))
    )
    tot = per_part.agg(A.decimal_sum("part_value").alias("t"))
    return (
        per_part.join(F.broadcast(tot))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("t"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
    )


@_q(
    "q12_priority_by_returnflag",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes vs order priority): the
    fact-to-fact join with CONDITIONAL aggregation — counting high- vs
    low-priority orders per mode.  l_shipmode/l_commitdate/l_receiptdate
    do not exist, so the mode dimension is l_returnflag and the
    late-shipment predicate is a one-year shipdate window (pushed to the
    parquet scan).  The join shuffles both sides on the order key; the
    CASE counters fold map-side into 3 groups × 2 longs, so the second
    exchange moves a handful of rows.  The year filter prunes the fact
    scan before the join (PushedFilters)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        )
        .select("l_orderkey", "l_returnflag")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@_q(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey, {_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey),
    mx AS (SELECT MAX(total_revenue) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev
    CROSS JOIN mx
    JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = mx.m
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the revenue VIEW + scalar-MAX
    selection — suppliers whose quarterly revenue equals the maximum.
    The view is one keyed agg over the date-pruned fact scan (decimal
    accumulation, so the doubles compared for the tie are bit-identical
    across engines and partitionings); the max re-aggregates ~100
    supplier rows to one scalar, broadcast back as a literal equality
    filter.  The supplier name join is broadcast.  Equality-on-max keeps
    ALL tied suppliers — the original's correctness subtlety — without
    any window or sort."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = li.groupBy("l_suppkey").agg(
        A.decimal_sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_q(
    "q16_supplier_part_count",
    """
    WITH bad_sup AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < CAST(0.0 AS DOUBLE)),
    ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM bad_sup))
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT
    supplier) per part attribute group, with a NOT-IN supplier exclusion.
    partsupp is derived as the DISTINCT (part, supplier) pairs observed
    in the fact table; the "customer complaints" exclusion becomes
    negative-balance suppliers (an anti-join against a broadcast
    handful).  The distinct-pair build and the distinct-count agg shuffle
    on the part key; the part attribute filter (brand/type/size IN-list)
    is applied via broadcast join before the count so the heavy agg runs
    over qualifying parts only."""
    bad_sup = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad_sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .distinct()
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@_q(
    "q20_excess_share_suppliers",
    f"""
    WITH parts_f AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    li97 AS (
      SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM parts_f)),
    per_ps AS (
      SELECT l_partkey, l_suppkey, {_dsum('l_quantity')} AS qty
      FROM li97 GROUP BY l_partkey, l_suppkey),
    per_p AS (
      SELECT l_partkey, CAST(SUM(CAST(qty AS DECIMAL(27,6))) AS DOUBLE) AS tot
      FROM per_ps GROUP BY l_partkey),
    excess AS (
      SELECT DISTINCT per_ps.l_suppkey
      FROM per_ps JOIN per_p ON per_p.l_partkey = per_ps.l_partkey
      WHERE per_ps.qty > CAST(0.5 AS DOUBLE) * per_p.tot),
    asia_sup AS (
      SELECT s.s_suppkey FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA')
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM excess)
      AND s.s_suppkey IN (SELECT s_suppkey FROM asia_sup)
    """,
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the DOUBLY-NESTED IN
    subquery — suppliers (in one region) holding an excess share of a
    name-filtered part family.  availqty does not exist, so "excess" is
    a supplier shipping >50% of a part's total 1997 quantity: a
    two-level aggregation ((part, supplier) → part) whose levels share
    the l_partkey shuffle key, a share filter joining the levels
    (broadcast of the per-part totals — one row per qualifying part),
    then two semi-joins reduce the supplier dim.  Both quantity sums go
    through DECIMAL so the 0.5-share comparison is bit-stable.  The name
    LIKE prefix and date window prune the fact scan before any shuffle."""
    parts_f = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li97 = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(
            F.broadcast(parts_f),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    per_ps = li97.groupBy("l_partkey", "l_suppkey").agg(
        A.decimal_sum("l_quantity").alias("qty")
    )
    per_p = per_ps.groupBy("l_partkey").agg(
        A.decimal_sum("qty").alias("tot")
    )
    excess = (
        per_ps.join(
            F.broadcast(per_p.withColumnRenamed("l_partkey", "_pk")),
            F.col("l_partkey") == F.col("_pk"),
        )
        .filter(F.col("qty") > F.lit(0.5) * F.col("tot"))
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("as_suppkey"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    return (
        supp.join(
            excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(
            F.broadcast(asia_sup),
            F.col("s_suppkey") == F.col("as_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@_q(
    "range_join_active_spans",
    """
    WITH pts AS (
      SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events WHERE event_type = 'purchase'),
    spans AS (
      SELECT user_id,
             CAST(floor(epoch(MIN(ts))) AS BIGINT) AS t0,
             CAST(floor(epoch(MAX(ts))) AS BIGINT) AS t1
      FROM events GROUP BY user_id)
    SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_covering_spans
    FROM pts p JOIN spans s ON p.t >= s.t0 AND p.t <= s.t1
    GROUP BY p.event_id
    """,
)
def range_join_active_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS point-in-interval join via operators/asof.py::
    binned_range_join — for each purchase event, how many users' activity
    spans cover its timestamp.  Spark compiles the naive inequality-only
    condition (the oracle's form) to BroadcastNestedLoopJoin or a
    cartesian; the operator explodes each span into the day-sized bins it
    overlaps, hash-joins points on their single containing bin, and
    re-applies the exact [t0, t1] residual — one equi shuffle, |pairs|
    bounded by bins-overlap instead of |points|×|intervals|.  Span tables
    here are per-user (data-sized, grows with the corpus — the case where
    "just broadcast it" stops working and binning is the only exact
    scale path)."""
    from lvm_datapipe_spark.operators.asof import binned_range_join

    ev = load_table(spark, sf_dir, "events")
    pts = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", F.unix_timestamp("ts").alias("t"))
    )
    spans = ev.groupBy("user_id").agg(
        F.unix_timestamp(F.min("ts")).alias("t0"),
        F.unix_timestamp(F.max("ts")).alias("t1"),
    )
    joined = binned_range_join(
        pts, spans, point_col="t", start_col="t0", end_col="t1",
        bin_width=86400,
    )
    return joined.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_covering_spans")
    )


@_q(
    "doc_contiguous_ids",
    """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY lang, doc_id) - 1 AS BIGINT)
             AS row_id
    FROM documents
    """,
)
def doc_contiguous_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global ids 0..n-1 in (lang, doc_id) order via
    operators/relational.py::contiguous_ids — the oracle's
    row_number() OVER (ORDER BY ...) is a SinglePartition window (the
    whole corpus through one task); the operator replaces it with ONE
    range exchange + per-partition offsets (a num_partitions-sized
    metadata collect) + an order-preserving Arrow-batched local counter.
    Same assignment, no global funnel — the shuffle-free analog of
    zipWithIndex for DataFrames."""
    from lvm_datapipe_spark.operators.relational import contiguous_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return contiguous_ids(docs, ["lang", "doc_id"]).select("doc_id", "row_id")


def _pagerank_oracle_sql(n_iter: int = 5) -> str:
    """Unrolled power-iteration oracle for graph_nation_pagerank, in the
    operator's FIXED-POINT integer arithmetic: ranks are BIGINT multiples
    of 1e-12, per-edge contributions are (rank * w) // out, and the
    damped update is base + (17 * sum) // 20 — every step integer, so
    the replay is bit-identical by construction (floating-point PageRank
    is not portable: double->decimal rounding differs between engines in
    the last ulp).  Fixed iteration count is what makes PageRank
    SQL-replayable at all — a convergence loop needs recursion that
    DuckDB's recursive CTEs (no aggregates in the recursive term) cannot
    run."""
    head = """
    WITH e AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      GROUP BY cn.n_name, sn.n_name),
    outw AS (
      SELECT src, CAST(SUM(w) AS BIGINT) AS o FROM e GROUP BY src),
    nodes AS (
      SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS (
      SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS r
      FROM nodes CROSS JOIN nn)"""
    step = """,
    r{k} AS (
      SELECT n.node,
             CAST((3 * 1000000000000) // (20 * nn.n)
                  + (17 * COALESCE(c.s, 0)) // 20 AS BIGINT) AS r
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst, CAST(SUM((p.r * e.w) // o.o) AS BIGINT) AS s
        FROM e
        JOIN outw o ON o.src = e.src
        JOIN r{j} p ON p.node = e.src
        GROUP BY e.dst) c
      ON c.dst = n.node)"""
    body = "".join(step.format(k=k, j=k - 1) for k in range(1, n_iter + 1))
    return (
        head + body
        + f"""
    SELECT node, r AS rank_fp,
           CAST(r AS DOUBLE) / CAST(1000000000000 AS DOUBLE) AS rank
    FROM r{n_iter}"""
    )


@_q("graph_nation_pagerank", _pagerank_oracle_sql(5))
def graph_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph (customer nation →
    supplier nation, edge weight = lineitem count) via
    operators/graph.py::pagerank — the power-iteration sibling of
    connected_components.  Edges aggregate from the fact table (the heavy
    shuffles); the 5 fixed iterations then run entirely on |V|-sized rank
    state against the once-persisted edge list — two keyed shuffles per
    round, no driver round-trips (no convergence action), localCheckpoint
    truncating lineage.  All rank arithmetic is FIXED-POINT BIGINT
    (multiples of 1e-12), so all five iterates are bit-identical to the
    unrolled SQL replay by construction — see the operator docstring for
    why floating-point PageRank cannot be engine-portable."""
    from lvm_datapipe_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("src")
        )
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("dst")
        )
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(edges, "src", "dst", weight="w", n_iter=5)


@_q(
    "scd2_temporal_join",
    """
    WITH v0 AS (
      SELECT doc_id, md5('v0' || text) AS fp,
             TIMESTAMP '2023-01-01 00:00:00' AS valid_from,
             TIMESTAMP '2024-01-15 00:00:00' AS valid_to
      FROM documents WHERE doc_id % 5 <> 0),
    v1 AS (
      SELECT doc_id, md5(text) AS fp,
             TIMESTAMP '2024-01-15 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM documents),
    versions AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1),
    facts AS (
      SELECT event_id, ts, CAST(event_id % 97 AS BIGINT) AS doc_id
      FROM events WHERE event_type = 'purchase')
    SELECT f.event_id, f.doc_id, v.fp
    FROM facts f
    LEFT JOIN versions v
      ON v.doc_id = f.doc_id
     AND f.ts >= v.valid_from
     AND (v.valid_to IS NULL OR f.ts < v.valid_to)
    """,
)
def scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ side of SCD2 (operators/scd.py::temporal_join): each fact
    joins the dimension VERSION valid at its event time — key equality
    plus a validity-window residual, which Spark keeps as ONE keyed
    hash/SMJ shuffle (never a nested loop; SCD2 non-overlap guarantees no
    fan-out).  The versions table is a deterministic two-version view of
    documents (docs ≡0 mod 5 were "created" at the Jan-15 boundary, so
    pre-boundary facts on them exercise the left-miss path with null
    dimension attributes — the backfill case)."""
    from lvm_datapipe_spark.operators.scd import temporal_join

    docs = load_table(spark, sf_dir, "documents")
    v0 = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.md5(F.concat(F.lit("v0"), F.col("text")).cast("binary")).alias("fp"),
        F.to_timestamp(F.lit("2023-01-01 00:00:00")).alias("valid_from"),
        F.to_timestamp(F.lit("2024-01-15 00:00:00")).alias("valid_to"),
    )
    v1 = docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.to_timestamp(F.lit("2024-01-15 00:00:00")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    versions = v0.unionByName(v1)
    facts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", (F.col("event_id") % 97).alias("doc_id"))
    )
    joined = temporal_join(
        facts, versions, key="doc_id", fact_ts="ts", how="left"
    )
    return joined.select("event_id", "doc_id", "fp")


@_q(
    "agg_incremental_merge",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           {_dsum('value')} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate-view maintenance (operators/aggregates.py::
    agg_state/merge_agg_state): the materialized per-type state over
    history (events before Jan 20) absorbs the new partition (Jan 20
    onward) with ONE state-sized full-outer join — no history re-scan.
    The ORACLE is the from-scratch aggregate over the whole corpus: the
    query passes exactly because the state keeps DECIMAL sums, making
    "incremental ⊕ delta" bit-identical to full recompute (a double
    state would drift with addition order) — the invariant this pattern
    lives or dies on at 100 TB."""
    from lvm_datapipe_spark.operators.aggregates import agg_state, merge_agg_state

    ev = load_table(spark, sf_dir, "events")
    cut = F.to_timestamp(F.lit("2024-01-20 00:00:00"))
    state = agg_state(ev.filter(F.col("ts") < cut), ["event_type"], "value")
    delta = agg_state(ev.filter(F.col("ts") >= cut), ["event_type"], "value")
    merged = merge_agg_state(state, delta, ["event_type"])
    return merged.select(
        "event_type",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@_pytest_q(
    "events_sliding_distinct_users",
    """
    WITH g AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS grid
      FROM events),
    x AS (
      SELECT user_id, grid - k.k * INTERVAL '1 hour' AS window_start
      FROM g CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5]) AS k) k)
    SELECT window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM x GROUP BY window_start
    """,
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per 6-hour window sliding hourly.  DEMOTED to a
    pytest-only semantics oracle in r6 (VERDICT r5 item 4): the sliding
    window fans every event into 6 windows BEFORE the distinct — the
    count-distinct shuffle moves 6× the corpus, real money at 100 TB.  The
    DECLARED sliding-distinct queries are the hourly-grid exact form
    ``events_hourly_distinct_users`` (no fan-out) and the mergeable-sketch
    path (aggregates.hll_partials per hour + hll_merge over 6 stored
    sketches per window — no fan-out, no re-scan, ~2% error; streaming twin
    ``windowed_distinct_users``).  This form stays here to pin the exact
    fan-out semantics against DuckDB at test scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"), )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n_users")
    )


@_q(
    "events_hourly_distinct_users",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY window_start
    """,
)
def events_hourly_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per hourly tumbling window — the DECLARED
    scale-safe sibling of the demoted sliding form: tumbling windows
    partition events (each row lands in exactly ONE window), so the
    count-distinct shuffle moves the corpus once, not 6×.  Sliding reads
    at 100 TB come from the mergeable-sketch path instead
    (aggregates.hll_partials per hour + hll_merge over the 6 stored hourly
    sketches per window — no fan-out, no re-scan, ~2% error; streaming
    twin ``windowed_distinct_users``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n_users")
    )


@_q(
    "negatives_ring_by_lang",
    """
    WITH h AS (
      SELECT doc_id, lang, md5('ring1' || CAST(doc_id AS VARCHAR)) AS hk
      FROM documents),
    r AS (
      SELECT doc_id, lang, hk,
             lead(doc_id, 1) OVER w AS neg_1,
             lead(doc_id, 2) OVER w AS neg_2,
             first_value(doc_id) OVER w AS ring_first,
             nth_value(doc_id, 2) OVER w AS ring_second,
             CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS ring_n,
             CAST(row_number() OVER w AS BIGINT) AS pos
      FROM h
      WINDOW w AS (PARTITION BY lang ORDER BY hk, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
    SELECT doc_id, lang,
           CASE WHEN ring_n < 2 THEN NULL
                WHEN neg_1 IS NULL THEN ring_first ELSE neg_1 END AS neg_1,
           CASE WHEN ring_n < 3 THEN NULL
                WHEN neg_2 IS NULL THEN
                  CASE WHEN pos = ring_n THEN ring_second ELSE ring_first END
                ELSE neg_2 END AS neg_2
    FROM r
    """,
)
def negatives_ring_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE sampling for contrastive training: each doc
    gets 2 pseudo-random same-language negatives by walking a salted-hash
    RING — sort each language's docs by md5('ring1'||id), take the next
    two, wrapping at the end.  Ring order is uniform-ish and reproducible
    (resampling = change the salt), negatives are collision-free by
    construction (successors of distinct positions differ), and the whole
    assignment is ONE per-language window shuffle — no random() (engines
    would diverge), no self-join, no candidate generation.  Degenerate
    rings (|lang| < 3) yield nulls rather than self-negatives.  At 100 TB
    the partition key is the grouping column (language/domain/source) —
    the same stratification the samplers use; a corpus-global ring would
    be the SinglePartition anti-pattern."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.concat(F.lit("ring1"), F.col("doc_id").cast("string")).cast("binary")).alias("hk"),
    )
    w = Window.partitionBy("lang").orderBy("hk", "doc_id")
    wf = Window.partitionBy("lang").orderBy("hk", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wn = Window.partitionBy("lang")
    r = docs.select(
        "doc_id",
        "lang",
        F.lead("doc_id", 1).over(w).alias("neg_1_raw"),
        F.lead("doc_id", 2).over(w).alias("neg_2_raw"),
        F.first("doc_id").over(wf).alias("ring_first"),
        F.nth_value("doc_id", 2).over(wf).alias("ring_second"),
        F.count(F.lit(1)).over(wn).alias("ring_n"),
        F.row_number().over(w).cast("long").alias("pos"),
    )
    neg1 = F.when(F.col("ring_n") < 2, F.lit(None)).otherwise(
        F.coalesce(F.col("neg_1_raw"), F.col("ring_first"))
    )
    neg2 = F.when(F.col("ring_n") < 3, F.lit(None)).otherwise(
        F.coalesce(
            F.col("neg_2_raw"),
            F.when(F.col("pos") == F.col("ring_n"), F.col("ring_second"))
            .otherwise(F.col("ring_first")),
        )
    )
    return r.select(
        "doc_id", "lang", neg1.alias("neg_1"), neg2.alias("neg_2")
    )


@_q(
    "curriculum_schedule",
    r"""
    WITH f AS (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE)
               / CAST(len(list_filter(string_split_regex(text, '\s+'),
                          x -> x <> '')) AS DOUBLE) AS difficulty
      FROM documents
      WHERE len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) > 0)
    SELECT doc_id, difficulty,
           CASE WHEN difficulty < CAST(5.4 AS DOUBLE) THEN 0
                WHEN difficulty < CAST(5.6 AS DOUBLE) THEN 1
                ELSE 2 END AS stage,
           md5('cur1' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM f
    """,
)
def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment for staged training: difficulty (mean word
    length — any scalar score plugs in), fixed-threshold pacing stages,
    and a salted-md5 shuffle key giving a DETERMINISTIC within-stage
    order.  Emitting the (stage, shuffle_key) SORT KEY instead of a
    materialized rank is the scale decision: the query stays entirely
    scan-shaped (zero shuffles, zero windows — a per-stage row_number
    would funnel each stage through one task), and the training-data
    writer realizes the order with one repartitionByRange on exactly
    these columns (the contiguous_ids recipe).  Reshuffling an epoch =
    change the salt."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    )
    difficulty = F.col("n_chars").cast("double") / n_tokens.cast("double")
    return (
        docs.filter(n_tokens > 0)
        .select(
            "doc_id",
            difficulty.alias("difficulty"),
            F.when(difficulty < 5.4, 0)
            .when(difficulty < 5.6, 1)
            .otherwise(2)
            .alias("stage"),
            F.md5(
                F.concat(F.lit("cur1"), F.col("doc_id").cast("string")).cast("binary")
            ).alias("shuffle_key"),
        )
    )


@_q(
    "dedup_substring_spans",
    """
    WITH w AS (
      SELECT doc_id, md5(substr(text, p * 32 + 1, 64)) AS h
      FROM documents
      CROSS JOIN (SELECT unnest(range(0, 1000)) AS p)
      WHERE p * 32 + 64 <= len(text)),
    ok AS (
      SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY h)
      WHERE nd BETWEEN 2 AND 8),
    wk AS (SELECT DISTINCT doc_id, h FROM w WHERE h IN (SELECT h FROM ok))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared_windows
    FROM wk a JOIN wk b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT substring-level near-dup detection (the Lee et al. 2022
    "Deduplicating Training Data" public recipe, stride-windowed):
    64-char windows at stride 32 are hashed once per doc (scan-shaped
    posexplode — no tokenizer), windows seen in >8 distinct docs are
    dropped as STOP WINDOWS (boilerplate — the same bounded-posting-list
    cap as the n-gram Jaccard plan, mirrored in the oracle; without it
    one hot template line makes a quadratic posting list at corpus
    scale), and the surviving window table self-joins on the hash — one
    keyed shuffle, pair cardinality bounded by cap²·n_windows.  Stride
    alignment means a shared literal run ≥ 95 chars always shares at
    least one aligned window; shorter overlaps may be missed (recall
    knob: stride), but every reported pair truly shares a 64-char
    span — exact precision, which is the half that matters for
    deletion decisions.  Windows are SPEC-CAPPED at 1000 per doc
    (chars past 32 095 are not scanned — a per-doc work bound against
    pathological megabyte docs; raise both the Spark least() and the
    oracle range() to extend it)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_win = F.least(
        F.floor((F.length("text") - F.lit(64)) / F.lit(32)) + 1, F.lit(1000)
    )
    w = (
        docs.filter(F.length("text") >= 64)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_win - 1)).alias("p"),
            "text",
        )
        .select(
            "doc_id",
            F.md5(
                F.substring(F.col("text"), F.col("p") * 32 + 1, 64).cast("binary")
            ).alias("h"),
        )
    )
    ok = (
        w.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= 8))
        .select("h")
    )
    wk = w.join(ok, "h", "left_semi").distinct()
    a = wk.select(F.col("doc_id").alias("id_a"), "h")
    b = wk.select(F.col("doc_id").alias("id_b"), F.col("h").alias("h2"))
    return (
        a.join(b, (F.col("h") == F.col("h2")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
    )


@_q(
    "agg_mode_brand_per_type",
    """
    WITH c AS (
      SELECT p_type, p_brand, CAST(count(*) AS BIGINT) AS n
      FROM part GROUP BY p_type, p_brand),
    m AS (SELECT p_type, MAX(n) AS mx FROM c GROUP BY p_type)
    SELECT c.p_type, MIN(c.p_brand) AS mode_brand, MIN(c.n) AS n_parts
    FROM c JOIN m ON m.p_type = c.p_type AND c.n = m.mx
    GROUP BY c.p_type
    """,
)
def agg_mode_brand_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value) per group — the statistical
    mode with an EXPLICIT tie-break (max count, then lexicographically
    smallest value).  Engines' built-in mode()/max_by() leave ties
    implementation-defined — worthless for a reproducible pipeline — so
    the plan is the portable two-aggregate form: counts, per-group max,
    equality join back, min over the tied set.  All three aggs share the
    p_type grouping key, so AQE lines the shuffles up; count tables are
    |distinct pairs|-sized, never corpus-sized."""
    part = load_table(spark, sf_dir, "part").select("p_type", "p_brand")
    c = part.groupBy("p_type", "p_brand").agg(F.count(F.lit(1)).alias("n"))
    m = c.groupBy("p_type").agg(F.max("n").alias("mx"))
    return (
        c.join(
            m.withColumnRenamed("p_type", "_t"),
            (F.col("p_type") == F.col("_t")) & (F.col("n") == F.col("mx")),
        )
        .groupBy("p_type")
        .agg(
            F.min("p_brand").alias("mode_brand"),
            F.min("n").alias("n_parts"),
        )
    )


@_q(
    "events_props_variant",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_k
    FROM events
    GROUP BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through the VARIANT type (Spark 4): parse the
    JSON string ONCE into the binary variant encoding, then path-extract
    with ``variant_get`` — the schemaless sibling of the c14
    ``from_json``-with-schema path.  At 100 TB the variant encoding is
    the right default for heterogeneous event payloads: parse cost is
    paid once per row (not once per extracted path), extraction is
    JVM-side on the binary form, and BOTH failure classes degrade to
    null instead of killing the job — ``try_parse_json`` for malformed
    payloads, ``try_variant_get`` for unknown/missing paths (strict
    ``parse_json`` would fail the whole aggregation on one bad row —
    the opposite of the schema-drift tolerance this path exists for).
    Integer sums need no decimal detour."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_k"),
        )
    )


@_q(
    "user_value_profiles",
    """
    WITH pos AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, value) - 1
               AS p,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events)
    SELECT user_id, CAST((p * 8) // n AS BIGINT) AS bucket,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value)
             AS profile_value
    FROM pos
    GROUP BY user_id, (p * 8) // n
    """,
)
def user_value_profiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length trajectory profiles (operators/timeseries.py::
    user_value_profiles): every user's event-value sequence resampled to
    8 equi-count buckets (integer position arithmetic, decimal bucket
    means — fully engine-portable; equal (ts, value) ties cannot move a
    value across buckets' MEANS).  The cheap exact first stage of
    trajectory similarity search (REPOSE-style, ICDE 2021): the profile
    table is |users|×8 — the DTW refinement (dtw_topk, LB_Keogh-pruned,
    python-model-tested) runs on THIS, never on the fact table.  One
    window shuffle + one keyed aggregation on the same user key."""
    from lvm_datapipe_spark.operators.timeseries import user_value_profiles

    ev = load_table(spark, sf_dir, "events")
    return user_value_profiles(ev, length=8)


@_q(
    "events_autocorrelation",
    """
    WITH seq AS (
      SELECT user_id, value,
             lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events),
    pairs AS (
      SELECT user_id, value, prev FROM seq WHERE prev IS NOT NULL),
    m AS (
      SELECT user_id,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(prev AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,6)) * CAST(prev AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,6)) * CAST(value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(prev AS DECIMAL(27,6)) * CAST(prev AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(count(*) AS BIGINT) AS n
      FROM pairs GROUP BY user_id)
    SELECT user_id, n,
           (sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS acf1
    FROM m
    WHERE n >= 8 AND (sxx - sx * sx / n) > CAST(0.0 AS DOUBLE)
      AND (syy - sy * sy / n) > CAST(0.0 AS DOUBLE)
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value sequence — the
    time-series FEATURE sibling of the trajectory profiles (is a user's
    signal trending/periodic or white?).  Same engine-exact recipe as
    agg_correlation: the five raw moments accumulate through DECIMAL
    (order-insensitive), the Pearson combination runs in doubles
    identically in both engines, degenerate (zero-variance) series are
    excluded exactly.  One window shuffle (the lag) + one keyed
    aggregate on the same user key — AQE reuses the partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = lambda c: F.col(c).cast("decimal(27,6)")  # noqa: E731
    pairs = (
        ev.select(
            "user_id", "value", F.lag("value", 1).over(w).alias("prev")
        )
        .filter(F.col("prev").isNotNull())
    )
    # decimal -> string -> double: the agg_correlation recipe (a direct
    # decimal->double cast can differ from DuckDB's by 1 ulp on
    # rounding-boundary sums of decimal products)
    m = pairs.groupBy("user_id").agg(
        F.sum(d("value")).cast("string").cast("double").alias("sx"),
        F.sum(d("prev")).cast("string").cast("double").alias("sy"),
        F.sum(d("value") * d("prev")).cast("string").cast("double").alias("sxy"),
        F.sum(d("value") * d("value")).cast("string").cast("double").alias("sxx"),
        F.sum(d("prev") * d("prev")).cast("string").cast("double").alias("syy"),
        F.count(F.lit(1)).alias("n"),
    )
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    acf = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / F.sqrt(vx * vy)
    return (
        m.filter((F.col("n") >= 8) & (vx > 0.0) & (vy > 0.0))
        .select("user_id", "n", acf.alias("acf1"))
    )


@_q(
    "events_changepoint",
    """
    WITH seq AS (
      SELECT user_id, event_id,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS sb,
             COUNT(value) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS nb,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND 8 FOLLOWING) AS DOUBLE) AS sa,
             COUNT(value) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND 8 FOLLOWING) AS na
      FROM events),
    jumps AS (
      SELECT user_id, event_id, abs(sb / 8 - sa / 8) AS jump
      FROM seq WHERE nb = 8 AND na = 8),
    mx AS (SELECT user_id, MAX(jump) AS mj FROM jumps GROUP BY user_id)
    SELECT j.user_id, CAST(MIN(j.event_id) AS BIGINT) AS change_event_id,
           MIN(j.jump) AS jump
    FROM jumps j JOIN mx ON mx.user_id = j.user_id AND j.jump = mx.mj
    GROUP BY j.user_id
    """,
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CHANGE-POINT detection: the event where the mean of the 8
    values before differs most from the mean of the 8 after — the
    numeric analog of the scene-cut threshold (M1) on arbitrary series.
    Window-frame decimal sums make both side-means engine-exact, so the
    argmax equality join (the mode-query tie-break pattern: max jump,
    then earliest event) is deterministic.  One window shuffle computes
    BOTH frames (same partitioning/ordering), the argmax is two
    |users|-sized aggregates — the corpus never moves twice."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = F.col("value").cast("decimal(27,6)")
    before = w.rowsBetween(-8, -1)
    after = w.rowsBetween(1, 8)
    seq = ev.select(
        "user_id",
        "event_id",
        F.sum(d).over(before).cast("double").alias("sb"),
        F.count("value").over(before).alias("nb"),
        F.sum(d).over(after).cast("double").alias("sa"),
        F.count("value").over(after).alias("na"),
    )
    jumps = seq.filter((F.col("nb") == 8) & (F.col("na") == 8)).select(
        "user_id",
        "event_id",
        F.abs(F.col("sb") / 8 - F.col("sa") / 8).alias("jump"),
    )
    mx = jumps.groupBy("user_id").agg(F.max("jump").alias("mj"))
    return (
        jumps.join(
            mx.withColumnRenamed("user_id", "_u"),
            (F.col("user_id") == F.col("_u")) & (F.col("jump") == F.col("mj")),
        )
        .groupBy("user_id")
        .agg(
            F.min("event_id").alias("change_event_id"),
            F.min("jump").alias("jump"),
        )
    )


@_q(
    "events_winsorized",
    f"""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           {_dsum('least(b.hi, greatest(b.lo, e.value))')} AS sum_winsorized,
           CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           CAST(count(*) AS BIGINT) AS n
    FROM events e JOIN b ON b.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the standard outlier-robust cleaning step: clip each
    value into its group's exact [p05, p95] band before aggregating.
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    linear-interpolation definition (bit-identical — the agg_percentiles
    precedent), so the clip BOUNDS are engine-exact and the clipped
    decimal sum replays.  Two aggregates on the same grouping key: the
    exact-percentile pass (one sort-based agg over the group) and the
    clipped rollup after a broadcast bounds join — the corpus is scanned
    twice but shuffled only by the tiny grouped results."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = F.least(F.col("hi"), F.greatest(F.col("lo"), F.col("value")))
    out_of_band = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(
            F.broadcast(b.withColumnRenamed("event_type", "_t")),
            F.col("event_type") == F.col("_t"),
        )
        .groupBy("event_type")
        .agg(
            A.decimal_sum(clipped).alias("sum_winsorized"),
            F.sum(F.when(out_of_band, 1).otherwise(0)).alias("n_clipped"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "events_trend_slope",
    """
    WITH seq AS (
      SELECT user_id, value,
             CAST(row_number() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT)
               AS x
      FROM events),
    m AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(x AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(x AS DECIMAL(27,6)) * CAST(value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(x AS DECIMAL(27,6)) * CAST(x AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sxx
      FROM seq GROUP BY user_id)
    SELECT user_id, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
    FROM m WHERE n >= 8
    """,
)
def events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares TREND over the event sequence (is the signal
    drifting?) — the third member of the engine-exact moments family
    (agg_correlation, events_autocorrelation): integer positions from a
    deterministic ordering, all four moments through DECIMAL, the slope
    combination in doubles identical across engines.  One window shuffle
    + one keyed aggregate on the user key.  (x variance is never zero
    for n ≥ 2 distinct positions, so no degenerate filter is needed
    beyond the length floor.)"""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = (F.row_number().over(w) - 1).cast("long")
    d = lambda c: c.cast("decimal(27,6)")  # noqa: E731
    seq = ev.select("user_id", "value", x.alias("x"))
    # decimal -> string -> double: the agg_correlation recipe (see
    # events_autocorrelation)
    m = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("x"))).cast("string").cast("double").alias("sx"),
        F.sum(d(F.col("value"))).cast("string").cast("double").alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("value"))).cast("string").cast("double").alias("sxy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).cast("string").cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.filter(F.col("n") >= 8).select("user_id", "n", slope.alias("slope"))


@_q(
    "agg_skewness_by_type",
    """
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6)) * CAST(value AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS s2,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6)) * CAST(value AS DECIMAL(9,6)) * CAST(value AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS s3
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)
      GROUP BY event_type)
    SELECT event_type, n,
           ((s3 - 3 * (s1 / n) * s2 + 2 * n * (s1 / n) * (s1 / n) * (s1 / n)) / n)
             / sqrt((s2 - s1 * s1 / n) / n)
             / ((s2 - s1 * s1 / n) / n) AS skewness
    FROM m WHERE n >= 3 AND (s2 - s1 * s1 / n) > CAST(0.0 AS DOUBLE)
    """,
)
def agg_skewness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-exact SKEWNESS per group — the third-moment member of the
    moments family (corr, acf, slope).  Raw power sums stay EXACT decimals
    by construction: value quantized to (9,6), v² = (19,12), v³ = (29,18)
    — every product fits without Spark's precision-cap rescaling — then
    the VARCHAR→double bridge and an identical double combination.
    The SPEC bounds inputs to |value| < 1000 explicitly (the filter is
    part of the query, both engines): with v quantized at (9,6), v³ has
    9 integer digits, leaving 11 integer digits of Σ-headroom in the
    (38,18) sum — ~1e11 rows per group before overflow, a real bound
    rather than a silent engine-divergent NULL/error.  Spark's built-in
    ``skewness`` (streaming float moments) is deliberately avoided: its
    accumulation order is not reproducible across engines.  (Kurtosis
    is excluded: v⁴ would need 24 fractional digits and a lossy
    rescale.)  One keyed aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.abs(F.col("value")) < 1000.0
    )
    d6 = F.col("value").cast("decimal(9,6)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d6).cast("string").cast("double").alias("s1"),
        F.sum(d6 * d6).cast("string").cast("double").alias("s2"),
        F.sum(d6 * d6 * d6).cast("string").cast("double").alias("s3"),
    )
    n, s1, s2, s3 = F.col("n"), F.col("s1"), F.col("s2"), F.col("s3")
    mean = s1 / n
    var_n = (s2 - s1 * s1 / n) / n
    m3 = (s3 - 3 * mean * s2 + 2 * n * mean * mean * mean) / n
    return (
        m.filter((n >= 3) & ((s2 - s1 * s1 / n) > 0.0))
        .select(
            "event_type", "n", (m3 / F.sqrt(var_n) / var_n).alias("skewness")
        )
    )


@_q(
    "pipeline_pretrain_full",
    f"""
    WITH corp AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 <> 0),
    bench AS (
      SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 10 = 0),
    fp AS (
      SELECT doc_id, lang, text,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
      FROM corp),
    kept AS (
      SELECT doc_id, lang, text FROM (
        SELECT fp.*, min(doc_id) OVER (PARTITION BY f) AS keeper FROM fp)
      WHERE doc_id = keeper),
    ct AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM kept),
    cs AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(generate_series(1, len(toks) - 4),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                         || toks[i+3] || ' ' || toks[i+4]))) AS shingle
      FROM ct WHERE len(toks) >= 5),
    bt AS (
      SELECT bench_id, {_SQL_TOKS} AS toks FROM bench),
    bs AS (
      SELECT bench_id,
             unnest(list_distinct(list_transform(generate_series(1, len(toks) - 4),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                         || toks[i+3] || ' ' || toks[i+4]))) AS shingle
      FROM bt WHERE len(toks) >= 5),
    flagged AS (
      SELECT DISTINCT cs.doc_id FROM cs JOIN bs ON cs.shingle = bs.shingle),
    clean AS (
      SELECT kept.* FROM kept
      WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
    scored AS (
      SELECT doc_id, lang, CAST(len({_SQL_TOKS}) AS INTEGER) AS n_tokens
      FROM clean),
    gated AS (SELECT * FROM scored WHERE n_tokens >= 20),
    b AS (
      SELECT gated.*,
             ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM gated)
    SELECT doc_id, lang, n_tokens,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def pipeline_pretrain_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE pretraining-curation recipe as one declared plan —
    pipeline_curate extended with the contamination leg: exact dedup
    (md5 fingerprint, keep min id) → benchmark DECONTAMINATION (5-gram
    shingle overlap vs the held-out benchmark slice, anti-join — the
    decontaminate_overlap machinery with the benchmark side broadcast)
    → quality gate (token floor) → deterministic md5-bucket split.
    Every stage is an oracle-checked operator reused verbatim; the
    composition costs one fingerprint window shuffle + one
    shingle-keyed join against a BROADCAST benchmark shingle table +
    map-side everything else.  This is the query a user runs to turn a
    raw crawl into train/val/test — the engine's reason to exist, in
    one EXPLAIN."""
    from lvm_datapipe_spark.operators import text as X
    from lvm_datapipe_spark.operators.decontaminate import decontaminate
    from lvm_datapipe_spark.operators.sampling import split_assign

    docs = load_table(spark, sf_dir, "documents")
    corp = docs.filter(F.col("doc_id") % 10 != 0)
    bench = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("bench_id"), "text")
    )
    fp = corp.select(
        "doc_id", "lang", "text", X.fingerprint("text").alias("f")
    )
    w = Window.partitionBy("f")
    kept = (
        fp.withColumn("keeper", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("keeper", "f")
    )
    clean = decontaminate(kept, bench, n=5)
    scored = clean.select(
        "doc_id", "lang", X.token_count("text").alias("n_tokens")
    )
    gated = scored.filter(F.col("n_tokens") >= 20)
    return split_assign(
        gated, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "lang", "n_tokens", "split")


@_q(
    "events_seasonal_residuals",
    f"""
    WITH base AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             {_dsum('value')} / COUNT(value) AS baseline,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, hour(ts)),
    dev AS (
      SELECT e.event_id, e.event_type, CAST(hour(e.ts) AS BIGINT) AS hod,
             e.value - b.baseline AS residual
      FROM events e
      JOIN base b ON b.event_type = e.event_type
                 AND b.hod = hour(e.ts)
      WHERE b.n >= 10),
    mx AS (
      SELECT event_type, MAX(abs(residual)) AS mr FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(MIN(d.event_id) AS BIGINT) AS event_id,
           MIN(abs(d.residual)) AS abs_residual
    FROM dev d JOIN mx ON mx.event_type = d.event_type
                      AND abs(d.residual) = mx.mr
    GROUP BY d.event_type
    """,
)
def events_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL-baseline anomaly detection: each (event_type, hour-of-day)
    cell gets a decimal-exact mean baseline; the most anomalous event per
    type is the one deviating furthest from ITS OWN hour's baseline —
    the seasonality-aware upgrade over the flat z-score/MAD outlier
    queries (a value normal at peak hour is an anomaly at 4am).  Thin
    cells (n < 10) are excluded from judging — their baselines are
    noise.  (Floor lowered 20 -> 10 in r6 per ADVICE: at the sf0.001
    pytest scale a 20-floor excluded every cell, so the green oracle
    check exercised none of the baseline/residual/argmax logic; at 10
    the local run keeps 41 of 120 cells and the thin-cell exclusion
    still bites.)  One grouped aggregate (24×|types| cells, broadcast back) +
    the mode-pattern deterministic argmax (max |residual|, then
    earliest event).  The corpus shuffles only for the |types|-sized
    argmax aggregates."""
    ev = load_table(spark, sf_dir, "events")
    hod = F.hour("ts").cast("long")
    base = ev.groupBy(
        "event_type", hod.alias("hod")
    ).agg(
        A.decimal_avg("value").alias("baseline"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = (
        ev.select("event_id", "event_type", hod.alias("hod"), "value")
        .join(
            F.broadcast(
                base.withColumnRenamed("event_type", "_t").withColumnRenamed(
                    "hod", "_h"
                )
            ),
            (F.col("event_type") == F.col("_t")) & (F.col("hod") == F.col("_h")),
        )
        .filter(F.col("n") >= 10)
        .select(
            "event_id",
            "event_type",
            "hod",
            (F.col("value") - F.col("baseline")).alias("residual"),
        )
    )
    mx = dev.groupBy("event_type").agg(
        F.max(F.abs("residual")).alias("mr")
    )
    return (
        dev.join(
            mx.withColumnRenamed("event_type", "_mt"),
            (F.col("event_type") == F.col("_mt"))
            & (F.abs(F.col("residual")) == F.col("mr")),
        )
        .groupBy("event_type")
        .agg(
            F.min("event_id").alias("event_id"),
            F.min(F.abs("residual")).alias("abs_residual"),
        )
    )


@_q(
    "events_interarrival_stats",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events),
    g AS (SELECT user_id, gap_s FROM seq WHERE gap_s IS NOT NULL)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_s) AS BIGINT) AS total_gap_s,
           quantile_cont(CAST(gap_s AS DOUBLE), 0.5) AS median_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM g GROUP BY user_id
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user INTER-ARRIVAL statistics — the activity-cadence features a
    sessionizer's gap threshold is tuned from (how long is a "normal"
    silence for this user?).  Gaps are exact INTEGER seconds (epoch
    truncation both engines, lag over the deterministic (ts, event_id)
    order), so sum/max are exact longs and the median runs through the
    bit-identical percentile≡quantile_cont pair on exact-integer-valued
    doubles.  One window shuffle + one keyed aggregate on the same user
    key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch_s = F.unix_timestamp("ts")
    gap = (epoch_s - F.lag(epoch_s, 1).over(w)).alias("gap_s")
    g = ev.select("user_id", gap).filter(F.col("gap_s").isNotNull())
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_s").alias("total_gap_s"),
        F.percentile(F.col("gap_s").cast("double"), F.lit(0.5)).alias(
            "median_gap_s"
        ),
        F.max("gap_s").alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# CCNet-style LM quality filter (Wenzek et al. 2019, arXiv:1911.00359):
# corpus-trained bigram LM -> per-doc mean surprisal -> per-language
# head/middle/tail tertiles.  Every value in the decision path and the output
# is an INTEGER (bit-length surprisal, fixed-point micro score, counting-based
# discrete tertile thresholds), so the oracle match is exact by construction —
# no percentile interpolation, no libm (measured non-portable: see
# text.bigram_lm_surprisal and w5_deciles_bucketed's docstrings).
# ---------------------------------------------------------------------------

_CCNET_SQL = f"""
    WITH t AS (SELECT doc_id, lang, {_SQL_LTOKS} AS toks FROM documents),
    t2 AS (SELECT doc_id, lang, toks FROM t WHERE len(toks) >= 2),
    bg0 AS (SELECT doc_id, lang, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i FROM t2),
    bg AS (SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2 FROM bg0),
    cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
    cp AS (SELECT w1, count(*) AS cp FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT tok) AS vsz
          FROM (SELECT unnest(toks) AS tok FROM t2)),
    s AS (SELECT b.doc_id, b.lang,
                 length(bin(cp.cp + v.vsz)) - length(bin(cb.cb + 1)) AS sp
          FROM bg b JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
                    JOIN cp ON b.w1 = cp.w1
                    CROSS JOIN v),
    d AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(sum(sp) AS BIGINT) AS surprisal_sum
          FROM s GROUP BY doc_id, lang),
    d2 AS (SELECT *, surprisal_sum * 1000000 // n_bigrams AS surprisal_micro
           FROM d),
    cnt AS (SELECT lang, surprisal_micro, count(*) AS c
            FROM d2 GROUP BY lang, surprisal_micro),
    cum AS (SELECT lang, surprisal_micro,
                   SUM(c) OVER (PARTITION BY lang ORDER BY surprisal_micro
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum
            FROM cnt),
    nl AS (SELECT lang, count(*) AS n FROM d2 GROUP BY lang),
    th AS (SELECT c.lang,
                  MIN(CASE WHEN c.cum >= (n.n + 2) // 3
                           THEN c.surprisal_micro END) AS t1,
                  MIN(CASE WHEN c.cum >= (2 * n.n + 2) // 3
                           THEN c.surprisal_micro END) AS t2
           FROM cum c JOIN nl n ON c.lang = n.lang GROUP BY c.lang)
    SELECT d2.doc_id, d2.lang, d2.n_bigrams, d2.surprisal_sum,
           CAST(d2.surprisal_micro AS BIGINT) AS surprisal_micro,
           CASE WHEN d2.surprisal_micro <= th.t1 THEN 'head'
                WHEN d2.surprisal_micro <= th.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM d2 JOIN th ON d2.lang = th.lang
    """


@_q("ccnet_perplexity_buckets", _CCNET_SQL)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet quality-filter recipe on this engine: score every document
    with a corpus-trained bigram LM (integer bit-length surprisal — see
    ``text.bigram_lm_surprisal`` for why not float log), then bucket into
    per-LANGUAGE head/middle/tail tertiles, CCNet's central trick (a fluent
    Urdu page must not lose to average English).

    Tertile thresholds are DISCRETE quantiles computed by counting: per-lang
    cumulative counts over DISTINCT integer scores, threshold = smallest
    score whose cumulative count reaches ceil(n/3) (resp. ceil(2n/3)).  That
    is percentile_disc semantics built from count/min — exact integers end
    to end, unlike interpolating percentiles whose float arithmetic differs
    across engines in the last ULP (measured on this corpus).

    Scale shape: the threshold window runs over DISTINCT (lang, score) pairs
    — post-aggregation strata, bounded by score cardinality, NOT corpus rows
    (the global-NTILE trap w5_quality_deciles was demoted for); thresholds
    (one row per lang) broadcast back onto the doc stream."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    d2 = X.bigram_lm_surprisal(docs).withColumn(
        "surprisal_micro", F.expr("surprisal_sum * 1000000L DIV n_bigrams")
    )
    cnt = d2.groupBy("lang", "surprisal_micro").agg(F.count(F.lit(1)).alias("c"))
    wl = (
        Window.partitionBy("lang")
        .orderBy("surprisal_micro")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cnt.withColumn("cum", F.sum("c").over(wl))
    nl = d2.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    th = (
        cum.join(F.broadcast(nl), "lang")
        .groupBy("lang")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 2) DIV 3"), F.col("surprisal_micro"))
            ).alias("t1"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(2 * n + 2) DIV 3"), F.col("surprisal_micro")
                )
            ).alias("t2"),
        )
    )
    return d2.join(F.broadcast(th), "lang").select(
        "doc_id",
        "lang",
        "n_bigrams",
        "surprisal_sum",
        "surprisal_micro",
        F.when(F.col("surprisal_micro") <= F.col("t1"), F.lit("head"))
        .when(F.col("surprisal_micro") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def _semdedup_sql(
    eps: float = 0.4, n_cells: int = 16, seed: int = 42, dim: int = _EMB_DIM
) -> str:
    """DuckDB replay of SemDeDup over the fixed quantizer: centroid literals
    from the same seeded draw, within-cell pair cosines over shared unit
    vectors, the dominance rule verbatim.  Unlike the argmax-only IVF oracles
    (where a last-ULP wobble cannot flip a comparison between well-separated
    cells), ``centroid_sim`` is OUTPUT here, so literals are STRING-cast to
    double ('…'::DOUBLE): DuckDB lexes a bare decimal literal as DECIMAL and
    for some values the DECIMAL round-trip yields a different double than the
    Python/JVM repr parse (measured: 6/16 centroid dots off by up to 8 ULPs
    after cancellation); the string→double cast is the IEEE round-to-nearest
    parse on both engines."""
    from lvm_datapipe_spark.operators.similarity import ivf_fixed_centroids

    cents = ivf_fixed_centroids(n_cells, dim, seed)

    def cos_lit(v: str, c) -> str:
        dot_vc = " + ".join(
            f"{v}[{i + 1}]*('{float(c[i])!r}'::DOUBLE)" for i in range(dim)
        )
        dot_cc = sum(float(x) * float(x) for x in c)
        return f"(({dot_vc}) / (sqrt({_dot_sql(v, v)}) * sqrt('{dot_cc!r}'::DOUBLE)))"

    sims = "[" + ", ".join(cos_lit("v", c) for c in cents) + "]"
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT vec_id, v, {sims} AS sims,
                  sqrt({_dot_sql('v', 'v')}) AS nrm FROM e),
    a AS (SELECT vec_id,
                 CAST(list_indexof(sims, list_max(sims)) - 1 AS INTEGER) AS cell,
                 list_max(sims) AS centroid_sim,
                 list_transform(v, x -> x / nrm) AS vn
          FROM c0),
    rm AS (SELECT DISTINCT b.vec_id
           FROM a x JOIN a b ON x.cell = b.cell AND x.vec_id <> b.vec_id
           WHERE {_dot_sql('x.vn', 'b.vn')} >= {eps}
             AND (x.centroid_sim < b.centroid_sim
                  OR (x.centroid_sim = b.centroid_sim AND x.vec_id < b.vec_id)))
    SELECT a.vec_id, a.cell, a.centroid_sim,
           (rm.vec_id IS NULL) AS keep
    FROM a LEFT JOIN rm ON rm.vec_id = a.vec_id
    """


@_q("dedup_semantic_semdedup", _semdedup_sql())
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023, arXiv:2303.09540)
    over the embeddings table: fixed-quantizer cell assignment, within-cell
    cosine pairs at eps=0.4 (the corpus's established near-dup threshold),
    keep the min-centroid-similarity representative via a deterministic
    dominance rule — see ``similarity.semdedup_keep`` for semantics and the
    100 TB shape (one assignment scan, cell-keyed self-join, no quadratic
    pair source)."""
    from lvm_datapipe_spark.operators.similarity import semdedup_keep

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_keep(emb, eps=0.4)


# ---------------------------------------------------------------------------
# DSIR data selection (Xie et al. 2023, arXiv:2302.03169): hashed-n-gram
# importance weights of raw docs against a target reference corpus, then
# deterministic top-k selection.  Integer end to end (md5 feature buckets,
# bit-length log-ratios), so fully oracle-checked.
# ---------------------------------------------------------------------------

_DSIR_SQL = f"""
    WITH t AS (SELECT doc_id, lang, source, (source = 'src0') AS is_target,
                      {_SQL_LTOKS} AS toks FROM documents),
    t2 AS (SELECT * FROM t WHERE len(toks) >= 1),
    uni AS (SELECT doc_id, lang, source, is_target, unnest(toks) AS feat FROM t2),
    bg0 AS (SELECT doc_id, lang, source, is_target, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t2 WHERE len(toks) >= 2),
    bg AS (SELECT doc_id, lang, source, is_target,
                  toks[i] || ' ' || toks[i + 1] AS feat FROM bg0),
    f0 AS (SELECT * FROM uni UNION ALL SELECT * FROM bg),
    f AS (SELECT *, ('0x' || substr(md5('dsir' || feat), 1, 8))::BIGINT % 512 AS fb
          FROM f0),
    raw AS (SELECT fb, count(*) AS cr FROM f GROUP BY fb),
    tgt AS (SELECT fb, count(*) AS ct FROM f WHERE is_target GROUP BY fb),
    tot AS (SELECT count(*) AS nr,
                   count(*) FILTER (WHERE is_target) AS nt FROM f),
    wt AS (SELECT raw.fb,
                  (length(bin(COALESCE(tgt.ct, 0) + 1)) - length(bin(tot.nt + 512)))
                - (length(bin(raw.cr + 1)) - length(bin(tot.nr + 512))) AS s
           FROM raw LEFT JOIN tgt ON raw.fb = tgt.fb CROSS JOIN tot),
    dw AS (SELECT f.doc_id, f.lang, f.source, f.is_target,
                  CAST(count(*) AS BIGINT) AS n_features,
                  CAST(sum(wt.s) AS BIGINT) AS weight
           FROM f JOIN wt ON f.fb = wt.fb
           GROUP BY f.doc_id, f.lang, f.source, f.is_target)
    SELECT doc_id, lang, source, is_target, n_features, weight
    FROM dw ORDER BY weight DESC, doc_id LIMIT 100
    """


@_q("dsir_target_selection", _DSIR_SQL)
def dsir_target_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: keep the 100 documents whose hashed-n-gram features
    look most like the 'src0' reference source (playing the role of DSIR's
    target corpus).  See ``sampling.dsir_doc_weights`` for the integer
    log-ratio weights and why the scoring join is broadcast (the whole
    learned 'model' is B=512 bucket rows + two scalars — the reason DSIR
    beats vocab-sized LM scoring at 100 TB — measured in SCALE_BENCH.md
    section 4: constant 512-row state vs a count table already at 766k
    rows for a 1M-doc corpus).  Top-k is deterministic
    (weight DESC, doc_id): the reproducible twin of the paper's
    Gumbel-noise resampling."""
    from lvm_datapipe_spark.operators import sampling as S

    docs = load_table(spark, sf_dir, "documents")
    w = S.dsir_doc_weights(docs, F.col("source") == "src0")
    return w.orderBy(F.desc("weight"), F.asc("doc_id")).limit(100)


# ---------------------------------------------------------------------------
# Gopher quality-rule battery (Rae et al. 2021, arXiv:2112.11446 A1.1) — the
# rule set RefinedWeb/Dolma/FineWeb inherit.  Integer cross-multiplied
# thresholds -> bit-portable booleans, fully oracle-checked.
# ---------------------------------------------------------------------------

_GOPHER_SQL = rf"""
    WITH base AS (
      SELECT doc_id, text, {_SQL_LTOKS} AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             COALESCE(list_aggregate(list_transform(toks, x -> length(x)),
                                     'sum'), 0) AS swl,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell,
             len(lines) AS n_lines,
             len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %'
                                       OR l LIKE '• %')) AS n_bullet,
             len(list_filter(lines, l -> l LIKE '%...')) AS n_ell_end,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
             (CASE WHEN list_contains(toks, 'the')  THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'be')   THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'to')   THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'of')   THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'and')  THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END) AS n_stop
      FROM base),
    fl AS (
      SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
             (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
             (3 * n_words <= swl AND swl <= 10 * n_words) AS mean_word_len_ok,
             (10 * (n_hash + n_ell) <= n_words) AS symbol_ratio_ok,
             (10 * n_bullet < 9 * n_lines) AS bullet_lines_ok,
             (10 * n_ell_end <= 3 * n_lines) AS ellipsis_lines_ok,
             (5 * n_alpha >= 4 * n_words) AS alpha_word_ok,
             (n_stop >= 2) AS stopword_ok
      FROM m)
    SELECT *,
           (word_count_ok AND mean_word_len_ok AND symbol_ratio_ok
            AND bullet_lines_ok AND ellipsis_lines_ok AND alpha_word_ok
            AND stopword_ok) AS keep
    FROM fl
    """


@_q("gopher_quality_rules", _GOPHER_SQL)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's rule battery over the documents table — see
    ``text.gopher_quality_flags`` for the rules and the integer
    cross-multiplication trick that keeps every threshold bit-portable.
    One scan-shaped projection: the full battery costs a map pass at any
    scale."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return X.gopher_quality_flags(docs)


@_q(
    "mix_token_budget",
    rf"""
    WITH t AS (SELECT doc_id, source,
                      CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
                      md5('mixb' || CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS cum_tokens
          FROM t)
    SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 400
    """,
)
def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix assembly under an exact per-source TOKEN budget: each
    source contributes documents in deterministic md5-of-id order until its
    cumulative token count reaches the budget (400 here — a literal; real
    mixes pass per-source budgets from the mixture spec).  The rate-based
    sibling ``sample_temperature_mix`` hits a budget only in expectation;
    training-data contracts are written in tokens, so the assembly step
    needs the exact form.

    Scale shape: token counting is scan-shaped; the cumulative sum is ONE
    window partitioned by source (keyed shuffle, no global order); the md5
    order makes the kept prefix a pure function of doc ids — stable under
    repartitioning and incremental arrival, and the same rows DuckDB
    selects.  Integers end to end."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("mixb"), F.col("doc_id").cast("string")).cast("binary"))
    t = docs.select(
        "doc_id",
        "source",
        X.token_count("text").cast("bigint").alias("n_tokens"),
        h.alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 400)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


@_q(
    "curation_scorecard",
    f"""
    SELECT c.doc_id, c.lang, g.n_words, c.bucket AS lm_bucket,
           g.keep AS gopher_keep, g.word_count_ok, q.keep AS classifier_keep,
           (q.keep AND c.bucket <> 'tail') AS keep
    FROM ({_CCNET_SQL}) c
    JOIN ({_GOPHER_SQL}) g ON g.doc_id = c.doc_id
    JOIN ({ORACLE_SQL['quality_logit']}) q ON q.doc_id = c.doc_id
    """,
)
def curation_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document curation SCORECARD: every quality signal this
    engine computes — the CCNet LM tertile, the Gopher rule battery, the
    linear classifier gate — joined into one row per doc with the combined
    keep verdict (pass all rules, pass the classifier, not in the LM
    tail).  This is the composition a curation team actually reviews
    before committing a mix; each signal stays independently
    oracle-checked, and the composition is three doc-keyed joins whose
    inputs are the already-scan-shaped signal plans — no new shuffle
    class.  (Sibling of ``pipeline_pretrain_full``, which composes the
    SEQUENTIAL dedup→decontaminate→gate→split pipeline; this one is the
    PARALLEL signal join.)

    The combined verdict is classifier AND not-LM-tail; the full Gopher
    conjunction is REPORTED but deliberately outside the verdict: its
    canonical thresholds are calibrated for web documents (>= 50 words,
    >= 2 English mandatory stopwords) and the synthetic fixture corpus
    fails the stopword rule wholesale, which would leave the verdict's
    true-branch dead at test scale (the events_seasonal_residuals
    thin-cell lesson from ADVICE r5).  A web-corpus deploy ANDs
    ``gopher_keep`` in."""
    cc = ccnet_perplexity_buckets(spark, sf_dir).select("doc_id", "lang", "bucket")
    go = gopher_quality_rules(spark, sf_dir).select(
        "doc_id", "n_words", "keep", "word_count_ok"
    )
    ql = quality_logit(spark, sf_dir).select("doc_id", F.col("keep").alias("qk"))
    return (
        cc.join(go.withColumnRenamed("keep", "gopher_keep"), "doc_id")
        .join(ql, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_words",
            F.col("bucket").alias("lm_bucket"),
            "gopher_keep",
            "word_count_ok",
            F.col("qk").alias("classifier_keep"),
            (F.col("qk") & (F.col("bucket") != "tail")).alias("keep"),
        )
    )


@_q(
    "adaptive_sessionize",
    """
    WITH g0 AS (
      SELECT user_id, event_id, ts, epoch(ts) AS es,
             epoch(ts) - LAG(epoch(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events),
    med AS (
      SELECT user_id,
             quantile_cont(CAST(gap_s AS DOUBLE), 0.5) AS med_gap
      FROM g0 WHERE gap_s IS NOT NULL GROUP BY user_id),
    th AS (
      SELECT g0.user_id, g0.event_id, g0.ts, g0.gap_s,
             greatest(300.0, least(3.0 * COALESCE(med.med_gap, 600.0),
                                   7200.0)) AS threshold_s
      FROM g0 LEFT JOIN med ON g0.user_id = med.user_id),
    flagged AS (
      SELECT user_id, event_id, ts, threshold_s,
             CASE WHEN gap_s IS NULL
                       OR CAST(gap_s AS DOUBLE) > threshold_s
                  THEN 1 ELSE 0 END AS is_new
      FROM th),
    sessions AS (
      SELECT user_id, ts, threshold_s,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, threshold_s,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id, threshold_s
    """,
)
def adaptive_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAPTIVE sessionization: each user's session gap threshold is tuned
    from their own cadence — 3x their median inter-arrival gap, clamped to
    [5 min, 2 h] (default 30 min for single-event users) — the documented
    consumer of ``events_interarrival_stats``'s features (a chatty bot's
    sessions should not be glued together by a threshold tuned for weekly
    visitors).

    Exactness: gaps are integer epoch seconds; the per-user median of
    integer-valued doubles runs through the bit-identical
    percentile==quantile_cont pair (so ends in .0 or .5); 3x and the
    clamp are exact double ops; the flag compares an integer gap against
    that exact threshold.  Scale shape: everything is keyed on user_id —
    the lag window, the median aggregate, the threshold join, and the
    session cumsum reuse ONE partitioning; no global window anywhere."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.unix_timestamp("ts")
    g0 = ev.select(
        "user_id",
        "event_id",
        "ts",
        (es - F.lag(es, 1).over(w)).alias("gap_s"),
    )
    med = (
        g0.filter(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(F.percentile(F.col("gap_s").cast("double"), F.lit(0.5)).alias("med_gap"))
    )
    th = g0.join(med, "user_id", "left").withColumn(
        "threshold_s",
        F.greatest(
            F.lit(300.0),
            F.least(F.lit(3.0) * F.coalesce("med_gap", F.lit(600.0)), F.lit(7200.0)),
        ),
    )
    flagged = th.withColumn(
        "is_new",
        (
            F.col("gap_s").isNull()
            | (F.col("gap_s").cast("double") > F.col("threshold_s"))
        ).cast("int"),
    )
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sessions = flagged.withColumn(
        "session_id", F.sum("is_new").over(ws).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_id", "threshold_s").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@_q(
    "sketch_median_value",
    """
    WITH rng AS (
      SELECT event_type,
             min(CAST(value AS DOUBLE)) AS mn,
             max(CAST(value AS DOUBLE)) AS mx,
             count(*) AS n
      FROM events GROUP BY event_type),
    b AS (
      SELECT e.event_type, rng.mn, rng.n,
             (rng.mx - rng.mn) / 64.0 AS width,
             CASE WHEN (rng.mx - rng.mn) / 64.0 = 0.0 THEN 0
                  ELSE least(63, CAST(floor((CAST(e.value AS DOUBLE) - rng.mn)
                                            / ((rng.mx - rng.mn) / 64.0))
                                 AS INTEGER))
             END AS bin
      FROM events e JOIN rng ON e.event_type = rng.event_type),
    sk AS (SELECT event_type, bin, mn, width, n, count(*) AS c
           FROM b GROUP BY event_type, bin, mn, width, n),
    cum AS (SELECT *, SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM sk),
    hit AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY bin) AS _r
            FROM cum WHERE cum >= (n + 1) // 2)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CASE WHEN width = 0.0 THEN mn
                ELSE mn + (CAST(bin AS DOUBLE) + 0.5) * width END AS median_est
    FROM hit WHERE _r = 1
    """,
)
def sketch_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type median of ``value`` from the MERGEABLE fixed-bin quantile
    sketch (``aggregates.quantile_sketch`` / ``sketch_median``) — the
    incremental-corpus form of a median: shard sketches merge by summing
    bin counts, so daily arrivals never rescan history (unlike the exact
    ``percentile``, whose state is the value multiset).  Estimate error is
    bounded by half a bin width (asserted vs the exact median in tests).
    Two scans (range, binning) + one sketch-sized window."""
    from lvm_datapipe_spark.operators.aggregates import quantile_sketch, sketch_median

    ev = load_table(spark, sf_dir, "events")
    sk = quantile_sketch(ev, "value", "event_type", n_bins=64)
    return sketch_median(sk, "event_type")


@_q(
    "funnel_view_click_purchase",
    """
    WITH v AS (SELECT user_id, min(ts) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           (CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 ELSE 1 END) AS steps_reached
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED funnel analysis (view -> click -> purchase): a step only
    counts when it happens strictly AFTER the user's entry into the
    previous step (min-ts chaining — a later click cannot be credited to
    an earlier purchase).  Three conditional min aggregates chained by
    user-keyed joins: every stage shuffles on the SAME key, so at scale
    this is one partitioning reused three times, not three independent
    shuffles of the corpus.  Timestamps and step counts are exact."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), F.lit(3))
            .when(F.col("t_click").isNotNull(), F.lit(2))
            .otherwise(F.lit(1))
            .alias("steps_reached"),
        )
    )


@_q(
    "retention_cohorts",
    """
    WITH first_day AS (
      SELECT user_id, min(date_trunc('DAY', ts)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('DAY', ts) AS day
      FROM events)
    SELECT f.cohort_day,
           CAST(datediff('day', f.cohort_day, a.day) AS INTEGER) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM activity a JOIN first_day f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, day_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort matrix: users grouped by first-seen day, counted
    on each subsequent day they return (cohort x day-offset).  Two
    user-keyed aggregates + one user-keyed join — the day-offset regroup
    is over (cohort, offset) pairs, bounded by days^2, never corpus rows.
    Exact integers (DATE truncation and day arithmetic both engines)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("DAY", F.col("ts"))
    first = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = ev.select("user_id", day.alias("day")).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@_q(
    "ab_test_welch_z",
    """
    WITH a AS (
      SELECT event_type,
             ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             value
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)),
    m AS (
      SELECT event_type, arm,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6)) * CAST(value AS DECIMAL(9,6)))
                  AS VARCHAR) AS DOUBLE) AS s2
      FROM a GROUP BY event_type, arm),
    p AS (
      SELECT t.event_type,
             t.n AS n_treat, c.n AS n_ctrl,
             t.s1 / t.n AS mean_treat, c.s1 / c.n AS mean_ctrl,
             (t.s2 - t.s1 * t.s1 / t.n) / (t.n - 1) AS var_treat,
             (c.s2 - c.s1 * c.s1 / c.n) / (c.n - 1) AS var_ctrl
      FROM m t JOIN m c ON t.event_type = c.event_type
            AND t.arm = 1 AND c.arm = 0)
    SELECT event_type, n_treat, n_ctrl, mean_treat, mean_ctrl,
           (mean_treat - mean_ctrl)
             / sqrt(var_treat / n_treat + var_ctrl / n_ctrl) AS welch_z
    FROM p
    WHERE n_treat >= 2 AND n_ctrl >= 2
      AND (var_treat / n_treat + var_ctrl / n_ctrl) > CAST(0.0 AS DOUBLE)
    """,
)
def ab_test_welch_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with ENGINE-EXACT statistics: users split
    50/50 by the module's md5 bucket (assignment is a pure function of
    user_id — stable under repartitioning, rerun, and incremental
    arrival, the property a long-running experiment requires), then a
    per-metric Welch z-statistic from exact decimal power sums (the
    agg_skewness_by_type recipe: (9,6) quantization, VARCHAR→double
    bridge, identical double combination).  sqrt and division are
    correctly-rounded IEEE — the whole readout is bit-portable.  One
    keyed aggregate + a 2-arm pivot join on tiny per-group rows."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    d6 = F.col("value").cast("decimal(9,6)")
    m = (
        ev.withColumn("arm", hash_bucket("user_id", 2, "ab"))
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d6).cast("string").cast("double").alias("s1"),
            F.sum(d6 * d6).cast("string").cast("double").alias("s2"),
        )
    )
    t = m.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n_treat"),
        (F.col("s1") / F.col("n")).alias("mean_treat"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var_treat"
        ),
    )
    c = m.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_ctrl"),
        (F.col("s1") / F.col("n")).alias("mean_ctrl"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var_ctrl"
        ),
    )
    se2 = F.col("var_treat") / F.col("n_treat") + F.col("var_ctrl") / F.col("n_ctrl")
    return (
        t.join(c, "event_type")
        .filter((F.col("n_treat") >= 2) & (F.col("n_ctrl") >= 2) & (se2 > 0.0))
        .select(
            "event_type",
            "n_treat",
            "n_ctrl",
            "mean_treat",
            "mean_ctrl",
            ((F.col("mean_treat") - F.col("mean_ctrl")) / F.sqrt(se2)).alias(
                "welch_z"
            ),
        )
    )


@_q(
    "erasure_cascade_audit",
    """
    WITH blocked AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 37 = 0),
    o_purged AS (
      SELECT o.o_orderkey FROM orders o
      JOIN blocked b ON o.o_custkey = b.c_custkey),
    audit AS (
      SELECT 'customer' AS table_name,
             (SELECT count(*) FROM blocked) AS n_purged,
             (SELECT count(*) FROM customer) -
               (SELECT count(*) FROM blocked) AS n_kept
      UNION ALL
      SELECT 'orders',
             (SELECT count(*) FROM o_purged),
             (SELECT count(*) FROM orders) -
               (SELECT count(*) FROM o_purged)
      UNION ALL
      SELECT 'lineitem',
             (SELECT count(*) FROM lineitem l
              JOIN o_purged p ON l.l_orderkey = p.o_orderkey),
             (SELECT count(*) FROM lineitem) -
               (SELECT count(*) FROM lineitem l
                JOIN o_purged p ON l.l_orderkey = p.o_orderkey))
    SELECT table_name, CAST(n_purged AS BIGINT) AS n_purged,
           CAST(n_kept AS BIGINT) AS n_kept
    FROM audit
    """,
)
def erasure_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten CASCADE audit: a customer blocklist (here a
    deterministic predicate standing in for the deletion-request table)
    propagates through the foreign-key chain customer -> orders ->
    lineitem, and the audit reports purged/kept row counts per table —
    the compliance artifact an erasure job must produce BEFORE the
    destructive write (the actual purge is the same anti-joins with a
    writer).

    Scale shape: the blocklist and the purged-order keyset are both
    keyset-sized (ids only, no payload columns — column pruning keeps the
    scans narrow); each cascade level is one keyed semi-join; counts are
    map-side partial aggregates.  At 100 TB the keysets broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    blocked = cust.filter(F.col("c_custkey") % 37 == 0).select("c_custkey")
    o_purged = orders.join(
        blocked, orders.o_custkey == blocked.c_custkey
    ).select("o_orderkey")
    l_purged = li.join(o_purged, li.l_orderkey == o_purged.o_orderkey)

    def _row(name: str, purged, total):
        return purged.agg(F.count(F.lit(1)).alias("n_purged")).crossJoin(
            total.agg(F.count(F.lit(1)).alias("n_total"))
        ).select(
            F.lit(name).alias("table_name"),
            F.col("n_purged").cast("bigint").alias("n_purged"),
            (F.col("n_total") - F.col("n_purged")).cast("bigint").alias("n_kept"),
        )

    return (
        _row("customer", blocked, cust)
        .unionAll(_row("orders", o_purged, orders))
        .unionAll(_row("lineitem", l_purged, li))
    )


@_q(
    "drift_tv_distance",
    """
    WITH rng AS (
      SELECT event_type,
             min(CAST(value AS DOUBLE)) AS mn,
             max(CAST(value AS DOUBLE)) AS mx
      FROM events GROUP BY event_type),
    b AS (
      SELECT e.event_type,
             CASE WHEN (rng.mx - rng.mn) / 32.0 = 0.0 THEN 0
                  ELSE least(31, CAST(floor((CAST(e.value AS DOUBLE) - rng.mn)
                                            / ((rng.mx - rng.mn) / 32.0))
                                 AS INTEGER))
             END AS bin,
             CASE WHEN e.ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN 1 ELSE 0 END AS first_half
      FROM events e JOIN rng ON e.event_type = rng.event_type),
    c AS (
      SELECT event_type, bin,
             CAST(SUM(first_half) AS BIGINT) AS c1,
             CAST(SUM(1 - first_half) AS BIGINT) AS c2
      FROM b GROUP BY event_type, bin),
    n AS (
      SELECT event_type,
             CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      FROM c GROUP BY event_type),
    s AS (
      SELECT c.event_type,
             CAST(SUM(abs(c.c1 * n.n2 - c.c2 * n.n1)) AS BIGINT) AS num
      FROM c JOIN n ON c.event_type = n.event_type
      GROUP BY c.event_type)
    SELECT s.event_type, n.n1 AS n_first, n.n2 AS n_second,
           CAST(s.num AS DOUBLE)
             / (2.0 * CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE))
             AS tv_distance
    FROM s JOIN n ON s.event_type = n.event_type
    WHERE n.n1 > 0 AND n.n2 > 0
    """,
)
def drift_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution DRIFT monitor: exact total-variation distance between
    the first and second half of the month, per metric, over 32 fixed
    value bins — the snapshot-over-snapshot check a corpus pipeline runs
    before accepting a new ingest.  PSI's log-ratio is the textbook drift
    score but libm logs are not bit-portable (measured); total variation
    is, because 0.5*sum|c1/n1 - c2/n2| rewrites to the INTEGER sum
    sum|c1*n2 - c2*n1| / (2*n1*n2) — one exact bigint aggregate and a
    single final IEEE division.  Scale shape: one range aggregate
    broadcast, one scan to bin, two type-keyed aggregates over bin-table
    rows (<= 32 per type)."""
    ev = load_table(spark, sf_dir, "events")
    rng = ev.groupBy("event_type").agg(
        F.min(F.col("value").cast("double")).alias("mn"),
        F.max(F.col("value").cast("double")).alias("mx"),
    )
    width = (F.col("mx") - F.col("mn")) / 32.0
    b = (
        ev.join(F.broadcast(rng), "event_type")
        .select(
            "event_type",
            F.when(width == 0.0, F.lit(0))
            .otherwise(
                F.least(
                    F.lit(31),
                    F.floor(
                        (F.col("value").cast("double") - F.col("mn")) / width
                    ).cast("int"),
                )
            )
            .alias("bin"),
            F.when(
                F.col("ts") < F.to_timestamp(F.lit("2024-01-16 00:00:00")), 1
            )
            .otherwise(0)
            .alias("first_half"),
        )
    )
    c = b.groupBy("event_type", "bin").agg(
        F.sum("first_half").cast("bigint").alias("c1"),
        F.sum(1 - F.col("first_half")).cast("bigint").alias("c2"),
    )
    n = c.groupBy("event_type").agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    s = (
        c.join(n, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
            .cast("bigint")
            .alias("num")
        )
    )
    return (
        s.join(n, "event_type")
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "event_type",
            F.col("n1").alias("n_first"),
            F.col("n2").alias("n_second"),
            (
                F.col("num").cast("double")
                / (F.lit(2.0) * F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("tv_distance"),
        )
    )


@_q(
    "sample_neyman_allocation",
    """
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6)) * CAST(value AS DECIMAL(9,6)))
                  AS VARCHAR) AS DOUBLE) AS s2
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)
      GROUP BY event_type),
    w AS (
      SELECT event_type, n,
             CAST(n AS DOUBLE) * sqrt((s2 - s1 * s1 / n) / (n - 1)) AS wt
      FROM m WHERE n >= 2),
    tot AS (SELECT sum(wt) AS sw FROM w),
    alloc AS (
      SELECT w.event_type, w.n,
             1000.0 * w.wt / tot.sw AS a,
             CAST(floor(1000.0 * w.wt / tot.sw) AS BIGINT) AS base,
             1000.0 * w.wt / tot.sw - floor(1000.0 * w.wt / tot.sw) AS rem
      FROM w CROSS JOIN tot),
    leftover AS (SELECT 1000 - sum(base) AS l FROM alloc),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, event_type) AS rr
      FROM alloc),
    target AS (
      SELECT r.event_type, r.n,
             r.base + (CASE WHEN r.rr <= leftover.l THEN 1 ELSE 0 END) AS n_target
      FROM ranked r CROSS JOIN leftover),
    sel AS (
      SELECT e.event_id, e.event_type,
             ROW_NUMBER() OVER (PARTITION BY e.event_type
                 ORDER BY md5('ney' || CAST(e.event_id AS VARCHAR)), e.event_id)
               AS rk
      FROM events e WHERE abs(e.value) < CAST(1000.0 AS DOUBLE))
    SELECT s.event_id, s.event_type, t.n_target
    FROM sel s JOIN target t ON s.event_type = t.event_type
    WHERE s.rk <= t.n_target
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN-allocation stratified sampling: a fixed total budget (1000)
    split across strata proportional to n_h * sigma_h — the
    variance-minimizing allocation for estimating the population mean —
    with LARGEST-REMAINDER integer apportionment (floor everyone, rank
    fractional remainders, top up until the budget is exact) and
    deterministic md5-rank selection inside each stratum.

    Exactness: sigma_h from the exact decimal power sums (skewness
    recipe); allocation shares are identical IEEE doubles on both
    engines, so the remainder ranking agrees; membership is a pure
    function of event ids.  Scale shape: the moments aggregate and the
    per-stratum selection window share the stratum key; the allocation
    table is strata-sized and broadcast.

    One-shot capped semantics: a stratum whose population is smaller than
    its target delivers its whole population (no iterative redistribution)
    -- so the delivered sample is exactly min(n_target, n_h) per stratum,
    and equals the full budget whenever every stratum covers its target
    (true at the driver's sf0.01 and above)."""
    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    d6 = F.col("value").cast("decimal(9,6)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d6).cast("string").cast("double").alias("s1"),
        F.sum(d6 * d6).cast("string").cast("double").alias("s2"),
    )
    w = m.filter(F.col("n") >= 2).select(
        "event_type",
        "n",
        (
            F.col("n").cast("double")
            * F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            )
        ).alias("wt"),
    )
    tot = w.agg(F.sum("wt").alias("sw"))
    a = F.lit(1000.0) * F.col("wt") / F.col("sw")
    alloc = w.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        F.floor(a).cast("bigint").alias("base"),
        (a - F.floor(a)).alias("rem"),
    )
    # alloc's lineage is the full-corpus moments aggregate, and alloc
    # feeds THREE consumers (ranked's left side, the broadcast 'ahead'
    # copy, the leftover aggregate) — persist the strata-sized frame so
    # the scan+aggregate runs once, not three times (the SemDeDup persist
    # pattern; no release protocol needed: the cached frame is a handful
    # of rows)
    alloc = alloc.persist()
    leftover = alloc.agg((F.lit(1000) - F.sum("base")).alias("l"))
    # Largest-remainder rank WITHOUT a global window (the alloc table is
    # strata-sized, but the declared surface bans empty-partition windows
    # outright): rr = 1 + |rows strictly ahead in (rem DESC, event_type ASC)|
    # via a broadcast non-equi self-join count.
    ahead = alloc.select(
        F.col("event_type").alias("b_et"), F.col("rem").alias("b_rem")
    )
    ranked = (
        alloc.join(
            F.broadcast(ahead),
            (F.col("b_rem") > F.col("rem"))
            | (
                (F.col("b_rem") == F.col("rem"))
                & (F.col("b_et") < F.col("event_type"))
            ),
            "left",
        )
        .groupBy("event_type", "base")
        .agg((F.count("b_et") + F.lit(1)).alias("rr"))
    )
    target = ranked.crossJoin(F.broadcast(leftover)).select(
        "event_type",
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("l"), 1).otherwise(0)
        ).alias("n_target"),
    )
    from lvm_datapipe_spark.operators.sampling import md5_order

    ws = Window.partitionBy("event_type").orderBy(*md5_order("event_id", "ney"))
    sel = ev.select(
        "event_id", "event_type", F.row_number().over(ws).alias("rk")
    )
    return (
        sel.join(F.broadcast(target), "event_type")
        .filter(F.col("rk") <= F.col("n_target"))
        .select("event_id", "event_type", "n_target")
    )


@_q(
    "sample_priority_topk",
    """
    WITH p AS (
      SELECT o_orderkey, o_totalprice,
             o_totalprice
               / ((('0x' || substr(md5('prio' || CAST(o_orderkey AS VARCHAR)), 1, 13))::BIGINT + 1)
                  / 4503599627370496.0) AS priority
      FROM orders),
    t AS (SELECT * FROM p ORDER BY priority DESC, o_orderkey LIMIT 501),
    tau AS (SELECT min(priority) AS tau FROM t),
    s AS (SELECT * FROM t ORDER BY priority DESC, o_orderkey LIMIT 500)
    SELECT s.o_orderkey, s.o_totalprice,
           GREATEST(s.o_totalprice, tau.tau) AS weight_est
    FROM s CROSS JOIN tau
    """,
)
def sample_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): fixed-size weighted sample
    without replacement.  Each row gets priority w/u with u a deterministic
    md5-uniform in (0,1]; the sample is the top-k priorities and the
    (k+1)-th priority tau yields the unbiased Horvitz-Thompson-style
    estimator weight max(w, tau) (sum of estimates ~ population total).

    Exactness: u = (h+1)/2^52 with h a 13-hex-digit md5 prefix -- the
    numerator is exactly representable and the divisor is a power of two,
    so u and the single division w/u are identical IEEE doubles on both
    engines.  Scale shape: TakeOrdered top-k (per-partition heaps + one
    k-sized merge at the driver), a scalar broadcast for tau, no global
    sort and no window."""
    k = 500
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("prio"), F.col("o_orderkey").cast("string")
                    ).cast("binary")
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(1)
    ) / F.lit(4503599627370496.0)
    p = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_totalprice") / u).alias("priority"),
    )
    # the (k+1)-row TakeOrdered is consumed twice (tau aggregate + final
    # re-limit) — persist so the orders scan and per-partition heaps run
    # once (tiny cached frame, no release protocol needed)
    top = p.orderBy(F.desc("priority"), F.asc("o_orderkey")).limit(k + 1).persist()
    tau = top.agg(F.min("priority").alias("tau"))
    s = top.orderBy(F.desc("priority"), F.asc("o_orderkey")).limit(k)
    return s.crossJoin(F.broadcast(tau)).select(
        "o_orderkey",
        "o_totalprice",
        F.greatest(F.col("o_totalprice"), F.col("tau")).alias("weight_est"),
    )


@_q(
    "drift_ks_statistic",
    """
    WITH t AS (
      SELECT event_type, value,
             SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)
      GROUP BY event_type, value),
    c AS (
      SELECT event_type,
             SUM(ca) OVER (PARTITION BY event_type ORDER BY value) AS cuma,
             SUM(cb) OVER (PARTITION BY event_type ORDER BY value) AS cumb,
             SUM(ca) OVER (PARTITION BY event_type) AS na,
             SUM(cb) OVER (PARTITION BY event_type) AS nb
      FROM t)
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           MAX(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
                   - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))) AS ks_stat
    FROM c WHERE na > 0 AND nb > 0
    GROUP BY event_type, na, nb
    """,
)
def drift_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per stratum: split the
    event stream into two cohorts by user-id parity and compute
    D = max_v |F_A(v) - F_B(v)| over the pooled distinct values -- the
    classic distribution-drift test between two pipeline snapshots or
    engine versions (complements [[drift_tv_distance]]'s binned TV).

    Exactness: ECDF steps are ratios of exact integer cumulative counts;
    each division/subtraction/abs/max is a single IEEE-identical double op.
    Scale shape: one keyed aggregate on (event_type, value), then keyed
    windows over the distinct-value table (already reduced), no global
    window, no fan-out."""
    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    t = ev.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("cb"),
    )
    wc = Window.partitionBy("event_type").orderBy("value")
    wp = Window.partitionBy("event_type")
    c = t.select(
        "event_type",
        F.sum("ca").over(wc).alias("cuma"),
        F.sum("cb").over(wc).alias("cumb"),
        F.sum("ca").over(wp).alias("na"),
        F.sum("cb").over(wp).alias("nb"),
    )
    return (
        c.filter((F.col("na") > 0) & (F.col("nb") > 0))
        .groupBy("event_type", "na", "nb")
        .agg(
            F.max(
                F.abs(
                    F.col("cuma").cast("double") / F.col("na").cast("double")
                    - F.col("cumb").cast("double") / F.col("nb").cast("double")
                )
            ).alias("ks_stat")
        )
        .select(
            "event_type",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            "ks_stat",
        )
    )


@_q(
    "user_day_event_sequence",
    """
    SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
    FROM events
    GROUP BY user_id, CAST(ts AS DATE)
    """,
)
def user_day_event_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered trajectory assembly: serialize each user-day's event stream
    into a single '>'-delimited action sequence -- the SFT/agent-trace
    shape (per-conversation ordered turn assembly) and the input format
    for sequence-mining / next-action models.

    Determinism: the sequence order is (ts, event_id) -- a total order --
    realized WITHOUT a window: collect_list(struct(ts, event_id,
    event_type)) then array_sort (struct ordering is field-lexicographic),
    so the aggregate stays a single keyed shuffle with partial (map-side)
    collection, and is stable under repartition.  Scale note: per-group
    state is one user-day of events (bounded by user activity, not corpus
    size)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts"), F.col("event_id"), F.col("event_type")
                            )
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("seq"),
        )
        .select("user_id", "day", "n_events", "seq")
    )


# Shared dense hourly grid (single source of truth for the gap-fill and
# WMA queries): per event type, one row per hour from its first to last
# active hour, with n = 0 for silent hours.  The grid is generated from
# the AGGREGATED per-type bounds (types x hours rows) via
# sequence+explode — no per-event fan-out; the grid-to-counts join is
# keyed on (event_type, hour) with the counts side already reduced.
_DENSE_HOURLY_SQL = """h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    b AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1
          FROM h GROUP BY event_type),
    grid AS (
      SELECT b.event_type,
             unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hr
      FROM b),
    dense AS (
      SELECT g.event_type, g.hr, CAST(COALESCE(h.n, 0) AS BIGINT) AS n
      FROM grid g
      LEFT JOIN h ON g.event_type = h.event_type AND g.hr = h.hr)"""


def _dense_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_DENSE_HOURLY_SQL``: (event_type, hr, n) with
    explicit zero rows for silent hours.  An observed hour always has
    n >= 1, so n = 0 <=> gap-filled row."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("n0"))
    b = h.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = b.select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hr"),
    )
    return grid.join(h, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce(F.col("n0"), F.lit(0)).cast("bigint").alias("n"),
    )


@_q(
    "events_gapfill_hourly",
    f"""
    WITH {_DENSE_HOURLY_SQL}
    SELECT event_type, strftime(hr, '%Y-%m-%d %H') AS hour,
           n AS n_events,
           CAST(CASE WHEN n = 0 THEN 0 ELSE 1 END AS BIGINT) AS has_data
    FROM dense
    """,
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: materialize the DENSE hourly grid per
    event type (from each type's first to last active hour) and left-join
    the observed hourly counts, so silent-hour gaps become explicit
    zero rows -- the resample/reindex step every downstream
    forecaster/alerter needs before it can distinguish 'no data' from
    'no traffic'.

    Scale shape: see ``_dense_hourly_counts`` (the shared grid core this
    query and [[events_wma_hourly]] both build on)."""
    dense = _dense_hourly_counts(spark, sf_dir)
    return dense.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH").alias("hour"),
        F.col("n").alias("n_events"),
        F.when(F.col("n") == 0, 0).otherwise(1).cast("bigint").alias("has_data"),
    )


@_q(
    "label_agreement_kappa",
    """
    WITH l AS (
      SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
             CASE WHEN length(text) - length(replace(text, ' ', '')) >= 40
                  THEN 1 ELSE 0 END AS b
      FROM documents),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
             CAST(SUM(a) AS BIGINT) AS a1, CAST(SUM(b) AS BIGINT) AS b1
      FROM l)
    SELECT n, n11, n00,
           (CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(a1 AS DOUBLE) * CAST(b1 AS DOUBLE)
               + CAST(n - a1 AS DOUBLE) * CAST(n - b1 AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
           / (CAST(1 AS DOUBLE)
              - (CAST(a1 AS DOUBLE) * CAST(b1 AS DOUBLE)
                 + CAST(n - a1 AS DOUBLE) * CAST(n - b1 AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS kappa
    FROM m
    """,
)
def label_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic labeling functions (a
    char-length gate vs a word-count gate) -- the labeling-QA readout for
    weak supervision: chance-corrected agreement po-pe over 1-pe, where
    po/pe come from the exact integer confusion matrix.

    Exactness: every input to the kappa expression is an exact integer
    count; the double expression tree is written identically on both
    engines.  Scale shape: one scan-shaped aggregate (map-side partials),
    output is a single row."""
    docs = load_table(spark, sf_dir, "documents")
    l = docs.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("a"),
        F.when(
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            >= 40,
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    m = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0)).alias(
            "n11"
        ),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0)).alias(
            "n00"
        ),
        F.sum("a").alias("a1"),
        F.sum("b").alias("b1"),
    )
    nd = F.col("n").cast("double")
    pe = (
        F.col("a1").cast("double") * F.col("b1").cast("double")
        + (F.col("n") - F.col("a1")).cast("double")
        * (F.col("n") - F.col("b1")).cast("double")
    ) / (nd * nd)
    po = (F.col("n11") + F.col("n00")).cast("double") / nd
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n11").cast("bigint").alias("n11"),
        F.col("n00").cast("bigint").alias("n00"),
        ((po - pe) / (F.lit(1).cast("double") - pe)).alias("kappa"),
    )


@_q(
    "gini_engagement_by_type",
    """
    WITH u AS (
      SELECT event_type, user_id,
             SUM(CAST(value AS DECIMAL(9,6))) AS tot
      FROM events WHERE value > CAST(0.0 AS DOUBLE)
      GROUP BY event_type, user_id),
    r AS (
      SELECT event_type, tot,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY tot, user_id) AS rk
      FROM u),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
             CAST(CAST(SUM(tot) AS VARCHAR) AS DOUBLE) AS s0,
             CAST(CAST(SUM(rk * tot) AS VARCHAR) AS DOUBLE) AS s1
      FROM r GROUP BY event_type)
    SELECT event_type, n_users,
           (2.0 * s1 - (CAST(n_users AS DOUBLE) + 1.0) * s0)
             / (CAST(n_users AS DOUBLE) * s0) AS gini
    FROM s WHERE n_users >= 2
    """,
)
def gini_engagement_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user engagement value within each event
    type -- the concentration/inequality readout that tells a dataset
    curator whether a source's contribution is dominated by a handful of
    heavy users (a dedup/contamination risk) or spread evenly.

    Exactness: user totals are exact DECIMAL sums; the Lorenz moment
    sum(rank*total) multiplies an integer rank into the decimal and sums
    exactly; only the final fixed expression tree runs in doubles
    (decimal-to-double via the string route, the repo convention).  Scale
    shape: keyed aggregate -> keyed window (event_type partitions) ->
    keyed aggregate; no global window."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0.0)
    u = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(9,6)")).alias("tot")
    )
    w = Window.partitionBy("event_type").orderBy("tot", "user_id")
    r = u.select(
        "event_type", "tot", F.row_number().over(w).alias("rk")
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("tot").cast("string").cast("double").alias("s0"),
        F.sum(F.col("rk") * F.col("tot")).cast("string").cast("double").alias("s1"),
    )
    nd = F.col("n_users").cast("double")
    return (
        s.filter(F.col("n_users") >= 2)
        .select(
            "event_type",
            F.col("n_users").cast("bigint").alias("n_users"),
            (
                (F.lit(2.0) * F.col("s1") - (nd + F.lit(1.0)) * F.col("s0"))
                / (nd * F.col("s0"))
            ).alias("gini"),
        )
    )


@_q(
    "user_type_diversity",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS ct
      FROM events GROUP BY user_id, event_type),
    u AS (
      SELECT user_id,
             CAST(SUM(ct) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(SUM(ct * ct) AS BIGINT) AS s2
      FROM c GROUP BY user_id)
    SELECT user_id, n_events, n_types,
           1.0 - CAST(s2 AS DOUBLE)
                 / (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))
             AS simpson
    FROM u
    """,
)
def user_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user via the Gini-Simpson index
    1 - sum(p_i^2): the probability two random actions by the user differ
    in type.  The same readout a curator runs per-source on token/topic
    distributions to catch monoculture slices; chosen over Shannon
    entropy because it is RATIONAL in the counts (no transcendental log,
    whose last-ulp rounding differs across engines).

    Scale shape: two keyed aggregates sharing the user_id key (the second
    groups an already-reduced table); map-side partials throughout."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("ct"))
    u = c.groupBy("user_id").agg(
        F.sum("ct").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("ct") * F.col("ct")).cast("bigint").alias("s2"),
    )
    ne = F.col("n_events").cast("double")
    return u.select(
        "user_id",
        "n_events",
        F.col("n_types").cast("bigint").alias("n_types"),
        (F.lit(1.0) - F.col("s2").cast("double") / (ne * ne)).alias("simpson"),
    )


@_q(
    "pareto_half_revenue_customers",
    """
    WITH t AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS tot
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT c.c_nationkey, t.tot,
             SUM(t.tot) OVER (PARTITION BY c.c_nationkey
                              ORDER BY t.tot DESC, t.o_custkey) AS cum,
             SUM(t.tot) OVER (PARTITION BY c.c_nationkey) AS total
      FROM t JOIN customer c ON t.o_custkey = c.c_custkey),
    s AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(SUM(CASE WHEN 2 * cum < total THEN 1 ELSE 0 END) + 1
                  AS BIGINT) AS n_to_half
      FROM r GROUP BY c_nationkey)
    SELECT n.n_name, s.n_customers, s.n_to_half,
           CAST(s.n_to_half AS DOUBLE) / CAST(s.n_customers AS DOUBLE)
             AS half_share
    FROM s JOIN nation n ON s.c_nationkey = n.n_nationkey
    """,
)
def pareto_half_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto coverage: per nation, how many of its highest-revenue
    customers it takes to cover HALF the nation's total revenue (and the
    share of the customer base that is) -- the concentration-curve
    question behind 'can we dedup/downsample the long tail without
    moving the aggregate'.

    Exactness: revenue stays DECIMAL end-to-end; the half-threshold test
    is the integer-exact comparison 2*cum < total (no division, no
    doubles until the final share ratio).  Scale shape: keyed aggregate
    on custkey, shuffle join to the customer dim on the same key, keyed
    windows per nation, broadcast nation-name join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    t = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("tot")
    )
    j = t.join(cust, t.o_custkey == cust.c_custkey)
    wc = Window.partitionBy("c_nationkey").orderBy(
        F.desc("tot"), F.asc("o_custkey")
    )
    wp = Window.partitionBy("c_nationkey")
    r = j.select(
        "c_nationkey",
        "tot",
        F.sum("tot").over(wc).alias("cum"),
        F.sum("tot").over(wp).alias("total"),
    )
    s = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (
            F.sum(F.when(F.lit(2) * F.col("cum") < F.col("total"), 1).otherwise(0))
            + F.lit(1)
        )
        .cast("bigint")
        .alias("n_to_half"),
    )
    return (
        s.join(F.broadcast(nation), s.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            "n_to_half",
            (
                F.col("n_to_half").cast("double")
                / F.col("n_customers").cast("double")
            ).alias("half_share"),
        )
    )


def _ann_recall_sql() -> str:
    """Recall@10 oracle: the exact brute-force top-10 CTE joined against
    the fixed-quantizer IVF top-10 (both replayed with the same literals
    and tie-breaks as their standalone oracle-checked queries)."""
    exact_body = ORACLE_SQL["ann_cosine_topk"]
    ivf_body = _ivf_fixed_sql()
    return f"""
    WITH exact AS (SELECT query_id, neighbor_id FROM ({exact_body}) x),
    approx AS (SELECT query_id, neighbor_id FROM ({ivf_body}) a),
    base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
             FROM exact GROUP BY query_id),
    hit AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
            FROM exact e JOIN approx a
              ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
            GROUP BY e.query_id)
    SELECT b.query_id, b.n_exact,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(b.n_exact AS DOUBLE)
             AS recall
    FROM base b LEFT JOIN hit h ON b.query_id = h.query_id
    """


@_q("ann_recall_eval", _ann_recall_sql())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine ANN quality evaluation: recall@10 of the fixed-quantizer
    IVF (n_probe=4 of 16 cells) against the exact brute-force top-10, per
    query -- the measurement loop an index operator runs before trading
    recall for probe cost.  Composes two already-oracle-checked operators,
    so the oracle replays BOTH sides with identical literals/tie-breaks
    and the recall ratio is a single exact integer division.

    Scale shape: inherits the probed-cell pruning of the IVF side and the
    broadcast-queries scan of the exact side; the recall join keys on
    (query_id, neighbor_id) over two k*|queries|-sized tables (tiny)."""
    from lvm_datapipe_spark.operators.similarity import (
        brute_force_topk,
        ivf_fixed_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=10).select("query_id", "neighbor_id")
    approx = ivf_fixed_topk(emb, queries, k=10, n_cells=16, n_probe=4).select(
        "query_id", "neighbor_id"
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hit = (
        exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return base.join(hit, "query_id", "left").select(
        "query_id",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        (
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
            / F.col("n_exact").cast("double")
        ).alias("recall"),
    )


@_q(
    "events_wma_hourly",
    f"""
    WITH {_DENSE_HOURLY_SQL},
    lagged AS (
      SELECT event_type, hr, n,
             lag(n, 1) OVER (PARTITION BY event_type ORDER BY hr) AS n1,
             lag(n, 2) OVER (PARTITION BY event_type ORDER BY hr) AS n2
      FROM dense)
    SELECT event_type, strftime(hr, '%Y-%m-%d %H') AS hour, n,
           CAST(4 * n + 2 * n1 + n2 AS DOUBLE) / CAST(7 AS DOUBLE) AS wma
    FROM lagged WHERE n1 IS NOT NULL AND n2 IS NOT NULL
    """,
)
def events_wma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-kernel weighted moving average (weights 4/2/1 over the last
    three hours, normalized by 7) per event type, computed over the DENSE
    gap-filled hourly grid so the kernel is a true time-shift (a silent
    hour contributes 0, not the previous observed hour) -- the exact
    integer-arithmetic smoother (EWMA's infinite tail is a driver of
    cross-engine float drift; a finite integer kernel has none: one
    division by 7 per output row).

    Scale shape: ``_dense_hourly_counts`` (the shared grid core, also
    behind [[events_gapfill_hourly]]) plus one keyed lag window over the
    grid-sized table."""
    dense = _dense_hourly_counts(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = dense.select(
        "event_type",
        "hr",
        "n",
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("n", 2).over(w).alias("n2"),
    )
    return lagged.filter(
        F.col("n1").isNotNull() & F.col("n2").isNotNull()
    ).select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH").alias("hour"),
        "n",
        (
            (F.lit(4) * F.col("n") + F.lit(2) * F.col("n1") + F.col("n2")).cast(
                "double"
            )
            / F.lit(7).cast("double")
        ).alias("wma"),
    )


@_q(
    "partition_skew_report",
    """
    WITH b AS (
      SELECT ('0x' || substr(md5('pt' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 32
               AS bucket
      FROM documents),
    c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bucket)
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(MIN(n) AS BIGINT) AS min_bucket,
           CAST(MAX(n) * count(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
             AS skew_ratio
    FROM c
    """,
)
def partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-partition skew diagnostic: bucket the corpus by the same
    md5 hash family the samplers use (32 buckets), then report the
    max/mean imbalance factor -- the number that predicts whether a keyed
    shuffle at scale has a straggler partition (skew_ratio ~ 1 means
    balanced; >> 1 means salt or re-key before scaling up).

    Exactness: pure integer counts; the ratio is computed as
    max*n_buckets/total in one exact multiply + one division.  Scale
    shape: one scan-shaped bucket aggregate over 32 cells, then a
    32-row summary."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(hash_bucket("doc_id", 32, "pt").alias("bucket")).groupBy(
        "bucket"
    ).agg(F.count(F.lit(1)).alias("n"))
    return c.agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.min("n").cast("bigint").alias("min_bucket"),
        (
            (F.max("n") * F.count(F.lit(1))).cast("double")
            / F.sum("n").cast("double")
        ).alias("skew_ratio"),
    )


@_q(
    "weighted_median_price_by_brand",
    """
    WITH j AS (
      SELECT p.p_brand, l.l_extendedprice AS price,
             CAST(l.l_quantity AS BIGINT) AS w
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    g AS (
      SELECT p_brand, price, CAST(SUM(w) AS BIGINT) AS w
      FROM j GROUP BY p_brand, price),
    c AS (
      SELECT p_brand, price, w,
             SUM(w) OVER (PARTITION BY p_brand ORDER BY price) AS cum,
             SUM(w) OVER (PARTITION BY p_brand) AS tot
      FROM g)
    SELECT p_brand, CAST(MAX(tot) AS BIGINT) AS total_qty,
           MIN(CASE WHEN 2 * cum >= tot THEN price END) AS wmedian_price
    FROM c GROUP BY p_brand
    """,
)
def weighted_median_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median (lower): per part brand, the smallest price at
    which the cumulative quantity reaches half the brand's total quantity
    -- the quantity-weighted center of the price distribution (the exact
    dual of the sketch-based quantile ops, for when the answer must be a
    number both engines agree on to the bit).

    Exactness: quantities are integer-valued (cast BIGINT); collapsing to
    per-(brand, price) weight sums FIRST makes the cumulative sum
    peer-free, so the 2*cum >= tot threshold is a pure integer
    comparison and the selected price is a raw parquet double.  Scale
    shape: keyed join (part dim broadcast by AQE), keyed aggregate, keyed
    windows, keyed argmin -- no global window."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    g = j.groupBy("p_brand", "price").agg(F.sum("w").cast("bigint").alias("w"))
    wc = Window.partitionBy("p_brand").orderBy("price")
    wp = Window.partitionBy("p_brand")
    c = g.select(
        "p_brand",
        "price",
        "w",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wp).alias("tot"),
    )
    return c.groupBy("p_brand").agg(
        F.max("tot").cast("bigint").alias("total_qty"),
        F.min(
            F.when(F.lit(2) * F.col("cum") >= F.col("tot"), F.col("price"))
        ).alias("wmedian_price"),
    )


@_q(
    "vocab_churn_halves",
    rf"""
    WITH tok AS (
      SELECT doc_id % 2 AS half, unnest({_SQL_LTOKS}) AS token
      FROM documents),
    fa AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok
           WHERE half = 0 GROUP BY token),
    fb AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok
           WHERE half = 1 GROUP BY token),
    ta AS (SELECT token FROM fa ORDER BY n DESC, token LIMIT 10),
    tb AS (SELECT token FROM fb ORDER BY n DESC, token LIMIT 10),
    u AS (
      SELECT COALESCE(ta.token, tb.token) AS token,
             ta.token IS NOT NULL AS in_a, tb.token IS NOT NULL AS in_b
      FROM ta FULL OUTER JOIN tb ON ta.token = tb.token)
    SELECT u.token,
           CAST(COALESCE(fa.n, 0) AS BIGINT) AS n_a,
           CAST(COALESCE(fb.n, 0) AS BIGINT) AS n_b,
           CASE WHEN in_a AND in_b THEN 'stayed'
                WHEN in_b THEN 'entered' ELSE 'exited' END AS status
    FROM u
    LEFT JOIN fa ON u.token = fa.token
    LEFT JOIN fb ON u.token = fb.token
    """,
)
def vocab_churn_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter churn: which tokens ENTER or EXIT the top-10
    vocabulary between two corpus halves (deterministic doc-id split
    standing in for two ingestion snapshots) -- the token-level drift
    monitor a curation pipeline runs between crawls, sharper than the
    distribution-level [[drift_tv_distance]] / [[drift_ks_statistic]]
    because it names the tokens that moved.

    Scale shape: one tokenize pass feeding two token-keyed partial
    aggregates, TakeOrdered top-10 each (no global sort; k sized to the
    synthetic corpus's 31-token vocabulary so enter/exit transitions
    actually occur at test scale -- the ADVICE-r5 thin-cell lesson; a
    production deploy raises k to 100+), a tiny full-outer join, and two
    keyed lookups back into the frequency tables for the true counts
    (AQE broadcasts the tiny probe side)."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    fa = X.token_frequencies(docs.filter(F.col("doc_id") % 2 == 0))
    fb = X.token_frequencies(docs.filter(F.col("doc_id") % 2 == 1))
    ta = R.top_k(fa, [F.desc("n"), F.asc("token")], 10).select(
        F.col("token").alias("a_token")
    )
    tb = R.top_k(fb, [F.desc("n"), F.asc("token")], 10).select(
        F.col("token").alias("b_token")
    )
    u = ta.join(
        tb, ta.a_token == tb.b_token, "full_outer"
    ).select(
        F.coalesce("a_token", "b_token").alias("token"),
        F.col("a_token").isNotNull().alias("in_a"),
        F.col("b_token").isNotNull().alias("in_b"),
    )
    out = (
        u
        .join(fa.withColumnRenamed("n", "na"), "token", "left")
        .join(fb.withColumnRenamed("n", "nb"), "token", "left")
    )
    return out.select(
        "token",
        F.coalesce("na", F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce("nb", F.lit(0)).cast("bigint").alias("n_b"),
        F.when(F.col("in_a") & F.col("in_b"), "stayed")
        .when(F.col("in_b"), "entered")
        .otherwise("exited")
        .alias("status"),
    )


@_q(
    "attribution_linear_exact",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts,
             CAST(floor(value * 1000000.0) AS BIGINT) AS micro
      FROM events
      WHERE event_type = 'purchase' AND value > CAST(0.0 AS DOUBLE)),
    t AS (
      SELECT event_id AS tid, user_id, ts AS tts, event_type
      FROM events WHERE event_type IN ('view', 'click')),
    j AS (
      SELECT p.pid, p.micro, t.tid, t.event_type, t.tts
      FROM p JOIN t ON p.user_id = t.user_id
      WHERE t.tts < p.pts AND t.tts >= p.pts - INTERVAL 1 HOUR),
    r AS (
      SELECT pid, micro, event_type,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tts, tid) AS rk,
             COUNT(*) OVER (PARTITION BY pid) AS n
      FROM j),
    c AS (
      SELECT event_type,
             micro // n + (CASE WHEN rk <= micro % n THEN 1 ELSE 0 END)
               AS credit
      FROM r)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit) AS BIGINT) AS credit_micro,
           CAST(SUM(credit) AS DOUBLE) / 1000000.0 AS credit_value
    FROM c GROUP BY event_type
    """,
)
def attribution_linear_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT linear multi-touch attribution: each purchase's value is
    split across the user's view/click touches in the preceding hour --
    in INTEGER micro-units with largest-remainder apportionment (floor
    share to everyone, the first value%n touches by time get +1), the
    same integer-apportionment trick as [[sample_neyman_allocation]].
    Per-purchase credits sum to exactly the purchase value, and the
    cross-purchase SUM is a bigint -- no float-accumulation drift, which
    is what makes naive value/n attribution engine-divergent.

    Scale shape: the purchase-touch pairing is a user-keyed equi-join
    with a 1-hour range predicate (per-user activity bounds the fan-out;
    at extreme per-user volumes, re-key on (user, hour-bucket) like the
    binned range join); the rank/count windows partition by purchase id.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0.0)
    ).select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.floor(F.col("value") * 1000000.0).cast("bigint").alias("micro"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("ts").alias("tts"),
        "event_type",
    )
    j = p.join(t, "user_id").filter(
        (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.expr("pts - INTERVAL 1 HOUR"))
    )
    wr = Window.partitionBy("pid").orderBy("tts", "tid")
    wn = Window.partitionBy("pid")
    r = j.select(
        "pid",
        "micro",
        "event_type",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    c = r.select(
        "event_type",
        (
            F.expr("micro div n")
            + F.when(F.col("rk") <= F.col("micro") % F.col("n"), 1).otherwise(0)
        ).alias("credit"),
    )
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("credit").cast("bigint").alias("credit_micro"),
        (F.sum("credit").cast("double") / F.lit(1000000.0)).alias("credit_value"),
    )


@_q(
    "next_event_training_pairs",
    """
    SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           string_agg(event_type, '>') OVER (
             PARTITION BY user_id, CAST(ts AS DATE)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prefix,
           event_type AS label
    FROM events
    QUALIFY prefix IS NOT NULL
    """,
)
def next_event_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autoregressive training-example materialization: each event becomes
    one (prefix-of-the-user-day-so-far, next-action) supervised pair --
    the canonical next-token/next-action dataset shaping step (every
    position is a label exactly once, so the expansion is LINEAR in
    events, not quadratic in sequence length).

    Determinism: the prefix is an ordered string_agg over the (ts,
    event_id) total order.  Scale shape: ONE keyed window (user-day
    partitions, running collect) -- the per-row prefix payload is bounded
    by the user's day activity, not the corpus."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", F.col("ts").cast("date"))
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.select(
            "user_id",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            F.concat_ws(">", F.collect_list("event_type").over(w)).alias("prefix"),
            F.col("event_type").alias("label"),
        )
        .filter(F.col("prefix") != "")
    )


@_q(
    "pipeline_sft_examples",
    """
    WITH pairs AS (
      SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             string_agg(event_type, '>') OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prefix,
             event_type AS label,
             COUNT(*) OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS day_n
      FROM events
      QUALIFY prefix IS NOT NULL)
    SELECT user_id, day, prefix, label,
           CASE WHEN ('0x' || substr(md5('sft' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                     % 10 < 8
                THEN 'train' ELSE 'val' END AS split
    FROM pairs WHERE day_n >= 3
    """,
)
def pipeline_sft_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SFT example pipeline: trajectory pair materialization
    ([[next_event_training_pairs]]) -> activity gate (user-days with < 3
    events carry no sequence signal) -> USER-level 80/20 md5 split (the
    leakage-safe boundary: all of a user's examples land on one side, so
    val never sees a prefix of a train user's behavior).

    Scale shape: one keyed window pass produces pairs AND the day-count
    gate (same partitioning, no second shuffle); the split is a
    scan-shaped pure hash function of user_id -- stable under
    repartition, replayable across engines."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    wp = Window.partitionBy("user_id", day).orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wn = Window.partitionBy("user_id", day)
    pairs = ev.select(
        "user_id",
        F.date_format(day, "yyyy-MM-dd").alias("day"),
        F.concat_ws(">", F.collect_list("event_type").over(wp)).alias("prefix"),
        F.col("event_type").alias("label"),
        F.count(F.lit(1)).over(wn).alias("day_n"),
    ).filter(F.col("prefix") != "")
    return (
        pairs.filter(F.col("day_n") >= 3)
        .select(
            "user_id",
            "day",
            "prefix",
            "label",
            F.when(hash_bucket("user_id", 10, "sft") < 8, "train")
            .otherwise("val")
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# Retrieval: BM25 lexical ranking, hybrid lexical+vector fusion, skip-grams
# ---------------------------------------------------------------------------

_BM25_TERMS = ("window", "merge", "stream")


def _bm25_lexagg_sql(terms=_BM25_TERMS, k1: float = 1.2, b: float = 0.75) -> str:
    """CTE chain computing per-doc BM25 scores — literals come from the
    SAME Python floats as the Spark side's F.lit values (repr round-trips
    bit-exactly; '::DOUBLE' defeats DuckDB's DECIMAL literal lexing), and
    the per-term combination replays the Spark side's fixed coalesce
    chain, so the result is bit-identical."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    combine = "\n          + ".join(
        f"COALESCE(MAX(CASE WHEN token = '{t}' THEN s END), 0.0)" for t in terms
    )
    return f"""
    tok AS (SELECT doc_id, unnest({_SQL_LTOKS}) AS token FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS total_toks FROM dl),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE token IN ({in_list}) GROUP BY doc_id, token),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    s AS (SELECT tf.doc_id, tf.token,
            ((CAST(n.n_docs AS DOUBLE) - CAST(dft.df AS DOUBLE) + 0.5)
              / (CAST(dft.df AS DOUBLE) + 0.5))
            * (CAST(tf.tf AS DOUBLE) * '{k1 + 1.0!r}'::DOUBLE)
            / (CAST(tf.tf AS DOUBLE)
               + '{k1!r}'::DOUBLE * ('{1.0 - b!r}'::DOUBLE
                  + '{b!r}'::DOUBLE * (CAST(dl.dl AS DOUBLE)
                     / (CAST(n.total_toks AS DOUBLE)
                        / CAST(n.n_docs AS DOUBLE)))))
            AS s
          FROM tf JOIN dl USING (doc_id) JOIN dft USING (token) CROSS JOIN n),
    lexagg AS (SELECT doc_id, {combine} AS score FROM s GROUP BY doc_id)"""


@_q(
    "bm25_topk",
    f"""
    WITH {_bm25_lexagg_sql()}
    SELECT doc_id, score FROM lexagg ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval: top-10 documents for a fixed 3-term query
    (log-free linear idf — see operators/ranking.py for the spec and the
    bit-portability rationale).

    Scale shape: the token stream is filtered to the query's terms BEFORE
    the (doc, term) aggregate, so the scoring shuffle is sized by those
    terms' posting lists, not the corpus; df (≤3 rows) and the corpus
    scalars broadcast; doc length is one scan-shaped keyed count; the
    final top-10 is TakeOrderedAndProject (per-task heaps, no global
    sort)."""
    from lvm_datapipe_spark.operators import ranking as RK

    docs = load_table(spark, sf_dir, "documents")
    scored = RK.bm25_scores(docs, _BM25_TERMS)
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


@_q(
    "hybrid_rank_fusion",
    f"""
    WITH {_bm25_lexagg_sql()},
    lextop AS (SELECT doc_id, score FROM lexagg
               ORDER BY score DESC, doc_id LIMIT 50),
    lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                 AS rank FROM lextop),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    sc AS (SELECT vec_id, {_cos_sql('qv', 'v')} AS cos_sim
           FROM e CROSS JOIN q WHERE vec_id <> 0),
    vectop AS (SELECT vec_id, cos_sim FROM sc
               ORDER BY cos_sim DESC, vec_id LIMIT 50),
    vec AS (SELECT vec_id AS doc_id,
                   ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
            FROM vectop)
    SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
           COALESCE(1.0 / CAST(60 + lex.rank AS DOUBLE), 0.0)
           + COALESCE(1.0 / CAST(60 + vec.rank AS DOUBLE), 0.0) AS rrf
    FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of a BM25 lexical top-50
    and an exact-cosine vector top-50 (query = embedding of vec_id 0; the
    tables share the 0..N id space, the classic doc/embedding sidecar
    layout).  RRF needs only ranks — no score calibration across the two
    scorers — which is what makes it the standard lexical+vector fusion.

    Scale shape: each leg's candidate list is a bounded top-50
    (TakeOrderedAndProject); the rank windows and the full-outer fusion
    join run over ≤50-row inputs, so nothing downstream of the two
    corpus scans grows with the corpus."""
    from lvm_datapipe_spark.operators import ranking as RK
    from lvm_datapipe_spark.operators import similarity as V

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = RK.ranked_topk(RK.bm25_scores(docs, _BM25_TERMS), "score", "doc_id", 50)
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(
            V.as_double("embedding").alias("qv")
        )
    )
    sc = (
        emb.crossJoin(q)
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            V.cosine(F.col("qv"), V.as_double("embedding")).alias("cos_sim"),
        )
    )
    vec = RK.ranked_topk(sc, "cos_sim", "vec_id", 50).withColumnRenamed(
        "vec_id", "doc_id"
    )
    fused = RK.rrf_fuse(lex, vec, "doc_id")
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(10)


@_q(
    "skipgram_pairs",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_LTOKS} AS toks FROM documents),
    ex AS (SELECT toks, unnest(range(1, len(toks) + 1)) AS i FROM t),
    pairs AS (
      SELECT toks[i] AS center, toks[i + d] AS context
      FROM ex CROSS JOIN (SELECT unnest([-2, -1, 1, 2]) AS d) d
      WHERE i + d BETWEEN 1 AND len(toks))
    SELECT center, context, CAST(count(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY center, context HAVING count(*) >= 5
    """,
)
def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair counts within a ±2 window — the
    word2vec training-pair shaping stage and the raw counts behind token
    PMI (the log-free lift twin of [[basket_part_lift]]).

    Scale shape (operators/text.py:skipgram_pairs): no positional
    self-join — each position fans out to exactly 2·window offset lookups
    into the still-attached token array, so the pre-aggregate row count
    is 4× the token count, never dl² per doc; the min-count floor is
    applied IN the single keyed count so sub-floor pairs never leave the
    shuffle."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return X.skipgram_pairs(docs, window=2, min_count=5)


@_q(
    "postings_topk_by_term",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_LTOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok
           GROUP BY doc_id, token)
    SELECT token, doc_id, tf,
           CAST(ROW_NUMBER() OVER (PARTITION BY token
                ORDER BY tf DESC, doc_id) AS INTEGER) AS rank
    FROM tf
    QUALIFY rank <= 3
    """,
)
def postings_topk_by_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact-ordered posting lists: the top-3 documents per term by term
    frequency — the index-side delivery shape of retrieval (the per-doc
    mirror is [[tfidf_top_terms]]; [[bm25_topk]] is the query-time
    consumer).  Real impact-ordered indexes keep the head of each posting
    list hot; the cap is the point, not a shortcut.

    Scale shape: one (doc, token) count with map-side partials, then a
    TOKEN-keyed window that Spark executes as WindowGroupLimit — the
    per-group top-k filter runs BELOW the shuffle on each map partition,
    so at most 3 rows per (token, input-partition) ever enter the
    exchange; key count = vocabulary size."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(X.tokens(F.lower(F.col("text")))).alias("token")
    )
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    w = Window.partitionBy("token").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("token", "doc_id", "tf", F.col("rank").cast("int").alias("rank"))
    )


@_q(
    "pmi_skipgram_lift",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_LTOKS} AS toks FROM documents),
    ex AS (SELECT toks, unnest(range(1, len(toks) + 1)) AS i FROM t),
    raw AS (
      SELECT toks[i] AS center, toks[i + d] AS context,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ex CROSS JOIN (SELECT unnest([-2, -1, 1, 2]) AS d) d
      WHERE i + d BETWEEN 1 AND len(toks)
      GROUP BY center, context),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM raw),
    mc AS (SELECT center, CAST(sum(cnt) AS BIGINT) AS c_center
           FROM raw GROUP BY center),
    mx AS (SELECT context, CAST(sum(cnt) AS BIGINT) AS c_context
           FROM raw GROUP BY context)
    SELECT raw.center, raw.context, raw.cnt,
           (CAST(raw.cnt AS DOUBLE) * CAST(tot.total AS DOUBLE))
           / (CAST(mc.c_center AS DOUBLE) * CAST(mx.c_context AS DOUBLE))
           AS lift
    FROM raw
    JOIN mc USING (center) JOIN mx USING (context) CROSS JOIN tot
    WHERE raw.cnt >= 5
    """,
)
def pmi_skipgram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level association lift over ±2-window skip-gram pairs — PMI
    without the log (PMI = log(lift); the log-free form is bit-portable
    across engines, same spec choice as [[basket_part_lift]], whose
    docstring names this exact token analogue).  lift > 1 marks
    collocations; the word2vec/GloVe statistics in one query.

    Scale shape: the unfloored pair aggregate is the marginals' input (a
    floored one would bias p(center)/p(context)), computed once and
    persisted across its three consumers; marginals are vocab-sized and
    broadcast back; the support floor prunes the output only.  Exact
    integer counts everywhere, one double expression at the end (counts
    < 2^53 — holds to ~9e15 pair occurrences)."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    raw = X.skipgram_pairs(docs, window=2, min_count=1).persist()
    tot = raw.agg(F.sum("cnt").cast("long").alias("total"))
    mc = raw.groupBy("center").agg(F.sum("cnt").cast("long").alias("c_center"))
    mx = raw.groupBy("context").agg(F.sum("cnt").cast("long").alias("c_context"))
    lift = (F.col("cnt").cast("double") * F.col("total").cast("double")) / (
        F.col("c_center").cast("double") * F.col("c_context").cast("double")
    )
    return (
        raw.filter(F.col("cnt") >= 5)
        .join(F.broadcast(mc), "center")
        .join(F.broadcast(mx), "context")
        .crossJoin(F.broadcast(tot))
        .select("center", "context", "cnt", lift.alias("lift"))
    )


@_q(
    "doc_hashed_features",
    """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
             '\\s+'), x -> x <> '')) AS token
      FROM documents),
    sgn AS (
      SELECT doc_id,
             ('0x' || substr(md5('feat' || token), 1, 8))::BIGINT % 64
               AS bucket,
             1 - 2 * (('0x' || substr(md5('feat' || token), 9, 1))::BIGINT % 2)
               AS sign
      FROM tok),
    w AS (SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS w
          FROM sgn GROUP BY doc_id, bucket HAVING sum(sign) <> 0),
    nrm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS norm2
            FROM w GROUP BY doc_id)
    SELECT w.doc_id, w.bucket,
           CAST(w.w AS DOUBLE) / sqrt(CAST(nrm.norm2 AS DOUBLE)) AS weight
    FROM w JOIN nrm USING (doc_id)
    """,
)
def doc_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document featurizer (operators/text.py:
    hashed_features): 64-dim signed-hash bag-of-words, L2-normalized,
    sparse (doc_id, bucket, weight) output — vocabulary-free text
    embeddings whose cosine is a plain sparse dot, feeding the same ANN
    machinery as the embeddings table.

    Bit-portability: signed counts and the squared-norm are exact BIGINT
    aggregates (order-free); the only float math is one final
    sqrt + divide, mirrored verbatim in the oracle."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return X.hashed_features(docs, dim=64, salt="feat")


_HASHED_COUNTS_SQL = """
    tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
             '\\s+'), x -> x <> '')) AS token
      FROM documents),
    sgn AS (
      SELECT doc_id,
             ('0x' || substr(md5('feat' || token), 1, 8))::BIGINT % 64
               AS bucket,
             1 - 2 * (('0x' || substr(md5('feat' || token), 9, 1))::BIGINT % 2)
               AS sign
      FROM tok),
    w AS (SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS w
          FROM sgn GROUP BY doc_id, bucket HAVING sum(sign) <> 0),
    nrm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS norm2
            FROM w GROUP BY doc_id)"""


@_q(
    "sparse_cosine_topk",
    f"""
    WITH {_HASHED_COUNTS_SQL},
    q AS (SELECT bucket, w AS qw FROM w WHERE doc_id = 0),
    qn AS (SELECT norm2 AS qnorm2 FROM nrm WHERE doc_id = 0),
    dots AS (
      SELECT w.doc_id, CAST(sum(w.w * q.qw) AS BIGINT) AS dot_i
      FROM w JOIN q USING (bucket)
      WHERE w.doc_id <> 0
      GROUP BY w.doc_id)
    SELECT d.doc_id,
           CAST(d.dot_i AS DOUBLE)
           / (sqrt(CAST(n.norm2 AS DOUBLE)) * sqrt(CAST(qn.qnorm2 AS DOUBLE)))
             AS cos_sim
    FROM dots d JOIN nrm n USING (doc_id) CROSS JOIN qn
    ORDER BY cos_sim DESC, doc_id LIMIT 10
    """,
)
def sparse_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse cosine retrieval over the hashing-trick features: top-10
    documents most similar to doc 0, executed EXACTLY the way an inverted
    index executes a dot product — the broadcast query vector joins the
    corpus postings on bucket, partial products sum per doc.

    Bit-portability: the dot and both squared norms are exact BIGINT
    aggregates (order-free); cosine is ONE float expression at the end.
    Scale shape: query features (≤ dim rows) broadcast; the only shuffle
    is the doc-keyed partial-aggregated dot; top-10 is
    TakeOrderedAndProject."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    w = X.hashed_counts(docs, dim=64, salt="feat").persist()
    nrm = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("norm2")
    )
    q = F.broadcast(
        w.filter(F.col("doc_id") == 0).select("bucket", F.col("w").alias("qw"))
    )
    qn = F.broadcast(
        nrm.filter(F.col("doc_id") == 0).select(F.col("norm2").alias("qnorm2"))
    )
    dots = (
        w.filter(F.col("doc_id") != 0)
        .join(q, "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).cast("long").alias("dot_i"))
    )
    cos = F.col("dot_i").cast("double") / (
        F.sqrt(F.col("norm2").cast("double")) * F.sqrt(F.col("qnorm2").cast("double"))
    )
    return (
        dots.join(nrm, "doc_id")
        .crossJoin(qn)
        .select("doc_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(10)
    )


@_q(
    "kanonymity_audit",
    """
    SELECT c_nationkey,
           CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
           CAST(count(*) AS BIGINT) AS k,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l,
           count(*) < 5 AS violates_k5,
           count(DISTINCT c_mktsegment) < 2 AS violates_l2
    FROM customer
    GROUP BY c_nationkey, CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)
    """,
)
def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney; Machanavajjhala et al.):
    for each quasi-identifier equivalence class (nation x coarse account-
    balance band), the class size k and the diversity l of the sensitive
    attribute (market segment), with the k<5 / l<2 violation flags — the
    re-identification risk report a release gate runs BEFORE publishing a
    "de-identified" extract (small classes re-identify by linkage; k-safe
    but homogeneous classes still leak the sensitive value).  Compliance
    sibling of [[erasure_cascade_audit]].

    Scale shape: ONE keyed aggregate over the quasi-identifier columns
    (count + count-distinct share the shuffle); output is cell-count
    sized, bounded by the QI domain, never the table."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long")
    k = F.count(F.lit(1))
    l = F.countDistinct("c_mktsegment")
    return (
        c.groupBy(F.col("c_nationkey"), band.alias("bal_band"))
        .agg(
            k.cast("long").alias("k"),
            l.cast("long").alias("l"),
            (k < 5).alias("violates_k5"),
            (l < 2).alias("violates_l2"),
        )
    )


@_q(
    "item_item_cosine",
    """
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY l_partkey),
    pair AS (
      SELECT x.l_partkey AS p1, y.l_partkey AS p2, CAST(count(*) AS BIGINT) AS co
      FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY x.l_partkey, y.l_partkey
      HAVING count(*) >= 3)
    SELECT p.p1, p.p2, p.co,
           CAST(p.co AS DOUBLE)
             / (sqrt(CAST(i1.cnt AS DOUBLE)) * sqrt(CAST(i2.cnt AS DOUBLE)))
             AS cosine
    FROM pair p
    JOIN item i1 ON i1.l_partkey = p.p1
    JOIN item i2 ON i2.l_partkey = p.p2
    """,
)
def item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity over co-purchase sets — the implicit-
    feedback recommender's retrieval form: each part is the binary vector
    of orders containing it, so cos(p1, p2) = co / (sqrt(c1)·sqrt(c2))
    with every count exact BIGINT and ONE float expression at the end.
    [[basket_part_lift]] measures association strength (independence-
    normalized); this measures vector similarity (popularity-normalized)
    — recommenders rank by cosine precisely because lift over-rewards
    rare-rare pairs.

    Scale shape: identical to the lift query — basket distinct, canonical
    (p1 < p2) pair aggregate with the support floor applied IN the
    aggregate, item counts broadcast back."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.distinct()
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    x = b.select("l_orderkey", F.col("l_partkey").alias("p1"))
    y = b.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pair = (
        x.join(y, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
        .filter(F.col("co") >= 3)
    )
    i1 = item.select(F.col("l_partkey").alias("p1"), F.col("cnt").alias("c1"))
    i2 = item.select(F.col("l_partkey").alias("p2"), F.col("cnt").alias("c2"))
    cos = F.col("co").cast("double") / (
        F.sqrt(F.col("c1").cast("double")) * F.sqrt(F.col("c2").cast("double"))
    )
    return (
        pair.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .select("p1", "p2", "co", cos.alias("cosine"))
    )


#: Poisson(1) CDF over the 32-bit md5-prefix space: floor(cum_k * 2^32) for
#: k = 0..3 (k >= 4 is the clamped tail).  Integer thresholds make the
#: replicate weights pure integer arithmetic — bit-portable by construction.
_POIS_T = (1580030168, 3160060337, 3950075421, 4213413783)
_BOOT_B = 8


def _boot_sql() -> str:
    cols, arms = [], []
    for b in range(_BOOT_B):
        h = (f"('0x' || substr(md5('boot{b}:' || CAST(event_id AS VARCHAR)), "
             "1, 8))::BIGINT")
        k = (f"CASE WHEN {h} < {_POIS_T[0]} THEN 0 "
             f"WHEN {h} < {_POIS_T[1]} THEN 1 "
             f"WHEN {h} < {_POIS_T[2]} THEN 2 "
             f"WHEN {h} < {_POIS_T[3]} THEN 3 ELSE 4 END")
        cols.append(
            f"CAST(SUM({k}) AS BIGINT) AS n_{b}, "
            f"CASE WHEN SUM({k}) > 0 THEN {_DEC_SUM.format(x=f'value * {k}')} "
            f"/ CAST(SUM({k}) AS DOUBLE) END AS m_{b}"
        )
        arms.append(
            f"SELECT event_type, CAST({b} AS INTEGER) AS replicate, "
            f"n_{b} AS n, m_{b} AS mean_value FROM agg"
        )
    return (
        "WITH agg AS (SELECT event_type, "
        + ",\n      ".join(cols)
        + " FROM events GROUP BY event_type)\n    "
        + "\n    UNION ALL ".join(arms)
    )


@_q("bootstrap_mean_replicates", _boot_sql())
def bootstrap_mean_replicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al.'s one-pass scheme) for the
    uncertainty of per-type mean event value: each of 8 replicates
    weights every row by a DETERMINISTIC Poisson(1) draw (md5-derived
    32-bit uniform against integer CDF thresholds — replayable on any
    engine, stable under repartition), so all replicate means come from
    ONE scan with 8 conditional aggregates.  No resampling fan-out, no
    8x shuffle: the classic bootstrap's per-replicate resample becomes a
    per-row weight column, which is the only form that survives 100 TB.
    Replicate spread = the standard error readout for [[ab_test_welch_z]]
    -style metric reports where the normal approximation is in doubt."""
    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for b in range(_BOOT_B):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"boot{b}:"), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        k = (
            F.when(h < _POIS_T[0], 0)
            .when(h < _POIS_T[1], 1)
            .when(h < _POIS_T[2], 2)
            .when(h < _POIS_T[3], 3)
            .otherwise(4)
        )
        aggs.append(F.sum(k).cast("long").alias(f"n_{b}"))
        # a group whose every row drew weight 0 (37% per replicate for a
        # 1-row group) must yield NULL, not an ANSI divide-by-zero crash
        aggs.append(
            F.when(
                F.sum(k) > 0,
                A.decimal_sum(F.col("value") * k) / F.sum(k).cast("double"),
            ).alias(f"m_{b}")
        )
    agg = ev.groupBy("event_type").agg(*aggs)
    stack_args = ", ".join(
        f"CAST({b} AS INT), n_{b}, m_{b}" for b in range(_BOOT_B)
    )
    return agg.selectExpr(
        "event_type",
        f"stack({_BOOT_B}, {stack_args}) AS (replicate, n, mean_value)",
    )


@_q(
    "graph_triangle_counts",
    """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT x.l_partkey AS a, y.l_partkey AS bb
      FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY x.l_partkey, y.l_partkey
      HAVING count(*) >= 2),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM e UNION ALL SELECT bb AS node FROM e)
      GROUP BY node),
    d AS (
      SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.a < e.bb)
                  THEN e.a ELSE e.bb END AS u,
             CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.a < e.bb)
                  THEN e.bb ELSE e.a END AS v
      FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.bb),
    dv AS (SELECT d.u, d.v, deg.d AS dvg FROM d JOIN deg ON deg.node = d.v),
    tri AS (
      SELECT w1.u AS x, w1.v AS y, w2.v AS z
      FROM dv w1 JOIN dv w2 ON w1.u = w2.u
           AND ((w1.dvg < w2.dvg) OR (w1.dvg = w2.dvg AND w1.v < w2.v))
      JOIN d c ON c.u = w1.v AND c.v = w2.v)
    SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y AS node FROM tri
      UNION ALL SELECT z AS node FROM tri)
    GROUP BY node
    """,
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the co-purchase graph (edges = part
    pairs co-ordered >= 2 times; the floor keeps the graph
    triangle-dense at BOTH oracle scales — a floor of 3 leaves sf0.01
    triangle-free and the gate would verify nothing).  The counting core
    is operators/graph.py:triangle_counts — degree orientation bounds
    the wedge join's fan-out at O(sqrt(m)) per key, so the hub part that
    would explode a naive 2-hop self-join never becomes a join key; see
    the operator docstring for the Chiba-Nishizeki/Suri-Vassilvitskii
    construction.  All keyed joins, all integer arithmetic."""
    from lvm_datapipe_spark.operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bb = li.distinct()
    x = bb.select("l_orderkey", F.col("l_partkey").alias("a"))
    y = bb.select("l_orderkey", F.col("l_partkey").alias("bb"))
    e = (
        x.join(y, "l_orderkey")
        .filter(F.col("a") < F.col("bb"))
        .groupBy("a", "bb")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 2)
        .select("a", "bb")
    )
    return triangle_counts(e, "a", "bb")


@_q(
    "audience_overlap_pairs",
    """
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
          FROM b GROUP BY event_type),
    p AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
                 CAST(count(*) AS BIGINT) AS n_both
          FROM b x JOIN b y ON x.user_id = y.user_id
                AND x.event_type < y.event_type
          GROUP BY x.event_type, y.event_type)
    SELECT p.type_a, p.type_b, na.n_users AS n_a, nb.n_users AS n_b, p.n_both,
           CAST(p.n_both AS DOUBLE)
             / CAST(na.n_users + nb.n_users - p.n_both AS DOUBLE) AS jaccard
    FROM p JOIN n na ON na.event_type = p.type_a
           JOIN n nb ON nb.event_type = p.type_b
    """,
)
def audience_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: |users(A and B)|
    and exact Jaccard for every (type_a < type_b) pair — the audience-
    overlap matrix behind segmentation and cross-sell analyses, and the
    exact twin of a sketched overlap (the HLL partials in
    operators/aggregates.py give the same matrix by inclusion-exclusion
    without the self-join when types number in the thousands).

    Scale shape: the (user, type) base is one distinct aggregate; the
    pair counts come from a user_id-keyed equi-self-join whose per-user
    fan-out is bounded by types-per-user squared (types are a small
    enumerable set, not corpus-sized); per-type totals are broadcast
    back.  Counts stay BIGINT; ONE final float division."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select("user_id", "event_type").distinct()
    n = b.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    x = b.select("user_id", F.col("event_type").alias("type_a"))
    y = b.select("user_id", F.col("event_type").alias("type_b"))
    p = (
        x.join(y, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    na = n.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    nb = n.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    jac = F.col("n_both").cast("double") / (
        (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
    )
    return (
        p.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select("type_a", "type_b", "n_a", "n_b", "n_both", jac.alias("jaccard"))
    )


@_q(
    "text_rank_normalize",
    """
    WITH r AS (
      SELECT doc_id, lang, n_chars,
             CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars) AS BIGINT)
               AS rnk
      FROM documents),
    s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                 CAST(min(n_chars) AS BIGINT) AS mn,
                 CAST(max(n_chars) AS BIGINT) AS mx
          FROM documents GROUP BY lang)
    SELECT r.doc_id, r.lang, CAST(r.n_chars AS BIGINT) AS n_chars,
           CASE WHEN s.n > 1
                THEN CAST(r.rnk - 1 AS DOUBLE) / CAST(s.n - 1 AS DOUBLE)
                ELSE 0.0 END AS pct_rank,
           CASE WHEN s.mx > s.mn
                THEN CAST(r.n_chars - s.mn AS DOUBLE) / CAST(s.mx - s.mn AS DOUBLE)
                ELSE 0.0 END AS minmax
    FROM r JOIN s ON s.lang = r.lang
    """,
)
def text_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank- and min-max feature normalization of a quality proxy per
    language — the scaling step before fusing heterogeneous quality
    signals (a raw char count is incomparable across langs; its in-lang
    percentile is).  Both forms are exact rationals of integers with a
    guard for degenerate one-value groups, so the scores are
    bit-portable (ties share a rank on both engines by definition of
    rank()).

    Scale shape: ONE lang-keyed window for the rank (sort within
    partitions only) and a per-lang stats aggregate broadcast back —
    no global sort, no second shuffle on the fact table."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars")
    r = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.rank().over(w).cast("long").alias("rnk"),
    )
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("n_chars").cast("long").alias("mn"),
        F.max("n_chars").cast("long").alias("mx"),
    )
    pct = F.when(
        F.col("n") > 1,
        (F.col("rnk") - 1).cast("double") / (F.col("n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    mm = F.when(
        F.col("mx") > F.col("mn"),
        (F.col("n_chars") - F.col("mn")).cast("double")
        / (F.col("mx") - F.col("mn")).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        r.join(F.broadcast(s), "lang")
        .select("doc_id", "lang", "n_chars", pct.alias("pct_rank"), mm.alias("minmax"))
    )


@_q(
    "text_readability",
    r"""
    WITH c AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(len(list_filter(list_transform(
                    string_split_regex(text, '[.!?]+'), x -> trim(x)),
                    x -> x <> '')) AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syllables
      FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 AND n_sentences > 0 THEN
             (('206.835'::DOUBLE
               - ('1.015'::DOUBLE
                  * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))))
              - ('84.6'::DOUBLE
                 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))))
           END AS flesch,
           CASE WHEN n_words = 0 OR n_sentences = 0 THEN 'empty'
                WHEN (('206.835'::DOUBLE
                       - ('1.015'::DOUBLE
                          * (CAST(n_words AS DOUBLE)
                             / CAST(n_sentences AS DOUBLE))))
                      - ('84.6'::DOUBLE
                         * (CAST(n_syllables AS DOUBLE)
                            / CAST(n_words AS DOUBLE)))) >= '60.0'::DOUBLE
                  THEN 'easy'
                WHEN (('206.835'::DOUBLE
                       - ('1.015'::DOUBLE
                          * (CAST(n_words AS DOUBLE)
                             / CAST(n_sentences AS DOUBLE))))
                      - ('84.6'::DOUBLE
                         * (CAST(n_syllables AS DOUBLE)
                            / CAST(n_words AS DOUBLE)))) >= '30.0'::DOUBLE
                  THEN 'standard'
                ELSE 'difficult' END AS band
    FROM c
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — a classic curation signal
    (readability gates complement the Gopher battery: a page can pass
    every length rule and still be word-salad).  Syllables use the
    standard vowel-group approximation (runs of [aeiouy] in lowercased
    text), words the whitespace tokenizer, sentences the terminator
    split shared with ``text_sentences``.  All three counts are exact
    integers; the score is ONE fixed-shape float expression evaluated
    identically on both engines (each IEEE op is correctly rounded, so
    an identical association order is bit-portable), and the band
    thresholds compare that same expression.

    Scale shape: pure scan — three regexp counts and arithmetic, no
    shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    ).cast("long")
    n_sents = F.size(
        F.filter(
            F.transform(F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x)),
            lambda x: x != "",
        )
    ).cast("long")
    n_syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
    ).cast("long")
    c = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    )
    flesch = F.lit(206.835) - (
        F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
    ) - (
        F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
    )
    score = F.when((F.col("n_words") > 0) & (F.col("n_sentences") > 0), flesch)
    band = (
        F.when((F.col("n_words") == 0) | (F.col("n_sentences") == 0), F.lit("empty"))
        .when(flesch >= F.lit(60.0), F.lit("easy"))
        .when(flesch >= F.lit(30.0), F.lit("standard"))
        .otherwise(F.lit("difficult"))
    )
    return c.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        score.alias("flesch"),
        band.alias("band"),
    )


@_q(
    "mix_budget_spillover",
    rf"""
    WITH t AS (SELECT doc_id, source,
                      CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
                      md5('mixs' || CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    a AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS avail
          FROM t GROUP BY source),
    p AS (SELECT
            CAST(SUM(CASE WHEN avail <= 1300 THEN 1300 - avail ELSE 0 END)
                 AS BIGINT) AS pool,
            CAST(SUM(CASE WHEN avail > 1300 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_surplus
          FROM a),
    r AS (SELECT x.source, CAST(1 + count(y.source) AS BIGINT) AS rr
          FROM a x LEFT JOIN a y ON y.avail > 1300 AND y.source < x.source
          WHERE x.avail > 1300 GROUP BY x.source),
    bud AS (SELECT a.source,
                   CAST(1300 + CASE WHEN a.avail > 1300 AND p.n_surplus > 0
                        THEN p.pool // p.n_surplus
                             + CASE WHEN r.rr <= p.pool % p.n_surplus
                               THEN 1 ELSE 0 END
                        ELSE 0 END AS BIGINT) AS budget
            FROM a LEFT JOIN r ON r.source = a.source CROSS JOIN p),
    c AS (SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS cum
          FROM t)
    SELECT c.doc_id, c.source, c.n_tokens,
           CAST(c.cum AS BIGINT) AS cum_tokens, b.budget
    FROM c JOIN bud b ON b.source = c.source
    WHERE c.cum <= b.budget
    """,
)
def mix_budget_spillover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mix assembly WITH SPILLOVER: sources too small to
    fill their base budget (1300 tokens here — chosen so the sf0.01
    oracle fixture exercises ALL THREE behaviors: deficit keep-all,
    remainder-bearing spillover, and surplus truncation; the ADVICE r5
    dead-branch lesson) return the unused part to a
    pool, which is redistributed across the surplus sources in equal
    integer shares (remainder to the lexicographically first sources) —
    one deterministic round of the rebalancing real mixture specs need
    when a niche source under-delivers.  [[mix_token_budget]] is the
    no-spillover base form.

    Scale shape: per-source totals are one keyed aggregate; pool and
    surplus-count are a 2-scalar aggregate of the source-sized table;
    the surplus ranking uses the broadcast count-ahead self-join (the
    Neyman pattern — the declared surface bans empty-partition windows);
    the kept prefix is the same ONE source-keyed cumsum window as the
    base form.  Integers end to end."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("mixs"), F.col("doc_id").cast("string")).cast("binary"))
    t = docs.select(
        "doc_id",
        "source",
        X.token_count("text").cast("bigint").alias("n_tokens"),
        h.alias("h"),
    )
    avail = (
        t.groupBy("source").agg(F.sum("n_tokens").cast("long").alias("avail"))
    ).persist()
    pool = avail.agg(
        F.sum(
            F.when(F.col("avail") <= 1300, F.lit(1300) - F.col("avail")).otherwise(0)
        )
        .cast("long")
        .alias("pool"),
        F.sum(F.when(F.col("avail") > 1300, 1).otherwise(0))
        .cast("long")
        .alias("n_surplus"),
    )
    surplus = avail.filter(F.col("avail") > 1300)
    ahead = surplus.select(F.col("source").alias("b_src"))
    ranked = (
        surplus.join(F.broadcast(ahead), F.col("b_src") < F.col("source"), "left")
        .groupBy("source")
        .agg((F.count("b_src") + F.lit(1)).cast("long").alias("rr"))
    )
    bud = (
        avail.join(F.broadcast(ranked), "source", "left")
        .crossJoin(F.broadcast(pool))
        .select(
            "source",
            (
                F.lit(1300)
                + F.when(
                    (F.col("avail") > 1300) & (F.col("n_surplus") > 0),
                    F.expr("pool DIV n_surplus")
                    + F.when(F.col("rr") <= F.col("pool") % F.col("n_surplus"), 1)
                    .otherwise(0),
                ).otherwise(0)
            )
            .cast("long")
            .alias("budget"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        c.join(F.broadcast(bud), "source")
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "source", "n_tokens", "cum_tokens", "budget")
    )


@_q(
    "hard_negative_mining",
    f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
          FROM e WHERE vec_id < 10),
    s AS (SELECT q.query_id, q.qlabel, e.vec_id AS neighbor_id, e.label,
                 {_cos_sql('qv', 'v')} AS cos_sim
          FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    pos AS (SELECT query_id, neighbor_id, cos_sim
            FROM (SELECT query_id, neighbor_id, cos_sim,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rn
                  FROM s WHERE label = qlabel) x WHERE rn = 1),
    neg AS (SELECT query_id, neighbor_id, cos_sim, rnk FROM (
              SELECT s.query_id, s.neighbor_id, s.cos_sim,
                     CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
                          ORDER BY s.cos_sim DESC, s.neighbor_id) AS INTEGER)
                       AS rnk
              FROM s JOIN pos p ON p.query_id = s.query_id
              WHERE s.label <> s.qlabel AND s.cos_sim < p.cos_sim) x
            WHERE rnk <= 3)
    SELECT query_id, neighbor_id, 'positive' AS role,
           CAST(1 AS INTEGER) AS rnk, cos_sim FROM pos
    UNION ALL
    SELECT query_id, neighbor_id, 'semi_hard_negative' AS role, rnk, cos_sim
    FROM neg
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-hard negative mining for contrastive training (the FaceNet
    rule, Schroff et al. 2015): per anchor, the top same-label neighbor
    is the POSITIVE, and the negatives kept are the most-similar
    different-label items that are still STRICTLY LESS similar than that
    positive — negatives harder than the positive are excluded as label
    noise, and (on this near-random fixture) that exclusion branch is
    live for most anchors.  Emits the (anchor, positive, 3 semi-hard
    negatives) block a triplet-loss dataloader consumes.

    Scale shape: the anchor set is bounded and BROADCAST (one corpus
    scan scores all anchors — the ann_cosine_topk plan); both rank
    windows partition by query_id, so their width is the anchor count,
    never the corpus.  The cosine is the proven left-fold form —
    bit-identical across engines — so the cos < pos_cos comparison is
    portable."""
    from lvm_datapipe_spark.operators.similarity import as_double, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", as_double("embedding").alias("v"))
    q = F.broadcast(
        e.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("v").alias("qv"),
        )
    )
    s = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    pos = (
        s.filter(F.col("label") == F.col("qlabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "neighbor_id", "cos_sim")
    )
    pcos = F.broadcast(
        pos.select("query_id", F.col("cos_sim").alias("pos_cos"))
    )
    neg = (
        s.join(pcos, "query_id")
        .filter((F.col("label") != F.col("qlabel")) & (F.col("cos_sim") < F.col("pos_cos")))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "rnk", "cos_sim")
    )
    return pos.select(
        "query_id",
        "neighbor_id",
        F.lit("positive").alias("role"),
        F.lit(1).cast("int").alias("rnk"),
        "cos_sim",
    ).unionByName(
        neg.select(
            "query_id",
            "neighbor_id",
            F.lit("semi_hard_negative").alias("role"),
            "rnk",
            "cos_sim",
        )
    )


def _top4_mean_sql(rank_col: str) -> str:
    """Fixed-association mean of the top-4 cos values: conditional-MAX
    pivot + explicit left-assoc sum chain (the bm25 pattern) — aggregate
    order can't change bits."""
    c = [f"max(CASE WHEN {rank_col} = {r} THEN cos_sim END)" for r in (1, 2, 3, 4)]
    return f"((({c[0]} + {c[1]}) + {c[2]}) + {c[3]}) / ('4.0'::DOUBLE)"


@_q(
    "bitext_margin_pairs",
    f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv
          FROM e WHERE vec_id < 30 AND label % 2 = 0),
    t AS (SELECT vec_id AS neighbor_id, v AS tv FROM e WHERE label % 2 = 1),
    s AS (SELECT query_id, neighbor_id, {_cos_sql('qv', 'tv')} AS cos_sim
          FROM t CROSS JOIN q),
    fr AS (SELECT query_id, neighbor_id, cos_sim,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id) AS rq,
                  ROW_NUMBER() OVER (PARTITION BY neighbor_id
                       ORDER BY cos_sim DESC, query_id) AS rt
           FROM s),
    fx AS (SELECT query_id, {_top4_mean_sql('rq')} AS kx
           FROM fr GROUP BY query_id),
    fy AS (SELECT neighbor_id, {_top4_mean_sql('rt')} AS ky
           FROM fr GROUP BY neighbor_id),
    m AS (SELECT f.query_id, f.neighbor_id, f.cos_sim,
                 f.cos_sim / ((x.kx + y.ky) / ('2.0'::DOUBLE)) AS margin
          FROM fr f JOIN fx x ON x.query_id = f.query_id
                    JOIN fy y ON y.neighbor_id = f.neighbor_id)
    SELECT query_id, neighbor_id AS match_id, cos_sim, margin FROM (
      SELECT m.*, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY margin DESC, neighbor_id) AS rb
      FROM m) z
    WHERE rb = 1 AND margin > ('1.35'::DOUBLE)
    """,
)
def bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext candidate mining (Artetxe & Schwenk 2019,
    arXiv:1811.01136 — the CCMatrix/LASER parallel-corpus recipe): an
    anchor matches the target whose cosine is large RELATIVE to both
    sides' top-k neighborhoods — margin = cos / ((mean top-4 of x +
    mean top-4 of y) / 2) — which suppresses hub vectors that are close
    to everything.  Label parity stands in for the two languages on the
    synthetic fixture; the margin pick genuinely diverges from the raw
    cosine pick for 6 of the 16 anchors, and the 1.35 acceptance
    threshold keeps both verdict branches live.

    Scale shape: the anchor set is bounded and broadcast, so the score
    matrix is one corpus scan; both top-4 neighborhood means come from
    THAT one matrix via rank windows (per-anchor and per-target — the
    per-target partition is corpus-keyed but only anchor-count wide)
    and fixed-association pivot sums; the final pick is a per-anchor
    rank.  At production bitext scale the scored matrix comes from the
    IVF/LSH candidate stage instead of the dense scan — same margin
    algebra downstream."""
    from lvm_datapipe_spark.operators.similarity import as_double, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", as_double("embedding").alias("v"))
    q = F.broadcast(
        e.filter((F.col("vec_id") < 30) & (F.col("label") % 2 == 0)).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    t = e.filter(F.col("label") % 2 == 1).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("tv")
    )
    s = t.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("tv")).alias("cos_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    wt = Window.partitionBy("neighbor_id").orderBy(F.desc("cos_sim"), F.asc("query_id"))
    fr = s.withColumn("rq", F.row_number().over(wq)).withColumn(
        "rt", F.row_number().over(wt)
    )

    def top4_mean(rank_col: str):
        c = [
            F.max(F.when(F.col(rank_col) == r, F.col("cos_sim")))
            for r in (1, 2, 3, 4)
        ]
        return (((c[0] + c[1]) + c[2]) + c[3]) / F.lit(4.0)

    fx = fr.groupBy("query_id").agg(top4_mean("rq").alias("kx"))
    fy = fr.groupBy("neighbor_id").agg(top4_mean("rt").alias("ky"))
    m = (
        fr.join(F.broadcast(fx), "query_id")
        .join(fy, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            (
                F.col("cos_sim") / ((F.col("kx") + F.col("ky")) / F.lit(2.0))
            ).alias("margin"),
        )
    )
    wb = Window.partitionBy("query_id").orderBy(F.desc("margin"), F.asc("neighbor_id"))
    return (
        m.withColumn("rb", F.row_number().over(wb))
        .filter((F.col("rb") == 1) & (F.col("margin") > F.lit(1.35)))
        .select(
            "query_id",
            F.col("neighbor_id").alias("match_id"),
            "cos_sim",
            "margin",
        )
    )


@_q(
    "shard_manifest",
    rf"""
    WITH t AS (SELECT doc_id,
                      CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
                      md5('shard' || CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    s AS (SELECT doc_id, n_tokens, h,
                 CAST(('0x' || substr(h, 1, 8))::BIGINT % 8 AS BIGINT)
                   AS shard_id
          FROM t)
    SELECT doc_id, shard_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY h, doc_id)
                AS BIGINT) AS pos,
           n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY shard_id ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens AS BIGINT) AS token_offset
    FROM s
    """,
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-export SHARD MANIFEST: a deterministic global
    shuffle (md5 of doc id — stable under repartition, rerun, and
    incremental arrival), hash assignment into 8 shards, and within
    each shard the document's position and exact token offset — the
    (shard, pos, offset) triple a dataloader needs for random access
    and resumable iteration.  The WebDataset sink consumes exactly this
    ordering; [[mix_token_budget]] decides WHAT ships, this decides
    WHERE it lands.

    Scale shape: hashing is scan-shaped; position and offset are ONE
    shard-keyed window (8 balanced partitions by construction — md5 is
    uniform); no global sort anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    from lvm_datapipe_spark.operators import text as X

    h = F.md5(F.concat(F.lit("shard"), F.col("doc_id").cast("string")).cast("binary"))
    t = docs.select(
        "doc_id",
        X.token_count("text").cast("bigint").alias("n_tokens"),
        h.alias("h"),
    )
    shard = (
        F.conv(F.substring("h", 1, 8), 16, 10).cast("long") % 8
    ).cast("long")
    s = t.withColumn("shard_id", shard)
    wp = Window.partitionBy("shard_id").orderBy("h", "doc_id")
    wc = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return s.select(
        "doc_id",
        "shard_id",
        F.row_number().over(wp).cast("long").alias("pos"),
        "n_tokens",
        (F.sum("n_tokens").over(wc) - F.col("n_tokens"))
        .cast("long")
        .alias("token_offset"),
    )


@_q(
    "theil_sen_slope_by_user",
    """
    WITH e AS (
      SELECT user_id, value,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS i
      FROM events),
    p AS (SELECT a.user_id,
                 (b.value - a.value) / CAST(b.i - a.i AS DOUBLE) AS slope,
                 a.i AS i, b.i AS j
          FROM e a JOIN e b ON a.user_id = b.user_id AND a.i < b.i),
    r AS (SELECT user_id, slope,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY slope, i, j) AS BIGINT) AS rk,
                 CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS np
          FROM p)
    SELECT user_id, np AS n_pairs, slope AS sen_slope
    FROM r WHERE rk = (np + 1) // 2
    """,
)
def theil_sen_slope_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per user: the MEDIAN of all pairwise
    slopes of value over event order — the estimator that shrugs off
    the outliers that wreck [[events_trend_slope]]'s least squares
    (breakdown point 29%).  The median is the DISCRETE lower median
    (rank (n+1) DIV 2 by (slope, pair) order — element selection, not
    interpolation: interpolating quantiles differ per-ULP across
    engines on double inputs, measured in the ccnet tertile work).

    Scale shape: the pair build is a user_id-keyed equi-self-join whose
    fan-out is bounded by per-user event count squared (bounded per
    entity, never corpus-quadratic — the Theil-Sen cost model); the
    rank/median windows share the same user_id partitioning.  Each
    slope is ONE IEEE division of bit-identical inputs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id", "value", F.row_number().over(w).cast("long").alias("i")
    )
    a = e.select("user_id", F.col("value").alias("va"), F.col("i").alias("i"))
    b = e.select("user_id", F.col("value").alias("vb"), F.col("i").alias("j"))
    p = (
        a.join(b, "user_id")
        .filter(F.col("i") < F.col("j"))
        .select(
            "user_id",
            ((F.col("vb") - F.col("va")) / (F.col("j") - F.col("i")).cast("double"))
            .alias("slope"),
            "i",
            "j",
        )
    )
    wr = Window.partitionBy("user_id").orderBy("slope", "i", "j")
    wn = Window.partitionBy("user_id")
    r = p.select(
        "user_id",
        "slope",
        F.row_number().over(wr).cast("long").alias("rk"),
        F.count(F.lit(1)).over(wn).cast("long").alias("np"),
    )
    return r.filter(F.col("rk") == F.expr("(np + 1) DIV 2")).select(
        "user_id", F.col("np").alias("n_pairs"), F.col("slope").alias("sen_slope")
    )


def _icl_chain_sql(n_cells: int = 16, seed: int = 42, dim: int = _EMB_DIM) -> str:
    """DuckDB replay of the ICL greedy chain: cell assignment with the
    shared quantizer literals (string-cast to DOUBLE — the DECIMAL-lexing
    pitfall documented in _semdedup_sql), within-cell pair cosines over the
    shared unit vectors, then the traversal itself as a RECURSIVE CTE whose
    step picks the best unvisited neighbor with a QUALIFY rank — the same
    (cos DESC, id ASC) decision the Spark UDF's left-fold scan makes, over
    bit-identical doubles."""
    from lvm_datapipe_spark.operators.similarity import ivf_fixed_centroids

    cents = ivf_fixed_centroids(n_cells, dim, seed)

    def cos_lit(v: str, c) -> str:
        dot_vc = " + ".join(
            f"{v}[{i + 1}]*('{float(c[i])!r}'::DOUBLE)" for i in range(dim)
        )
        dot_cc = sum(float(x) * float(x) for x in c)
        return f"(({dot_vc}) / (sqrt({_dot_sql(v, v)}) * sqrt('{dot_cc!r}'::DOUBLE)))"

    sims = "[" + ", ".join(cos_lit("v", c) for c in cents) + "]"
    return f"""
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                     FROM embeddings WHERE embedding IS NOT NULL),
    c0 AS (SELECT vec_id, v, {sims} AS sims,
                  sqrt({_dot_sql('v', 'v')}) AS nrm FROM e),
    a AS (SELECT vec_id,
                 CAST(list_indexof(sims, list_max(sims)) - 1 AS INTEGER) AS cell,
                 list_transform(v, x -> x / nrm) AS vn
          FROM c0),
    p AS (SELECT x.cell, x.vec_id AS id_a, b.vec_id AS id_b,
                 {_dot_sql('x.vn', 'b.vn')} AS c
          FROM a x JOIN a b ON x.cell = b.cell AND x.vec_id <> b.vec_id),
    starts AS (SELECT cell, min(vec_id) AS vec_id FROM a GROUP BY cell),
    chain AS (
      SELECT s.cell, s.vec_id, CAST(1 AS BIGINT) AS pos, [s.vec_id] AS visited
      FROM starts s
      UNION ALL
      SELECT c.cell, p.id_b, c.pos + 1, list_append(c.visited, p.id_b)
      FROM chain c JOIN p ON p.cell = c.cell AND p.id_a = c.vec_id
           AND NOT list_contains(c.visited, p.id_b)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY c.cell
                                 ORDER BY p.c DESC, p.id_b) = 1
    )
    SELECT vec_id, cell, pos FROM chain
    """


@_q("icl_similarity_chain", _icl_chain_sql())
def icl_similarity_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-Context Pretraining ordering (Shi et al. 2023,
    arXiv:2310.10638) over the embeddings table: related documents are
    placed adjacently in the training stream by walking each quantizer
    cell as a greedy nearest-neighbor path — see
    operators/similarity.py:icl_chain_order for the algorithm, cost
    model, and the left-fold determinism contract that lets a recursive
    DuckDB CTE replay the traversal decision-for-decision."""
    from lvm_datapipe_spark.operators.similarity import icl_chain_order

    emb = load_table(spark, sf_dir, "embeddings")
    return icl_chain_order(emb)


@_q(
    "preference_pairs_dpo",
    f"""
    WITH s AS (SELECT o.o_custkey AS custkey, l.l_partkey AS partkey,
                      {_DEC_SUM.format(x='l.l_extendedprice * (1 - l.l_discount)')}
                        AS spend
               FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
               GROUP BY o.o_custkey, l.l_partkey),
    r AS (SELECT custkey, partkey, spend,
                 ROW_NUMBER() OVER (PARTITION BY custkey
                      ORDER BY spend DESC, partkey) AS rt,
                 ROW_NUMBER() OVER (PARTITION BY custkey
                      ORDER BY spend ASC, partkey DESC) AS rb,
                 count(*) OVER (PARTITION BY custkey) AS np
          FROM s)
    SELECT c.custkey, CAST(c.np AS BIGINT) AS n_parts,
           c.partkey AS chosen_part, j.partkey AS rejected_part,
           c.spend AS chosen_spend, j.spend AS rejected_spend
    FROM r c JOIN r j ON j.custkey = c.custkey AND j.rb = 1
    WHERE c.rt = 1 AND c.np >= 2
    """,
)
def preference_pairs_dpo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair assembly for DPO/RLHF-style training: per context
    (customer), the CHOSEN response is the max-preference item (top part
    by exact spend) and the REJECTED one the min-preference item — the
    max-margin pairing that makes the preference signal least ambiguous.
    The opposite tiebreaks (min partkey for chosen, max for rejected)
    guarantee chosen != rejected whenever the context has >= 2 items,
    even under total ties.

    Scale shape: spend is one (custkey, partkey)-keyed decimal
    aggregate; both rank windows and the pair join share the custkey
    partitioning — one shuffle family end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            A.decimal_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("spend")
        )
    )
    wt = Window.partitionBy("custkey").orderBy(F.desc("spend"), F.asc("partkey"))
    wb = Window.partitionBy("custkey").orderBy(F.asc("spend"), F.desc("partkey"))
    wn = Window.partitionBy("custkey")
    r = s.select(
        "custkey",
        "partkey",
        "spend",
        F.row_number().over(wt).alias("rt"),
        F.row_number().over(wb).alias("rb"),
        F.count(F.lit(1)).over(wn).alias("np"),
    )
    c = r.filter((F.col("rt") == 1) & (F.col("np") >= 2)).select(
        "custkey",
        F.col("np").cast("long").alias("n_parts"),
        F.col("partkey").alias("chosen_part"),
        F.col("spend").alias("chosen_spend"),
    )
    j = r.filter(F.col("rb") == 1).select(
        "custkey",
        F.col("partkey").alias("rejected_part"),
        F.col("spend").alias("rejected_spend"),
    )
    return c.join(j, "custkey").select(
        "custkey",
        "n_parts",
        "chosen_part",
        "rejected_part",
        "chosen_spend",
        "rejected_spend",
    )


@_q(
    "attribution_time_decay",
    """
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts,
                      CAST(floor(epoch(ts)) AS BIGINT) AS pts
               FROM events WHERE event_type = 'purchase'),
    t AS (SELECT event_id AS touch_id, user_id, event_type AS touch_type,
                 ts AS t_ts, CAST(floor(epoch(ts)) AS BIGINT) AS tts
          FROM events WHERE event_type <> 'purchase'),
    j AS (SELECT p.purchase_id, t.touch_id, t.touch_type,
                 CAST(LEAST((p.pts - t.tts) // 3600, 20) AS BIGINT)
                   AS decay_hours
          FROM p JOIN t ON t.user_id = p.user_id
                AND t.t_ts < p.p_ts AND p.pts - t.tts <= 86400),
    w AS (SELECT purchase_id, touch_id, touch_type, decay_hours,
                 ('1.0'::DOUBLE) / CAST(1 << decay_hours AS DOUBLE) AS wt
          FROM j)
    SELECT purchase_id, touch_id, touch_type, decay_hours,
           wt / (SUM(wt) OVER (PARTITION BY purchase_id)) AS credit
    FROM w
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: every touch in the 24 h before
    a purchase earns credit halving per hour of age — weight 2^-h with
    h capped at 20.  The cap is load-bearing for exactness: each weight
    is then a DYADIC rational >= 2^-20 and per-purchase totals stay
    below 2^9, so the whole weight sum spans < 53 mantissa bits and
    plain SUM is EXACT and order-free (no decimal detour, no libm
    pow — the weight is built by integer shift).  [[attribution_linear_exact]]
    is the equal-credit sibling.

    Scale shape: one user-keyed join bounded by per-user event density
    x the 24 h horizon, then ONE purchase-keyed window for
    normalization.  Credit is a single IEEE division of exact doubles."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.unix_timestamp("ts").alias("pts"),
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("t_ts"),
        F.unix_timestamp("ts").alias("tts"),
    )
    j = (
        p.join(t, "user_id")
        .filter(
            (F.col("t_ts") < F.col("p_ts"))
            & ((F.col("pts") - F.col("tts")) <= 86400)
        )
        .select(
            "purchase_id",
            "touch_id",
            "touch_type",
            F.least(F.expr("(pts - tts) DIV 3600"), F.lit(20))
            .cast("long")
            .alias("decay_hours"),
        )
    )
    w = j.withColumn(
        "wt",
        F.expr("CAST(1.0 AS DOUBLE) / CAST(shiftleft(1, CAST(decay_hours AS INT)) AS DOUBLE)"),
    )
    wp = Window.partitionBy("purchase_id")
    return w.select(
        "purchase_id",
        "touch_id",
        "touch_type",
        "decay_hours",
        (F.col("wt") / F.sum("wt").over(wp)).alias("credit"),
    )


@_q(
    "bootstrap_ci_mean",
    f"""
    WITH reps AS ({_boot_sql()}),
    v AS (SELECT event_type, replicate, mean_value FROM reps
          WHERE mean_value IS NOT NULL),
    r AS (SELECT event_type, replicate, mean_value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                      ORDER BY mean_value, replicate) AS rk,
                 count(*) OVER (PARTITION BY event_type) AS nr
          FROM v),
    env AS (SELECT event_type, CAST(max(nr) AS BIGINT) AS n_reps,
                   min(mean_value) AS ci_lo, max(mean_value) AS ci_hi
            FROM r GROUP BY event_type),
    med AS (SELECT event_type, mean_value AS ci_med FROM r
            WHERE rk = (nr + 1) // 2),
    pt AS (SELECT event_type,
                  {_DEC_SUM.format(x='value')} / CAST(count(*) AS DOUBLE)
                    AS point_mean
           FROM events GROUP BY event_type)
    SELECT pt.event_type, pt.point_mean, e.n_reps, e.ci_lo, m.ci_med, e.ci_hi
    FROM pt JOIN env e ON e.event_type = pt.event_type
            JOIN med m ON m.event_type = pt.event_type
    """,
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The uncertainty READOUT over [[bootstrap_mean_replicates]]: per
    event type, the point estimate (exact decimal mean) with the
    replicate envelope (min/max of the 8 Poisson-bootstrap replicate
    means — the crude percentile-method bounds 8 replicates support)
    and the discrete lower-median replicate.  Min/max/element-selection
    only — no float aggregation over the replicate means, so every
    output bit is inherited from the already-portable replicate query.

    Scale shape: the replicate table is (types x 8) rows; everything
    downstream of the one-scan bootstrap aggregate is sketch-sized."""
    reps = QUERIES["bootstrap_mean_replicates"](spark, sf_dir)
    v = reps.filter(F.col("mean_value").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("mean_value", "replicate")
    wn = Window.partitionBy("event_type")
    r = v.select(
        "event_type",
        "mean_value",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("nr"),
    )
    env = r.groupBy("event_type").agg(
        F.max("nr").cast("long").alias("n_reps"),
        F.min("mean_value").alias("ci_lo"),
        F.max("mean_value").alias("ci_hi"),
    )
    med = r.filter(F.col("rk") == F.expr("(nr + 1) DIV 2")).select(
        "event_type", F.col("mean_value").alias("ci_med")
    )
    ev = load_table(spark, sf_dir, "events")
    pt = ev.groupBy("event_type").agg(
        (A.decimal_sum("value") / F.count(F.lit(1)).cast("double")).alias(
            "point_mean"
        )
    )
    return (
        pt.join(F.broadcast(env), "event_type")
        .join(F.broadcast(med), "event_type")
        .select("event_type", "point_mean", "n_reps", "ci_lo", "ci_med", "ci_hi")
    )


@_q(
    "survival_risk_table",
    """
    WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    pu AS (SELECT e.user_id, min(e.ts) AS p_ts
           FROM events e JOIN v ON v.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
           GROUP BY e.user_id),
    mx AS (SELECT max(ts) AS m_ts FROM events),
    d AS (SELECT v.user_id,
                 CAST(CASE WHEN pu.p_ts IS NOT NULL
                      THEN (CAST(floor(epoch(pu.p_ts)) AS BIGINT)
                            - CAST(floor(epoch(v.v_ts)) AS BIGINT)) // 86400
                      ELSE (CAST(floor(epoch(mx.m_ts)) AS BIGINT)
                            - CAST(floor(epoch(v.v_ts)) AS BIGINT)) // 86400
                      END AS BIGINT) AS dur_days,
                 (pu.p_ts IS NOT NULL) AS observed
          FROM v LEFT JOIN pu ON pu.user_id = v.user_id CROSS JOIN mx),
    pd AS (SELECT dur_days,
                  CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_events,
                  CAST(SUM(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
                    AS n_censored,
                  CAST(count(*) AS BIGINT) AS n_total
           FROM d GROUP BY dur_days),
    risk AS (SELECT x.dur_days, CAST(SUM(y.n_total) AS BIGINT) AS n_at_risk
             FROM pd x JOIN pd y ON y.dur_days >= x.dur_days
             GROUP BY x.dur_days)
    SELECT p.dur_days AS day, r.n_at_risk, p.n_events, p.n_censored
    FROM pd p JOIN risk r ON r.dur_days = p.dur_days
    """,
)
def survival_risk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier RISK TABLE for time-to-conversion: per day since a
    user's first view, the number still at risk, the conversions
    (first purchase at that lag), and the right-censored exits (users
    never converting, censored at the corpus horizon).  This integer
    triple IS the product-limit estimator's input — S(t) follows by
    multiplying (1 - d/n) down the rows, kept OUT of the query because
    a float cumulative product is order-sensitive across engines; the
    risk table itself is exact.

    Scale shape: first-view/first-purchase are user-keyed min
    aggregates; the horizon is a broadcast scalar; per-day counts are
    one keyed aggregate of a users-sized table; the at-risk cumulative
    uses a non-equi self-join of the DAY table (bounded by the horizon
    in days — the Neyman count-ahead pattern, no global window)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    mx = ev.agg(F.max("ts").alias("m_ts"))
    end = F.when(
        F.col("p_ts").isNotNull(), F.unix_timestamp("p_ts")
    ).otherwise(F.unix_timestamp("m_ts"))
    d = (
        v.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            (end - F.unix_timestamp("v_ts")).alias("gap_s"),
            F.col("p_ts").isNotNull().alias("observed"),
        )
        .select(
            "user_id",
            F.expr("gap_s DIV 86400").cast("long").alias("dur_days"),
            "observed",
        )
    )
    pd_ = d.groupBy("dur_days").agg(
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("observed"), 0).otherwise(1))
        .cast("long")
        .alias("n_censored"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    y = pd_.select(F.col("dur_days").alias("y_day"), F.col("n_total").alias("y_n"))
    risk = (
        pd_.join(F.broadcast(y), F.col("y_day") >= F.col("dur_days"))
        .groupBy("dur_days")
        .agg(F.sum("y_n").cast("long").alias("n_at_risk"))
    )
    return (
        pd_.join(F.broadcast(risk), "dur_days")
        .select(
            F.col("dur_days").alias("day"), "n_at_risk", "n_events", "n_censored"
        )
    )


@_q(
    "length_bucket_batches",
    rf"""
    WITH t AS (SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
                      md5('lenb' || CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    b AS (SELECT doc_id, n_tokens, h,
                 CAST(LEAST(n_tokens // 32, 15) AS BIGINT) AS bucket FROM t),
    r AS (SELECT doc_id, n_tokens, bucket,
                 CAST(ROW_NUMBER() OVER (PARTITION BY bucket
                      ORDER BY h, doc_id) AS BIGINT) AS rn
          FROM b)
    SELECT bucket, CAST((rn - 1) // 8 AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tokens) AS BIGINT) AS max_len,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(count(*) * max(n_tokens) - SUM(n_tokens) AS BIGINT)
             AS padded_tokens,
           CASE WHEN count(*) * max(n_tokens) > 0 THEN
             CAST(count(*) * max(n_tokens) - SUM(n_tokens) AS DOUBLE)
               / CAST(count(*) * max(n_tokens) AS DOUBLE) END AS waste_frac
    FROM r GROUP BY bucket, (rn - 1) // 8
    """,
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed BATCH ASSEMBLY — the padding-minimizing batching
    every seq2seq/packed-training dataloader performs: documents are
    binned by token count (32-token-wide buckets, capped), shuffled
    deterministically inside each bucket (md5 order), cut into
    batches of 8, and each batch reports its exact padding waste
    (n x max_len - sum_len).  The per-batch waste_frac is the metric
    you tune bucket width against; [[pack_sequences_by_lang]] is the
    concatenative alternative for decoder-only training.

    Scale shape: bucketing is scan-shaped; position assignment is ONE
    bucket-keyed window; the batch aggregate reuses the same
    (bucket, batch) keying.  Integers throughout; the division is
    guarded for the all-empty-docs batch."""
    docs = load_table(spark, sf_dir, "documents")
    from lvm_datapipe_spark.operators import text as X

    h = F.md5(F.concat(F.lit("lenb"), F.col("doc_id").cast("string")).cast("binary"))
    t = docs.select(
        "doc_id",
        X.token_count("text").cast("bigint").alias("n_tokens"),
        h.alias("h"),
    )
    b = t.withColumn(
        "bucket", F.least(F.expr("n_tokens DIV 32"), F.lit(15)).cast("long")
    )
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    r = b.withColumn("rn", F.row_number().over(w).cast("long"))
    g = r.withColumn("batch_id", F.expr("(rn - 1) DIV 8").cast("long"))
    agg = g.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("n_tokens").cast("long").alias("max_len"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )
    padded = F.col("n_docs") * F.col("max_len") - F.col("sum_tokens")
    denom = F.col("n_docs") * F.col("max_len")
    return agg.select(
        "bucket",
        "batch_id",
        "n_docs",
        "max_len",
        "sum_tokens",
        padded.cast("long").alias("padded_tokens"),
        F.when(denom > 0, padded.cast("double") / denom.cast("double")).alias(
            "waste_frac"
        ),
    )


@_q(
    "calibration_table",
    r"""
    WITH f AS (
      SELECT doc_id, length(text) AS n_chars,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents),
    s AS (SELECT doc_id, n_tokens,
                 (-2.0 + 0.004 * CAST(n_tokens AS DOUBLE))
                   + 0.35 * (CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                   AS logit,
                 (n_tokens BETWEEN 50 AND 100000) AS label
          FROM f WHERE n_tokens > 0)
    SELECT CAST(floor(logit / ('0.125'::DOUBLE)) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS pos_rate
    FROM s GROUP BY bin
    """,
)
def calibration_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier CALIBRATION table (reliability-curve input): the
    [[quality_logit]] score binned into fixed 0.125-wide cells against
    the Gopher word-count rule as the reference label (the full Gopher
    conjunction is wholesale-false on this fixture — the scorecard's
    documented dead-branch rationale — while the word-count rule splits
    277/500), yielding per-bin observed positive rates.  A well-
    calibrated gate shows monotone rates; the table is what you
    threshold against when the gate's operating point moves.

    Scale shape: pure scan + one bin-keyed aggregate; bin edges from
    floor-division of the same double both engines computed
    bit-identically."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    ).cast("long")
    f = docs.select(
        "doc_id", F.length("text").alias("n_chars"), n_tokens.alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    logit = (
        F.lit(-2.0) + F.lit(0.004) * F.col("n_tokens").cast("double")
    ) + F.lit(0.35) * (
        F.col("n_chars").cast("double") / F.col("n_tokens").cast("double")
    )
    s = f.select(
        F.floor(logit / F.lit(0.125)).cast("long").alias("bin"),
        F.col("n_tokens").between(50, 100000).alias("label"),
    )
    return s.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long").alias("n_pos"),
        (
            F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("pos_rate"),
    )


@_q(
    "events_burst_detection",
    f"""
    WITH {_DENSE_HOURLY_SQL},
    w AS (SELECT event_type, hr, n,
                 lag(n, 1) OVER (PARTITION BY event_type ORDER BY hr) AS l1,
                 lag(n, 2) OVER (PARTITION BY event_type ORDER BY hr) AS l2,
                 lag(n, 3) OVER (PARTITION BY event_type ORDER BY hr) AS l3,
                 lag(n, 4) OVER (PARTITION BY event_type ORDER BY hr) AS l4,
                 lag(n, 5) OVER (PARTITION BY event_type ORDER BY hr) AS l5,
                 lag(n, 6) OVER (PARTITION BY event_type ORDER BY hr) AS l6,
                 lag(n, 7) OVER (PARTITION BY event_type ORDER BY hr) AS l7
          FROM dense)
    SELECT event_type, strftime(hr, '%Y-%m-%d %H') AS hour, n AS n_events,
           CAST(list_sort([l1, l2, l3, l4, l5, l6, l7])[4] AS BIGINT)
             AS med7,
           (n > 3 * (list_sort([l1, l2, l3, l4, l5, l6, l7])[4])
            AND n >= 3) AS burst
    FROM w WHERE l7 IS NOT NULL
    """,
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection over the dense hourly grid: an hour is a BURST
    when its count exceeds 3x the DISCRETE median of the trailing 7
    hours (4th of the sorted lags — element selection, no
    interpolation) with a minimum support of 3 events.  The rolling
    median baseline is what separates a burst from a busy-but-normal
    stretch — the global baselines of [[events_zscore_outliers]] /
    [[events_mad_outliers]] can't see a local 10x spike inside a
    quiet week.  Thresholds chosen so BOTH verdict branches are live at
    BOTH oracle scales (sf0.001: 11 bursts, sf0.01: 95).

    Scale shape: the grid core is shared with [[events_gapfill_hourly]];
    the 7 lags and the flag are ONE type-keyed window over the
    grid-sized (not event-sized) table, all integer arithmetic."""
    dense = _dense_hourly_counts(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("hr")
    lags = [F.lag("n", i).over(w).alias(f"l{i}") for i in range(1, 8)]
    d = dense.select("event_type", "hr", "n", *lags)
    med = F.array_sort(F.array(*[F.col(f"l{i}") for i in range(1, 8)]))[3]
    return d.filter(F.col("l7").isNotNull()).select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH").alias("hour"),
        F.col("n").alias("n_events"),
        med.cast("long").alias("med7"),
        ((F.col("n") > 3 * med) & (F.col("n") >= 3)).alias("burst"),
    )


def _cm_side_sql(table: str, key: str, depth: int, width: int, salt: str) -> str:
    arms = []
    for d in range(depth):
        h = (f"('0x' || substr(md5('{salt}{d}:' || CAST({key} AS VARCHAR)), "
             f"1, 8))::BIGINT % {width}")
        arms.append(
            f"SELECT {d} AS d, {h} AS bucket FROM {table}"
        )
    return (
        "SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt FROM ("
        + " UNION ALL ".join(arms)
        + ") GROUP BY d, bucket"
    )


@_q(
    "join_size_estimate_cm",
    f"""
    WITH sa AS ({_cm_side_sql('events', 'user_id', 4, 1024, 'cmj')}),
    sb AS ({_cm_side_sql('orders', 'o_custkey', 4, 1024, 'cmj')}),
    ip AS (SELECT sa.d, CAST(SUM(sa.cnt * sb.cnt) AS BIGINT) AS est
           FROM sa JOIN sb ON sa.d = sb.d AND sa.bucket = sb.bucket
           GROUP BY sa.d),
    est AS (SELECT CAST(min(est) AS BIGINT) AS est_join_size FROM ip),
    ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_join_size
           FROM events e JOIN orders o ON o.o_custkey = e.user_id)
    SELECT est.est_join_size, ex.exact_join_size,
           CAST(est.est_join_size AS DOUBLE)
             / CAST(ex.exact_join_size AS DOUBLE) AS overcount_ratio
    FROM est CROSS JOIN ex
    """,
)
def join_size_estimate_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-CARDINALITY estimation from count-min sketches (Cormode &
    Muthukrishnan's inner-product estimator): |A join B on k| is
    estimated as min over rows d of sum_b cntA[d][b]*cntB[d][b] — the
    what-if readout an optimizer or pipeline planner consults BEFORE
    running an expensive join, computable from per-partition sketches
    ([[aggregates.cm_merge]]) without touching either fact table again.
    The estimate never undercounts; the query reports it against the
    exact join size (computed here only to ground the oracle) as an
    overcount ratio.

    Scale shape: each sketch is one scan + a (d, bucket)-keyed count
    bounded by depth x width cells; the inner product joins two
    4x1024-cell tables.  The exact side is a keyed equi-join used as
    the verification baseline, not part of the production read path."""
    from lvm_datapipe_spark.operators.aggregates import cm_sketch

    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    sa = cm_sketch(ev.select(F.col("user_id")), "user_id", 4, 1024, "cmj")
    sb = cm_sketch(o.select(F.col("o_custkey")), "o_custkey", 4, 1024, "cmj")
    ip = (
        sa.alias("sa")
        .join(sb.alias("sb"), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("sa.cnt") * F.col("sb.cnt")).cast("long").alias("est"))
    )
    est = ip.agg(F.min("est").cast("long").alias("est_join_size"))
    ex = (
        ev.join(o, ev.user_id == o.o_custkey)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_join_size"))
    )
    return est.crossJoin(F.broadcast(ex)).select(
        "est_join_size",
        "exact_join_size",
        (
            F.col("est_join_size").cast("double")
            / F.col("exact_join_size").cast("double")
        ).alias("overcount_ratio"),
    )


def _kcenter_sql(k: int = 8, n_cells: int = 16, seed: int = 42, dim: int = _EMB_DIM) -> str:
    """DuckDB replay of greedy k-center: shared quantizer-literal cell
    assignment, symmetric within-cell cosine DISTANCES, then the selection
    loop as a recursive CTE whose step AGGREGATES min-distance-to-selected
    per candidate (GROUP BY over the state row) and picks the farthest via
    QUALIFY — the same (max min-dist, lower id) rule the Spark UDF's
    incremental update makes over bit-identical doubles."""
    from lvm_datapipe_spark.operators.similarity import ivf_fixed_centroids

    cents = ivf_fixed_centroids(n_cells, dim, seed)

    def cos_lit(v: str, c) -> str:
        dot_vc = " + ".join(
            f"{v}[{i + 1}]*('{float(c[i])!r}'::DOUBLE)" for i in range(dim)
        )
        dot_cc = sum(float(x) * float(x) for x in c)
        return f"(({dot_vc}) / (sqrt({_dot_sql(v, v)}) * sqrt('{dot_cc!r}'::DOUBLE)))"

    sims = "[" + ", ".join(cos_lit("v", c) for c in cents) + "]"
    return f"""
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                         FROM embeddings WHERE embedding IS NOT NULL),
    c0 AS (SELECT vec_id, v, {sims} AS sims,
                  sqrt({_dot_sql('v', 'v')}) AS nrm FROM e),
    a AS (SELECT vec_id,
                 CAST(list_indexof(sims, list_max(sims)) - 1 AS INTEGER) AS cell,
                 list_transform(v, x -> x / nrm) AS vn
          FROM c0),
    p AS (SELECT x.cell, x.vec_id AS id_a, b.vec_id AS id_b,
                 ('1.0'::DOUBLE) - ({_dot_sql('x.vn', 'b.vn')}) AS dist
          FROM a x JOIN a b ON x.cell = b.cell AND x.vec_id <> b.vec_id),
    starts AS (SELECT cell, min(vec_id) AS vec_id FROM a GROUP BY cell),
    sel AS (
      SELECT s.cell, s.vec_id, CAST(1 AS BIGINT) AS pos, [s.vec_id] AS visited
      FROM starts s
      UNION ALL
      SELECT c.cell, p.id_b, c.pos + 1, list_append(c.visited, p.id_b)
      FROM sel c JOIN p ON p.cell = c.cell
           AND list_contains(c.visited, p.id_a)
           AND NOT list_contains(c.visited, p.id_b)
      GROUP BY c.cell, c.pos, c.visited, p.id_b
      HAVING c.pos < {k}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY c.cell
              ORDER BY MIN(p.dist) DESC, p.id_b) = 1
    )
    SELECT vec_id, cell, pos FROM sel
    """


@_q("kcenter_coreset", _kcenter_sql())
def kcenter_coreset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Sener & Savarese 2018,
    arXiv:1708.00489) over the embeddings table: up to 8 maximally-
    spread representatives per quantizer cell — the diversity-first
    data-pruning rule, complementary to [[dedup_semantic_semdedup]]
    (which removes redundancy; this KEEPS coverage).  See
    operators/similarity.py:kcenter_coreset for the algorithm and the
    left-fold determinism contract behind the recursive SQL oracle."""
    from lvm_datapipe_spark.operators.similarity import kcenter_coreset

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb)


@_q(
    "quantile_normalize_sources",
    """
    WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x
               FROM documents),
    r AS (SELECT doc_id, source, x,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY x, doc_id) AS BIGINT) AS rk
          FROM d),
    ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM d GROUP BY source),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    vals AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY x),
    cum AS (SELECT a.v, CAST(SUM(b.c) AS BIGINT) AS cum_le
            FROM vals a JOIN vals b ON b.v <= a.v GROUP BY a.v),
    t AS (SELECT r.doc_id, r.source, r.x,
                 ((r.rk * tot.n + ns.n_s - 1) // ns.n_s) AS k
          FROM r JOIN ns ON ns.source = r.source CROSS JOIN tot),
    m AS (SELECT t.doc_id, t.source, t.x, CAST(min(c.v) AS BIGINT) AS x_norm
          FROM t JOIN cum c ON c.cum_le >= t.k
          GROUP BY t.doc_id, t.source, t.x)
    SELECT doc_id, source, x AS n_chars, x_norm
    FROM m
    """,
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION across sources (the batch-effect
    correction rule): each document's feature is REMAPPED to the pooled
    corpus value at its within-source quantile — after which every
    source has (up to ties) the same feature distribution, so a
    per-source scanner bias can't masquerade as a quality signal.
    [[text_rank_normalize]] rescales within a group; this aligns
    groups to a COMMON distribution.  Pure integer rank arithmetic:
    target pooled rank k = ceil(rk * N / n_s) (computed as
    (rk*N + n_s - 1) DIV n_s), and the mapped value is the smallest
    pooled value whose cumulative count reaches k — counting-based
    discrete quantiles, no interpolation (the ccnet portability rule).

    Scale shape: the only corpus-sized shuffles are the source-keyed
    rank window and the final doc-keyed aggregate; the pooled
    distribution lives as a DISTINCT-VALUES table with count-ahead
    cumulative counts (bounded by feature cardinality, broadcast —
    the Neyman pattern, no global window)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("x")
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    r = d.withColumn("rk", F.row_number().over(w).cast("long"))
    ns = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    vals = d.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    vb = vals.select(F.col("x").alias("bv"), F.col("c").alias("bc"))
    cum = (
        vals.join(F.broadcast(vb), F.col("bv") <= F.col("x"))
        .groupBy("x")
        .agg(F.sum("bc").cast("long").alias("cum_le"))
        .select(F.col("x").alias("v"), "cum_le")
    )
    t = (
        r.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            "x",
            F.expr("(rk * n + n_s - 1) DIV n_s").cast("long").alias("k"),
        )
    )
    m = (
        t.join(F.broadcast(cum), F.col("cum_le") >= F.col("k"))
        .groupBy("doc_id", "source", "x")
        .agg(F.min("v").cast("long").alias("x_norm"))
    )
    return m.select("doc_id", "source", F.col("x").alias("n_chars"), "x_norm")


@_q(
    "revenue_mom_growth",
    f"""
    WITH m AS (SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
                      + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1
                        AS month_id,
                      strftime(o_orderdate, '%Y-%m') AS month,
                      {_DEC_SUM.format(x='o_totalprice')} AS revenue,
                      CAST(count(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY month_id, month)
    SELECT c.month, c.n_orders, c.revenue,
           p.revenue AS prev_revenue,
           (c.revenue - p.revenue) / p.revenue AS mom_growth
    FROM m c JOIN m p ON p.month_id = c.month_id - 1
    """,
)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the KPI trend readout.  The
    monthly lag uses an EQUI-self-join on an integer month index
    (month_id = 12*year + month - 1) instead of a LAG window: the
    months table has no partitioning key, and a global-order window is
    banned from the declared surface; the join expresses the same
    adjacency with a broadcastable month-sized table.  Revenue is the
    exact decimal sum; growth is ONE float expression over two such
    sums.

    Scale shape: one keyed aggregate over orders (month key), then a
    self-join of the months-sized table.  Months with no predecessor
    (the first) drop out by the inner join — explicit, not NULL-padded."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (
            F.year("o_orderdate").cast("long") * 12
            + F.month("o_orderdate").cast("long")
            - 1
        ).alias("month_id"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        A.decimal_sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    p = m.select(
        (F.col("month_id") + 1).alias("month_id"),
        F.col("revenue").alias("prev_revenue"),
    )
    return (
        m.join(F.broadcast(p), "month_id")
        .select(
            "month",
            "n_orders",
            "revenue",
            "prev_revenue",
            (
                (F.col("revenue") - F.col("prev_revenue")) / F.col("prev_revenue")
            ).alias("mom_growth"),
        )
    )


# Benford expected first-digit probabilities log10(1 + 1/d), computed ONCE in
# Python and injected as the SAME float literal into both engines (the literal
# recipe) — cross-engine log10 is not guaranteed bit-identical, a shared
# literal is.
_BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}
_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN '{p!r}'::DOUBLE" for d, p in _BENFORD_P.items()
) + " END"


@_q(
    "benford_first_digit",
    f"""
    WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS cents
               FROM lineitem WHERE l_extendedprice > 0),
    d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM v),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM d),
    e AS (SELECT digit, n, total,
                 {_BENFORD_CASE_SQL} AS exp_p
          FROM c CROSS JOIN t)
    SELECT digit, n,
           CAST(n AS DOUBLE) / total AS obs_p,
           exp_p,
           ((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * exp_p)
            * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * exp_p))
           / (CAST(total AS DOUBLE) * exp_p) AS chi2_term
    FROM e
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit over prices — the forensic
    data-quality check for synthetic/fabricated numeric columns (a
    generator that draws uniform prices fails it; organically grown
    ledgers follow log10(1+1/d)).  The first significant digit is
    extracted WITHOUT float log10: the price is fixed to exact cents
    (DECIMAL(18,2) * 100 -> BIGINT) and the digit is the first
    character of the integer's decimal string — pure integer/string
    arithmetic, identical in any engine.  Expected probabilities are
    shared Python-float literals (cross-engine log10 is not
    bit-portable); the chi-square terms are the per-digit
    goodness-of-fit readout.

    Scale shape: one scan + one 9-group aggregate; the totals row is a
    1-row broadcast.  9 output rows regardless of corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    digit = (
        li.filter(F.col("l_extendedprice") > 0)
        .select(
            F.substring(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
    )
    c = digit.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = digit.agg(F.count(F.lit(1)).cast("long").alias("total"))
    exp_p = F.lit(None).cast("double")
    for d, p in _BENFORD_P.items():
        exp_p = F.when(F.col("digit") == d, F.lit(p)).otherwise(exp_p)
    e = c.crossJoin(F.broadcast(tot)).withColumn("exp_p", exp_p)
    nd = F.col("n").cast("double")
    expected = F.col("total").cast("double") * F.col("exp_p")
    return e.select(
        "digit",
        "n",
        (nd / F.col("total")).alias("obs_p"),
        "exp_p",
        (((nd - expected) * (nd - expected)) / expected).alias("chi2_term"),
    )


@_q(
    "auc_purchase_value",
    """
    WITH e AS (SELECT CAST(ts AS DATE) AS day,
                      value,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                        AS is_pos,
                      CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
                        AS is_neg
               FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
    r AS (SELECT day, is_pos, is_neg,
                 CAST(SUM(is_neg) OVER (PARTITION BY day ORDER BY value
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS neg_le,
                 CAST(SUM(is_neg) OVER (PARTITION BY day, value)
                      AS BIGINT) AS neg_eq
          FROM e),
    d AS (SELECT day,
                 CAST(SUM(is_pos) AS BIGINT) AS n_pos,
                 CAST(SUM(is_neg) AS BIGINT) AS n_neg,
                 CAST(SUM(CASE WHEN is_pos = 1
                           THEN 2 * (neg_le - neg_eq) + neg_eq
                           ELSE 0 END) AS BIGINT) AS u2
          FROM r GROUP BY day)
    SELECT strftime(day, '%Y-%m-%d') AS day, n_pos, n_neg, u2,
           CAST(u2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
    FROM d WHERE n_pos > 0 AND n_neg > 0
    """,
)
def auc_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily AUC (Mann-Whitney U) of `value` as a purchase classifier —
    the model-eval readout computed EXACTLY in integer rank arithmetic:
    for each positive, count negatives strictly below (via a
    RANGE-frame running sum that includes ties, minus the tie group)
    plus half the tied negatives; doubling everything keeps it BIGINT
    (u2 = 2U), and AUC = u2 / (2 * n_pos * n_neg) is ONE float division
    of exact integers.  Ties get the standard mid-rank treatment with
    no float rank averaging.

    Scale shape: both windows partition by day (no global window), then
    one day-keyed aggregate — the day key bounds every partition, and
    at 100 TB the windows parallelize across days."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        F.col("ts").cast("date").alias("day"),
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_pos"),
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("is_neg"),
    )
    w_le = (
        Window.partitionBy("day")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_eq = Window.partitionBy("day", "value")
    r = e.select(
        "day",
        "is_pos",
        "is_neg",
        F.sum("is_neg").over(w_le).cast("long").alias("neg_le"),
        F.sum("is_neg").over(w_eq).cast("long").alias("neg_eq"),
    )
    d = r.groupBy("day").agg(
        F.sum("is_pos").cast("long").alias("n_pos"),
        F.sum("is_neg").cast("long").alias("n_neg"),
        F.sum(
            F.when(
                F.col("is_pos") == 1,
                2 * (F.col("neg_le") - F.col("neg_eq")) + F.col("neg_eq"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("u2"),
    )
    return d.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_pos",
        "n_neg",
        "u2",
        (
            F.col("u2").cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


@_q(
    "chisq_source_lang",
    """
    WITH d AS (SELECT source, lang FROM documents
               WHERE source IS NOT NULL AND lang IS NOT NULL),
    c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
          FROM d GROUP BY source, lang),
    rt AS (SELECT source, CAST(count(*) AS BIGINT) AS row_n
           FROM d GROUP BY source),
    ct AS (SELECT lang, CAST(count(*) AS BIGINT) AS col_n
           FROM d GROUP BY lang),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    g AS (SELECT rt.source, ct.lang, rt.row_n, ct.col_n,
                 COALESCE(c.o, CAST(0 AS BIGINT)) AS o
          FROM rt CROSS JOIN ct
          LEFT JOIN c ON c.source = rt.source AND c.lang = ct.lang)
    SELECT g.source, g.lang, g.o,
           CAST(g.row_n * g.col_n AS DOUBLE) / t.n AS expected,
           ((CAST(g.o AS DOUBLE) - CAST(g.row_n * g.col_n AS DOUBLE) / t.n)
            * (CAST(g.o AS DOUBLE) - CAST(g.row_n * g.col_n AS DOUBLE) / t.n))
           / (CAST(g.row_n * g.col_n AS DOUBLE) / t.n) AS chi2_term
    FROM g CROSS JOIN t
    """,
)
def chisq_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square INDEPENDENCE test cells for source x lang — the
    composition-drift alarm ("does language mix depend on scanner
    source?").  The full contingency grid is the CROSS product of the
    two marginal tables (so ZERO-observed cells contribute their
    expected mass — omitting them understates the statistic), with
    observed counts left-joined in.  Marginals stay exact BIGINTs; each
    cell's expected count is the single float expression row_n*col_n/n
    (integer product first, one division), and the chi-square
    contribution repeats that expression verbatim so both engines
    evaluate the identical tree.  Summing chi2_term gives the
    statistic; per-cell terms localize WHICH (source, lang) drifted.

    Scale shape: one keyed aggregate for the cells; marginals and the
    total are group-count-sized broadcasts.  Cell count is bounded by
    |sources| x |langs|, not corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.filter(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    ).select("source", "lang")
    c = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rt = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("row_n"))
    ct = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("col_n"))
    t = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    g = (
        rt.crossJoin(F.broadcast(ct))
        .join(F.broadcast(c), ["source", "lang"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0).cast("long")))
    )
    j = g.crossJoin(F.broadcast(t))
    od = F.col("o").cast("double")
    expected = (F.col("row_n") * F.col("col_n")).cast("double") / F.col("n")
    return j.select(
        "source",
        "lang",
        "o",
        expected.alias("expected"),
        (((od - expected) * (od - expected)) / expected).alias("chi2_term"),
    )


def _discrete_laplace_cdf(eps: float = 0.5, k_max: int = 12) -> list[tuple[int, float]]:
    """CDF thresholds of the discrete (two-sided geometric) Laplace
    distribution P(k) ∝ exp(-eps)**|k|, truncated to [-k_max, k_max]
    (tail mass folded into the extremes).  Computed ONCE in Python so
    both engines compare against the SAME float literals."""
    import math

    a = math.exp(-eps)
    p0 = (1.0 - a) / (1.0 + a)
    tail = sum(p0 * a ** abs(k) for k in range(-200, -k_max))
    out, s = [], tail
    for k in range(-k_max, k_max):
        s += p0 * a ** abs(k)
        out.append((k, s))
    return out


_DP_CDF = _discrete_laplace_cdf()
_DP_CASE_SQL = "CASE " + " ".join(
    f"WHEN u < '{c!r}'::DOUBLE THEN CAST({k} AS BIGINT)" for k, c in _DP_CDF
) + " ELSE CAST(12 AS BIGINT) END"


@_q(
    "dp_release_counts",
    f"""
    WITH c AS (SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events
               WHERE event_type IS NOT NULL AND ts IS NOT NULL
               GROUP BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')),
    h AS (SELECT event_type, day, n,
                 ('0x' || substr(md5('dp1|' || event_type || '|' || day), 1, 8))::BIGINT
                   / 4294967296.0 AS u
          FROM c),
    z AS (SELECT event_type, day, n, {_DP_CASE_SQL} AS noise FROM h)
    SELECT event_type, day, n, noise,
           CASE WHEN n + noise > 0 THEN n + noise ELSE CAST(0 AS BIGINT) END
             AS released
    FROM z
    """,
)
def dp_release_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (audit mode): daily
    per-event-type counts plus DISCRETE-Laplace noise (the two-sided
    geometric mechanism, eps=0.5), deterministically seeded from the
    group key so releases are replayable and testable — inverse-CDF
    over a md5 hash fraction, with the CDF ladder shared between
    engines as Python-float literals.  Noise stays a BIGINT (the
    discrete mechanism needs no float arithmetic on the release path);
    the hash fraction u = h / 2**32 is an EXACT power-of-two scaling,
    so both engines compare identical bits against identical
    thresholds.  Post-processing clamps released counts at 0.  Audit
    mode keeps the true n alongside; a production release would drop it
    (and use a secret salt instead of 'dp1|').

    Scale shape: one keyed aggregate over events, then scan-shaped
    hash + ladder arithmetic on the group-count-sized result."""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("dp1|"), F.col("event_type"), F.lit("|"), F.col("day")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    u = h / F.lit(4294967296.0)
    noise = F.lit(12).cast("long")
    for k, cth in reversed(_DP_CDF):
        noise = F.when(u < F.lit(cth), F.lit(k).cast("long")).otherwise(noise)
    z = c.withColumn("noise", noise)
    return z.select(
        "event_type",
        "day",
        "n",
        "noise",
        F.when(F.col("n") + F.col("noise") > 0, F.col("n") + F.col("noise"))
        .otherwise(F.lit(0).cast("long"))
        .alias("released"),
    )


@_q(
    "dedup_containment_pairs",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= 1000),
    exk AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN keep USING (shingle)),
    sz AS (SELECT doc_id, CAST(len(s) AS INTEGER) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM exk a JOIN exk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, n_common,
           n_common / sa.n AS cont_a,
           n_common / sb.n AS cont_b
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE n_common / sa.n >= 0.8 OR n_common / sb.n >= 0.8
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment near-dup (quote/inclusion detection):
    C(A in B) = |A∩B|/|A| scores a short doc fully quoted inside a long
    one as 1.0 where Jaccard's union denominator would bury it.  The
    curation use is one-way boilerplate: a license block or template
    contained in thousands of docs is invisible to symmetric Jaccard at
    any threshold but lights up here.  Shares the capped posting-list
    intersection kernel with dedup_ngram_jaccard (the cap mirrored in
    the oracle's HAVING), sizes always uncapped."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(docs, threshold=0.8, max_shingle_freq=1000)


@_q(
    "source_shingle_overlap",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    ds AS (SELECT DISTINCT d.source, e.shingle
           FROM ex e JOIN documents d USING (doc_id)
           WHERE d.source IS NOT NULL),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, n_shared,
           n_shared / LEAST(sa.n, sb.n) AS overlap_coef,
           n_shared / (sa.n + sb.n - n_shared) AS jaccard
    FROM inter
    JOIN sz sa ON sa.source = src_a
    JOIN sz sb ON sb.source = src_b
    """,
)
def source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE contamination matrix: for every pair of scanner
    sources, how much of their n-gram shingle vocabulary is shared —
    the "did crawl B re-ingest crawl A?" audit run BEFORE doc-level
    dedup (a source pair with overlap_coef near 1 means one feed is a
    subset of the other and can be dropped wholesale, far cheaper than
    pairwise doc dedup).  Overlap coefficient (shared / min) catches
    subset feeds; Jaccard gives the symmetric view.

    Scale shape: the (source, shingle) table is corpus-sized but the
    per-shingle posting list is bounded by |sources| (tiny), so the
    shingle self-join cannot blow up regardless of corpus size; output
    is |sources|²/2 rows."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    d = docs.filter(F.col("source").isNotNull())
    sr = D.shingle_rows(d)
    ds = (
        sr.join(d.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .dropDuplicates()
    )
    sz = ds.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        D.shingle_intersections(ds, "source", None)
        .select(
            F.col("id_a").alias("src_a"),
            F.col("id_b").alias("src_b"),
            F.col("n_common").cast("long").alias("n_shared"),
        )
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            (F.col("n_shared") / F.least("n_a", "n_b")).alias("overlap_coef"),
            (
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


@_q(
    "kendall_tau_source_size",
    """
    WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS x,
                      CAST(count(DISTINCT lang) AS BIGINT) AS y
               FROM documents WHERE source IS NOT NULL GROUP BY source),
    p AS (SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
          FROM s a JOIN s b ON a.source < b.source),
    c AS (SELECT
            CAST(SUM(CASE WHEN (xa - xb) * (ya - yb) > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS conc,
            CAST(SUM(CASE WHEN (xa - xb) * (ya - yb) < 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS disc,
            CAST(SUM(CASE WHEN xa = xb AND ya <> yb THEN 1 ELSE 0 END)
                 AS BIGINT) AS tie_x,
            CAST(SUM(CASE WHEN ya = yb AND xa <> xb THEN 1 ELSE 0 END)
                 AS BIGINT) AS tie_y,
            CAST(SUM(CASE WHEN xa = xb AND ya = yb THEN 1 ELSE 0 END)
                 AS BIGINT) AS tie_xy,
            CAST(count(*) AS BIGINT) AS n_pairs
          FROM p)
    SELECT conc, disc, tie_x, tie_y, tie_xy, n_pairs,
           CASE WHEN conc + disc + tie_x > 0 AND conc + disc + tie_y > 0
                THEN CAST(conc - disc AS DOUBLE)
                     / (sqrt(CAST(conc + disc + tie_x AS DOUBLE))
                        * sqrt(CAST(conc + disc + tie_y AS DOUBLE)))
                ELSE NULL END AS tau_b
    FROM c
    """,
)
def kendall_tau_source_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S TAU-B rank agreement between two per-source signals
    (total chars vs language spread) — the "do my quality signals rank
    sources the same way?" readout, computed EXACTLY from integer
    concordant/discordant/tie pair counts (no float rank averaging;
    tau-b's tie correction keeps every term BIGINT until one final
    sqrt/divide over exact integers — IEEE sqrt is bit-identical
    everywhere).  Doubly-tied pairs are excluded from both denominator
    terms per the standard definition.

    Scale shape: the pair self-join runs over the SOURCE-level
    aggregate (|sources| rows, broadcast non-equi join), never over
    corpus rows — the corpus contributes one keyed aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    s = (
        docs.filter(F.col("source").isNotNull())
        .groupBy("source")
        .agg(
            F.sum("n_chars").cast("long").alias("x"),
            F.countDistinct("lang").cast("long").alias("y"),
        )
    )
    a = s.select(F.col("source").alias("src_a"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = s.select(F.col("source").alias("src_b"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    p = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
    dx, dy = F.col("xa") - F.col("xb"), F.col("ya") - F.col("yb")
    c = p.agg(
        F.sum(F.when(dx * dy > 0, 1).otherwise(0)).cast("long").alias("conc"),
        F.sum(F.when(dx * dy < 0, 1).otherwise(0)).cast("long").alias("disc"),
        F.sum(F.when((dx == 0) & (dy != 0), 1).otherwise(0)).cast("long").alias("tie_x"),
        F.sum(F.when((dy == 0) & (dx != 0), 1).otherwise(0)).cast("long").alias("tie_y"),
        F.sum(F.when((dx == 0) & (dy == 0), 1).otherwise(0)).cast("long").alias("tie_xy"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    cd = F.col("conc") + F.col("disc")
    tau = (F.col("conc") - F.col("disc")).cast("double") / (
        F.sqrt((cd + F.col("tie_x")).cast("double"))
        * F.sqrt((cd + F.col("tie_y")).cast("double"))
    )
    return c.select(
        "conc",
        "disc",
        "tie_x",
        "tie_y",
        "tie_xy",
        "n_pairs",
        F.when(
            (cd + F.col("tie_x") > 0) & (cd + F.col("tie_y") > 0), tau
        ).alias("tau_b"),
    )


@_q(
    "events_lead_lag_xcorr",
    """
    WITH x AS (SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                        AS day_id,
                      CAST(count(*) AS BIGINT) AS x
               FROM events WHERE event_type = 'click' AND ts IS NOT NULL
               GROUP BY 1),
    y AS (SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS day_id,
                 CAST(count(*) AS BIGINT) AS y
          FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
          GROUP BY 1),
    l AS (SELECT CAST(unnest([-3, -2, -1, 0, 1, 2, 3]) AS BIGINT) AS lag),
    j AS (SELECT l.lag, x.x, y.y
          FROM l CROSS JOIN x JOIN y ON y.day_id = x.day_id + l.lag),
    a AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM j GROUP BY lag)
    SELECT lag, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                ELSE NULL END AS pearson_r
    FROM a
    """,
)
def events_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD-LAG cross-correlation between the daily click series and the
    daily purchase series at lags -3..+3 — the "does X lead Y?"
    causality-screening readout.  Pearson r at each lag is assembled
    from EXACT integer sums (n, Σx, Σy, Σxy, Σx², Σy² — all BIGINT over
    daily counts) with the n*Σxy - ΣxΣy form, so the only float ops are
    one subtraction-free cast, two IEEE sqrts, and one division —
    bit-identical in any engine.  Degenerate lags (zero variance) yield
    NULL, not a crash.

    Scale shape: two keyed daily aggregates, a 7-row broadcast lag
    table, one equi-join on the shifted day key, and a 7-group
    aggregate.  Day-count-sized intermediates throughout."""
    ev = load_table(spark, sf_dir, "events")
    day_id = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).cast("long")
    x = (
        ev.filter((F.col("event_type") == "click") & F.col("ts").isNotNull())
        .groupBy(day_id.alias("day_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    y = (
        ev.filter((F.col("event_type") == "purchase") & F.col("ts").isNotNull())
        .groupBy(day_id.alias("day_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    lags = spark.createDataFrame([(i,) for i in range(-3, 4)], "lag long")
    j = (
        x.crossJoin(F.broadcast(lags))
        .withColumn("probe_day", F.col("day_id") + F.col("lag"))
        .join(y, F.col("probe_day") == y["day_id"])
        .select("lag", "x", "y")
    )
    a = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return a.select(
        "lag",
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).alias("pearson_r"),
    )


@_q(
    "churn_labels_weekly",
    """
    WITH m AS (SELECT user_id,
                      CAST(floor(CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                                      AS BIGINT) / 7) AS BIGINT) AS week_id,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
               GROUP BY 1, 2),
    mx AS (SELECT CAST(max(week_id) AS BIGINT) AS last_w FROM m)
    SELECT c.user_id, c.week_id, c.n_events,
           CASE WHEN n.user_id IS NULL THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS churned
    FROM m c
    LEFT JOIN m n ON n.user_id = c.user_id AND n.week_id = c.week_id + 1
    CROSS JOIN mx
    WHERE c.week_id < mx.last_w
    """,
)
def churn_labels_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHURN LABEL GENERATION — the classic supervised-label shaping
    job: a user active in week w is labeled churned iff they have no
    activity in week w+1.  The label is a LEFT anti-pattern join on an
    integer week index (epoch days DIV 7 — positive days, so floor
    division is exact in both engines), and the final week is excluded
    because its future is unobserved (the right-censoring guard every
    churn pipeline needs and most forget).

    Scale shape: one (user, week)-keyed aggregate, a self-equi-join on
    (user, week+1), and a 1-row broadcast for the censoring cutoff —
    all keyed, no windows."""
    ev = load_table(spark, sf_dir, "events")
    week_id = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).cast("long")
        / 7
    ).cast("long")
    m = (
        ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("user_id", week_id.alias("week_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    nxt = m.select(
        F.col("user_id").alias("n_user"),
        (F.col("week_id") - 1).alias("n_prev_week"),
    )
    mx = m.agg(F.max("week_id").cast("long").alias("last_w"))
    return (
        m.join(
            nxt,
            (F.col("user_id") == F.col("n_user"))
            & (F.col("week_id") == F.col("n_prev_week")),
            "left",
        )
        .crossJoin(F.broadcast(mx))
        .filter(F.col("week_id") < F.col("last_w"))
        .select(
            "user_id",
            "week_id",
            "n_events",
            F.when(F.col("n_user").isNull(), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("churned"),
        )
    )


@_q(
    "vocab_hapax_ratio",
    rf"""
    WITH toks AS (SELECT source, unnest({_SQL_TOKS}) AS tok
                  FROM documents WHERE source IS NOT NULL),
    tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY source, tok),
    r AS (SELECT source, CAST(count(*) AS BIGINT) AS n_distinct,
                 CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
          FROM tc GROUP BY source)
    SELECT source, n_distinct, n_hapax,
           CAST(n_hapax AS DOUBLE) / n_distinct AS hapax_ratio
    FROM r
    """,
)
def vocab_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAPAX LEGOMENA ratio per source — the vocabulary-richness /
    boilerplate detector: a source whose token distribution has almost
    no once-occurring words is template spam; natural prose sits near
    the Zipfian ~0.4-0.6 band.  Pure integer token counting (two keyed
    aggregates) with ONE final float division.

    Scale shape: token explode is scan-shaped; the (source, token)
    aggregate is the only corpus-sized shuffle, and the per-source
    rollup is group-sized."""
    from lvm_datapipe_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.filter(F.col("source").isNotNull())
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    r = tc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
    )
    return r.select(
        "source",
        "n_distinct",
        "n_hapax",
        (F.col("n_hapax").cast("double") / F.col("n_distinct")).alias("hapax_ratio"),
    )


@_q(
    "target_encode_loo",
    """
    WITH g AS (SELECT o_orderpriority,
                      SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS sum_g,
                      CAST(count(*) AS BIGINT) AS n_g
               FROM orders GROUP BY o_orderpriority)
    SELECT o_orderkey, o.o_orderpriority, o_totalprice,
           CASE WHEN n_g > 1
                THEN CAST(sum_g - CAST(o_totalprice AS DECIMAL(27,6)) AS DOUBLE)
                     / (n_g - 1)
                ELSE NULL END AS loo_mean
    FROM orders o JOIN g ON g.o_orderpriority = o.o_orderpriority
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding — the leakage-safe categorical
    feature: each row's encoded value is the category's target mean
    COMPUTED WITHOUT THAT ROW ((sum_g - x_i) / (n_g - 1)), so the
    feature never contains the row's own label (the train-time leak
    that makes naive target encoding overfit).  The subtraction happens
    in EXACT decimal before the single double cast+division; singleton
    categories yield NULL (no peer information), not a divide-by-zero.

    Scale shape: one keyed aggregate to the category table (broadcast
    back — category cardinality, not corpus), one scan to encode.  No
    window, no per-row shuffle."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(27,6)")
    g = o.groupBy("o_orderpriority").agg(
        F.sum(dec).alias("sum_g"),
        F.count(F.lit(1)).cast("long").alias("n_g"),
    )
    return (
        o.join(F.broadcast(g), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.when(
                F.col("n_g") > 1,
                (F.col("sum_g") - dec).cast("double") / (F.col("n_g") - 1),
            ).alias("loo_mean"),
        )
    )


_MH_K = 16
_MH_EST_SQL = " + ".join(
    f"CASE WHEN sa.sig[{i + 1}] = sb.sig[{i + 1}] THEN 1 ELSE 0 END"
    for i in range(_MH_K)
)


@_q(
    "minhash_estimate_error",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
    sig AS (
      SELECT doc_id,
             list_transform(generate_series(0, 15),
               i -> list_min(list_transform(s, x -> md5(CAST(i AS VARCHAR) || ':' || x)))) AS sig
      FROM sh),
    bands AS (
      SELECT doc_id, b.b AS band,
             md5(sig[b.b*4+1] || ',' || sig[b.b*4+2] || ',' || sig[b.b*4+3] || ',' || sig[b.b*4+4]) AS bucket
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) b),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    est AS (
      SELECT p.id_a, p.id_b,
             CAST({_MH_EST_SQL} AS BIGINT) AS n_matches
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.id_a
      JOIN sig sb ON sb.doc_id = p.id_b),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= 1000),
    exk AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN keep USING (shingle)),
    sz AS (SELECT doc_id, CAST(len(s) AS INTEGER) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM exk a JOIN exk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    j AS (
      SELECT e.id_a, e.id_b, e.n_matches,
             CAST(e.n_matches AS DOUBLE) / CAST(16 AS DOUBLE) AS est_jaccard,
             COALESCE(i.n_common, CAST(0 AS BIGINT))
               / (sa.n + sb.n - COALESCE(i.n_common, CAST(0 AS BIGINT)))
               AS exact_jaccard
      FROM est e
      LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
      JOIN sz sa ON sa.doc_id = e.id_a
      JOIN sz sb ON sb.doc_id = e.id_b)
    SELECT id_a, id_b, n_matches, est_jaccard, exact_jaccard,
           est_jaccard - exact_jaccard AS err
    FROM j
    """,
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINHASH ESTIMATOR CALIBRATION — for every LSH candidate pair,
    the signature-estimated Jaccard (matching positions / k) next to
    the EXACT n-gram Jaccard, with the signed error.  This is the
    "is k=16 enough for my threshold?" eval every MinHash deployment
    needs: the error column's spread at the decision boundary tells
    you whether to raise k or band differently, measured on YOUR
    corpus rather than the textbook binomial bound.

    Scale shape: signatures and bands are the standard scan-shaped
    pipeline; the exact-Jaccard side runs the capped posting-list
    kernel ONLY as a join against the (already bounded) candidate
    pairs.  Everything keyed — no quadratic path."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs).persist()
    pairs = D.lsh_candidate_pairs(sigs)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    match_expr = " + ".join(
        f"CASE WHEN sig_a[{i}] = sig_b[{i}] THEN 1 ELSE 0 END"
        for i in range(_MH_K)
    )
    est = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr(f"CAST({match_expr} AS BIGINT)").alias("n_matches"),
        )
    )
    sr = D.shingle_rows(docs).persist()
    sizes = sr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = D.shingle_intersections(sr, "doc_id", 1000)
    nza = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    nzb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    nc = F.coalesce(F.col("n_common"), F.lit(0).cast("long"))
    out = (
        est.join(inter, ["id_a", "id_b"], "left")
        .join(nza, "id_a")
        .join(nzb, "id_b")
        .withColumn(
            "est_jaccard", F.col("n_matches").cast("double") / F.lit(16).cast("double")
        )
        .withColumn(
            "exact_jaccard", nc / (F.col("n_a") + F.col("n_b") - nc)
        )
        .select(
            "id_a",
            "id_b",
            "n_matches",
            "est_jaccard",
            "exact_jaccard",
            (F.col("est_jaccard") - F.col("exact_jaccard")).alias("err"),
        )
    )
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    return _with_cached_deps(out, [sigs, sr])


def _mmr_sql(k: int = 8, n_cells: int = 16, seed: int = 42, dim: int = _EMB_DIM) -> str:
    """DuckDB replay of MMR selection: shared quantizer-literal cell/rel
    assignment, within-cell cosine SIMILARITIES, then the greedy loop as a
    recursive CTE whose step aggregates max-sim-to-selected per candidate
    and picks argmax of lambda*rel - (1-lambda)*maxsim via QUALIFY — the
    same (higher score, lower id) rule the Spark UDF's incremental update
    makes over bit-identical doubles (shared MMR_LAMBDA literals)."""
    from lvm_datapipe_spark.operators.similarity import (
        MMR_LAMBDA,
        MMR_ONE_MINUS_LAMBDA,
        ivf_fixed_centroids,
    )

    cents = ivf_fixed_centroids(n_cells, dim, seed)

    def cos_lit(v: str, c) -> str:
        dot_vc = " + ".join(
            f"{v}[{i + 1}]*('{float(c[i])!r}'::DOUBLE)" for i in range(dim)
        )
        dot_cc = sum(float(x) * float(x) for x in c)
        return f"(({dot_vc}) / (sqrt({_dot_sql(v, v)}) * sqrt('{dot_cc!r}'::DOUBLE)))"

    sims = "[" + ", ".join(cos_lit("v", c) for c in cents) + "]"
    lam = f"('{MMR_LAMBDA!r}'::DOUBLE)"
    oml = f"('{MMR_ONE_MINUS_LAMBDA!r}'::DOUBLE)"
    return f"""
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                         FROM embeddings WHERE embedding IS NOT NULL),
    c0 AS (SELECT vec_id, v, {sims} AS sims,
                  sqrt({_dot_sql('v', 'v')}) AS nrm FROM e),
    a AS (SELECT vec_id,
                 CAST(list_indexof(sims, list_max(sims)) - 1 AS INTEGER) AS cell,
                 list_max(sims) AS rel,
                 list_transform(v, x -> x / nrm) AS vn
          FROM c0),
    p AS (SELECT x.cell, x.vec_id AS id_a, b.vec_id AS id_b,
                 ({_dot_sql('x.vn', 'b.vn')}) AS sim
          FROM a x JOIN a b ON x.cell = b.cell AND x.vec_id <> b.vec_id),
    seeds AS (SELECT cell, vec_id FROM a
              QUALIFY ROW_NUMBER() OVER (PARTITION BY cell
                      ORDER BY rel DESC, vec_id) = 1),
    sel AS (
      SELECT s.cell, s.vec_id, CAST(1 AS BIGINT) AS pos, [s.vec_id] AS visited
      FROM seeds s
      UNION ALL
      SELECT c.cell, p.id_b, c.pos + 1, list_append(c.visited, p.id_b)
      FROM sel c
      JOIN p ON p.cell = c.cell
           AND list_contains(c.visited, p.id_a)
           AND NOT list_contains(c.visited, p.id_b)
      JOIN a r ON r.vec_id = p.id_b
      GROUP BY c.cell, c.pos, c.visited, p.id_b, r.rel
      HAVING c.pos < {k}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY c.cell
              ORDER BY {lam} * r.rel - {oml} * MAX(p.sim) DESC, p.id_b) = 1
    )
    SELECT vec_id, cell, pos FROM sel
    """


@_q("mmr_diverse_selection", _mmr_sql())
def mmr_diverse_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diverse selection (Carbonell &
    Goldstein 1998) over the embeddings table: up to 8 picks per
    quantizer cell trading topic relevance (cosine to the cell
    centroid) against redundancy (max cosine to already-picked) at
    lambda=0.7 — the in-context-example / retrieval re-ranking rule.
    Complements [[kcenter_coreset]] (pure spread) and
    [[dedup_semantic_semdedup]] (pure redundancy removal).  See
    operators/similarity.py:mmr_select for the determinism contract
    behind the recursive SQL oracle."""
    from lvm_datapipe_spark.operators.similarity import mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_select(emb)


@_q(
    "spearman_len_vs_spaces",
    """
    WITH d AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS x,
                      CAST(length(text) - length(replace(text, ' ', ''))
                           AS BIGINT) AS y
               FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
    r AS (SELECT lang, doc_id, x, y,
                 CAST(2 * RANK() OVER (PARTITION BY lang ORDER BY x)
                      + COUNT(*) OVER (PARTITION BY lang, x) - 1
                      AS BIGINT) AS r2x,
                 CAST(2 * RANK() OVER (PARTITION BY lang ORDER BY y)
                      + COUNT(*) OVER (PARTITION BY lang, y) - 1
                      AS BIGINT) AS r2y
          FROM d),
    a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(r2x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(r2y AS DECIMAL(19,0))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(r2x AS DECIMAL(19,0)) * r2y) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(r2x AS DECIMAL(19,0)) * r2x) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(r2y AS DECIMAL(19,0)) * r2y) AS DOUBLE) AS syy
          FROM r GROUP BY lang)
    SELECT lang, n,
           CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
                 AND CAST(n AS DOUBLE) * syy - sy * sy > 0
                THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
                ELSE NULL END AS spearman_rho
    FROM a
    """,
)
def spearman_len_vs_spaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation per language between doc length and
    whitespace count — the monotone-association readout robust to the
    heavy-tailed length distribution where Pearson saturates on
    outliers.  Tie handling is the textbook mid-rank, kept INTEGER by
    doubling: doubled mid-rank = 2*RANK + tie_count - 1 (never a .5).
    Rank sums accumulate in exact DECIMAL(38,0) (so the plan never
    silently overflows BIGINT on billion-row groups — decimal overflow
    is loud); the Pearson-over-ranks combination then runs entirely in
    DOUBLE with one shared expression tree.  Zero-variance groups yield
    NULL.

    Scale shape: two lang-partitioned rank windows (no global window)
    plus one keyed aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.filter(F.col("lang").isNotNull() & F.col("text").isNotNull()).select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", ""))
        ).cast("long").alias("y"),
    )
    wx = Window.partitionBy("lang").orderBy("x")
    wy = Window.partitionBy("lang").orderBy("y")
    r = d.select(
        "lang",
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(Window.partitionBy("lang", "x")) - 1)
        .cast("long")
        .alias("r2x"),
        (2 * F.rank().over(wy) + F.count(F.lit(1)).over(Window.partitionBy("lang", "y")) - 1)
        .cast("long")
        .alias("r2y"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    a = r.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("r2x")).cast("double").alias("sx"),
        F.sum(dec("r2y")).cast("double").alias("sy"),
        F.sum(dec("r2x") * F.col("r2y")).cast("double").alias("sxy"),
        F.sum(dec("r2x") * F.col("r2x")).cast("double").alias("sxx"),
        F.sum(dec("r2y") * F.col("r2y")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    rho = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(vx) * F.sqrt(vy)
    )
    return a.select(
        "lang", "n", F.when((vx > 0) & (vy > 0), rho).alias("spearman_rho")
    )


@_q(
    "interval_union_coverage",
    """
    WITH s AS (SELECT event_id, user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
                      CAST(floor(epoch(ts)) AS BIGINT)
                        + CAST(floor(value) AS BIGINT) AS end_s
               FROM events
               WHERE ts IS NOT NULL AND user_id IS NOT NULL
                 AND value IS NOT NULL AND value > 0),
    m AS (SELECT event_id, user_id, start_s, end_s,
                 MAX(end_s) OVER (PARTITION BY user_id
                      ORDER BY start_s, end_s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max_end
          FROM s),
    f AS (SELECT event_id, user_id, start_s, end_s,
                 CASE WHEN prev_max_end IS NULL OR start_s > prev_max_end
                      THEN 1 ELSE 0 END AS is_new
          FROM m),
    i AS (SELECT user_id, start_s, end_s,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id
                      ORDER BY start_s, end_s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS island
          FROM f),
    g AS (SELECT user_id, island,
                 CAST(max(end_s) - min(start_s) AS BIGINT) AS cov
          FROM i GROUP BY user_id, island)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(cov) AS BIGINT) AS covered_seconds
    FROM g GROUP BY user_id
    """,
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL UNION per user — merge overlapping activity spans
    (event start + `value` seconds) and report total covered seconds:
    the occupancy/coverage primitive behind GPU-utilization accounting,
    overlapping-clip dedup, and billable-time rollups.  The sweep is
    the classic islands trick: a span starts a new island iff its start
    exceeds the running MAX(end) of everything before it (ROWS frame
    with a 1-PRECEDING upper bound — NOT a lag of the previous row's
    end, which breaks when a long span swallows its successors);
    cumulative island ids then reduce to min-start/max-end per island.
    Pure integer epoch-second arithmetic.

    Scale shape: two user-partitioned windows + two keyed aggregates —
    parallel across users, no global ordering anywhere."""
    ev = load_table(spark, sf_dir, "events")
    # unix_seconds truncates; epochs are positive so truncation == floor,
    # matching the oracle's floor(epoch(ts))
    start = F.unix_seconds(F.col("ts").cast("timestamp")).cast("long")
    s = ev.filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") > 0)
    ).select(
        "event_id",
        "user_id",
        start.alias("start_s"),
        (start + F.floor(F.col("value")).cast("long")).alias("end_s"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("start_s", "end_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = s.withColumn("prev_max_end", F.max("end_s").over(w_prev))
    f = m.withColumn(
        "is_new",
        F.when(
            F.col("prev_max_end").isNull()
            | (F.col("start_s") > F.col("prev_max_end")),
            1,
        ).otherwise(0),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("start_s", "end_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    i = f.withColumn("island", F.sum("is_new").over(w_cum).cast("long"))
    g = i.groupBy("user_id", "island").agg(
        (F.max("end_s") - F.min("start_s")).cast("long").alias("cov")
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("cov").cast("long").alias("covered_seconds"),
    )


@_q(
    "dedup_rate_by_source",
    r"""
    WITH f AS (SELECT source,
                      md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                        AS fingerprint
               FROM documents WHERE source IS NOT NULL)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT fingerprint) AS BIGINT) AS n_dups,
           CAST(count(*) - count(DISTINCT fingerprint) AS DOUBLE) / count(*)
             AS dup_rate
    FROM f GROUP BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP TELEMETRY per source — the feed-health readout every
    ingestion pipeline charts: exact-duplicate rate by scanner source
    (same whitespace/case-normalized fingerprint as [[dedup_exact]]).
    A source whose dup_rate jumps is re-crawling itself; comparing
    across sources ranks feeds by redundancy BEFORE paying for
    near-dup passes.  Integer counts, one float division.

    Scale shape: one (source, fingerprint)-keyed aggregate (the
    count-distinct shuffles once on the pair, then rolls up)."""
    docs = load_table(spark, sf_dir, "documents")
    from lvm_datapipe_spark.operators.text import fingerprint

    f = docs.filter(F.col("source").isNotNull()).select(
        "source", fingerprint("text").alias("fingerprint")
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("fingerprint").cast("long").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("fingerprint"))
        .cast("long")
        .alias("n_dups"),
        (
            (F.count(F.lit(1)) - F.countDistinct("fingerprint")).cast("double")
            / F.count(F.lit(1))
        ).alias("dup_rate"),
    )


@_q(
    "referential_integrity_audit",
    """
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN p.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM lineitem c LEFT JOIN orders p ON c.l_orderkey = p.o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem c LEFT JOIN part p ON c.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN p.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem c LEFT JOIN supplier p ON c.l_suppkey = p.s_suppkey
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN p.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders c LEFT JOIN customer p ON c.o_custkey = p.c_custkey
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN p.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer c LEFT JOIN nation p ON c.c_nationkey = p.n_nationkey
    UNION ALL
    SELECT 'supplier.s_nationkey->nation',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN p.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM supplier c LEFT JOIN nation p ON c.s_nationkey = p.n_nationkey
    UNION ALL
    SELECT 'nation.n_regionkey->region',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN p.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM nation c LEFT JOIN region p ON c.n_regionkey = p.r_regionkey
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFERENTIAL-INTEGRITY audit across every TPC-H foreign key —
    the cross-table data-quality gate (dq's not-null/unique checks are
    single-table; orphaned keys need joins).  One row per FK edge with
    total child rows and orphan count; a warehouse load is publishable
    iff every n_orphans is 0.  Left joins against unique parent keys
    never fan out, so n_rows doubles as a join-cardinality regression
    check.

    Scale shape: seven independent keyed left joins, each aggregating
    map-side to a single row — dims broadcast under AQE, the two
    fact-fact joins shuffle on their key."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "part", "supplier", "customer", "nation", "region")}

    def edge(label, child, ckey, parent, pkey):
        return (
            t[child]
            .join(
                t[parent].select(pkey),
                F.col(ckey) == F.col(pkey),
                "left",
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            )
            .select(F.lit(label).alias("fk"), "n_rows", "n_orphans")
        )

    edges = [
        edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        edge("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        edge("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out


@_q(
    "share_hierarchy_revenue",
    f"""
    WITH base AS (SELECT r.r_name, n.n_name, o.o_totalprice
                  FROM orders o
                  JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
                  JOIN region r ON n.n_regionkey = r.r_regionkey),
    nat AS (SELECT r_name, n_name, {_DEC_SUM.format(x='o_totalprice')} AS revenue
            FROM base GROUP BY r_name, n_name),
    reg AS (SELECT r_name, {_DEC_SUM.format(x='o_totalprice')} AS region_revenue
            FROM base GROUP BY r_name),
    tot AS (SELECT {_DEC_SUM.format(x='o_totalprice')} AS total_revenue FROM base)
    SELECT nat.r_name, nat.n_name, nat.revenue,
           reg.region_revenue, tot.total_revenue,
           nat.revenue / reg.region_revenue AS nation_share_of_region,
           reg.region_revenue / tot.total_revenue AS region_share_of_total
    FROM nat JOIN reg ON reg.r_name = nat.r_name CROSS JOIN tot
    """,
)
def share_hierarchy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHICAL share-of-parent — revenue decomposed along
    region <- nation with each level's share of its parent (the
    drill-down treemap readout; [[w10_share_of_group]] gives one
    level, this composes two).  Every level is an independent exact
    decimal sum over the SAME base join (no share-of-share float
    compounding), divisions in double only at the end.

    Scale shape: one 3-dim broadcast join chain over orders, then
    three keyed aggregates of descending cardinality; nation and
    region tables are broadcast-sized by construction."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    base = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "n_name", "o_totalprice")
    )
    nat = base.groupBy("r_name", "n_name").agg(
        A.decimal_sum("o_totalprice").alias("revenue")
    )
    reg = base.groupBy("r_name").agg(
        A.decimal_sum("o_totalprice").alias("region_revenue")
    )
    tot = base.agg(A.decimal_sum("o_totalprice").alias("total_revenue"))
    return (
        nat.join(F.broadcast(reg), "r_name")
        .crossJoin(F.broadcast(tot))
        .select(
            "r_name",
            "n_name",
            "revenue",
            "region_revenue",
            "total_revenue",
            (F.col("revenue") / F.col("region_revenue")).alias(
                "nation_share_of_region"
            ),
            (F.col("region_revenue") / F.col("total_revenue")).alias(
                "region_share_of_total"
            ),
        )
    )


_RBO_P = 0.9
_RBO_DEPTHS = [(d, (1.0 - _RBO_P) * _RBO_P ** (d - 1)) for d in range(1, 11)]
_RBO_DEPTH_SQL = ", ".join(f"({d}, '{w!r}'::DOUBLE)" for d, w in _RBO_DEPTHS)


@_q(
    "rbo_lex_vs_vector",
    f"""
    WITH {_bm25_lexagg_sql()},
    lextop AS (SELECT doc_id, score FROM lexagg
               ORDER BY score DESC, doc_id LIMIT 10),
    lex AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                 AS BIGINT) AS lex_rank FROM lextop),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    sc AS (SELECT vec_id, {_cos_sql('qv', 'v')} AS cos_sim
           FROM e CROSS JOIN q WHERE vec_id <> 0),
    vectop AS (SELECT vec_id, cos_sim FROM sc
               ORDER BY cos_sim DESC, vec_id LIMIT 10),
    vec AS (SELECT vec_id AS doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id)
                        AS BIGINT) AS vec_rank
            FROM vectop),
    m AS (SELECT lex.doc_id, lex.lex_rank, vec.vec_rank
          FROM lex JOIN vec ON vec.doc_id = lex.doc_id),
    depths AS (SELECT * FROM (VALUES {_RBO_DEPTH_SQL}) AS t(d, w)),
    o AS (SELECT depths.d, depths.w,
                 CAST(COALESCE(SUM(CASE WHEN m.lex_rank <= depths.d
                                         AND m.vec_rank <= depths.d
                                        THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_overlap
          FROM depths LEFT JOIN m ON m.lex_rank <= depths.d
                                 AND m.vec_rank <= depths.d
          GROUP BY depths.d, depths.w),
    c AS (SELECT d, w, n_overlap,
                 w * (CAST(n_overlap AS DOUBLE) / d) AS contrib
          FROM o),
    t AS (SELECT CAST(SUM(CAST(contrib AS DECIMAL(27,18))) AS DOUBLE)
                   AS rbo_at_10 FROM c)
    SELECT c.d, c.n_overlap, c.w AS weight, c.contrib, t.rbo_at_10,
           t.rbo_at_10 / ('0.6513215599'::DOUBLE) AS rbo_norm
    FROM c CROSS JOIN t
    """,
)
def rbo_lex_vs_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-BIASED OVERLAP (Webber et al. 2010) between the BM25 lexical
    top-10 and the dense-cosine top-10 — the ranker-agreement eval run
    before committing to a fusion strategy (rbo_norm near 1 means the
    vector leg adds nothing to [[hybrid_rank_fusion]]; near 0 means the
    two see different corpora).  Per-depth agreement |A_d ∩ B_d| is an
    INTEGER; the geometric weights (1-p)p^(d-1), p=0.9, are shared
    Python-float literals; contributions are one float expression each
    and the truncated-RBO total is an exact DECIMAL sum of the 10
    contributions cast back to double.  Truncated RBO@10 maxes out at
    1-p^10 (identical rankings), so rbo_norm divides by that shared
    literal to land on the usual [0, 1] agreement scale.

    Scale shape: both candidate legs are bounded top-10s
    (TakeOrderedAndProject); every rank window runs over ≤10 rows, the
    depth table is a 10-row literal — nothing after the two corpus
    scans grows with the corpus."""
    from lvm_datapipe_spark.operators import ranking as RK
    from lvm_datapipe_spark.operators import similarity as V

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = (
        RK.ranked_topk(RK.bm25_scores(docs, _BM25_TERMS), "score", "doc_id", 10)
        .select("doc_id", F.col("rank").cast("long").alias("lex_rank"))
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(
            V.as_double("embedding").alias("qv")
        )
    )
    sc = (
        emb.crossJoin(q)
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            V.cosine(F.col("qv"), V.as_double("embedding")).alias("cos_sim"),
        )
    )
    vec = (
        RK.ranked_topk(sc, "cos_sim", "vec_id", 10)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("rank").cast("long").alias("vec_rank"),
        )
    )
    m = lex.join(vec, "doc_id")
    depths = spark.createDataFrame(_RBO_DEPTHS, "d long, w double")
    o = (
        F.broadcast(depths)
        .join(
            m,
            (F.col("lex_rank") <= F.col("d")) & (F.col("vec_rank") <= F.col("d")),
            "left",
        )
        .groupBy("d", "w")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("lex_rank") <= F.col("d"))
                        & (F.col("vec_rank") <= F.col("d")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_overlap")
        )
    )
    c = o.withColumn(
        "contrib", F.col("w") * (F.col("n_overlap").cast("double") / F.col("d"))
    )
    t = c.agg(
        F.sum(F.col("contrib").cast("decimal(27,18)"))
        .cast("double")
        .alias("rbo_at_10")
    )
    return c.crossJoin(F.broadcast(t)).select(
        "d",
        "n_overlap",
        F.col("w").alias("weight"),
        "contrib",
        "rbo_at_10",
        (F.col("rbo_at_10") / F.lit(0.6513215599)).alias("rbo_norm"),
    )


@_q(
    "events_poisson_rate_alarm",
    """
    WITH c AS (SELECT event_type,
                      CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                        AS day_id,
                      strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
               GROUP BY 1, 2, 3),
    w AS (SELECT event_type, day_id, day, n,
                 CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day_id
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
                   AS bsum,
                 CAST(COUNT(n) OVER (PARTITION BY event_type ORDER BY day_id
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
                   AS bn
          FROM c)
    SELECT event_type, day, n,
           CAST(bsum AS DOUBLE) / 7 AS lambda_hat,
           (CAST(n AS DOUBLE) - CAST(bsum AS DOUBLE) / 7)
             / sqrt(CAST(bsum AS DOUBLE) / 7) AS z,
           CASE WHEN (CAST(n AS DOUBLE) - CAST(bsum AS DOUBLE) / 7)
                     / sqrt(CAST(bsum AS DOUBLE) / 7) > 3.0
                  OR (CAST(n AS DOUBLE) - CAST(bsum AS DOUBLE) / 7)
                     / sqrt(CAST(bsum AS DOUBLE) / 7) < -3.0
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS alarm
    FROM w WHERE bn = 7 AND bsum > 0
    """,
)
def events_poisson_rate_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOLUME anomaly alarm: each day's event count per type against a
    Poisson rate estimated from the trailing 7 FULL days (rows with a
    short history are excluded, so the alarm never fires off a cold
    start).  z = (n - lambda) / sqrt(lambda) — the variance-stabilized
    residual for counts, where a plain value-z-score
    ([[events_zscore_outliers]]) would mis-model the mean-variance
    coupling.  Integer day counts; lambda and z are mirrored float
    expressions; |z| > 3 raises the alarm.

    Scale shape: one keyed daily aggregate, one type-partitioned ROWS
    window over day-count-sized data."""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day_id"),
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wnd = (
        Window.partitionBy("event_type")
        .orderBy("day_id")
        .rowsBetween(-7, -1)
    )
    w = c.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(wnd).cast("long").alias("bsum"),
        F.count("n").over(wnd).cast("long").alias("bn"),
    )
    lam = F.col("bsum").cast("double") / 7
    z = (F.col("n").cast("double") - lam) / F.sqrt(lam)
    return (
        w.filter((F.col("bn") == 7) & (F.col("bsum") > 0))
        .select(
            "event_type",
            "day",
            "n",
            lam.alias("lambda_hat"),
            z.alias("z"),
            F.when((z > 3.0) | (z < -3.0), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("alarm"),
        )
    )


_RFM_HI_PS = [0.8, 0.6, 0.4, 0.2]


@_q(
    "rfm_segments",
    f"""
    WITH c AS (SELECT o_custkey,
                      CAST(max(o_orderdate) AS DATE) AS last_order,
                      CAST(count(*) AS BIGINT) AS frequency,
                      {_DEC_SUM.format(x='o_totalprice')} AS monetary
               FROM orders GROUP BY o_custkey),
    mx AS (SELECT CAST(max(o_orderdate) AS DATE) AS ref_day FROM orders),
    r AS (SELECT c.o_custkey,
                 CAST(mx.ref_day - c.last_order AS BIGINT) AS recency_days,
                 c.frequency, c.monetary
          FROM c CROSS JOIN mx),
    q AS (SELECT quantile_cont(recency_days, {_RFM_HI_PS}) AS rt,
                 quantile_cont(frequency, {_RFM_HI_PS}) AS ft,
                 quantile_cont(monetary, {_RFM_HI_PS}) AS mt
          FROM r),
    s AS (SELECT r.o_custkey, r.recency_days, r.frequency, r.monetary,
                 CAST(1 + {' + '.join(f'(CASE WHEN CAST(r.recency_days AS DOUBLE) < q.rt[{i + 1}] THEN 1 ELSE 0 END)' for i in range(4))}
                      AS BIGINT) AS r_score,
                 CAST(1 + {' + '.join(f'(CASE WHEN CAST(r.frequency AS DOUBLE) > q.ft[{i + 1}] THEN 1 ELSE 0 END)' for i in range(4))}
                      AS BIGINT) AS f_score,
                 CAST(1 + {' + '.join(f'(CASE WHEN r.monetary > q.mt[{i + 1}] THEN 1 ELSE 0 END)' for i in range(4))}
                      AS BIGINT) AS m_score
          FROM r CROSS JOIN q)
    SELECT o_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS rfm
    FROM s
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the classic customer-value stratification:
    recency (days since last order, lower is better), frequency (order
    count), monetary (exact decimal revenue), each scored 1-5 against
    quintile boundaries from ONE exact-percentile aggregate broadcast
    back over the customer table (the [[w5_deciles_bucketed]] ladder —
    no global NTILE window).  Recency's ladder is inverted (< the
    descending thresholds) so 5 always means "best".  The composite rfm
    code (r*100+f*10+m) is the segment key marketing pipelines group
    by.

    Scale shape: one customer-keyed aggregate, a 1-row quantile
    broadcast, a scan-shaped ladder — no window over corpus rows."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        A.decimal_sum("o_totalprice").alias("monetary"),
    )
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("ref_day"))
    r = c.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        F.datediff("ref_day", "last_order").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    ps = F.lit(_RFM_HI_PS)
    q = r.agg(
        F.percentile(F.col("recency_days").cast("double"), ps).alias("rt"),
        F.percentile(F.col("frequency").cast("double"), ps).alias("ft"),
        F.percentile("monetary", ps).alias("mt"),
    )
    rs, fs, ms = F.lit(1), F.lit(1), F.lit(1)
    for i in range(4):
        rs = rs + (
            F.col("recency_days").cast("double") < F.element_at("rt", i + 1)
        ).cast("int")
        fs = fs + (
            F.col("frequency").cast("double") > F.element_at("ft", i + 1)
        ).cast("int")
        ms = ms + (F.col("monetary") > F.element_at("mt", i + 1)).cast("int")
    s = r.crossJoin(F.broadcast(q)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        rs.cast("long").alias("r_score"),
        fs.cast("long").alias("f_score"),
        ms.cast("long").alias("m_score"),
    )
    return s.select(
        "*",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).alias("rfm"),
    )


@_q(
    "dispersion_lineitems_per_order",
    """
    WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
               FROM lineitem GROUP BY l_orderkey),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(k) AS BIGINT) AS sx,
                 CAST(sum(k * k) AS BIGINT) AS sxx
          FROM c)
    SELECT n, sx, sxx,
           CAST(sx AS DOUBLE) / n AS mean_k,
           (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_k,
           ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             / (CAST(sx AS DOUBLE) / n) AS dispersion_index
    FROM a
    """,
)
def dispersion_lineitems_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX OF DISPERSION (variance-to-mean ratio) of lineitems per
    order — the one-number Poissonness check on a count distribution:
    ~1 means orders accumulate items independently, >1 means bursty
    (a generator or upstream batching artifact), <1 means capped.
    All moments are exact BIGINT sums (population variance via
    n*Σk² - (Σk)²); the three output ratios are mirrored float
    expressions.

    Scale shape: one keyed count + one 1-row moment aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).cast("long").alias("k"))
    a = c.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("sx"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    var_k = (nd * F.col("sxx") - sxd * sxd) / (nd * nd)
    return a.select(
        "n",
        "sx",
        "sxx",
        (sxd / F.col("n")).alias("mean_k"),
        var_k.alias("var_k"),
        (var_k / (sxd / F.col("n"))).alias("dispersion_index"),
    )


@_q(
    "parts_in_all_regions",
    """
    WITH pr AS (SELECT DISTINCT l.l_partkey AS partkey, n.n_regionkey AS rk
                FROM lineitem l
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_regions FROM region),
    c AS (SELECT partkey, CAST(count(*) AS BIGINT) AS n_covered
          FROM pr GROUP BY partkey)
    SELECT c.partkey AS p_partkey, p.p_name, c.n_covered
    FROM c CROSS JOIN t
    JOIN part p ON p.p_partkey = c.partkey
    WHERE c.n_covered = t.n_regions
    """,
)
def parts_in_all_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIONAL DIVISION (the FOR-ALL query): parts that have shipped
    from suppliers in EVERY region — the classic universal
    quantification no join alone expresses, reduced to counting:
    distinct (part, region) coverage == |regions|.  The division-by-
    counting form is the only one that scales (the textbook double
    NOT-EXISTS nests two anti-joins per row).

    Scale shape: lineitem joins two broadcast dims, one distinct + one
    keyed count, a 1-row region-count broadcast, and a final keyed join
    to part for the name."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    pa = load_table(spark, sf_dir, "part")
    pr = (
        li.join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey").alias("partkey"), F.col("n_regionkey").alias("rk"))
        .dropDuplicates()
    )
    t = re.agg(F.count(F.lit(1)).cast("long").alias("n_regions"))
    c = pr.groupBy("partkey").agg(F.count(F.lit(1)).cast("long").alias("n_covered"))
    return (
        c.crossJoin(F.broadcast(t))
        .filter(F.col("n_covered") == F.col("n_regions"))
        .join(pa, F.col("partkey") == F.col("p_partkey"))
        .select(F.col("partkey").alias("p_partkey"), "p_name", "n_covered")
    )


_WILSON_Z = 1.96
_WILSON_Z2 = 3.8415999999999997


@_q(
    "conversion_wilson_ci",
    f"""
    WITH d AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                      CAST(SUM(CASE WHEN event_type IN ('view', 'purchase')
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_trials,
                      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                               END) AS BIGINT) AS n_purchases
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    p AS (SELECT day, n_trials, n_purchases,
                 CAST(n_purchases AS DOUBLE) / n_trials AS phat,
                 CAST(n_trials AS DOUBLE) AS nd
          FROM d WHERE n_trials > 0)
    SELECT day, n_trials, n_purchases, phat,
           ((phat + '{_WILSON_Z2!r}'::DOUBLE / (2 * nd))
            - '{_WILSON_Z!r}'::DOUBLE
              * sqrt((phat * (1.0 - phat)) / nd
                     + '{_WILSON_Z2!r}'::DOUBLE / (4 * nd * nd)))
           / (1.0 + '{_WILSON_Z2!r}'::DOUBLE / nd) AS wilson_low,
           ((phat + '{_WILSON_Z2!r}'::DOUBLE / (2 * nd))
            + '{_WILSON_Z!r}'::DOUBLE
              * sqrt((phat * (1.0 - phat)) / nd
                     + '{_WILSON_Z2!r}'::DOUBLE / (4 * nd * nd)))
           / (1.0 + '{_WILSON_Z2!r}'::DOUBLE / nd) AS wilson_high
    FROM p
    """,
)
def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase share of view+purchase traffic with WILSON score
    intervals
    (z=1.96) — the small-sample-safe CI every KPI dashboard should use
    instead of the normal approximation (which goes negative near 0 and
    lies at small n).  Counts are integers; phat and both bounds are
    mirrored float expression trees with z and z^2 as shared Python
    literals.

    Scale shape: one day-keyed conditional aggregate + scan-shaped
    arithmetic on the day-count-sized result."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.sum(
                F.when(F.col("event_type").isin("view", "purchase"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_trials"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
        )
        .filter(F.col("n_trials") > 0)
    )
    nd = F.col("n_trials").cast("double")
    phat = F.col("n_purchases").cast("double") / F.col("n_trials")
    z, z2 = F.lit(_WILSON_Z), F.lit(_WILSON_Z2)
    center = phat + z2 / (2 * nd)
    half = z * F.sqrt((phat * (1.0 - phat)) / nd + z2 / (4 * nd * nd))
    denom = 1.0 + z2 / nd
    return d.select(
        "day",
        "n_trials",
        "n_purchases",
        phat.alias("phat"),
        ((center - half) / denom).alias("wilson_low"),
        ((center + half) / denom).alias("wilson_high"),
    )


@_q(
    "events_peak_hours_nms",
    """
    WITH h AS (SELECT event_type,
                      CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600)
                           AS BIGINT) AS hr_id,
                      strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
                      CAST(count(*) AS BIGINT) AS n
               FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
               GROUP BY 1, 2, 3),
    w AS (SELECT event_type, hr_id, hour, n,
                 COALESCE(MAX(n) OVER (PARTITION BY event_type ORDER BY hr_id
                          ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING),
                          CAST(-1 AS BIGINT)) AS prev_max,
                 COALESCE(MAX(n) OVER (PARTITION BY event_type ORDER BY hr_id
                          ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING),
                          CAST(-1 AS BIGINT)) AS next_max
          FROM h),
    pk AS (SELECT event_type, hr_id, hour, n FROM w
           WHERE n > prev_max AND n > next_max),
    r AS (SELECT event_type, hour, n,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                      ORDER BY n DESC, hr_id) AS BIGINT) AS peak_rank
          FROM pk)
    SELECT event_type, hour, n, peak_rank FROM r WHERE peak_rank <= 5
    """,
)
def events_peak_hours_nms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK DETECTION with non-maximum suppression: hours that are
    STRICT local maxima of the per-type hourly series within a +-2h
    neighborhood, ranked to the top 5 per type — the load-spike report
    that a plain top-k-by-count gets wrong (it returns 5 adjacent hours
    of one spike; NMS forces distinct peaks).  Strict > on both sides
    means plateaus yield no peak (documented; a plateau is a sustained
    level, not a spike).  Integer counts throughout.

    Scale shape: one keyed hourly aggregate, two type-partitioned ROWS
    windows, and a WindowGroupLimit-able top-5 per type."""
    ev = load_table(spark, sf_dir, "events")
    hr_id = F.floor(
        F.unix_seconds(F.col("ts").cast("timestamp")).cast("long") / 3600
    ).cast("long")
    h = (
        ev.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            hr_id.alias("hr_id"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias(
                "hour"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wp = Window.partitionBy("event_type").orderBy("hr_id").rowsBetween(-2, -1)
    wn = Window.partitionBy("event_type").orderBy("hr_id").rowsBetween(1, 2)
    w = h.select(
        "event_type",
        "hr_id",
        "hour",
        "n",
        F.coalesce(F.max("n").over(wp), F.lit(-1).cast("long")).alias("prev_max"),
        F.coalesce(F.max("n").over(wn), F.lit(-1).cast("long")).alias("next_max"),
    )
    pk = w.filter((F.col("n") > F.col("prev_max")) & (F.col("n") > F.col("next_max")))
    wr = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("hr_id"))
    r = pk.select(
        "event_type",
        "hour",
        "n",
        F.row_number().over(wr).cast("long").alias("peak_rank"),
    )
    return r.filter(F.col("peak_rank") <= 5)


@_q(
    "set_intersect_all",
    """
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each part key appears
    min(count_R, count_N) times — the multiplicity-preserving sibling
    of [[set_intersect]] that SQL workloads need when downstream
    aggregation weights by occurrence.  Uses Spark's native
    ``intersectAll`` (hash-partial counts on each side, LEAST of the
    multiplicities — one keyed shuffle per side, no row explosion
    beyond the answer).

    Scale shape: two filtered scans + one keyed intersect shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    n = li.filter(F.col("l_returnflag") == "N").select("l_partkey")
    return r.intersectAll(n)


@_q(
    "grpo_group_advantages",
    """
    WITH e AS (SELECT event_id, user_id,
                      strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                      value AS reward
               FROM events
               WHERE ts IS NOT NULL AND user_id IS NOT NULL
                 AND value IS NOT NULL),
    g AS (SELECT user_id, day,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(reward AS DECIMAL(27,6))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(reward AS DECIMAL(27,6))
                          * CAST(reward AS DECIMAL(27,6))) AS DOUBLE) AS sxx
          FROM e GROUP BY user_id, day),
    j AS (SELECT e.event_id, e.user_id, e.day, e.reward, g.n,
                 g.sx / g.n AS mean_r,
                 (CAST(g.n AS DOUBLE) * g.sxx - g.sx * g.sx)
                   / (CAST(g.n AS DOUBLE) * (CAST(g.n AS DOUBLE) - 1.0))
                   AS var_r
          FROM e JOIN g ON g.user_id = e.user_id AND g.day = e.day
          WHERE g.n > 1)
    SELECT event_id, user_id, day, reward, n, mean_r,
           CASE WHEN var_r > 0
                THEN (reward - mean_r) / sqrt(var_r)
                ELSE CAST(0.0 AS DOUBLE) END AS advantage
    FROM j
    """,
)
def grpo_group_advantages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRPO-style GROUP-RELATIVE ADVANTAGES (Shao et al. 2024,
    arXiv:2402.03300 — the DeepSeekMath policy-gradient recipe): within
    each sampling group (here user x day standing in for
    prompt x rollout-batch), every reward is normalized to
    (r - group_mean) / group_std — the advantage signal RLHF training
    data carries instead of raw rewards.  Group moments come from exact
    DECIMAL sums (order-free partials); mean/variance/z are mirrored
    float expressions with the sample-variance (n-1) denominator;
    zero-variance groups emit advantage 0 (every rollout equal — no
    gradient signal), and singleton groups are excluded (no baseline).

    Scale shape: one keyed moment aggregate + one keyed join back —
    the standard two-pass normalize, no window."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "event_id",
        "user_id",
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        F.col("value").alias("reward"),
    )
    dec = F.col("reward").cast("decimal(27,6)")
    g = e.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    mean_r = F.col("sx") / F.col("n")
    var_r = (nd * F.col("sxx") - F.col("sx") * F.col("sx")) / (nd * (nd - 1.0))
    j = (
        e.join(g, ["user_id", "day"])
        .filter(F.col("n") > 1)
        .withColumn("mean_r", mean_r)
        .withColumn("var_r", var_r)
    )
    return j.select(
        "event_id",
        "user_id",
        "day",
        "reward",
        "n",
        "mean_r",
        F.when(
            F.col("var_r") > 0,
            (F.col("reward") - F.col("mean_r")) / F.sqrt("var_r"),
        )
        .otherwise(F.lit(0.0))
        .alias("advantage"),
    )


@_q(
    "split_leakage_measure",
    f"""
    WITH RECURSIVE pairs AS ({_lsh_near_dup_sql()}),
    edges AS (SELECT id_a AS u, id_b AS w FROM pairs
              UNION SELECT id_b AS u, id_a AS w FROM pairs),
    reach AS (SELECT u, w FROM edges
              UNION SELECT r.u AS u, e2.w AS w
              FROM reach r JOIN edges e2 ON r.w = e2.u),
    cc AS (SELECT u AS id, least(u, min(w)) AS cluster_id FROM reach GROUP BY u),
    keyed AS (
      SELECT e.vec_id, coalesce(cc.cluster_id, e.vec_id) AS skey
      FROM embeddings e LEFT JOIN cc ON cc.id = e.vec_id),
    s AS (SELECT vec_id,
            CASE WHEN ('0x' || substr(md5('split' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
                      % 10000 < 9000 THEN 'train' ELSE 'holdout' END AS naive_split,
            CASE WHEN ('0x' || substr(md5('split' || CAST(skey AS VARCHAR)), 1, 8))::BIGINT
                      % 10000 < 9000 THEN 'train' ELSE 'holdout' END AS safe_split
          FROM keyed),
    p AS (SELECT sa.naive_split AS na, sb.naive_split AS nb,
                 sa.safe_split AS fa, sb.safe_split AS fb
          FROM pairs pr
          JOIN s sa ON sa.vec_id = pr.id_a
          JOIN s sb ON sb.vec_id = pr.id_b)
    SELECT 'naive' AS scheme,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
           CASE WHEN count(*) > 0
                THEN CAST(SUM(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*)
                ELSE CAST(0.0 AS DOUBLE) END AS leak_rate
    FROM p
    UNION ALL
    SELECT 'cluster_safe',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN fa <> fb THEN 1 ELSE 0 END) AS BIGINT),
           CASE WHEN count(*) > 0
                THEN CAST(SUM(CASE WHEN fa <> fb THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*)
                ELSE CAST(0.0 AS DOUBLE) END
    FROM p
    """,
)
def split_leakage_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURE the eval-leakage a naive row-id split causes: for every
    LSH-verified near-dup pair, does the pair straddle train/holdout?
    Reported for BOTH schemes — the naive md5(vec_id) split (leaks: two
    near-identical vectors land on opposite sides and the holdout stops
    being held out) and the cluster-keyed split of
    [[split_leakage_safe]] (structurally 0 cross pairs: both members
    share the cluster representative key).  This is the number that
    justifies paying for dedup-aware splitting — measured on YOUR
    corpus, not argued.

    Scale shape: the pair source is the bucketed LSH path, clustering
    is the iterative CC operator, splits are scan-shaped md5 buckets;
    the measure itself is two keyed joins + one aggregate."""
    from lvm_datapipe_spark.operators import similarity as V
    from lvm_datapipe_spark.operators.graph import connected_components
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4).persist()
    cc = connected_components(pairs)
    keyed = emb.join(
        cc.withColumnRenamed("id", "vec_id"), "vec_id", "left"
    ).select("vec_id", F.coalesce("cluster_id", "vec_id").alias("skey"))
    s = keyed.select(
        "vec_id",
        F.when(hash_bucket("vec_id", salt="split") < 9000, "train")
        .otherwise("holdout")
        .alias("naive_split"),
        F.when(hash_bucket("skey", salt="split") < 9000, "train")
        .otherwise("holdout")
        .alias("safe_split"),
    )
    sa = s.select(
        F.col("vec_id").alias("id_a"),
        F.col("naive_split").alias("na"),
        F.col("safe_split").alias("fa"),
    )
    sb = s.select(
        F.col("vec_id").alias("id_b"),
        F.col("naive_split").alias("nb"),
        F.col("safe_split").alias("fb"),
    )
    p = pairs.join(sa, "id_a").join(sb, "id_b")

    def scheme(label, a, b):
        cross = F.sum(F.when(F.col(a) != F.col(b), 1).otherwise(0)).cast("long")
        return p.agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            cross.alias("n_cross"),
        ).select(
            F.lit(label).alias("scheme"),
            "n_pairs",
            "n_cross",
            F.when(
                F.col("n_pairs") > 0,
                F.col("n_cross").cast("double") / F.col("n_pairs"),
            )
            .otherwise(F.lit(0.0))
            .alias("leak_rate"),
        )

    return scheme("naive", "na", "nb").unionAll(
        scheme("cluster_safe", "fa", "fb")
    )


@_q(
    "dedup_threshold_sweep",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= 1000),
    exk AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN keep USING (shingle)),
    sz AS (SELECT doc_id, CAST(len(s) AS INTEGER) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM exk a JOIN exk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    j AS (SELECT n_common / (sa.n + sb.n - n_common) AS jac
          FROM inter
          JOIN sz sa ON sa.doc_id = id_a
          JOIN sz sb ON sb.doc_id = id_b),
    b AS (SELECT CASE WHEN jac >= 0.9 THEN '0.9-1.0'
                      WHEN jac >= 0.8 THEN '0.8-0.9'
                      WHEN jac >= 0.7 THEN '0.7-0.8'
                      WHEN jac >= 0.6 THEN '0.6-0.7'
                      WHEN jac >= 0.5 THEN '0.5-0.6'
                      WHEN jac >= 0.4 THEN '0.4-0.5'
                      WHEN jac >= 0.3 THEN '0.3-0.4'
                      WHEN jac >= 0.2 THEN '0.2-0.3'
                      ELSE '0.0-0.2' END AS band
          FROM j)
    SELECT band, CAST(count(*) AS BIGINT) AS n_pairs
    FROM b GROUP BY band
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THRESHOLD SWEEP for the n-gram Jaccard deduper: the pair-count
    histogram by similarity band — the decision-support readout that
    picks the dedup threshold (a cliff between bands marks the
    natural boundary between near-dups and topical overlap; setting
    0.6 blind is guessing).  One run of the capped intersection kernel
    scores EVERY candidate pair once; the banding is a CASE ladder, so
    sweeping thresholds costs one query, not one dedup run per
    candidate threshold.

    Scale shape: identical to [[dedup_ngram_jaccard]] minus the final
    filter — the cap bounds every posting list; output is ≤9 rows."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    cached = D.shingle_rows(docs).persist()
    sizes = cached.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = D.shingle_intersections(cached, "doc_id", 1000)
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    j = inter.join(sa, "id_a").join(sb, "id_b").select(jac.alias("jac"))
    band = (
        F.when(F.col("jac") >= 0.9, "0.9-1.0")
        .when(F.col("jac") >= 0.8, "0.8-0.9")
        .when(F.col("jac") >= 0.7, "0.7-0.8")
        .when(F.col("jac") >= 0.6, "0.6-0.7")
        .when(F.col("jac") >= 0.5, "0.5-0.6")
        .when(F.col("jac") >= 0.4, "0.4-0.5")
        .when(F.col("jac") >= 0.3, "0.3-0.4")
        .when(F.col("jac") >= 0.2, "0.2-0.3")
        .otherwise("0.0-0.2")
    )
    out = (
        j.select(band.alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    return _with_cached_deps(out, [cached])


@_q(
    "source_distinctive_terms",
    rf"""
    WITH toks AS (SELECT source, unnest({_SQL_TOKS}) AS tok
                  FROM documents WHERE source IS NOT NULL),
    st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS a
           FROM toks GROUP BY source, tok),
    ssz AS (SELECT source, CAST(sum(a) AS BIGINT) AS s_total FROM st
            GROUP BY source),
    ct AS (SELECT tok, CAST(sum(a) AS BIGINT) AS b FROM st GROUP BY tok),
    t AS (SELECT CAST(sum(a) AS BIGINT) AS d_total FROM st),
    l AS (SELECT st.source, st.tok, st.a,
                 (CAST(st.a AS DOUBLE) * t.d_total)
                   / (CAST(ct.b AS DOUBLE) * ssz.s_total) AS lift
          FROM st
          JOIN ssz ON ssz.source = st.source
          JOIN ct ON ct.tok = st.tok
          CROSS JOIN t
          WHERE st.a >= 5),
    r AS (SELECT source, tok, a, lift,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY lift DESC, tok) AS BIGINT) AS rnk
          FROM l)
    SELECT source, tok, a AS n_occurrences, lift, rnk
    FROM r WHERE rnk <= 5
    """,
)
def source_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCTIVE TERMS per source by rate lift — the interpretable
    "what makes this feed different" diagnostic: lift = (term rate in
    source) / (term rate in corpus), top-5 per source with a min-count
    floor of 5 (rare-token lifts are noise).  Rate ratio instead of
    log-odds keeps it a single float expression over exact integer
    counts — no cross-engine log.

    Scale shape: one (source, token) aggregate; the corpus term table
    joins keyed on token; top-5 per source is a WindowGroupLimit-able
    source-partitioned rank."""
    from lvm_datapipe_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.filter(F.col("source").isNotNull())
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
    )
    ssz = st.groupBy("source").agg(F.sum("a").cast("long").alias("s_total"))
    ct = st.groupBy("tok").agg(F.sum("a").cast("long").alias("b"))
    t = st.agg(F.sum("a").cast("long").alias("d_total"))
    lift = (F.col("a").cast("double") * F.col("d_total")) / (
        F.col("b").cast("double") * F.col("s_total")
    )
    l = (
        st.filter(F.col("a") >= 5)
        .join(F.broadcast(ssz), "source")
        .join(ct, "tok")
        .crossJoin(F.broadcast(t))
        .select("source", "tok", "a", lift.alias("lift"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("lift"), F.asc("tok"))
    r = l.select(
        "source", "tok", "a", "lift", F.row_number().over(w).cast("long").alias("rnk")
    )
    return r.filter(F.col("rnk") <= 5).select(
        "source", "tok", F.col("a").alias("n_occurrences"), "lift", "rnk"
    )


@_q(
    "embedding_centroid_drift",
    """
    WITH ex AS (
      SELECT label, vec_id % 2 AS half, u.pos AS pos,
             embedding[u.pos]::DOUBLE AS x
      FROM embeddings
      CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) u
      WHERE embedding IS NOT NULL AND label IS NOT NULL),
    g AS (SELECT label, half, pos,
                 CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DECIMAL(18,6)) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM ex GROUP BY label, half, pos),
    p AS (SELECT label, pos,
                 MAX(CASE WHEN half = 0 THEN s END) AS s0,
                 MAX(CASE WHEN half = 1 THEN s END) AS s1,
                 MAX(CASE WHEN half = 0 THEN n END) AS n0,
                 MAX(CASE WHEN half = 1 THEN n END) AS n1
          FROM g GROUP BY label, pos),
    a AS (SELECT label,
                 SUM(s0 * s1) AS dot,
                 SUM(s0 * s0) AS sq0,
                 SUM(s1 * s1) AS sq1,
                 CAST(MIN(n0) AS BIGINT) AS n_half0,
                 CAST(MIN(n1) AS BIGINT) AS n_half1
          FROM p WHERE s0 IS NOT NULL AND s1 IS NOT NULL
          GROUP BY label)
    SELECT label, n_half0, n_half1,
           CASE WHEN CAST(sq0 AS DOUBLE) > 0 AND CAST(sq1 AS DOUBLE) > 0
                THEN CAST(dot AS DOUBLE)
                     / (sqrt(CAST(sq0 AS DOUBLE)) * sqrt(CAST(sq1 AS DOUBLE)))
                ELSE NULL END AS centroid_cosine
    FROM a
    """,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING DRIFT monitor: per label, the cosine between the class
    centroid of one half of the corpus (even vec_ids) and the other
    half (odd) — an A/A-style self-consistency readout whose value near
    1 calibrates what "no drift" looks like before pointing the same
    query at yesterday-vs-today partitions.  The trick making it
    oracle-exact: cosine is SCALE-INVARIANT, so it is computed on the
    un-normalized per-dimension DECIMAL sums (never dividing by counts)
    — dot and both squared norms stay exact decimals through every
    partial aggregation, and the only float ops are three casts, two
    sqrts, one division.

    Scale shape: posexplode to (label, half, pos) rows, two keyed
    aggregates over a |labels| x 2 x 64 key space — no whole vector
    crosses a shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = (
        emb.filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .select(
            "label",
            (F.col("vec_id") % 2).alias("half"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos0", "x"
            ),
        )
        .select("label", "half", (F.col("pos0") + 1).alias("pos"), "x")
    )
    g = ex.groupBy("label", "half", "pos").agg(
        F.sum(F.col("x").cast("decimal(27,6)"))
        .cast("decimal(18,6)")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    p = g.groupBy("label", "pos").agg(
        F.max(F.when(F.col("half") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("half") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("half") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("half") == 1, F.col("n"))).alias("n1"),
    )
    a = (
        p.filter(F.col("s0").isNotNull() & F.col("s1").isNotNull())
        .groupBy("label")
        .agg(
            F.sum(F.col("s0") * F.col("s1")).alias("dot"),
            F.sum(F.col("s0") * F.col("s0")).alias("sq0"),
            F.sum(F.col("s1") * F.col("s1")).alias("sq1"),
            F.min("n0").cast("long").alias("n_half0"),
            F.min("n1").cast("long").alias("n_half1"),
        )
    )
    sq0d = F.col("sq0").cast("double")
    sq1d = F.col("sq1").cast("double")
    return a.select(
        "label",
        "n_half0",
        "n_half1",
        F.when(
            (sq0d > 0) & (sq1d > 0),
            F.col("dot").cast("double") / (F.sqrt(sq0d) * F.sqrt(sq1d)),
        ).alias("centroid_cosine"),
    )


@_q(
    "events_cusum_shift",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hour),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS total
      FROM hourly GROUP BY event_type),
    d AS (
      SELECT h.event_type, h.hour, t.n, t.n * h.c - t.total AS dev
      FROM hourly h JOIN tot t USING (event_type)),
    cu AS (
      SELECT event_type, hour, n,
             SUM(dev) OVER w AS cum
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    s AS (
      SELECT event_type, hour, n,
             cum - MIN(cum) OVER w AS s_up,
             MAX(cum) OVER w - cum AS s_dn
      FROM cu
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    r AS (
      SELECT event_type, hour, n, s_up, s_dn,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY s_up DESC, hour ASC) AS r_up,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY s_dn DESC, hour ASC) AS r_dn
      FROM s)
    SELECT u.event_type,
           u.hour AS up_peak_hour,
           CAST(u.s_up AS DOUBLE) / u.n AS up_peak_cusum,
           v.hour AS down_peak_hour,
           CAST(v.s_dn AS DOUBLE) / v.n AS down_peak_cusum
    FROM (SELECT * FROM r WHERE r_up = 1) u
    JOIN (SELECT * FROM r WHERE r_dn = 1) v USING (event_type)
    """,
)
def events_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detection over the hourly event-rate series, per
    event type: where is the strongest evidence of an upward (and
    downward) shift away from the series mean?  The textbook recursion
    S_t = max(0, S_{t-1} + y_t) is NOT window-expressible -- but it has
    an exact closed form: with C_t = cumsum(y), S_t = C_t - min_{j<=t}
    C_j (and the downward side is the mirror against the running max).
    That identity turns a stateful scan into two plain window functions.
    Exactness: deviations are pre-scaled by n (dev = n*count - total, an
    integer) so the mean subtraction never leaves integer arithmetic;
    the ONLY float op is the final rescale S/n.

    Scale shape: one (type, hour) aggregate, then windows partitioned by
    event_type over an |hours|-sized series per type -- bounded keys, no
    corpus-row window, no fan-out."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("total"),
    )
    d = hourly.join(tot, "event_type").select(
        "event_type",
        "hour",
        "n",
        (F.col("n") * F.col("c") - F.col("total")).alias("dev"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cu = d.select(
        "event_type", "hour", "n", F.sum("dev").over(w).alias("cum")
    )
    s = cu.select(
        "event_type",
        "hour",
        "n",
        (F.col("cum") - F.min("cum").over(w)).alias("s_up"),
        (F.max("cum").over(w) - F.col("cum")).alias("s_dn"),
    )
    r = s.select(
        "event_type",
        "hour",
        "n",
        "s_up",
        "s_dn",
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.desc("s_up"), F.asc("hour")
            )
        )
        .alias("r_up"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.desc("s_dn"), F.asc("hour")
            )
        )
        .alias("r_dn"),
    )
    up = r.filter(F.col("r_up") == 1).select(
        "event_type",
        F.col("hour").alias("up_peak_hour"),
        (F.col("s_up").cast("double") / F.col("n")).alias("up_peak_cusum"),
    )
    dn = r.filter(F.col("r_dn") == 1).select(
        "event_type",
        F.col("hour").alias("down_peak_hour"),
        (F.col("s_dn").cast("double") / F.col("n")).alias("down_peak_cusum"),
    )
    return up.join(dn, "event_type").select(
        "event_type",
        "up_peak_hour",
        "up_peak_cusum",
        "down_peak_hour",
        "down_peak_cusum",
    )


@_q(
    "user_streak_histogram",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    numbered AS (
      SELECT user_id,
             (d - DATE '1970-01-01')
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days),
    streaks AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak_len
      FROM numbered GROUP BY user_id, grp),
    longest AS (
      SELECT user_id, MAX(streak_len) AS longest_streak
      FROM streaks GROUP BY user_id)
    SELECT longest_streak, CAST(count(*) AS BIGINT) AS n_users
    FROM longest GROUP BY longest_streak
    """,
)
def user_streak_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, reported as a
    histogram (streak length -> user count) -- the standard engagement /
    habit-formation readout.  Gaps-and-islands: consecutive calendar
    days share a constant (epoch_day - row_number) group key, so runs
    fall out of one window plus one aggregate.  All-integer end to end.

    Scale shape: distinct (user, day) prunes to at most users x days
    rows; the window partitions by user over day counts (bounded per
    user); final histogram is a tiny keyed aggregate."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    numbered = days.select(
        "user_id",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = numbered.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak")
    )
    return longest.groupBy("longest_streak").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@_q(
    "session_bounce_stats",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM flagged),
    per_session AS (
      SELECT user_id, session_id,
             CAST(count(*) AS BIGINT) AS n_events,
             MIN(ts ORDER BY ts, event_id) AS s_start,
             FIRST(event_type ORDER BY ts, event_id) AS entry_type
      FROM sessions GROUP BY user_id, session_id)
    SELECT entry_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS bounce_rate,
           CAST(SUM(n_events) AS DOUBLE) / count(*) AS events_per_session
    FROM per_session GROUP BY entry_type
    """,
)
def session_bounce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce-rate and depth by session ENTRY event type: sessionize on
    the 30-minute inactivity gap (the w3_sessionize kernel), take each
    session's first event type as its entry page, then report sessions /
    bounces (single-event sessions) / bounce rate / mean events per
    session for each entry type -- the which-landing-flow-loses-people
    readout.  Counters stay integer; the two rates are single final
    divisions of exact BIGINTs.

    Scale shape: one user-partitioned window pass (same as w3), one
    (user, session) aggregate, one tiny per-type aggregate.  The entry
    type uses min_by on the (ts, event_id) total order -- no second
    window pass over the corpus."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum(F.col("is_new").cast("long")).over(w)
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min_by(
            "event_type", F.struct(F.col("ts"), F.col("event_id"))
        ).alias("entry_type"),
    )
    bounce = F.sum(
        F.when(F.col("n_events") == 1, 1).otherwise(0).cast("long")
    )
    return per_session.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        bounce.cast("long").alias("n_bounce"),
        (bounce.cast("double") / F.count(F.lit(1))).alias("bounce_rate"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias(
            "events_per_session"
        ),
    )


def _pctile_mirror_sql(arr: str, n: str, f: float) -> str:
    """DuckDB expression replicating Spark's ``percentile`` interpolation
    BIT-EXACTLY: with pos = f*(n-1), lower = floor(pos), higher =
    ceil(pos), Spark computes ``lo*(higher - pos) + hi*(pos - lower)``
    (sql/catalyst Percentile.getPercentile).  DuckDB's ``quantile_cont``
    rounds differently (measured: f=0.7 over the events values gives
    58.87 vs 58.86999999999999), and the third textbook form
    ``lo + d*(hi - lo)`` differs from BOTH on other rows -- the only
    safe oracle is this verbatim mirror -- INCLUDING Spark's
    duplicate-run short-circuit (when the two bracketing values are
    equal it returns the value directly instead of computing
    v*(a) + v*(b) with a+b only approximately 1).  Medians (d = 0, or d = 0.5
    over integer-valued data) agree under every form, which is why the
    legacy median oracles hold.  ``arr`` must be a sorted list
    expression, ``n`` its length."""
    pos = f"(('{f!r}'::DOUBLE) * ({n} - 1))"
    ki = f"CAST(floor({pos}) AS BIGINT)"
    kd = f"floor({pos})"
    lo = f"CAST({arr}[{ki} + 1] AS DOUBLE)"
    hi = f"CAST({arr}[{ki} + 2] AS DOUBLE)"
    return (
        f"(CASE WHEN {pos} = {kd} OR {lo} = {hi} THEN {lo} "
        f"ELSE {lo} * (({kd} + 1.0) - {pos}) + {hi} * ({pos} - {kd}) END)"
    )


@_q(
    "orders_pareto_skyline",
    """
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM orders d
      WHERE d.o_totalprice >= o.o_totalprice
        AND d.o_orderdate >= o.o_orderdate
        AND (d.o_totalprice > o.o_totalprice
             OR d.o_orderdate > o.o_orderdate))
    """,
)
def orders_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto frontier) operator: orders not dominated on
    (o_totalprice, o_orderdate) -- no other order is at least as
    high-value AND at least as recent with a strict improvement in one
    dimension.  The ORACLE is the textbook NOT EXISTS dominance
    definition (independent of the plan, the strongest pairing); the
    Spark plan is a BUCKETED distributed skyline that never builds a
    pair product:

      1. bucket rows by price range (256 order-preserving width buckets
         -- any row in a higher bucket has strictly higher price);
      2. per-bucket max date -> a 256-row summary; strict-higher-bucket
         running max via a broadcast B x B self-join (window-free);
      3. CROSS-BUCKET PRUNE: drop every row whose date <= the max date
         of any higher-priced bucket (dominated by construction) --
         survivors per bucket are skyline candidates only;
      4. exact within-bucket pass over the pruned remainder: per-price
         max date + a bucket-PARTITIONED strict-higher-price window.

    All comparisons are on raw column values; the only float math is the
    shared bucket formula ((price-lo)/(hi-lo)*256, identical association
    both engines).  Scale shape: one scan, one bucket-keyed aggregate,
    one broadcast of a fixed-size summary, windows partitioned by
    bucket over PRUNED rows -- no global sort, no SinglePartition
    window, no cartesian."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return R.pareto_skyline_2d(o, "o_totalprice", "o_orderdate")
@_q(
    "funnel_within_hour",
    """
    WITH v AS (SELECT user_id, min(ts) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click, max(v.t_view) AS t_view
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
            AND e.ts <= v.t_view + INTERVAL 1 HOUR
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            AND e.ts <= c.t_view + INTERVAL 1 HOUR
          GROUP BY e.user_id),
    j AS (SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
          FROM v LEFT JOIN c ON v.user_id = c.user_id
                 LEFT JOIN p ON v.user_id = p.user_id)
    SELECT CAST(count(t_view) AS BIGINT) AS n_view,
           CAST(count(t_click) AS BIGINT) AS n_click_1h,
           CAST(count(t_purchase) AS BIGINT) AS n_purchase_1h,
           CASE WHEN count(t_view) > 0
                THEN CAST(count(t_click) AS DOUBLE) / count(t_view)
                ELSE NULL END AS click_rate,
           CASE WHEN count(t_click) > 0
                THEN CAST(count(t_purchase) AS DOUBLE) / count(t_click)
                ELSE NULL END AS purchase_rate
    FROM j
    """,
)
def funnel_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-CONSTRAINED funnel (the ClickHouse-windowFunnel shape): the
    whole view -> click -> purchase chain must complete within ONE HOUR
    of the user's first view -- a click next week is not conversion.
    Differs from ``funnel_view_click_purchase`` (unbounded staged mins)
    by the window anchor: every stage deadline is t_view + 1h.  Stages
    chain by user-keyed joins on the SAME key (one partitioning reused);
    rates are single divisions of exact counts, zero-guarded (ANSI mode
    throws on 0/0).

    Scale shape: three filtered user-keyed aggregates + two left joins
    on user_id, then one global count -- no windows, no fan-out."""
    ev = load_table(spark, sf_dir, "events")
    return _funnel_within_hour_frame(ev)


def _funnel_within_hour_frame(ev: DataFrame) -> DataFrame:
    """Query body over an arbitrary events frame (unit-testable on
    synthetic deadline-edge fixtures)."""
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.max("t_view").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    j = v.join(c.select("user_id", "t_click"), "user_id", "left").join(
        p, "user_id", "left"
    )
    n_view = F.count("t_view")
    n_click = F.count("t_click")
    n_purchase = F.count("t_purchase")
    return j.agg(
        n_view.cast("long").alias("n_view"),
        n_click.cast("long").alias("n_click_1h"),
        n_purchase.cast("long").alias("n_purchase_1h"),
        F.when(n_view > 0, n_click.cast("double") / n_view).alias(
            "click_rate"
        ),
        F.when(n_click > 0, n_purchase.cast("double") / n_click).alias(
            "purchase_rate"
        ),
    )


@_q(
    "dup_graph_degree_hist",
    f"""
    WITH pairs AS ({_lsh_near_dup_sql(n_tables=12)}),
    ends AS (SELECT id_a AS id FROM pairs
             UNION ALL SELECT id_b AS id FROM pairs),
    deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
            FROM ends GROUP BY id)
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def dup_graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup pair graph (the LSH scale
    path's output): how many documents have 1, 2, ... near-duplicates.
    The shape diagnostic run BEFORE clustering -- a heavy-tailed degree
    histogram means boilerplate hubs (one template matching thousands),
    which blow up connected components and usually call for a
    remove-the-template pass instead of pairwise dedup.  All-integer.

    Scale shape: pairs from the banded equi-join, then two keyed
    aggregates (per-node degree, then the tiny histogram)."""
    from lvm_datapipe_spark.operators import similarity as V

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4, n_tables=12)
    ends = pairs.select(F.col("id_a").alias("id")).unionAll(
        pairs.select(F.col("id_b").alias("id"))
    )
    deg = ends.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


@_q(
    "forecast_seasonal_naive_backtest",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hour),
    j AS (
      SELECT a.event_type, a.c AS actual, b.c AS predicted
      FROM hourly a
      JOIN hourly b ON b.event_type = a.event_type
                   AND b.hour = a.hour - INTERVAL 24 HOUR)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(SUM(abs(actual - predicted)) AS BIGINT) AS abs_err_total,
           CAST(SUM(abs(actual - predicted)) AS DOUBLE) / count(*) AS mae,
           CAST(SUM(actual - predicted) AS DOUBLE) / count(*) AS bias
    FROM j GROUP BY event_type
    """,
)
def forecast_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST BACKTEST of the seasonal-naive baseline (predict this
    hour's event count with the count 24 hours earlier) -- the honest
    yardstick every fancier forecaster must beat, and the cheapest
    data-drift tripwire (MAE jumping means the daily rhythm broke).
    Errors are integer count differences; MAE and bias are single final
    divisions of exact integer sums -- no float aggregation.

    Scale shape: one (type, hour) aggregate, one self equi-join on the
    shifted hour key (keyed, no fan-out), one tiny per-type aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = hourly.select(
        "event_type", "hour", F.col("c").alias("actual")
    )
    b = hourly.select(
        "event_type",
        (F.col("hour") + F.expr("INTERVAL 24 HOURS")).alias("hour"),
        F.col("c").alias("predicted"),
    )
    j = a.join(b, ["event_type", "hour"])
    err = F.col("actual") - F.col("predicted")
    n = F.count(F.lit(1))
    return j.groupBy("event_type").agg(
        n.cast("long").alias("n_cells"),
        F.sum(F.abs(err)).cast("long").alias("abs_err_total"),
        (F.sum(F.abs(err)).cast("double") / n).alias("mae"),
        (F.sum(err).cast("double") / n).alias("bias"),
    )


@_q(
    "customer_order_regularity",
    """
    WITH gaps AS (
      SELECT o_custkey,
             CAST(datediff('day',
                  LAG(CAST(o_orderdate AS DATE)) OVER w,
                  CAST(o_orderdate AS DATE)) AS BIGINT) AS gap
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    st AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS s1,
             CAST(SUM(gap * gap) AS BIGINT) AS s2
      FROM gaps WHERE gap IS NOT NULL GROUP BY o_custkey
      HAVING count(*) >= 2 AND SUM(gap) > 0),
    cv AS (
      SELECT o_custkey, n, s1,
             sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                  / (n - 1))
               / (CAST(s1 AS DOUBLE) / n) AS cv
      FROM st),
    seg AS (
      SELECT CASE WHEN cv < CAST(0.5 AS DOUBLE) THEN 'regular'
                  WHEN cv < CAST(1.0 AS DOUBLE) THEN 'mixed'
                  ELSE 'sporadic' END AS segment,
             n, s1
      FROM cv)
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(s1) AS DOUBLE) / SUM(n) AS avg_gap_days
    FROM seg GROUP BY segment
    """,
)
def customer_order_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-rhythm segmentation: per customer, the coefficient of
    variation of inter-order gaps (std/mean of day gaps) classifies
    buying as regular (<0.5 -- clockwork), mixed, or sporadic (>=1.0 --
    bursty); the readout is customers and average gap per segment.  Gaps
    are integer day counts, so the power sums are EXACT integers and the
    per-customer cv is a fixed float expression over them; segment
    counts are integers and the segment-level average gap divides two
    exact integer totals.

    Scale shape: one customer-partitioned window (lag), one customer
    aggregate, one 3-row segment aggregate."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        )
        .cast("long")
        .alias("gap"),
    ).filter(F.col("gap").isNotNull())
    st = (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("gap").cast("long").alias("s1"),
            F.sum(F.col("gap") * F.col("gap")).cast("long").alias("s2"),
        )
        .filter((F.col("n") >= 2) & (F.col("s1") > 0))
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    cv = F.sqrt((s2d - s1d * F.col("s1") / F.col("n")) / (F.col("n") - 1)) / (
        s1d / F.col("n")
    )
    seg = st.select(
        F.when(cv < 0.5, "regular")
        .when(cv < 1.0, "mixed")
        .otherwise("sporadic")
        .alias("segment"),
        "n",
        "s1",
    )
    return seg.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (F.sum("s1").cast("double") / F.sum("n")).alias("avg_gap_days"),
    )


@_q(
    "session_handoff_matrix",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM flagged),
    per_session AS (
      SELECT user_id, session_id,
             FIRST(event_type ORDER BY ts, event_id) AS entry_type,
             LAST(event_type ORDER BY ts, event_id) AS exit_type
      FROM sessions GROUP BY user_id, session_id)
    SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions
    FROM per_session GROUP BY entry_type, exit_type
    """,
)
def session_handoff_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session ENTRY x EXIT type matrix: where journeys start vs where
    they end, over 30-minute-gap sessions -- the one-glance flow map
    (e.g. sessions entering on 'view' but exiting on 'error' mark the
    broken path).  Complements ``session_bounce_stats`` (entry only) and
    ``events_markov_transitions`` (event-level, not session-level).
    min_by/max_by on the (ts, event_id) total order -- exact, no second
    window pass.

    Scale shape: one user-partitioned window, one (user, session)
    aggregate, one |types|^2 aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum(F.col("is_new").cast("long")).over(w)
    )
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.min_by("event_type", order_key).alias("entry_type"),
        F.max_by("event_type", order_key).alias("exit_type"),
    )
    return per_session.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


@_q(
    "user_lifecycle_accounting",
    """
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST((CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS BIGINT)
               AS week_id
      FROM events),
    fw AS (SELECT user_id, MIN(week_id) AS first_week FROM uw GROUP BY user_id),
    prv AS (SELECT user_id, week_id + 1 AS week_id FROM uw),
    act AS (
      SELECT u.user_id, u.week_id,
             CASE WHEN u.week_id = f.first_week THEN 'new'
                  WHEN p.user_id IS NOT NULL THEN 'retained'
                  ELSE 'resurrected' END AS state
      FROM uw u
      JOIN fw f ON f.user_id = u.user_id
      LEFT JOIN prv p ON p.user_id = u.user_id AND p.week_id = u.week_id),
    dormant AS (
      SELECT p.week_id, CAST(count(*) AS BIGINT) AS n_dormant
      FROM prv p LEFT JOIN uw u
        ON u.user_id = p.user_id AND u.week_id = p.week_id
      WHERE u.user_id IS NULL
      GROUP BY p.week_id),
    counts AS (
      SELECT week_id,
             CAST(count(*) FILTER (WHERE state = 'new') AS BIGINT) AS n_new,
             CAST(count(*) FILTER (WHERE state = 'retained') AS BIGINT)
               AS n_retained,
             CAST(count(*) FILTER (WHERE state = 'resurrected') AS BIGINT)
               AS n_resurrected
      FROM act GROUP BY week_id)
    SELECT c.week_id, c.n_new, c.n_retained, c.n_resurrected,
           COALESCE(d.n_dormant, 0) AS n_dormant,
           c.n_new + c.n_retained + c.n_resurrected AS n_active
    FROM counts c LEFT JOIN dormant d ON d.week_id = c.week_id
    """,
)
def user_lifecycle_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING: every weekly active user is exactly one of
    new (first-ever week), retained (also active last week), or
    resurrected (active before, dormant last week); users active last
    week but not this week are dormant.  The bookkeeping identity
    active = new + retained + resurrected holds by construction, and
    week-over-week: active_w = active_{w-1} + new + resurrected -
    dormant -- the decomposition that tells WHY a DAU/WAU curve moved.
    All-integer set logic on a 7-day integer week grid (identical both
    engines -- no locale week rules).

    Scale shape: distinct (user, week), two user-keyed joins (first-week
    and the self-join shifted one week), one anti-join for dormancy,
    then |weeks|-sized aggregates."""
    ev = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        / 7
    ).cast("long")
    uw = ev.select("user_id", week.alias("week_id")).distinct()
    fw = uw.groupBy("user_id").agg(F.min("week_id").alias("first_week"))
    prv = uw.select("user_id", (F.col("week_id") + 1).alias("week_id"))
    act = (
        uw.join(fw, "user_id")
        .join(
            prv.withColumn("was_active", F.lit(1)),
            ["user_id", "week_id"],
            "left",
        )
        .select(
            "week_id",
            F.when(F.col("week_id") == F.col("first_week"), "new")
            .when(F.col("was_active").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("state"),
        )
    )
    counts = act.groupBy("week_id").agg(
        F.count_if(F.col("state") == "new").cast("long").alias("n_new"),
        F.count_if(F.col("state") == "retained")
        .cast("long")
        .alias("n_retained"),
        F.count_if(F.col("state") == "resurrected")
        .cast("long")
        .alias("n_resurrected"),
    )
    dormant = (
        prv.join(uw, ["user_id", "week_id"], "left_anti")
        .groupBy("week_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dormant"))
    )
    return (
        counts.join(dormant, "week_id", "left")
        .select(
            "week_id",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_dormant"), F.lit(0).cast("long")).alias(
                "n_dormant"
            ),
            (
                F.col("n_new") + F.col("n_retained") + F.col("n_resurrected")
            ).alias("n_active"),
        )
    )


@_q(
    "revenue_bridge_by_month",
    """
    WITH cm AS (
      SELECT o_custkey,
             CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
               + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1 AS month_id,
             strftime(o_orderdate, '%Y-%m') AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DECIMAL(27,6))
               AS rev
      FROM orders GROUP BY o_custkey, month_id, month),
    months AS (SELECT DISTINCT month_id, month FROM cm),
    prv AS (SELECT o_custkey, month_id + 1 AS month_id, rev FROM cm),
    fo AS (
      SELECT COALESCE(c.o_custkey, p.o_custkey) AS o_custkey,
             COALESCE(c.month_id, p.month_id) AS month_id,
             c.rev AS cur_rev, p.rev AS prev_rev
      FROM cm c FULL OUTER JOIN prv p
        ON p.o_custkey = c.o_custkey AND p.month_id = c.month_id),
    comp AS (
      SELECT month_id,
             CAST(SUM(CASE WHEN prev_rev IS NULL THEN cur_rev
                           ELSE CAST(0 AS DECIMAL(27,6)) END)
                  AS DOUBLE) AS new_rev,
             CAST(SUM(CASE WHEN cur_rev IS NULL THEN prev_rev
                           ELSE CAST(0 AS DECIMAL(27,6)) END)
                  AS DOUBLE) AS churned_rev,
             CAST(SUM(CASE WHEN cur_rev IS NOT NULL AND prev_rev IS NOT NULL
                                AND cur_rev > prev_rev
                           THEN cur_rev - prev_rev
                           ELSE CAST(0 AS DECIMAL(27,6)) END)
                  AS DOUBLE) AS expansion_rev,
             CAST(SUM(CASE WHEN cur_rev IS NOT NULL AND prev_rev IS NOT NULL
                                AND cur_rev < prev_rev
                           THEN prev_rev - cur_rev
                           ELSE CAST(0 AS DECIMAL(27,6)) END)
                  AS DOUBLE) AS contraction_rev,
             CAST(SUM(COALESCE(cur_rev, CAST(0 AS DECIMAL(27,6))))
                  AS DOUBLE) AS total_rev
      FROM fo GROUP BY month_id)
    SELECT m.month, c.new_rev, c.expansion_rev, c.contraction_rev,
           c.churned_rev, c.total_rev
    FROM comp c
    JOIN months m ON m.month_id = c.month_id
    WHERE c.month_id - 1 IN (SELECT month_id FROM months)
    """,
)
def revenue_bridge_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE BRIDGE (the SaaS waterfall): each month's revenue change
    decomposed into new (customers with no revenue last month),
    expansion (existing customers spending more), contraction (spending
    less), and churned (customers gone this month), satisfying
    total_m - total_{m-1} = new + expansion - contraction - churned
    EXACTLY -- every component is a decimal sum of decimal differences,
    cast to double only at the edge (the identity is bit-true, not
    approximately true; asserted in tests).  First month (no
    predecessor in the data) is excluded -- its "new" would be an
    artifact of the observation window.

    Scale shape: one (customer, month) aggregate, a customer-keyed
    full-outer self-join shifted one month, then |months|-sized
    aggregates and a broadcast months filter."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(27,6)"
    zero = F.lit(0).cast(dec)
    cm = o.groupBy(
        "o_custkey",
        (
            F.year("o_orderdate").cast("long") * 12
            + F.month("o_orderdate").cast("long")
            - 1
        ).alias("month_id"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.sum(F.col("o_totalprice").cast(dec)).cast(dec).alias("rev")
    )
    months = cm.select("month_id", "month").distinct()
    prv = cm.select(
        "o_custkey",
        (F.col("month_id") + 1).alias("month_id"),
        F.col("rev").alias("prev_rev"),
    )
    cur = cm.select("o_custkey", "month_id", F.col("rev").alias("cur_rev"))
    fo = cur.join(prv, ["o_custkey", "month_id"], "full_outer")
    both = F.col("cur_rev").isNotNull() & F.col("prev_rev").isNotNull()
    comp = fo.groupBy("month_id").agg(
        F.sum(
            F.when(F.col("prev_rev").isNull(), F.col("cur_rev")).otherwise(zero)
        )
        .cast("double")
        .alias("new_rev"),
        F.sum(
            F.when(F.col("cur_rev").isNull(), F.col("prev_rev")).otherwise(zero)
        )
        .cast("double")
        .alias("churned_rev"),
        F.sum(
            F.when(
                both & (F.col("cur_rev") > F.col("prev_rev")),
                F.col("cur_rev") - F.col("prev_rev"),
            ).otherwise(zero)
        )
        .cast("double")
        .alias("expansion_rev"),
        F.sum(
            F.when(
                both & (F.col("cur_rev") < F.col("prev_rev")),
                F.col("prev_rev") - F.col("cur_rev"),
            ).otherwise(zero)
        )
        .cast("double")
        .alias("contraction_rev"),
        F.sum(F.coalesce(F.col("cur_rev"), zero))
        .cast("double")
        .alias("total_rev"),
    )
    has_pred = months.select((F.col("month_id") + 1).alias("month_id"))
    return (
        comp.join(F.broadcast(has_pred), "month_id")
        .join(F.broadcast(months), "month_id")
        .select(
            "month",
            "new_rev",
            "expansion_rev",
            "contraction_rev",
            "churned_rev",
            "total_rev",
        )
    )


@_q(
    "attribution_position_based",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts,
             CAST(floor(value * 1000000.0) AS BIGINT) AS micro
      FROM events
      WHERE event_type = 'purchase' AND value > CAST(0.0 AS DOUBLE)),
    t AS (
      SELECT event_id AS tid, user_id, ts AS tts, event_type
      FROM events WHERE event_type IN ('view', 'click')),
    j AS (
      SELECT p.pid, p.micro, t.tid, t.event_type, t.tts
      FROM p JOIN t ON p.user_id = t.user_id
      WHERE t.tts < p.pts AND t.tts >= p.pts - INTERVAL 1 HOUR),
    r AS (
      SELECT pid, micro, event_type,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tts, tid) AS rk,
             COUNT(*) OVER (PARTITION BY pid) AS n
      FROM j),
    c AS (
      SELECT event_type,
             CASE
               WHEN n = 1 THEN micro
               WHEN n = 2 THEN
                 CASE WHEN rk = 1 THEN micro // 2 + micro % 2
                      ELSE micro // 2 END
               WHEN rk = 1 THEN (micro * 2) // 5
               WHEN rk = n THEN (micro * 2) // 5
               ELSE (micro - 2 * ((micro * 2) // 5)) // (n - 2)
                    + (CASE WHEN rk - 1 <=
                            (micro - 2 * ((micro * 2) // 5)) % (n - 2)
                       THEN 1 ELSE 0 END)
             END AS credit
      FROM r)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit) AS BIGINT) AS credit_micro,
           CAST(SUM(credit) AS DOUBLE) / 1000000.0 AS credit_value
    FROM c GROUP BY event_type
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITION-BASED (U-shaped) multi-touch attribution: 40% of each
    purchase to the first touch, 40% to the last, 20% shared by the
    middles -- the standard complement to [[attribution_linear_exact]]
    and [[attribution_time_decay]].  Same integer micro-unit discipline:
    40% = (micro*2)//5 exactly, the middle pool is whatever remains (so
    per-purchase credits sum to EXACTLY the purchase value even when 40%
    doesn't divide evenly), middles apportion by largest-remainder in
    time order; n=1 takes all, n=2 splits 50/50 with the odd unit to the
    earlier touch.  Every credit is a BIGINT; no float until the final
    /1e6 readout.

    Scale shape: identical to the linear form -- user-keyed equi-join
    with a 1-hour range predicate, purchase-partitioned windows, tiny
    final aggregate."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0.0)
    ).select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.floor(F.col("value") * 1000000.0).cast("bigint").alias("micro"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("ts").alias("tts"),
        "event_type",
    )
    j = p.join(t, "user_id").filter(
        (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
    )
    wp = Window.partitionBy("pid")
    r = j.select(
        "pid",
        "micro",
        "event_type",
        F.row_number().over(wp.orderBy("tts", "tid")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    forty = F.expr("(micro * 2) div 5")
    mid_pool = F.col("micro") - 2 * forty
    mid_each = F.expr(
        "(micro - 2 * ((micro * 2) div 5)) div (n - 2)"
    ) + F.when(
        (F.col("rk") - 1) <= mid_pool % (F.col("n") - 2), 1
    ).otherwise(0)
    credit = (
        F.when(F.col("n") == 1, F.col("micro"))
        .when(
            F.col("n") == 2,
            F.when(
                F.col("rk") == 1,
                F.expr("micro div 2") + F.col("micro") % 2,
            ).otherwise(F.expr("micro div 2")),
        )
        .when(F.col("rk") == 1, forty)
        .when(F.col("rk") == F.col("n"), forty)
        .otherwise(mid_each)
    )
    c = r.select("event_type", credit.alias("credit"))
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum("credit").cast("long").alias("credit_micro"),
        (F.sum("credit").cast("double") / 1000000.0).alias("credit_value"),
    )


@_q(
    "ab_diff_in_diff",
    """
    WITH a AS (
      SELECT event_type,
             ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
                  THEN 1 ELSE 0 END AS post,
             value
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)),
    m AS (
      SELECT event_type, arm, post,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE)
               AS s1
      FROM a GROUP BY event_type, arm, post),
    piv AS (
      SELECT event_type,
             MAX(CASE WHEN arm = 1 AND post = 0 THEN s1 / n END) AS mt_pre,
             MAX(CASE WHEN arm = 1 AND post = 1 THEN s1 / n END) AS mt_post,
             MAX(CASE WHEN arm = 0 AND post = 0 THEN s1 / n END) AS mc_pre,
             MAX(CASE WHEN arm = 0 AND post = 1 THEN s1 / n END) AS mc_post,
             CAST(MIN(n) AS BIGINT) AS min_cell_n
      FROM m GROUP BY event_type)
    SELECT event_type, mt_pre, mt_post, mc_pre, mc_post, min_cell_n,
           (mt_post - mt_pre) - (mc_post - mc_pre) AS did
    FROM piv
    WHERE mt_pre IS NOT NULL AND mt_post IS NOT NULL
      AND mc_pre IS NOT NULL AND mc_post IS NOT NULL
    """,
)
def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES readout: the treatment effect estimate
    (treated post-pre change) minus (control post-pre change), per
    metric -- the workhorse for launches that couldn't be randomized at
    exposure time (here arms are the stable md5 user split and the
    'launch' is the Jan-20 cut used by the incremental queries, making
    the estimate an A/A check: did should hover near 0).  Cell means
    come from exact decimal sums (the [[ab_test_welch_z]] recipe); the
    2x2 pivot is conditional MAX per cell; did is ONE fixed float
    expression.

    Scale shape: one (metric, arm, period) keyed aggregate over the
    corpus, then a |metrics|-sized pivot.  No windows, no joins on
    corpus rows."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    cut = F.to_timestamp(F.lit("2024-01-20 00:00:00"))
    d6 = F.col("value").cast("decimal(9,6)")
    m = (
        ev.select(
            "event_type",
            hash_bucket("user_id", 2, "ab").alias("arm"),
            F.when(F.col("ts") >= cut, 1).otherwise(0).alias("post"),
            "value",
        )
        .groupBy("event_type", "arm", "post")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(d6).cast("string").cast("double").alias("s1"),
        )
    )

    def cell(arm, post):
        return F.max(
            F.when(
                (F.col("arm") == arm) & (F.col("post") == post),
                F.col("s1") / F.col("n"),
            )
        )

    piv = m.groupBy("event_type").agg(
        cell(1, 0).alias("mt_pre"),
        cell(1, 1).alias("mt_post"),
        cell(0, 0).alias("mc_pre"),
        cell(0, 1).alias("mc_post"),
        F.min("n").cast("long").alias("min_cell_n"),
    )
    return piv.filter(
        F.col("mt_pre").isNotNull()
        & F.col("mt_post").isNotNull()
        & F.col("mc_pre").isNotNull()
        & F.col("mc_post").isNotNull()
    ).select(
        "event_type",
        "mt_pre",
        "mt_post",
        "mc_pre",
        "mc_post",
        "min_cell_n",
        (
            (F.col("mt_post") - F.col("mt_pre"))
            - (F.col("mc_post") - F.col("mc_pre"))
        ).alias("did"),
    )


@_q(
    "conversion_latency_quantiles",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'),
    v AS (
      SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'),
    m AS (
      SELECT p.pid, MAX(v.vts) AS vts, MAX(p.pts) AS pts
      FROM p JOIN v ON v.user_id = p.user_id
      WHERE v.vts < p.pts AND v.vts >= p.pts - INTERVAL 7 DAY
      GROUP BY p.pid),
    lat AS (
      SELECT (CAST(floor(epoch(pts)) AS BIGINT)
              - CAST(floor(epoch(vts)) AS BIGINT)) // 60 AS latency_min
      FROM m)
    , s AS (SELECT list(latency_min ORDER BY latency_min) AS arr,
                 CAST(count(*) AS BIGINT) AS n FROM lat)
    SELECT n AS n_conversions,
           (CASE WHEN (('0.5'::DOUBLE) * (n - 1)) = floor((('0.5'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.5'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.5'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.5'::DOUBLE) * (n - 1))) + 1.0) - (('0.5'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.5'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.5'::DOUBLE) * (n - 1)) - floor((('0.5'::DOUBLE) * (n - 1)))) END) AS p50_min,
           (CASE WHEN (('0.9'::DOUBLE) * (n - 1)) = floor((('0.9'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.9'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.9'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.9'::DOUBLE) * (n - 1))) + 1.0) - (('0.9'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.9'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.9'::DOUBLE) * (n - 1)) - floor((('0.9'::DOUBLE) * (n - 1)))) END) AS p90_min,
           (CASE WHEN (('0.99'::DOUBLE) * (n - 1)) = floor((('0.99'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.99'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.99'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.99'::DOUBLE) * (n - 1))) + 1.0) - (('0.99'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.99'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.99'::DOUBLE) * (n - 1)) - floor((('0.99'::DOUBLE) * (n - 1)))) END) AS p99_min
    FROM s
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT distribution: each purchase matched AS-OF to the
    user's most recent view in the preceding 7 days; latency in whole
    minutes, reported as p50/p90/p99 -- the SLA-style readout for the
    conversion loop ("half convert within X minutes, the tail takes
    Y").  Latencies are integer epoch-second differences (the
    unix_seconds == floor(epoch()) bridge); percentile() and
    quantile_cont linear-interpolate identically on the sorted integer
    list.

    Scale shape: user-keyed equi-join bounded by the 7-day range
    predicate, per-purchase max (keyed aggregate), then one global
    percentile aggregate (partial-merged, not windowed)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    m = (
        p.join(v, "user_id")
        .filter(
            (F.col("vts") < F.col("pts"))
            & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("pid")
        .agg(F.max("vts").alias("vts"), F.max("pts").alias("pts"))
    )
    lat = m.select(
        F.expr(
            "(unix_seconds(cast(pts as timestamp))"
            " - unix_seconds(cast(vts as timestamp))) div 60"
        ).alias("latency_min")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.expr("percentile(latency_min, 0.5)").alias("p50_min"),
        F.expr("percentile(latency_min, 0.9)").alias("p90_min"),
        F.expr("percentile(latency_min, 0.99)").alias("p99_min"),
    )


def _top_pc_sql(n_iters: int = 8, dim: int = _EMB_DIM) -> str:
    """DuckDB replay of the power-iteration top principal component.

    The heavy part (the exact decimal scatter matrix M = n*Sxx - s s^T)
    is plain grouped aggregation; the 64-dim eigensolve is replayed as a
    fixed chain of CTEs whose float operations (left-associated dot
    chains, sqrt, elementwise division) occur in EXACTLY the order the
    Spark driver loop performs them -- bit-identical results."""
    up = f"(SELECT unnest(range(1, {dim + 1})) AS i) u"
    parts = [
        f"""WITH ex AS (
      SELECT vec_id, u.i AS i,
             CAST(embedding[u.i]::DOUBLE AS DECIMAL(9,6)) AS x
      FROM embeddings CROSS JOIN {up}
      WHERE embedding IS NOT NULL),
    nrow AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM ex),
    sxx AS (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sp
            FROM ex a JOIN ex b USING (vec_id) GROUP BY a.i, b.i),
    sv AS (SELECT i, SUM(x) AS s FROM ex GROUP BY i),
    cells AS (
      SELECT sxx.i, sxx.j,
             CAST(nrow.n * sxx.sp - sa.s * sb.s AS DOUBLE) AS m
      FROM sxx CROSS JOIN nrow
      JOIN sv sa ON sa.i = sxx.i
      JOIN sv sb ON sb.i = sxx.j),
    g AS (SELECT i, list(m ORDER BY j) AS grow FROM cells GROUP BY i),
    v0 AS (SELECT list_transform(range(1, {dim + 1}),
                                 x -> CAST(0.125 AS DOUBLE)) AS vec)"""
    ]
    for k in range(1, n_iters + 1):
        parts.append(
            f"""w{k} AS (SELECT g.i, {_dot_sql('g.grow', f'v{k - 1}.vec')} AS wi
           FROM g CROSS JOIN v{k - 1})"""
        )
        if k < n_iters:
            parts.append(
                f"""v{k} AS (SELECT list_transform(wl,
                    x -> x / sqrt({_dot_sql('wl', 'wl')})) AS vec
           FROM (SELECT list(wi ORDER BY i) AS wl FROM w{k}))"""
            )
    parts.append(
        f"wf AS (SELECT list(wi ORDER BY i) AS wl FROM w{n_iters})"
    )
    body = ",\n    ".join(parts)
    return f"""
    {body}
    SELECT CAST(u.i AS INTEGER) AS dim,
           wl[u.i] / sqrt({_dot_sql('wl', 'wl')}) AS loading,
           sqrt({_dot_sql('wl', 'wl')}) / CAST(nrow.n * nrow.n AS DOUBLE)
             AS eigenvalue
    FROM wf CROSS JOIN nrow CROSS JOIN {up}
    WHERE wl IS NOT NULL AND sqrt({_dot_sql('wl', 'wl')}) > CAST(0.0 AS DOUBLE)
    """


@_q("embedding_top_pc_power_iteration", _top_pc_sql())
def embedding_top_pc_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP PRINCIPAL COMPONENT of the embedding corpus by distributed
    power iteration -- the embedding-QA readout (a dominant PC with a
    huge eigenvalue means a mean-offset/anisotropy problem; the loading
    vector says which dimensions).  Fully oracle-exact, which no naive
    float implementation achieves:

    - the only corpus-sized computation is the SCATTER MATRIX
      M = n*Sxx - s s^T, accumulated as EXACT DECIMALS (per-element
      (9,6) quantization, products and sums exact) via a 64x64
      pair-explode with map-side partial aggregation -- shuffle traffic
      is 4096 cells per partition regardless of corpus size, and no
      vec_id-keyed join ever happens;
    - the 64x64 eigensolve is METADATA math: cells are collected (4096
      decimals -- the BPE/bloom collect() class) and 8 fixed power
      iterations run on the driver with left-associated dot chains, the
      exact float-op sequence the DuckDB oracle replays CTE-for-CTE.

    Output: (dim, loading, eigenvalue); loading is the unit vector after
    exactly 8 steps and eigenvalue its Rayleigh estimate in
    biased-covariance units (lambda / n^2).  CONTRACT NOTE: the spec is
    the FIXED-STEP iteration (what the oracle replays), not the
    converged eigenvector -- on a near-isotropic corpus (tiny eigen-gap)
    8 steps is an estimate that approaches the top eigenvalue from
    below; tests pin both the exact 8-step result and the ballpark
    against numpy's full eigensolve."""
    from decimal import Decimal
    from math import sqrt as _sqrt

    dim = _EMB_DIM
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    arr = F.col("embedding").cast("array<double>")
    e1 = emb.select(
        arr.alias("a"), F.posexplode(arr).alias("i0", "xi")
    )
    e2 = e1.select(
        (F.col("i0") + 1).alias("i"),
        F.col("xi").cast("decimal(9,6)").alias("xd"),
        F.posexplode(F.col("a")).alias("j0", "xj"),
    ).select(
        "i",
        (F.col("j0") + 1).alias("j"),
        (F.col("xd") * F.col("xj").cast("decimal(9,6)")).alias("p"),
    )
    cells = e2.groupBy("i", "j").agg(F.sum("p").alias("sp")).collect()
    sv = {
        r["i"]: r["s"]
        for r in e1.select(
            (F.col("i0") + 1).alias("i"),
            F.col("xi").cast("decimal(9,6)").alias("x"),
        )
        .groupBy("i")
        .agg(F.sum("x").alias("s"))
        .collect()
    }
    n = emb.count()
    schema = "dim int, loading double, eigenvalue double"
    if n == 0 or not cells:
        return spark.createDataFrame([], schema)
    nd = Decimal(n)
    md = [[0.0] * dim for _ in range(dim)]
    for r in cells:
        md[r["i"] - 1][r["j"] - 1] = float(
            nd * r["sp"] - sv[r["i"]] * sv[r["j"]]
        )

    def _dot(a, b):
        acc = a[0] * b[0]
        for t in range(1, dim):
            acc = acc + a[t] * b[t]
        return acc

    v = [0.125] * dim
    w = v
    for _ in range(8):
        w = [_dot(row, v) for row in md]
        nrm = _sqrt(_dot(w, w))
        if nrm == 0.0:
            return spark.createDataFrame([], schema)
        v = [x / nrm for x in w]
    lam = _sqrt(_dot(w, w))
    eig = lam / float(n * n)
    rows = [(i + 1, w[i] / lam, eig) for i in range(dim)]
    return spark.createDataFrame(rows, schema)


@_q(
    "source_venn_overlap",
    """
    WITH fp AS (
      SELECT md5(text) AS fingerprint,
             array_to_string(list_sort(list(DISTINCT source)), '+') AS combo
      FROM documents WHERE source IS NOT NULL
      GROUP BY md5(text))
    SELECT combo, CAST(count(*) AS BIGINT) AS n_fingerprints
    FROM fp GROUP BY combo
    """,
)
def source_venn_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VENN diagram of exact-duplicate content across sources: each
    distinct text fingerprint is labeled with the sorted set of sources
    it appears in ('web', 'web+wiki', ...) and the combinations are
    counted -- the one-query answer to "how much of feed A is already
    inside feed B" BEFORE committing to ingest it (inclusion-exclusion
    falls out by summing rows).  Fingerprint = md5(text), the exact-dedup
    key; all-integer.

    Scale shape: one fingerprint-keyed aggregate (collect_set over the
    handful of sources), one tiny combo aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    fp = (
        docs.filter(F.col("source").isNotNull())
        .groupBy(F.md5("text").alias("fingerprint"))
        .agg(
            F.concat_ws(
                "+", F.sort_array(F.collect_set("source"))
            ).alias("combo")
        )
    )
    return fp.groupBy("combo").agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints")
    )


@_q(
    "range_partition_boundaries",
    """
    WITH s AS (
      SELECT list(l_extendedprice ORDER BY l_extendedprice) AS arr,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem)
    SELECT CAST(u.i AS INTEGER) AS boundary_idx,
           CASE u.i
             WHEN 1 THEN (CASE WHEN (('0.03125'::DOUBLE) * (n - 1)) = floor((('0.03125'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.03125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.03125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.03125'::DOUBLE) * (n - 1))) + 1.0) - (('0.03125'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.03125'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.03125'::DOUBLE) * (n - 1)) - floor((('0.03125'::DOUBLE) * (n - 1)))) END)
             WHEN 2 THEN (CASE WHEN (('0.0625'::DOUBLE) * (n - 1)) = floor((('0.0625'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.0625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.0625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.0625'::DOUBLE) * (n - 1))) + 1.0) - (('0.0625'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.0625'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.0625'::DOUBLE) * (n - 1)) - floor((('0.0625'::DOUBLE) * (n - 1)))) END)
             WHEN 3 THEN (CASE WHEN (('0.09375'::DOUBLE) * (n - 1)) = floor((('0.09375'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.09375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.09375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.09375'::DOUBLE) * (n - 1))) + 1.0) - (('0.09375'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.09375'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.09375'::DOUBLE) * (n - 1)) - floor((('0.09375'::DOUBLE) * (n - 1)))) END)
             WHEN 4 THEN (CASE WHEN (('0.125'::DOUBLE) * (n - 1)) = floor((('0.125'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.125'::DOUBLE) * (n - 1))) + 1.0) - (('0.125'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.125'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.125'::DOUBLE) * (n - 1)) - floor((('0.125'::DOUBLE) * (n - 1)))) END)
             WHEN 5 THEN (CASE WHEN (('0.15625'::DOUBLE) * (n - 1)) = floor((('0.15625'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.15625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.15625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.15625'::DOUBLE) * (n - 1))) + 1.0) - (('0.15625'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.15625'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.15625'::DOUBLE) * (n - 1)) - floor((('0.15625'::DOUBLE) * (n - 1)))) END)
             WHEN 6 THEN (CASE WHEN (('0.1875'::DOUBLE) * (n - 1)) = floor((('0.1875'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.1875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.1875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.1875'::DOUBLE) * (n - 1))) + 1.0) - (('0.1875'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.1875'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.1875'::DOUBLE) * (n - 1)) - floor((('0.1875'::DOUBLE) * (n - 1)))) END)
             WHEN 7 THEN (CASE WHEN (('0.21875'::DOUBLE) * (n - 1)) = floor((('0.21875'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.21875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.21875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.21875'::DOUBLE) * (n - 1))) + 1.0) - (('0.21875'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.21875'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.21875'::DOUBLE) * (n - 1)) - floor((('0.21875'::DOUBLE) * (n - 1)))) END)
             WHEN 8 THEN (CASE WHEN (('0.25'::DOUBLE) * (n - 1)) = floor((('0.25'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.25'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.25'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.25'::DOUBLE) * (n - 1))) + 1.0) - (('0.25'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.25'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.25'::DOUBLE) * (n - 1)) - floor((('0.25'::DOUBLE) * (n - 1)))) END)
             WHEN 9 THEN (CASE WHEN (('0.28125'::DOUBLE) * (n - 1)) = floor((('0.28125'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.28125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.28125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.28125'::DOUBLE) * (n - 1))) + 1.0) - (('0.28125'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.28125'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.28125'::DOUBLE) * (n - 1)) - floor((('0.28125'::DOUBLE) * (n - 1)))) END)
             WHEN 10 THEN (CASE WHEN (('0.3125'::DOUBLE) * (n - 1)) = floor((('0.3125'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.3125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.3125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.3125'::DOUBLE) * (n - 1))) + 1.0) - (('0.3125'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.3125'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.3125'::DOUBLE) * (n - 1)) - floor((('0.3125'::DOUBLE) * (n - 1)))) END)
             WHEN 11 THEN (CASE WHEN (('0.34375'::DOUBLE) * (n - 1)) = floor((('0.34375'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.34375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.34375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.34375'::DOUBLE) * (n - 1))) + 1.0) - (('0.34375'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.34375'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.34375'::DOUBLE) * (n - 1)) - floor((('0.34375'::DOUBLE) * (n - 1)))) END)
             WHEN 12 THEN (CASE WHEN (('0.375'::DOUBLE) * (n - 1)) = floor((('0.375'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.375'::DOUBLE) * (n - 1))) + 1.0) - (('0.375'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.375'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.375'::DOUBLE) * (n - 1)) - floor((('0.375'::DOUBLE) * (n - 1)))) END)
             WHEN 13 THEN (CASE WHEN (('0.40625'::DOUBLE) * (n - 1)) = floor((('0.40625'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.40625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.40625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.40625'::DOUBLE) * (n - 1))) + 1.0) - (('0.40625'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.40625'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.40625'::DOUBLE) * (n - 1)) - floor((('0.40625'::DOUBLE) * (n - 1)))) END)
             WHEN 14 THEN (CASE WHEN (('0.4375'::DOUBLE) * (n - 1)) = floor((('0.4375'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.4375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.4375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.4375'::DOUBLE) * (n - 1))) + 1.0) - (('0.4375'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.4375'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.4375'::DOUBLE) * (n - 1)) - floor((('0.4375'::DOUBLE) * (n - 1)))) END)
             WHEN 15 THEN (CASE WHEN (('0.46875'::DOUBLE) * (n - 1)) = floor((('0.46875'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.46875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.46875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.46875'::DOUBLE) * (n - 1))) + 1.0) - (('0.46875'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.46875'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.46875'::DOUBLE) * (n - 1)) - floor((('0.46875'::DOUBLE) * (n - 1)))) END)
             WHEN 16 THEN (CASE WHEN (('0.5'::DOUBLE) * (n - 1)) = floor((('0.5'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.5'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.5'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.5'::DOUBLE) * (n - 1))) + 1.0) - (('0.5'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.5'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.5'::DOUBLE) * (n - 1)) - floor((('0.5'::DOUBLE) * (n - 1)))) END)
             WHEN 17 THEN (CASE WHEN (('0.53125'::DOUBLE) * (n - 1)) = floor((('0.53125'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.53125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.53125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.53125'::DOUBLE) * (n - 1))) + 1.0) - (('0.53125'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.53125'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.53125'::DOUBLE) * (n - 1)) - floor((('0.53125'::DOUBLE) * (n - 1)))) END)
             WHEN 18 THEN (CASE WHEN (('0.5625'::DOUBLE) * (n - 1)) = floor((('0.5625'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.5625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.5625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.5625'::DOUBLE) * (n - 1))) + 1.0) - (('0.5625'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.5625'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.5625'::DOUBLE) * (n - 1)) - floor((('0.5625'::DOUBLE) * (n - 1)))) END)
             WHEN 19 THEN (CASE WHEN (('0.59375'::DOUBLE) * (n - 1)) = floor((('0.59375'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.59375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.59375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.59375'::DOUBLE) * (n - 1))) + 1.0) - (('0.59375'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.59375'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.59375'::DOUBLE) * (n - 1)) - floor((('0.59375'::DOUBLE) * (n - 1)))) END)
             WHEN 20 THEN (CASE WHEN (('0.625'::DOUBLE) * (n - 1)) = floor((('0.625'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.625'::DOUBLE) * (n - 1))) + 1.0) - (('0.625'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.625'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.625'::DOUBLE) * (n - 1)) - floor((('0.625'::DOUBLE) * (n - 1)))) END)
             WHEN 21 THEN (CASE WHEN (('0.65625'::DOUBLE) * (n - 1)) = floor((('0.65625'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.65625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.65625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.65625'::DOUBLE) * (n - 1))) + 1.0) - (('0.65625'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.65625'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.65625'::DOUBLE) * (n - 1)) - floor((('0.65625'::DOUBLE) * (n - 1)))) END)
             WHEN 22 THEN (CASE WHEN (('0.6875'::DOUBLE) * (n - 1)) = floor((('0.6875'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.6875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.6875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.6875'::DOUBLE) * (n - 1))) + 1.0) - (('0.6875'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.6875'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.6875'::DOUBLE) * (n - 1)) - floor((('0.6875'::DOUBLE) * (n - 1)))) END)
             WHEN 23 THEN (CASE WHEN (('0.71875'::DOUBLE) * (n - 1)) = floor((('0.71875'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.71875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.71875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.71875'::DOUBLE) * (n - 1))) + 1.0) - (('0.71875'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.71875'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.71875'::DOUBLE) * (n - 1)) - floor((('0.71875'::DOUBLE) * (n - 1)))) END)
             WHEN 24 THEN (CASE WHEN (('0.75'::DOUBLE) * (n - 1)) = floor((('0.75'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.75'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.75'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.75'::DOUBLE) * (n - 1))) + 1.0) - (('0.75'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.75'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.75'::DOUBLE) * (n - 1)) - floor((('0.75'::DOUBLE) * (n - 1)))) END)
             WHEN 25 THEN (CASE WHEN (('0.78125'::DOUBLE) * (n - 1)) = floor((('0.78125'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.78125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.78125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.78125'::DOUBLE) * (n - 1))) + 1.0) - (('0.78125'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.78125'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.78125'::DOUBLE) * (n - 1)) - floor((('0.78125'::DOUBLE) * (n - 1)))) END)
             WHEN 26 THEN (CASE WHEN (('0.8125'::DOUBLE) * (n - 1)) = floor((('0.8125'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.8125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.8125'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.8125'::DOUBLE) * (n - 1))) + 1.0) - (('0.8125'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.8125'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.8125'::DOUBLE) * (n - 1)) - floor((('0.8125'::DOUBLE) * (n - 1)))) END)
             WHEN 27 THEN (CASE WHEN (('0.84375'::DOUBLE) * (n - 1)) = floor((('0.84375'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.84375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.84375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.84375'::DOUBLE) * (n - 1))) + 1.0) - (('0.84375'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.84375'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.84375'::DOUBLE) * (n - 1)) - floor((('0.84375'::DOUBLE) * (n - 1)))) END)
             WHEN 28 THEN (CASE WHEN (('0.875'::DOUBLE) * (n - 1)) = floor((('0.875'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.875'::DOUBLE) * (n - 1))) + 1.0) - (('0.875'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.875'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.875'::DOUBLE) * (n - 1)) - floor((('0.875'::DOUBLE) * (n - 1)))) END)
             WHEN 29 THEN (CASE WHEN (('0.90625'::DOUBLE) * (n - 1)) = floor((('0.90625'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.90625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.90625'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.90625'::DOUBLE) * (n - 1))) + 1.0) - (('0.90625'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.90625'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.90625'::DOUBLE) * (n - 1)) - floor((('0.90625'::DOUBLE) * (n - 1)))) END)
             WHEN 30 THEN (CASE WHEN (('0.9375'::DOUBLE) * (n - 1)) = floor((('0.9375'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.9375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.9375'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.9375'::DOUBLE) * (n - 1))) + 1.0) - (('0.9375'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.9375'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.9375'::DOUBLE) * (n - 1)) - floor((('0.9375'::DOUBLE) * (n - 1)))) END)
             WHEN 31 THEN (CASE WHEN (('0.96875'::DOUBLE) * (n - 1)) = floor((('0.96875'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.96875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.96875'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.96875'::DOUBLE) * (n - 1))) + 1.0) - (('0.96875'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.96875'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.96875'::DOUBLE) * (n - 1)) - floor((('0.96875'::DOUBLE) * (n - 1)))) END)
           END AS boundary_value
    FROM s CROSS JOIN (SELECT unnest(range(1, 32)) AS i) u
    """,
)
def range_partition_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-LAYOUT ADVISOR: the 31 interior boundaries that split the
    sort key into 32 equal-row range partitions -- what
    ``repartitionByRange`` samples approximately, computed exactly; feed
    them to a writer as explicit split points for reproducible,
    balanced file layout (sampling-based splits shift run to run).
    Fractions i/32 are exact binary doubles; percentile() and
    quantile_cont linear-interpolate identically.

    Scale shape: ONE percentile aggregate over the corpus (partial
    merge, no sort, no window) returning a 31-element array."""
    li = load_table(spark, sf_dir, "lineitem")
    fracs = ", ".join(repr(x / 32.0) for x in range(1, 32))
    q = li.agg(
        F.expr(f"percentile(l_extendedprice, array({fracs}))").alias("bounds")
    )
    return q.select(
        F.posexplode(F.col("bounds")).alias("pos0", "boundary_value")
    ).select(
        (F.col("pos0") + 1).cast("int").alias("boundary_idx"),
        "boundary_value",
    )


@_q(
    "session_top_paths",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM flagged),
    ranked AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rk
      FROM sessions),
    paths AS (
      SELECT concat_ws('>',
               MAX(CASE WHEN rk = 1 THEN event_type END),
               MAX(CASE WHEN rk = 2 THEN event_type END),
               MAX(CASE WHEN rk = 3 THEN event_type END)) AS path
      FROM ranked WHERE rk <= 3 GROUP BY user_id, session_id)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 10
    """,
)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP SESSION PATHS: the 10 most common 3-step openings
    ('view>click>purchase', ...) over 30-minute-gap sessions -- the
    where-do-journeys-actually-go readout that motivates funnel
    definitions instead of assuming them.  Prefix capped at 3 steps so
    the path alphabet stays bounded; shorter sessions contribute their
    full prefix (concat_ws skips the missing steps identically on both
    engines).  Deterministic top-10: (count desc, path asc).

    Scale shape: the shared sessionize window, one (user, session)
    pivot aggregate, a bounded path aggregate, TakeOrdered for the
    limit."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum(F.col("is_new").cast("long")).over(w)
    )
    ranked = sessions.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
        ),
    ).filter(F.col("rk") <= 3)

    def step(k):
        return F.max(F.when(F.col("rk") == k, F.col("event_type")))

    paths = ranked.groupBy("user_id", "session_id").agg(
        F.concat_ws(">", step(1), step(2), step(3)).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


@_q(
    "ship_latency_by_priority",
    """
    WITH lat AS (
      SELECT o.o_orderpriority,
             CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE)) AS BIGINT)
               AS latency_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    , s AS (SELECT o_orderpriority,
                 list(latency_days ORDER BY latency_days) AS arr,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(MAX(latency_days) AS BIGINT) AS max_days
          FROM lat GROUP BY o_orderpriority)
    SELECT o_orderpriority,
           n AS n_lineitems,
           (CASE WHEN (('0.5'::DOUBLE) * (n - 1)) = floor((('0.5'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.5'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.5'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.5'::DOUBLE) * (n - 1))) + 1.0) - (('0.5'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.5'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.5'::DOUBLE) * (n - 1)) - floor((('0.5'::DOUBLE) * (n - 1)))) END) AS p50_days,
           (CASE WHEN (('0.9'::DOUBLE) * (n - 1)) = floor((('0.9'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.9'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.9'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.9'::DOUBLE) * (n - 1))) + 1.0) - (('0.9'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.9'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.9'::DOUBLE) * (n - 1)) - floor((('0.9'::DOUBLE) * (n - 1)))) END) AS p90_days,
           (CASE WHEN (('0.99'::DOUBLE) * (n - 1)) = floor((('0.99'::DOUBLE) * (n - 1))) THEN CAST(arr[CAST(floor((('0.99'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor((('0.99'::DOUBLE) * (n - 1))) AS BIGINT) + 1] AS DOUBLE) * ((floor((('0.99'::DOUBLE) * (n - 1))) + 1.0) - (('0.99'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor((('0.99'::DOUBLE) * (n - 1))) AS BIGINT) + 2] AS DOUBLE) * ((('0.99'::DOUBLE) * (n - 1)) - floor((('0.99'::DOUBLE) * (n - 1)))) END) AS p99_days,
           max_days
    FROM s
    """,
)
def ship_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-TO-SHIP latency SLA readout: days from order placement to
    each line item's ship date, p50/p90/p99 + max per order priority --
    the does-priority-actually-mean-faster check.  Latencies are integer
    day differences; percentile()/quantile_cont interpolate identically.

    Scale shape: the lineitem-orders equi-join shuffles on orderkey
    (AQE-sized, no forced broadcast of the growing orders side), then
    one percentile aggregate per priority -- partial-merged, no
    windows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("latency_days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.expr("percentile(latency_days, 0.5)").alias("p50_days"),
        F.expr("percentile(latency_days, 0.9)").alias("p90_days"),
        F.expr("percentile(latency_days, 0.99)").alias("p99_days"),
        F.max("latency_days").cast("long").alias("max_days"),
    )


@_q(
    "skyline_dominance_counts",
    """
    WITH sky AS (
      SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
      FROM orders o
      WHERE NOT EXISTS (
        SELECT 1 FROM orders d
        WHERE d.o_totalprice >= o.o_totalprice
          AND d.o_orderdate >= o.o_orderdate
          AND (d.o_totalprice > o.o_totalprice
               OR d.o_orderdate > o.o_orderdate)))
    SELECT s.o_orderkey, s.o_totalprice, s.o_orderdate,
           CAST(count(*) AS BIGINT) AS n_dominated
    FROM sky s JOIN orders r
      ON r.o_totalprice <= s.o_totalprice
     AND r.o_orderdate <= s.o_orderdate
     AND r.o_orderkey <> s.o_orderkey
    GROUP BY s.o_orderkey, s.o_totalprice, s.o_orderdate
    """,
)
def skyline_dominance_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOMINANCE SCORE for each skyline point: how many other orders it
    weakly dominates (<= in both dimensions) -- ranks the frontier by
    coverage ("this corner point dominates 40% of the corpus, that one
    is a niche extreme").  The frontier comes from the bucketed
    [[orders_pareto_skyline]] operator; counting joins the FRONTIER
    (tiny, broadcast) against the corpus with the two range predicates
    -- a broadcast nested loop over a frontier-sized side, never a
    corpus x corpus product.

    Scale shape: skyline plan (bucketed, pruned) + one broadcast-range
    join + a frontier-sized aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    sky = R.pareto_skyline_2d(o, "o_totalprice", "o_orderdate").select(
        F.col("o_orderkey").alias("s_key"),
        F.col("o_totalprice").alias("s_price"),
        F.col("o_orderdate").alias("s_date"),
    )
    j = o.join(
        F.broadcast(sky),
        (F.col("o_totalprice") <= F.col("s_price"))
        & (F.col("o_orderdate") <= F.col("s_date"))
        & (F.col("o_orderkey") != F.col("s_key")),
    )
    return j.groupBy("s_key", "s_price", "s_date").agg(
        F.count(F.lit(1)).cast("long").alias("n_dominated")
    ).select(
        F.col("s_key").alias("o_orderkey"),
        F.col("s_price").alias("o_totalprice"),
        F.col("s_date").alias("o_orderdate"),
        "n_dominated",
    )


@_q(
    "events_debounce_collapse",
    """
    WITH r AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE prev_type = event_type) AS BIGINT)
             AS n_collapsed,
           CAST(count(*) FILTER (WHERE prev_type IS NULL
                                 OR prev_type <> event_type) AS BIGINT)
             AS n_kept,
           CAST(count(*) FILTER (WHERE prev_type = event_type) AS DOUBLE)
             / count(*) AS collapse_rate
    FROM r GROUP BY event_type
    """,
)
def events_debounce_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEBOUNCE audit: per event type, how many events are consecutive
    repeats of the same type within a user's stream (the double-fire /
    retry noise a debounce filter would collapse to run-starts) -- run
    before shipping clickstream to training, since repeat-noise inflates
    engagement features.  Keep rule: first event of each same-type run
    (lag != type or null).  Counters exact; rate is one division
    (count(*) per group is >0 by construction -- no zero guard needed).

    Scale shape: one user-partitioned lag window, one per-type
    aggregate.  The collapsed STREAM itself is the same plan minus the
    aggregate -- this readout prices the filter before applying it."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    dup = F.col("prev_type") == F.col("event_type")
    keep = F.col("prev_type").isNull() | (
        F.col("prev_type") != F.col("event_type")
    )
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_if(dup).cast("long").alias("n_collapsed"),
        F.count_if(keep).cast("long").alias("n_kept"),
        (F.count_if(dup).cast("double") / F.count(F.lit(1))).alias(
            "collapse_rate"
        ),
    )


@_q(
    "dedup_method_agreement",
    f"""
    WITH jc AS (SELECT id_a, id_b FROM ({_jaccard_pairs_sql()})),
    mh AS ({_minhash_pairs_sql()}),
    sh AS (SELECT id_a, id_b FROM ({_simhash_sql()}))
    SELECT 'minhash_vs_simhash' AS method_pair,
           (SELECT CAST(count(*) AS BIGINT) FROM mh JOIN sh USING (id_a, id_b))
             AS n_both,
           (SELECT CAST(count(*) AS BIGINT) FROM mh ANTI JOIN sh USING (id_a, id_b))
             AS n_only_first,
           (SELECT CAST(count(*) AS BIGINT) FROM sh ANTI JOIN mh USING (id_a, id_b))
             AS n_only_second
    UNION ALL
    SELECT 'minhash_vs_jaccard',
           (SELECT CAST(count(*) AS BIGINT) FROM mh JOIN jc USING (id_a, id_b)),
           (SELECT CAST(count(*) AS BIGINT) FROM mh ANTI JOIN jc USING (id_a, id_b)),
           (SELECT CAST(count(*) AS BIGINT) FROM jc ANTI JOIN mh USING (id_a, id_b))
    UNION ALL
    SELECT 'simhash_vs_jaccard',
           (SELECT CAST(count(*) AS BIGINT) FROM sh JOIN jc USING (id_a, id_b)),
           (SELECT CAST(count(*) AS BIGINT) FROM sh ANTI JOIN jc USING (id_a, id_b)),
           (SELECT CAST(count(*) AS BIGINT) FROM jc ANTI JOIN sh USING (id_a, id_b))
    """,
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP METHOD AGREEMENT matrix: for each pair of near-dup methods
    (MinHash-LSH bands, SimHash hamming<=3, capped exact n-gram Jaccard
    >=0.6), how many document pairs both flag vs each alone -- the
    calibration readout that says whether the cheap sketch methods are
    interchangeable with the exact one ON THIS CORPUS, or which one to
    trust when they disagree.  Pure set algebra over the three
    deterministic pair sets; all-integer.

    Scale shape: each pair set is its banded/capped keyed-join plan; the
    agreement counts are (id_a, id_b)-keyed joins between pair tables --
    pair tables are output-sized (bounded by banding), never corpus^2."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    jc = D.ngram_jaccard_pairs(docs, threshold=0.6, max_shingle_freq=1000).select(
        "id_a", "id_b"
    )
    mh = D.minhash_lsh_pairs(docs).select("id_a", "id_b")
    sh = D.simhash_pairs(docs, max_hamming=3, bands=4).select("id_a", "id_b")

    def agree(name, a, b):
        both = a.join(b, ["id_a", "id_b"]).count()
        only_a = a.join(b, ["id_a", "id_b"], "left_anti").count()
        only_b = b.join(a, ["id_a", "id_b"], "left_anti").count()
        return spark.createDataFrame(
            [(name, both, only_a, only_b)],
            "method_pair string, n_both long, n_only_first long,"
            " n_only_second long",
        )

    jc = jc.persist()
    mh = mh.persist()
    sh = sh.persist()
    out = (
        agree("minhash_vs_simhash", mh, sh)
        .unionAll(agree("minhash_vs_jaccard", mh, jc))
        .unionAll(agree("simhash_vs_jaccard", sh, jc))
    )
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    return _with_cached_deps(out, [jc, mh, sh])


@_q(
    "cohort_ltv_curve",
    """
    WITH cm AS (
      SELECT o_custkey,
             CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
               + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1 AS month_id,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DECIMAL(27,6))
               AS rev
      FROM orders GROUP BY o_custkey, month_id),
    fc AS (SELECT o_custkey, MIN(month_id) AS cohort_id FROM cm
           GROUP BY o_custkey),
    sz AS (SELECT cohort_id, CAST(count(*) AS BIGINT) AS n_customers
           FROM fc GROUP BY cohort_id),
    co AS (
      SELECT fc.cohort_id, cm.month_id - fc.cohort_id AS offset_months,
             CAST(SUM(cm.rev) AS DECIMAL(27,6)) AS rev
      FROM cm JOIN fc ON fc.o_custkey = cm.o_custkey
      GROUP BY fc.cohort_id, offset_months),
    cum AS (
      SELECT cohort_id, offset_months,
             SUM(rev) OVER (PARTITION BY cohort_id ORDER BY offset_months
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev
      FROM co)
    SELECT CAST(cum.cohort_id AS BIGINT) AS cohort_id,
           CAST(offset_months AS BIGINT) AS offset_months,
           sz.n_customers,
           CAST(cum_rev AS DOUBLE) AS cum_revenue,
           CAST(cum_rev AS DOUBLE) / sz.n_customers AS ltv_per_customer
    FROM cum JOIN sz ON sz.cohort_id = cum.cohort_id
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LTV CURVE: customers grouped by first-purchase month;
    cumulative revenue per cohort at each month offset, normalized per
    customer -- the payback/LTV readout that retention counts alone
    can't give.  Revenue stays DECIMAL through the per-customer-month
    aggregate, the cohort-offset regroup, AND the cumulative window
    (exact at every point); the per-customer division is the only float
    op.  Offsets with no cohort activity simply have no row -- the
    cumulative value at the next present offset is still exact.

    Scale shape: (customer, month) aggregate, customer-keyed cohort
    join, (cohort, offset) regroup, then a window PARTITIONED by cohort
    over |offsets| rows."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(27,6)"
    cm = o.groupBy(
        "o_custkey",
        (
            F.year("o_orderdate").cast("long") * 12
            + F.month("o_orderdate").cast("long")
            - 1
        ).alias("month_id"),
    ).agg(F.sum(F.col("o_totalprice").cast(dec)).cast(dec).alias("rev"))
    fc = cm.groupBy("o_custkey").agg(F.min("month_id").alias("cohort_id"))
    sz = fc.groupBy("cohort_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    co = (
        cm.join(fc, "o_custkey")
        .groupBy(
            "cohort_id",
            (F.col("month_id") - F.col("cohort_id")).alias("offset_months"),
        )
        .agg(F.sum("rev").cast(dec).alias("rev"))
    )
    w = (
        Window.partitionBy("cohort_id")
        .orderBy("offset_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = co.select(
        "cohort_id", "offset_months", F.sum("rev").over(w).alias("cum_rev")
    )
    return cum.join(sz, "cohort_id").select(
        F.col("cohort_id").cast("long").alias("cohort_id"),
        F.col("offset_months").cast("long").alias("offset_months"),
        "n_customers",
        F.col("cum_rev").cast("double").alias("cum_revenue"),
        (F.col("cum_rev").cast("double") / F.col("n_customers")).alias(
            "ltv_per_customer"
        ),
    )


@_q(
    "vocab_coverage_by_freq_class",
    f"""
    WITH tf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM documents)
      GROUP BY tok),
    tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_types
            FROM tf),
    ladder AS (SELECT unnest([2, 5, 10, 50, 100]) AS threshold)
    SELECT CAST(l.threshold AS INTEGER) AS threshold,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(SUM(tf.freq) AS BIGINT) AS n_occurrences,
           CAST(SUM(tf.freq) AS DOUBLE) / MAX(tot.total) AS coverage,
           CAST(count(*) AS DOUBLE) / MAX(tot.n_types) AS type_fraction
    FROM tf CROSS JOIN ladder l CROSS JOIN tot
    WHERE tf.freq >= l.threshold
    GROUP BY l.threshold
    """,
)
def vocab_coverage_by_freq_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF COVERAGE readout: what fraction of all token OCCURRENCES is
    covered by the token TYPES seen at least t times (t = 2..100) -- the
    vocabulary-size decision table for tokenizer training ("types with
    freq >= 10 are 1.8% of the vocab but 96% of the text").  Uses
    frequency THRESHOLDS rather than top-k ranks on purpose: rank
    requires a global sort/window over the vocab table; threshold
    classes are one aggregate -- same decision content, scale-safe.
    Counts exact; the two fractions are final divisions.

    Scale shape: one token-keyed aggregate, a 5x fan-out of the vocab
    table against the threshold ladder (broadcast), one 5-row
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    from lvm_datapipe_spark.operators.text import tokens

    tf = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    tot = tf.agg(
        F.sum("freq").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    ladder = spark.createDataFrame(
        [(2,), (5,), (10,), (50,), (100,)], "threshold int"
    )
    j = (
        tf.crossJoin(F.broadcast(ladder))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("freq") >= F.col("threshold"))
    )
    return j.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("freq").cast("long").alias("n_occurrences"),
        (F.sum("freq").cast("double") / F.max("total")).alias("coverage"),
        (F.count(F.lit(1)).cast("double") / F.max("n_types")).alias(
            "type_fraction"
        ),
    )


@_q(
    "daily_peak_concurrency",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id,
             ts
      FROM flagged),
    iv AS (
      SELECT CAST(floor(epoch(MIN(ts))) AS BIGINT) AS s_start,
             CAST(floor(epoch(MAX(ts))) AS BIGINT) + 1 AS s_end
      FROM sessions GROUP BY user_id, session_id),
    b AS (
      SELECT s_start AS sec, 1 AS delta FROM iv
      UNION ALL
      SELECT s_end AS sec, -1 AS delta FROM iv),
    persec AS (
      SELECT sec // 86400 AS day, sec, CAST(SUM(delta) AS BIGINT) AS d
      FROM b GROUP BY sec // 86400, sec),
    intraday AS (
      SELECT day, sec,
             SUM(d) OVER (PARTITION BY day ORDER BY sec
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run
      FROM persec),
    daysum AS (SELECT day, CAST(SUM(d) AS BIGINT) AS day_total
               FROM persec GROUP BY day),
    dayoff AS (
      SELECT a.day, COALESCE(CAST(SUM(b.day_total) AS BIGINT), 0) AS off
      FROM daysum a LEFT JOIN daysum b ON b.day < a.day
      GROUP BY a.day),
    peaks AS (
      SELECT i.day, MAX(o.off + i.run) AS peak
      FROM intraday i JOIN dayoff o ON o.day = i.day
      GROUP BY i.day)
    SELECT CAST(day AS BIGINT) AS day_id,
           CAST(peak AS BIGINT) AS peak_concurrency
    FROM peaks
    """,
)
def daily_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENT SESSIONS per day -- the capacity-planning number
    (license seats, connection pools, serving replicas).  Interval
    stabbing via the boundary-delta trick: +1 at session start, -1 one
    second after session end; concurrency at time t is the prefix sum
    of deltas.  The global prefix sum is computed WITHOUT a global
    window by the classic two-level decomposition (the same offsets
    pattern as relational.contiguous_ids): an intra-day running sum
    PARTITIONED by day, plus per-day offsets from a days x days
    triangular self-join (|days| is bounded -- ten years is 3,653 rows
    -- so the join is broadcast-tiny at any corpus size).  All-integer.

    Scale shape: sessionize windows (user-partitioned), keyed boundary
    aggregate, day-partitioned window, bounded day-level join.  No
    SinglePartition window anywhere."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum(F.col("is_new").cast("long")).over(w)
    )
    iv = sessions.groupBy("user_id", "session_id").agg(
        F.unix_seconds(F.min("ts").cast("timestamp")).alias("s_start"),
        (F.unix_seconds(F.max("ts").cast("timestamp")) + 1).alias("s_end"),
    )
    b = iv.select(F.col("s_start").alias("sec"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("s_end").alias("sec"), F.lit(-1).alias("delta"))
    )
    persec = b.groupBy(
        F.expr("sec div 86400").alias("day"), "sec"
    ).agg(F.sum("delta").cast("long").alias("d"))
    wd = (
        Window.partitionBy("day")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intraday = persec.select("day", "sec", F.sum("d").over(wd).alias("run"))
    daysum = persec.groupBy("day").agg(
        F.sum("d").cast("long").alias("day_total")
    )
    a = daysum.select(F.col("day"))
    prior = daysum.select(
        F.col("day").alias("b_day"), F.col("day_total").alias("b_total")
    )
    dayoff = (
        a.join(F.broadcast(prior), F.col("b_day") < F.col("day"), "left")
        .groupBy("day")
        .agg(
            F.coalesce(F.sum("b_total").cast("long"), F.lit(0).cast("long")).alias(
                "off"
            )
        )
    )
    peaks = (
        intraday.join(F.broadcast(dayoff), "day")
        .groupBy("day")
        .agg(F.max(F.col("off") + F.col("run")).alias("peak"))
    )
    return peaks.select(
        F.col("day").cast("long").alias("day_id"),
        F.col("peak").cast("long").alias("peak_concurrency"),
    )


@_q(
    "association_type_hour_cramers_v",
    """
    WITH d AS (
      SELECT event_type,
             CAST(strftime(ts, '%H') AS INTEGER) AS hour_of_day
      FROM events),
    c AS (SELECT event_type, hour_of_day, CAST(count(*) AS BIGINT) AS o
          FROM d GROUP BY event_type, hour_of_day),
    rt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS row_n
           FROM d GROUP BY event_type),
    ct AS (SELECT hour_of_day, CAST(count(*) AS BIGINT) AS col_n
           FROM d GROUP BY hour_of_day),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    g AS (SELECT rt.event_type, ct.hour_of_day, rt.row_n, ct.col_n,
                 COALESCE(c.o, CAST(0 AS BIGINT)) AS o
          FROM rt CROSS JOIN ct
          LEFT JOIN c ON c.event_type = rt.event_type
                     AND c.hour_of_day = ct.hour_of_day),
    terms AS (
      SELECT CAST(floor(
               ((CAST(g.o AS DOUBLE) - CAST(g.row_n * g.col_n AS DOUBLE) / t.n)
                * (CAST(g.o AS DOUBLE) - CAST(g.row_n * g.col_n AS DOUBLE) / t.n))
               / (CAST(g.row_n * g.col_n AS DOUBLE) / t.n)
               * 1000000.0) AS BIGINT) AS term
      FROM g CROSS JOIN t),
    dims AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM rt),
    dimc AS (SELECT CAST(count(*) AS BIGINT) AS n_cols FROM ct)
    SELECT CAST(SUM(terms.term) AS DOUBLE) / 1000000.0 AS chi2,
           dims.n_rows, dimc.n_cols, t.n AS n_events,
           sqrt(CAST(SUM(terms.term) AS DOUBLE) / 1000000.0
                / (t.n * (least(dims.n_rows, dimc.n_cols) - 1))) AS cramers_v
    FROM terms CROSS JOIN dims CROSS JOIN dimc CROSS JOIN t
    GROUP BY dims.n_rows, dimc.n_cols, t.n
    """,
)
def association_type_hour_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMER'S V between event type and hour-of-day: one bounded number
    (0 = independent, 1 = fully determined) for "is behavior
    time-of-day dependent?" -- the single-scalar companion to the
    per-cell [[chisq_source_lang]] drill-down.  Per-cell chi-square
    terms use the proven integer-marginal recipe; the CROSS-CELL sum --
    where naive float addition diverges between engines -- quantizes
    each identically-computed term to DECIMAL(27,12) so the sum is
    order-free and exact; sqrt and the final division are
    correctly-rounded IEEE.

    Scale shape: one keyed aggregate + marginal broadcasts; the cell
    grid is |types| x 24."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type", F.date_format("ts", "HH").cast("int").alias("hour_of_day")
    )
    c = d.groupBy("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rt = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("row_n")
    )
    ct = d.groupBy("hour_of_day").agg(
        F.count(F.lit(1)).cast("long").alias("col_n")
    )
    t = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    g = (
        rt.crossJoin(ct)
        .join(c, ["event_type", "hour_of_day"], "left")
        .select(
            "event_type",
            "hour_of_day",
            "row_n",
            "col_n",
            F.coalesce(F.col("o"), F.lit(0).cast("long")).alias("o"),
        )
    )
    expected = F.col("row_n") * F.col("col_n")
    dev = F.col("o").cast("double") - expected.cast("double") / F.col("n")
    # floor-to-micro BIGINT: CAST(double AS DECIMAL) is NOT portable
    # (Spark rounds half-up, DuckDB truncates) -- floor(x*1e6) in double
    # is the same IEEE op sequence on both engines
    term = F.floor(
        dev * dev / (expected.cast("double") / F.col("n")) * 1000000.0
    ).cast("long")
    terms = g.crossJoin(F.broadcast(t)).select(term.alias("term"), "n")
    dims = rt.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    dimc = ct.agg(F.count(F.lit(1)).cast("long").alias("n_cols"))
    s = terms.groupBy("n").agg(F.sum("term").alias("chi2_micro"))
    out = s.crossJoin(F.broadcast(dims)).crossJoin(F.broadcast(dimc))
    chi2 = F.col("chi2_micro").cast("double") / 1000000.0
    return out.select(
        chi2.alias("chi2"),
        "n_rows",
        "n_cols",
        F.col("n").alias("n_events"),
        F.sqrt(
            chi2 / (F.col("n") * (F.least(F.col("n_rows"), F.col("n_cols")) - 1))
        ).alias("cramers_v"),
    )


@_q(
    "join_coverage_report",
    """
    SELECT 'customer_has_order' AS relationship,
           (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_left,
           (SELECT CAST(count(*) AS BIGINT) FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)) AS n_matched,
           (SELECT CAST(count(*) AS DOUBLE) FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey))
             / (SELECT count(*) FROM customer) AS coverage
    UNION ALL
    SELECT 'supplier_has_lineitem',
           (SELECT CAST(count(*) AS BIGINT) FROM supplier),
           (SELECT CAST(count(*) AS BIGINT) FROM supplier s
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_suppkey = s.s_suppkey)),
           (SELECT CAST(count(*) AS DOUBLE) FROM supplier s
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_suppkey = s.s_suppkey))
             / (SELECT count(*) FROM supplier)
    UNION ALL
    SELECT 'part_ever_ordered',
           (SELECT CAST(count(*) AS BIGINT) FROM part),
           (SELECT CAST(count(*) AS BIGINT) FROM part p
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey)),
           (SELECT CAST(count(*) AS DOUBLE) FROM part p
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey))
             / (SELECT count(*) FROM part)
    """,
)
def join_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN COVERAGE report: for each dimension->fact relationship, what
    fraction of dimension rows actually participates (customers with an
    order, suppliers with a shipment, parts ever ordered) -- the
    before-you-join DQ readout that catches silently-empty joins and
    orphaned dimensions (complement of [[referential_integrity_audit]],
    which checks the fact side).  Counts via semi-joins; rates are
    single divisions of exact counts.

    Scale shape: three key-distinct semi-joins (the fact side reduces
    to its distinct keys before the join), three dimension counts."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def row(name, left, left_key, fact, fact_key):
        n_left = left.count()
        n_matched = left.join(
            fact.select(F.col(fact_key).alias(left_key)).distinct(),
            left_key,
            "left_semi",
        ).count()
        coverage = n_matched / n_left if n_left else None
        return spark.createDataFrame(
            [(name, n_left, n_matched, coverage)],
            "relationship string, n_left long, n_matched long,"
            " coverage double",
        )

    return (
        row("customer_has_order", c, "c_custkey", o, "o_custkey")
        .unionAll(row("supplier_has_lineitem", s, "s_suppkey", li, "l_suppkey"))
        .unionAll(row("part_ever_ordered", p, "p_partkey", li, "l_partkey"))
    )


@_q(
    "dedup_transitivity_inflation",
    f"""
    WITH pairs AS ({_lsh_near_dup_sql(n_tables=12)}),
    clusters AS (
      WITH RECURSIVE p2 AS (SELECT id_a, id_b FROM pairs),
      edges AS (SELECT id_a AS u, id_b AS w FROM p2
                UNION SELECT id_b AS u, id_a AS w FROM p2),
      reach AS (SELECT u, w FROM edges
                UNION SELECT r.u AS u, e2.w AS w
                FROM reach r JOIN edges e2 ON r.w = e2.u)
      SELECT u AS id, least(u, min(w)) AS cluster_id FROM reach GROUP BY u),
    sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS s
              FROM clusters GROUP BY cluster_id)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM sizes) AS n_clusters,
           (SELECT CAST(MAX(s) AS BIGINT) FROM sizes) AS max_cluster_size,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_direct_pairs,
           (SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) FROM sizes)
             AS n_implied_pairs,
           (SELECT CAST(SUM(s * (s - 1) // 2) AS DOUBLE) FROM sizes)
             / (SELECT count(*) FROM pairs) AS inflation_ratio
    """,
)
def dedup_transitivity_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSITIVITY INFLATION audit for connected-component dedup: the
    clusters imply sum(s choose 2) duplicate pairs, but only
    n_direct_pairs were actually measured similar -- a ratio far above 1
    means chains are merging documents that were never compared (the
    classic over-merge failure of CC dedup, usually one boilerplate hub
    away).  Run it BEFORE trusting keep-one-per-cluster.  Implied pairs
    come from cluster SIZES (integer arithmetic), never materialized;
    the pair source is the deterministic 12-table LSH path.

    Scale shape: the LSH pair plan + label propagation, then
    cluster-sized aggregates; one division at the end."""
    from lvm_datapipe_spark.operators import similarity as V
    from lvm_datapipe_spark.operators.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4, n_tables=12).persist()
    clusters = connected_components(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    stats = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.max("s").cast("long").alias("max_cluster_size"),
        F.sum(F.expr("s * (s - 1) div 2")).cast("long").alias("n_implied_pairs"),
    )
    n_direct = pairs.count()
    out = stats.select(
        "n_clusters",
        "max_cluster_size",
        F.lit(n_direct).cast("long").alias("n_direct_pairs"),
        "n_implied_pairs",
        (F.col("n_implied_pairs").cast("double") / F.lit(n_direct)).alias(
            "inflation_ratio"
        ),
    )
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    return _with_cached_deps(out, [pairs])


@_q(
    "corpus_stopword_candidates",
    f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents)),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM documents WHERE len({_SQL_TOKS}) > 0),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS doc_freq
           FROM dt GROUP BY tok)
    SELECT tok, doc_freq,
           CAST(doc_freq AS DOUBLE) / nd.n_docs AS df_fraction
    FROM df CROSS JOIN nd
    WHERE CAST(doc_freq AS DOUBLE) / nd.n_docs >= CAST(0.3 AS DOUBLE)
    """,
)
def corpus_stopword_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-SPECIFIC STOPWORD mining: tokens whose DOCUMENT frequency
    (fraction of docs containing them, not occurrence count) is >= 0.3
    -- the list to feed the quality scorers and BM25 instead of a
    frozen English stopword file, which is wrong for every other
    language and every specialized corpus.  DF, not TF, is the right
    statistic: a token repeated 1000x in one doc is topical; a token in
    30% of ALL docs is glue.

    Scale shape: distinct (doc, token) -- one keyed dedup -- then a
    token-keyed count against a scalar doc count."""
    docs = load_table(spark, sf_dir, "documents")
    from lvm_datapipe_spark.operators.text import tokens

    dt = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).distinct()
    nd = docs.filter(F.size(tokens("text")) > 0).agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    frac = F.col("doc_freq").cast("double") / F.col("n_docs")
    return (
        df.crossJoin(F.broadcast(nd))
        .filter(frac >= 0.3)
        .select("tok", "doc_freq", frac.alias("df_fraction"))
    )


@_q(
    "order_concentration_hhi_by_nation",
    """
    WITH oc AS (
      SELECT n.n_name, o.o_custkey, CAST(count(*) AS BIGINT) AS c
      FROM orders o
      JOIN customer cu ON cu.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = cu.c_nationkey
      GROUP BY n.n_name, o.o_custkey)
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(c) AS BIGINT) AS total_orders,
           CAST(SUM(c * c) AS DOUBLE) / (SUM(c) * SUM(c)) AS hhi,
           CAST(1 AS DOUBLE) / count(*) AS hhi_floor
    FROM oc GROUP BY n_name
    """,
)
def order_concentration_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN concentration of order volume within each
    nation: HHI = sum of squared customer shares = sum(c^2)/(sum c)^2 --
    near its floor 1/n means orders spread evenly, near 1 means one
    whale customer IS the market (a skew-risk readout for both business
    and shuffle planning: the HHI of a join key is exactly its hot-key
    skew).  All integer sums; two final divisions.

    Scale shape: custkey-keyed aggregate, broadcastable nation/customer
    dims, |nations|-sized final aggregate."""
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    oc = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return oc.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("c").cast("long").alias("total_orders"),
        (
            F.sum(F.col("c") * F.col("c")).cast("double")
            / (F.sum("c") * F.sum("c"))
        ).alias("hhi"),
        (F.lit(1).cast("double") / F.count(F.lit(1))).alias("hhi_floor"),
    )


@_q(
    "seasonality_strength_by_type",
    """
    WITH h AS (
      SELECT event_type, CAST(strftime(ts, '%H') AS INTEGER) AS hr,
             CAST(count(*) AS BIGINT) AS n_g,
             SUM(CAST(value AS DECIMAL(9,6))) AS sd1,
             SUM(CAST(value AS DECIMAL(9,6)) * CAST(value AS DECIMAL(9,6)))
               AS sd2
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)
      GROUP BY event_type, hr),
    terms AS (
      SELECT event_type, n_g, sd1, sd2,
             CAST(floor((CAST(CAST(sd1 AS VARCHAR) AS DOUBLE)
                   * CAST(CAST(sd1 AS VARCHAR) AS DOUBLE)) / n_g
                  * 1000000.0) AS BIGINT) AS bterm
      FROM h),
    agg AS (
      SELECT event_type,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(CAST(SUM(sd1) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(sd2) AS VARCHAR) AS DOUBLE) AS s2,
             CAST(SUM(bterm) AS DOUBLE) / 1000000.0 AS bsum,
             CAST(count(*) AS BIGINT) AS n_hours
      FROM terms GROUP BY event_type)
    SELECT event_type, n, n_hours,
           bsum - s1 * s1 / n AS between_ss,
           s2 - s1 * s1 / n AS total_ss,
           CASE WHEN s2 - s1 * s1 / n > CAST(0.0 AS DOUBLE)
                THEN (bsum - s1 * s1 / n) / (s2 - s1 * s1 / n)
                ELSE NULL END AS eta_squared
    FROM agg
    """,
)
def seasonality_strength_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONALITY STRENGTH as one-way ANOVA eta-squared: the fraction
    of each metric's variance explained by hour-of-day (between-group
    sum of squares / total sum of squares over the 24 hour bins).
    eta^2 near 0 = no daily rhythm, near 1 = the hour IS the value --
    the quantitative "should I model seasonality" gate upstream of
    [[events_seasonal_residuals]].  Engine-exact: per-hour decimal
    power sums, the VARCHAR->double bridge at fixed points, and the
    24-term between-SS sum quantized to DECIMAL(27,12) (the
    [[association_type_hour_cramers_v]] order-free-sum recipe).

    Scale shape: one (type, hour) keyed aggregate; everything after is
    24 rows per type."""
    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    d6 = F.col("value").cast("decimal(9,6)")
    h = ev.groupBy(
        "event_type", F.date_format("ts", "HH").cast("int").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(d6).alias("sd1"),
        F.sum(d6 * d6).alias("sd2"),
    )
    s1g = F.col("sd1").cast("string").cast("double")
    terms = h.select(
        "event_type",
        "n_g",
        "sd1",
        "sd2",
        F.floor((s1g * s1g) / F.col("n_g") * 1000000.0)
        .cast("long")
        .alias("bterm"),
    )
    agg = terms.groupBy("event_type").agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("sd1").cast("string").cast("double").alias("s1"),
        F.sum("sd2").cast("string").cast("double").alias("s2"),
        (F.sum("bterm").cast("double") / 1000000.0).alias("bsum"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    bss = F.col("bsum") - F.col("s1") * F.col("s1") / F.col("n")
    tss = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    return agg.select(
        "event_type",
        "n",
        "n_hours",
        bss.alias("between_ss"),
        tss.alias("total_ss"),
        F.when(tss > 0.0, bss / tss).alias("eta_squared"),
    )


@_q(
    "events_runs_test_randomness",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hour),
    med AS (
      SELECT event_type, quantile_cont(c, 0.5) AS m
      FROM hourly GROUP BY event_type),
    signed AS (
      SELECT h.event_type, h.hour,
             CASE WHEN h.c > med.m THEN 1 ELSE -1 END AS sgn
      FROM hourly h JOIN med ON med.event_type = h.event_type
      WHERE h.c <> med.m),
    runs AS (
      SELECT event_type, sgn,
             CASE WHEN LAG(sgn) OVER w IS NULL
                       OR LAG(sgn) OVER w <> sgn THEN 1 ELSE 0 END AS is_new
      FROM signed
      WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
    st AS (
      SELECT event_type,
             CAST(SUM(is_new) AS BIGINT) AS r,
             CAST(count(*) FILTER (WHERE sgn = 1) AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE sgn = -1) AS BIGINT) AS n2
      FROM runs GROUP BY event_type)
    SELECT event_type, r AS n_runs, n1 AS n_above, n2 AS n_below,
           CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2) + 1.0 AS expected_runs,
           CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1
                     AND 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) > 0
                THEN (r - (CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2) + 1.0))
                     / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                                 AS DOUBLE)
                            / (CAST((n1 + n2) AS DOUBLE) * (n1 + n2)
                               * (n1 + n2 - 1)))
                ELSE NULL END AS z
    FROM st
    WHERE n1 + n2 >= 2
    """,
)
def events_runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD-WOLFOWITZ RUNS TEST on the hourly count series per type: is
    the above/below-median sequence random, or does it clump (|z| > 2
    means momentum/regimes -- autocorrelated load -- which breaks the
    iid assumptions behind naive alerting thresholds)?  Ties at the
    median are excluded (standard).  Runs counted by a lag window;
    n1/n2/r stay integers, the expected-runs and variance formulas are
    single float expressions over them.

    Scale shape: (type, hour) aggregate, a per-type median, one
    type-partitioned lag window over hour counts."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile(c, 0.5)").alias("m")
    )
    signed = (
        hourly.join(med, "event_type")
        .filter(F.col("c") != F.col("m"))
        .select(
            "event_type",
            "hour",
            F.when(F.col("c") > F.col("m"), 1).otherwise(-1).alias("sgn"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    prev = F.lag("sgn").over(w)
    runs = signed.select(
        "event_type",
        "sgn",
        F.when(prev.isNull() | (prev != F.col("sgn")), 1).otherwise(0).alias(
            "is_new"
        ),
    )
    st = runs.groupBy("event_type").agg(
        F.sum("is_new").cast("long").alias("r"),
        F.count_if(F.col("sgn") == 1).cast("long").alias("n1"),
        F.count_if(F.col("sgn") == -1).cast("long").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    ntot = n1 + n2
    er = (2 * n1 * n2).cast("double") / ntot + 1.0
    var = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)).cast("double") / (
        ntot.cast("double") * ntot * (ntot - 1)
    )
    return st.filter(ntot >= 2).select(
        "event_type",
        r.alias("n_runs"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        er.alias("expected_runs"),
        F.when(
            (n1 > 0) & (n2 > 0) & (ntot > 1)
            & (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) > 0),
            (r - er) / F.sqrt(var),
        ).alias("z"),
    )


@_q(
    "session_protocol_violations",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM flagged),
    checked AS (
      SELECT event_type,
             COALESCE(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS saw_view
      FROM sessions)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE saw_view = 0) AS BIGINT) AS n_orphans,
           CAST(count(*) FILTER (WHERE saw_view = 0) AS DOUBLE) / count(*)
             AS orphan_rate
    FROM checked
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
)
def session_protocol_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE-PROTOCOL audit: clicks and purchases with NO earlier
    'view' in the same session -- events that violate the expected
    instrumentation order (bot traffic, lost events, deep links firing
    conversion without exposure).  An orphan_rate that jumps is usually
    a tracking regression, not a behavior change; gate attribution and
    funnel dashboards on it.  The prior-view flag is a running max over
    the session-partitioned window (rows to 1 preceding, so an event
    never vouches for itself).

    Scale shape: the shared sessionize window plus one more
    session-partitioned window; a |types|-sized aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum(F.col("is_new").cast("long")).over(w)
    )
    ws = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    checked = sessions.select(
        "event_type",
        F.coalesce(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).over(ws),
            F.lit(0),
        ).alias("saw_view"),
    )
    orphan = F.count_if(F.col("saw_view") == 0)
    return (
        checked.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            orphan.cast("long").alias("n_orphans"),
            (orphan.cast("double") / F.count(F.lit(1))).alias("orphan_rate"),
        )
    )


@_q(
    "vocab_growth_by_arrival",
    f"""
    WITH mx AS (SELECT CAST(MAX(doc_id) AS BIGINT) + 1 AS m FROM documents),
    toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    dt AS (
      SELECT (doc_id * 20) // mx.m AS bucket, unnest({_SQL_SHINGLES}) AS tok
      FROM toks CROSS JOIN mx),
    fb AS (SELECT tok, CAST(MIN(bucket) AS BIGINT) AS first_bucket
           FROM dt GROUP BY tok),
    nw AS (SELECT first_bucket AS bucket,
                  CAST(count(*) AS BIGINT) AS n_new_types
           FROM fb GROUP BY first_bucket),
    cum AS (
      SELECT a.bucket,
             CAST(SUM(b.n_new_types) AS BIGINT) AS cum_types
      FROM nw a JOIN nw b ON b.bucket <= a.bucket
      GROUP BY a.bucket)
    SELECT nw.bucket, nw.n_new_types, cum.cum_types
    FROM nw JOIN cum ON cum.bucket = nw.bucket
    """,
)
def vocab_growth_by_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY GROWTH CURVE (Heaps' law readout): the corpus in 20
    arrival-order slices (by doc_id), counting 3-gram shingle types first
    seen in each slice and the cumulative shingle vocabulary (shingles,
    not unigrams: the unigram vocab of any corpus saturates in the first
    slice, so the curve would be a degenerate single row) -- still-steep growth at
    the end means the corpus hasn't saturated its domain and a tokenizer
    trained today will be stale; a flat tail says vocab is converged.
    First-seen = MIN(bucket) per token; the cumulative curve is a
    20x20 triangular self-join (bounded), not a global window.

    Scale shape: one token-keyed MIN aggregate, a 20-row bucket
    aggregate + tiny self-join."""
    docs = load_table(spark, sf_dir, "documents")
    from lvm_datapipe_spark.operators.text import tokens

    from lvm_datapipe_spark.operators.dedup import word_ngrams

    mx = docs.agg((F.max("doc_id").cast("long") + 1).alias("m"))
    dt = (
        docs.select(
            "doc_id", F.explode(word_ngrams(tokens("text"), 3)).alias("tok")
        )
        .crossJoin(F.broadcast(mx))
        .select(F.expr("(doc_id * 20) div m").alias("bucket"), "tok")
    )
    fb = dt.groupBy("tok").agg(F.min("bucket").cast("long").alias("first_bucket"))
    nw = fb.groupBy(F.col("first_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new_types")
    )
    b = nw.select(F.col("bucket").alias("b_bucket"), F.col("n_new_types").alias("b_new"))
    cum = (
        nw.select("bucket")
        .join(F.broadcast(b), F.col("b_bucket") <= F.col("bucket"))
        .groupBy("bucket")
        .agg(F.sum("b_new").cast("long").alias("cum_types"))
    )
    return nw.join(cum, "bucket").select("bucket", "n_new_types", "cum_types")


_Z_ALPHA_975 = 1.959963984540054  # Phi^-1(0.975), shared literal
_Z_POWER_80 = 0.8416212335729143  # Phi^-1(0.80), shared literal


@_q(
    "ab_test_mde_readout",
    f"""
    WITH a AS (
      SELECT event_type,
             ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             value
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)),
    m AS (
      SELECT event_type, arm,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6)) * CAST(value AS DECIMAL(9,6)))
                  AS VARCHAR) AS DOUBLE) AS s2
      FROM a GROUP BY event_type, arm),
    p AS (
      SELECT t.event_type, t.n AS n_treat, c.n AS n_ctrl,
             c.s1 / c.n AS mean_ctrl,
             ((t.s2 - t.s1 * t.s1 / t.n) + (c.s2 - c.s1 * c.s1 / c.n))
               / (t.n + c.n - 2) AS pooled_var
      FROM m t JOIN m c ON t.event_type = c.event_type
            AND t.arm = 1 AND c.arm = 0
      WHERE t.n >= 2 AND c.n >= 2)
    SELECT event_type, n_treat, n_ctrl, pooled_var,
           ('{_Z_ALPHA_975!r}'::DOUBLE + '{_Z_POWER_80!r}'::DOUBLE)
             * sqrt(pooled_var * (CAST(1.0 AS DOUBLE) / n_treat
                                  + CAST(1.0 AS DOUBLE) / n_ctrl)) AS mde_abs,
           CASE WHEN mean_ctrl > CAST(0.0 AS DOUBLE)
                THEN ('{_Z_ALPHA_975!r}'::DOUBLE + '{_Z_POWER_80!r}'::DOUBLE)
                     * sqrt(pooled_var * (CAST(1.0 AS DOUBLE) / n_treat
                                          + CAST(1.0 AS DOUBLE) / n_ctrl))
                     / mean_ctrl
                ELSE NULL END AS mde_rel
    FROM p
    """,
)
def ab_test_mde_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINIMUM DETECTABLE EFFECT at the CURRENT sample size (80% power,
    two-sided alpha 0.05) for each metric under the standing md5 user
    split -- the pre-experiment honesty check ("with this traffic you
    can only detect a 4% lift; don't bother running a 1% test").
    Pooled variance from exact decimal power sums (the
    [[ab_test_welch_z]] recipe); the two z constants are SHARED Python
    literals injected into both engines, so the whole expression tree is
    bit-identical.

    Scale shape: one (metric, arm) keyed aggregate, then a 2-arm pivot
    join on tiny rows."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    d6 = F.col("value").cast("decimal(9,6)")
    m = (
        ev.withColumn("arm", hash_bucket("user_id", 2, "ab"))
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(d6).cast("string").cast("double").alias("s1"),
            F.sum(d6 * d6).cast("string").cast("double").alias("s2"),
        )
    )
    t = m.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n_treat"),
        F.col("s1").alias("t1"),
        F.col("s2").alias("t2"),
    )
    c = m.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_ctrl"),
        F.col("s1").alias("c1"),
        F.col("s2").alias("c2"),
    )
    p = (
        t.join(c, "event_type")
        .filter((F.col("n_treat") >= 2) & (F.col("n_ctrl") >= 2))
        .select(
            "event_type",
            "n_treat",
            "n_ctrl",
            (F.col("c1") / F.col("n_ctrl")).alias("mean_ctrl"),
            (
                (
                    (F.col("t2") - F.col("t1") * F.col("t1") / F.col("n_treat"))
                    + (F.col("c2") - F.col("c1") * F.col("c1") / F.col("n_ctrl"))
                )
                / (F.col("n_treat") + F.col("n_ctrl") - 2)
            ).alias("pooled_var"),
        )
    )
    z = F.lit(_Z_ALPHA_975) + F.lit(_Z_POWER_80)
    mde = z * F.sqrt(
        F.col("pooled_var")
        * (
            F.lit(1.0) / F.col("n_treat")
            + F.lit(1.0) / F.col("n_ctrl")
        )
    )
    return p.select(
        "event_type",
        "n_treat",
        "n_ctrl",
        "pooled_var",
        mde.alias("mde_abs"),
        F.when(F.col("mean_ctrl") > 0.0, mde / F.col("mean_ctrl")).alias(
            "mde_rel"
        ),
    )


@_q(
    "ratio_metric_ci_delta",
    f"""
    WITH u AS (
      SELECT ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             CAST(count(*) AS BIGINT) AS x,
             SUM(CAST(value AS DECIMAL(9,6))) AS y
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)
      GROUP BY arm, user_id),
    s AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(y * x) AS VARCHAR) AS DOUBLE) AS sxy
      FROM u GROUP BY arm),
    d AS (
      SELECT arm, n, sx, sy,
             sy / sx AS ratio,
             (syy - sy * sy / n) / (n - 1) AS var_y,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
               AS var_x,
             (sxy - sy * CAST(sx AS DOUBLE) / n) / (n - 1) AS cov_xy,
             CAST(sx AS DOUBLE) / n AS xbar
      FROM s WHERE n >= 2 AND sx > 0)
    SELECT arm, n AS n_users, sx AS total_events, sy AS total_value, ratio,
           sqrt((var_y + ratio * ratio * var_x
                 - CAST(2.0 AS DOUBLE) * ratio * cov_xy)
                / (n * xbar * xbar)) AS se,
           ratio - '{_Z_ALPHA_975!r}'::DOUBLE
             * sqrt((var_y + ratio * ratio * var_x
                     - CAST(2.0 AS DOUBLE) * ratio * cov_xy)
                    / (n * xbar * xbar)) AS ci_lo,
           ratio + '{_Z_ALPHA_975!r}'::DOUBLE
             * sqrt((var_y + ratio * ratio * var_x
                     - CAST(2.0 AS DOUBLE) * ratio * cov_xy)
                    / (n * xbar * xbar)) AS ci_hi
    FROM d
    """,
)
def ratio_metric_ci_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO-METRIC confidence interval by the DELTA METHOD: value per
    event (sum y / sum x over users) with the correct user-clustered
    standard error -- naive per-event SEs are wrong for ratio metrics
    because the denominator is random too; the delta-method variance
    (var_y + R^2 var_x - 2R cov_xy) / (n xbar^2) is the standard fix.
    Every moment (x, x^2 integer; y, y^2, xy decimal) is an exact sum;
    the z constant is the shared Python literal.

    Scale shape: one user-keyed aggregate, one 2-row arm aggregate."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    d6 = F.col("value").cast("decimal(9,6)")
    u = (
        ev.withColumn("arm", hash_bucket("user_id", 2, "ab"))
        .groupBy("arm", "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(d6).alias("y"),
        )
    )
    s = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y").cast("string").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("string").cast("double").alias("syy"),
        F.sum(F.col("y") * F.col("x")).cast("string").cast("double").alias("sxy"),
    )
    n, sx = F.col("n"), F.col("sx")
    ratio = F.col("sy") / sx
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    var_x = (F.col("sxx").cast("double") - sx.cast("double") * sx / n) / (n - 1)
    cov_xy = (F.col("sxy") - F.col("sy") * sx.cast("double") / n) / (n - 1)
    xbar = sx.cast("double") / n
    d = s.filter((n >= 2) & (sx > 0)).select(
        "arm",
        n.alias("n_users"),
        sx.alias("total_events"),
        F.col("sy").alias("total_value"),
        ratio.alias("ratio"),
        var_y.alias("var_y"),
        var_x.alias("var_x"),
        cov_xy.alias("cov_xy"),
        xbar.alias("xbar"),
    )
    se = F.sqrt(
        (
            F.col("var_y")
            + F.col("ratio") * F.col("ratio") * F.col("var_x")
            - F.lit(2.0) * F.col("ratio") * F.col("cov_xy")
        )
        / (F.col("n_users") * F.col("xbar") * F.col("xbar"))
    )
    z = F.lit(_Z_ALPHA_975)
    return d.select(
        "arm",
        "n_users",
        "total_events",
        "total_value",
        "ratio",
        se.alias("se"),
        (F.col("ratio") - z * se).alias("ci_lo"),
        (F.col("ratio") + z * se).alias("ci_hi"),
    )


@_q(
    "revenue_seasonal_indices",
    """
    WITH m AS (
      SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
               + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1 AS month_id,
             CAST(strftime(o_orderdate, '%m') AS INTEGER) AS month_of_year,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DECIMAL(27,6))
               AS rev
      FROM orders GROUP BY month_id, month_of_year),
    ma AS (
      SELECT a.month_id, a.month_of_year, a.rev,
             CAST(count(*) AS BIGINT) AS n_window,
             CAST(SUM(b.rev) AS DECIMAL(27,6)) AS w_rev
      FROM m a JOIN m b ON b.month_id BETWEEN a.month_id - 6
                                          AND a.month_id + 6
      GROUP BY a.month_id, a.month_of_year, a.rev
      HAVING count(*) = 13),
    ratio AS (
      SELECT month_of_year,
             CAST(rev AS DOUBLE)
               / (CAST(w_rev AS DOUBLE) / n_window) AS r
      FROM ma),
    q AS (
      SELECT month_of_year,
             CAST(count(*) AS BIGINT) AS n_years,
             CAST(SUM(CAST(floor(r * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 / count(*) AS seasonal_index
      FROM ratio GROUP BY month_of_year)
    SELECT month_of_year, n_years, seasonal_index
    FROM q
    """,
)
def revenue_seasonal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSICAL SEASONAL DECOMPOSITION indices: each month's revenue
    over its centered 13-month moving average, averaged per
    month-of-year -- index 1.1 means that calendar month runs 10% above
    trend (the multiplicative X-11-style seasonal factor, the input to
    deseasonalized targets and honest YoY comparisons).  The moving
    average is a BOUNDED month-table self-join (BETWEEN +/-6), not a
    window; edge months without a full 13-month window are excluded
    (HAVING = 13), as the textbook method requires.  Revenue stays
    decimal into the ratio; the cross-year mean of ratios uses the
    floor-micro order-free sum.

    Scale shape: one month-keyed aggregate over orders, then
    |months|-sized joins and 12-row output."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(27,6)"
    m = o.groupBy(
        (
            F.year("o_orderdate").cast("long") * 12
            + F.month("o_orderdate").cast("long")
            - 1
        ).alias("month_id"),
        F.month("o_orderdate").cast("int").alias("month_of_year"),
    ).agg(F.sum(F.col("o_totalprice").cast(dec)).cast(dec).alias("rev"))
    b = m.select(
        F.col("month_id").alias("b_id"), F.col("rev").alias("b_rev")
    )
    ma = (
        m.join(
            F.broadcast(b),
            (F.col("b_id") >= F.col("month_id") - 6)
            & (F.col("b_id") <= F.col("month_id") + 6),
        )
        .groupBy("month_id", "month_of_year", "rev")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_window"),
            F.sum("b_rev").cast(dec).alias("w_rev"),
        )
        .filter(F.col("n_window") == 13)
    )
    ratio = ma.select(
        "month_of_year",
        (
            F.col("rev").cast("double")
            / (F.col("w_rev").cast("double") / F.col("n_window"))
        ).alias("r"),
    )
    return ratio.groupBy("month_of_year").agg(
        F.count(F.lit(1)).cast("long").alias("n_years"),
        (
            F.sum(F.floor(F.col("r") * 1000000.0).cast("long")).cast("double")
            / 1000000.0
            / F.count(F.lit(1))
        ).alias("seasonal_index"),
    )


@_q(
    "nation_catalog_jaccard",
    """
    WITH np AS (
      SELECT DISTINCT n.n_name, l.l_partkey
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey),
    sz AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_parts
           FROM np GROUP BY n_name),
    inter AS (
      SELECT a.n_name AS nation_a, b.n_name AS nation_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM np a JOIN np b ON a.l_partkey = b.l_partkey
                         AND a.n_name < b.n_name
      GROUP BY a.n_name, b.n_name)
    SELECT nation_a, nation_b, n_common,
           sa.n_parts AS n_parts_a, sb.n_parts AS n_parts_b,
           CAST(n_common AS DOUBLE)
             / (sa.n_parts + sb.n_parts - n_common) AS jaccard
    FROM inter
    JOIN sz sa ON sa.n_name = nation_a
    JOIN sz sb ON sb.n_name = nation_b
    """,
)
def nation_catalog_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPPLY-CHAIN CATALOG OVERLAP: Jaccard similarity between the part
    catalogs shipped by each pair of nations -- high overlap marks
    substitutable sourcing regions (resilience), low overlap marks
    single-region exposure.  The same posting-list intersection kernel
    as the document dedup family, on relational data: distinct
    (nation, part) rows meet on the PART key, so pair counts come from
    a keyed join -- never a nation x nation x parts product.

    Scale shape: distinct (nation, part) -- one keyed dedup -- then a
    part-keyed self-join whose fan-out per part is bounded by
    |nations|, and a |nations|^2 output."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    np_ = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "l_partkey")
        .distinct()
    )
    sz = np_.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
    a = np_.select(F.col("n_name").alias("nation_a"), "l_partkey")
    bb = np_.select(F.col("n_name").alias("nation_b"), "l_partkey")
    inter = (
        a.join(bb, "l_partkey")
        .filter(F.col("nation_a") < F.col("nation_b"))
        .groupBy("nation_a", "nation_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sz.select(
        F.col("n_name").alias("nation_a"), F.col("n_parts").alias("n_parts_a")
    )
    sb = sz.select(
        F.col("n_name").alias("nation_b"), F.col("n_parts").alias("n_parts_b")
    )
    return (
        inter.join(F.broadcast(sa), "nation_a")
        .join(F.broadcast(sb), "nation_b")
        .select(
            "nation_a",
            "nation_b",
            "n_common",
            "n_parts_a",
            "n_parts_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_parts_a") + F.col("n_parts_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


@_q(
    "knn_label_consistency",
    f"""
    WITH pairs AS ({_lsh_near_dup_sql(n_tables=12)}),
    lab AS (SELECT vec_id, label FROM embeddings
            WHERE label IS NOT NULL),
    sym AS (
      SELECT id_a AS id, id_b AS nb FROM pairs
      UNION ALL
      SELECT id_b AS id, id_a AS nb FROM pairs),
    j AS (
      SELECT la.label AS label,
             CASE WHEN la.label = lb.label THEN 1 ELSE 0 END AS same
      FROM sym
      JOIN lab la ON la.vec_id = sym.id
      JOIN lab lb ON lb.vec_id = sym.nb)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_neighbor_edges,
           CAST(SUM(same) AS BIGINT) AS n_same_label,
           CAST(SUM(same) AS DOUBLE) / count(*) AS consistency
    FROM j GROUP BY label
    """,
)
def knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL NOISE estimate via neighborhood consistency: for each
    class, the fraction of near-neighbor edges (the deterministic LSH
    cosine>=0.4 pair graph) whose endpoints share the label.  A class
    far below the others is either mislabeled at scale or genuinely
    overlaps another -- triage before training, since label noise caps
    attainable accuracy.  All-integer counts over the pair graph; one
    division.

    Scale shape: the LSH pair plan, two vec-keyed label joins, a
    |labels|-sized aggregate."""
    from lvm_datapipe_spark.operators import similarity as V

    emb = load_table(spark, sf_dir, "embeddings")
    lab = emb.filter(F.col("label").isNotNull()).select("vec_id", "label")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4, n_tables=12)
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nb")
    ).unionAll(pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb")))
    la = lab.select(F.col("vec_id").alias("id"), F.col("label").alias("label"))
    lb = lab.select(F.col("vec_id").alias("nb"), F.col("label").alias("nb_label"))
    j = sym.join(la, "id").join(lb, "nb")
    same = F.when(F.col("label") == F.col("nb_label"), 1).otherwise(0)
    return (
        j.select("label", same.alias("same"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neighbor_edges"),
            F.sum("same").cast("long").alias("n_same_label"),
            (F.sum("same").cast("double") / F.count(F.lit(1))).alias(
                "consistency"
            ),
        )
    )


@_q(
    "retrieval_mrr_eval",
    f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv
          FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, q.q_label, e.vec_id AS neighbor_id, e.label,
             {_cos_sql('qv', 'v')} AS cos_sim
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, q_label, label,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
      FROM scored QUALIFY rk <= 10),
    firsthit AS (
      SELECT query_id, MIN(rk) AS first_rel
      FROM ranked WHERE label = q_label GROUP BY query_id),
    rr AS (
      SELECT q.query_id,
             COALESCE(CAST(1.0 AS DOUBLE) / f.first_rel, CAST(0.0 AS DOUBLE))
               AS reciprocal_rank
      FROM (SELECT DISTINCT query_id FROM ranked) q
      LEFT JOIN firsthit f ON f.query_id = q.query_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(SUM(CAST(floor(reciprocal_rank * 1000000.0) AS BIGINT))
                AS DOUBLE) / 1000000.0 / count(*) AS mrr
    FROM rr
    """,
)
def retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEAN RECIPROCAL RANK of the dense-retrieval leg at k=10, with
    same-label as the relevance judgment -- the first-relevant-result
    metric that recall@k can't see (recall treats rank 1 and rank 10
    the same; MRR is what navigation-style use cases feel).  Per-query
    reciprocal ranks are exact rationals 1/rk (0 when no relevant doc in
    the top 10); the cross-query mean uses the floor-micro order-free
    sum.

    Scale shape: the broadcast-queries brute-force scan (10 fixed
    queries), per-query top-10 windows over a GlobalLimit-bounded
    candidate set, then a 10-row aggregate."""
    from lvm_datapipe_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    topk = brute_force_topk(emb, queries, k=10)
    lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    qlab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    ranked = topk.join(lab, "neighbor_id").join(F.broadcast(qlab), "query_id")
    firsthit = (
        ranked.filter(F.col("n_label") == F.col("q_label"))
        .groupBy("query_id")
        .agg(F.min("rank").cast("long").alias("first_rel"))
    )
    allq = ranked.select("query_id").distinct()
    rr = allq.join(firsthit, "query_id", "left").select(
        F.coalesce(
            F.lit(1.0) / F.col("first_rel"), F.lit(0.0)
        ).alias("reciprocal_rank")
    )
    return rr.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (
            F.sum(
                F.floor(F.col("reciprocal_rank") * 1000000.0).cast("long")
            ).cast("double")
            / 1000000.0
            / F.count(F.lit(1))
        ).alias("mrr"),
    )


@_q(
    "ab_test_cuped_adjusted",
    """
    WITH u AS (
      SELECT ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             CAST(CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
                        THEN CAST(value AS DECIMAL(9,6))
                        ELSE CAST(0 AS DECIMAL(9,6)) END) AS VARCHAR)
                  AS DOUBLE) AS x,
             CAST(CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
                        THEN CAST(value AS DECIMAL(9,6))
                        ELSE CAST(0 AS DECIMAL(9,6)) END) AS VARCHAR)
                  AS DOUBLE) AS y
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)
      GROUP BY arm, user_id),
    pool AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(x * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sx,
             CAST(SUM(CAST(floor(y * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sy,
             CAST(SUM(CAST(floor(x * x * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sxx,
             CAST(SUM(CAST(floor(x * y * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sxy
      FROM u),
    th AS (
      SELECT n, sx / n AS xbar_pool,
             CASE WHEN sxx - sx * sx / n > CAST(0.0 AS DOUBLE)
                  THEN (sxy - sx * sy / n) / (sxx - sx * sx / n)
                  ELSE CAST(0.0 AS DOUBLE) END AS theta
      FROM pool),
    arms AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(SUM(CAST(floor(x * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sx,
             CAST(SUM(CAST(floor(y * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sy
      FROM u GROUP BY arm)
    SELECT a.arm, a.n_users,
           a.sy / a.n_users AS mean_post,
           th.theta,
           a.sy / a.n_users
             - th.theta * (a.sx / a.n_users - th.xbar_pool)
             AS mean_cuped
    FROM arms a CROSS JOIN th
    """,
)
def ab_test_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-ADJUSTED experiment means: each arm's post-period metric
    corrected by the pre-period covariate (y_adj = y - theta(x - x_pool),
    theta = cov(x,y)/var(x) pooled) -- the industry-standard variance
    reduction that makes the same traffic detect smaller effects; the
    pre-period is the standing Jan-20 cut, arms the stable md5 split
    (an A/A frame: adjusted means should tighten toward each other).
    Per-user (x, y) are exact decimal sums bridged to identical doubles;
    every cross-user moment uses the floor-micro order-free sum; theta
    and the adjustment are single shared float expressions.

    Scale shape: one user-keyed aggregate, then scalar pooled moments
    and a 2-row arm aggregate."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    cut = F.to_timestamp(F.lit("2024-01-20 00:00:00"))
    d6 = F.col("value").cast("decimal(9,6)")
    z6 = F.lit(0).cast("decimal(9,6)")
    u = (
        ev.withColumn("arm", hash_bucket("user_id", 2, "ab"))
        .groupBy("arm", "user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cut, d6).otherwise(z6))
            .cast("string")
            .cast("double")
            .alias("x"),
            F.sum(F.when(F.col("ts") >= cut, d6).otherwise(z6))
            .cast("string")
            .cast("double")
            .alias("y"),
        )
    )

    def fsum(expr):
        return (
            F.sum(F.floor(expr * 1000000.0).cast("long")).cast("double")
            / 1000000.0
        )

    pool = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        fsum(F.col("x")).alias("sx"),
        fsum(F.col("y")).alias("sy"),
        fsum(F.col("x") * F.col("x")).alias("sxx"),
        fsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    th = pool.select(
        "n",
        (F.col("sx") / F.col("n")).alias("xbar_pool"),
        F.when(
            varx > 0.0,
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / varx,
        )
        .otherwise(F.lit(0.0))
        .alias("theta"),
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        fsum(F.col("x")).alias("sx"),
        fsum(F.col("y")).alias("sy"),
    )
    return arms.crossJoin(F.broadcast(th)).select(
        "arm",
        "n_users",
        (F.col("sy") / F.col("n_users")).alias("mean_post"),
        "theta",
        (
            F.col("sy") / F.col("n_users")
            - F.col("theta")
            * (F.col("sx") / F.col("n_users") - F.col("xbar_pool"))
        ).alias("mean_cuped"),
    )


_QTE_LADDER = "\n               ".join(
    f"WHEN {i} THEN {_pctile_mirror_sql('arr', 'n', i / 10.0)}"
    for i in range(1, 10)
)


@_q(
    "ab_test_quantile_effects",
    f"""
    WITH a AS (
      SELECT ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             value
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)),
    q AS (
      SELECT arm, list(value ORDER BY value) AS arr,
             CAST(count(*) AS BIGINT) AS n
      FROM a GROUP BY arm),
    e AS (
      SELECT arm, u.i AS decile,
             CASE u.i
               {_QTE_LADDER}
             END AS q
      FROM q CROSS JOIN (SELECT unnest(range(1, 10)) AS i) u)
    SELECT CAST(t.decile AS INTEGER) AS decile,
           t.q AS q_treat, c.q AS q_ctrl,
           t.q - c.q AS qte
    FROM (SELECT * FROM e WHERE arm = 1) t
    JOIN (SELECT * FROM e WHERE arm = 0) c ON c.decile = t.decile
    """,
)
def ab_test_quantile_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE TREATMENT EFFECTS: the treated-minus-control difference
    at each decile of the metric distribution -- means hide it when an
    effect lives only in the tail (p90 moves, median doesn't), and QTE
    is the standard distributional readout.  Decile fractions i/10 are
    the same Python-exact literals on both engines; the oracle replays
    Spark's interpolation verbatim via ``_pctile_mirror_sql`` (DuckDB's
    quantile_cont rounds differently -- measured, see the helper).

    Scale shape: two percentile aggregates (partial-merged) + a 9-row
    join."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    fracs = ", ".join(repr(x / 10.0) for x in range(1, 10))
    q = (
        ev.withColumn("arm", hash_bucket("user_id", 2, "ab"))
        .groupBy("arm")
        .agg(F.expr(f"percentile(value, array({fracs}))").alias("qs"))
    )
    e = q.select(
        "arm", F.posexplode(F.col("qs")).alias("pos0", "q")
    ).select("arm", (F.col("pos0") + 1).alias("decile"), "q")
    t = e.filter(F.col("arm") == 1).select("decile", F.col("q").alias("q_treat"))
    c = e.filter(F.col("arm") == 0).select("decile", F.col("q").alias("q_ctrl"))
    return t.join(c, "decile").select(
        F.col("decile").cast("int").alias("decile"),
        "q_treat",
        "q_ctrl",
        (F.col("q_treat") - F.col("q_ctrl")).alias("qte"),
    )


@_q(
    "iqr_outlier_fences_by_type",
    f"""
    WITH a AS (SELECT event_type, value FROM events
               WHERE value IS NOT NULL),
    s AS (SELECT event_type, list(value ORDER BY value) AS arr,
                 CAST(count(*) AS BIGINT) AS n
          FROM a GROUP BY event_type),
    f AS (SELECT event_type, n,
                 {{p25}} AS p25,
                 {{p75}} AS p75
          FROM s),
    fence AS (SELECT event_type, n, p25, p75,
                     p25 - CAST(1.5 AS DOUBLE) * (p75 - p25) AS lo_fence,
                     p75 + CAST(1.5 AS DOUBLE) * (p75 - p25) AS hi_fence
              FROM f)
    SELECT fe.event_type, fe.n AS n_events, fe.p25, fe.p75,
           fe.lo_fence, fe.hi_fence,
           CAST(count(*) FILTER (WHERE a.value < fe.lo_fence
                                    OR a.value > fe.hi_fence) AS BIGINT)
             AS n_outliers,
           CAST(count(*) FILTER (WHERE a.value < fe.lo_fence
                                    OR a.value > fe.hi_fence) AS DOUBLE)
             / fe.n AS outlier_rate
    FROM a JOIN fence fe ON fe.event_type = a.event_type
    GROUP BY fe.event_type, fe.n, fe.p25, fe.p75, fe.lo_fence, fe.hi_fence
    """.format(
        p25=_pctile_mirror_sql("arr", "n", 0.25),
        p75=_pctile_mirror_sql("arr", "n", 0.75),
    ),
)
def iqr_outlier_fences_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUKEY-FENCE outlier readout per metric: p25/p75, the 1.5xIQR
    fences, and how many events fall outside them -- the boxplot
    numbers, robust where z-scores break (the [[events_zscore_outliers]]
    sibling for heavy-tailed metrics whose sigma is itself polluted by
    the outliers).  Fractional quantiles are safe cross-engine ONLY via
    the _pctile_mirror_sql replay of Spark's interpolation.

    Scale shape: one percentile aggregate per type + one broadcast-join
    count pass; no windows."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.75)").alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    fence = q.select(
        "event_type",
        "n",
        "p25",
        "p75",
        (F.col("p25") - 1.5 * iqr).alias("lo_fence"),
        (F.col("p75") + 1.5 * iqr).alias("hi_fence"),
    )
    j = ev.join(F.broadcast(fence), "event_type")
    out = F.count_if(
        (F.col("value") < F.col("lo_fence"))
        | (F.col("value") > F.col("hi_fence"))
    )
    return j.groupBy(
        "event_type", "n", "p25", "p75", "lo_fence", "hi_fence"
    ).agg(
        out.cast("long").alias("n_outliers"),
        (out.cast("double") / F.col("n")).alias("outlier_rate"),
    ).select(
        "event_type",
        F.col("n").alias("n_events"),
        "p25",
        "p75",
        "lo_fence",
        "hi_fence",
        "n_outliers",
        "outlier_rate",
    )


@_q(
    "daily_value_percentile_trend",
    f"""
    WITH a AS (SELECT CAST(ts AS DATE) AS day, value FROM events
               WHERE value IS NOT NULL),
    s AS (SELECT day, list(value ORDER BY value) AS arr,
                 CAST(count(*) AS BIGINT) AS n
          FROM a GROUP BY day)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           n AS n_events,
           {{p50}} AS p50,
           {{p90}} AS p90,
           {{p99}} AS p99
    FROM s
    """.format(
        p50=_pctile_mirror_sql("arr", "n", 0.5),
        p90=_pctile_mirror_sql("arr", "n", 0.9),
        p99=_pctile_mirror_sql("arr", "n", 0.99),
    ),
)
def daily_value_percentile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAILY p50/p90/p99 TREND of the metric -- the SLO dashboard query
    (means hide tail regressions; a p99 that doubles while p50 is flat
    is the classic incident signature).  One percentile aggregate per
    day; the oracle replays Spark's interpolation via
    _pctile_mirror_sql.

    Scale shape: day-keyed percentile aggregate (partial-merged); day
    projected to ISO string for cross-engine date typing."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .withColumn("day", F.date_format("day", "yyyy-MM-dd"))
        .select("day", "n_events", "p50", "p90", "p99")
    )


def _pq_distortion_sql(
    m: int = 32, ksub: int = 8, dim: int = _EMB_DIM, seed: int = 7
) -> str:
    """DuckDB replay of PQ reconstruction distortion: per-subspace min
    squared distance to the seeded codebook (same literals and fold
    order as _pq_adc_sql), averaged with the floor-micro order-free
    sum."""
    from lvm_datapipe_spark.operators.similarity import pq_codebooks

    dsub = dim // m
    cbs = pq_codebooks(m, ksub, dsub, seed)

    def dist(vec: str, j: int, cent) -> str:
        s = j * dsub
        terms = " + ".join(
            f"(({vec}[{s + i + 1}] - CAST('{float(cent[i])!r}' AS DOUBLE))"
            f" * ({vec}[{s + i + 1}] - CAST('{float(cent[i])!r}' AS DOUBLE)))"
            for i in range(dsub)
        )
        return f"(0.0 + {terms})"

    def dmin(vec: str, j: int) -> str:
        return (
            "list_min(["
            + ", ".join(dist(vec, j, cbs[j][c]) for c in range(ksub))
            + "])"
        )

    ladder = "\n               ".join(
        f"WHEN {j} THEN {dmin('v', j)}" for j in range(m)
    )
    return f"""
    WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    d AS (
      SELECT u.j AS subspace,
             CASE u.j
               {ladder}
             END AS dmin
      FROM e CROSS JOIN (SELECT unnest(range(0, {m})) AS j) u)
    SELECT CAST(subspace AS INTEGER) AS subspace,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CAST(floor(dmin * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / count(*) AS mse
    FROM d GROUP BY subspace
    """


@_q("pq_distortion_by_subspace", _pq_distortion_sql())
def pq_distortion_by_subspace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ QUANTIZATION DISTORTION per subspace: the mean squared
    reconstruction error of each subvector under its best code -- the
    index-quality readout that says WHERE the compressed representation
    loses signal (a subspace with 3x the distortion of its peers is
    where ADC ranking errors come from; retrain or re-split there).
    Distances reuse the exact seeded-codebook fold of the ADC path;
    means use the floor-micro order-free sum.

    Scale shape: one corpus scan (the same no-shuffle encode shape as
    pq_encode), a 32x explode, one 32-row aggregate."""
    from lvm_datapipe_spark.operators.similarity import (
        _pq_dists_sql,
        as_double,
        pq_codebooks,
    )

    m, ksub, dim, seed = 32, 8, _EMB_DIM, 7
    dsub = dim // m
    cbs = pq_codebooks(m, ksub, dsub, seed)
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    e = emb.select(as_double("embedding").alias("nv"))
    cols = [
        F.struct(
            F.lit(j).alias("subspace"),
            F.expr(
                f"array_min({_pq_dists_sql('nv', j, cbs[j], dsub)})"
            ).alias("dmin"),
        )
        for j in range(m)
    ]
    d = e.select(F.explode(F.array(*cols)).alias("s")).select(
        F.col("s.subspace").cast("int").alias("subspace"),
        F.col("s.dmin").alias("dmin"),
    )
    return d.groupBy("subspace").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        (
            F.sum(F.floor(F.col("dmin") * 1000000.0).cast("long")).cast(
                "double"
            )
            / 1000000.0
            / F.count(F.lit(1))
        ).alias("mse"),
    )


def _ivf_occupancy_sql(n_cells: int = 16, seed: int = 42, dim: int = _EMB_DIM) -> str:
    """DuckDB replay of the IVF cell-assignment histogram (same centroid
    literals and first-index argmax as _ivf_fixed_sql)."""
    from lvm_datapipe_spark.operators.similarity import ivf_fixed_centroids

    cents = ivf_fixed_centroids(n_cells, dim, seed)

    def cos_lit(v: str, c) -> str:
        dot_vc = " + ".join(
            f"{v}[{i + 1}]*('{float(c[i])!r}'::DOUBLE)" for i in range(dim)
        )
        dot_cc = sum(float(x) * float(x) for x in c)
        return f"(({dot_vc}) / (sqrt({_dot_sql(v, v)}) * sqrt('{dot_cc!r}'::DOUBLE)))"

    sims = "[" + ", ".join(cos_lit("v", c) for c in cents) + "]"
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT CAST(list_indexof({sims}, list_max({sims})) - 1 AS INTEGER)
            AS cell
          FROM e),
    t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM c)
    SELECT c.cell, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(*) AS DOUBLE) / t.total AS share,
           CAST(count(*) AS DOUBLE) * {n_cells} / t.total AS load_factor
    FROM c CROSS JOIN t
    GROUP BY c.cell, t.total
    """


@_q("ivf_cell_occupancy", _ivf_occupancy_sql())
def ivf_cell_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF CELL OCCUPANCY histogram: vectors per quantizer cell, share,
    and load factor (1.0 = perfectly balanced) -- the partition-skew
    readout for the ANN index itself: a cell with load_factor 5 makes
    every probe that touches it 5x the work, and at 100 TB cell
    imbalance IS the query-latency tail.  Same seeded centroids and
    first-index argmax as the search path.

    Scale shape: one corpus scan for assignment (no shuffle), a 16-row
    aggregate against a scalar total."""
    from lvm_datapipe_spark.operators.similarity import ivf_fixed_assign

    emb = load_table(spark, sf_dir, "embeddings")
    c = ivf_fixed_assign(emb).select("cell")
    t = c.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        c.groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .crossJoin(F.broadcast(t))
        .select(
            "cell",
            "n_vectors",
            (F.col("n_vectors").cast("double") / F.col("total")).alias("share"),
            (
                F.col("n_vectors").cast("double") * 16 / F.col("total")
            ).alias("load_factor"),
        )
    )


def _lsh_buckets_sql(
    n_planes: int = 4, n_tables: int = 8, seed: int = 42, dim: int = _EMB_DIM
) -> str:
    """Bucket-assignment CTE body shared with _lsh_near_dup_sql (same
    seeded plane literals)."""
    from lvm_datapipe_spark.operators.similarity import lsh_table_planes

    selects = []
    for t, planes in enumerate(lsh_table_planes(n_planes, n_tables, dim, seed)):
        bits = " || ".join(
            "(CASE WHEN ("
            + " + ".join(
                f"v[{i + 1}]*('{float(planes[b][i])!r}'::DOUBLE)"
                for i in range(dim)
            )
            + ") >= 0 THEN '1' ELSE '0' END)"
            for b in range(n_planes)
        )
        selects.append(f"SELECT vec_id, {t} AS tbl, {bits} AS bucket FROM e")
    return "\nUNION ALL\n".join(selects)


@_q(
    "lsh_bucket_cost_readout",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    buckets AS ({_lsh_buckets_sql(n_tables=12)}),
    bs AS (SELECT tbl, bucket, CAST(count(*) AS BIGINT) AS s
           FROM buckets GROUP BY tbl, bucket)
    SELECT tbl AS lsh_table,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(MAX(s) AS BIGINT) AS max_bucket,
           CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS n_candidate_pairs
    FROM bs GROUP BY tbl
    """,
)
def lsh_bucket_cost_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH TUNING COST readout: per hash table, the number of occupied
    buckets, the largest bucket, and the candidate-pair bill
    sum(s choose 2) the verify stage will pay -- the number that decides
    whether to add planes (buckets too fat -> candidates ~ n^2/2^planes)
    or tables (recall too low).  The companion to [[ivf_cell_occupancy]]
    for the LSH index; the SCALE_BENCH plane-sizing rule
    (planes ~ log2(n/100)) exists precisely to keep this readout flat.
    Integer arithmetic from the same seeded plane literals as the search
    path.

    Scale shape: one scan computes all 12 tables' buckets, one
    (table, bucket)-keyed aggregate, a 12-row summary."""
    from lvm_datapipe_spark.operators.similarity import (
        _sql_sign_bit,
        as_double,
        lsh_table_planes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    entries = []
    for t, planes in enumerate(lsh_table_planes(4, 12, _EMB_DIM, 42)):
        bits = ", ".join(_sql_sign_bit(pl) for pl in planes)
        entries.append(f"struct({t} AS tbl, concat({bits}) AS bucket)")
    buckets = (
        emb.select(as_double("embedding").alias("_v"))
        .select(F.explode(F.expr("array(" + ",".join(entries) + ")")).alias("tb"))
        .select("tb.tbl", "tb.bucket")
    )
    bs = buckets.groupBy("tbl", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    return bs.groupBy(F.col("tbl").alias("lsh_table")).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("s").cast("long").alias("max_bucket"),
        F.sum(F.expr("s * (s - 1) div 2")).cast("long").alias(
            "n_candidate_pairs"
        ),
    )


@_q(
    "minhash_s_curve_calibration",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= 1000),
    exk AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN keep USING (shingle)),
    sz AS (SELECT doc_id, CAST(len(s) AS INTEGER) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM exk a JOIN exk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (SELECT id_a, id_b,
                   n_common / (sa.n + sb.n - n_common) AS j
            FROM inter
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b),
    mh AS ({_minhash_pairs_sql()}),
    lab AS (
      SELECT CASE WHEN j >= 0.8 THEN '0.8-1.0'
                  WHEN j >= 0.6 THEN '0.6-0.8'
                  WHEN j >= 0.4 THEN '0.4-0.6'
                  WHEN j >= 0.2 THEN '0.2-0.4'
                  ELSE '0.0-0.2' END AS jaccard_band,
             CASE WHEN mh.id_a IS NOT NULL THEN 1 ELSE 0 END AS collided
      FROM jac LEFT JOIN mh ON mh.id_a = jac.id_a AND mh.id_b = jac.id_b)
    SELECT jaccard_band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(SUM(collided) AS BIGINT) AS n_collided,
           CAST(SUM(collided) AS DOUBLE) / count(*) AS collision_rate
    FROM lab GROUP BY jaccard_band
    """,
)
def minhash_s_curve_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINHASH S-CURVE CALIBRATION: the empirical banding collision rate
    at each true-Jaccard band -- the measured version of the textbook
    P(collide) = 1-(1-s^r)^b curve, on THIS corpus with THIS (b=4, r=4)
    configuration.  High collision below the dedup threshold means
    wasted verify work; low collision above it means missed duplicates
    -- this table says which, without trusting the idealized formula
    (which assumes perfect minwise hashes).  Candidate pairs and their
    exact Jaccard come from the capped intersection kernel; the
    collision flag is a keyed left join against the banded pair set.

    Scale shape: the capped posting-list intersection (bounded), the
    banded MinHash plan, one (id_a, id_b)-keyed join, a 5-row
    aggregate."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    cached = D.shingle_rows(docs).persist()
    sizes = cached.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = D.shingle_intersections(cached, "doc_id", 1000)
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    j = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("j"),
        )
    )
    mh = D.minhash_lsh_pairs(docs).select(
        "id_a", "id_b", F.lit(1).alias("collided")
    )
    lab = j.join(mh, ["id_a", "id_b"], "left").select(
        F.when(F.col("j") >= 0.8, "0.8-1.0")
        .when(F.col("j") >= 0.6, "0.6-0.8")
        .when(F.col("j") >= 0.4, "0.4-0.6")
        .when(F.col("j") >= 0.2, "0.2-0.4")
        .otherwise("0.0-0.2")
        .alias("jaccard_band"),
        F.coalesce(F.col("collided"), F.lit(0)).alias("collided"),
    )
    out = lab.groupBy("jaccard_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("collided").cast("long").alias("n_collided"),
        (F.sum("collided").cast("double") / F.count(F.lit(1))).alias(
            "collision_rate"
        ),
    )
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    return _with_cached_deps(out, [cached])


@_q(
    "discount_qty_ols_by_brand",
    """
    WITH j AS (
      SELECT p.p_brand,
             CAST(l.l_quantity AS DECIMAL(9,4)) AS y,
             CAST(l.l_discount AS DECIMAL(9,4)) AS x
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    s AS (
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
      FROM j GROUP BY p_brand HAVING count(*) >= 3),
    f AS (
      SELECT p_brand, n, sx, sy, sxx, sxy, syy,
             sxx - sx * sx / n AS ssx,
             syy - sy * sy / n AS ssy,
             sxy - sx * sy / n AS spxy
      FROM s)
    SELECT p_brand, n AS n_lineitems,
           CASE WHEN ssx > CAST(0.0 AS DOUBLE)
                THEN spxy / ssx ELSE NULL END AS slope,
           CASE WHEN ssx > CAST(0.0 AS DOUBLE)
                THEN sy / n - (spxy / ssx) * (sx / n) ELSE NULL END
             AS intercept,
           CASE WHEN ssx > CAST(0.0 AS DOUBLE)
                     AND ssy > CAST(0.0 AS DOUBLE)
                THEN (spxy / ssx) * spxy / ssy ELSE NULL END AS r_squared
    FROM f
    """,
)
def discount_qty_ols_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT OLS per brand: quantity regressed on discount (does a
    deeper discount actually move volume, and for which brands?) --
    slope, intercept, R^2 from exact decimal moment sums (quantity and
    discount both quantize losslessly at 4 decimals), the
    VARCHAR->double bridge at fixed points, guarded against
    zero-variance groups.  The parametric sibling of
    [[theil_sen_slope_by_user]].

    Scale shape: one partkey-keyed join, one brand-keyed moment
    aggregate; everything after is |brands| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    x = F.col("l_discount").cast("decimal(9,4)")
    y = F.col("l_quantity").cast("decimal(9,4)")
    j = li.join(p, li.l_partkey == p.p_partkey).select(
        "p_brand", y.alias("y"), x.alias("x")
    )
    s = (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("string").cast("double").alias("sx"),
            F.sum("y").cast("string").cast("double").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("string").cast("double").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("string").cast("double").alias("sxy"),
            F.sum(F.col("y") * F.col("y")).cast("string").cast("double").alias("syy"),
        )
        .filter(F.col("n") >= 3)
    )
    n = F.col("n")
    ssx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    ssy = F.col("syy") - F.col("sy") * F.col("sy") / n
    spxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    f = s.select(
        "p_brand", n.alias("n_lineitems"), F.col("sx").alias("sx"),
        F.col("sy").alias("sy"), ssx.alias("ssx"), ssy.alias("ssy"),
        spxy.alias("spxy"), n.alias("n"),
    )
    slope = F.col("spxy") / F.col("ssx")
    return f.select(
        "p_brand",
        "n_lineitems",
        F.when(F.col("ssx") > 0.0, slope).alias("slope"),
        F.when(
            F.col("ssx") > 0.0,
            F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n")),
        ).alias("intercept"),
        F.when(
            (F.col("ssx") > 0.0) & (F.col("ssy") > 0.0),
            slope * F.col("spxy") / F.col("ssy"),
        ).alias("r_squared"),
    )


@_q(
    "cluster_design_effect",
    """
    WITH u AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS m,
             SUM(CAST(value AS DECIMAL(9,6))) AS sd1
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)
      GROUP BY user_id),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(m * m) AS BIGINT) AS smm,
             CAST(SUM(CAST(floor(
               (CAST(CAST(sd1 AS VARCHAR) AS DOUBLE)
                * CAST(CAST(sd1 AS VARCHAR) AS DOUBLE)) / m
               * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS bsum
      FROM u),
    tot AS (
      SELECT CAST(CAST(SUM(CAST(value AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE)
               AS s1,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,6))
                           * CAST(value AS DECIMAL(9,6))) AS VARCHAR)
                  AS DOUBLE) AS s2
      FROM events WHERE abs(value) < CAST(1000.0 AS DOUBLE)),
    comp AS (
      SELECT g.k, g.n, g.smm,
             (g.bsum - tot.s1 * tot.s1 / g.n) / (g.k - 1) AS ms_between,
             (tot.s2 - g.bsum) / (g.n - g.k) AS ms_within,
             (CAST(g.n AS DOUBLE) - CAST(g.smm AS DOUBLE) / g.n) / (g.k - 1)
               AS m0
      FROM g CROSS JOIN tot
      WHERE g.k >= 2 AND g.n > g.k)
    SELECT k AS n_clusters, n AS n_events, ms_between, ms_within, m0,
           (ms_between - ms_within)
             / (ms_between + (m0 - CAST(1.0 AS DOUBLE)) * ms_within) AS icc,
           CAST(1.0 AS DOUBLE) + (m0 - CAST(1.0 AS DOUBLE))
             * ((ms_between - ms_within)
                / (ms_between + (m0 - CAST(1.0 AS DOUBLE)) * ms_within))
             AS design_effect
    FROM comp
    """,
)
def cluster_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER DESIGN EFFECT (DEFF) for user-clustered metrics: the
    ANOVA-estimated intraclass correlation (one-way random effects,
    unequal cluster sizes via the m0 correction) and
    DEFF = 1 + (m0-1)*ICC -- the factor by which user-level clustering
    inflates the variance of event-level means, i.e. how much your
    effective sample size shrinks when you analyze events but randomize
    users (the quantitative justification for the delta-method /
    user-level analyses in this family).  All moments are exact decimal
    sums; the between-cluster sum uses the floor-micro order-free
    recipe.

    Scale shape: one user-keyed aggregate, one corpus power-sum
    aggregate, scalar math after."""
    ev = load_table(spark, sf_dir, "events").filter(F.abs(F.col("value")) < 1000.0)
    d6 = F.col("value").cast("decimal(9,6)")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(d6).alias("sd1"),
    )
    s1g = F.col("sd1").cast("string").cast("double")
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("smm"),
        (
            F.sum(
                F.floor((s1g * s1g) / F.col("m") * 1000000.0).cast("long")
            ).cast("double")
            / 1000000.0
        ).alias("bsum"),
    )
    tot = ev.agg(
        F.sum(d6).cast("string").cast("double").alias("s1"),
        F.sum(d6 * d6).cast("string").cast("double").alias("s2"),
    )
    c = g.crossJoin(F.broadcast(tot)).filter(
        (F.col("k") >= 2) & (F.col("n") > F.col("k"))
    )
    msb = (F.col("bsum") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("k") - 1
    )
    msw = (F.col("s2") - F.col("bsum")) / (F.col("n") - F.col("k"))
    m0 = (
        F.col("n").cast("double")
        - F.col("smm").cast("double") / F.col("n")
    ) / (F.col("k") - 1)
    comp = c.select(
        F.col("k").alias("n_clusters"),
        F.col("n").alias("n_events"),
        msb.alias("ms_between"),
        msw.alias("ms_within"),
        m0.alias("m0"),
    )
    icc = (F.col("ms_between") - F.col("ms_within")) / (
        F.col("ms_between") + (F.col("m0") - 1.0) * F.col("ms_within")
    )
    return comp.select(
        "n_clusters",
        "n_events",
        "ms_between",
        "ms_within",
        "m0",
        icc.alias("icc"),
        (F.lit(1.0) + (F.col("m0") - 1.0) * icc).alias("design_effect"),
    )


@_q(
    "mcnemar_pre_post_conversion",
    """
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase'
                       AND ts < TIMESTAMP '2024-01-20 00:00:00'
                 THEN 1 ELSE 0 END) AS pre,
             MAX(CASE WHEN event_type = 'purchase'
                       AND ts >= TIMESTAMP '2024-01-20 00:00:00'
                 THEN 1 ELSE 0 END) AS post
      FROM events GROUP BY user_id),
    c AS (
      SELECT CAST(count(*) FILTER (WHERE pre = 1 AND post = 1) AS BIGINT) AS n11,
             CAST(count(*) FILTER (WHERE pre = 1 AND post = 0) AS BIGINT) AS n10,
             CAST(count(*) FILTER (WHERE pre = 0 AND post = 1) AS BIGINT) AS n01,
             CAST(count(*) FILTER (WHERE pre = 0 AND post = 0) AS BIGINT) AS n00
      FROM u)
    SELECT n11, n10, n01, n00,
           CASE WHEN n10 + n01 > 0
                THEN CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)
                ELSE NULL END AS mcnemar_chi2
    FROM c
    """,
)
def mcnemar_pre_post_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST on paired pre/post conversion: each user is their
    own control (converted before the Jan-20 cut? after?), and only the
    DISCORDANT cells matter -- chi2 = (n10-n01)^2/(n10+n01), the correct
    paired-binary test where a two-proportion z on the same users would
    be wrong (it ignores the pairing).  All-integer cells, one guarded
    float expression.

    Scale shape: one user-keyed conditional-max aggregate, then a
    single-row 2x2 readout."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.to_timestamp(F.lit("2024-01-20 00:00:00"))
    is_p = F.col("event_type") == "purchase"
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(is_p & (F.col("ts") < cut), 1).otherwise(0)
        ).alias("pre"),
        F.max(
            F.when(is_p & (F.col("ts") >= cut), 1).otherwise(0)
        ).alias("post"),
    )

    def cell(a, b):
        return F.count_if((F.col("pre") == a) & (F.col("post") == b)).cast(
            "long"
        )

    c = u.agg(
        cell(1, 1).alias("n11"),
        cell(1, 0).alias("n10"),
        cell(0, 1).alias("n01"),
        cell(0, 0).alias("n00"),
    )
    disc = F.col("n10") + F.col("n01")
    return c.select(
        "n11",
        "n10",
        "n01",
        "n00",
        F.when(
            disc > 0,
            ((F.col("n10") - F.col("n01")) * (F.col("n10") - F.col("n01"))).cast(
                "double"
            )
            / disc,
        ).alias("mcnemar_chi2"),
    )


@_q(
    "cmh_stratified_conversion",
    """
    WITH u AS (
      SELECT user_id,
             ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             CAST(count(*) AS BIGINT) AS activity,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id),
    s AS (
      SELECT CASE WHEN activity <= 2 THEN '01_low'
                  WHEN activity <= 5 THEN '02_mid'
                  WHEN activity <= 10 THEN '03_high'
                  ELSE '04_power' END AS stratum,
             arm, converted
      FROM u),
    cells AS (
      SELECT stratum,
             CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
               AS x1,
             CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
               AS x0
      FROM s GROUP BY stratum),
    terms AS (
      SELECT stratum, n1, n0, x1, x0,
             CAST(floor((CAST(x1 AS DOUBLE)
                  - CAST(n1 AS DOUBLE) * (x1 + x0) / (n1 + n0))
                  * 1000000.0) AS BIGINT) AS t_micro,
             CAST(floor((CAST(n1 AS DOUBLE) * n0 * (x1 + x0)
                         * ((n1 + n0) - (x1 + x0)))
                        / (CAST((n1 + n0) AS DOUBLE) * (n1 + n0)
                           * ((n1 + n0) - 1))
                  * 1000000.0) AS BIGINT) AS v_micro
      FROM cells
      WHERE n1 + n0 >= 2)
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           CAST(SUM(t_micro) AS DOUBLE) / 1000000.0 AS t_stat,
           CAST(SUM(v_micro) AS DOUBLE) / 1000000.0 AS v_stat,
           CASE WHEN SUM(v_micro) > 0
                THEN (CAST(SUM(t_micro) AS DOUBLE) / 1000000.0)
                     * (CAST(SUM(t_micro) AS DOUBLE) / 1000000.0)
                     / (CAST(SUM(v_micro) AS DOUBLE) / 1000000.0)
                ELSE NULL END AS cmh_chi2
    FROM terms
    """,
)
def cmh_stratified_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN-MANTEL-HAENSZEL test of arm vs conversion STRATIFIED by
    user activity tier -- the correct pooled test when conversion and
    assignment balance both vary across strata (pooling the raw 2x2
    invites Simpson's paradox; CMH sums per-stratum evidence
    T = x1 - E[x1|margins] against its hypergeometric variance).
    Per-stratum terms are single float expressions over integer cells;
    cross-stratum sums use the floor-micro order-free recipe.

    Scale shape: one user-keyed aggregate, a 4-stratum cell aggregate,
    scalar math."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("activity"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    ).withColumn("arm", hash_bucket("user_id", 2, "ab"))
    stratum = (
        F.when(F.col("activity") <= 2, "01_low")
        .when(F.col("activity") <= 5, "02_mid")
        .when(F.col("activity") <= 10, "03_high")
        .otherwise("04_power")
    )
    cells = u.select(stratum.alias("stratum"), "arm", "converted").groupBy(
        "stratum"
    ).agg(
        F.count_if(F.col("arm") == 1).cast("long").alias("n1"),
        F.count_if(F.col("arm") == 0).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x0"),
    )
    n1, n0, x1, x0 = (F.col(c) for c in ("n1", "n0", "x1", "x0"))
    ns = n1 + n0
    ms = x1 + x0
    t = x1.cast("double") - n1.cast("double") * ms / ns
    v = (n1.cast("double") * n0 * ms * (ns - ms)) / (
        ns.cast("double") * ns * (ns - 1)
    )
    terms = cells.filter(ns >= 2).select(
        F.floor(t * 1000000.0).cast("long").alias("t_micro"),
        F.floor(v * 1000000.0).cast("long").alias("v_micro"),
    )
    ts = F.sum("t_micro").cast("double") / 1000000.0
    vs = F.sum("v_micro").cast("double") / 1000000.0
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        ts.alias("t_stat"),
        vs.alias("v_stat"),
        F.when(F.sum("v_micro") > 0, ts * ts / vs).alias("cmh_chi2"),
    )


@_q(
    "embedding_norm_histogram",
    f"""
    WITH e AS (
      SELECT sqrt({_dot_sql('v', 'v')}) AS nrm
      FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings
            WHERE embedding IS NOT NULL)),
    b AS (
      SELECT CASE WHEN nrm < CAST(0.5 AS DOUBLE) THEN '0.0-0.5'
                  WHEN nrm < CAST(0.9 AS DOUBLE) THEN '0.5-0.9'
                  WHEN nrm < CAST(1.1 AS DOUBLE) THEN '0.9-1.1'
                  WHEN nrm < CAST(2.0 AS DOUBLE) THEN '1.1-2.0'
                  ELSE '2.0+' END AS norm_band
      FROM e)
    SELECT norm_band, CAST(count(*) AS BIGINT) AS n_vectors
    FROM b GROUP BY norm_band
    """,
)
def embedding_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING NORM sanity histogram: vectors bucketed by L2 norm
    around the expected unit shell -- zero-norm rows are dead encoder
    outputs, far-out norms are scale bugs or mixed checkpoint versions;
    either silently poisons cosine math downstream (this is the check
    that runs BEFORE the similarity family).  The norm is one
    left-associated dot fold + sqrt; the banding is a literal CASE
    ladder; counts exact.

    Scale shape: one scan, one 5-row aggregate."""
    from lvm_datapipe_spark.operators.similarity import as_double, dot_flat

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    nrm = F.sqrt(
        dot_flat(as_double("embedding"), as_double("embedding"), _EMB_DIM)
    )
    band = (
        F.when(nrm < 0.5, "0.0-0.5")
        .when(nrm < 0.9, "0.5-0.9")
        .when(nrm < 1.1, "0.9-1.1")
        .when(nrm < 2.0, "1.1-2.0")
        .otherwise("2.0+")
    )
    return (
        emb.select(band.alias("norm_band"))
        .groupBy("norm_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    )


@_q(
    "user_recency_weighted_value",
    """
    WITH mx AS (SELECT CAST(MAX(CAST(ts AS DATE)) - DATE '1970-01-01'
                            AS BIGINT) AS max_day
                FROM events),
    ev AS (
      SELECT user_id,
             (mx.max_day
              - CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)) // 7
               AS age_weeks,
             CAST(value AS DECIMAL(9,6)) AS v
      FROM events CROSS JOIN mx
      WHERE value > CAST(0.0 AS DOUBLE) AND abs(value) < CAST(1000.0 AS DOUBLE)),
    w AS (
      SELECT user_id,
             CAST(CAST(v AS VARCHAR) AS DOUBLE)
               * (CASE age_weeks WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
                                 WHEN 2 THEN 0.25 WHEN 3 THEN 0.125
                                 WHEN 4 THEN 0.0625 WHEN 5 THEN 0.03125
                                 WHEN 6 THEN 0.015625 WHEN 7 THEN 0.0078125
                                 ELSE 0.0 END) AS wv
      FROM ev),
    score AS (
      SELECT user_id,
             CAST(SUM(CAST(floor(wv * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS s
      FROM w GROUP BY user_id),
    med AS (
      SELECT (CASE WHEN (('0.5'::DOUBLE) * (n - 1)) = floor(('0.5'::DOUBLE) * (n - 1)) OR CAST(arr[CAST(floor(('0.5'::DOUBLE) * (n - 1)) AS BIGINT) + 1] AS DOUBLE) = CAST(arr[CAST(floor(('0.5'::DOUBLE) * (n - 1)) AS BIGINT) + 2] AS DOUBLE) THEN CAST(arr[CAST(floor(('0.5'::DOUBLE) * (n - 1)) AS BIGINT) + 1] AS DOUBLE) ELSE CAST(arr[CAST(floor(('0.5'::DOUBLE) * (n - 1)) AS BIGINT) + 1] AS DOUBLE) * ((floor(('0.5'::DOUBLE) * (n - 1)) + 1.0) - (('0.5'::DOUBLE) * (n - 1))) + CAST(arr[CAST(floor(('0.5'::DOUBLE) * (n - 1)) AS BIGINT) + 2] AS DOUBLE) * ((('0.5'::DOUBLE) * (n - 1)) - floor(('0.5'::DOUBLE) * (n - 1))) END) AS m
      FROM (SELECT list(s ORDER BY s) AS arr, CAST(count(*) AS BIGINT) AS n
            FROM score)),
    b AS (
      SELECT CASE WHEN s >= CAST(2.0 AS DOUBLE) * med.m THEN '4_hot'
                  WHEN s >= med.m THEN '3_warm'
                  WHEN s >= CAST(0.5 AS DOUBLE) * med.m THEN '2_cool'
                  ELSE '1_cold' END AS band,
             s
      FROM score CROSS JOIN med)
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(SUM(CAST(floor(s * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS total_score
    FROM b GROUP BY band
    """,
)
def user_recency_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECENCY-DECAYED user value with a one-week half-life: each
    purchase-week's value is halved per week of age (weights are EXACT
    powers of two -- a literal CASE ladder, truncated at 8 weeks -- so
    no cross-engine pow()), and users band into hot/warm/cool/cold
    RELATIVE to the corpus median score (>=2x, >=1x, >=0.5x -- absolute
    cutoffs would re-degenerate at every scale factor); the
    feature-engineering sibling of [[rfm_segments]] that a re-engagement
    campaign actually keys on.  Value quantized to decimal, weighted
    values summed with the floor-micro order-free recipe at user and
    band level.

    Scale shape: scalar max-day broadcast, one user-keyed aggregate,
    one 4-row band aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("value") > 0.0) & (F.abs(F.col("value")) < 1000.0)
    )
    mx = ev.agg(
        F.datediff(
            F.max(F.col("ts").cast("date")), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("max_day")
    )
    age = F.expr(
        "(max_day - datediff(cast(ts as date), date '1970-01-01')) div 7"
    )
    decay = (
        F.when(age == 0, 1.0)
        .when(age == 1, 0.5)
        .when(age == 2, 0.25)
        .when(age == 3, 0.125)
        .when(age == 4, 0.0625)
        .when(age == 5, 0.03125)
        .when(age == 6, 0.015625)
        .when(age == 7, 0.0078125)
        .otherwise(0.0)
    )
    wv = F.col("value").cast("decimal(9,6)").cast("string").cast(
        "double"
    ) * decay
    w = ev.crossJoin(F.broadcast(mx)).select("user_id", wv.alias("wv"))
    score = w.groupBy("user_id").agg(
        (
            F.sum(F.floor(F.col("wv") * 1000000.0).cast("long")).cast("double")
            / 1000000.0
        ).alias("s")
    )
    med = score.agg(F.expr("percentile(s, 0.5)").alias("m"))
    band = (
        F.when(F.col("s") >= 2.0 * F.col("m"), "4_hot")
        .when(F.col("s") >= F.col("m"), "3_warm")
        .when(F.col("s") >= 0.5 * F.col("m"), "2_cool")
        .otherwise("1_cold")
    )
    return score.crossJoin(F.broadcast(med)).select(
        band.alias("band"), "s"
    ).groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (
            F.sum(F.floor(F.col("s") * 1000000.0).cast("long")).cast("double")
            / 1000000.0
        ).alias("total_score"),
    )


@_q(
    "sample_size_rate_table",
    f"""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted,
             CAST(SUM(converted) AS DOUBLE) / count(*) AS p
      FROM u),
    grid AS (SELECT unnest([CAST(0.01 AS DOUBLE), CAST(0.02 AS DOUBLE),
                            CAST(0.05 AS DOUBLE)]) AS delta)
    SELECT g.delta AS abs_effect,
           b.n_users AS current_n, b.p AS base_rate,
           ceil((('{_Z_ALPHA_975!r}'::DOUBLE + '{_Z_POWER_80!r}'::DOUBLE)
                 * ('{_Z_ALPHA_975!r}'::DOUBLE + '{_Z_POWER_80!r}'::DOUBLE))
                * (CAST(2.0 AS DOUBLE) * b.p * (CAST(1.0 AS DOUBLE) - b.p))
                / (g.delta * g.delta)) AS n_per_arm_needed,
           CASE WHEN b.n_users > 0 THEN
             ceil((('{_Z_ALPHA_975!r}'::DOUBLE + '{_Z_POWER_80!r}'::DOUBLE)
                   * ('{_Z_ALPHA_975!r}'::DOUBLE + '{_Z_POWER_80!r}'::DOUBLE))
                  * (CAST(2.0 AS DOUBLE) * b.p * (CAST(1.0 AS DOUBLE) - b.p))
                  / (g.delta * g.delta))
             / (CAST(b.n_users AS DOUBLE) / 2) ELSE NULL END
             AS multiple_of_current
    FROM base b CROSS JOIN grid g
    """,
)
def sample_size_rate_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-SIZE PLANNING table for the conversion rate: users per arm
    needed to detect an absolute lift of 1/2/5 points at 80% power
    (n = (z_a+z_b)^2 * 2p(1-p) / delta^2 with p the measured base rate)
    and how that compares to current traffic -- the
    [[ab_test_mde_readout]] inverse, answered in the planning direction
    ("how long must this test run").  z constants are the shared Python
    literals; base rate is one division of exact counts; ceil is exact.

    Scale shape: one user-keyed aggregate, scalar math against a 3-row
    grid."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    base = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias("p"),
    )
    grid = spark.createDataFrame(
        [(0.01,), (0.02,), (0.05,)], "delta double"
    )
    z2 = (F.lit(_Z_ALPHA_975) + F.lit(_Z_POWER_80)) * (
        F.lit(_Z_ALPHA_975) + F.lit(_Z_POWER_80)
    )
    need = F.ceil(
        z2
        * (F.lit(2.0) * F.col("p") * (F.lit(1.0) - F.col("p")))
        / (F.col("delta") * F.col("delta"))
    )
    return base.crossJoin(F.broadcast(grid)).select(
        F.col("delta").alias("abs_effect"),
        F.col("n_users").alias("current_n"),
        F.col("p").alias("base_rate"),
        need.alias("n_per_arm_needed"),
        F.when(
            F.col("n_users") > 0,
            need / (F.col("n_users").cast("double") / 2),
        ).alias("multiple_of_current"),
    )


@_q(
    "abc_classification_by_nation",
    """
    WITH t AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS tot
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT c.c_nationkey, t.tot,
             SUM(t.tot) OVER (PARTITION BY c.c_nationkey
                              ORDER BY t.tot DESC, t.o_custkey) AS cum,
             SUM(t.tot) OVER (PARTITION BY c.c_nationkey) AS total
      FROM t JOIN customer c ON t.o_custkey = c.c_custkey),
    cls AS (
      SELECT c_nationkey, tot, total,
             CASE WHEN 5 * cum <= 4 * total THEN 'A'
                  WHEN 20 * cum <= 19 * total THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM r)
    SELECT n.n_name, cls.abc_class,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(cls.tot) AS DOUBLE) / CAST(MAX(cls.total) AS DOUBLE)
             AS revenue_share
    FROM cls JOIN nation n ON n.n_nationkey = cls.c_nationkey
    GROUP BY n.n_name, cls.abc_class
    """,
)
def abc_classification_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (80/15/5) CUSTOMER CLASSIFICATION per nation: A-class
    customers cover the first 80% of cumulative revenue, B the next 15%,
    C the tail -- the inventory-analysis workhorse applied to accounts
    (A gets a key-account manager, C gets self-serve).  The class
    thresholds are INTEGER-scaled decimal comparisons (5*cum <= 4*total,
    20*cum <= 19*total -- no division, no doubles until the final
    share); revenue stays decimal through both windows.

    Scale shape: the [[pareto_half_revenue_customers]] plan -- custkey
    aggregate, nation-partitioned cumulative windows, broadcast nation
    join, |nations|x3 output."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    t = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("tot")
    )
    j = t.join(cust, t.o_custkey == cust.c_custkey)
    wc = Window.partitionBy("c_nationkey").orderBy(
        F.desc("tot"), F.asc("o_custkey")
    )
    wp = Window.partitionBy("c_nationkey")
    r = j.select(
        "c_nationkey",
        "tot",
        F.sum("tot").over(wc).alias("cum"),
        F.sum("tot").over(wp).alias("total"),
    )
    cls = r.select(
        "c_nationkey",
        "tot",
        "total",
        F.when(5 * F.col("cum") <= 4 * F.col("total"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        cls.join(F.broadcast(nation), cls.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            (
                F.sum("tot").cast("double") / F.max("total").cast("double")
            ).alias("revenue_share"),
        )
    )


@_q(
    "events_ewma_residual_anomaly",
    """
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, h),
    j AS (
      SELECT a.event_type, a.h, a.c,
             b.c AS cb, a.h - b.h AS lag_h
      FROM hourly a JOIN hourly b
        ON b.event_type = a.event_type
       AND b.h < a.h AND a.h - b.h <= 50),
    w AS (
      SELECT event_type, h, c,
             CAST(cb AS DOUBLE) / CAST(1::BIGINT << lag_h AS DOUBLE) AS wx,
             CAST(1.0 AS DOUBLE) / CAST(1::BIGINT << lag_h AS DOUBLE) AS ww
      FROM j),
    p AS (
      SELECT event_type, h, c,
             CAST(SUM(CAST(floor(wx * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS num,
             CAST(SUM(CAST(floor(ww * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS den
      FROM w GROUP BY event_type, h, c),
    r AS (
      SELECT event_type, h, c,
             num / den AS predicted,
             abs(CAST(c AS DOUBLE) - num / den) AS resid
      FROM p WHERE den > CAST(0.0 AS DOUBLE)),
    top AS (
      SELECT event_type, h, c, predicted, resid,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY resid DESC, h ASC) AS rk
      FROM r)
    SELECT event_type,
           h AS anomaly_epoch_hour,
           c AS observed,
           predicted,
           resid AS abs_residual
    FROM top WHERE rk = 1
    """,
)
def events_ewma_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-RESIDUAL anomaly detection with EXACT geometric weights: the
    hour where each type's count deviates most from its exponentially
    weighted history (half-life = 1 hour, i.e. alpha = 0.5).  The
    recursion s_t = (x_t + s_{t-1})/2 is normally un-oracle-able
    (cross-engine pow() differs in ULPs) -- here the weights 2^-lag are
    computed as ``1.0 / (1 << lag)``: an integer SHIFT and a
    division-by-power-of-two, both EXACT IEEE operations on any engine;
    history truncates at lag 50 (2^-50 is below measurement noise,
    identically on both sides).  Weighted sums quantize with the
    floor-micro recipe; the prediction is one division.

    Scale shape: (type, hour) aggregate, a type-keyed self-join BOUNDED
    at 50 lags per row, one keyed aggregate, one type-partitioned
    argmax window."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_seconds(cast(ts as timestamp)) div 3600").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = hourly.select("event_type", "h", "c")
    b = hourly.select(
        F.col("event_type").alias("event_type"),
        F.col("h").alias("bh"),
        F.col("c").alias("cb"),
    )
    j = a.join(b, "event_type").filter(
        (F.col("bh") < F.col("h")) & (F.col("h") - F.col("bh") <= 50)
    )
    pow2 = F.expr("cast(shiftleft(1L, cast(h - bh as int)) as double)")
    w = j.select(
        "event_type",
        "h",
        "c",
        (F.col("cb").cast("double") / pow2).alias("wx"),
        (F.lit(1.0) / pow2).alias("ww"),
    )

    def fsum(c):
        return (
            F.sum(F.floor(F.col(c) * 1000000.0).cast("long")).cast("double")
            / 1000000.0
        )

    p = w.groupBy("event_type", "h", "c").agg(
        fsum("wx").alias("num"), fsum("ww").alias("den")
    )
    pred = F.col("num") / F.col("den")
    r = p.filter(F.col("den") > 0.0).select(
        "event_type",
        "h",
        "c",
        pred.alias("predicted"),
        F.abs(F.col("c").cast("double") - pred).alias("resid"),
    )
    top = r.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.desc("resid"), F.asc("h")
            )
        ),
    )
    return top.filter(F.col("rk") == 1).select(
        "event_type",
        F.col("h").alias("anomaly_epoch_hour"),
        F.col("c").alias("observed"),
        "predicted",
        F.col("resid").alias("abs_residual"),
    )


@_q(
    "events_acf_table",
    """
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, h),
    lags AS (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag_h),
    j AS (
      SELECT a.event_type, l.lag_h, a.c AS x, b.c AS y
      FROM hourly a
      CROSS JOIN lags l
      JOIN hourly b ON b.event_type = a.event_type
                   AND b.h = a.h - l.lag_h),
    s AS (
      SELECT event_type, lag_h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM j GROUP BY event_type, lag_h HAVING count(*) >= 3)
    SELECT event_type, CAST(lag_h AS INTEGER) AS lag_hours, n AS n_pairs,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                ELSE NULL END AS acf
    FROM s
    """,
)
def events_acf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION FUNCTION table: Pearson correlation of the hourly
    count series with itself at lags 1/2/3/6/12/24 hours, per type --
    the model-selection readout (a spike at 24 = daily seasonality,
    slow decay = momentum, nothing = Poisson-like; it decides between
    the seasonal-naive, EWMA, and flat baselines in this family).
    Counts are integers, so EVERY moment (sx, sxx, sxy, ...) is an
    exact BIGINT and the correlation is one float expression over them
    -- no quantization needed anywhere.

    Scale shape: (type, hour) aggregate, a 6-lag keyed self-join on the
    shifted hour, a (type, lag)-sized moment aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_seconds(cast(ts as timestamp)) div 3600").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    lags = spark.createDataFrame([(1,), (2,), (3,), (6,), (12,), (24,)], "lag_h int")
    a = hourly.crossJoin(F.broadcast(lags))
    b = hourly.select(
        "event_type", F.col("h").alias("bh"), F.col("c").alias("y")
    )
    j = a.join(b, "event_type").filter(
        F.col("bh") == F.col("h") - F.col("lag_h")
    ).select("event_type", "lag_h", F.col("c").alias("x"), "y")
    s = (
        j.groupBy("event_type", "lag_h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
        .filter(F.col("n") >= 3)
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    return s.select(
        "event_type",
        F.col("lag_h").cast("int").alias("lag_hours"),
        n.alias("n_pairs"),
        F.when(
            (vx > 0) & (vy > 0),
            (n.cast("double") * F.col("sxy") - sx.cast("double") * sy)
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).alias("acf"),
    )


_DWELL_P50 = _pctile_mirror_sql("arr", "n", 0.5)
_DWELL_P90 = _pctile_mirror_sql("arr", "n", 0.9)


@_q(
    "session_dwell_time_quantiles",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id,
             ts
      FROM flagged),
    dur AS (
      SELECT (CAST(floor(epoch(MAX(ts))) AS BIGINT)
              - CAST(floor(epoch(MIN(ts))) AS BIGINT)) AS dwell_s,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sessions GROUP BY user_id, session_id),
    s AS (SELECT list(dwell_s ORDER BY dwell_s) AS arr,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(dwell_s) AS BIGINT) AS total_s,
                 CAST(count(*) FILTER (WHERE n_events = 1) AS BIGINT)
                   AS n_single
          FROM dur)
    SELECT n AS n_sessions,
           n_single AS n_single_event,
           {_DWELL_P50} AS p50_dwell_s,
           {_DWELL_P90} AS p90_dwell_s,
           CAST(total_s AS DOUBLE) / n AS mean_dwell_s
    FROM s
    """,
)
def session_dwell_time_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION DWELL TIME distribution: p50/p90/mean session duration
    over the 30-minute-gap sessions (plus the single-event count whose
    zero duration drags the median -- reported so the reader can see the
    mix) -- the engagement-depth readout next to
    [[session_bounce_stats]]'s breadth.  Durations are integer epoch
    seconds; the fractional quantiles use the _pctile_mirror_sql replay.

    Scale shape: the shared sessionize window, one (user, session)
    aggregate, one global percentile aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum(F.col("is_new").cast("long")).over(w)
    )
    dur = sessions.groupBy("user_id", "session_id").agg(
        (
            F.unix_seconds(F.max("ts").cast("timestamp"))
            - F.unix_seconds(F.min("ts").cast("timestamp"))
        ).alias("dwell_s"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return dur.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.count_if(F.col("n_events") == 1).cast("long").alias("n_single_event"),
        F.expr("percentile(dwell_s, 0.5)").alias("p50_dwell_s"),
        F.expr("percentile(dwell_s, 0.9)").alias("p90_dwell_s"),
        (F.sum("dwell_s").cast("double") / F.count(F.lit(1))).alias(
            "mean_dwell_s"
        ),
    )


@_q(
    "graph_reachability_3hop",
    """
    WITH e AS (
      SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
    seeds AS (
      SELECT s1 AS seed FROM e GROUP BY s1
      ORDER BY count(*) DESC, s1 ASC LIMIT 5),
    h1 AS (SELECT DISTINCT s.seed, e.s2 AS node
           FROM seeds s JOIN e ON e.s1 = s.seed),
    h2 AS (SELECT DISTINCT h1.seed, e.s2 AS node
           FROM h1 JOIN e ON e.s1 = h1.node),
    h3 AS (SELECT DISTINCT h2.seed, e.s2 AS node
           FROM h2 JOIN e ON e.s1 = h2.node),
    r AS (
      SELECT seed, node, 1 AS hops FROM h1
      UNION ALL SELECT seed, node, 2 FROM h2
      UNION ALL SELECT seed, node, 3 FROM h3),
    best AS (
      SELECT seed, node, CAST(MIN(hops) AS INTEGER) AS min_hops
      FROM r WHERE node <> seed GROUP BY seed, node)
    SELECT seed, min_hops, CAST(count(*) AS BIGINT) AS n_reachable
    FROM best GROUP BY seed, min_hops
    """,
)
def graph_reachability_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-DEPTH BFS: from the 5 highest-degree suppliers in the
    co-fulfillment graph (shared orders), how many suppliers are first
    reachable at 1, 2, and 3 hops -- the blast-radius readout
    (a disruption at a hub supplier propagates to the 1-hop ring
    immediately, the 2-hop ring next).  Exactly the k-step frontier
    expansion pattern that underlies distributed BFS: each hop is one
    keyed join of the CURRENT frontier (not the whole reachable set)
    against the edge list; min-hop dedup happens once at the end.

    Scale shape: the edge list aggregates once from the fact table;
    each hop is a frontier-sized keyed join; seeds are a broadcast-tiny
    TakeOrdered.  Depth is fixed -- no iterate-to-convergence driver
    loop."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s1"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s2"))
    e = (
        a.join(b, "o")
        .filter(F.col("s1") != F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    e = e.persist()
    seeds = (
        e.groupBy("s1")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.desc("deg"), F.asc("s1"))
        .limit(5)
        .select(F.col("s1").alias("seed"))
    )
    h1 = (
        seeds.join(e, seeds.seed == e.s1)
        .select("seed", F.col("s2").alias("node"))
        .distinct()
    )
    h2 = (
        h1.join(e, h1.node == e.s1)
        .select("seed", F.col("s2").alias("node"))
        .distinct()
    )
    h3 = (
        h2.join(e, h2.node == e.s1)
        .select("seed", F.col("s2").alias("node"))
        .distinct()
    )
    r = (
        h1.withColumn("hops", F.lit(1))
        .unionAll(h2.withColumn("hops", F.lit(2)))
        .unionAll(h3.withColumn("hops", F.lit(3)))
    )
    best = (
        r.filter(F.col("node") != F.col("seed"))
        .groupBy("seed", "node")
        .agg(F.min("hops").cast("int").alias("min_hops"))
    )
    out = best.groupBy("seed", "min_hops").agg(
        F.count(F.lit(1)).cast("long").alias("n_reachable")
    )
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    return _with_cached_deps(out, [e])


@_q(
    "label_centroid_separation",
    """
    WITH ex AS (
      SELECT label, u.pos AS pos,
             CAST(embedding[u.pos]::DOUBLE AS DECIMAL(9,6)) AS x
      FROM embeddings
      CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) u
      WHERE embedding IS NOT NULL AND label IS NOT NULL),
    g AS (SELECT label, pos,
                 CAST(SUM(x) AS DECIMAL(18,6)) AS s
          FROM ex GROUP BY label, pos),
    p AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.s * b.s) AS dot,
             SUM(a.s * a.s) AS sqa,
             SUM(b.s * b.s) AS sqb
      FROM g a JOIN g b ON b.pos = a.pos AND a.label < b.label
      GROUP BY a.label, b.label)
    SELECT label_a, label_b,
           CASE WHEN CAST(sqa AS DOUBLE) > 0 AND CAST(sqb AS DOUBLE) > 0
                THEN CAST(dot AS DOUBLE)
                     / (sqrt(CAST(sqa AS DOUBLE)) * sqrt(CAST(sqb AS DOUBLE)))
                ELSE NULL END AS centroid_cosine
    FROM p
    """,
)
def label_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASS SEPARABILITY matrix: pairwise cosine between label
    centroids -- two labels whose centroids sit at cosine 0.95 are the
    classes the downstream classifier will confuse (merge them, or go
    find harder negatives; the [[knn_label_consistency]] drill-down at
    class level).  The [[embedding_centroid_drift]] trick again: cosine
    is scale-invariant, so it is computed on UN-normalized per-dimension
    DECIMAL sums -- exact through every aggregation, floats only in the
    final three casts/sqrt/divide.

    Scale shape: posexplode to (label, pos), one keyed aggregate to a
    |labels| x 64 table, then a pos-keyed self-join over that tiny
    table."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = (
        emb.filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos0", "xd"
            ),
        )
        .select(
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.col("xd").cast("decimal(9,6)").alias("x"),
        )
    )
    g = ex.groupBy("label", "pos").agg(
        F.sum("x").cast("decimal(18,6)").alias("s")
    )
    a = g.select(
        F.col("label").alias("label_a"), "pos", F.col("s").alias("sa")
    )
    b = g.select(
        F.col("label").alias("label_b"), "pos", F.col("s").alias("sb")
    )
    p = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).alias("dot"),
            F.sum(F.col("sa") * F.col("sa")).alias("sqa"),
            F.sum(F.col("sb") * F.col("sb")).alias("sqb"),
        )
    )
    sqa = F.col("sqa").cast("double")
    sqb = F.col("sqb").cast("double")
    return p.select(
        "label_a",
        "label_b",
        F.when(
            (sqa > 0) & (sqb > 0),
            F.col("dot").cast("double") / (F.sqrt(sqa) * F.sqrt(sqb)),
        ).alias("centroid_cosine"),
    )


@_q(
    "repeat_rate_by_first_basket",
    """
    WITH firsts AS (
      SELECT o_custkey, MIN(o_orderdate) AS first_dt
      FROM orders GROUP BY o_custkey),
    firstkey AS (
      SELECT o.o_custkey, MIN(o.o_orderkey) AS first_key
      FROM orders o JOIN firsts f
        ON f.o_custkey = o.o_custkey AND o.o_orderdate = f.first_dt
      GROUP BY o.o_custkey),
    basket AS (
      SELECT fk.o_custkey,
             CAST(count(*) AS BIGINT) AS first_basket_lines
      FROM firstkey fk JOIN lineitem l ON l.l_orderkey = fk.first_key
      GROUP BY fk.o_custkey),
    repeat AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey),
    j AS (
      SELECT CASE WHEN b.first_basket_lines <= 2 THEN '1-2'
                  WHEN b.first_basket_lines <= 4 THEN '3-4'
                  ELSE '5+' END AS basket_band,
             CASE WHEN r.n_orders > 1 THEN 1 ELSE 0 END AS repeated
      FROM basket b JOIN repeat r ON r.o_custkey = b.o_custkey)
    SELECT basket_band,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(repeated) AS BIGINT) AS n_repeat,
           CAST(SUM(repeated) AS DOUBLE) / count(*) AS repeat_rate
    FROM j GROUP BY basket_band
    """,
)
def repeat_rate_by_first_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPEAT-PURCHASE rate by FIRST-ORDER basket size: do customers
    whose first order had more line items come back more often?  The
    onboarding-quality signal that decides whether to push basket
    builders at acquisition.  First order = earliest date with min
    orderkey as the deterministic tie-break; bands keep the readout
    3 rows.  Counts exact, one division.

    Scale shape: two custkey-keyed aggregates, one orderkey-keyed join
    to lineitem for the first basket only, a 3-row band aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    firsts = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    firstkey = (
        o.join(firsts, "o_custkey")
        .filter(F.col("o_orderdate") == F.col("first_dt"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("first_key"))
    )
    basket = (
        firstkey.join(li, firstkey.first_key == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("first_basket_lines"))
    )
    rep = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    band = (
        F.when(F.col("first_basket_lines") <= 2, "1-2")
        .when(F.col("first_basket_lines") <= 4, "3-4")
        .otherwise("5+")
    )
    j = basket.join(rep, "o_custkey").select(
        band.alias("basket_band"),
        F.when(F.col("n_orders") > 1, 1).otherwise(0).alias("repeated"),
    )
    return j.groupBy("basket_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("repeated").cast("long").alias("n_repeat"),
        (F.sum("repeated").cast("double") / F.count(F.lit(1))).alias(
            "repeat_rate"
        ),
    )


@_q(
    "price_realization_by_brand",
    """
    WITH j AS (
      SELECT p.p_brand,
             CAST(l.l_extendedprice AS DECIMAL(14,2)) AS ext,
             CAST(l.l_quantity AS DECIMAL(9,2))
               * CAST(p.p_retailprice AS DECIMAL(12,2)) AS list_value
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(ext) AS DOUBLE) AS realized_value,
           CAST(SUM(list_value) AS DOUBLE) AS list_value,
           CAST(SUM(ext) AS DOUBLE) / CAST(SUM(list_value) AS DOUBLE)
             AS realization_rate
    FROM j GROUP BY p_brand
    HAVING CAST(SUM(list_value) AS DOUBLE) > 0
    """,
)
def price_realization_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE REALIZATION per brand: transacted revenue over list-price
    value (quantity x retail price) -- the leakage readout that catches
    discounting beyond the discount column (misapplied list prices,
    channel erosion).  A realization rate of 0.93 means the brand
    banks 93 cents per list dollar.  Both sides of the ratio are exact
    decimal sums (2-decimal money, products exact); one division.

    Scale shape: one partkey-keyed join, one brand-keyed aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ext = F.col("l_extendedprice").cast("decimal(14,2)")
    listv = F.col("l_quantity").cast("decimal(9,2)") * F.col(
        "p_retailprice"
    ).cast("decimal(12,2)")
    j = li.join(p, li.l_partkey == p.p_partkey).select(
        "p_brand", ext.alias("ext"), listv.alias("list_value")
    )
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum("ext").cast("double").alias("realized_value"),
            F.sum("list_value").cast("double").alias("list_value"),
            (
                F.sum("ext").cast("double")
                / F.sum("list_value").cast("double")
            ).alias("realization_rate"),
        )
        .filter(F.col("list_value") > 0)
    )


@_q(
    "session_position_bias",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM flagged),
    ranked AS (
      SELECT event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY user_id, session_id) AS n
      FROM sessions),
    pos AS (
      SELECT event_type,
             CASE WHEN n > 1
                  THEN CAST(rk - 1 AS DOUBLE) / (n - 1)
                  ELSE CAST(0.5 AS DOUBLE) END AS npos
      FROM ranked)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(npos * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / count(*) AS mean_position
    FROM pos GROUP BY event_type
    """,
)
def session_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRA-SESSION POSITION BIAS: where in the session each event type
    tends to occur (0 = always session-opening, 1 = always closing,
    0.5 = uniform) -- purchases skewing late and errors skewing early
    are the expected shapes; deviations flag instrumentation or flow
    changes.  Normalized position (rk-1)/(n-1) is an exact rational per
    event (single-event sessions pin to 0.5); the cross-event mean uses
    the floor-micro order-free sum.

    Scale shape: the shared sessionize window plus one
    session-partitioned rank window, then a |types|-sized aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum(F.col("is_new").cast("long")).over(w)
    )
    ws = Window.partitionBy("user_id", "session_id")
    ranked = sessions.select(
        "event_type",
        F.row_number().over(ws.orderBy("ts", "event_id")).alias("rk"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    npos = F.when(
        F.col("n") > 1,
        (F.col("rk") - 1).cast("double") / (F.col("n") - 1),
    ).otherwise(F.lit(0.5))
    return ranked.select("event_type", npos.alias("npos")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (
            F.sum(F.floor(F.col("npos") * 1000000.0).cast("long")).cast(
                "double"
            )
            / 1000000.0
            / F.count(F.lit(1))
        ).alias("mean_position"),
    )


@_q(
    "text_mattr_diversity",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_SQL_TOKS} AS t FROM documents),
    ex AS (
      SELECT doc_id, lang, u.pos AS pos, t[u.pos] AS tok,
             CAST(len(t) AS BIGINT) AS n_toks
      FROM toks
      CROSS JOIN (SELECT unnest(range(1, 2001)) AS pos) u
      WHERE u.pos <= len(t)),
    win AS (
      SELECT a.doc_id, a.lang, a.pos AS w_start,
             CAST(count(DISTINCT b.tok) AS BIGINT) AS n_distinct
      FROM ex a JOIN ex b
        ON b.doc_id = a.doc_id
       AND b.pos >= a.pos AND b.pos < a.pos + 25
      WHERE a.pos + 24 <= a.n_toks
      GROUP BY a.doc_id, a.lang, a.pos),
    per_doc AS (
      SELECT doc_id, lang,
             CAST(SUM(n_distinct) AS DOUBLE) / (25 * count(*)) AS mattr
      FROM win GROUP BY doc_id, lang)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(floor(mattr * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / count(*) AS mean_mattr
    FROM per_doc GROUP BY lang
    """,
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR lexical diversity (Moving-Average Type-Token Ratio, window
    25): mean distinct-token fraction over every 25-token sliding window
    per document, averaged by language -- the length-robust diversity
    metric (raw TTR collapses as documents grow, so corpus mixes with
    different length profiles can't be compared on it; MATTR can).
    Docs shorter than the window contribute nothing, as the metric
    requires.  Window distinct counts are exact integers; the per-doc
    MATTR is one rational; cross-doc means use the floor-micro sum.

    Scale shape: position explode (capped at 2000 tokens/doc), a
    doc-keyed bounded self-join (25 positions per row), keyed
    aggregates."""
    from lvm_datapipe_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id",
        "lang",
        F.size(tokens("text")).cast("long").alias("n_toks"),
        F.posexplode(F.slice(tokens("text"), 1, 2000)).alias("pos0", "tok"),
    ).select(
        "doc_id", "lang", "n_toks", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    a = ex.select("doc_id", "lang", F.col("pos").alias("w_start"), "n_toks")
    b = ex.select("doc_id", F.col("pos").alias("bpos"), F.col("tok").alias("btok"))
    win = (
        a.join(b, "doc_id")
        .filter(
            (F.col("bpos") >= F.col("w_start"))
            & (F.col("bpos") < F.col("w_start") + 25)
            & (F.col("w_start") + 24 <= F.col("n_toks"))
        )
        .groupBy("doc_id", "lang", "w_start")
        .agg(F.count_distinct("btok").cast("long").alias("n_distinct"))
    )
    per_doc = win.groupBy("doc_id", "lang").agg(
        (
            F.sum("n_distinct").cast("double")
            / (25 * F.count(F.lit(1)))
        ).alias("mattr")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(F.floor(F.col("mattr") * 1000000.0).cast("long")).cast(
                "double"
            )
            / 1000000.0
            / F.count(F.lit(1))
        ).alias("mean_mattr"),
    )


@_q(
    "dedup_cluster_size_hist",
    f"""
    WITH clusters AS ({_lsh_clusters_sql(n_tables=12)}),
    sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS s
              FROM clusters GROUP BY cluster_id)
    SELECT s AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY s
    """,
)
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-SIZE distribution of the near-dup components: how many
    clusters of 2, 3, ... members -- with [[dup_graph_degree_hist]]
    (edge view) and [[dedup_transitivity_inflation]] (over-merge
    ratio), the third leg of the dedup-graph QA: a heavy tail here is
    template content, a flat wall of pairs is genuine near-dups.
    All-integer over the deterministic LSH pair graph.

    Scale shape: LSH pairs -> label propagation -> two tiny keyed
    aggregates."""
    from lvm_datapipe_spark.operators import similarity as V
    from lvm_datapipe_spark.operators.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4, n_tables=12)
    clusters = connected_components(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    return sizes.groupBy(F.col("s").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


@_q(
    "session_threshold_sensitivity",
    """
    WITH gaps AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(LAG(ts) OVER w)) AS BIGINT) AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events),
    grid AS (SELECT unnest([600, 1800, 3600, 7200]) AS thr_s),
    cuts AS (
      SELECT g.thr_s,
             CAST(count(*) FILTER (WHERE gaps.gap_s > g.thr_s) AS BIGINT)
               AS n_breaks
      FROM grid g CROSS JOIN gaps
      WHERE gaps.gap_s IS NOT NULL
      GROUP BY g.thr_s)
    SELECT CAST(c.thr_s AS INTEGER) AS threshold_s,
           n.n_users + c.n_breaks AS n_sessions,
           CAST(n.n_events AS DOUBLE) / (n.n_users + c.n_breaks)
             AS events_per_session
    FROM cuts c CROSS JOIN n
    """,
)
def session_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSIONIZATION THRESHOLD sensitivity: session counts under gap
    thresholds of 10/30/60/120 minutes from ONE window pass -- the
    calibration table that justifies (or indicts) the conventional
    30-minute gap before every session metric inherits it.  The trick:
    a session count is n_users + #(gaps > threshold), so the whole
    threshold grid is conditional counts over the SAME inter-event gap
    stream -- no re-sessionization per candidate.  A plateau between
    thresholds means robust sessions; counts still falling fast at 120
    min mean the gap cut is arbitrary for this traffic.  All-integer.

    Scale shape: one user-partitioned lag window, a 4x grid fan-out of
    the gap stream (broadcast grid), a 4-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            F.unix_seconds(F.col("ts").cast("timestamp"))
            - F.unix_seconds(F.lag("ts").over(w).cast("timestamp"))
        ).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    n = ev.agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    grid = spark.createDataFrame(
        [(600,), (1800,), (3600,), (7200,)], "thr_s int"
    )
    cuts = (
        gaps.crossJoin(F.broadcast(grid))
        .groupBy("thr_s")
        .agg(
            F.count_if(F.col("gap_s") > F.col("thr_s"))
            .cast("long")
            .alias("n_breaks")
        )
    )
    return cuts.crossJoin(F.broadcast(n)).select(
        F.col("thr_s").cast("int").alias("threshold_s"),
        (F.col("n_users") + F.col("n_breaks")).alias("n_sessions"),
        (
            F.col("n_events").cast("double")
            / (F.col("n_users") + F.col("n_breaks"))
        ).alias("events_per_session"),
    )


@_q(
    "embedding_similarity_bands",
    f"""
    WITH pairs AS ({_lsh_near_dup_sql(n_tables=12, threshold=0.0)}),
    b AS (
      SELECT CASE WHEN cos_sim >= 0.9 THEN '0.9-1.0'
                  WHEN cos_sim >= 0.8 THEN '0.8-0.9'
                  WHEN cos_sim >= 0.6 THEN '0.6-0.8'
                  WHEN cos_sim >= 0.4 THEN '0.4-0.6'
                  WHEN cos_sim >= 0.0 THEN '0.0-0.4'
                  ELSE 'negative' END AS cos_band
      FROM pairs)
    SELECT cos_band, CAST(count(*) AS BIGINT) AS n_pairs
    FROM b GROUP BY cos_band
    """,
)
def embedding_similarity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COSINE-BAND histogram over the LSH candidate pairs (verify
    threshold dropped to 0 so every collision is scored): the
    dedup-threshold decision table for the EMBEDDING path -- a cliff
    between bands marks where near-dups end and topical similarity
    begins (the vector sibling of [[dedup_threshold_sweep]]).  One run
    of the candidates+verify kernel scores every candidate once; the
    banding is a CASE ladder.

    Scale shape: the banded LSH plan with the exact-cosine verify; a
    6-row aggregate."""
    from lvm_datapipe_spark.operators import similarity as V

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.0, n_tables=12)
    band = (
        F.when(F.col("cos_sim") >= 0.9, "0.9-1.0")
        .when(F.col("cos_sim") >= 0.8, "0.8-0.9")
        .when(F.col("cos_sim") >= 0.6, "0.6-0.8")
        .when(F.col("cos_sim") >= 0.4, "0.4-0.6")
        .when(F.col("cos_sim") >= 0.0, "0.0-0.4")
        .otherwise("negative")
    )
    return pairs.select(band.alias("cos_band")).groupBy("cos_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


@_q(
    "catalog_table_counts",
    """
    SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS n_rows FROM region
    UNION ALL SELECT 'nation', CAST(count(*) AS BIGINT) FROM nation
    UNION ALL SELECT 'customer', CAST(count(*) AS BIGINT) FROM customer
    UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT) FROM supplier
    UNION ALL SELECT 'part', CAST(count(*) AS BIGINT) FROM part
    UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
    UNION ALL SELECT 'lineitem', CAST(count(*) AS BIGINT) FROM lineitem
    UNION ALL SELECT 'events', CAST(count(*) AS BIGINT) FROM events
    UNION ALL SELECT 'documents', CAST(count(*) AS BIGINT) FROM documents
    UNION ALL SELECT 'embeddings', CAST(count(*) AS BIGINT) FROM embeddings
    """,
)
def catalog_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATALOG OVERVIEW: row counts for every table in the warehouse
    directory -- the first query anyone runs against an unfamiliar
    dataset, and the cheapest smoke test that a snapshot copied
    completely (pair with [[a8_count_consistency]] for the semantic
    check).  Counts come from parquet metadata-level scans.

    Scale shape: ten metadata-cheap count aggregates unioned."""
    rows = []
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        rows.append((t, load_table(spark, sf_dir, t).count()))
    return spark.createDataFrame(rows, "table_name string, n_rows long")


@_q(
    "label_scatter_trace",
    """
    WITH ex AS (
      SELECT vec_id, label, u.pos AS pos,
             CAST(embedding[u.pos]::DOUBLE AS DECIMAL(9,6)) AS x
      FROM embeddings
      CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) u
      WHERE embedding IS NOT NULL AND label IS NOT NULL),
    g AS (
      SELECT label, pos,
             CAST(SUM(x) AS DECIMAL(18,6)) AS s,
             CAST(SUM(x * x) AS DECIMAL(18,12)) AS sq,
             CAST(count(*) AS BIGINT) AS n
      FROM ex GROUP BY label, pos),
    per AS (
      SELECT label, CAST(MIN(n) AS BIGINT) AS n,
             CAST(SUM(sq) AS DOUBLE) AS total_sq,
             SUM(s * s) AS centroid_sq_scaled
      FROM g GROUP BY label)
    SELECT label, n AS n_vectors,
           (total_sq - CAST(centroid_sq_scaled AS DOUBLE) / n) / n
             AS within_trace,
           sqrt(CAST(centroid_sq_scaled AS DOUBLE)) / n AS centroid_norm
    FROM per WHERE n > 0
    """,
)
def label_scatter_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-CLASS SCATTER per label: the trace of each class's
    covariance (mean squared distance from its centroid) and the
    centroid's norm -- with [[label_centroid_separation]] this gives
    the Fisher-style separability picture (classes whose centroid gap
    is small RELATIVE to their scatter are the inseparable ones).
    Identity used: sum ||x - mu||^2 = sum ||x||^2 - n*||mu||^2, with
    every sum an exact decimal (the n*||mu||^2 term is computed scaled
    as ||sum x||^2 / n -- no per-row float subtraction anywhere).

    Scale shape: posexplode to (label, pos), one keyed aggregate to
    |labels| x 64, a |labels|-sized rollup."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = (
        emb.filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos0", "xd"
            ),
        )
        .select(
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.col("xd").cast("decimal(9,6)").alias("x"),
        )
    )
    g = ex.groupBy("label", "pos").agg(
        F.sum("x").cast("decimal(18,6)").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(18,12)").alias("sq"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    per = g.groupBy("label").agg(
        F.min("n").cast("long").alias("n"),
        F.sum("sq").cast("double").alias("total_sq"),
        F.sum(F.col("s") * F.col("s")).alias("centroid_sq_scaled"),
    )
    return per.filter(F.col("n") > 0).select(
        "label",
        F.col("n").alias("n_vectors"),
        (
            (
                F.col("total_sq")
                - F.col("centroid_sq_scaled").cast("double") / F.col("n")
            )
            / F.col("n")
        ).alias("within_trace"),
        (
            F.sqrt(F.col("centroid_sq_scaled").cast("double")) / F.col("n")
        ).alias("centroid_norm"),
    )


_LATE_P99 = _pctile_mirror_sql("arr", "n", 0.99)


@_q(
    "out_of_order_event_rate",
    f"""
    WITH r AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
             MAX(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS max_prior_s
      FROM events),
    lab AS (
      SELECT event_type,
             CASE WHEN max_prior_s IS NOT NULL AND t_s < max_prior_s
                  THEN max_prior_s - t_s ELSE 0 END AS lateness_s,
             CASE WHEN max_prior_s IS NOT NULL AND t_s < max_prior_s
                  THEN 1 ELSE 0 END AS late
      FROM r),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(SUM(late) AS BIGINT) AS n_late,
             CAST(MAX(lateness_s) AS BIGINT) AS max_lateness_s,
             list(lateness_s ORDER BY lateness_s) AS arr,
             CAST(count(*) AS BIGINT) AS n
      FROM lab GROUP BY event_type)
    SELECT event_type, n_events, n_late,
           CAST(n_late AS DOUBLE) / n_events AS late_rate,
           max_lateness_s,
           {_LATE_P99} AS p99_lateness_s
    FROM agg
    """,
)
def out_of_order_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-ORDERNESS audit: per event type, how often an event's
    timestamp precedes the max timestamp of earlier-ARRIVING events from
    the same user (event_id as arrival order), how late the stragglers
    run, and the p99 lateness -- THE number that sets a streaming
    watermark (withWatermark(p99) drops <1% of events; the max says
    what a zero-loss watermark would cost in state).  Lateness is
    integer seconds from a user-partitioned running max; p99 uses the
    Spark-percentile mirror.

    Scale shape: one user-partitioned window, one per-type aggregate."""
    ev = load_table(spark, sf_dir, "events")
    t_s = F.unix_seconds(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = ev.select(
        "event_type",
        t_s.alias("t_s"),
        F.max(t_s).over(w).alias("max_prior_s"),
    )
    is_late = F.col("max_prior_s").isNotNull() & (
        F.col("t_s") < F.col("max_prior_s")
    )
    lab = r.select(
        "event_type",
        F.when(is_late, F.col("max_prior_s") - F.col("t_s"))
        .otherwise(0)
        .alias("lateness_s"),
        F.when(is_late, 1).otherwise(0).alias("late"),
    )
    return lab.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("late").cast("long").alias("n_late"),
        (F.sum("late").cast("double") / F.count(F.lit(1))).alias("late_rate"),
        F.max("lateness_s").cast("long").alias("max_lateness_s"),
        F.expr("percentile(lateness_s, 0.99)").alias("p99_lateness_s"),
    ).select(
        "event_type",
        "n_events",
        "n_late",
        "late_rate",
        "max_lateness_s",
        "p99_lateness_s",
    )


@_q(
    "dedup_review_queue",
    f"""
    WITH j AS (SELECT id_a, id_b, jaccard FROM ({_jaccard_pairs_sql()})),
    toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= 1000),
    exk AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN keep USING (shingle)),
    sz AS (SELECT doc_id, CAST(len(s) AS INTEGER) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM exk a JOIN exk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    allj AS (
      SELECT id_a, id_b,
             n_common / (sa.n + sb.n - n_common) AS jaccard
      FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b)
    SELECT id_a, id_b, jaccard,
           abs(jaccard - CAST(0.6 AS DOUBLE)) AS threshold_distance
    FROM allj
    ORDER BY abs(jaccard - CAST(0.6 AS DOUBLE)) ASC, id_a ASC, id_b ASC
    LIMIT 20
    """,
)
def dedup_review_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HUMAN-REVIEW QUEUE for the dedup threshold: the 20 candidate
    pairs whose exact Jaccard sits CLOSEST to the 0.6 cut -- the
    ambiguous zone where the automated decision is most likely wrong in
    either direction, and exactly the sample a reviewer should label
    before anyone re-tunes the threshold (complement of
    [[dedup_threshold_sweep]], which shows the distribution this queue
    samples the boundary of).  Deterministic: distance, then pair-id
    tie-breaks; TakeOrdered, no global sort materialized.

    Scale shape: the capped posting-list intersection, then top-k."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    cached = D.shingle_rows(docs).persist()
    sizes = cached.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = D.shingle_intersections(cached, "doc_id", 1000)
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    allj = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    out = (
        allj.withColumn(
            "threshold_distance", F.abs(F.col("jaccard") - 0.6)
        )
        .orderBy(
            F.asc("threshold_distance"), F.asc("id_a"), F.asc("id_b")
        )
        .limit(20)
    )
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    return _with_cached_deps(out, [cached])


@_q(
    "forecast_residual_acf",
    """
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, h),
    resid AS (
      SELECT a.event_type, a.h, a.c - b.c AS r
      FROM hourly a
      JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h - 24),
    lagged AS (
      SELECT a.event_type, a.r AS x, b.r AS y
      FROM resid a
      JOIN resid b ON b.event_type = a.event_type AND b.h = a.h - 1),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM lagged GROUP BY event_type HAVING count(*) >= 3)
    SELECT event_type, n AS n_pairs,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                ELSE NULL END AS residual_acf1
    FROM s
    """,
)
def forecast_residual_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-ADEQUACY check for the seasonal-naive forecaster: lag-1
    autocorrelation of its residuals (actual - 24h-ago prediction).
    Residuals from an adequate model are white noise (acf ~ 0);
    residual_acf1 far from zero says structure remains that the
    [[forecast_seasonal_naive_backtest]] MAE is silently paying for --
    the classic Box-Jenkins diagnostic, run before trusting any
    forecast-based alert.  Residuals are integer count differences, so
    every moment is an exact BIGINT; one float expression per type.

    Scale shape: (type, hour) aggregate, two shifted-key equi-joins,
    a per-type moment aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_seconds(cast(ts as timestamp)) div 3600").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    b24 = hourly.select(
        "event_type", (F.col("h") + 24).alias("h"), F.col("c").alias("pred")
    )
    resid = hourly.join(b24, ["event_type", "h"]).select(
        "event_type", "h", (F.col("c") - F.col("pred")).alias("r")
    )
    prev = resid.select(
        "event_type", (F.col("h") + 1).alias("h"), F.col("r").alias("y")
    )
    lagged = resid.join(prev, ["event_type", "h"]).select(
        "event_type", F.col("r").alias("x"), "y"
    )
    s = (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
        .filter(F.col("n") >= 3)
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    return s.select(
        "event_type",
        n.alias("n_pairs"),
        F.when(
            (vx > 0) & (vy > 0),
            (n.cast("double") * F.col("sxy") - sx.cast("double") * sy)
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).alias("residual_acf1"),
    )


@_q(
    "order_linenumber_gaps",
    """
    WITH per AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(MAX(l_linenumber) AS BIGINT) AS max_ln,
             CAST(MIN(l_linenumber) AS BIGINT) AS min_ln,
             CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct
      FROM lineitem GROUP BY l_orderkey)
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE min_ln <> 1) AS BIGINT)
             AS n_bad_start,
           CAST(count(*) FILTER (WHERE max_ln <> n_lines) AS BIGINT)
             AS n_gapped,
           CAST(count(*) FILTER (WHERE n_distinct <> n_lines) AS BIGINT)
             AS n_duplicated,
           CAST(count(*) FILTER (WHERE min_ln = 1 AND max_ln = n_lines
                                   AND n_distinct = n_lines) AS DOUBLE)
             / count(*) AS contiguous_rate
    FROM per
    """,
)
def order_linenumber_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE-INTEGRITY DQ: line numbers within each order must be
    exactly 1..n (min=1, max=n, all distinct) -- a gap means lost line
    items, a duplicate means a double-write; either silently corrupts
    any per-line reconciliation downstream.  Three integer invariants
    checked in one orderkey aggregate; the violation counts localize
    WHICH failure mode (the generic [[dq_report]] can't see positional
    contracts).

    Scale shape: one orderkey-keyed aggregate, single-row readout."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.max("l_linenumber").cast("long").alias("max_ln"),
        F.min("l_linenumber").cast("long").alias("min_ln"),
        F.count_distinct("l_linenumber").cast("long").alias("n_distinct"),
    )
    ok = (
        (F.col("min_ln") == 1)
        & (F.col("max_ln") == F.col("n_lines"))
        & (F.col("n_distinct") == F.col("n_lines"))
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count_if(F.col("min_ln") != 1).cast("long").alias("n_bad_start"),
        F.count_if(F.col("max_ln") != F.col("n_lines"))
        .cast("long")
        .alias("n_gapped"),
        F.count_if(F.col("n_distinct") != F.col("n_lines"))
        .cast("long")
        .alias("n_duplicated"),
        (F.count_if(ok).cast("double") / F.count(F.lit(1))).alias(
            "contiguous_rate"
        ),
    )


_GAINS_THRESHOLDS = [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]
_GAINS_T_SQL = ", ".join(
    _pctile_mirror_sql("arr", "n", f) for f in _GAINS_THRESHOLDS
)


@_q(
    "classifier_gains_table",
    rf"""
    WITH f AS (
      SELECT doc_id, length(text) AS n_chars,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents),
    s AS (SELECT doc_id,
                 (-2.0 + 0.004 * CAST(n_tokens AS DOUBLE))
                   + 0.35 * (CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                   AS logit,
                 CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
                   AS label
          FROM f WHERE n_tokens > 0),
    q AS (SELECT [{_GAINS_T_SQL}] AS t
          FROM (SELECT list(logit ORDER BY logit) AS arr,
                       CAST(count(*) AS BIGINT) AS n FROM s)),
    b AS (SELECT s.label,
                 1 + {' + '.join(f'(CASE WHEN s.logit < q.t[{i + 1}] THEN 1 ELSE 0 END)' for i in range(9))}
                   AS decile
          FROM s CROSS JOIN q),
    tot AS (SELECT CAST(SUM(label) AS BIGINT) AS total_pos,
                   CAST(count(*) AS BIGINT) AS total_n
            FROM b),
    d AS (SELECT decile,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(SUM(label) AS BIGINT) AS n_pos
          FROM b GROUP BY decile),
    cum AS (SELECT a.decile, CAST(SUM(c.n_pos) AS BIGINT) AS cum_pos
            FROM d a JOIN d c ON c.decile <= a.decile
            GROUP BY a.decile)
    SELECT d.decile, d.n_docs, d.n_pos,
           CAST(d.n_pos AS DOUBLE) / d.n_docs AS pos_rate,
           (CAST(d.n_pos AS DOUBLE) / d.n_docs)
             / (CAST(tot.total_pos AS DOUBLE) / tot.total_n) AS lift,
           CAST(cum.cum_pos AS DOUBLE) / tot.total_pos AS cum_capture
    FROM d JOIN cum ON cum.decile = d.decile CROSS JOIN tot
    WHERE tot.total_pos > 0
    """,
)
def classifier_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAINS/LIFT table for the quality classifier: documents bucketed
    into score deciles (decile 1 = highest logit) with per-decile
    positive rate, lift over the base rate, and cumulative capture --
    the slide every model review asks for ("the top 30% of scores
    capture 60% of the good docs").  Decile boundaries come from ONE
    percentile aggregate broadcast back as a comparison ladder (the
    scale-safe w5 twin pattern -- no NTILE); the fractional thresholds
    over double scores use the _pctile_mirror_sql replay.

    Scale shape: one scan + scalar thresholds + ladder assignment, a
    10-row decile aggregate, a 10x10 cumulative join."""
    from lvm_datapipe_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    nt = F.size(tokens("text")).cast("long")
    s = docs.select(
        (
            (F.lit(-2.0) + 0.004 * nt.cast("double"))
            + 0.35 * (F.length("text").cast("double") / nt.cast("double"))
        ).alias("logit"),
        F.when(nt.between(50, 100000), 1).otherwise(0).alias("label"),
        nt.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0).drop("n_tokens")
    fr = ", ".join(repr(f) for f in _GAINS_THRESHOLDS)
    q = s.agg(F.expr(f"percentile(logit, array({fr}))").alias("t"))
    decile = F.lit(1)
    for i in range(9):
        decile = decile + F.when(
            F.col("logit") < F.col("t").getItem(i), 1
        ).otherwise(0)
    b = s.crossJoin(F.broadcast(q)).select(
        "label", decile.alias("decile")
    )
    tot = b.agg(
        F.sum("label").cast("long").alias("total_pos"),
        F.count(F.lit(1)).cast("long").alias("total_n"),
    )
    d = b.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    c = d.select(F.col("decile").alias("c_decile"), F.col("n_pos").alias("c_pos"))
    cum = (
        d.select("decile")
        .join(F.broadcast(c), F.col("c_decile") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("c_pos").cast("long").alias("cum_pos"))
    )
    out = (
        d.join(cum, "decile")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("total_pos") > 0)
    )
    rate = F.col("n_pos").cast("double") / F.col("n_docs")
    base = F.col("total_pos").cast("double") / F.col("total_n")
    return out.select(
        "decile",
        "n_docs",
        "n_pos",
        rate.alias("pos_rate"),
        (rate / base).alias("lift"),
        (F.col("cum_pos").cast("double") / F.col("total_pos")).alias(
            "cum_capture"
        ),
    )


@_q(
    "vocab_rank_frequency_ratios",
    f"""
    WITH tf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM documents)
      GROUP BY tok),
    top AS (
      SELECT tok, freq,
             CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok ASC) AS BIGINT)
               AS rnk
      FROM tf ORDER BY freq DESC, tok ASC LIMIT 10),
    one AS (SELECT freq AS f1 FROM top WHERE rnk = 1)
    SELECT top.rnk AS rank, top.tok, top.freq,
           CAST(one.f1 AS DOUBLE) / top.freq AS top_over_freq,
           CAST(one.f1 AS DOUBLE) / (top.freq * top.rnk) AS zipf_deviation
    FROM top CROSS JOIN one
    """,
)
def vocab_rank_frequency_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF RANK-FREQUENCY check without logs: for the top-10 tokens,
    freq(1)/freq(r) and its deviation from the ideal Zipf value r
    (zipf_deviation = f1/(f_r * r), 1.0 = perfect unit-exponent Zipf) --
    a distribution whose deviations drift far from 1 is not natural-
    language-like (template or generated content), all from exact
    integer ratios (the log-log slope fit is non-portable; the fixed-
    rank ratio ladder carries the same signal for monitoring).

    Scale shape: one token aggregate, TakeOrdered top-10, rank window
    over the GlobalLimit-bounded list."""
    from lvm_datapipe_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    top = (
        tf.orderBy(F.desc("freq"), F.asc("tok"))
        .limit(10)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("freq"), F.asc("tok")))
            .cast("long"),
        )
    )
    one = top.filter(F.col("rank") == 1).select(F.col("freq").alias("f1"))
    return top.crossJoin(F.broadcast(one)).select(
        "rank",
        "tok",
        "freq",
        (F.col("f1").cast("double") / F.col("freq")).alias("top_over_freq"),
        (
            F.col("f1").cast("double") / (F.col("freq") * F.col("rank"))
        ).alias("zipf_deviation"),
    )


_TTV_P50 = _pctile_mirror_sql("arr", "n", 0.5)
_TTV_P90 = _pctile_mirror_sql("arr", "n", 0.9)


@_q(
    "time_to_value_quantiles",
    f"""
    WITH c AS (
      SELECT user_id, ts,
             SUM(CAST(value AS DECIMAL(9,6)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_v,
             MIN(ts) OVER (PARTITION BY user_id) AS first_ts
      FROM events WHERE value > CAST(0.0 AS DOUBLE)),
    hit AS (
      SELECT user_id,
             MIN(CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(first_ts)) AS BIGINT)) AS ttv_s
      FROM c WHERE cum_v >= CAST(100 AS DECIMAL(9,6))
      GROUP BY user_id),
    base AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             FROM events WHERE value > CAST(0.0 AS DOUBLE)),
    s AS (SELECT list(ttv_s ORDER BY ttv_s) AS arr,
                 CAST(count(*) AS BIGINT) AS n
          FROM hit)
    SELECT base.n_users,
           s.n AS n_reached,
           CAST(s.n AS DOUBLE) / base.n_users AS reach_rate,
           {_TTV_P50} AS p50_ttv_s,
           {_TTV_P90} AS p90_ttv_s
    FROM s CROSS JOIN base
    """,
)
def time_to_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-VALUE (first-passage) distribution: seconds from each
    user's first positive-value event until their CUMULATIVE value
    crosses 100 -- the activation metric ("how long until a user is
    worth X"), with the share of users who ever get there.  The
    first-passage time is the MIN event time where the user-partitioned
    decimal running sum crosses the threshold (exact decimal cumsum, so
    the crossing row is engine-identical); quantiles over the integer
    second latencies use the Spark-percentile mirror.

    Scale shape: one user-partitioned window pass, one user-keyed MIN,
    one global percentile aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0.0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wu = Window.partitionBy("user_id")
    c = ev.select(
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(9,6)")).over(w).alias("cum_v"),
        F.min("ts").over(wu).alias("first_ts"),
    )
    hit = (
        c.filter(F.col("cum_v") >= F.lit(100).cast("decimal(9,6)"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_seconds(F.col("ts").cast("timestamp"))
                - F.unix_seconds(F.col("first_ts").cast("timestamp"))
            ).alias("ttv_s")
        )
    )
    base = ev.agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    s = hit.agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.expr("percentile(ttv_s, 0.5)").alias("p50_ttv_s"),
        F.expr("percentile(ttv_s, 0.9)").alias("p90_ttv_s"),
    )
    return s.crossJoin(F.broadcast(base)).select(
        "n_users",
        "n_reached",
        (F.col("n_reached").cast("double") / F.col("n_users")).alias(
            "reach_rate"
        ),
        "p50_ttv_s",
        "p90_ttv_s",
    )


# NDCG@10 integer micro-discount ladder: floor(1e6 / log2(rank+1)) computed
# ONCE in Python (the shared-literal recipe — cross-engine log2 is not
# guaranteed bit-identical, integer literals are), plus its prefix sums for
# the ideal DCG.  Quantizing the discounts to integers makes per-query DCG an
# EXACT integer sum — no float-order sensitivity at all.
_NDCG_D = [1000000, 630929, 500000, 430676, 386852, 356207, 333333, 315464,
           301029, 289064]
_NDCG_P = [1000000, 1630929, 2130929, 2561605, 2948457, 3304664, 3637997,
           3953461, 4254490, 4543554]
_NDCG_D_SQL = "[" + ", ".join(str(d) for d in _NDCG_D) + "]"
_NDCG_P_SQL = "[" + ", ".join(str(p) for p in _NDCG_P) + "]"


@_q(
    "retrieval_ndcg_eval",
    f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv
          FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, q.q_label, e.vec_id AS neighbor_id, e.label,
             {_cos_sql('qv', 'v')} AS cos_sim
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, q_label, label,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
      FROM scored QUALIFY rk <= 10),
    dcg AS (
      SELECT query_id, q_label,
             CAST(SUM(CASE WHEN label = q_label
                           THEN ({_NDCG_D_SQL})[CAST(rk AS INTEGER)]
                           ELSE 0 END) AS BIGINT) AS dcg_micro
      FROM ranked GROUP BY query_id, q_label),
    labc AS (SELECT label, CAST(count(*) AS BIGINT) AS cnt
             FROM e GROUP BY label)
    SELECT d.query_id,
           CAST(labc.cnt - 1 AS BIGINT) AS n_relevant,
           d.dcg_micro,
           CAST(CASE WHEN labc.cnt - 1 >= 1
                     THEN ({_NDCG_P_SQL})[CAST(LEAST(labc.cnt - 1, 10) AS INTEGER)]
                     ELSE 0 END AS BIGINT) AS idcg_micro,
           CASE WHEN labc.cnt - 1 >= 1
                THEN CAST(d.dcg_micro AS DOUBLE)
                     / ({_NDCG_P_SQL})[CAST(LEAST(labc.cnt - 1, 10) AS INTEGER)]
                ELSE CAST(0.0 AS DOUBLE) END AS ndcg
    FROM dcg d JOIN labc ON labc.label = d.q_label
    """,
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the dense-retrieval leg, same-label relevance — the
    position-discounted ranking metric that [[retrieval_mrr_eval]] (first
    hit only) and [[ann_recall_eval]] (set overlap only) both miss: it
    rewards putting EVERY relevant result high, not just the first one.
    The log2 discounts are pre-quantized to integer micro-units (shared-
    literal recipe), so per-query DCG is an exact integer sum and the
    ideal DCG is a prefix-sum table lookup at min(#relevant, 10); NDCG
    itself is ONE float division.

    Scale shape: the broadcast-queries brute-force scan (10 fixed
    queries), per-query top-10 windows over the bounded candidate set, a
    label-cardinality aggregate (|labels| rows, broadcast back), then a
    10-row join — no corpus-sized shuffle beyond the scan."""
    from lvm_datapipe_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    topk = brute_force_topk(emb, queries, k=10)
    lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    qlab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    ranked = topk.join(lab, "neighbor_id").join(F.broadcast(qlab), "query_id")
    darr = F.array(*[F.lit(d) for d in _NDCG_D])
    parr = F.array(*[F.lit(p) for p in _NDCG_P])
    dcg = ranked.groupBy("query_id", "q_label").agg(
        F.sum(
            F.when(
                F.col("n_label") == F.col("q_label"),
                F.element_at(darr, F.col("rank").cast("int")),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("dcg_micro")
    )
    labc = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    j = dcg.join(
        F.broadcast(labc), F.col("label") == F.col("q_label")
    ).withColumn("n_relevant", (F.col("cnt") - 1).cast("long"))
    idcg = (
        F.when(
            F.col("n_relevant") >= 1,
            F.element_at(
                parr, F.least(F.col("n_relevant"), F.lit(10)).cast("int")
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return j.select(
        "query_id",
        "n_relevant",
        "dcg_micro",
        idcg.alias("idcg_micro"),
        F.when(
            F.col("n_relevant") >= 1,
            F.col("dcg_micro").cast("double") / idcg,
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
    )


@_q(
    "revenue_max_drawdown",
    f"""
    WITH m AS (
      SELECT n_name,
             CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
               + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1 AS month_id,
             strftime(o_orderdate, '%Y-%m') AS month,
             {_DEC_SUM.format(x='o_totalprice')} AS revenue
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY n_name, month_id, month),
    d AS (
      SELECT n_name, month_id, month, revenue,
             MAX(revenue) OVER (PARTITION BY n_name ORDER BY month_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - revenue
               AS drawdown
      FROM m),
    mx AS (SELECT n_name, MAX(drawdown) AS max_drawdown
           FROM d GROUP BY n_name)
    SELECT d.n_name, mx.max_drawdown, MIN(d.month) AS trough_month
    FROM d JOIN mx ON mx.n_name = d.n_name AND d.drawdown = mx.max_drawdown
    GROUP BY d.n_name, mx.max_drawdown
    """,
)
def revenue_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN of each nation's monthly revenue — the largest
    peak-to-current decline of the series (the risk readout finance runs
    on equity curves, applied to the KPI trend): for every month, the
    running peak minus the month's revenue; the per-nation max of that
    gap, with the EARLIEST trough month as the deterministic argmax.
    Complements [[revenue_mom_growth]] (one-step deltas can look mild
    while the cumulative slide from peak is severe) and
    [[events_cusum_shift]] (drawdown is the scale-free business-facing
    cousin of the CUSUM excursion).  Monthly revenue is the exact
    decimal sum, the running peak is an order-free MAX, and the
    drawdown is ONE float subtraction — so the argmax equality join is
    bit-safe cross-engine.

    Scale shape: one keyed aggregate over orders (nation x month), then
    nation-partitioned windows and joins over the months-sized table
    (bounded by calendar x |nations|, never by order volume)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    m = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            (
                F.year("o_orderdate").cast("long") * 12
                + F.month("o_orderdate").cast("long")
                - 1
            ).alias("month_id"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(A.decimal_sum("o_totalprice").alias("revenue"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("month_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = m.select(
        "n_name",
        "month",
        (F.max("revenue").over(w) - F.col("revenue")).alias("drawdown"),
    )
    mx = d.groupBy("n_name").agg(F.max("drawdown").alias("max_drawdown"))
    return (
        d.join(
            F.broadcast(mx.withColumnRenamed("n_name", "_n")),
            (F.col("n_name") == F.col("_n"))
            & (F.col("drawdown") == F.col("max_drawdown")),
        )
        .groupBy("n_name", "max_drawdown")
        .agg(F.min("month").alias("trough_month"))
    )


@_q(
    "events_mann_kendall_trend",
    """
    WITH h AS (
      SELECT event_type, CAST(strftime(ts, '%Y%m%d%H') AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hr),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
          FROM h GROUP BY event_type),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.c > a.c THEN 1
                           WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM h a JOIN h b ON b.event_type = a.event_type AND b.hr > a.hr
      GROUP BY a.event_type),
    t AS (
      SELECT event_type,
             CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS tc
            FROM h GROUP BY event_type, c)
      GROUP BY event_type),
    v AS (
      SELECT n.event_type, n.n_hours,
             COALESCE(s.s, 0) AS s,
             n.n_hours * (n.n_hours - 1) * (2 * n.n_hours + 5) - t.tie_term
               AS var18
      FROM n LEFT JOIN s ON s.event_type = n.event_type
             JOIN t ON t.event_type = n.event_type)
    SELECT event_type, n_hours, s,
           CAST(var18 AS DOUBLE) / 18.0 AS var_s,
           CASE WHEN var18 <= 0 THEN CAST(0.0 AS DOUBLE)
                WHEN s > 0
                  THEN CAST(s - 1 AS DOUBLE)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                WHEN s < 0
                  THEN CAST(s + 1 AS DOUBLE)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                ELSE CAST(0.0 AS DOUBLE) END AS z
    FROM v
    """,
)
def events_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL trend test per event type over the hourly-count
    series — the NONPARAMETRIC "is activity trending?" answer that
    [[events_trend_slope]]'s least-squares line can't give robustly
    (a single spike hour drags OLS; MK only sees pairwise ORDER).  The
    statistic S = sum of sign(c_j - c_i) over all hour pairs i<j is an
    exact INTEGER, the tie-corrected variance
    (n(n-1)(2n+5) - sum t(t-1)(2t+5))/18 is exact integer arithmetic up
    to one shared division, and the continuity-corrected z is one
    sqrt+divide over those integers — fully bit-portable, no logs.
    Kendall-family sibling of [[kendall_tau_source_size]] (same S-shape,
    applied to a time index) and the hypothesis-test companion to
    [[theil_sen_slope_by_user]] (MK decides IF a trend exists, Theil-Sen
    estimates its size).

    Scale shape: one keyed aggregate to hourly counts, then a per-type
    pair join over the HOURS table — O(H^2) per type where H is bounded
    by the calendar (24*days), NOT by event volume; at 100 TB the hourly
    rollup still has the same row count.  Equi-join on event_type with
    an hr range predicate — no cartesian."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.date_format(F.col("ts").cast("timestamp"), "yyyyMMddHH")
        .cast("long")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours")
    )
    b = h.select(
        F.col("event_type").alias("_t"),
        F.col("hr").alias("_hr"),
        F.col("c").alias("_c"),
    )
    s = (
        h.join(
            b,
            (F.col("_t") == F.col("event_type")) & (F.col("_hr") > F.col("hr")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("_c") > F.col("c"), F.lit(1))
                .when(F.col("_c") < F.col("c"), F.lit(-1))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("s")
        )
    )
    tc = h.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )
    t = tc.groupBy("event_type").agg(
        F.sum(
            F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
        )
        .cast("long")
        .alias("tie_term")
    )
    v = (
        n.join(s.withColumnRenamed("event_type", "_st"),
               F.col("_st") == F.col("event_type"), "left")
        .join(t.withColumnRenamed("event_type", "_tt"),
              F.col("_tt") == F.col("event_type"))
        .select(
            "event_type",
            "n_hours",
            F.coalesce(F.col("s"), F.lit(0).cast("long")).alias("s"),
            (
                F.col("n_hours")
                * (F.col("n_hours") - 1)
                * (2 * F.col("n_hours") + 5)
                - F.col("tie_term")
            ).alias("var18"),
        )
    )
    sq = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    return v.select(
        "event_type",
        "n_hours",
        "s",
        (F.col("var18").cast("double") / F.lit(18.0)).alias("var_s"),
        F.when(F.col("var18") <= 0, F.lit(0.0))
        .when(F.col("s") > 0, (F.col("s") - 1).cast("double") / sq)
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / sq)
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


@_q(
    "weighted_ess_by_type",
    f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             {_DEC_SUM.format(x='value')} AS sum_w,
             CAST(SUM(CAST(floor(value * value * 1000000.0) AS BIGINT))
                  AS BIGINT) AS sww_micro
      FROM events GROUP BY event_type),
    e AS (
      SELECT event_type, n, sum_w,
             CASE WHEN sww_micro > 0
                  THEN (sum_w * sum_w)
                       / (CAST(sww_micro AS DOUBLE) / 1000000.0)
                  ELSE CAST(0.0 AS DOUBLE) END AS ess
      FROM g)
    SELECT event_type, n, sum_w, ess, ess / n AS ess_efficiency
    FROM e
    """,
)
def weighted_ess_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish EFFECTIVE SAMPLE SIZE of `value`-weighted estimates per event
    type: ESS = (sum w)^2 / sum w^2 — how many EQUAL-weight samples the
    weighted set is worth, and ess/n, the design efficiency (1 = uniform
    weights; 0.2 means weighting threw away 80% of the data's power).
    The diagnostic a curation pipeline runs AFTER importance-weighting
    ([[sample_weighted]], [[dsir_target_selection]],
    [[sample_temperature_mix]]) to check the weights didn't collapse
    onto a few heavy rows; survey-statistics sibling of
    [[cluster_design_effect]].  sum(w) is the exact decimal sum; sum(w^2)
    uses the floor-micro integer quantization (w^2 computed in identical
    IEEE ops both engines); ESS is float math over those two exact sums.

    Scale shape: ONE keyed aggregate with map-side partials — scan-shaped,
    |event types| output rows."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        A.decimal_sum("value").alias("sum_w"),
        F.sum(
            F.floor(F.col("value") * F.col("value") * F.lit(1000000.0)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("sww_micro"),
    )
    ess = (
        F.when(
            F.col("sww_micro") > 0,
            (F.col("sum_w") * F.col("sum_w"))
            / (F.col("sww_micro").cast("double") / F.lit(1000000.0)),
        )
        .otherwise(F.lit(0.0))
    )
    e = g.select("event_type", "n", "sum_w", ess.alias("ess"))
    return e.select(
        "event_type",
        "n",
        "sum_w",
        "ess",
        (F.col("ess") / F.col("n")).alias("ess_efficiency"),
    )


@_q(
    "spc_individuals_chart",
    f"""
    WITH s AS (
      SELECT event_type, value,
             abs(value - lag(value) OVER (PARTITION BY event_type
                                          ORDER BY ts, event_id)) AS mr
      FROM events),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             {_dsum('value')} / count(*) AS center,
             CAST(SUM(CAST(floor(mr * 1000000.0) AS BIGINT)) AS BIGINT)
               AS mr_micro,
             CAST(count(mr) AS BIGINT) AS n_mr
      FROM s GROUP BY event_type),
    lim AS (
      SELECT event_type, n, center,
             CASE WHEN n_mr > 0
                  THEN CAST(mr_micro AS DOUBLE) / 1000000.0 / n_mr
                  ELSE CAST(0.0 AS DOUBLE) END AS mr_bar
      FROM g),
    lim2 AS (
      SELECT event_type, n, center, mr_bar,
             center + ({2.66!r})::DOUBLE * mr_bar AS ucl,
             center - ({2.66!r})::DOUBLE * mr_bar AS lcl
      FROM lim)
    SELECT lim2.event_type, lim2.n, lim2.center, lim2.mr_bar,
           lim2.ucl, lim2.lcl,
           CAST(SUM(CASE WHEN e.value > lim2.ucl OR e.value < lim2.lcl
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM events e JOIN lim2 ON lim2.event_type = e.event_type
    GROUP BY lim2.event_type, lim2.n, lim2.center, lim2.mr_bar,
             lim2.ucl, lim2.lcl
    """,
)
def spc_individuals_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC INDIVIDUALS (I-MR) CONTROL CHART limits per event type: center
    = exact decimal mean of `value`, average moving range MR-bar from
    consecutive |x_i - x_{i-1}| gaps (the Shewhart short-term noise
    estimate — immune to slow drift inflating a plain stddev), control
    limits center +/- 2.66*MR-bar (the d2-derived constant for n=2
    subgroups, injected as a shared literal), and the count of points
    outside the limits.  The manufacturing-QC reading of what
    [[events_zscore_outliers]] does with global sigma and
    [[events_ewma_residual_anomaly]] does with smoothed residuals; SPC
    limits are the version ops teams alert on.  MR gaps are identical
    one-op doubles, their mean uses the floor-micro order-free sum, and
    the violation comparison evaluates identical doubles on both
    engines.

    Scale shape: one type-partitioned window pass for the moving
    ranges, one keyed aggregate to |types| rows, then a broadcast join
    back over one more scan for the violation count — two scans total,
    no corpus-sized shuffle."""
    ev = load_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        "value",
        F.abs(F.col("value") - F.lag("value").over(wlag)).alias("mr"),
    )
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (A.decimal_sum("value") / F.count(F.lit(1))).alias("center"),
        F.sum(F.floor(F.col("mr") * F.lit(1000000.0)).cast("long"))
        .cast("long")
        .alias("mr_micro"),
        F.count("mr").cast("long").alias("n_mr"),
    )
    mr_bar = (
        F.when(
            F.col("n_mr") > 0,
            F.col("mr_micro").cast("double") / F.lit(1000000.0) / F.col("n_mr"),
        )
        .otherwise(F.lit(0.0))
    )
    lim = g.select(
        F.col("event_type").alias("_t"),
        "n",
        "center",
        mr_bar.alias("mr_bar"),
    ).select(
        "_t",
        "n",
        "center",
        "mr_bar",
        (F.col("center") + F.lit(2.66) * F.col("mr_bar")).alias("ucl"),
        (F.col("center") - F.lit(2.66) * F.col("mr_bar")).alias("lcl"),
    )
    return (
        ev.join(F.broadcast(lim), F.col("event_type") == F.col("_t"))
        .groupBy("event_type", "n", "center", "mr_bar", "ucl", "lcl")
        .agg(
            F.sum(
                F.when(
                    (F.col("value") > F.col("ucl"))
                    | (F.col("value") < F.col("lcl")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_violations")
        )
    )


@_q(
    "tokenizer_fertility_by_lang",
    rf"""
    WITH f AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
               AS n_bpe,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) AS BIGINT) AS n_words
      FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CASE WHEN SUM(n_words) > 0
                THEN CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_words)
                ELSE CAST(0.0 AS DOUBLE) END AS fertility
    FROM f GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY per language: BPE-ish tokens per whitespace
    word — THE tokenizer-equity diagnostic for multilingual training
    mixes (a language with fertility 3 pays 3x the context budget per
    word; mix weights and per-lang token budgets — [[mix_token_budget]],
    [[sample_temperature_mix]] — are wrong if computed in words).
    Numerator = the GPT-2-style pre-tokenizer count
    ([[text_bpe_token_count]]); denominator = whitespace words
    ([[text_token_count]]); the ratio is ONE float division over two
    exact integer sums.

    Scale shape: pure scan-shaped projection + ONE keyed aggregate to
    |langs| rows; both token counts come from the same row pass."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "lang",
        F.size(
            F.regexp_extract_all("text", F.lit(_BPE_PATTERN), F.lit(0))
        )
        .cast("long")
        .alias("n_bpe"),
        X.token_count("text").cast("long").alias("n_words"),
    )
    return f.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.when(
            F.sum("n_words") > 0,
            F.sum("n_bpe").cast("double") / F.sum("n_words"),
        )
        .otherwise(F.lit(0.0))
        .alias("fertility"),
    )


@_q(
    "stickiness_dau_mau",
    """
    WITH d AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             strftime(CAST(ts AS DATE), '%Y-%m') AS month,
             user_id
      FROM events WHERE ts IS NOT NULL),
    dau AS (
      SELECT day, month, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM d GROUP BY day, month),
    mau AS (
      SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM d GROUP BY month)
    SELECT dau.day, dau.dau, mau.mau,
           CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
    FROM dau JOIN mau ON mau.month = dau.month
    """,
)
def stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS per day: daily active users over the calendar
    month's active users — the engagement-frequency KPI (a 0.5 product
    is used every other day; a 0.05 one is monthly).  The numerator
    and denominator are exact distinct counts; the ratio is ONE float
    division.  Complements [[user_lifecycle_accounting]] (which explains
    WHY actives moved via new/retained/resurrected flows; stickiness
    measures how OFTEN the stock engages) and
    [[events_hourly_distinct_users]] (finer grain, no normalization).

    Scale shape: two distinct-aggregates keyed by day/month (map-side
    partial dedup on (day, user)), then a broadcast join of the
    months-sized table onto the days-sized table.  For the
    one-pass-at-100TB variant of the distinct counts, the HLL-sketch
    twin is [[approx_distinct_users]]."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d = ev.select(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.col("ts").cast("date"), "yyyy-MM").alias("month"),
        "user_id",
    )
    dau = d.groupBy("day", "month").agg(
        F.count_distinct("user_id").cast("long").alias("dau")
    )
    mau = d.groupBy("month").agg(
        F.count_distinct("user_id").cast("long").alias("mau")
    ).withColumnRenamed("month", "_m")
    return (
        dau.join(F.broadcast(mau), F.col("month") == F.col("_m"))
        .select(
            "day",
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
    )


@_q(
    "graph_degree_assortativity",
    """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT x.l_partkey AS p1, y.l_partkey AS p2
      FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                       AND x.l_partkey < y.l_partkey
      GROUP BY x.l_partkey, y.l_partkey
      HAVING count(*) >= 2),
    d AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
      GROUP BY node),
    o AS (SELECT p1 AS u, p2 AS v FROM e
          UNION ALL SELECT p2, p1 FROM e),
    j AS (
      SELECT du.deg AS dx, dv.deg AS dy
      FROM o JOIN d du ON du.node = o.u JOIN d dv ON dv.node = o.v),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS np,
             CAST(SUM(dx) AS BIGINT) AS sx,
             CAST(SUM(dy) AS BIGINT) AS sy,
             CAST(SUM(dx * dx) AS BIGINT) AS sxx,
             CAST(SUM(dy * dy) AS BIGINT) AS syy,
             CAST(SUM(dx * dy) AS BIGINT) AS sxy
      FROM j)
    SELECT CAST(np // 2 AS BIGINT) AS n_edges, sx AS sum_deg, sxx AS sum_deg_sq, sxy AS sum_dxdy,
           CASE WHEN (np * sxx - sx * sx) > 0 AND (np * syy - sy * sy) > 0
                THEN CAST(np * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                            * CAST(np * syy - sy * sy AS DOUBLE))
                ELSE CAST(0.0 AS DOUBLE) END AS assortativity
    FROM m
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002) of the co-purchase part graph:
    the Pearson correlation of endpoint degrees over all edge ends —
    positive means hubs link to hubs (social-network shape), negative
    means hubs link to leaves (dependency/star shape); it predicts how
    the graph fragments under node loss and how dup-clusters percolate.
    Network-science sibling of [[graph_triangle_counts]] (same edge
    set) and [[dup_graph_degree_hist]] (marginal degree distribution;
    assortativity is the joint-distribution summary).  Degrees are
    exact integers, every moment is an exact BIGINT sum, and the
    coefficient is ONE float expression over six integers — fully
    bit-portable.

    Scale shape: the bounded co-purchase edge build (keyed self-join on
    order), a node-keyed degree count, two degree lookups keyed by
    endpoint, and a single scalar aggregate with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    e = (
        b.join(
            b.select(
                F.col("l_orderkey").alias("_o"),
                F.col("l_partkey").alias("p2"),
            ),
            (F.col("l_orderkey") == F.col("_o"))
            & (F.col("l_partkey") < F.col("p2")),
        )
        .groupBy(F.col("l_partkey").alias("p1"), "p2")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 2)
        .select("p1", "p2")
    )
    d = (
        e.select(F.col("p1").alias("node"))
        .unionAll(e.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    o = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionAll(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    j = (
        o.join(
            d.select(F.col("node").alias("_u"), F.col("deg").alias("dx")),
            F.col("u") == F.col("_u"),
        )
        .join(
            d.select(F.col("node").alias("_v"), F.col("deg").alias("dy")),
            F.col("v") == F.col("_v"),
        )
        .select("dx", "dy")
    )
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    vx = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        (F.col("np") / 2).cast("long").alias("n_edges"),
        F.col("sx").alias("sum_deg"),
        F.col("sxx").alias("sum_deg_sq"),
        F.col("sxy").alias("sum_dxdy"),
        F.when(
            (vx > 0) & (vy > 0),
            (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(vx.cast("double") * vy.cast("double")),
        )
        .otherwise(F.lit(0.0))
        .alias("assortativity"),
    )


@_q(
    "supplier_ontime_wilson_rank",
    f"""
    WITH lat AS (
      SELECT l.l_suppkey,
             CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) <= 60
                  THEN 1 ELSE 0 END AS ontime
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    g AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n_ships,
             CAST(SUM(ontime) AS BIGINT) AS n_ontime
      FROM lat GROUP BY l_suppkey),
    p AS (
      SELECT l_suppkey, n_ships, n_ontime,
             CAST(n_ontime AS DOUBLE) / n_ships AS phat,
             CAST(n_ships AS DOUBLE) AS nd
      FROM g WHERE n_ships > 0),
    w AS (
      SELECT l_suppkey, n_ships, n_ontime, phat,
             ((phat + '{_WILSON_Z2!r}'::DOUBLE / (2 * nd))
              - '{_WILSON_Z!r}'::DOUBLE
                * sqrt((phat * (1.0 - phat)) / nd
                       + '{_WILSON_Z2!r}'::DOUBLE / (4 * nd * nd)))
             / (1.0 + '{_WILSON_Z2!r}'::DOUBLE / nd) AS wilson_low
      FROM p)
    SELECT l_suppkey, n_ships, n_ontime, phat, wilson_low
    FROM w
    ORDER BY wilson_low DESC, l_suppkey
    LIMIT 20
    """,
)
def supplier_ontime_wilson_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier leaderboard by the WILSON LOWER BOUND of the on-time-ship
    rate (shipped within 60 days of order) — the "how not to sort by
    average rating" fix: ranking by raw rate lets a 2-for-2 supplier
    beat a 980-for-1000 one; the lower confidence bound ranks by the
    rate the EVIDENCE supports.  Shares the shared-literal Wilson
    z=1.96 recipe with [[conversion_wilson_ci]]; supply-chain sibling
    of [[ship_latency_by_priority]].  The latency flag and counts are
    exact integers; the bound is float math over identical inputs, and
    the top-20 carries the full deterministic ordering (bound, then
    suppkey).

    Scale shape: one keyed join (lineitem-orders on orderkey), one
    supplier-keyed aggregate, then a global top-20 over the
    suppliers-sized table (TakeOrderedAndProject — no global sort
    materialization)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(
        "l_suppkey",
        F.when(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            <= 60,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("ontime"),
    )
    g = lat.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_ships"),
        F.sum("ontime").cast("long").alias("n_ontime"),
    )
    p = g.filter(F.col("n_ships") > 0).select(
        "l_suppkey",
        "n_ships",
        "n_ontime",
        (F.col("n_ontime").cast("double") / F.col("n_ships")).alias("phat"),
        F.col("n_ships").cast("double").alias("nd"),
    )
    z = F.lit(_WILSON_Z)
    z2 = F.lit(_WILSON_Z2)
    wilson_low = (
        (F.col("phat") + z2 / (2 * F.col("nd")))
        - z
        * F.sqrt(
            (F.col("phat") * (1.0 - F.col("phat"))) / F.col("nd")
            + z2 / (4 * F.col("nd") * F.col("nd"))
        )
    ) / (1.0 + z2 / F.col("nd"))
    return (
        p.select(
            "l_suppkey", "n_ships", "n_ontime", "phat",
            wilson_low.alias("wilson_low"),
        )
        .orderBy(F.desc("wilson_low"), F.asc("l_suppkey"))
        .limit(20)
    )


@_q(
    "price_index_fisher",
    f"""
    WITH pp AS (
      SELECT l.l_partkey,
             CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS yr,
             {_dsum('l.l_extendedprice')} AS sp,
             {_dsum('l.l_quantity')} AS sq
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) IN (1995, 2000)
      GROUP BY l.l_partkey, yr),
    px AS (
      SELECT l_partkey, yr, sp / sq AS price, sq AS qty
      FROM pp WHERE sq > 0),
    m AS (
      SELECT b.l_partkey,
             b.price AS p0, b.qty AS q0,
             c.price AS p1, c.qty AS q1
      FROM px b JOIN px c ON c.l_partkey = b.l_partkey
      WHERE b.yr = 1995 AND c.yr = 2000),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(SUM(CAST(floor(p1 * q0 * 1000000.0) AS BIGINT)) AS BIGINT)
               AS l_num,
             CAST(SUM(CAST(floor(p0 * q0 * 1000000.0) AS BIGINT)) AS BIGINT)
               AS l_den,
             CAST(SUM(CAST(floor(p1 * q1 * 1000000.0) AS BIGINT)) AS BIGINT)
               AS p_num,
             CAST(SUM(CAST(floor(p0 * q1 * 1000000.0) AS BIGINT)) AS BIGINT)
               AS p_den
      FROM m)
    SELECT n_parts,
           CAST(l_num AS DOUBLE) / l_den AS laspeyres,
           CAST(p_num AS DOUBLE) / p_den AS paasche,
           sqrt((CAST(l_num AS DOUBLE) / l_den)
                * (CAST(p_num AS DOUBLE) / p_den)) AS fisher
    FROM s WHERE l_den > 0 AND p_den > 0
    """,
)
def price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LASPEYRES / PAASCHE / FISHER price indices between 1995 and 2000
    over parts traded in BOTH years — index-number theory's answer to
    "how much did prices move, holding the basket fixed?" (Laspeyres
    fixes the base-year basket and overstates inflation; Paasche fixes
    the current basket and understates it; Fisher is their geometric
    mean and the superlative index national statistics publish).
    Complements [[revenue_bridge_by_month]] (which decomposes revenue
    into price/volume/mix effects month-to-month; the index family
    aggregates the price component into one comparable number).
    Per-part year prices are ratios of exact decimal sums; every
    basket-weighted sum uses the floor-micro integer quantization, so
    the three indices are float math over exact integers.

    Scale shape: one keyed join + (part, year)-keyed aggregate, a
    parts-sized self-join to align the two years, and one scalar
    aggregate with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("long")
    pp = (
        li.join(
            o.select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(yr.isin(1995, 2000))
        .groupBy("l_partkey", yr.alias("yr"))
        .agg(
            A.decimal_sum("l_extendedprice").alias("sp"),
            A.decimal_sum("l_quantity").alias("sq"),
        )
    )
    px = pp.filter(F.col("sq") > 0).select(
        "l_partkey",
        "yr",
        (F.col("sp") / F.col("sq")).alias("price"),
        F.col("sq").alias("qty"),
    )
    b = px.filter(F.col("yr") == 1995).select(
        "l_partkey", F.col("price").alias("p0"), F.col("qty").alias("q0")
    )
    c = px.filter(F.col("yr") == 2000).select(
        F.col("l_partkey").alias("_pk"),
        F.col("price").alias("p1"),
        F.col("qty").alias("q1"),
    )
    m = b.join(c, F.col("l_partkey") == F.col("_pk"))

    def _micro(x):
        return F.sum(F.floor(x * F.lit(1000000.0)).cast("long")).cast("long")

    s = m.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        _micro(F.col("p1") * F.col("q0")).alias("l_num"),
        _micro(F.col("p0") * F.col("q0")).alias("l_den"),
        _micro(F.col("p1") * F.col("q1")).alias("p_num"),
        _micro(F.col("p0") * F.col("q1")).alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den")
    paas = F.col("p_num").cast("double") / F.col("p_den")
    return s.filter((F.col("l_den") > 0) & (F.col("p_den") > 0)).select(
        "n_parts",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


@_q(
    "capture_recapture_users",
    """
    WITH d1 AS (SELECT DISTINCT user_id FROM events
                WHERE strftime(CAST(ts AS DATE), '%Y-%m-%d') = '2024-01-05'),
    d2 AS (SELECT DISTINCT user_id FROM events
           WHERE strftime(CAST(ts AS DATE), '%Y-%m-%d') = '2024-01-20'),
    s AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM d1) AS n1,
             (SELECT CAST(count(*) AS BIGINT) FROM d2) AS n2,
             (SELECT CAST(count(*) AS BIGINT)
              FROM d1 JOIN d2 ON d2.user_id = d1.user_id) AS m)
    SELECT n1, n2, m,
           CASE WHEN m > 0
                THEN CAST(n1 * n2 AS DOUBLE) / m
                ELSE CAST(0.0 AS DOUBLE) END AS lincoln_petersen,
           CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / (m + 1) - 1.0 AS chapman
    FROM s
    """,
)
def capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPTURE-RECAPTURE estimate of the total user population from two
    single-day samples (Jan 5 = capture, Jan 20 = recapture): the
    Lincoln-Petersen estimator n1*n2/m and the small-sample-safe
    Chapman form (n1+1)(n2+1)/(m+1) - 1 — the ecology method that
    estimates how many users EXIST from how often two samples overlap,
    the same mark-recapture logic used to size hidden duplicate
    populations and un-crawled corpora from two independent crawls
    (companion to [[minhash_estimate_error]]'s sketch-vs-truth framing).
    All three inputs are exact distinct counts; the estimators are one
    float expression each.

    Scale shape: two day-filtered distinct sets (partition-prunable on
    a date-partitioned layout), one keyed semi-join for the overlap,
    three scalar counts broadcast into a single output row."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd")
    d1 = ev.filter(day == "2024-01-05").select("user_id").distinct()
    d2 = ev.filter(day == "2024-01-20").select("user_id").distinct()
    n1 = d1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = d2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    m = (
        d1.join(d2.withColumnRenamed("user_id", "_u"),
                F.col("user_id") == F.col("_u"))
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    s = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(m))
    return s.select(
        "n1",
        "n2",
        "m",
        F.when(
            F.col("m") > 0,
            (F.col("n1") * F.col("n2")).cast("double") / F.col("m"),
        )
        .otherwise(F.lit(0.0))
        .alias("lincoln_petersen"),
        (
            ((F.col("n1") + 1) * (F.col("n2") + 1)).cast("double")
            / (F.col("m") + 1)
            - F.lit(1.0)
        ).alias("chapman"),
    )


@_q(
    "ab_test_srm_check",
    """
    WITH a AS (
      SELECT DISTINCT user_id,
             ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm
      FROM events),
    g AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM a)
    SELECT n0, n1,
           CAST(n0 - n1 AS DOUBLE) * (n0 - n1) / (n0 + n1) AS chisq,
           CAST(n0 - n1 AS DOUBLE) * (n0 - n1) / (n0 + n1) > 3.841 AS srm_flag
    FROM g WHERE n0 + n1 > 0
    """,
)
def ab_test_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH check for the standing md5 50/50 user split
    (the same assignment hash as [[ab_test_welch_z]]): the 1-df
    chi-square statistic (n0-n1)^2/(n0+n1) against the expected equal
    split, flagged at the 3.841 critical value (alpha=0.05) — the FIRST
    gate every experiment readout must pass, because a lopsided
    assignment invalidates every downstream effect estimate (SRM usually
    means bot filtering, logging loss, or redirect bias, not chance).
    Counts are exact integers; the statistic is one float expression;
    the critical value is a shared literal, so the flag is bit-safe.

    Scale shape: one distinct-user pass (map-side partial dedup), one
    scalar aggregate."""
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    a = ev.select("user_id").distinct().select(arm.alias("arm"))
    g = a.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    chisq = (
        (F.col("n0") - F.col("n1")).cast("double")
        * (F.col("n0") - F.col("n1"))
        / (F.col("n0") + F.col("n1"))
    )
    return g.filter((F.col("n0") + F.col("n1")) > 0).select(
        "n0",
        "n1",
        chisq.alias("chisq"),
        (chisq > F.lit(3.841)).alias("srm_flag"),
    )


@_q(
    "phi_coefficient_pairs",
    """
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM b),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
          FROM b GROUP BY event_type),
    p AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
                 CAST(count(*) AS BIGINT) AS n11
          FROM b x JOIN b y ON x.user_id = y.user_id
                AND x.event_type < y.event_type
          GROUP BY x.event_type, y.event_type),
    cells AS (
      SELECT p.type_a, p.type_b, p.n11,
             na.n_users - p.n11 AS n10,
             nb.n_users - p.n11 AS n01,
             tot.n - na.n_users - nb.n_users + p.n11 AS n00,
             na.n_users AS n_a, nb.n_users AS n_b, tot.n AS n
      FROM p JOIN n na ON na.event_type = p.type_a
             JOIN n nb ON nb.event_type = p.type_b
             CROSS JOIN tot)
    SELECT type_a, type_b, n11, n10, n01, n00,
           CASE WHEN n_a > 0 AND n_a < n AND n_b > 0 AND n_b < n
                THEN CAST(n11 * n00 - n10 * n01 AS DOUBLE)
                     / sqrt(CAST(n_a AS DOUBLE) * (n - n_a)
                            * n_b * (n - n_b))
                ELSE CAST(0.0 AS DOUBLE) END AS phi
    FROM cells
    """,
)
def phi_coefficient_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHI COEFFICIENT (Matthews correlation) between every pair of
    event-type audiences: the 2x2 contingency correlation over "did the
    user ever do A" x "did the user ever do B" — the SIGNED complement
    to [[audience_overlap_pairs]]' Jaccard (overlap can look mild while
    phi reveals strong NEGATIVE association: audiences that avoid each
    other, the cross-sell dead ends) and the per-pair granular form of
    [[association_type_hour_cramers_v]].  All four contingency cells
    are exact integers derived from three distinct-counts; phi is ONE
    float expression (the sqrt of an integer product), so it is
    bit-portable.

    Scale shape: one distinct pass, a user-keyed pair join bounded by
    |types|^2 output, a types-sized join, one broadcast scalar — the
    corpus shuffles once on user_id."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select("user_id", "event_type").distinct()
    tot = b.agg(F.count_distinct("user_id").cast("long").alias("n"))
    n = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    y = b.select(
        F.col("user_id").alias("_u"), F.col("event_type").alias("type_b")
    )
    p = (
        b.join(
            y,
            (F.col("user_id") == F.col("_u"))
            & (F.col("event_type") < F.col("type_b")),
        )
        .groupBy(F.col("event_type").alias("type_a"), "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n11"))
    )
    na = n.select(F.col("event_type").alias("_a"), F.col("n_users").alias("n_a"))
    nb = n.select(F.col("event_type").alias("_b"), F.col("n_users").alias("n_b"))
    cells = (
        p.join(F.broadcast(na), F.col("type_a") == F.col("_a"))
        .join(F.broadcast(nb), F.col("type_b") == F.col("_b"))
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n11",
            (F.col("n_a") - F.col("n11")).alias("n10"),
            (F.col("n_b") - F.col("n11")).alias("n01"),
            (F.col("n") - F.col("n_a") - F.col("n_b") + F.col("n11")).alias(
                "n00"
            ),
            "n_a",
            "n_b",
            "n",
        )
    )
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_a") < F.col("n"))
        & (F.col("n_b") > 0)
        & (F.col("n_b") < F.col("n"))
    )
    return cells.select(
        "type_a",
        "type_b",
        "n11",
        "n10",
        "n01",
        "n00",
        F.when(
            ok,
            (
                F.col("n11") * F.col("n00") - F.col("n10") * F.col("n01")
            ).cast("double")
            / F.sqrt(
                F.col("n_a").cast("double")
                * (F.col("n") - F.col("n_a"))
                * F.col("n_b")
                * (F.col("n") - F.col("n_b"))
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("phi"),
    )


@_q(
    "cohens_d_by_type",
    f"""
    WITH a AS (
      SELECT event_type, value,
             ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm
      FROM events),
    g AS (
      SELECT event_type, arm,
             CAST(count(*) AS BIGINT) AS n,
             {_dsum('value')} AS s,
             CAST(SUM(CAST(floor(value * value * 1000000.0) AS BIGINT))
                  AS BIGINT) AS ss_micro
      FROM a GROUP BY event_type, arm),
    w AS (
      SELECT g0.event_type,
             g0.n AS n0, g1.n AS n1,
             g0.s / g0.n AS m0, g1.s / g1.n AS m1,
             (CAST(g0.ss_micro AS DOUBLE) / 1000000.0 - g0.s * g0.s / g0.n)
               AS ssd0,
             (CAST(g1.ss_micro AS DOUBLE) / 1000000.0 - g1.s * g1.s / g1.n)
               AS ssd1
      FROM g g0 JOIN g g1 ON g1.event_type = g0.event_type
      WHERE g0.arm = 0 AND g1.arm = 1 AND g0.n > 0 AND g1.n > 0)
    SELECT event_type, n0, n1, m0, m1,
           CASE WHEN n0 + n1 > 2 AND (ssd0 + ssd1) > 0
                THEN (m1 - m0) / sqrt((ssd0 + ssd1) / (n0 + n1 - 2))
                ELSE CAST(0.0 AS DOUBLE) END AS cohens_d
    FROM w
    """,
)
def cohens_d_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S D standardized effect size per event type under the
    standing md5 A/B split: (mean1 - mean0) / pooled SD — the
    scale-free number that makes effects comparable across metrics and
    feeds power planning ([[ab_test_mde_readout]] inverts it;
    [[ab_test_welch_z]] answers "significant?", d answers "how BIG?").
    Arm means are exact decimal sums over counts; the pooled
    sum-of-squared-deviations uses the floor-micro quantized sum of
    squares minus the exact-mean correction — every input to the final
    sqrt+divide is bit-identical cross-engine.

    Scale shape: ONE keyed aggregate (type x arm partials, map-side),
    then a |types|-sized self-join — scan-shaped."""
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    g = ev.select("event_type", "value", arm.alias("arm")).groupBy(
        "event_type", "arm"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        A.decimal_sum("value").alias("s"),
        F.sum(
            F.floor(F.col("value") * F.col("value") * F.lit(1000000.0)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("ss_micro"),
    )
    g0 = g.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n0"),
        F.col("s").alias("s0"),
        F.col("ss_micro").alias("ssm0"),
    )
    g1 = g.filter(F.col("arm") == 1).select(
        F.col("event_type").alias("_t"),
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("ss_micro").alias("ssm1"),
    )
    w = (
        g0.join(g1, F.col("event_type") == F.col("_t"))
        .filter((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            "event_type",
            "n0",
            "n1",
            (F.col("s0") / F.col("n0")).alias("m0"),
            (F.col("s1") / F.col("n1")).alias("m1"),
            (
                F.col("ssm0").cast("double") / F.lit(1000000.0)
                - F.col("s0") * F.col("s0") / F.col("n0")
            ).alias("ssd0"),
            (
                F.col("ssm1").cast("double") / F.lit(1000000.0)
                - F.col("s1") * F.col("s1") / F.col("n1")
            ).alias("ssd1"),
        )
    )
    return w.select(
        "event_type",
        "n0",
        "n1",
        "m0",
        "m1",
        F.when(
            ((F.col("n0") + F.col("n1")) > 2)
            & ((F.col("ssd0") + F.col("ssd1")) > 0),
            (F.col("m1") - F.col("m0"))
            / F.sqrt(
                (F.col("ssd0") + F.col("ssd1"))
                / (F.col("n0") + F.col("n1") - 2)
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("cohens_d"),
    )


@_q(
    "cochran_armitage_hourly_trend",
    """
    WITH h AS (
      SELECT CAST(hour(ts) AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_i
      FROM events GROUP BY hour(ts)),
    s AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(SUM(r_i) AS BIGINT) AS r,
             CAST(SUM(w * r_i) AS BIGINT) AS swr,
             CAST(SUM(w * n_i) AS BIGINT) AS swn,
             CAST(SUM(w * w * n_i) AS BIGINT) AS sw2n
      FROM h),
    t AS (
      SELECT n, r, swr, swn, sw2n,
             CAST(swr AS DOUBLE)
               - CAST(swn AS DOUBLE) * r / n AS t_stat,
             (CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)
               * (CAST(sw2n AS DOUBLE)
                  - CAST(swn AS DOUBLE) * swn / n) AS var_t
      FROM s WHERE n > 0)
    SELECT n, r, t_stat, var_t,
           CASE WHEN var_t > 0 THEN t_stat / sqrt(var_t)
                ELSE CAST(0.0 AS DOUBLE) END AS z
    FROM t
    """,
)
def cochran_armitage_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN-ARMITAGE trend test: does the purchase RATE trend
    monotonically across hour-of-day? — the test for proportions over
    ORDERED categories that a plain chi-square
    ([[association_type_hour_cramers_v]]) cannot answer (chi-square
    sees any deviation; CA specifically tests a linear trend in the
    ordered scores, buying power when the alternative is monotone).
    Scores w = hour (0-23); every moment (Swr, Swn, Sw2n, R, N) is an
    exact BIGINT; T, its variance, and z are float expressions over
    those integers — bit-portable, no logs, no CDFs.

    Scale shape: one keyed aggregate to 24 rows, one scalar aggregate.
    Time-of-day sibling of [[events_mann_kendall_trend]] (MK tests a
    trend over TIME; CA tests a rate trend over an ordered covariate)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.hour("ts").cast("long").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("r_i"),
    )
    s = h.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("r_i").cast("long").alias("r"),
        F.sum(F.col("w") * F.col("r_i")).cast("long").alias("swr"),
        F.sum(F.col("w") * F.col("n_i")).cast("long").alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n_i"))
        .cast("long")
        .alias("sw2n"),
    )
    pbar = F.col("r").cast("double") / F.col("n")
    t = s.filter(F.col("n") > 0).select(
        "n",
        "r",
        (
            F.col("swr").cast("double")
            - F.col("swn").cast("double") * F.col("r") / F.col("n")
        ).alias("t_stat"),
        (
            pbar
            * (F.lit(1.0) - pbar)
            * (
                F.col("sw2n").cast("double")
                - F.col("swn").cast("double") * F.col("swn") / F.col("n")
            )
        ).alias("var_t"),
    )
    return t.select(
        "n",
        "r",
        "t_stat",
        "var_t",
        F.when(F.col("var_t") > 0, F.col("t_stat") / F.sqrt(F.col("var_t")))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


@_q(
    "leaderboard_churn_monthly",
    f"""
    WITH m AS (
      SELECT l_partkey,
             CAST(strftime(l_shipdate, '%Y') AS BIGINT) * 12
               + CAST(strftime(l_shipdate, '%m') AS BIGINT) - 1 AS month_id,
             strftime(l_shipdate, '%Y-%m') AS month,
             {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem GROUP BY l_partkey, month_id, month),
    r AS (
      SELECT month_id, month, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY month_id
               ORDER BY revenue DESC, l_partkey) AS rk
      FROM m QUALIFY rk <= 20),
    counts AS (
      SELECT month_id, month, CAST(count(*) AS BIGINT) AS n_top
      FROM r GROUP BY month_id, month),
    o AS (
      SELECT c.month_id, CAST(count(*) AS BIGINT) AS n_common
      FROM r c JOIN r p ON p.month_id = c.month_id - 1
                       AND p.l_partkey = c.l_partkey
      GROUP BY c.month_id),
    pairs AS (
      SELECT cc.month_id, cc.month, cc.n_top AS n_curr, cp.n_top AS n_prev
      FROM counts cc JOIN counts cp ON cp.month_id = cc.month_id - 1)
    SELECT pairs.month, pairs.n_curr, pairs.n_prev,
           COALESCE(o.n_common, 0) AS n_common,
           CAST(COALESCE(o.n_common, 0) AS DOUBLE)
             / (pairs.n_curr + pairs.n_prev - COALESCE(o.n_common, 0))
             AS jaccard_topk
    FROM pairs LEFT JOIN o ON o.month_id = pairs.month_id
    """,
)
def leaderboard_churn_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEADERBOARD CHURN: month-over-month Jaccard overlap of the top-20
    parts by revenue — how stable the "best sellers" list is (a churning
    leaderboard means trend-driven demand or noisy rankings; a frozen
    one means entrenched winners).  The rank-stability KPI behind
    merchandising dashboards, and the exact set-overlap cousin of
    [[rbo_lex_vs_vector]] (RBO weights by rank; this measures raw
    membership churn).  Revenue is the exact decimal sum, top-20 carries
    the full deterministic ordering (revenue, then partkey), overlap
    and Jaccard are exact integers and ONE division; month pairs whose
    top-20 sets are fully disjoint are KEPT with n_common = 0 (total
    churn is the loudest signal, not a row to drop).

    Scale shape: one (part, month)-keyed aggregate, a month-partitioned
    top-k window over the parts-sized rollup, then self-joins of the
    20-rows-per-month table — everything after the first aggregate is
    months-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_partkey",
        (
            F.year("l_shipdate").cast("long") * 12
            + F.month("l_shipdate").cast("long")
            - 1
        ).alias("month_id"),
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
    ).agg(
        A.decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue")
    )
    w = Window.partitionBy("month_id").orderBy(
        F.desc("revenue"), F.asc("l_partkey")
    )
    r = (
        m.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("month_id", "month", "l_partkey")
    )
    counts = r.groupBy("month_id", "month").agg(
        F.count(F.lit(1)).cast("long").alias("n_top")
    )
    p = r.select(
        (F.col("month_id") + 1).alias("_mid"), F.col("l_partkey").alias("_pk")
    )
    o = (
        r.join(
            p,
            (F.col("month_id") == F.col("_mid"))
            & (F.col("l_partkey") == F.col("_pk")),
        )
        .groupBy("month_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .withColumnRenamed("month_id", "_omid")
    )
    cp = counts.select(
        (F.col("month_id") + 1).alias("_p"), F.col("n_top").alias("n_prev")
    )
    pairs = counts.join(F.broadcast(cp), F.col("month_id") == F.col("_p")).select(
        "month_id", "month", F.col("n_top").alias("n_curr"), "n_prev"
    )
    nc = F.coalesce(F.col("n_common"), F.lit(0).cast("long"))
    return (
        pairs.join(F.broadcast(o), F.col("month_id") == F.col("_omid"), "left")
        .select(
            "month",
            "n_curr",
            "n_prev",
            nc.alias("n_common"),
            (
                nc.cast("double")
                / (F.col("n_curr") + F.col("n_prev") - nc)
            ).alias("jaccard_topk"),
        )
    )


@_q(
    "stream_sink_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS sid
      FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def stream_sink_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the NATIVE session_window aggregation as an ACTUAL streaming
    job (watermark + append mode + checkpointed parquet sink), then
    returns the sink contents — the live-stream proof that dynamic-gap
    session windows emit exactly the batch gaps-and-islands result
    ([[events_native_session_window]] is the batch twin; this is the
    micro-batched, stateful, watermark-closed run of the same
    expression).  A far-future sentinel user lands as a second
    micro-batch so the watermark passes every real session's end and
    append mode flushes them; the sentinel's own (never-closed) session
    stays in state and is filtered by user_id.

    Scale shape: streaming state is one open session per active user
    (keyed by user_id), closed sessions stream out append-only —
    the constant-memory production sessionizer."""
    import datetime as _dt
    import tempfile

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from lvm_datapipe_spark.streaming import events as EV

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="stream_sess_q_")
    landing, sink, ckpt = f"{base}/landing", f"{base}/sink", f"{base}/ckpt"
    ev.write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema(ev.schema).parquet(landing)
    agg = (
        EV.ensure_event_time(stream)
        .withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    q = EV.start_to_parquet(agg, sink, ckpt)
    q.processAllAvailable()

    sentinel = {f.name: None for f in ev.schema.fields}
    sentinel.update(
        event_id=-1,
        ts=_dt.datetime(2100, 1, 1),
        user_id=-1,
        event_type="flush_sentinel",
        value=0.0,
    )
    spark.createDataFrame(
        [Row(**{f.name: sentinel[f.name] for f in ev.schema.fields})], ev.schema
    ).write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()

    out = spark.read.parquet(sink).filter(F.col("user_id") != -1)
    # ensure_event_time casts an NTZ event-time to TIMESTAMP for the
    # watermark; cast the session bounds back so the result schema matches
    # the oracle regardless of the source flavor (UTC session: value-exact).
    if isinstance(ev.schema["ts"].dataType, T.TimestampNTZType):
        out = out.withColumn(
            "session_start", F.col("session_start").cast("timestamp_ntz")
        ).withColumn("session_end", F.col("session_end").cast("timestamp_ntz"))
    return out


@_q(
    "dedup_simhash_bit_bias",
    _SIMHASH_FP_CTES
    + """
    SELECT b.b AS bit,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN substr(simhash, b.b + 1, 1) = '1'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ones,
           CAST(SUM(CASE WHEN substr(simhash, b.b + 1, 1) = '1'
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS p_one,
           abs(CAST(SUM(CASE WHEN substr(simhash, b.b + 1, 1) = '1'
                             THEN 1 ELSE 0 END) AS DOUBLE) / count(*) - 0.5)
             AS bias,
           abs(CAST(SUM(CASE WHEN substr(simhash, b.b + 1, 1) = '1'
                             THEN 1 ELSE 0 END) AS DOUBLE) / count(*) - 0.5)
             > 0.2 AS degenerate_bit
    FROM fp CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
    GROUP BY b.b
    """,
)
def dedup_simhash_bit_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMHASH BIT-BALANCE diagnostic: the fraction of documents with
    each of the 32 fingerprint bits set, and its deviation from the
    ideal 0.5 — the health check for the banding index behind
    [[dedup_simhash]] / [[dedup_levenshtein]]: a bit stuck near 0 or 1
    (degenerate: |p - 0.5| > 0.2) contributes no partitioning power, so
    its band's buckets grow and candidate generation degrades toward a
    hot-bucket scan (the same failure mode [[lsh_bucket_cost_readout]]
    measures from the bucket side; this finds WHICH bits cause it —
    stuck bits mean a dominant token distribution, e.g. boilerplate).
    Counts are exact integers; p and bias are one division each; the
    degenerate flag compares identically computed doubles to a shared
    literal.

    Scale shape: the scan-shaped SimHash signature build (one doc-keyed
    shuffle with map-side partial votes), then a bounded 32x fan-out of
    the fingerprint table and a 32-row aggregate."""
    from lvm_datapipe_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    fp = D.simhash_docs(docs)
    e = fp.select(
        "simhash", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit")
    )
    one = F.when(
        F.substring(F.col("simhash"), F.col("bit") + 1, 1) == "1", 1
    ).otherwise(0)
    g = e.groupBy("bit").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(one).cast("long").alias("n_ones"),
    )
    p = F.col("n_ones").cast("double") / F.col("n_docs")
    return g.select(
        F.col("bit").cast("long").alias("bit"),
        "n_docs",
        "n_ones",
        p.alias("p_one"),
        F.abs(p - F.lit(0.5)).alias("bias"),
        (F.abs(p - F.lit(0.5)) > F.lit(0.2)).alias("degenerate_bit"),
    )


@_q(
    "drift_cvm_statistic",
    """
    WITH t AS (
      SELECT event_type, value,
             SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
      FROM events GROUP BY event_type, value),
    c AS (
      SELECT event_type, ca + cb AS cnt,
             SUM(ca) OVER (PARTITION BY event_type ORDER BY value) AS cuma,
             SUM(cb) OVER (PARTITION BY event_type ORDER BY value) AS cumb,
             SUM(ca) OVER (PARTITION BY event_type) AS na,
             SUM(cb) OVER (PARTITION BY event_type) AS nb
      FROM t),
    s AS (
      SELECT event_type,
             CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             CAST(SUM(cnt * CAST(floor(
                    (CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)
                    * (CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)
                    * 1000000000000.0) AS BIGINT)) AS BIGINT) AS s_pico
      FROM c WHERE na > 0 AND nb > 0
      GROUP BY event_type, na, nb)
    SELECT event_type, n_a, n_b,
           CAST(n_a AS DOUBLE) * n_b / (n_a + n_b) / (n_a + n_b)
             * (CAST(s_pico AS DOUBLE) / 1000000000000.0) AS cvm_t
    FROM s
    """,
)
def drift_cvm_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample CRAMER-VON MISES statistic per stratum over the
    same user-parity cohorts as [[drift_ks_statistic]]:
    T = nm/N^2 * sum_k (F_A(x_k) - F_B(x_k))^2 over all N pooled
    observations (Anderson 1962's computing form on grouped distinct
    values, each weighted by its multiplicity).  KS sees only the WORST
    single gap — a drift spread as many small ECDF gaps (mean shift in
    a heavy middle) moves CvM first; the two together say whether drift
    is localized or distributed.  Per-value ECDF gaps are identical
    one-divide doubles; each squared gap is pico-quantized
    (floor(d^2 * 1e12), documented spec) so the cross-value sum is an
    exact weighted BIGINT sum; T is one float expression at the end.

    Scale shape: identical to the KS plan — one (type, value) keyed
    aggregate, type-partitioned cumulative windows over the
    distinct-values table, one |types|-row output."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("cb"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    c = t.select(
        "event_type",
        (F.col("ca") + F.col("cb")).alias("cnt"),
        F.sum("ca").over(wcum).alias("cuma"),
        F.sum("cb").over(wcum).alias("cumb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    diff = F.col("cuma").cast("double") / F.col("na") - F.col(
        "cumb"
    ).cast("double") / F.col("nb")
    s = (
        c.filter((F.col("na") > 0) & (F.col("nb") > 0))
        .groupBy(
            "event_type",
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
        )
        .agg(
            F.sum(
                F.col("cnt")
                * F.floor(diff * diff * F.lit(1000000000000.0)).cast("long")
            )
            .cast("long")
            .alias("s_pico")
        )
    )
    return s.select(
        "event_type",
        "n_a",
        "n_b",
        (
            F.col("n_a").cast("double")
            * F.col("n_b")
            / (F.col("n_a") + F.col("n_b"))
            / (F.col("n_a") + F.col("n_b"))
            * (F.col("s_pico").cast("double") / F.lit(1000000000000.0))
        ).alias("cvm_t"),
    )


#: Bloom FPR calibration design point: small m so the empirical FPR is
#: measurably nonzero at oracle scales (the production default in
#: operators/bloom.py is 64 Kbit; FPR depends only on (m, k, n_keys), so the
#: measurement transfers to any same-ratio configuration).
_BLOOM_CAL_M = 1024
_BLOOM_CAL_K = 3


def _bloom_pos_sql(key_sql: str, i: int) -> str:
    """Portable md5 bit position (the oracle twin of bloom.py's xxhash64
    positions — same (m, k) geometry, engine-portable hash)."""
    # the 8-hex-digit value is always non-negative, so plain % == pmod
    return (
        f"(('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || '#{i}'), 1, 8))"
        f"::BIGINT % {_BLOOM_CAL_M})"
    )


@_q(
    "bloom_fpr_calibration",
    f"""
    WITH mem AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
    bits AS (
      SELECT DISTINCT p FROM mem
      CROSS JOIN (SELECT unnest(range(0, {_BLOOM_CAL_K})) AS i) h
      CROSS JOIN LATERAL (SELECT CASE h.i
        {" ".join(f"WHEN {i} THEN {_bloom_pos_sql('c_custkey', i)}" for i in range(_BLOOM_CAL_K))}
        END AS p) q),
    probe AS (SELECT c_custkey FROM customer WHERE c_acctbal <= 9000),
    probed AS (
      SELECT pr.c_custkey,
             CAST(SUM(CASE WHEN b.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit
      FROM probe pr
      CROSS JOIN (SELECT unnest(range(0, {_BLOOM_CAL_K})) AS i) h
      CROSS JOIN LATERAL (SELECT CASE h.i
        {" ".join(f"WHEN {i} THEN {_bloom_pos_sql('pr.c_custkey', i)}" for i in range(_BLOOM_CAL_K))}
        END AS p) q
      LEFT JOIN bits b ON b.p = q.p
      GROUP BY pr.c_custkey)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM mem) AS n_members,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN n_hit = {_BLOOM_CAL_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positives,
           CASE WHEN count(*) > 0
                THEN CAST(SUM(CASE WHEN n_hit = {_BLOOM_CAL_K} THEN 1 ELSE 0
                              END) AS DOUBLE) / count(*)
                ELSE CAST(0.0 AS DOUBLE) END AS empirical_fpr
    FROM probed
    """,
)
def bloom_fpr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMPIRICAL FALSE-POSITIVE RATE of the Bloom join-pruning filter
    ([[bloom_pruned_semi_join]]'s primitive) measured on real keys: build
    a (m=1024, k=3) bitmap over the qualifying dim keys, probe it with
    every NON-qualifying key, and count probes whose k positions are all
    set — the number the "Bloom pruning saves shuffle" claim rests on
    (FPs are rows that survive the pre-filter and still shuffle for
    nothing; FPR near 1 means the bitmap is saturated and the pruning is
    a no-op).  Uses the engine-portable md5 position twin of bloom.py's
    xxhash64 positions — FPR is a property of the (m, k, n_keys)
    geometry, not of which well-mixed hash fills it, so the measurement
    transfers.  Every count is an exact integer; FPR is one division.

    Scale shape: the bit set is bounded by m (1024) regardless of key
    count — broadcastable by construction; probes fan out k rows each
    (narrow), one broadcast join against the bit set, one keyed
    aggregate.  The production build in operators/bloom.py aggregates
    the same geometry into m/64 words with map-side bit_or partials."""
    c = load_table(spark, sf_dir, "customer")

    def pos(key: F.Column, i: int) -> F.Column:
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(key) if isinstance(key, str) else key,
                            F.lit(f"#{i}"),
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(_BLOOM_CAL_M),
        )

    mem = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").cast("string").alias("k")
    )
    bits = (
        mem.select(
            F.explode(
                F.array(*[pos(F.col("k"), i) for i in range(_BLOOM_CAL_K)])
            ).alias("p")
        )
        .distinct()
    )
    probe = c.filter(F.col("c_acctbal") <= 9000).select(
        F.col("c_custkey").alias("key"), F.col("c_custkey").cast("string").alias("k")
    )
    probed = (
        probe.select(
            "key",
            F.explode(
                F.array(*[pos(F.col("k"), i) for i in range(_BLOOM_CAL_K)])
            ).alias("p"),
        )
        .join(F.broadcast(bits.withColumnRenamed("p", "_bp")),
              F.col("p") == F.col("_bp"), "left")
        .groupBy("key")
        .agg(
            F.sum(F.when(F.col("_bp").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hit")
        )
    )
    n_mem = mem.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    fp = F.sum(
        F.when(F.col("n_hit") == _BLOOM_CAL_K, 1).otherwise(0)
    ).cast("long")
    s = probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        fp.alias("n_false_positives"),
    )
    return (
        n_mem.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(s))
        .select(
            "n_members",
            "n_bits_set",
            "n_probes",
            "n_false_positives",
            F.when(
                F.col("n_probes") > 0,
                F.col("n_false_positives").cast("double") / F.col("n_probes"),
            )
            .otherwise(F.lit(0.0))
            .alias("empirical_fpr"),
        )
    )


_QSIG_PHI = """
           CASE WHEN (n11 + n10) > 0 AND (n01 + n00) > 0
                 AND (n11 + n01) > 0 AND (n10 + n00) > 0
                THEN CAST(n11 * n00 - n10 * n01 AS DOUBLE)
                     / sqrt(CAST((n11 + n10) AS DOUBLE) * (n01 + n00)
                            * (n11 + n01) * (n10 + n00))
                ELSE CAST(0.0 AS DOUBLE) END AS phi
"""


@_q(
    "quality_signal_phi_matrix",
    rf"""
    WITH f AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) AS BIGINT) AS s_tokens,
             CAST(length(text) AS BIGINT) AS s_chars,
             CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> ''))) AS BIGINT) AS s_vocab,
             CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
               AS s_bpe
      FROM documents),
    med AS (
      SELECT quantile_cont(CAST(s_tokens AS DOUBLE), 0.5) AS m_tokens,
             quantile_cont(CAST(s_chars AS DOUBLE), 0.5) AS m_chars,
             quantile_cont(CAST(s_vocab AS DOUBLE), 0.5) AS m_vocab,
             quantile_cont(CAST(s_bpe AS DOUBLE), 0.5) AS m_bpe
      FROM f),
    b AS (
      SELECT CASE WHEN s_tokens > m_tokens THEN 1 ELSE 0 END AS b1,
             CASE WHEN s_chars > m_chars THEN 1 ELSE 0 END AS b2,
             CASE WHEN s_vocab > m_vocab THEN 1 ELSE 0 END AS b3,
             CASE WHEN s_bpe > m_bpe THEN 1 ELSE 0 END AS b4
      FROM f CROSS JOIN med),
    g AS (
      SELECT
        CAST(SUM(b1*b2) AS BIGINT) AS p12_11, CAST(SUM(b1*(1-b2)) AS BIGINT) AS p12_10,
        CAST(SUM((1-b1)*b2) AS BIGINT) AS p12_01, CAST(SUM((1-b1)*(1-b2)) AS BIGINT) AS p12_00,
        CAST(SUM(b1*b3) AS BIGINT) AS p13_11, CAST(SUM(b1*(1-b3)) AS BIGINT) AS p13_10,
        CAST(SUM((1-b1)*b3) AS BIGINT) AS p13_01, CAST(SUM((1-b1)*(1-b3)) AS BIGINT) AS p13_00,
        CAST(SUM(b1*b4) AS BIGINT) AS p14_11, CAST(SUM(b1*(1-b4)) AS BIGINT) AS p14_10,
        CAST(SUM((1-b1)*b4) AS BIGINT) AS p14_01, CAST(SUM((1-b1)*(1-b4)) AS BIGINT) AS p14_00,
        CAST(SUM(b2*b3) AS BIGINT) AS p23_11, CAST(SUM(b2*(1-b3)) AS BIGINT) AS p23_10,
        CAST(SUM((1-b2)*b3) AS BIGINT) AS p23_01, CAST(SUM((1-b2)*(1-b3)) AS BIGINT) AS p23_00,
        CAST(SUM(b2*b4) AS BIGINT) AS p24_11, CAST(SUM(b2*(1-b4)) AS BIGINT) AS p24_10,
        CAST(SUM((1-b2)*b4) AS BIGINT) AS p24_01, CAST(SUM((1-b2)*(1-b4)) AS BIGINT) AS p24_00,
        CAST(SUM(b3*b4) AS BIGINT) AS p34_11, CAST(SUM(b3*(1-b4)) AS BIGINT) AS p34_10,
        CAST(SUM((1-b3)*b4) AS BIGINT) AS p34_01, CAST(SUM((1-b3)*(1-b4)) AS BIGINT) AS p34_00
      FROM b),
    rows_ AS (
      SELECT 'tokens' AS sig_a, 'chars' AS sig_b, p12_11 AS n11, p12_10 AS n10, p12_01 AS n01, p12_00 AS n00 FROM g
      UNION ALL SELECT 'tokens', 'vocab', p13_11, p13_10, p13_01, p13_00 FROM g
      UNION ALL SELECT 'tokens', 'bpe', p14_11, p14_10, p14_01, p14_00 FROM g
      UNION ALL SELECT 'chars', 'vocab', p23_11, p23_10, p23_01, p23_00 FROM g
      UNION ALL SELECT 'chars', 'bpe', p24_11, p24_10, p24_01, p24_00 FROM g
      UNION ALL SELECT 'vocab', 'bpe', p34_11, p34_10, p34_01, p34_00 FROM g)
    SELECT sig_a, sig_b, n11, n10, n01, n00,
           {_QSIG_PHI}
    FROM rows_
    """,
)
def quality_signal_phi_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-SIGNAL REDUNDANCY matrix: pairwise phi correlation between
    four median-binarized document quality signals (whitespace tokens,
    chars, distinct vocabulary, BPE-ish tokens) — the methodology check a
    curation pipeline runs BEFORE weighting signals into a gate
    ([[curation_scorecard]], [[quality_logit]]): two signals with phi
    near 1 are one signal counted twice (double-weighting it biases the
    gate), and a signal with phi near 0 against everything carries
    genuinely new information.  Binarizing at the median makes the
    contingency cells exact integers (integer-median agreement is an
    engine-shared property); phi is one float expression per pair.
    Same statistic as [[phi_coefficient_pairs]], applied to the
    curation feature space.

    Scale shape: one scan for the signals, one 4-value median aggregate
    broadcast back, one scalar aggregate of 24 boolean-product sums, a
    6-row unpivot — two scans, no joins keyed on doc."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        X.token_count("text").cast("long").alias("s_tokens"),
        F.length("text").cast("long").alias("s_chars"),
        F.size(F.array_distinct(X.tokens("text"))).cast("long").alias("s_vocab"),
        F.size(
            F.regexp_extract_all("text", F.lit(_BPE_PATTERN), F.lit(0))
        ).cast("long").alias("s_bpe"),
    )
    med = f.agg(
        F.expr("percentile(CAST(s_tokens AS DOUBLE), 0.5)").alias("m_tokens"),
        F.expr("percentile(CAST(s_chars AS DOUBLE), 0.5)").alias("m_chars"),
        F.expr("percentile(CAST(s_vocab AS DOUBLE), 0.5)").alias("m_vocab"),
        F.expr("percentile(CAST(s_bpe AS DOUBLE), 0.5)").alias("m_bpe"),
    )
    b = f.crossJoin(F.broadcast(med)).select(
        F.when(F.col("s_tokens") > F.col("m_tokens"), 1).otherwise(0).alias("b1"),
        F.when(F.col("s_chars") > F.col("m_chars"), 1).otherwise(0).alias("b2"),
        F.when(F.col("s_vocab") > F.col("m_vocab"), 1).otherwise(0).alias("b3"),
        F.when(F.col("s_bpe") > F.col("m_bpe"), 1).otherwise(0).alias("b4"),
    )
    names = {1: "tokens", 2: "chars", 3: "vocab", 4: "bpe"}
    aggs = []
    for i in range(1, 5):
        for j in range(i + 1, 5):
            bi, bj = F.col(f"b{i}"), F.col(f"b{j}")
            aggs += [
                F.sum(bi * bj).cast("long").alias(f"p{i}{j}_11"),
                F.sum(bi * (1 - bj)).cast("long").alias(f"p{i}{j}_10"),
                F.sum((1 - bi) * bj).cast("long").alias(f"p{i}{j}_01"),
                F.sum((1 - bi) * (1 - bj)).cast("long").alias(f"p{i}{j}_00"),
            ]
    g = b.agg(*aggs)
    # ONE stack() unpivot instead of a 6-way unionAll of selects over g —
    # a union re-plans (and re-computes) the scalar aggregate per branch.
    stack_args = ", ".join(
        f"'{names[i]}', '{names[j]}', p{i}{j}_11, p{i}{j}_10, p{i}{j}_01, p{i}{j}_00"
        for i in range(1, 5)
        for j in range(i + 1, 5)
    )
    rows = g.select(
        F.expr(
            f"stack(6, {stack_args}) AS (sig_a, sig_b, n11, n10, n01, n00)"
        )
    )
    na = F.col("n11") + F.col("n10")
    nnota = F.col("n01") + F.col("n00")
    nb = F.col("n11") + F.col("n01")
    nnotb = F.col("n10") + F.col("n00")
    return rows.select(
        "sig_a",
        "sig_b",
        "n11",
        "n10",
        "n01",
        "n00",
        F.when(
            (na > 0) & (nnota > 0) & (nb > 0) & (nnotb > 0),
            (F.col("n11") * F.col("n00") - F.col("n10") * F.col("n01")).cast(
                "double"
            )
            / F.sqrt(na.cast("double") * nnota * nb * nnotb),
        )
        .otherwise(F.lit(0.0))
        .alias("phi"),
    )


def _pass_at_k_sql(k: int) -> str:
    """1 - C(f, k)/C(n, k) as the explicit left-associated k-term product
    (f = failures): exact in IEEE doubles given integer inputs, and the
    GREATEST clamp makes f < k yield probability-of-all-failures 0."""
    prod = " * ".join(
        f"(CAST(GREATEST(f - {i}, 0) AS DOUBLE) / (n - {i}))" for i in range(k)
    )
    return f"(1.0 - {prod})"


@_q(
    "eval_pass_at_k",
    f"""
    WITH a AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT)
               - CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      AS BIGINT) AS f
      FROM events GROUP BY user_id),
    q AS (SELECT user_id, n, f FROM a WHERE n >= 10),
    p AS (
      SELECT user_id,
             {_pass_at_k_sql(1)} AS p1,
             {_pass_at_k_sql(5)} AS p5,
             {_pass_at_k_sql(10)} AS p10
      FROM q)
    SELECT CAST(count(*) AS BIGINT) AS n_tasks,
           CAST(SUM(CAST(floor(p1 * 1000000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000000.0 / count(*) AS pass_at_1,
           CAST(SUM(CAST(floor(p5 * 1000000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000000.0 / count(*) AS pass_at_5,
           CAST(SUM(CAST(floor(p10 * 1000000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000000.0 / count(*) AS pass_at_10
    FROM p
    """,
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PASS@K unbiased estimator (Chen et al. 2021, the HumanEval
    statistic): per task, with n sampled attempts of which c succeed,
    pass@k = 1 - C(n-c, k)/C(n, k) — the probability that at least one
    of k drawn attempts succeeds, computed WITHOUT the naive 1-(1-c/n)^k
    bias.  Mapped onto the events tables as a demonstration corpus
    (task = user, attempt = event, success = purchase; the operator is
    the point — swap in an eval-attempts table with the same three
    columns).  The binomial ratio is the explicit k-term product of
    integer-valued ratios (exact inputs, fixed association order), the
    GREATEST clamp handles fewer-than-k failures (pass@k = 1), and task
    means use the floor-nano order-free sum.

    Scale shape: one user-keyed aggregate, one scan-shaped projection
    (the k-term products are pure codegen arithmetic), one scalar
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.count(F.lit(1))
            - F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        )
        .cast("long")
        .alias("f"),
    )
    q = a.filter(F.col("n") >= 10)

    def pass_at_k(k: int):
        prod = None
        for i in range(k):
            term = F.greatest(F.col("f") - i, F.lit(0)).cast("double") / (
                F.col("n") - i
            )
            prod = term if prod is None else prod * term
        return F.lit(1.0) - prod

    p = q.select(
        pass_at_k(1).alias("p1"),
        pass_at_k(5).alias("p5"),
        pass_at_k(10).alias("p10"),
    )

    def nano_mean(c: str):
        return (
            F.sum(F.floor(F.col(c) * F.lit(1000000000.0)).cast("long")).cast(
                "double"
            )
            / F.lit(1000000000.0)
            / F.count(F.lit(1))
        )

    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_tasks"),
        nano_mean("p1").alias("pass_at_1"),
        nano_mean("p5").alias("pass_at_5"),
        nano_mean("p10").alias("pass_at_10"),
    )


@_q(
    "dq_functional_dependencies",
    """
    WITH checks AS (
      SELECT 'nation' AS table_name, 'n_nationkey' AS lhs, 'n_regionkey' AS rhs,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_groups
      FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nd
            FROM nation GROUP BY n_nationkey)
      UNION ALL
      SELECT 'part', 'p_brand', 'p_type',
             CAST(count(*) AS BIGINT),
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM (SELECT p_brand, count(DISTINCT p_type) AS nd
            FROM part GROUP BY p_brand)
      UNION ALL
      SELECT 'customer', 'c_nationkey', 'c_mktsegment',
             CAST(count(*) AS BIGINT),
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS nd
            FROM customer GROUP BY c_nationkey)
      UNION ALL
      SELECT 'orders', 'o_orderstatus', 'o_orderpriority',
             CAST(count(*) AS BIGINT),
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM (SELECT o_orderstatus, count(DISTINCT o_orderpriority) AS nd
            FROM orders GROUP BY o_orderstatus))
    SELECT table_name, lhs, rhs, n_groups, n_violating_groups,
           n_violating_groups = 0 AS holds
    FROM checks
    """,
)
def dq_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY audit: for each candidate rule lhs -> rhs,
    the number of lhs groups carrying MORE than one distinct rhs value —
    the schema-constraint discovery/verification primitive behind data
    profilers (a violated "obvious" FD means a dirty dimension or a
    wrong join key; a holding one is a free normalization/encoding
    opportunity).  Extends [[dq_report]] (not-null/unique are the
    degenerate FDs key -> * ) and [[referential_integrity_audit]]
    (inclusion dependencies; FDs are their in-table sibling).  All
    counts are exact integers.

    Scale shape: one keyed count-distinct aggregate per candidate FD
    (each over its own table), each reduced to one summary row before
    the 4-row union — violations never leave the executors."""
    out = []
    specs = [
        ("nation", "n_nationkey", "n_regionkey"),
        ("part", "p_brand", "p_type"),
        ("customer", "c_nationkey", "c_mktsegment"),
        ("orders", "o_orderstatus", "o_orderpriority"),
    ]
    for table, lhs, rhs in specs:
        t = load_table(spark, sf_dir, table)
        g = t.groupBy(lhs).agg(F.count_distinct(rhs).alias("nd"))
        out.append(
            g.agg(
                F.lit(table).alias("table_name"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_groups"),
            )
        )
    rows = out[0]
    for x in out[1:]:
        rows = rows.unionAll(x)
    return rows.select(
        "table_name",
        "lhs",
        "rhs",
        "n_groups",
        "n_violating_groups",
        (F.col("n_violating_groups") == 0).alias("holds"),
    )


@_q(
    "orders_duplicate_payment_audit",
    """
    WITH p AS (
      SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b
      FROM orders a JOIN orders b
        ON b.o_custkey = a.o_custkey
       AND b.o_totalprice = a.o_totalprice
       AND b.o_orderkey > a.o_orderkey
       AND abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                         CAST(b.o_orderdate AS DATE))) <= 7),
    f AS (SELECT key_a AS k FROM p UNION SELECT key_b FROM p)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_candidate_pairs,
           CAST(count(*) AS BIGINT) AS n_flagged_orders,
           CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM orders) AS flagged_rate
    FROM f
    """,
)
def orders_duplicate_payment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATE-PAYMENT audit: order pairs from the SAME customer with
    the SAME total amount within 7 days — the double-charge/double-write
    detector every billing reconciliation runs (the fuzzy sibling of
    exact-key dedup: the key fields differ, the MONEY repeats).  The
    blocking key is (custkey, exact amount) — a keyed equi-join whose
    groups are naturally tiny (repeating an exact float amount is the
    signal), with the day-window as a residual predicate; counts are
    exact integers.  Transactional cousin of [[dedup_exact]] and the
    DQ complement of [[benford_first_digit]] (Benford finds fabricated
    amounts; this finds repeated ones).

    Scale shape: one self-equi-join keyed on (custkey, amount) — no
    range join, no cartesian; pair fan-out bounded by per-key group
    size; three scalar aggregates."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.col("o_custkey").alias("_c"),
        F.col("o_totalprice").alias("_p"),
        F.col("o_orderkey").alias("key_b"),
        F.col("o_orderdate").alias("_d"),
    )
    p = o.join(
        b,
        (F.col("_c") == F.col("o_custkey"))
        & (F.col("_p") == F.col("o_totalprice"))
        & (F.col("key_b") > F.col("o_orderkey"))
        & (
            F.abs(
                F.datediff(F.col("_d").cast("date"), F.col("o_orderdate").cast("date"))
            )
            <= 7
        ),
    ).select(F.col("o_orderkey").alias("key_a"), "key_b")
    f = (
        p.select(F.col("key_a").alias("k"))
        .union(p.select(F.col("key_b").alias("k")))
        .distinct()
    )
    n_orders = o.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    n_pairs = p.agg(F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"))
    n_flag = f.agg(F.count(F.lit(1)).cast("long").alias("n_flagged_orders"))
    return (
        n_orders.crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_flag))
        .select(
            "n_orders",
            "n_candidate_pairs",
            "n_flagged_orders",
            (
                F.col("n_flagged_orders").cast("double") / F.col("n_orders")
            ).alias("flagged_rate"),
        )
    )


@_q(
    "price_round_number_bias",
    """
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) % 100 AS cents
      FROM orders),
    g AS (
      SELECT CASE WHEN cents = 0 THEN 'dollar_exact'
                  WHEN cents = 50 THEN 'half_dollar'
                  WHEN cents % 10 = 0 THEN 'dime_exact'
                  ELSE 'other' END AS cents_class,
             CAST(count(*) AS BIGINT) AS n
      FROM c GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
    SELECT g.cents_class, g.n,
           CAST(g.n AS DOUBLE) / t.total AS observed_share,
           CASE g.cents_class WHEN 'dollar_exact' THEN CAST(0.01 AS DOUBLE)
                              WHEN 'half_dollar' THEN CAST(0.01 AS DOUBLE)
                              WHEN 'dime_exact' THEN CAST(0.08 AS DOUBLE)
                              ELSE CAST(0.90 AS DOUBLE) END AS uniform_share,
           CAST(g.n AS DOUBLE) / t.total
             / CASE g.cents_class WHEN 'dollar_exact' THEN CAST(0.01 AS DOUBLE)
                                  WHEN 'half_dollar' THEN CAST(0.01 AS DOUBLE)
                                  WHEN 'dime_exact' THEN CAST(0.08 AS DOUBLE)
                                  ELSE CAST(0.90 AS DOUBLE) END AS excess_ratio
    FROM g CROSS JOIN t
    """,
)
def price_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUND-NUMBER BIAS forensics over order amounts: the share of
    totals landing on exact dollars, half-dollars, and dimes versus the
    uniform-cents expectation — human-entered or fabricated amounts
    over-select round numbers, organically computed ledgers don't; the
    last-digits complement to [[benford_first_digit]]'s leading-digit
    law (fraud screens run both).  The cents digit comes from
    floor(x*100 + 0.5) — identical IEEE ops both engines (engine round()
    half-up vs half-even conventions differ; the explicit floor form
    does not); classes and counts are exact integers, shares are one
    division against literal expectations.

    Scale shape: one scan + one 4-row keyed aggregate + a broadcast
    scalar."""
    o = load_table(spark, sf_dir, "orders")
    cents = (
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
        % 100
    )
    cls = (
        F.when(cents == 0, "dollar_exact")
        .when(cents == 50, "half_dollar")
        .when(cents % 10 == 0, "dime_exact")
        .otherwise("other")
    )
    g = o.select(cls.alias("cents_class")).groupBy("cents_class").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = g.agg(F.sum("n").cast("long").alias("total"))
    uniform = (
        F.when(F.col("cents_class") == "dollar_exact", F.lit(0.01))
        .when(F.col("cents_class") == "half_dollar", F.lit(0.01))
        .when(F.col("cents_class") == "dime_exact", F.lit(0.08))
        .otherwise(F.lit(0.90))
    )
    return g.crossJoin(F.broadcast(t)).select(
        "cents_class",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("observed_share"),
        uniform.alias("uniform_share"),
        (F.col("n").cast("double") / F.col("total") / uniform).alias(
            "excess_ratio"
        ),
    )


@_q(
    "split_balance_chisq",
    """
    WITH b AS (
      SELECT CASE WHEN ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT % 10000 < 8000 THEN 'train'
                  WHEN ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT % 10000 < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    g AS (SELECT split, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY split),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g),
    e AS (
      SELECT g.split, g.n, t.total,
             t.total * CASE g.split WHEN 'train' THEN CAST(0.8 AS DOUBLE)
                                    WHEN 'val' THEN CAST(0.1 AS DOUBLE)
                                    ELSE CAST(0.1 AS DOUBLE) END AS expected
      FROM g CROSS JOIN t)
    SELECT split, n, expected,
           CAST(n AS DOUBLE) / total AS observed_frac,
           (n - expected) * (n - expected) / expected AS chisq_term
    FROM e
    """,
)
def split_balance_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-BALANCE audit of the standing md5 80/10/10 split
    ([[split_train_val_test]]): per-split observed count vs expected,
    with each split's chi-square term — the dataset-release check that
    the hash split actually delivered its advertised proportions (a
    skewed hash or a correlated key silently starves the eval splits;
    the analog of [[ab_test_srm_check]] for dataset splits rather than
    experiment arms).  Counts exact, expectations literal-fraction
    products, terms one float expression each (sum them against
    chi-square(2) off-engine).

    Scale shape: one scan + 3-row keyed aggregate + broadcast scalar."""
    from lvm_datapipe_spark.operators.sampling import split_assign

    docs = load_table(spark, sf_dir, "documents")
    s = split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    g = s.groupBy("split").agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = g.agg(F.sum("n").cast("long").alias("total"))
    frac = (
        F.when(F.col("split") == "train", F.lit(0.8))
        .when(F.col("split") == "val", F.lit(0.1))
        .otherwise(F.lit(0.1))
    )
    e = g.crossJoin(F.broadcast(t)).select(
        "split",
        "n",
        (F.col("total") * frac).alias("expected"),
        (F.col("n").cast("double") / F.col("total")).alias("observed_frac"),
        F.col("total").alias("_total"),
    )
    return e.select(
        "split",
        "n",
        "expected",
        "observed_frac",
        (
            (F.col("n") - F.col("expected"))
            * (F.col("n") - F.col("expected"))
            / F.col("expected")
        ).alias("chisq_term"),
    )


@_q(
    "bandit_successive_elimination",
    f"""
    WITH a AS (
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(count(DISTINCT CASE WHEN value > 100.0 THEN user_id END)
                  AS BIGINT) AS n_conv
      FROM events GROUP BY event_type),
    w AS (
      SELECT event_type, n_users, n_conv,
             CAST(n_conv AS DOUBLE) / n_users AS phat,
             CAST(n_users AS DOUBLE) AS nd
      FROM a WHERE n_users > 0),
    ci AS (
      SELECT event_type, n_users, n_conv, phat,
             ((phat + '{_WILSON_Z2!r}'::DOUBLE / (2 * nd))
              - '{_WILSON_Z!r}'::DOUBLE
                * sqrt((phat * (1.0 - phat)) / nd
                       + '{_WILSON_Z2!r}'::DOUBLE / (4 * nd * nd)))
             / (1.0 + '{_WILSON_Z2!r}'::DOUBLE / nd) AS lb,
             ((phat + '{_WILSON_Z2!r}'::DOUBLE / (2 * nd))
              + '{_WILSON_Z!r}'::DOUBLE
                * sqrt((phat * (1.0 - phat)) / nd
                       + '{_WILSON_Z2!r}'::DOUBLE / (4 * nd * nd)))
             / (1.0 + '{_WILSON_Z2!r}'::DOUBLE / nd) AS ub
      FROM w),
    best AS (SELECT MAX(lb) AS best_lb FROM ci)
    SELECT ci.event_type, ci.n_users, ci.n_conv, ci.phat, ci.lb, ci.ub,
           ci.ub < best.best_lb AS eliminated
    FROM ci CROSS JOIN best
    """,
)
def bandit_successive_elimination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUCCESSIVE-ELIMINATION readout (the deterministic best-arm
    identification rule): each arm (event type, "converting" = any
    event with value > 100 per user) carries its Wilson interval; an arm
    whose UPPER bound falls below the best arm's LOWER bound is
    eliminated — racing/Hoeffding-style sequential testing without the
    random draws of Thompson sampling or the log terms of UCB (both
    non-portable here), the production shape for killing losing
    variants early.  Shares the shared-literal Wilson z with
    [[conversion_wilson_ci]] / [[supplier_ontime_wilson_rank]];
    intervals are float math over exact distinct counts, and the
    elimination flag compares identically computed doubles.

    Scale shape: one distinct-keyed aggregate to |arms| rows, one
    broadcast scalar max, one comparison."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count_distinct(
            F.when(F.col("value") > 100.0, F.col("user_id"))
        )
        .cast("long")
        .alias("n_conv"),
    )
    w = a.filter(F.col("n_users") > 0).select(
        "event_type",
        "n_users",
        "n_conv",
        (F.col("n_conv").cast("double") / F.col("n_users")).alias("phat"),
        F.col("n_users").cast("double").alias("nd"),
    )
    z = F.lit(_WILSON_Z)
    z2 = F.lit(_WILSON_Z2)
    centre = F.col("phat") + z2 / (2 * F.col("nd"))
    spread = z * F.sqrt(
        (F.col("phat") * (1.0 - F.col("phat"))) / F.col("nd")
        + z2 / (4 * F.col("nd") * F.col("nd"))
    )
    denom = 1.0 + z2 / F.col("nd")
    ci = w.select(
        "event_type",
        "n_users",
        "n_conv",
        "phat",
        ((centre - spread) / denom).alias("lb"),
        ((centre + spread) / denom).alias("ub"),
    )
    best = ci.agg(F.max("lb").alias("best_lb"))
    return ci.crossJoin(F.broadcast(best)).select(
        "event_type",
        "n_users",
        "n_conv",
        "phat",
        "lb",
        "ub",
        (F.col("ub") < F.col("best_lb")).alias("eliminated"),
    )


@_q(
    "dedup_lines_ccnet",
    """
    WITH seg AS (
      SELECT doc_id,
             md5(array_to_string(
               list_slice(string_split(text, ' '), s * 8 + 1, s * 8 + 8),
               ' ')) AS h
      FROM documents
      CROSS JOIN (SELECT unnest(range(0, 1000)) AS s)
      WHERE (s + 1) * 8 <= len(string_split(text, ' '))),
    st AS (
      SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd,
             MIN(doc_id) AS first_doc
      FROM seg GROUP BY h)
    SELECT seg.doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN st.nd = 1 OR st.first_doc = seg.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN st.nd = 1 OR st.first_doc = seg.doc_id
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS kept_frac
    FROM seg JOIN st ON st.h = seg.h
    GROUP BY seg.doc_id
    """,
)
def dedup_lines_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-LEVEL corpus deduplication summary — the CCNet recipe
    (Wenzek et al. 2020: hash every line, drop a line when its hash was
    already emitted by an earlier document), adapted to the synthetic
    word-stream corpus by defining a "line" as each complete
    non-overlapping 8-word segment.  A segment instance is KEPT iff it
    is corpus-unique or its document is the FIRST (min doc_id — the
    deterministic stand-in for arrival order) to contain that segment;
    the per-doc readout (segments, kept, kept fraction) is exactly the
    removal accounting CCNet publishes per shard.  Segments are
    SPEC-CAPPED at 1000 per doc (same per-doc work bound as
    [[dedup_substring_spans]]).

    Scale shape: scan-shaped posexplode to segment hashes, ONE keyed
    aggregate to the |distinct segments| stats table (nd + first_doc —
    no posting-list blowup: the stats table has one row per distinct
    hash no matter how hot the segment), an equi-join back on the hash
    (AQE handles hot-hash skew), and a per-doc aggregate.  This is the
    production shape of fastText/CC-scale line dedup: no pairwise
    anything, memory bounded by distinct-segment cardinality."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    n_seg = F.least(F.floor(F.size(words) / F.lit(8)), F.lit(1000))
    seg = (
        docs.filter(F.size(words) >= 8)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_seg.cast("int") - 1)).alias("s"),
            words.alias("w"),
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.col("w"), F.col("s") * 8 + 1, 8)
                ).cast("binary")
            ).alias("h"),
        )
    )
    st = seg.groupBy("h").agg(
        F.count_distinct("doc_id").cast("long").alias("nd"),
        F.min("doc_id").alias("first_doc"),
    )
    kept = F.when(
        (F.col("nd") == 1) | (F.col("first_doc") == F.col("doc_id")), 1
    ).otherwise(0)
    return (
        seg.join(st, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(kept).cast("long").alias("n_kept"),
            (F.sum(kept).cast("double") / F.count(F.lit(1))).alias("kept_frac"),
        )
    )


@_q(
    "dedup_winnowing_pairs",
    """
    WITH g AS (
      SELECT doc_id, p,
             md5(substr(text, p + 1, 16)) AS h,
             least(len(text) - 15, 1000) AS n_grams
      FROM documents
      CROSS JOIN (SELECT unnest(range(0, 1000)) AS p)
      WHERE p + 16 <= len(text) AND p < 1000),
    st AS (
      SELECT doc_id, p AS s,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin
      FROM g
      QUALIFY s <= n_grams - 8),
    sel AS (
      SELECT st.doc_id, st.s, st.wmin, MAX(g.p) AS sel_p
      FROM st JOIN g ON g.doc_id = st.doc_id
                    AND g.p BETWEEN st.s AND st.s + 7
                    AND g.h = st.wmin
      GROUP BY st.doc_id, st.s, st.wmin),
    fp AS (SELECT DISTINCT doc_id, wmin AS h FROM sel),
    ok AS (
      SELECT h FROM (SELECT h, count(*) AS nd FROM fp GROUP BY h)
      WHERE nd BETWEEN 2 AND 8)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared_fp
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    WHERE a.h IN (SELECT h FROM ok)
    GROUP BY a.doc_id, b.doc_id
    """,
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING fingerprint near-dup pairs — the MOSS local fingerprinting
    algorithm (Schleimer, Wilkerson & Aiken, SIGMOD 2003): hash every
    16-char gram, slide a window of 8 consecutive gram hashes, and in each
    window SELECT the minimum hash (rightmost position on ties — resolved
    by an exact bounded join, not engine-specific argmin semantics); the
    selected hashes are the document's fingerprint set.  Guarantee: any
    literal run of >= w + k - 1 = 23 shared chars yields at least one
    shared fingerprint, while only ~2/(w+1) of grams are stored — the
    principled sampling that makes substring dedup affordable where
    [[dedup_substring_spans]]'s strided windows trade recall blindly.
    Fingerprints seen in >8 docs are dropped as stop-fingerprints
    (boilerplate cap, mirrored in the oracle), then the fingerprint table
    self-joins on the hash.  Grams are SPEC-CAPPED at 1000 positions/doc.

    Scale shape: scan-shaped gram hashing, ONE per-doc window pass (the
    partition is a single bounded document — never corpus-wide), a
    per-doc bounded range join (each gram meets <= 8 window starts), a
    keyed distinct, and the capped hash self-join: pair cardinality
    bounded by cap^2 x n_fingerprints, all shuffles keyed."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_grams = F.least(F.length("text") - 15, F.lit(1000))
    g = (
        docs.filter(F.length("text") >= 16)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), n_grams.cast("int") - 1)
            ).alias("p"),
            "text",
            n_grams.alias("n_grams"),
        )
        .select(
            "doc_id",
            "p",
            F.md5(
                F.substring(F.col("text"), F.col("p") + 1, 16).cast("binary")
            ).alias("h"),
            "n_grams",
        )
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, 7)
    )
    st = (
        g.select(
            "doc_id",
            F.col("p").alias("s"),
            F.min("h").over(win).alias("wmin"),
            "n_grams",
        )
        .filter(F.col("s") <= F.col("n_grams") - 8)
        .drop("n_grams")
    )
    g2 = g.select(
        F.col("doc_id").alias("_d"), F.col("p").alias("_p"), F.col("h").alias("_h")
    )
    sel = (
        st.join(
            g2,
            (F.col("_d") == F.col("doc_id"))
            & (F.col("_p") >= F.col("s"))
            & (F.col("_p") <= F.col("s") + 7)
            & (F.col("_h") == F.col("wmin")),
        )
        .groupBy("doc_id", "s", "wmin")
        .agg(F.max("_p").alias("sel_p"))
    )
    fp = sel.select("doc_id", F.col("wmin").alias("h")).distinct()
    ok = (
        fp.groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= 8))
        .select("h")
    )
    fpk = fp.join(ok, "h", "left_semi")
    a = fpk.select(F.col("doc_id").alias("id_a"), "h")
    b = fpk.select(F.col("doc_id").alias("id_b"), F.col("h").alias("h2"))
    return (
        a.join(b, (F.col("h") == F.col("h2")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_fp"))
    )


def _bt_sql(n_iters: int = 8) -> str:
    """DuckDB replay of the Bradley-Terry minorize-maximize fit.

    The heavy part (the per-user preference grid and the k x k win
    matrix) is plain grouped aggregation; the MM iterations over the
    tiny type set are replayed as a fixed chain of CTEs.  Cross-row
    float sums inside an iteration go through floor-micro BIGINT
    quantization (the established portability device: CAST-to-DECIMAL
    rounds differently across engines, floor(x*1e6) does not), so the
    oracle's SUM order cannot change bits and the Spark driver replay
    is exact."""
    parts = [
        """WITH u AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type),
    us AS (SELECT DISTINCT user_id FROM events),
    ty AS (SELECT DISTINCT event_type FROM events),
    grid AS MATERIALIZED (
      SELECT us.user_id, ty.event_type, COALESCE(u.n, 0) AS n
      FROM us CROSS JOIN ty
      LEFT JOIN u ON u.user_id = us.user_id AND u.event_type = ty.event_type),
    w AS MATERIALIZED (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(SUM(CASE WHEN a.n > b.n THEN 1 ELSE 0 END) AS BIGINT) AS wr
      FROM grid a JOIN grid b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
      GROUP BY a.event_type, b.event_type),
    ws AS MATERIALIZED (
      SELECT w1.ta, w1.tb, w1.wr + 1 AS w_ab,
             (w1.wr + 1) + (w2.wr + 1) AS n_ab
      FROM w w1 JOIN w w2 ON w1.ta = w2.tb AND w1.tb = w2.ta),
    tots AS (SELECT ta AS tp, CAST(SUM(w_ab) AS BIGINT) AS wts
             FROM ws GROUP BY ta),
    traw AS (SELECT ta AS tp, CAST(SUM(wr) AS BIGINT) AS wins FROM w GROUP BY ta),
    lraw AS (SELECT tb AS tp, CAST(SUM(wr) AS BIGINT) AS losses FROM w GROUP BY tb),
    cnt AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
    p0 AS MATERIALIZED (SELECT ty.event_type AS tp,
                               1.0 / CAST(cnt.k AS DOUBLE) AS p
           FROM ty CROSS JOIN cnt)"""
    ]
    for it in range(1, n_iters + 1):
        parts.append(
            f"""den{it} AS (
      SELECT ws.ta AS tp,
             CAST(SUM(CAST(floor(CAST(ws.n_ab AS DOUBLE) / (pa.p + pb.p)
                                 * 1000000.0) AS BIGINT)) AS BIGINT) AS dmic
      FROM ws JOIN p{it - 1} pa ON pa.tp = ws.ta
              JOIN p{it - 1} pb ON pb.tp = ws.tb
      GROUP BY ws.ta),
    r{it} AS (
      SELECT tots.tp,
             CAST(tots.wts AS DOUBLE) / (CAST(d.dmic AS DOUBLE) / 1000000.0) AS p
      FROM tots JOIN den{it} d ON d.tp = tots.tp),
    s{it} AS (SELECT CAST(SUM(CAST(floor(p * 1000000000.0) AS BIGINT))
                          AS BIGINT) AS s FROM r{it}),
    p{it} AS MATERIALIZED (SELECT tp, p / (CAST(s AS DOUBLE) / 1000000000.0) AS p
              FROM r{it} CROSS JOIN s{it})"""
        )
    body = ",\n    ".join(parts)
    return f"""
    {body}
    SELECT p{n_iters}.tp AS event_type, traw.wins, lraw.losses,
           p{n_iters}.p AS bt_strength,
           CAST(ROW_NUMBER() OVER (ORDER BY p{n_iters}.p DESC, p{n_iters}.tp)
                AS BIGINT) AS rank
    FROM p{n_iters}
    JOIN traw ON traw.tp = p{n_iters}.tp
    JOIN lraw ON lraw.tp = p{n_iters}.tp
    """


@_q("bt_event_type_strength", _bt_sql())
def bt_event_type_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRADLEY-TERRY strength estimation from pairwise preferences — the
    statistical engine behind RLHF reward-model data curation and
    Chatbot-Arena-style rankings.  Preferences are derived
    deterministically: for every user and every ordered pair of event
    types, the type the user did MORE of wins (zero-count types lose to
    any engaged type; exact ties abstain).  The win matrix gets Laplace
    +1 smoothing (guarantees a finite MLE even for never-winning arms),
    then 8 fixed minorize-maximize iterations (Hunter 2004:
    p_i <- W_i / sum_j n_ij / (p_i + p_j), renormalized each round).

    The distributed work is the per-user preference grid (one keyed
    shuffle, |users| x k rows, self-join bounded by k^2 per user) and
    the k x k win-matrix aggregate; the MM iterations run on the driver
    over the collected k x k matrix (metadata-sized, same treatment as
    [[embedding_top_pc_power_iteration]]'s eigensolve) with every float
    expression sequenced EXACTLY as the oracle's CTE chain — cross-row
    sums are floor-micro BIGINT quantized, so both engines produce
    bit-identical strengths.  Micro terms stay exact below ~9e15, i.e.
    n_ij/(p_i+p_j) < 9e9 — beyond that corpus size, rescale wins before
    fitting (documented bound).

    Scale shape: one users x k grid (broadcast type dim), one keyed
    self-join on user_id, one k^2-row aggregate; driver math is O(k^2)
    per iteration, independent of corpus size."""
    import math

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    u = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    us = ev.select("user_id").distinct()
    ty = ev.select("event_type").distinct()
    grid = (
        us.crossJoin(F.broadcast(ty))
        .join(u, ["user_id", "event_type"], "left")
        .fillna(0, subset=["n"])
    )
    b = grid.select(
        F.col("user_id").alias("_u"),
        F.col("event_type").alias("tb"),
        F.col("n").alias("_nb"),
    )
    w_rows = (
        grid.join(
            b,
            (F.col("user_id") == F.col("_u"))
            & (F.col("event_type") != F.col("tb")),
        )
        .groupBy(F.col("event_type").alias("ta"), "tb")
        .agg(
            F.sum(F.when(F.col("n") > F.col("_nb"), 1).otherwise(0))
            .cast("long")
            .alias("wr")
        )
        .collect()
    )
    schema = (
        "event_type string, wins bigint, losses bigint,"
        " bt_strength double, rank bigint"
    )
    if not w_rows:
        return spark.createDataFrame([], schema)
    wr = {(r.ta, r.tb): r.wr for r in w_rows}
    types = sorted({t for pair in wr for t in pair})
    k = len(types)
    ws = {(a, bb): wr[(a, bb)] + 1 for (a, bb) in wr}
    n_ab = {(a, bb): ws[(a, bb)] + ws[(bb, a)] for (a, bb) in ws}
    wts = {t: sum(v for (a, _), v in ws.items() if a == t) for t in types}
    wins = {t: sum(v for (a, _), v in wr.items() if a == t) for t in types}
    losses = {t: sum(v for (_, bb), v in wr.items() if bb == t) for t in types}
    p = {t: 1.0 / float(k) for t in types}
    for _ in range(8):
        dmic = {
            t: sum(
                math.floor(
                    float(n_ab[(t, o)]) / (p[t] + p[o]) * 1000000.0
                )
                for o in types
                if o != t
            )
            for t in types
        }
        praw = {t: float(wts[t]) / (float(dmic[t]) / 1000000.0) for t in types}
        s = sum(math.floor(praw[t] * 1000000000.0) for t in types)
        p = {t: praw[t] / (float(s) / 1000000000.0) for t in types}
    order = sorted(types, key=lambda t: (-p[t], t))
    rows = [
        (t, wins[t], losses[t], p[t], order.index(t) + 1) for t in types
    ]
    return spark.createDataFrame(rows, schema)


@_q(
    "source_loo_contribution",
    """
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tn,
                   CAST(SUM(sum_chars) AS BIGINT) AS ts FROM per),
    fp AS (SELECT md5(text) AS h, count(DISTINCT source) AS nd,
                  MIN(source) AS only_src
           FROM documents GROUP BY md5(text)),
    td AS (SELECT CAST(count(*) AS BIGINT) AS total_distinct FROM fp),
    ex AS (SELECT only_src AS source, CAST(count(*) AS BIGINT) AS excl
           FROM fp WHERE nd = 1 GROUP BY only_src)
    SELECT per.source, per.n_docs,
           CASE WHEN tot.tn > per.n_docs
                THEN CAST(tot.ts - per.sum_chars AS DOUBLE)
                     / (tot.tn - per.n_docs) END AS loo_mean_chars,
           CASE WHEN tot.tn > per.n_docs
                THEN CAST(tot.ts - per.sum_chars AS DOUBLE)
                     / (tot.tn - per.n_docs)
                     - CAST(tot.ts AS DOUBLE) / tot.tn END AS delta_mean_chars,
           CAST(COALESCE(ex.excl, 0) AS BIGINT) AS exclusive_distinct,
           CAST(td.total_distinct - COALESCE(ex.excl, 0) AS BIGINT)
             AS loo_distinct_texts
    FROM per CROSS JOIN tot CROSS JOIN td
    LEFT JOIN ex ON ex.source = per.source
    """,
)
def source_loo_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT data valuation by source — the cheap exact member of
    the Shapley family (the per-source marginal effect on corpus-level
    statistics), the first readout a curation team pulls when deciding
    which feed to cut: for each source, the corpus mean doc length
    WITHOUT that source (and its delta vs the full mean — negative delta
    means the source was propping the mean up), plus the count of
    exact-distinct texts that would survive its removal
    (exclusive_distinct = fingerprints living ONLY in that source; a
    source whose docs all exist elsewhere contributes nothing and is
    pure dedup burden).  Complement identities make every per-source
    figure derivable from ONE pass: loo_mean = (total - src) / (n -
    n_src), loo_distinct = total_distinct - exclusive(src) — no
    re-aggregation per source, the trick that makes k-fold source
    ablation O(corpus), not O(k x corpus).

    Scale shape: one per-source aggregate (k rows), one keyed
    fingerprint aggregate (|distinct texts| rows) + k-row rollup, two
    broadcast scalars; integer-exact until the final divisions."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", "text"
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("tn"),
        F.sum("sum_chars").cast("long").alias("ts"),
    )
    fp = docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.count_distinct("source").alias("nd"),
        F.min("source").alias("only_src"),
    )
    td = fp.agg(F.count(F.lit(1)).cast("long").alias("total_distinct"))
    ex = (
        fp.filter(F.col("nd") == 1)
        .groupBy(F.col("only_src").alias("_src"))
        .agg(F.count(F.lit(1)).cast("long").alias("excl"))
    )
    loo_mean = F.when(
        F.col("tn") > F.col("n_docs"),
        (F.col("ts") - F.col("sum_chars")).cast("double")
        / (F.col("tn") - F.col("n_docs")),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(td))
        .join(ex, F.col("_src") == F.col("source"), "left")
        .select(
            "source",
            "n_docs",
            loo_mean.alias("loo_mean_chars"),
            (loo_mean - F.col("ts").cast("double") / F.col("tn")).alias(
                "delta_mean_chars"
            ),
            F.coalesce(F.col("excl"), F.lit(0)).cast("long").alias(
                "exclusive_distinct"
            ),
            (
                F.col("total_distinct") - F.coalesce(F.col("excl"), F.lit(0))
            )
            .cast("long")
            .alias("loo_distinct_texts"),
        )
    )


@_q(
    "sketch_cms_user_counts",
    """
    WITH d4 AS (SELECT unnest(range(0, 4)) AS d),
    upd AS (
      SELECT d4.d,
             ('0x' || substr(md5('cms' || CAST(d4.d AS VARCHAR) || '|'
                                 || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 256 AS bucket
      FROM events CROSS JOIN d4),
    cms AS (
      SELECT d, bucket, CAST(count(*) AS BIGINT) AS c
      FROM upd GROUP BY d, bucket),
    tru AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
      FROM events GROUP BY user_id),
    top AS (
      SELECT user_id, true_count FROM tru
      ORDER BY true_count DESC, user_id LIMIT 20),
    probes AS (
      SELECT top.user_id, top.true_count, d4.d,
             ('0x' || substr(md5('cms' || CAST(d4.d AS VARCHAR) || '|'
                                 || CAST(top.user_id AS VARCHAR)), 1, 8))::BIGINT
               % 256 AS bucket
      FROM top CROSS JOIN d4)
    SELECT p.user_id, p.true_count,
           CAST(MIN(cms.c) AS BIGINT) AS cms_estimate,
           CAST(MIN(cms.c) - p.true_count AS BIGINT) AS overestimate
    FROM probes p JOIN cms ON cms.d = p.d AND cms.bucket = p.bucket
    GROUP BY p.user_id, p.true_count
    """,
)
def sketch_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH point queries (Cormode & Muthukrishnan 2005) —
    the mergeable fixed-memory frequency sketch that answers "how many
    events did user X have" from 4 x 256 counters instead of a
    |users|-sized table: each event increments one counter per depth
    (md5-salted row hashing, the repo's standard replayable bucket
    idiom), and a point estimate is the MIN over its 4 counters —
    provably >= the true count (one-sided error), with overestimate
    <= 2N/256 at 98% per the paper's (e, delta) bound.  The readout
    estimates the TRUE top-20 users so the one-sided guarantee is
    checkable row by row (overestimate is never negative).

    [[approx_distinct_users]] (HLL) answers "how many distinct";
    [[agg_heavy_hitters]] (Misra-Gries) answers "who is frequent";
    CMS completes the sketch family with "how often, for anyone".

    Scale shape: the 4x fan-out collapses map-side to <= 1024 counter
    cells before the shuffle (the whole sketch is partial-aggregatable
    BY CONSTRUCTION — that is the point of CMS: per-partition sketches
    sum cell-wise), one exact per-user aggregate for ground truth, a
    top-k TakeOrdered, and a 80-row probe join against the 1024-cell
    counter table."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").select("user_id")
    d4 = spark.range(4).select(F.col("id").cast("int").alias("d"))

    def _bucket(user_col: str) -> F.Column:
        salt = F.concat(
            F.lit("cms"), F.col("d").cast("string"), F.lit("|"),
            F.col(user_col).cast("string"),
        )
        h = F.md5(salt.cast("binary"))
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 256)

    upd = ev.crossJoin(F.broadcast(d4)).select("d", _bucket("user_id").alias("bucket"))
    cms = upd.groupBy("d", "bucket").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tru = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    top = tru.orderBy(F.col("true_count").desc(), "user_id").limit(20)
    probes = top.crossJoin(F.broadcast(d4)).select(
        "user_id", "true_count", "d", _bucket("user_id").alias("bucket")
    )
    return (
        probes.join(cms, ["d", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(
            F.min("c").cast("long").alias("cms_estimate"),
            (F.min("c") - F.col("true_count")).cast("long").alias("overestimate"),
        )
    )


@_q(
    "ab_permutation_fdr_bh",
    """
    WITH reps AS (SELECT unnest(range(0, 50)) AS r),
    base AS (
      SELECT e.event_type, reps.r,
             CASE WHEN reps.r = 0
                  THEN CASE WHEN isodow(e.ts) - 1 >= 5 THEN 1 ELSE 0 END
                  ELSE CAST(('0x' || substr(md5('perm' || CAST(reps.r AS VARCHAR)
                             || '|' || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
                            % 2 AS INTEGER)
             END AS side,
             e.value
      FROM events e CROSS JOIN reps),
    cell AS (
      SELECT event_type, r,
             CAST(SUM(CASE WHEN side = 1
                           THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN side = 0
                           THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE) AS s0,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
      FROM base GROUP BY event_type, r),
    stat AS (
      SELECT event_type, r,
             CASE WHEN n0 > 0 AND n1 > 0 THEN abs(s1 / n1 - s0 / n0) END AS stat
      FROM cell),
    obs AS (SELECT event_type, stat AS stat_obs
            FROM stat WHERE r = 0 AND stat IS NOT NULL),
    pv AS MATERIALIZED (
      SELECT o.event_type, o.stat_obs,
             CAST(1 + SUM(CASE WHEN s.stat IS NOT NULL AND s.stat >= o.stat_obs
                               THEN 1 ELSE 0 END) AS DOUBLE) / 50.0 AS p_value
      FROM obs o JOIN stat s ON s.event_type = o.event_type AND s.r >= 1
      GROUP BY o.event_type, o.stat_obs),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv),
    rk AS (
      SELECT a.event_type, a.stat_obs, a.p_value, mm.m,
             CAST(1 + SUM(CASE WHEN b.p_value < a.p_value
                               OR (b.p_value = a.p_value
                                   AND b.event_type < a.event_type)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rank
      FROM pv a CROSS JOIN pv b CROSS JOIN mm
      GROUP BY a.event_type, a.stat_obs, a.p_value, mm.m),
    fl AS (
      SELECT event_type, stat_obs, p_value, rank,
             CAST(rank AS DOUBLE) * 0.10 / CAST(m AS DOUBLE) AS bh_threshold,
             p_value <= CAST(rank AS DOUBLE) * 0.10 / CAST(m AS DOUBLE) AS passes
      FROM rk),
    ks AS (SELECT COALESCE(MAX(CASE WHEN passes THEN rank END), 0) AS kstar
           FROM fl)
    SELECT fl.event_type, fl.stat_obs, fl.p_value, fl.rank, fl.bh_threshold,
           fl.rank <= ks.kstar AS rejected
    FROM fl CROSS JOIN ks
    """,
)
def ab_permutation_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT permutation test per event type + BENJAMINI-HOCHBERG FDR
    control across the family — the multiple-testing discipline every
    experimentation platform needs once it tests many metrics at once.
    Per type, the statistic is |weekend mean value - weekday mean value|;
    its null distribution comes from 49 DETERMINISTIC pseudo-splits
    (md5-salted per replicate — the engine-portable stand-in for random
    permutations), giving the textbook exact rational p-value
    (1 + #{null >= observed}) / 50 with NO erf/exp/inverse-CDF anywhere
    (those functions are not bit-portable across engines; integer
    comparisons of identically-derived doubles are).  BH then ranks the
    m p-values and rejects ranks <= k* = max{i : p_(i) <= i*q/m} at
    q = 0.10 — the step-up rule, including the subtlety that a
    non-passing rank BELOW k* is still rejected.

    Scale shape: the 50x replicate fan-out collapses map-side to
    |types| x 50 x 2 cells before the shuffle (conditional decimal
    partials — same argument as [[sketch_cms_user_counts]]); everything
    after the cell table is metadata-sized (ranks come from a broadcast
    triangular count over the m ~ 6 aggregate rows — no global window
    anywhere, so the SinglePartition plan ban holds)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    reps = spark.range(50).select(F.col("id").alias("r"))
    perm_side = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm"),
                        F.col("r").cast("string"),
                        F.lit("|"),
                        F.col("event_id").cast("string"),
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    ).cast("int")
    side = F.when(
        F.col("r") == 0,
        F.when(F.weekday("ts") >= 5, 1).otherwise(0),
    ).otherwise(perm_side)
    base = ev.crossJoin(F.broadcast(reps)).select(
        "event_type", "r", side.alias("side"), "value"
    )
    dec = F.col("value").cast("decimal(27,6)")
    cell = base.groupBy("event_type", "r").agg(
        F.sum(F.when(F.col("side") == 1, dec)).cast("double").alias("s1"),
        F.sum(F.when(F.col("side") == 0, dec)).cast("double").alias("s0"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).cast("long").alias("n0"),
    )
    stat = cell.select(
        "event_type",
        "r",
        F.when(
            (F.col("n0") > 0) & (F.col("n1") > 0),
            F.abs(F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")),
        ).alias("stat"),
    )
    obs = (
        stat.filter((F.col("r") == 0) & F.col("stat").isNotNull())
        .select("event_type", F.col("stat").alias("stat_obs"))
    )
    nulls = stat.filter(F.col("r") >= 1).select(
        F.col("event_type").alias("_t"), F.col("stat").alias("_s")
    )
    pv = (
        obs.join(nulls, F.col("_t") == F.col("event_type"))
        .groupBy("event_type", "stat_obs")
        .agg(
            (
                (
                    F.lit(1)
                    + F.sum(
                        F.when(
                            F.col("_s").isNotNull()
                            & (F.col("_s") >= F.col("stat_obs")),
                            1,
                        ).otherwise(0)
                    )
                ).cast("double")
                / F.lit(50.0)
            ).alias("p_value")
        )
    )
    mm = pv.agg(F.count(F.lit(1)).cast("long").alias("m"))
    # rank WITHOUT a global window (Exchange-SinglePartition ban): the
    # rank of a row in the (p_value, event_type) total order is 1 + the
    # count of strictly-smaller rows — a broadcast triangular count over
    # the m-row aggregate output
    pvb = pv.select(
        F.col("event_type").alias("_bt"), F.col("p_value").alias("_bp")
    )
    smaller = F.when(
        (F.col("_bp") < F.col("p_value"))
        | (
            (F.col("_bp") == F.col("p_value"))
            & (F.col("_bt") < F.col("event_type"))
        ),
        1,
    ).otherwise(0)
    rk = (
        pv.crossJoin(F.broadcast(pvb))
        .crossJoin(F.broadcast(mm))
        .groupBy("event_type", "stat_obs", "p_value", "m")
        .agg((F.lit(1) + F.sum(smaller)).cast("long").alias("rank"))
    )
    fl = rk.select(
        "event_type",
        "stat_obs",
        "p_value",
        "rank",
        (F.col("rank").cast("double") * 0.10 / F.col("m").cast("double")).alias(
            "bh_threshold"
        ),
        (
            F.col("p_value")
            <= F.col("rank").cast("double") * 0.10 / F.col("m").cast("double")
        ).alias("passes"),
    )
    ks = fl.agg(
        F.coalesce(
            F.max(F.when(F.col("passes"), F.col("rank"))), F.lit(0)
        ).alias("kstar")
    )
    return fl.crossJoin(F.broadcast(ks)).select(
        "event_type",
        "stat_obs",
        "p_value",
        "rank",
        "bh_threshold",
        (F.col("rank") <= F.col("kstar")).alias("rejected"),
    )


def _hll32_sql() -> str:
    """DuckDB replay of the 32-register md5 HyperLogLog intersection.

    Every float the estimator touches is EXACT in IEEE doubles: register
    weights are dyadic rationals 2^-r (emitted as literals generated from
    the same python loop that builds the Spark CASE chain), and the
    32-term register sums span ~40 bits of precision — well inside the
    53-bit mantissa — so summation order cannot change bits and the
    whole estimate is FULL-oracle portable, unlike the engine-native
    Datasketches path ([[approx_distinct_users]], rows-only by design).
    """
    rank_arms = " ".join(
        f"WHEN rem >= {1 << (26 - i)} THEN {i + 1}" for i in range(27)
    )
    w_arms = {
        f"m{side}": " ".join(
            f"WHEN {col} = {r} THEN CAST({2.0 ** -r!r} AS DOUBLE)"
            for r in range(29)
        )
        for side, col in (("a", "ma"), ("b", "mb"), ("u", "mu"))
        for col in (f"m{side}",)
    }
    return f"""
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|'
                 || CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 8))::BIGINT AS h32
      FROM events),
    hr AS (
      SELECT event_type, h32 % 32 AS bucket,
             CAST(floor(CAST(h32 AS DOUBLE) / 32.0) AS BIGINT) AS rem
      FROM h),
    regs AS (
      SELECT event_type, bucket,
             MAX(CASE {rank_arms} ELSE 28 END) AS mx
      FROM hr GROUP BY event_type, bucket),
    ty AS (SELECT DISTINCT event_type FROM events),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM ty a JOIN ty b ON a.event_type < b.event_type),
    dense AS (
      SELECT pairs.ta, pairs.tb, g.bucket,
             COALESCE(ra.mx, 0) AS ma, COALESCE(rb.mx, 0) AS mb,
             GREATEST(COALESCE(ra.mx, 0), COALESCE(rb.mx, 0)) AS mu
      FROM pairs CROSS JOIN (SELECT unnest(range(0, 32)) AS bucket) g
      LEFT JOIN regs ra ON ra.event_type = pairs.ta AND ra.bucket = g.bucket
      LEFT JOIN regs rb ON rb.event_type = pairs.tb AND rb.bucket = g.bucket),
    sums AS (
      SELECT ta, tb,
             SUM(CASE {w_arms["ma"]} END) AS sa,
             SUM(CASE {w_arms["mb"]} END) AS sb,
             SUM(CASE {w_arms["mu"]} END) AS su
      FROM dense GROUP BY ta, tb)
    SELECT ta, tb,
           0.697 * 1024.0 / sa AS est_a,
           0.697 * 1024.0 / sb AS est_b,
           0.697 * 1024.0 / su AS est_union,
           (0.697 * 1024.0 / sa + 0.697 * 1024.0 / sb)
             - 0.697 * 1024.0 / su AS est_intersection
    FROM sums
    """


@_q("sketch_hll_audience_intersection", _hll32_sql())
def sketch_hll_audience_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE-OVERLAP estimation from mergeable HyperLogLog sketches
    (Flajolet et al. 2007): per event-type pair, the estimated distinct
    active user-days of each type, of their UNION (registers merge by
    element-wise MAX — the property that makes HLL a distributed partial
    aggregate), and of their INTERSECTION via inclusion-exclusion — the
    one set operation HLL cannot answer natively, and exactly how
    audience-overlap dashboards do it at scale (store one sketch per
    segment, never re-scan).  This is a hand-rolled 32-register md5 HLL,
    NOT the engine's Datasketches aggregate, precisely so the estimator
    is bit-replayable in the DuckDB oracle (see [[approx_distinct_users]]
    for the native rows-only twin).  Raw estimator only — 32 registers
    keep every tested cardinality above the 2.5m small-range cutoff, and
    the linear-counting correction needs ln(), which is not bit-portable
    across engines (documented limit).

    Scale shape: one scan to (type, bucket) max-rank registers (a 32-row
    sketch per type, partial-aggregatable map-side), then all pair math
    on |types|^2 x 32 metadata rows; no distinct, no pairwise user join
    anywhere."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    key = F.concat(
        F.col("user_id").cast("string"),
        F.lit("|"),
        F.col("ts").cast("date").cast("string"),
    )
    h32 = F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast(
        "bigint"
    )
    rem = F.floor(h32.cast("double") / 32.0).cast("bigint")
    rank: F.Column = F.lit(28)
    for i in reversed(range(27)):  # build the CASE ladder bottom-up
        rank = F.when(rem >= (1 << (26 - i)), i + 1).otherwise(rank)
    hr = ev.select(
        "event_type", (h32 % 32).alias("bucket"), rank.alias("rank")
    )
    regs = hr.groupBy("event_type", "bucket").agg(F.max("rank").alias("mx"))
    ty = ev.select("event_type").distinct()
    pairs = (
        ty.select(F.col("event_type").alias("ta"))
        .join(
            ty.select(F.col("event_type").alias("tb")),
            F.col("ta") < F.col("tb"),
        )
    )
    g = spark.range(32).select(F.col("id").cast("bigint").alias("bucket"))
    ra = regs.select(
        F.col("event_type").alias("_ta"),
        F.col("bucket").alias("_ba"),
        F.col("mx").alias("_mxa"),
    )
    rb = regs.select(
        F.col("event_type").alias("_tb"),
        F.col("bucket").alias("_bb"),
        F.col("mx").alias("_mxb"),
    )
    dense = (
        pairs.crossJoin(F.broadcast(g))
        .join(
            ra,
            (F.col("_ta") == F.col("ta")) & (F.col("_ba") == F.col("bucket")),
            "left",
        )
        .join(
            rb,
            (F.col("_tb") == F.col("tb")) & (F.col("_bb") == F.col("bucket")),
            "left",
        )
        .select(
            "ta",
            "tb",
            F.coalesce(F.col("_mxa"), F.lit(0)).alias("ma"),
            F.coalesce(F.col("_mxb"), F.lit(0)).alias("mb"),
            F.greatest(
                F.coalesce(F.col("_mxa"), F.lit(0)),
                F.coalesce(F.col("_mxb"), F.lit(0)),
            ).alias("mu"),
        )
    )

    def _w(col: str) -> F.Column:
        expr = F.lit(None).cast("double")
        for r in reversed(range(29)):
            expr = F.when(F.col(col) == r, F.lit(2.0 ** -r)).otherwise(expr)
        return expr

    sums = dense.groupBy("ta", "tb").agg(
        F.sum(_w("ma")).alias("sa"),
        F.sum(_w("mb")).alias("sb"),
        F.sum(_w("mu")).alias("su"),
    )
    est = lambda s: F.lit(0.697) * F.lit(1024.0) / F.col(s)  # noqa: E731
    return sums.select(
        "ta",
        "tb",
        est("sa").alias("est_a"),
        est("sb").alias("est_b"),
        est("su").alias("est_union"),
        ((est("sa") + est("sb")) - est("su")).alias("est_intersection"),
    )


@_q(
    "uplift_qini_by_decile",
    f"""
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS score,
             CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 100.0
                           THEN 1 ELSE 0 END) AS BIGINT) AS converted,
             CASE WHEN ('0x' || substr(md5('exp1'
                        || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10000 < 5000 THEN 1 ELSE 0 END AS treated
      FROM events GROUP BY user_id),
    q AS (SELECT quantile_cont(score, {_DECILE_PS}) AS t FROM u),
    b AS (SELECT u.*,
                 1 + {' + '.join(f'(CASE WHEN u.score < t[{i + 1}] THEN 1 ELSE 0 END)' for i in range(9))} AS decile
          FROM u CROSS JOIN q),
    d AS MATERIALIZED (
      SELECT decile,
             CAST(SUM(treated) AS BIGINT) AS n_treat,
             CAST(SUM(1 - treated) AS BIGINT) AS n_ctrl,
             CAST(SUM(treated * converted) AS BIGINT) AS conv_treat,
             CAST(SUM((1 - treated) * converted) AS BIGINT) AS conv_ctrl
      FROM b GROUP BY decile),
    c AS (
      SELECT a.decile, a.n_treat, a.n_ctrl, a.conv_treat, a.conv_ctrl,
             CAST(SUM(d2.n_treat) AS BIGINT) AS cum_nt,
             CAST(SUM(d2.n_ctrl) AS BIGINT) AS cum_nc,
             CAST(SUM(d2.conv_treat) AS BIGINT) AS cum_ct,
             CAST(SUM(d2.conv_ctrl) AS BIGINT) AS cum_cc
      FROM d a JOIN d d2 ON d2.decile <= a.decile
      GROUP BY a.decile, a.n_treat, a.n_ctrl, a.conv_treat, a.conv_ctrl)
    SELECT decile, n_treat, n_ctrl, conv_treat, conv_ctrl,
           CASE WHEN n_treat > 0 AND n_ctrl > 0
                THEN CAST(conv_treat AS DOUBLE) / n_treat
                     - CAST(conv_ctrl AS DOUBLE) / n_ctrl END AS uplift_rate,
           CASE WHEN cum_nc > 0
                THEN CAST(cum_ct AS DOUBLE)
                     - CAST(cum_cc AS DOUBLE)
                       * (CAST(cum_nt AS DOUBLE) / CAST(cum_nc AS DOUBLE))
           END AS qini
    FROM c
    """,
)
def uplift_qini_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QINI curve by score decile — the standard uplift-model evaluation
    (Radcliffe 2007): users ranked by a deterministic targeting score
    (view count), split into the md5 experiment arms ([[ab_test_welch_z]]
    family), and per cumulative top-k the Qini statistic
    Q(k) = cum_conv_T(k) - cum_conv_C(k) * N_T(k)/N_C(k) — "how many
    EXTRA conversions did treating the top k deciles buy over treating
    no one", the incremental-value analog of
    [[classifier_gains_table]]'s pure-response gains.  Decile 1 is the
    TOP of the score distribution (the ladder counts thresholds above),
    so the window cumulates in targeting order.

    Scale shape: one user-keyed aggregate, ONE percentile aggregate
    broadcast back as a 9-literal comparison ladder (the
    [[w5_deciles_bucketed]] scale-safe pattern — no global NTILE), a
    10-row decile aggregate, and cumulation via a broadcast triangular
    self-join over those 10 metadata rows — no global window anywhere."""
    from lvm_datapipe_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 100.0),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("converted"),
    ).withColumn(
        "treated",
        F.when(hash_bucket("user_id", 10_000, "exp1") < 5000, 1).otherwise(0),
    )
    th = u.agg(F.percentile("score", F.lit(_DECILE_PS)).alias("t"))
    decile = F.lit(1)
    for i in range(9):
        decile = decile + (F.col("score") < F.element_at("t", i + 1)).cast("int")
    b = u.crossJoin(F.broadcast(th)).select(
        "score", "converted", "treated", decile.alias("decile")
    )
    d = b.groupBy("decile").agg(
        F.sum("treated").cast("long").alias("n_treat"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_ctrl"),
        F.sum(F.col("treated") * F.col("converted"))
        .cast("long")
        .alias("conv_treat"),
        F.sum((1 - F.col("treated")) * F.col("converted"))
        .cast("long")
        .alias("conv_ctrl"),
    )
    # cumulative over the 10 decile rows WITHOUT a global window
    # (Exchange-SinglePartition ban): broadcast triangular self-join
    d2 = d.select(
        F.col("decile").alias("_d2"),
        F.col("n_treat").alias("_nt"),
        F.col("n_ctrl").alias("_nc"),
        F.col("conv_treat").alias("_ct"),
        F.col("conv_ctrl").alias("_cc"),
    )
    c = (
        d.join(F.broadcast(d2), F.col("_d2") <= F.col("decile"))
        .groupBy("decile", "n_treat", "n_ctrl", "conv_treat", "conv_ctrl")
        .agg(
            F.sum("_nt").cast("long").alias("cum_nt"),
            F.sum("_nc").cast("long").alias("cum_nc"),
            F.sum("_ct").cast("long").alias("cum_ct"),
            F.sum("_cc").cast("long").alias("cum_cc"),
        )
    )
    return c.select(
        "decile",
        "n_treat",
        "n_ctrl",
        "conv_treat",
        "conv_ctrl",
        F.when(
            (F.col("n_treat") > 0) & (F.col("n_ctrl") > 0),
            F.col("conv_treat").cast("double") / F.col("n_treat")
            - F.col("conv_ctrl").cast("double") / F.col("n_ctrl"),
        ).alias("uplift_rate"),
        F.when(
            F.col("cum_nc") > 0,
            F.col("cum_ct").cast("double")
            - F.col("cum_cc").cast("double")
            * (F.col("cum_nt").cast("double") / F.col("cum_nc").cast("double")),
        ).alias("qini"),
    )


@_q(
    "eval_langid_confusion",
    """
    WITH t AS (SELECT doc_id, lang,
                      list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '') toks
               FROM documents),
    h AS (
      SELECT doc_id, lang,
        CAST(len(list_filter(toks, x -> list_contains(['the','a','and','of','is'], lower(x)))) AS INTEGER) AS hits_en,
        CAST(len(list_filter(toks, x -> list_contains(['le','la','les','et','une'], lower(x)))) AS INTEGER) AS hits_fr,
        CAST(len(list_filter(toks, x -> list_contains(['el','los','y','que','una'], lower(x)))) AS INTEGER) AS hits_es,
        CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], lower(x)))) AS INTEGER) AS hits_de
      FROM t),
    p AS (
      SELECT lang AS declared_lang,
             CASE WHEN greatest(hits_en, hits_fr, hits_es, hits_de) = 0 THEN 'und'
                  WHEN hits_en = greatest(hits_en, hits_fr, hits_es, hits_de) THEN 'en'
                  WHEN hits_fr = greatest(hits_en, hits_fr, hits_es, hits_de) THEN 'fr'
                  WHEN hits_es = greatest(hits_en, hits_fr, hits_es, hits_de) THEN 'es'
                  ELSE 'de' END AS predicted_lang
      FROM h),
    cell AS (
      SELECT declared_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY declared_lang, predicted_lang),
    tot AS (
      SELECT declared_lang, CAST(SUM(n) AS BIGINT) AS n_declared
      FROM cell GROUP BY declared_lang)
    SELECT cell.declared_lang, cell.predicted_lang, cell.n,
           CAST(cell.n AS DOUBLE) / tot.n_declared AS frac_of_declared
    FROM cell JOIN tot ON tot.declared_lang = cell.declared_lang
    """,
)
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONFUSION MATRIX of the n-gram language identifier against the
    corpus's declared language labels — the QA readout every curation
    team runs before trusting a langid gate (CCNet publishes exactly
    this per-shard): each (declared, predicted) cell with its count and
    its share of the declared language's documents (row-normalized
    recall).  Composes the [[text_langid]] stopword-hit kernel
    (operators/text.language_id) with the label column; disagreement
    cells are where the gate would mis-route documents.

    Scale shape: the langid scan (per-doc token-list filters, no
    shuffle), one keyed cell aggregate bounded by |langs|^2, one
    |langs|-row rollup joined back — all post-scan work is
    metadata-sized."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    p = X.language_id(docs).join(
        docs.select("doc_id", F.col("lang").alias("declared_lang")), "doc_id"
    )
    cell = p.groupBy("declared_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cell.groupBy(F.col("declared_lang").alias("_d")).agg(
        F.sum("n").cast("long").alias("n_declared")
    )
    return (
        cell.join(F.broadcast(tot), F.col("_d") == F.col("declared_lang"))
        .select(
            "declared_lang",
            "predicted_lang",
            "n",
            (F.col("n").cast("double") / F.col("n_declared")).alias(
                "frac_of_declared"
            ),
        )
    )


@_q(
    "source_pair_ablation",
    """
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tn,
                   CAST(SUM(sum_chars) AS BIGINT) AS ts FROM per),
    fp AS (SELECT md5(text) AS h, count(DISTINCT source) AS nd,
                  MIN(source) AS smin, MAX(source) AS smax
           FROM documents GROUP BY md5(text)),
    td AS (SELECT CAST(count(*) AS BIGINT) AS total_distinct FROM fp),
    ex1 AS (SELECT smin AS s, CAST(count(*) AS BIGINT) AS c
            FROM fp WHERE nd = 1 GROUP BY smin),
    ex2 AS (SELECT smin AS pa, smax AS pb, CAST(count(*) AS BIGINT) AS c
            FROM fp WHERE nd = 2 GROUP BY smin, smax),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb,
             a.n_docs AS na, b.n_docs AS nb,
             a.sum_chars AS ca, b.sum_chars AS cb
      FROM per a JOIN per b ON a.source < b.source)
    SELECT pairs.sa, pairs.sb,
           CASE WHEN tot.tn > pairs.na + pairs.nb
                THEN CAST(tot.ts - pairs.ca - pairs.cb AS DOUBLE)
                     / (tot.tn - pairs.na - pairs.nb) END AS loo2_mean_chars,
           CAST(td.total_distinct - COALESCE(e1a.c, 0) - COALESCE(e1b.c, 0)
                - COALESCE(e2.c, 0) AS BIGINT) AS loo2_distinct_texts,
           CAST(COALESCE(e2.c, 0) AS BIGINT) AS pair_interaction_distinct
    FROM pairs CROSS JOIN tot CROSS JOIN td
    LEFT JOIN ex1 e1a ON e1a.s = pairs.sa
    LEFT JOIN ex1 e1b ON e1b.s = pairs.sb
    LEFT JOIN ex2 e2 ON e2.pa = pairs.sa AND e2.pb = pairs.sb
    """,
)
def source_pair_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SOURCE ablation — the pairwise Shapley-style interaction term
    on top of [[source_loo_contribution]]: for every source pair, the
    corpus mean length and distinct-text count with BOTH removed, plus
    the INTERACTION (distinct texts living in exactly that pair and
    nowhere else — the loss removing them together causes BEYOND the sum
    of the two solo removals).  A high interaction means the two feeds
    back each other up (mirrors, re-crawls of the same site): cutting
    one is survivable, cutting both is not — the question one-at-a-time
    LOO structurally cannot answer.

    Everything still comes from ONE fingerprint pass: a fingerprint with
    nd=1 holders vanishes for any pair containing its source, nd=2 only
    for exactly its holder pair (min/max source IS the pair since nd=2),
    nd>=3 never — so the k(k-1)/2 ablations cost one keyed aggregate +
    metadata joins, not O(k^2) corpus re-scans.

    Scale shape: the same fingerprint aggregate as the solo LOO, two
    k-row / k^2-row rollups, all pair math on |sources|^2 rows."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", "text"
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("tn"),
        F.sum("sum_chars").cast("long").alias("ts"),
    )
    fp = docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.count_distinct("source").alias("nd"),
        F.min("source").alias("smin"),
        F.max("source").alias("smax"),
    )
    td = fp.agg(F.count(F.lit(1)).cast("long").alias("total_distinct"))
    ex1 = (
        fp.filter(F.col("nd") == 1)
        .groupBy(F.col("smin").alias("s"))
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    ex2 = (
        fp.filter(F.col("nd") == 2)
        .groupBy(F.col("smin").alias("pa"), F.col("smax").alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    a = per.select(
        F.col("source").alias("sa"),
        F.col("n_docs").alias("na"),
        F.col("sum_chars").alias("ca"),
    )
    b = per.select(
        F.col("source").alias("sb"),
        F.col("n_docs").alias("nb"),
        F.col("sum_chars").alias("cb"),
    )
    pairs = a.join(b, F.col("sa") < F.col("sb"))
    e1a = ex1.select(F.col("s").alias("_s1a"), F.col("c1").alias("_c1a"))
    e1b = ex1.select(F.col("s").alias("_s1b"), F.col("c1").alias("_c1b"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(td))
        .join(F.broadcast(e1a), F.col("_s1a") == F.col("sa"), "left")
        .join(F.broadcast(e1b), F.col("_s1b") == F.col("sb"), "left")
        .join(
            F.broadcast(ex2),
            (F.col("pa") == F.col("sa")) & (F.col("pb") == F.col("sb")),
            "left",
        )
        .select(
            "sa",
            "sb",
            F.when(
                F.col("tn") > F.col("na") + F.col("nb"),
                (F.col("ts") - F.col("ca") - F.col("cb")).cast("double")
                / (F.col("tn") - F.col("na") - F.col("nb")),
            ).alias("loo2_mean_chars"),
            (
                F.col("total_distinct")
                - F.coalesce(F.col("_c1a"), F.lit(0))
                - F.coalesce(F.col("_c1b"), F.lit(0))
                - F.coalesce(F.col("c2"), F.lit(0))
            )
            .cast("long")
            .alias("loo2_distinct_texts"),
            F.coalesce(F.col("c2"), F.lit(0))
            .cast("long")
            .alias("pair_interaction_distinct"),
        )
    )


@_q(
    "eb_shrunk_supplier_rates",
    """
    WITH lat AS (
      SELECT l.l_suppkey,
             CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) <= 60
                  THEN 1 ELSE 0 END AS ontime
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    g AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n_ships,
             CAST(SUM(ontime) AS BIGINT) AS n_ontime
      FROM lat GROUP BY l_suppkey),
    p AS (
      SELECT l_suppkey, n_ships, n_ontime,
             CAST(n_ontime AS DOUBLE) / n_ships AS raw_rate
      FROM g WHERE n_ships > 0),
    m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(SUM(CAST(floor(raw_rate * 1000000000.0) AS BIGINT))
                  AS BIGINT) AS pm
      FROM p),
    m AS (SELECT k, CAST(pm AS DOUBLE) / 1000000000.0 / CAST(k AS DOUBLE)
                 AS mu FROM m1),
    v1 AS (
      SELECT CAST(SUM(CAST(floor((p.raw_rate - m.mu) * (p.raw_rate - m.mu)
                                 * 1000000000000.0) AS BIGINT)) AS BIGINT) AS vm
      FROM p CROSS JOIN m),
    ab AS (
      SELECT m.k, m.mu,
             CASE WHEN m.k >= 2 AND v1.vm > 0
                  THEN CAST(v1.vm AS DOUBLE) / 1000000000000.0
                       / CAST(m.k - 1 AS DOUBLE) END AS var,
             CASE WHEN m.k >= 2 AND v1.vm > 0
                  THEN m.mu * (1.0 - m.mu)
                       / (CAST(v1.vm AS DOUBLE) / 1000000000000.0
                          / CAST(m.k - 1 AS DOUBLE)) - 1.0 END AS nu
      FROM m CROSS JOIN v1)
    SELECT p.l_suppkey, p.n_ships, p.n_ontime, p.raw_rate,
           CASE WHEN ab.nu IS NOT NULL AND ab.nu > 0.0
                THEN (CAST(p.n_ontime AS DOUBLE) + ab.mu * ab.nu)
                     / (CAST(p.n_ships AS DOUBLE) + ab.nu)
                ELSE p.raw_rate END AS shrunk_rate,
           CASE WHEN ab.nu IS NOT NULL AND ab.nu > 0.0
                THEN ab.mu * ab.nu END AS alpha,
           CASE WHEN ab.nu IS NOT NULL AND ab.nu > 0.0
                THEN ab.nu - ab.mu * ab.nu END AS beta
    FROM p CROSS JOIN ab
    """,
)
def eb_shrunk_supplier_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMPIRICAL-BAYES shrinkage of per-supplier on-time rates (the
    Efron-Morris / beta-binomial method-of-moments recipe): fit a Beta
    prior to the ACROSS-supplier rate distribution (mean mu, prior
    strength nu = mu(1-mu)/var - 1), then shrink each supplier to
    (x + mu*nu) / (n + nu) — small-n suppliers pull hard toward the
    grand mean, big-n suppliers keep their data.  The OTHER standard fix
    for "don't sort by raw average" ([[supplier_ontime_wilson_rank]]
    ranks by a confidence bound; EB replaces the ESTIMATE itself, which
    is what a downstream join or model feature wants).  Degenerate
    priors (one supplier, zero variance, nu <= 0) fall back to the raw
    rate, flagged by NULL alpha/beta.

    Cross-group moment sums go through the floor-micro BIGINT
    quantization (rates * 1e9, squared deviations * 1e12) so the
    across-supplier aggregation order cannot change bits in either
    engine.

    Scale shape: one fact-dim equi-join, one supplier-keyed aggregate,
    two scalar moment aggregates broadcast back — the prior costs two
    metadata rows, not a second corpus pass."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lat = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_suppkey",
        F.when(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            <= 60,
            1,
        )
        .otherwise(0)
        .alias("ontime"),
    )
    g = lat.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_ships"),
        F.sum("ontime").cast("long").alias("n_ontime"),
    )
    p = g.filter(F.col("n_ships") > 0).withColumn(
        "raw_rate", F.col("n_ontime").cast("double") / F.col("n_ships")
    )
    m1 = p.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.floor(F.col("raw_rate") * 1000000000.0).cast("long"))
        .cast("long")
        .alias("pm"),
    )
    m = m1.select(
        "k",
        (
            F.col("pm").cast("double") / 1000000000.0 / F.col("k").cast("double")
        ).alias("mu"),
    )
    v1 = (
        p.crossJoin(F.broadcast(m))
        .agg(
            F.sum(
                F.floor(
                    (F.col("raw_rate") - F.col("mu"))
                    * (F.col("raw_rate") - F.col("mu"))
                    * 1000000000000.0
                ).cast("long")
            )
            .cast("long")
            .alias("vm")
        )
    )
    var = F.when(
        (F.col("k") >= 2) & (F.col("vm") > 0),
        F.col("vm").cast("double") / 1000000000000.0
        / (F.col("k") - 1).cast("double"),
    )
    ab = m.crossJoin(F.broadcast(v1)).select(
        "k",
        "mu",
        var.alias("var"),
        F.when(
            (F.col("k") >= 2) & (F.col("vm") > 0),
            F.col("mu") * (1.0 - F.col("mu")) / var - 1.0,
        ).alias("nu"),
    )
    ok = F.col("nu").isNotNull() & (F.col("nu") > 0.0)
    return p.crossJoin(F.broadcast(ab)).select(
        "l_suppkey",
        "n_ships",
        "n_ontime",
        "raw_rate",
        F.when(
            ok,
            (F.col("n_ontime").cast("double") + F.col("mu") * F.col("nu"))
            / (F.col("n_ships").cast("double") + F.col("nu")),
        )
        .otherwise(F.col("raw_rate"))
        .alias("shrunk_rate"),
        F.when(ok, F.col("mu") * F.col("nu")).alias("alpha"),
        F.when(ok, F.col("nu") - F.col("mu") * F.col("nu")).alias("beta"),
    )


def _kcore_sql(k: int = 3, n_rounds: int = 8) -> str:
    """DuckDB replay of the fixed-round k-core peel.  Each round's
    alive-set is MATERIALIZED (it is referenced twice per degree
    computation; inlined CTEs would expand the scan chain
    exponentially — same device as the Bradley-Terry oracle)."""
    parts = [
        """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
      SELECT x.l_partkey AS p1, y.l_partkey AS p2
      FROM b x JOIN b y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY x.l_partkey, y.l_partkey),
    sym AS MATERIALIZED (
      SELECT p1 AS u, p2 AS v FROM e0
      UNION ALL SELECT p2 AS u, p1 AS v FROM e0),
    alive0 AS MATERIALIZED (SELECT DISTINCT u AS p FROM sym)"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(
            f"""deg{r} AS (
      SELECT sym.u AS p, CAST(count(*) AS BIGINT) AS deg
      FROM sym
      JOIN alive{r - 1} a ON a.p = sym.u
      JOIN alive{r - 1} c ON c.p = sym.v
      GROUP BY sym.u),
    alive{r} AS MATERIALIZED (SELECT p FROM deg{r} WHERE deg >= {k})"""
        )
    body = ",\n    ".join(parts)
    return f"""
    {body}
    SELECT d.p AS p_partkey, d.deg AS core_degree
    FROM deg{n_rounds} d JOIN alive{n_rounds} a ON a.p = d.p
    """


@_q("graph_kcore_parts", _kcore_sql())
def graph_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-CORE of the part co-purchase graph (Seidman 1983 k-core
    decomposition, the standard graph-cohesion screen): repeatedly
    delete parts with fewer than 3 surviving co-purchase partners until
    the remainder stabilizes — what survives is the densely
    cross-purchased "core catalog" (for a dedup graph, the same peel
    isolates the pathological near-dup cliques worth human review;
    cf. [[dup_graph_degree_hist]]).  Peeling runs a FIXED 8 rounds —
    deterministic plan depth instead of a data-dependent driver loop;
    the pytest reference peels to the true fixpoint and agrees on this
    corpus, and the round-count bound is the documented knob.

    Scale shape: one distinct basket aggregate, one order-keyed pair
    self-join (bounded by basket size squared), then 8 rounds of
    node-keyed semi-join + degree aggregate on a MONOTONICALLY
    SHRINKING alive-set — every shuffle is keyed on part ids, no
    cartesian, no driver-side materialization."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.distinct()
    x = b.select("l_orderkey", F.col("l_partkey").alias("p1"))
    y = b.select("l_orderkey", F.col("l_partkey").alias("p2"))
    e0 = (
        x.join(y, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
    )
    sym = e0.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionAll(
        e0.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    alive = sym.select(F.col("u").alias("p")).distinct()
    deg = None
    for _ in range(8):
        au = alive.select(F.col("p").alias("_au"))
        av = alive.select(F.col("p").alias("_av"))
        deg = (
            sym.join(au, F.col("_au") == F.col("u"))
            .join(av, F.col("_av") == F.col("v"))
            .groupBy(F.col("u").alias("p"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        alive = deg.filter(F.col("deg") >= 3).select("p")
    return deg.join(alive.withColumnRenamed("p", "_p"),
                    F.col("_p") == F.col("p")).select(
        F.col("p").alias("p_partkey"), F.col("deg").alias("core_degree")
    )


@_q(
    "vocab_chao1_richness",
    f"""
    WITH tok AS (SELECT lang, unnest({_SQL_LTOKS}) AS token FROM documents),
    tf AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
           FROM tok GROUP BY lang, token)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS s_obs,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           CAST(count(*) AS DOUBLE)
             + CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                    * (SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) - 1) AS DOUBLE)
               / (2.0 * (SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) + 1))
             AS chao1_estimate
    FROM tf GROUP BY lang
    """,
)
def vocab_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAO1 vocabulary-richness estimation per language (Chao 1984, the
    bias-corrected form S_obs + F1(F1-1)/(2(F2+1))): how many word types
    the corpus WOULD have if sampling continued, from just the singleton
    (F1) and doubleton (F2) counts — the ecology species estimator that
    corpus linguistics adopted for "how much vocabulary are we missing".
    A slice whose Chao1 far exceeds its S_obs is under-sampled (its
    hapax mass keeps promising new types — cf. [[vocab_hapax_ratio]] for
    the raw ratio and [[vocab_growth_by_arrival]] for the Heaps curve);
    one whose estimate ~= S_obs has been scraped to saturation.
    Bias-corrected denominator (F2 + 1) keeps the estimator finite when
    no doubletons exist — every term is an exact integer until the one
    closing division.

    Scale shape: scan-shaped tokenization, one (lang, token)-keyed
    count, one |langs|-row rollup — the frequency-of-frequencies never
    leaves the aggregate."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(X.tokens(F.lower(F.col("text")))).alias("token")
    )
    tf = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    f1 = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    f2 = F.sum(F.when(F.col("n") == 2, 1).otherwise(0))
    return tf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        f1.cast("long").alias("f1"),
        f2.cast("long").alias("f2"),
        (
            F.count(F.lit(1)).cast("double")
            + (f1 * (f1 - 1)).cast("double") / (2.0 * (f2 + 1))
        ).alias("chao1_estimate"),
    )


@_q(
    "stylometry_burrows_delta",
    f"""
    WITH tok AS (SELECT source, unnest({_SQL_LTOKS}) AS token FROM documents),
    cnt AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n
            FROM tok GROUP BY source, token),
    totals AS (SELECT source, CAST(SUM(n) AS BIGINT) AS total
               FROM cnt GROUP BY source),
    markers AS MATERIALIZED (
      SELECT token FROM (
        SELECT token, CAST(SUM(n) AS BIGINT) AS cn FROM cnt GROUP BY token)
      ORDER BY cn DESC, token LIMIT 20),
    grid AS MATERIALIZED (
      SELECT t.source, m.token, t.total, COALESCE(c.n, 0) AS n,
             CAST(COALESCE(c.n, 0) AS DOUBLE) / t.total AS f
      FROM totals t CROSS JOIN markers m
      LEFT JOIN cnt c ON c.source = t.source AND c.token = m.token),
    k AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM totals),
    mstat AS MATERIALIZED (
      SELECT grid.token,
             CAST(SUM(CAST(floor(grid.f * 1000000000000.0) AS BIGINT))
                  AS BIGINT) AS fsum
      FROM grid GROUP BY grid.token),
    mu AS MATERIALIZED (
      SELECT mstat.token,
             CAST(mstat.fsum AS DOUBLE) / 1000000000000.0
               / CAST(k.ns AS DOUBLE) AS mu
      FROM mstat CROSS JOIN k),
    sig AS MATERIALIZED (
      SELECT grid.token,
             sqrt(CAST(SUM(CAST(floor((grid.f - mu.mu) * (grid.f - mu.mu)
                                      * 1000000000000.0) AS BIGINT))
                       AS DOUBLE) / 1000000000000.0
                  / CAST(k.ns - 1 AS DOUBLE)) AS sigma
      FROM grid JOIN mu ON mu.token = grid.token CROSS JOIN k
      WHERE k.ns >= 2
      GROUP BY grid.token, k.ns),
    z AS MATERIALIZED (
      SELECT grid.source, grid.token,
             CASE WHEN sig.sigma > 0.0
                  THEN (grid.f - mu.mu) / sig.sigma ELSE 0.0 END AS z
      FROM grid JOIN mu ON mu.token = grid.token
      JOIN sig ON sig.token = grid.token)
    SELECT a.source AS sa, b.source AS sb,
           CAST(CAST(SUM(CAST(floor(abs(a.z - b.z) * 1000000000.0) AS BIGINT))
                     AS DOUBLE) / 1000000000.0 / 20.0 AS DOUBLE) AS delta
    FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def stylometry_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURROWS' DELTA between sources (Burrows 2002, the standard
    stylometric / authorship-attribution distance): z-score each
    source's relative frequency of the corpus's 20 most-frequent marker
    words against the across-source distribution, then Delta(a, b) =
    mean |z_a - z_b| over the markers.  In a curation pipeline this is
    the duplicate-FEED detector — two sources with near-zero Delta are
    stylistically the same upstream (mirror, re-crawl, same template
    farm) even when no single document is a literal duplicate, the case
    [[source_pair_ablation]]'s exact-fingerprint interaction cannot see.
    Marker selection is deterministic (count desc, token asc); every
    cross-source sum is floor-micro BIGINT quantized; sqrt is the one
    transcendental and it is IEEE-exact.

    Scale shape: one (source, token) keyed count, a |sources| x 20
    broadcast grid, 20-row marker stats, and a marker-keyed pair join
    whose cardinality is |sources|^2 x 20 metadata rows — the corpus is
    touched once."""
    from lvm_datapipe_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(X.tokens(F.lower(F.col("text")))).alias("token")
    )
    cnt = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = cnt.groupBy("source").agg(F.sum("n").cast("long").alias("total"))
    markers = (
        cnt.groupBy("token")
        .agg(F.sum("n").cast("long").alias("cn"))
        .orderBy(F.col("cn").desc(), "token")
        .limit(20)
        .select("token")
    )
    c2 = cnt.select(
        F.col("source").alias("_cs"), F.col("token").alias("_ct"), "n"
    )
    grid = (
        totals.crossJoin(F.broadcast(markers))
        .join(
            c2,
            (F.col("_cs") == F.col("source")) & (F.col("_ct") == F.col("token")),
            "left",
        )
        .select(
            "source",
            "token",
            "total",
            (
                F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("total")
            ).alias("f"),
        )
    )
    k = totals.agg(F.count(F.lit(1)).cast("long").alias("ns"))
    mstat = grid.groupBy("token").agg(
        F.sum(F.floor(F.col("f") * 1000000000000.0).cast("long"))
        .cast("long")
        .alias("fsum")
    )
    mu = mstat.crossJoin(F.broadcast(k)).select(
        "token",
        (
            F.col("fsum").cast("double") / 1000000000000.0
            / F.col("ns").cast("double")
        ).alias("mu"),
    )
    mu2 = mu.select(F.col("token").alias("_mt"), "mu")
    sig = (
        grid.join(F.broadcast(mu2), F.col("_mt") == F.col("token"))
        .crossJoin(F.broadcast(k))
        .filter(F.col("ns") >= 2)
        .groupBy("token", "ns")
        .agg(
            F.sqrt(
                F.sum(
                    F.floor(
                        (F.col("f") - F.col("mu"))
                        * (F.col("f") - F.col("mu"))
                        * 1000000000000.0
                    ).cast("long")
                ).cast("double")
                / 1000000000000.0
                / (F.col("ns") - 1).cast("double")
            ).alias("sigma")
        )
        .select(F.col("token").alias("_st"), "sigma")
    )
    z = (
        grid.join(F.broadcast(mu2), F.col("_mt") == F.col("token"))
        .join(F.broadcast(sig), F.col("_st") == F.col("token"))
        .select(
            "source",
            "token",
            F.when(
                F.col("sigma") > 0.0,
                (F.col("f") - F.col("mu")) / F.col("sigma"),
            )
            .otherwise(0.0)
            .alias("z"),
        )
    )
    zb = z.select(
        F.col("source").alias("sb"),
        F.col("token").alias("_zt"),
        F.col("z").alias("_zb"),
    )
    return (
        z.join(zb, (F.col("_zt") == F.col("token")) & (F.col("source") < F.col("sb")))
        .groupBy(F.col("source").alias("sa"), "sb")
        .agg(
            (
                F.sum(
                    F.floor(F.abs(F.col("z") - F.col("_zb")) * 1000000000.0)
                    .cast("long")
                ).cast("double")
                / 1000000000.0
                / 20.0
            ).alias("delta")
        )
    )
