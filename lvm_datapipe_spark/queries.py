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

_DEC_SUM = "CAST(SUM(CAST({x} AS DECIMAL(27,6))) AS DOUBLE)"


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
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
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
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
           COALESCE(list_filter(
             list_transform(
               string_split_regex(regexp_extract(
                 'noise text Answer: ["' || p_name || '", "' || p_type || '"] trailing',
                 'Answer:\\s*\\[(.*?)\\]', 1), '\\s*,\\s*'),
               w -> regexp_replace(trim(w), '["'']', '', 'g')),
             w -> w <> ''), []) AS words
    FROM part
    """,
)
def c7_extract_answer(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    raw = F.concat(
        F.lit('noise text Answer: ["'),
        F.col("p_name"),
        F.lit('", "'),
        F.col("p_type"),
        F.lit('"] trailing'),
    )
    return part.select("p_partkey", S.extract_answer_words(raw).alias("words"))


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
