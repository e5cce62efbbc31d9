"""Deterministic sampling and dataset splitting for training-data pipelines.

``df.sample``/``sampleBy`` draw from a partition-order-dependent RNG stream:
the same call can keep different rows after a repartition, a file split
change, or an engine upgrade — unacceptable when a training run must be
reproducible and a holdout set must NEVER leak into train.  Every operator
here instead derives its decision from a content hash of a stable key
(md5 — bit-identical across Spark, DuckDB, and any engine that will ever
read the manifest), so:

- membership is a PURE FUNCTION of the key: stable under repartitioning,
  re-runs, engine changes, and incremental arrival of new data;
- train/val/test are disjoint by construction (disjoint bucket ranges of
  one hash), and adding a fourth split later never reshuffles the first
  three (bucket ranges only subdivide);
- everything is a narrow projection — no shuffle, no sort, no driver RNG
  state; at 100 TB the split is free and pushes down past the scan.

The hash bucket is the integer value of the first 8 hex chars of
``md5(salt || key)`` modulo ``n_buckets`` (default 10_000 → 0.01%
granularity).  The salt decorrelates independent sampling decisions made
from the same key (sampling for eval vs. sampling for dedup audit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default bucket count — 0.01% split granularity
N_BUCKETS = 10_000


def hash_bucket(key: Column | str, n_buckets: int = N_BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 hex chars of
    md5(salt || key) as an integer, mod n_buckets.  Exactly replayable in
    SQL: ``('0x' || substr(md5(salt || key), 1, 8))::BIGINT % n_buckets``."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), k.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_buckets).alias(
        "bucket"
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Assign every row to a named split with the given weights (must sum to
    ≤ 1; any remainder is an implicit last split of the final name).  Splits
    are disjoint, exhaustive, and a pure function of the key — the holdout
    stays the holdout forever, on any engine.

    ``weights`` order matters (dict order = bucket-range order), mirroring
    how the SQL oracle writes its CASE arms.
    """
    bucket = hash_bucket(key_col, n_buckets, salt)
    names = list(weights)
    cum = 0.0
    thresholds: list[tuple[str, int]] = []
    for name in names[:-1]:
        cum += weights[name]
        thresholds.append((name, int(round(cum * n_buckets))))
    # CASE chain in ascending-threshold order: first matching upper bound wins
    expr: Column = F.lit(names[-1])
    for name, upper in reversed(thresholds):
        expr = F.when(bucket < upper, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash — stable under
    repartitioning and re-runs, unlike ``df.sample``."""
    return df.filter(hash_bucket(key_col, n_buckets, salt) < int(round(fraction * n_buckets)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing: keep
    10% of English, 100% of low-resource languages).  The keep decision
    hashes the row key, so each stratum's sample is itself stable; strata
    not listed get ``default_fraction``."""
    bucket = hash_bucket(key_col, n_buckets, salt)
    thresh: Column = F.lit(int(round(default_fraction * n_buckets)))
    for value, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * n_buckets)))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "topk",
) -> DataFrame:
    """Exactly k rows per group (fewer if the group is smaller), chosen by
    ranking on a content hash of the key — the deterministic replacement
    for per-group reservoir sampling (balanced eval subsets, per-source
    caps).  The hash order is uniform and independent of row order, so the
    selection is stable; the key itself breaks hash ties.

    Plan: one window shuffle keyed on the group; Spark plans the rank
    filter as WindowGroupLimit (per-partition top-k below the shuffle), so
    no group's full contents sort globally."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    salt: str = "wsample",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Deterministic importance sampling: keep a row iff its hash bucket
    falls below ``weight`` (a per-row keep probability in [0, 1]).  The
    keep decision is a pure function of (key, weight) — reproducible across
    engines, repartitions, and re-runs, unlike ``df.sample`` whose outcome
    depends on partitioning.  This is the curation primitive for
    quality-weighted corpus resampling (upweight high-quality docs by
    giving them a larger keep probability)."""
    b = hash_bucket(key_col, n_buckets, salt)
    return df.filter(b < (F.col(weight_col) * n_buckets))
