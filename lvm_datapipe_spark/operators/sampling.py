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


def md5_order(key_col: Column | str, salt: str = "") -> list[Column]:
    """THE canonical deterministic hash-rank ordering: md5 of salt+key
    (string-cast, then binary-cast) ascending, with the key itself as the
    tie-break.  Every SQL-replayed rank selection shares this one recipe —
    its DuckDB twin is ``ORDER BY md5('<salt>' || CAST(key AS VARCHAR)),
    key`` — so the hash expression must never be re-implemented inline
    (a drifted copy, e.g. one missing the binary cast, silently breaks
    the cross-engine replay contract)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary"))
    return [h.asc(), key.asc()]


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
    w = Window.partitionBy(group_col).orderBy(*md5_order(key_col, salt))
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


def dsir_doc_weights(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = ("lang", "source"),
    n_feature_buckets: int = 512,
    salt: str = "dsir",
    bucket_fn=None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    every document by how much more likely its hashed n-gram features are
    under a TARGET corpus (``target_pred`` rows — the quality reference,
    e.g. a wiki-like source) than under the RAW corpus being selected from.
    Selecting the top-weight documents is DSIR's deterministic "selection"
    variant; the paper's Gumbel-noise resampling adds engine-dependent RNG
    for no benefit to a reproducible pipeline.

    Features are unigrams + bigrams hashed into ``n_feature_buckets`` via
    the module's md5 bucket (bit-identical on any engine).  The per-feature
    log-ratio uses INTEGER bit-length log2 — ``L(x) = length(bin(x))`` —
    the same libm-free portability device as text.bigram_lm_surprisal:

        s_b = (L(ct_b + 1) - L(Nt + B)) - (L(cr_b + 1) - L(Nr + B))

    (add-one smoothed target and raw bucket frequencies), and a document's
    weight is the sum of s_b over its feature OCCURRENCES — all exact
    integers end to end.

    Plan shape (scales to 100 TB): one tokenize+hash scan (features never
    materialize per-corpus state beyond B-bucket count tables) → two
    map-side-partial aggregates over AT MOST B rows each → the weight
    table (B rows, two scalar totals folded in) broadcasts back onto the
    feature stream — the scoring join is BROADCAST, zero shuffle — then one
    per-doc aggregate.  Compare CCNet scoring, whose bigram count tables
    are vocab-sized and must meet the stream on a keyed shuffle: hashing
    into fixed B is exactly what makes DSIR cheap at scale.

    ``bucket_fn`` swaps the feature hash: the default md5 bucket is the
    ORACLE-portable choice (DuckDB computes the identical bucket), but md5
    is measured at ~2.5x wall time on the scoring pipeline
    (tools/scale_bench.py section 4: 256 s vs 98 s at 1M docs); production
    runs that do not need a SQL replay should pass
    ``lambda c: F.abs(F.xxhash64(c)) % B`` — xxhash64 is JVM-side
    effectively free, same plan shape, and the fastest scorer measured.

    Returns ``(id_col, *carry_cols, is_target, n_features, weight)`` for
    every document with at least one token.
    """
    from lvm_datapipe_spark.operators.text import tokens

    toks = tokens(F.lower(F.col(text_col)))
    d = df.select(
        id_col, *carry_cols, target_pred.alias("is_target"), toks.alias("toks")
    ).filter(F.size("toks") >= 1)
    bigrams = F.zip_with(
        F.slice(F.col("toks"), F.lit(1), F.greatest(F.size("toks") - 1, F.lit(0))),
        F.slice(F.col("toks"), F.lit(2), F.greatest(F.size("toks") - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = d.select(
        id_col,
        *carry_cols,
        "is_target",
        F.explode(F.concat(F.col("toks"), bigrams)).alias("feat"),
    ).withColumn(
        "fb",
        bucket_fn(F.col("feat"))
        if bucket_fn is not None
        else hash_bucket(F.col("feat"), n_feature_buckets, salt),
    )
    # ONE aggregate pass produces raw and target bucket counts together
    # (conditional sum), and the totals fall out of the B-row table itself —
    # the expensive tokenize+hash feature scan runs exactly twice (counting,
    # scoring).  r11 tried to cut the second scan two ways and BOTH lost the
    # quiet A/B (negative recorded in OPTIMIZATION_r11.md): a per-doc bucket
    # profile aggregate added a keyed shuffle that cost more than the saved
    # scan (2.17 -> 2.86 s bench row), and a plain persist of the hashed
    # feature stream still lost (1.70 vs 1.37 s focused) because the
    # 2.5M-row cache write+read exceeds the recompute of a columnar scan +
    # codegen'd tokenize at this scale.  The recompute IS the optimum here;
    # at shard scale the same trade holds as long as scan+tokenize stays
    # cheaper than materializing the exploded feature stream.
    counts = feats.groupBy("fb").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.col("is_target").cast("long")).alias("ct"),
    )
    totals = counts.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    blen = lambda c: F.length(F.bin(c))  # noqa: E731
    wt = counts.crossJoin(F.broadcast(totals)).select(
        "fb",
        (
            (blen(F.col("ct") + 1) - blen(F.col("nt") + F.lit(n_feature_buckets)))
            - (blen(F.col("cr") + 1) - blen(F.col("nr") + F.lit(n_feature_buckets)))
        ).alias("s"),
    )
    return (
        feats.join(F.broadcast(wt), "fb")
        .groupBy(id_col, *carry_cols, "is_target")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("s").cast("bigint").alias("weight"),
        )
    )
