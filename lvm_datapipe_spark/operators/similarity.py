"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, native Column math (zip_with +
  aggregate fold — stays in codegen, left-to-right fold is bit-deterministic
  and matches the SQL oracle's explicit sum chain);
- embedding-cosine near-dup pairs;
- random-hyperplane LSH bucketing: the scale path — candidates meet only
  inside a bucket, so the join is keyed, not a cross product.

At 100 TB the brute-force variant is only for broadcast-sized query sets
(crossJoin(broadcast(queries)) = one pass over the corpus, no shuffle);
the LSH variant buckets the corpus once and probes per-bucket.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: embedding dimensionality of the driver's tables; flat expressions need it
DEFAULT_DIM = 64


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise products: ((0+x1)+x2)+... — the
    same association order as an explicit x1+x2+... sum, so bit-identical
    to the DuckDB oracle.

    This is the PREFERRED dot for every pairwise hot path.  Measured on the
    bench corpus: inside join stages (where Catalyst pushes the similarity
    filter into the join condition and whole-stage codegen fuses join+project
    into one method) a flattened 64-term expression tree blows janino's
    64 KB method limit, the stage falls back to row-interpreted eval with
    per-node Double boxing, and the query runs 4-6× SLOWER than this fold
    (7.7 s vs 1.35 s on the sf0.1 crossJoin).  The fold stays a single
    compact expression node at any dimensionality — no codegen cliff."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def sql_lit_array(vals) -> str:
    """Literal double array as SQL text.  ``repr()`` doubles round-trip
    bit-exactly through the SQL parser (including scientific notation with
    the D suffix), so the parsed values are identical to the ``F.lit`` form
    and to the oracle's ``!r`` literals."""
    return "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"


def lit_array(vals) -> Column:
    """Literal double array as ONE parsed SQL expression.  Building wide
    literal arrays element-by-element costs a py4j round-trip per element —
    2048 Column constructions for 8 tables × 4 planes × 64 dims, ~2 s of
    pure DRIVER time per query build (measured; execution unaffected)."""
    return F.expr(sql_lit_array(vals))


def sql_fold_dot(vec_sql: str, vals) -> str:
    """``dot(vec, literal_array)`` as SQL text — the same
    aggregate/zip_with fold as :func:`dot` (same association order, same
    ``0.0`` seed → bit-identical), but parsed in ONE py4j call instead of
    ~6 lambda-conversion round-trips per plane.  With 32 planes per LSH
    query the Column-API construction alone cost ~1.5 s of driver time."""
    return (
        f"aggregate(zip_with({vec_sql}, {sql_lit_array(vals)}, "
        "(x, y) -> x * y), 0.0D, (acc, v2) -> acc + v2)"
    )


def dot_flat(a: Column, b: Column, dim: int = DEFAULT_DIM) -> Column:
    """``a[1]*b[1] + a[2]*b[2] + ...`` as a flat left-associated expression
    tree — bit-identical to :func:`dot` (same association order; the fold's
    leading ``0.0 +`` is exact).  Only for narrow Project stages with a
    SINGLE tree (e.g. the norm in :func:`unit_vectors`); see :func:`dot` for
    why join-adjacent paths must use the fold.  ``dim`` MUST equal the array
    length: larger raises INVALID_ARRAY_INDEX, smaller silently truncates."""
    return reduce(
        operator.add,
        [F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)],
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_flat(a: Column, b: Column, dim: int = DEFAULT_DIM) -> Column:
    return dot_flat(a, b, dim) / (
        F.sqrt(dot_flat(a, a, dim)) * F.sqrt(dot_flat(b, b, dim))
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    Plan: one scan of ``emb``, per-row loop over broadcast queries (no
    shuffle), then a per-query top-k window.  Ties broken by neighbor id so
    the result set is deterministic.
    """
    # norms are computed ONCE per side (|queries| + |corpus| folds) instead
    # of per candidate pair — cosine() would re-fold sqrt(dot(v,v)) for both
    # vectors on every crossJoin row (3 interpreted HOF folds per candidate
    # instead of 1).  Same fold, same association order ⇒ identical doubles.
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
        ).withColumn("qn", l2_norm(F.col("qv")))
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("nv")
    ).withColumn("nn", l2_norm(F.col("nv")))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def unit_vectors(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "vn",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Project each vector to unit length ONCE (norm materialized as a row
    column before the per-element divide), so downstream pairwise cosine is
    a single dot instead of three."""
    withnorm = emb.select(
        F.col(id_col), as_double(vec_col).alias("v")
    ).withColumn(
        # fold == flat sum bit-exactly (leading 0.0+ is exact); one parsed
        # expression instead of 64 element_at Column constructions
        "nrm",
        F.expr(
            "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D,"
            " (acc, v2) -> acc + v2))"
        ),
    )
    return withnorm.select(
        F.col(id_col),
        F.expr("transform(v, x -> x / nrm)").alias(out_col),
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """All pairs with cosine ≥ threshold.  Exact (quadratic) form — since
    r5 this is a PYTEST-ONLY recall oracle (tests/test_dedup_similarity):
    no declared query uses it, because the corpus×corpus crossJoin cannot
    survive a large corpus; every declared dedup path runs
    :func:`lsh_near_dup_pairs`.  Normalize-first: n² pairs each cost one
    64-element dot, not three.

    The unit-vector table is PERSISTED: without the barrier, projection
    collapse inlines ``transform(v, x/nrm)`` into every ``element_at`` of
    the pairwise dot, recomputing the whole normalization per term (measured
    ~10× slowdown).  Callers free it via
    :func:`lvm_datapipe_spark.operators.dedup.release`."""
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    u = unit_vectors(emb, id_col, vec_col, dim=dim).persist()
    a = u.select(F.col(id_col).alias("id_a"), F.col("vn").alias("va"))
    b = u.select(F.col(id_col).alias("id_b"), F.col("vn").alias("vb"))
    out = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", dot(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
    return _with_cached_deps(out, [u])


def hyperplane_lsh_buckets(
    emb: DataFrame,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign) LSH: bucket = the sign-bit string of the
    vector against ``n_planes`` seeded Gaussian hyperplanes.  Cosine-similar
    vectors collide with probability (1 - θ/π)^n_planes.

    Planes are deterministic (numpy PCG64 with fixed seed) and embedded as
    literal arrays — the dot products run as native fold expressions in
    codegen, no Python at execution time.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    # fold-based dot per plane: n_planes flat trees in one projection exceed
    # janino's 64 KB method limit (codegen failure → interpreted fallback for
    # the whole stage); the fold stays compact at any plane count, and bucket
    # assignment runs once per corpus row, not per candidate pair.  The whole
    # bucket string is ONE parsed expression (see sql_fold_dot).
    bits = ", ".join(_sql_sign_bit(p) for p in planes)
    return emb.select(F.col(id_col), as_double(vec_col).alias("_v")).select(
        F.col(id_col), F.expr(f"concat({bits})").alias("bucket")
    )


def _sql_sign_bit(plane) -> str:
    return (
        f"(CASE WHEN {sql_fold_dot('_v', plane)} >= 0.0D THEN '1' ELSE '0' END)"
    )


def lsh_table_planes(n_planes: int, n_tables: int, dim: int, seed: int) -> list:
    """The deterministic hyperplane sets for multi-table LSH: table t uses
    ``n_planes`` Gaussian planes drawn from numpy PCG64 with seed ``seed+t``.
    Exposed so the SQL oracle can replay the exact same literals."""
    import numpy as np

    return [
        np.random.default_rng(seed + t).standard_normal((n_planes, dim))
        for t in range(n_tables)
    ]


def auto_n_planes(n_rows: int, target_occupancy: int = 100, p_max: int = 16) -> int:
    """The measured sizing rule (SCALE_BENCH.md §1): smallest ``p ≥ 4`` with
    ``2^p * target_occupancy ≥ n`` (i.e. ceil(log2(n/target)), floored at the
    fixture-tuned 4 and capped at ``p_max``).  Keeps per-table bucket
    occupancy ~constant so the candidate join stays near-linear instead of
    degrading toward n²/2^planes.

    Deliberately INTEGER math (no log2): the DuckDB oracle replays the same
    decision from COUNT(*) via ``(1 << p) * target >= n`` over a tiny range
    scan, which is bit-portable where float log2 near exact powers of two is
    not.  numpy's per-table plane draws are PREFIX-STABLE in ``p``
    (standard_normal fills C-order), so a ``p``-bit bucket is exactly the
    first ``p`` bits of the ``p_max``-bit bucket — the oracle embeds
    ``p_max`` planes as literals and takes a substring prefix."""
    p = 4
    while p < p_max and (1 << p) * target_occupancy < n_rows:
        p += 1
    return p


def lsh_ann_candidates(
    emb: DataFrame,
    n_planes: int | None = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedup: bool = True,
) -> DataFrame:
    """Multi-table hyperplane LSH: candidates over ``n_tables`` independent
    plane sets to trade compute for recall.  Output: distinct (id_a < id_b)
    candidate pairs — feed to exact cosine for verification.  With
    ``dedup=False`` the pairs keep one row per bucket collision (a pair
    colliding in k tables appears k times): a verifier that filters to a
    small survivor set can dedup AFTER its filter far cheaper than
    shuffling the full candidate set here (the cos_sim it attaches is a
    pure function of the pair, so post-filter distinct is set-identical).

    Plan shape: ONE corpus scan computes every table's bucket key
    (n_tables × n_planes literal-plane dot folds, all codegen), explodes to
    (id, table, bucket) rows, and self-equi-joins on (table, bucket) — one
    scan and one keyed shuffle instead of a scan+join per table.  The bucket
    KEY is the sign bits packed into one BIGINT (bit i = plane i) rather
    than a '0'/'1' string — a bijection for a fixed plane count, so the
    grouping is identical, but the shuffle key is 8 fixed bytes instead of
    an n_planes-char string (measured 1.3× on the candidate join).  The
    bucket table is persisted (both join sides read it); callers free it
    with :func:`lvm_datapipe_spark.operators.dedup.release`.
    """
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    if n_planes is None:
        # production auto-sizing: ONE metadata-sized count decides the
        # plane budget (the IVF-probe rule: scalar driver decisions are
        # fine, data never is).  Pass an explicit n_planes where the query
        # must be statically oracle-replayable (the declared queries do).
        n_planes = auto_n_planes(emb.count())
    entries = []
    # fold dots for the plane literals — see hyperplane_lsh_buckets for the
    # janino 64 KB rationale (n_tables × n_planes flat trees in one
    # expression is a guaranteed codegen failure).  All tables' buckets are
    # ONE parsed expression: the Column-API form cost ~1.5 s of driver-side
    # py4j/lambda construction PER QUERY BUILD at 8×4×64 (see sql_fold_dot).
    for t, planes in enumerate(lsh_table_planes(n_planes, n_tables, dim, seed)):
        bits = " + ".join(
            f"(CASE WHEN {sql_fold_dot('_v', p)} >= 0.0D THEN {1 << i}L ELSE 0L END)"
            for i, p in enumerate(planes)
        )
        entries.append(f"struct({t} AS tbl, ({bits}) AS bucket)")
    buckets = (
        emb.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .select(
            F.col(id_col),
            F.explode(F.expr("array(" + ",".join(entries) + ")")).alias("tb"),
        )
        .select(id_col, "tb.tbl", "tb.bucket")
        .persist()
    )
    a = buckets.select(F.col(id_col).alias("id_a"), "tbl", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "tbl", "bucket")
    out = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if dedup:
        out = out.distinct()
    return _with_cached_deps(out, [buckets])


def lsh_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    **lsh_kwargs,
) -> DataFrame:
    """Scale-path near-dup: LSH candidates → exact cosine verify.  Recall is
    probabilistic (tunable via n_planes/n_tables) but DETERMINISTIC given the
    fixed seed — the candidate set is reproducible, so the whole pipeline is
    oracle-checkable; precision is exact (every emitted cos_sim is the true
    cosine).  Verify normalizes each vector ONCE (|corpus| rows, persisted —
    see :func:`embedding_near_dup_pairs` for why the barrier matters) so the
    per-candidate work is a single flat dot, not three.

    SIZING RULE (measured, SCALE_BENCH.md §1): keep per-table bucket
    occupancy roughly constant by growing ``n_planes`` ≈ log2(n/100) with
    the corpus.  The defaults (4 planes = 16 buckets/table) are tuned for
    the sf0.1 fixtures; left fixed, occupancy grows linearly with n and the
    candidate set degrades toward n²/16 — the scale bench shows the
    superlinear wall.  Recall lost to narrower buckets is rebuilt by the
    independent tables (``n_tables=12`` held ~0.9 pair recall at the 0.9
    threshold in the measured runs)."""
    from lvm_datapipe_spark.operators.dedup import _CACHED_DEPS_ATTR, _with_cached_deps

    # dedup AFTER the exact-cosine filter: the candidate multiset (one row
    # per bucket collision) goes straight into the verify joins, and the
    # distinct runs over the tiny threshold-survivor set instead of
    # shuffling the full candidate set first.  cos_sim is a pure function
    # of the pair, so the result set is identical (measured 1.75× with the
    # int bucket keys at sf0.1, where 2k vectors make 1.5M collisions).
    cand = lsh_ann_candidates(
        emb, id_col=id_col, vec_col=vec_col, dim=dim, dedup=False, **lsh_kwargs
    )
    u = unit_vectors(emb, id_col, vec_col, dim=dim).persist()
    a = u.select(F.col(id_col).alias("id_a"), F.col("vn").alias("va"))
    b = u.select(F.col(id_col).alias("id_b"), F.col("vn").alias("vb"))
    out = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cos_sim", dot(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
        .distinct()
    )
    return _with_cached_deps(out, getattr(cand, _CACHED_DEPS_ATTR, []) + [u])


def ivf_fixed_centroids(n_cells: int, dim: int, seed: int):
    """Seeded Gaussian coarse-quantizer centroids (numpy PCG64) — a FIXED
    quantizer whose cell assignment is a pure expression of the input
    vector, so the whole IVF pipeline is deterministic and SQL-replayable
    (unlike k-means, whose result depends on partitioning/iteration order).
    Quality sits between random projection and trained k-means; the trained
    variant remains :func:`ivf_index`/:func:`ivf_topk`."""
    import numpy as np

    return np.random.default_rng(seed).standard_normal((n_cells, dim))


def _ivf_cell_sims_sql(n_cells: int, dim: int, seed: int, vec: str, norm: str) -> str:
    """Per-cell cosine array as ONE parsed expression.  Fold-based dot per
    centroid: n_cells flat dot trees in one projection blow janino's 64 KB
    method limit, the fold stays compact; the norm is materialized as a row
    column shared across all cells (see sql_fold_dot)."""
    cents = ivf_fixed_centroids(n_cells, dim, seed)
    # centroid norms as Python-side left-assoc sums — same doubles as the
    # engine folding the literal array, constant for the whole query
    cells = ",".join(
        f"({sql_fold_dot(vec, c)}) / ({norm} * sqrt({sum(float(x) * float(x) for x in c)!r}D))"
        for c in cents
    )
    return f"array({cells})"


def ivf_fixed_assign(
    emb: DataFrame,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "neighbor_id",
    keep_norm: bool = False,
) -> DataFrame:
    """Corpus side of IVF: (id, vector, cell) with cell = argmax-cosine
    centroid (first index on ties) — one scan, no shuffle.

    ``keep_norm=True`` retains the already-computed ``vnorm`` column so a
    downstream exact-cosine verify can divide by it instead of re-folding
    sqrt(dot(nv, nv)) per candidate pair (dot_flat is bit-identical to the
    fold — same association order)."""
    out = (
        emb.select(F.col(id_col).alias(out_id), as_double(vec_col).alias("nv"))
        .withColumn("vnorm", F.sqrt(dot_flat(F.col("nv"), F.col("nv"), dim)))
        .withColumn(
            "sims", F.expr(_ivf_cell_sims_sql(n_cells, dim, seed, "nv", "vnorm"))
        )
        .withColumn(
            "cell", (F.expr("array_position(sims, array_max(sims))") - 1).cast("int")
        )
        .drop("sims")
    )
    return out if keep_norm else out.drop("vnorm")


def _ivf_probe_cells(
    queries: DataFrame,
    n_cells: int,
    dim: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Query side of IVF: (query_id, qv, qn, cell, cell_sim) — one row per
    (query, cell), ranked downstream to the n_probe best.  ``qn`` is the
    query norm, carried so the exact verify divides by it instead of
    re-folding it per candidate (dot_flat == the fold bit for bit)."""
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    return q.withColumn(
        "vnorm", F.sqrt(dot_flat(F.col("qv"), F.col("qv"), dim))
    ).select(
        "query_id",
        "qv",
        F.col("vnorm").alias("qn"),
        F.posexplode(
            F.expr(_ivf_cell_sims_sql(n_cells, dim, seed, "qv", "vnorm"))
        ).alias("cell", "cell_sim"),
    )


def ivf_fixed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over the FIXED quantizer: assign each corpus vector to the
    argmax-cosine centroid cell (first index on ties), probe the ``n_probe``
    best cells per query, exact-rank inside them.  Every step is a
    deterministic expression over literals — fully oracle-checkable.

    Scale shape: assignment is one scan (16 literal-dot folds in codegen);
    the probe join is keyed on the cell (at 100 TB, PARTITION the stored
    corpus by cell so probing is partition pruning, not a shuffle)."""
    corpus = ivf_fixed_assign(
        emb, n_cells, dim, seed, id_col, vec_col, out_id="neighbor_id",
        keep_norm=True,
    )
    qs = _ivf_probe_cells(queries, n_cells, dim, seed, id_col, vec_col)
    wp = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("cell"))
    probe = (
        qs.withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )
    cand = corpus.join(probe, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # norms ride the rows (computed once per vector in assign/probe) —
    # cosine() would re-fold both sqrt(dot(v, v)) terms per candidate; the
    # division below is the identical double arithmetic (guide §1.2)
    scored = cand.withColumn(
        "cos_sim",
        dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("vnorm")),
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_write_store(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as a CELL-PARTITIONED parquet store — the
    100 TB form: probing n_probe of n_cells then reads ~n_probe/n_cells of
    the corpus via directory-level partition pruning (PartitionFilters in
    the scan), instead of scanning everything and filtering."""
    from lvm_datapipe_spark.sources.sinks import write_partitioned

    assigned = ivf_fixed_assign(
        emb, n_cells, dim, seed, id_col, vec_col, out_id="neighbor_id"
    )
    write_partitioned(assigned, path, ["cell"])


def ivf_topk_from_store(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k against a :func:`ivf_write_store` store.  The probed cell
    set (≤ |queries|·n_probe distinct ints — metadata-sized) is collected
    and pushed as a literal IN-filter so Catalyst prunes the cell
    directories at the scan; identical results to :func:`ivf_fixed_topk`
    on the same corpus."""
    qs = _ivf_probe_cells(queries, n_cells, dim, seed, id_col, vec_col)
    wp = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("cell"))
    probe = (
        qs.withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    cells = sorted(r.cell for r in probe.select("cell").distinct().collect())
    corpus = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    cand = corpus.join(probe, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn("cos_sim", cosine(F.col("qv"), F.col("nv")))
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# -- IVF (inverted-file) ANN -------------------------------------------------


def ivf_index(
    emb: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Coarse quantizer: k-means (MLlib, fixed seed) over the corpus; every
    vector is assigned to its nearest centroid's cell.  Returns the
    cell-assigned corpus and the centroid list.

    At 100 TB: train on a sample, assign in one scan, and PARTITION the
    stored table by cell — each query then reads only n_probe cells
    (partition pruning does the candidate selection).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    vecs = (
        emb.select(F.col(id_col), as_double(vec_col).alias("v"))
        # a NULL vector cannot be assigned to a cell (and crashes the
        # KMeans fit) — un-indexable rows are dropped, matching the
        # brute-force/LSH paths where a null cosine filters out
        .filter(F.col("v").isNotNull())
        .withColumn("features", array_to_vector(F.col("v")))
    )
    n = vecs.count()
    if n == 0:
        # MLlib KMeans cannot fit zero rows; an empty corpus has a
        # well-defined IVF answer (no cells, no candidates) — return it
        # instead of an opaque fit error
        empty = vecs.select(id_col, "v", F.lit(0).alias("cell")).limit(0)
        return empty, []
    if n == 1:
        # KMeans also rejects k=1; one row IS its own (only) centroid
        row = vecs.select(id_col, "v").first()
        return (
            vecs.select(id_col, "v", F.lit(0).alias("cell")),
            [[float(x) for x in row["v"]]],
        )
    km = KMeans(
        k=min(n_cells, n), seed=seed, featuresCol="features",
        predictionCol="cell",
    )
    model = km.fit(vecs)
    assigned = model.transform(vecs).select(id_col, "v", "cell")
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``n_probe`` cells whose
    centroids are most cosine-similar to the query, then exact-rank inside
    them.  Work per query drops from |corpus| to ~|corpus|·n_probe/n_cells;
    recall is tunable via n_probe (n_probe = n_cells → exact).
    """
    assigned, centroids = ivf_index(emb, n_cells, seed, id_col, vec_col)

    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    if not centroids:  # empty corpus: no cells, no neighbors
        return q.select(
            "query_id",
            F.col("query_id").alias("neighbor_id"),
            F.lit(0).alias("rank"),
        ).limit(0)
    cent_rows = [(i, c) for i, c in enumerate(centroids)]
    cents = q.sparkSession.createDataFrame(cent_rows, ["cell", "centroid"]).withColumn(
        "centroid", F.col("centroid").cast("array<double>")
    )
    # rank cells per query by centroid cosine; keep the n_probe best
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "cell_sim", cosine(F.col("qv"), F.col("centroid"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("cell"))
    probe = (
        qc.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    # candidates = corpus rows in probed cells only (at scale: partition
    # pruning on the cell column), then exact cosine rank.  Norms are folded
    # once per vector on each side instead of per candidate row — identical
    # doubles (dot/l2_norm share one association order), a third of the
    # per-candidate HOF work (guide §1.2)
    assigned = assigned.withColumn("_vn", l2_norm(F.col("v")))
    probe = probe.withColumn("_qn", l2_norm(F.col("qv")))
    cand = assigned.join(probe, "cell").filter(F.col(id_col) != F.col("query_id"))
    scored = cand.withColumn(
        "cos_sim",
        dot(F.col("qv"), F.col("v")) / (F.col("_qn") * F.col("_vn")),
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_levels: int = 127,
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the storage format a
    100 TB vector corpus actually persists (4× smaller than float32, 8× vs
    float64; recall loss negligible for near-dup/ANN workloads).

    scale = max|x| / n_levels;  q_i = clamp(floor(x_i/scale + 0.5), ±n_levels)

    floor(x+0.5) is used instead of round() deliberately: round() half-even
    vs half-up semantics differ between engines, floor does not — every step
    (abs-max, divide, floor, clamp, int cast) is bit-portable, so the
    quantized codes are oracle-checkable.  Zero vectors quantize to all-zero
    codes with scale 0 (guarded, no division).  One narrow projection — no
    shuffle, runs at scan speed.
    """
    v = as_double(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / float(n_levels)
    lv = float(n_levels)
    q = F.when(scale == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.least(
                F.greatest(F.floor(x / scale + 0.5), F.lit(-lv)), F.lit(lv)
            ).cast("int"),
        )
    )
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("q"),
    )


def dequantize(q: Column, scale: Column) -> Column:
    """Reconstruct approximate doubles from int codes: q_i * scale."""
    return F.transform(q, lambda x: x.cast("double") * scale)


# -- product quantization (PQ) -----------------------------------------------


def pq_codebooks(m: int, ksub: int, dsub: int, seed: int):
    """Seeded Gaussian PQ codebooks, shape (m, ksub, dsub) — a FIXED
    quantizer in the ivf_fixed_centroids spirit: every code assignment is
    a pure expression of the input vector, so encode + ADC search are
    deterministic and SQL-replayable (a trained k-means codebook would
    depend on partitioning/iteration order).  m subvectors × ksub
    centroids compress a dim-double vector to m small ints — at 100 TB
    the 64-dim float corpus (256 B/vec) becomes m bytes/vec (8× at the
    m=32 default, 32× at m=8), which is what makes exhaustive ADC
    ranking affordable as a scan.  The m=32/ksub=8 default is the
    measured recall sweet spot for untrained codebooks on this corpus
    (recall@10 ≈ 0.4 vs 0.24 at m=8/ksub=16 — finer subvectors forgive
    random centroids more than wider codebooks do).

    Draws are scaled to 1/sqrt(m·dsub): for UNIT-NORM embeddings (this
    corpus) each component is ~N(0, 1/dim), so matching the codebook
    spread to the data spread keeps the 16 centroids discriminative —
    unscaled N(0,1) centroids all sit far outside the data shell and
    every subvector collapses onto the nearest-to-origin code (measured:
    recall@10 0.04 unscaled → ~0.5 scaled)."""
    import numpy as np

    dim = m * dsub
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, ksub, dsub)) / float(np.sqrt(dim))


def _pq_code_col(cb_j, j: int, dsub: int) -> Column:
    """code_j = argmin-distance centroid index for subvector j (first
    index on ties — the array_position convention), as one Column."""
    d = _pq_dists_sql("nv", j, cb_j, dsub)
    return (F.expr(f"array_position({d}, array_min({d}))") - 1).cast("int")


def _pq_dists_sql(vec_sql: str, j: int, cb_j, dsub: int) -> str:
    """Per-centroid squared-L2 array for subvector j as ONE parsed
    expression: ksub compact zip_with folds over slice(vec) — the same
    janino-safe shape as _ivf_cell_sims_sql (flat 8-term trees × 128
    centroids would blow the 64 KB method limit)."""
    start = j * dsub + 1
    cells = ",".join(
        f"aggregate(zip_with(slice({vec_sql}, {start}, {dsub}), "
        + "array(" + ",".join(f"{float(c)!r}D" for c in cent) + "), "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v)"
        for cent in cb_j
    )
    return f"array({cells})"


def _pq_cb_sql(cbs) -> str:
    """The whole (m, ksub, dsub) codebook as ONE literal nested-array SQL
    text (array<array<array<double>>>) — a single constant in the plan
    instead of m*ksub scattered literal arrays."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(sql_lit_array(cent) for cent in cb_j) + ")"
            for cb_j in cbs
        )
        + ")"
    )


def _pq_dists_j_sql(vec_sql: str, cbs, j_sql: str, dsub: int) -> str:
    """Per-centroid squared-L2 array for the RUNTIME subvector index
    ``j_sql`` — the same slice/zip_with/aggregate fold (same association
    order, same 0.0 seed) as :func:`_pq_dists_sql`, but with the
    subvector index as an expression so one nested ``transform`` covers
    all m subspaces."""
    return (
        f"transform(element_at({_pq_cb_sql(cbs)}, {j_sql} + 1), cent -> "
        f"aggregate(zip_with(slice({vec_sql}, {j_sql} * {dsub} + 1, {dsub}),"
        " cent, (x, y) -> (x - y) * (x - y)), 0.0D, (acc, v2) -> acc + v2))"
    )


def _pq_codes_sql(vec_sql: str, cbs, m: int, dsub: int) -> str:
    """All m PQ codes as ONE array<int> expression (argmin with the
    array_position first-index-on-ties convention — element-identical to
    m :func:`_pq_code_col` columns; pinned by tests).  Collapsing the m
    literal-heavy code columns into a single nested transform cuts the
    analyzer/codegen surface ~m-fold — measured 7.7 → 3.1 s on the
    declared IVF-PQ query at sf0.1, where per-stage planning and janino
    compilation of 64 giant expression trees dominated (guide §7.3)."""
    d = _pq_dists_j_sql(vec_sql, cbs, "j", dsub)
    return (
        f"transform(sequence(0, {m - 1}), j -> "
        f"cast(array_position({d}, array_min({d})) - 1 as int))"
    )


def _pq_luts_sql(vec_sql: str, cbs, m: int, dsub: int) -> str:
    """All m per-centroid LUTs as ONE array<array<double>> expression —
    value-identical to the m ``lut_j`` columns (same fold)."""
    return (
        f"transform(sequence(0, {m - 1}), j -> "
        f"{_pq_dists_j_sql(vec_sql, cbs, 'j', dsub)})"
    )


#: ADC distance over the nested columns: ((0.0 + t_0) + t_1) + ... is
#: bit-identical to the old t_0 + t_1 + ... left-associated column sum
#: (the leading 0.0 + is exact).
_PQ_ADC_DIST_SQL = (
    "aggregate(zip_with(luts, codes, (l, c) -> element_at(l, c + 1)), "
    "0.0D, (acc, v2) -> acc + v2)"
)


def pq_encode(
    emb: DataFrame,
    m: int = 32,
    ksub: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "neighbor_id",
) -> DataFrame:
    """PQ-encode the corpus: (id, code_0 … code_{m-1}) with code_j =
    argmin squared-L2 centroid of subvector j (first index on ties, the
    array_position convention shared with IVF).  One scan, no shuffle —
    codes are narrow int columns, the 100 TB-friendly storage layout."""
    dsub = dim // m
    cbs = pq_codebooks(m, ksub, dsub, seed)
    out = emb.select(F.col(id_col).alias(out_id), as_double(vec_col).alias("nv"))
    # ONE select for all m codes: m chained withColumns each re-run the
    # analyzer over a growing plan (quadratic in m on these literal-heavy
    # trees — measured ~2 s of pure driver time at m=32); the expressions
    # and the optimized plan are identical (r10-opt, guide §1.2)
    return out.select(
        out_id,
        *[
            _pq_code_col(cbs[j], j, dsub).alias(f"code_{j}")
            for j in range(m)
        ],
    )


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 32,
    ksub: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: queries keep full precision, the
    corpus is ranked through its PQ codes — approx ||q − x||² = Σ_j
    lut_j[code_j] with lut_j the query's per-centroid distance table for
    subvector j.

    Scale shape: the corpus side touches ONLY the m int codes (a scan of
    the 8-byte-per-vector code table — this is PQ's whole point); the
    query side (tiny) computes its m×ksub LUT once per query and
    BROADCASTS, so the per-pair distance is m flat element_at lookups in
    whole-stage codegen; one query-keyed window takes the top-k.  Exclude
    self-matches; ties break to the lower neighbor id."""
    dsub = dim // m
    cbs = pq_codebooks(m, ksub, dsub, seed)
    # nested single-expression codes/LUTs (see _pq_codes_sql): element-
    # identical to the m-column pq_encode/lut_j form, ~m-fold less
    # analyzer/codegen surface
    codes = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("nv")
    ).select(
        "neighbor_id", F.expr(_pq_codes_sql("nv", cbs, m, dsub)).alias("codes")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).select(
        "query_id", F.expr(_pq_luts_sql("qv", cbs, m, dsub)).alias("luts")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        codes.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_dist", F.expr(_PQ_ADC_DIST_SQL))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 32,
    ksub: int = 8,
    dim: int = 64,
    ivf_seed: int = 42,
    pq_seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the FAISS-standard production ANN layout, composed from
    the two fixed quantizers already in this module: the IVF coarse cells
    prune WHICH corpus slices each query touches (partition pruning at
    the store level, a keyed equi-join here), and PQ codes compress WHAT
    is read per candidate (m bytes instead of the full vector).  Corpus
    side: one scan computes cell + codes (no shuffle); query side probes
    its n_probe best cells and broadcasts per-subvector LUTs; candidates
    rank by ADC distance inside probed cells only.  Both quantizers are
    seeded literals, so the full pipeline stays SQL-replayable."""
    dsub = dim // m
    cbs = pq_codebooks(m, ksub, dsub, pq_seed)
    corpus = ivf_fixed_assign(emb, n_cells, dim, ivf_seed, id_col, vec_col)
    # nested single-expression codes/LUTs (see _pq_codes_sql): element-
    # identical to the m-column form, ~m-fold less analyzer/codegen
    # surface — measured 7.7 → 3.1 s on the declared query at sf0.1
    corpus = corpus.select(
        "neighbor_id",
        "cell",
        F.expr(_pq_codes_sql("nv", cbs, m, dsub)).alias("codes"),
    )
    qs = _ivf_probe_cells(queries, n_cells, dim, ivf_seed, id_col, vec_col)
    wp = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("cell"))
    probe = (
        qs.withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    probe = probe.select(
        "query_id",
        "cell",
        F.expr(_pq_luts_sql("qv", cbs, m, dsub)).alias("luts"),
    )
    wr = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        corpus.join(F.broadcast(probe), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_dist", F.expr(_PQ_ADC_DIST_SQL))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def ivfpq_write_store(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 32,
    ksub: int = 8,
    dim: int = 64,
    ivf_seed: int = 42,
    pq_seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF-PQ index as a cell-partitioned CODE store —
    the full 100 TB layout: directory-level cell pruning (IVF) over rows
    holding only the id + m int codes (PQ), so a probe reads
    ~n_probe/n_cells of an already-32×-compressed table.  The raw
    vectors stay in the source table; re-ranking the final candidates
    against them is a keyed join by id."""
    from lvm_datapipe_spark.sources.sinks import write_partitioned

    dsub = dim // m
    cbs = pq_codebooks(m, ksub, dsub, pq_seed)
    corpus = ivf_fixed_assign(emb, n_cells, dim, ivf_seed, id_col, vec_col)
    corpus = corpus.select(
        "neighbor_id",
        "cell",
        *[_pq_code_col(cbs[j], j, dsub).alias(f"code_{j}") for j in range(m)],
    )
    write_partitioned(corpus, path, ["cell"])


def ivfpq_topk_from_store(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 32,
    ksub: int = 8,
    dim: int = 64,
    ivf_seed: int = 42,
    pq_seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ top-k against an :func:`ivfpq_write_store` store: the probed
    cell set (metadata-sized) pushes as a literal IN-filter so the scan
    prunes cell directories (PartitionFilters), and ranking is pure ADC
    over the stored codes.  Identical results to :func:`ivfpq_topk` on
    the same corpus."""
    dsub = dim // m
    cbs = pq_codebooks(m, ksub, dsub, pq_seed)
    qs = _ivf_probe_cells(queries, n_cells, dim, ivf_seed, id_col, vec_col)
    wp = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("cell"))
    probe = (
        qs.withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    probe = probe.select(
        "query_id",
        "cell",
        *[
            F.expr(_pq_dists_sql("qv", j, cbs[j], dsub)).alias(f"lut_{j}")
            for j in range(m)
        ],
    )
    cells = sorted(r.cell for r in probe.select("cell").distinct().collect())
    corpus = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    dist = None
    for j in range(m):
        t = F.expr(f"element_at(lut_{j}, code_{j} + 1)")
        dist = t if dist is None else dist + t
    wr = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        corpus.join(F.broadcast(probe), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_dist", dist)
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def semdedup_keep(
    emb: DataFrame,
    eps: float = 0.4,
    n_cells: int = 16,
    dim: int = DEFAULT_DIM,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    by clustering embeddings, then dropping within-cluster items whose cosine
    to another cluster member exceeds ``eps``, keeping — per the paper's
    best-performing variant — the member with the LOWEST similarity to its
    centroid.

    This implementation uses the repo's FIXED coarse quantizer
    (:func:`ivf_fixed_centroids`) instead of trained k-means so the whole
    pipeline is a deterministic expression over literals and fully
    oracle-checkable; the trained quantizer drops in via :func:`ivf_index`
    without changing the plan shape.  The paper's per-cluster duplicate-group
    reduction is expressed as a deterministic DOMINANCE rule: a vector is
    removed iff some same-cell neighbor with cosine >= eps has strictly lower
    centroid-similarity (ties broken by lower id).  Chains (a~b~c with a!~c)
    may keep more than one representative — the connected-components-exact
    variant is ``lsh_near_dup_pairs`` + ``graph.connected_components``.

    Plan shape (scales to 100 TB): cell assignment is one scan (n_cells
    literal-dot folds in codegen, no shuffle); candidate pairs meet on a
    cell equi-self-join — pair blow-up is bounded by cell size (size cells
    via n_cells ~ corpus/target_cell_size, as SemDeDup does with k=50000 for
    LAION), never corpus x corpus; the removal set is a keyed anti-join.

    Returns ``(vec_id, cell, centroid_sim, keep)`` for every input vector.
    """
    from lvm_datapipe_spark.operators.dedup import _with_cached_deps

    a = (
        emb.select(F.col(id_col).alias("vec_id"), as_double(vec_col).alias("v"))
        .withColumn("nrm", F.sqrt(dot_flat(F.col("v"), F.col("v"), dim)))
        .withColumn("sims", F.expr(_ivf_cell_sims_sql(n_cells, dim, seed, "v", "nrm")))
        .withColumn(
            "cell", (F.expr("array_position(sims, array_max(sims))") - 1).cast("int")
        )
        .withColumn("centroid_sim", F.array_max("sims"))
        .withColumn("vn", F.expr("transform(v, x -> x / nrm)"))
        .select("vec_id", "cell", "centroid_sim", "vn")
        # the assignment scan (n_cells literal-dot folds per row) feeds both
        # sides of the pair join AND the final output — persist so it runs
        # once, not three times (measured 6.6 s -> ~4 s at sf0.1)
        .persist()
    )
    lhs = a.select(
        F.col("vec_id").alias("id_a"),
        "cell",
        F.col("centroid_sim").alias("cs_a"),
        F.col("vn").alias("va"),
    )
    rhs = a.select(
        F.col("vec_id").alias("id_b"),
        "cell",
        F.col("centroid_sim").alias("cs_b"),
        F.col("vn").alias("vb"),
    )
    removed = (
        lhs.join(rhs, "cell")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(dot(F.col("va"), F.col("vb")) >= F.lit(eps))
        .filter(
            (F.col("cs_a") < F.col("cs_b"))
            | ((F.col("cs_a") == F.col("cs_b")) & (F.col("id_a") < F.col("id_b")))
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_removed", F.lit(True))
    )
    out = a.join(removed, "vec_id", "left").select(
        "vec_id", "cell", "centroid_sim", F.col("_removed").isNull().alias("keep")
    )
    return _with_cached_deps(out, [a])


def icl_chain_order(
    emb: DataFrame,
    n_cells: int = 16,
    dim: int = DEFAULT_DIM,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """In-Context Pretraining document ordering (Shi et al. 2023,
    arXiv:2310.10638): place semantically related documents next to each
    other in the training stream by traversing each similarity cluster as a
    greedy nearest-neighbor path.  Cells come from the repo's FIXED coarse
    quantizer (deterministic, SQL-replayable — the SemDeDup choice); within
    each cell the chain starts at the lowest id and repeatedly hops to the
    most-similar unvisited member (ties to the lower id), which is the
    paper's degree-bounded graph traversal specialized to a path.

    Returns ``(vec_id, cell, pos)`` — pos is the document's slot in its
    cell's stream; a dataloader concatenates cells in cell order.

    Plan shape: cell assignment is the one-scan literal-dot fold shared with
    the IVF/SemDeDup family (no shuffle); the traversal is ONE
    ``applyInPandas`` over cell groups — per-cell cost is O(cell² · dim),
    which is the published algorithm's cost model, and cell size is
    controlled by n_cells exactly as in SemDeDup (k=50000 for LAION-scale).
    The UDF computes every dot as an explicit LEFT-ASSOCIATED fold so the
    comparisons that drive the traversal are bit-identical to the SQL
    oracle's fold — the ordering is reproducible across engines, batch
    sizes, and partitionings.
    """
    import pandas as pd

    a = (
        emb.select(F.col(id_col).alias("vec_id"), as_double(vec_col).alias("v"))
        # a NULL vector cannot join a similarity chain — drop it, matching
        # the ivf_index null-payload rule
        .filter(F.col("v").isNotNull())
        .withColumn("nrm", F.sqrt(dot_flat(F.col("v"), F.col("v"), dim)))
        .withColumn("sims", F.expr(_ivf_cell_sims_sql(n_cells, dim, seed, "v", "nrm")))
        .withColumn(
            "cell", (F.expr("array_position(sims, array_max(sims))") - 1).cast("int")
        )
        .withColumn("vn", F.expr("transform(v, x -> x / nrm)"))
        .select("vec_id", "cell", "vn")
    )

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # Vectorized greedy walk, bit-identical to the scalar left-fold scan:
        # the per-candidate dot is row-wise cumsum(x*y)[-1] — numpy's cumsum
        # accumulates STRICTLY sequentially (unlike add.reduce/np.dot, which
        # use pairwise/blocked summation), so each value equals the scalar
        # ((0.0+p0)+p1)+... fold double for double; and np.argmax takes the
        # FIRST occurrence of the max over ascending-id rows, which is
        # exactly the old "first strict improvement wins" tie rule.  The
        # per-cell cost drops from interpreted O(cell²·dim) Python to
        # vectorized numpy (measured ~5× on the declared corpus).
        srt = pdf.sort_values("vec_id")
        ids = srt["vec_id"].to_numpy()
        mat = np.array([list(v) for v in srt["vn"]], dtype=np.float64)
        n = len(ids)
        alive = np.ones(n, dtype=bool)
        alive[0] = False  # ascending sort ⇒ row 0 is min(ids), the seed
        order = [int(ids[0])]
        curv = mat[0]
        for _ in range(n - 1):
            idxs = np.nonzero(alive)[0]
            dots = np.cumsum(mat[idxs] * curv, axis=1)[:, -1]
            if np.isnan(dots).any():
                # NaN ordering under the scalar scan ("c > best is False for
                # NaN") differs from argmax's NaN propagation — replay the
                # exact scan for this step (never taken on finite inputs)
                best_j, best_c = 0, dots[0]
                for jj in range(1, len(dots)):
                    if dots[jj] > best_c:
                        best_j, best_c = jj, dots[jj]
                j = idxs[best_j]
            else:
                j = idxs[int(np.argmax(dots))]
            order.append(int(ids[j]))
            alive[j] = False
            curv = mat[j]
        cell = int(pdf["cell"].iloc[0])
        return pd.DataFrame(
            {
                "vec_id": order,
                "cell": [cell] * len(order),
                "pos": range(1, len(order) + 1),
            }
        )

    return a.groupBy("cell").applyInPandas(chain, "vec_id long, cell int, pos long")


def kcenter_coreset(
    emb: DataFrame,
    k: int = 8,
    n_cells: int = 16,
    dim: int = DEFAULT_DIM,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center CORESET selection (Sener & Savarese 2018,
    arXiv:1708.00489 — the active-learning/data-pruning selection rule):
    within each quantizer cell, start from the lowest id and repeatedly add
    the point FARTHEST from the current selection (max over candidates of
    min cosine distance to any selected point; ties to the lower id), up to
    ``k`` representatives per cell.  The selected set is the 2-approximate
    k-center cover — the diversity-preserving subsample that keeps one
    exemplar per region instead of one per duplicate-cluster (SemDeDup's
    complementary failure mode).

    Returns ``(vec_id, cell, pos)`` for SELECTED points only; pos is the
    selection order (pos=1 is the seed, early picks are the most spread).

    Plan shape: identical family to :func:`icl_chain_order` — one-scan cell
    assignment, one ``applyInPandas`` per cell group, per-cell cost
    O(k · cell · dim).  Distances are exact left-fold cosines so the
    traversal decisions replay bit-identically in the recursive SQL oracle.
    """
    import pandas as pd

    a = (
        emb.select(F.col(id_col).alias("vec_id"), as_double(vec_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("nrm", F.sqrt(dot_flat(F.col("v"), F.col("v"), dim)))
        .withColumn("sims", F.expr(_ivf_cell_sims_sql(n_cells, dim, seed, "v", "nrm")))
        .withColumn(
            "cell", (F.expr("array_position(sims, array_max(sims))") - 1).cast("int")
        )
        .withColumn("vn", F.expr("transform(v, x -> x / nrm)"))
        .select("vec_id", "cell", "vn")
    )

    def select_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].tolist()
        by_id = dict(zip(ids, (list(v) for v in pdf["vn"].tolist())))

        def dist(x, y):
            acc = 0.0
            for i in range(len(x)):
                acc += x[i] * y[i]
            return 1.0 - acc

        seed_id = min(ids)
        chosen = [seed_id]
        mind = {
            i: dist(by_id[seed_id], by_id[i]) for i in ids if i != seed_id
        }
        while mind and len(chosen) < k:
            best_id, best_d = None, None
            for cand in sorted(mind):
                d = mind[cand]
                if best_d is None or d > best_d:
                    best_id, best_d = cand, d
            chosen.append(best_id)
            del mind[best_id]
            bv = by_id[best_id]
            for cand in mind:
                d = dist(bv, by_id[cand])
                if d < mind[cand]:
                    mind[cand] = d
        cell = int(pdf["cell"].iloc[0])
        return pd.DataFrame(
            {
                "vec_id": chosen,
                "cell": [cell] * len(chosen),
                "pos": range(1, len(chosen) + 1),
            }
        )

    return a.groupBy("cell").applyInPandas(
        select_cell, "vec_id long, cell int, pos long"
    )


#: MMR trade-off weight and its complement — computed ONCE in Python so the
#: Spark UDF and the SQL oracle score candidates with the same two doubles.
MMR_LAMBDA = 0.7
MMR_ONE_MINUS_LAMBDA = 1.0 - MMR_LAMBDA


def mmr_select(
    emb: DataFrame,
    k: int = 8,
    n_cells: int = 16,
    dim: int = DEFAULT_DIM,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE selection (Carbonell & Goldstein 1998,
    SIGIR) — the relevance-vs-redundancy greedy rule used to pick diverse
    in-context examples / retrieval results: repeatedly add the candidate
    maximizing ``lambda*rel(c) - (1-lambda)*max_{s in S} sim(c, s)``.
    Relevance here is the candidate's cosine to its quantizer-cell centroid
    (the shared fixed-literal quantizer), redundancy the max cosine to
    anything already selected; the seed is the most relevant point.  Where
    :func:`kcenter_coreset` maximizes pure spread, MMR trades spread against
    staying close to the query/topic — lambda=1 degenerates to top-k by
    relevance, lambda=0 to farthest-point diversity.

    Returns ``(vec_id, cell, pos)`` for selected points, pos = pick order.

    Plan shape: identical family to kcenter_coreset — one-scan cell+rel
    assignment, one ``applyInPandas`` per cell, O(k · cell · dim) per cell.
    Scores are exact left-fold doubles with shared literal constants, so the
    greedy decisions replay bit-identically in a recursive SQL oracle."""
    import pandas as pd

    a = (
        emb.select(F.col(id_col).alias("vec_id"), as_double(vec_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("nrm", F.sqrt(dot_flat(F.col("v"), F.col("v"), dim)))
        .withColumn("sims", F.expr(_ivf_cell_sims_sql(n_cells, dim, seed, "v", "nrm")))
        .withColumn(
            "cell", (F.expr("array_position(sims, array_max(sims))") - 1).cast("int")
        )
        .withColumn("rel", F.expr("array_max(sims)"))
        .withColumn("vn", F.expr("transform(v, x -> x / nrm)"))
        .select("vec_id", "cell", "rel", "vn")
    )

    def select_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].tolist()
        by_id = dict(zip(ids, (list(v) for v in pdf["vn"].tolist())))
        rel = dict(zip(ids, pdf["rel"].tolist()))

        def sim(x, y):
            acc = 0.0
            for i in range(len(x)):
                acc += x[i] * y[i]
            return acc

        seed_id, seed_r = None, None
        for i in sorted(ids):
            if seed_r is None or rel[i] > seed_r:
                seed_id, seed_r = i, rel[i]
        chosen = [seed_id]
        maxsim = {
            i: sim(by_id[seed_id], by_id[i]) for i in ids if i != seed_id
        }
        while maxsim and len(chosen) < k:
            best_id, best_s = None, None
            for cand in sorted(maxsim):
                s = MMR_LAMBDA * rel[cand] - MMR_ONE_MINUS_LAMBDA * maxsim[cand]
                if best_s is None or s > best_s:
                    best_id, best_s = cand, s
            chosen.append(best_id)
            del maxsim[best_id]
            bv = by_id[best_id]
            for cand in maxsim:
                s = sim(bv, by_id[cand])
                if s > maxsim[cand]:
                    maxsim[cand] = s
        cell = int(pdf["cell"].iloc[0])
        return pd.DataFrame(
            {
                "vec_id": chosen,
                "cell": [cell] * len(chosen),
                "pos": range(1, len(chosen) + 1),
            }
        )

    return a.groupBy("cell").applyInPandas(
        select_cell, "vec_id long, cell int, pos long"
    )
