"""Connected components over near-duplicate pair lists.

Every dedup family in this engine (exact, MinHash/LSH, SimHash, n-gram
Jaccard, embedding cosine) emits PAIRS (id_a, id_b).  Turning pairs into
dedup decisions needs one more step: group transitively-connected documents
into clusters and pick one representative per cluster (the reference
pipeline stops at per-clip scores; cluster assignment is the extension a
100 TB training-data dedup actually ships — "keep one doc per cluster").

Algorithm: iterative min-label propagation.  Every node starts labeled with
its own id; each round every node takes the min of its own label and its
neighbors' labels; at the fixpoint every node in a component carries the
component's minimum id.  The fixpoint is ORDER-INDEPENDENT, so the result
is exact and deterministic — oracle-checkable against a recursive-CTE
transitive closure.

Scale shape (1000-executor reality check):

- each round is one keyed shuffle (join on the edge source + groupBy on the
  destination) — no cross product, no driver-side graph;
- rounds needed = graph diameter.  EXACT-dup and high-threshold near-dup
  clusters are near-cliques (diameter ≤ ~2-3; 3-5 rounds close them), but
  the r10 census profile measured the cosine-0.4 embedding LSH graph at
  12 rounds at sf0.1 — similarity is not transitive, so moderate-threshold
  near-dup pairs CHAIN and the diameter grows with the corpus.  For those
  graphs use :func:`connected_components_twophase` (O(log²) rounds; the
  declared dedup-cluster queries switched in r10, SCALE_BENCH §19);
  ``max_rounds`` bounds the worst case here;
- lineage is truncated every round with ``localCheckpoint`` — without it
  the plan doubles per iteration and the job dies on optimizer time long
  before data size matters;
- convergence is detected with a single scalar aggregate over a ``changed``
  flag computed in the same projection as the new label — one cheap action,
  no old-vs-new join, and it works for any orderable id type (numeric or
  string).  The check runs every ``check_every``-th round, not every round:
  labels only ever decrease, so "no change in the LAST round of a block"
  is exactly the fixpoint test, and skipping intermediate checks trades at
  most ``check_every - 1`` extra (cheap, converged) propagation rounds for
  proportionally fewer driver-side job launches — on a deep cluster chain
  the action-per-round pattern is the latency bottleneck, not the shuffle;
- the edge list is persisted once and reused every round.

For graphs with huge-degree hubs (not the near-dup case) the alternating
large-star/small-star contraction converges in O(log²) rounds with better
skew behavior; this min-propagation keeps the plan simpler and matches the
small-diameter structure of dedup graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fresh_local_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` that also DROPS the carried Catalyst statistics.

    ``DataFrame.localCheckpoint`` truncates RDD lineage, but the resulting
    ``LogicalRDD`` leaf CARRIES the checkpointed plan's *estimated*
    ``Statistics`` (its ``originStats`` field — verified against the
    shipped spark-sql 4.1.2 jar).  In an iterative loop whose round joins
    TWO references of the previous round's checkpoint through plain
    boolean equi-joins, Catalyst's size-only join estimate MULTIPLIES the
    two carried ``sizeInBytes``, so the estimate's DIGIT COUNT DOUBLES
    per round: measured 9 → 19 → 41 → 83 → … digits (exact ×2/round) on a
    30-node path under :func:`kcore`'s round shape.  By round ~20 the
    driver spends its time in Toom-Cook BigInteger multiplication inside
    ``SizeInBytesOnlyStatsPlanVisitor`` (thread-dump-verified), and a
    long enough peel dies with ``ArithmeticException: BigInteger would
    overflow supported range`` — a pure DRIVER-side failure at kilobyte
    data sizes.  Single-join-per-round loops (min-label propagation, the
    large-star/small-star contraction, pagerank) only grow the estimate
    ~linearly (~1 digit/round, measured) and don't need this.

    The fix: rebuild the frame from the checkpointed RDD WITHOUT
    ``originStats`` — ``internalCreateDataFrame`` (the same JVM entry
    point ``spark.createDataFrame`` uses) leaves the leaf's statistics at
    ``defaultSizeInBytes``, holding the estimate CONSTANT at 19-20 digits
    per round (measured; SCALE_BENCH §20).  The rebuilt frame loses
    partitioning/ordering metadata the plain checkpoint would have kept,
    so use it in loops that don't rely on co-partitioning of the loop
    state — every loop here re-shuffles or broadcasts the state anyway.
    """
    ck = df.localCheckpoint()
    jdf = ck._jdf
    spark = df.sparkSession
    fresh = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(fresh, spark)


def cap_baskets(
    df: DataFrame,
    basket_col: str,
    max_basket_size: int = 64,
) -> DataFrame:
    """Drop baskets larger than ``max_basket_size`` items before a
    pairwise (item, item) self-join — the co-occurrence twin of
    ``dedup.ngram_jaccard_pairs``'s ``max_shingle_freq`` stop-shingle
    guard.

    Every basket-pair build (triangles, k-core, lift/cosine/PMI edge
    sources) joins the (basket, item) table to itself on the basket key,
    so ONE pathological basket of B items contributes B²/2 joined rows:
    a single 10k-item basket is 50M rows on one shuffle key — a straggler
    no partitioning fixes.  A basket that large is also semantically
    boilerplate (a crawler cart, a batch import), the association-mining
    analog of a stop-shingle: its pairs carry ~no signal for lift or
    clustering but dominate the join.  The guard deletes those baskets
    up front, bounding per-key fan-out at ``max_basket_size``² while
    leaving every real basket untouched (declared-corpus baskets peak at
    ~17 distinct items, so capped == uncapped bit-exactly — the
    equivalence test in tests/test_basket_cap.py pins that).

    Scale shape: one basket-keyed count aggregate emits the OFFENDER set
    (baskets > cap) — tiny or empty by construction — then a left-anti
    join against it.  Because the offender side is small, AQE plans the
    anti join as a broadcast: the main table is NOT shuffled, and the
    downstream pair join still shuffles on the same basket key it always
    did.  Oracle mirror: ``HAVING count(*) > cap`` + ``NOT IN`` — see
    ``queries._cap_baskets_sql``.
    """
    big = (
        df.groupBy(basket_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_basket_size)
        .select(basket_col)
    )
    return df.join(big, [basket_col], "left_anti")


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "id",
    cluster_out: str = "cluster_id",
    max_rounds: int = 20,
    check_every: int = 2,
    stats: dict | None = None,
    shortcut: bool = False,
    truncate_every: int = 1,
) -> DataFrame:
    """Cluster assignment for an undirected pair list: every node that
    appears in ``pairs`` is mapped to the minimum node id reachable from it.

    ``shortcut=True`` adds POINTER JUMPING after each propagation pass:
    ``l(v) <- min(l(v), l(l(v)))`` — labels chase their own label's label,
    so the propagation horizon doubles per round and convergence needs
    O(log diameter) rounds instead of O(diameter).  Each round pays one
    extra label-keyed join, which LOSES on the near-clique dedup graphs
    the default serves (diameter 2-3: the plain walk is already minimal)
    and WINS decisively on chain-shaped graphs — spatial DBSCAN
    percolation chains, road/trajectory graphs — where the geometric
    diameter grows with the map (r8, sf0.1 DBSCAN core graph: 24
    propagation rounds / 22.6 s -> 12 jumped rounds / 13.6 s, identical
    labels).

    Returns a MATERIALIZED DataFrame (the loop must run actions to detect
    convergence) with columns ``(id_out, cluster_out)``, one row per
    distinct node.  Nodes with no edges never appear in ``pairs`` and are
    their own singleton clusters by definition — left-join this result and
    ``coalesce(cluster_id, id)`` to label a full corpus.

    ``check_every`` throttles the convergence action: the ``changed`` flag
    of round r alone decides the fixpoint (labels are monotone
    non-increasing), so checking only every k-th round is exact and cuts
    driver job launches on large-diameter graphs at the cost of ≤ k-1
    no-op propagation rounds after convergence.  ``stats`` (when a dict is
    passed) receives ``rounds``, ``checks``, and ``truncations`` counters
    for tests.

    ``truncate_every`` batches the lineage truncation: each eager
    ``localCheckpoint`` is one driver-synchronized job, and on the
    near-clique dedup graphs this loop serves (3-5 total rounds) the
    per-round job launch — not the shuffle — dominates wall time at
    moderate SF.  A skipped truncation lets the plan double (labels is
    referenced twice per round), so keep it small (1, 2, or 4 — plan size
    is 2^T between truncations); convergence-check rounds always
    truncate first (the check is an action, and downstream reuse of an
    unmaterialized frame would recompute the whole lazy chain).  Exact
    for every value — only the job cadence changes.
    """
    check_every = max(1, check_every)
    truncate_every = max(1, truncate_every)
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().persist()

    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )

    rounds = checks = truncations = 0
    for rnd in range(max_rounds):
        is_check = (rnd + 1) % check_every == 0 or rnd == max_rounds - 1
        do_truncate = is_check or (rnd + 1) % truncate_every == 0
        # neighbor-min pass: every edge (u,v) proposes u's label to v
        prop = (
            edges.join(labels.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_label = F.least(F.col("label"), F.coalesce("nbr_label", "label"))
        labels = labels.join(prop, "id", "left").select(
            "id",
            new_label.alias("label"),
            (new_label < F.col("label")).cast("int").alias("changed"),
        )
        if not shortcut and do_truncate:
            labels = labels.localCheckpoint()
            truncations += 1
        if shortcut:
            # the jump pass references labels twice more — without a
            # materialized frame the lazy plan triples per round, so the
            # shortcut path always truncates the propagation result
            # (truncate_every batches only the post-jump checkpoint here).
            # fresh_local_checkpoint, not plain: the jump join below is a
            # boolean equi-join of two references of this frame, the shape
            # whose carried Catalyst estimate doubles its digit count per
            # round (the r10 kcore driver bug — see fresh_local_checkpoint)
            labels = fresh_local_checkpoint(labels)
            truncations += 1
            # pointer jumping: chase the label's own label one hop
            lmap = labels.select(
                F.col("id").alias("_lid"), F.col("label").alias("_ll")
            )
            jumped = F.least(
                F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))
            )
            labels = (
                labels.join(lmap, F.col("label") == F.col("_lid"), "left")
                .select(
                    "id",
                    jumped.alias("label"),
                    F.greatest(
                        F.col("changed"),
                        (jumped < F.col("label")).cast("int"),
                    ).alias("changed"),
                )
            )
            if do_truncate:
                labels = fresh_local_checkpoint(labels)
                truncations += 1
        rounds += 1
        if is_check:
            checks += 1
            if (labels.agg(F.sum("changed")).collect()[0][0] or 0) == 0:
                break
        labels = labels.drop("changed")
    labels = labels.drop("changed")

    if stats is not None:
        stats["rounds"] = rounds
        stats["checks"] = checks
        stats["truncations"] = truncations
    edges.unpersist()
    return labels.select(
        F.col("id").alias(id_out), F.col("label").alias(cluster_out)
    )


def dedup_keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    strategy: str = "minlabel",
    **cc_kwargs,
) -> DataFrame:
    """The end-to-end dedup decision: keep exactly one row per near-dup
    cluster (the minimum id — deterministic) plus every row that has no
    near-dup at all.  One left join against the (small relative to the
    corpus) cluster table; rows whose id is not a cluster member are kept
    by the null branch.

    ``strategy='minlabel'`` (default) suits exact-dup and high-threshold
    pair graphs, whose clusters are near-cliques (diameter 2-3, 2-3 cheap
    propagation rounds).  Pass ``'twophase'`` for caller-supplied pair
    lists whose component shape is unknown (chains / hubs) AND for
    moderate-threshold similarity graphs — the r10 census profile
    measured the cosine-0.4 LSH graph at 12 min-label rounds (similarity
    chains; SCALE_BENCH §19 r10b) — identical labels, O(log² n) rounds
    (SCALE_BENCH §16).  r11 queue: the declared ``dedup_representatives``
    caller switches to ``'twophase'`` on that measurement (window-budget
    deferred, BENCH_NOTES r10b)."""
    if strategy not in ("minlabel", "twophase"):
        raise ValueError(
            "strategy must be 'minlabel' or 'twophase', got "
            f"{strategy!r}"
        )
    cc_fn = (
        connected_components_twophase
        if strategy == "twophase"
        else connected_components
    )
    cc = cc_fn(pairs, src=src, dst=dst, **cc_kwargs)
    return (
        df.join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .filter(F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col(id_col)))
        .drop("cluster_id")
    )


def kcore(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    k: int = 3,
    max_rounds: int = 30,
    check_every: int = 2,
    stats: dict | None = None,
    broadcast_alive: bool | None = None,
    broadcast_max_nodes: int = 1_000_000,
    engine: str = "decremental",
    broadcast_doomed_max: int = 2_000_000,
) -> DataFrame:
    """CONVERGED k-core peel (Seidman 1983): repeatedly delete nodes with
    fewer than ``k`` surviving neighbors until the alive set stabilizes,
    returning ``(node, core_degree)`` for the survivors (degree counted
    within the FINAL core — at the fixpoint every survivor's degree is
    ≥ k by construction).

    Two engines, identical results (equivalence pinned over random graphs
    and non-converged path peels in tests/test_graph.py):

    - ``engine='decremental'`` (default, r10): the classic peeling
      recurrence — maintain a ``(node, alive-degree)`` state table; each
      round the DOOMED frontier (alive degree < k) is removed and only the
      edges INCIDENT TO IT are re-counted (one broadcast-keyed filter pass
      + one small aggregate), so total decrement work across ALL rounds is
      O(E), versus the recompute engine's O(E) PER ROUND.  The doomed
      frontier is broadcast when it fits (``broadcast_doomed_max``; it is
      a per-round slice of the node set, almost always tiny).  Measured
      2.17 s → 1.09 s on the declared sf0.1 part graph, and the win grows
      with peel depth (SCALE_BENCH §20).
    - ``engine='recompute'``: recompute every alive node's degree from the
      full edge set each round (two alive-keyed semi-joins + degree
      aggregate).  Kept for the §18 broadcast-gate A/B surface
      (``broadcast_alive`` / ``broadcast_max_nodes`` apply to this engine
      only) and as the independently-derived cross-check the equivalence
      tests lean on.

    Loop discipline is :func:`connected_components`'s — lineage truncated
    every round, and (recompute engine) the convergence action THROTTLED
    to every ``check_every``-th round: the alive set only ever shrinks, so
    "count unchanged since the last check" is exactly "no node dropped in
    that whole block", one cheap ``count()`` instead of a set comparison
    (plus an empty-set short-circuit: an empty core is definitionally the
    fixpoint).  Flag nuance pinned by the r10 agreement property: the
    decremental engine observes the fixpoint the exact round its doomed
    frontier empties, while recompute's throttled check can read
    ``converged=False`` for a NONEMPTY fixpoint reached inside its final
    ``check_every`` block under a tight ``max_rounds`` — recompute True
    always implies decremental True, never the reverse.
    The per-round truncation uses :func:`fresh_local_checkpoint`, NOT the
    plain ``localCheckpoint``: both engines join two references of the
    previous round's state per round, which DOUBLES the carried Catalyst
    size estimate's digit count every round until the driver stalls in
    BigInteger multiplication and overflows near round ~25 (the r10 latent
    bug — see :func:`fresh_local_checkpoint` and SCALE_BENCH §20).

    ``max_rounds`` bounds pathological peel chains (a path graph peels
    one layer per round).  If the bound trips BEFORE the fixpoint the
    result is NOT a true k-core (some survivors may still be peelable);
    the exit is never silent: ``stats['converged']`` is set False and a
    ``UserWarning`` is emitted, and the returned ``core_degree`` is
    RECOMPUTED against the final alive set so it never counts
    since-dropped neighbors (on a converged exit the last loop degree is
    already exact — no drop happened in the closing block — so no extra
    pass is paid).

    ``broadcast_alive`` controls the per-round semi-join strategy: the
    alive set is node-dimension-sized and only shrinks, so when the
    INITIAL node count fits comfortably in an executor broadcast
    (``broadcast_max_nodes``) each round costs one map-side filter pass
    over ``sym`` plus the single degree shuffle instead of three
    exchanges (measured 13.7 s -> 9.1 s on the declared part graph).
    ``None`` (default) auto-gates on the initial count — a billion-node
    graph falls back to plain shuffled semi-joins with the loop structure
    unchanged; pass True/False to force.  DRIVER SIZING: a broadcast
    build collects the alive set to the driver with per-row object
    overhead well above the 8 raw bytes of a long — the 1M-node default
    keeps the build in the low hundreds of MB; raise it only with
    ``spark.driver.memory`` headroom (~1 GB per extra million rows is a
    safe planning number).  Each round builds TWO broadcasts (one per
    endpoint) — Spark's exchange-reuse does not kick in even when both
    joins reference one projection object, because self-join
    deduplication re-instances the second reference (verified on the
    executed plan: 2 BroadcastExchange, 0 ReusedExchange) — which is why
    the gate is sized against the DOUBLE build cost.

    Scale shape per round: two alive-keyed semi-joins + one node-keyed
    degree aggregate over a monotonically shrinking set — no cartesian,
    no driver-side graph.  ``stats`` (a dict, optional) receives
    ``rounds``, ``checks``, and ``converged``."""
    if engine not in ("decremental", "recompute"):
        raise ValueError(
            f"engine must be 'decremental' or 'recompute', got {engine!r}"
        )
    check_every = max(1, check_every)
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    if engine == "decremental":
        return _kcore_decremental(sym, k, max_rounds, stats, broadcast_doomed_max)
    alive = fresh_local_checkpoint(
        sym.select(F.col("u").alias("p")).distinct()
    )
    prev = alive.count()
    if broadcast_alive is None:
        broadcast_alive = prev <= broadcast_max_nodes
    rounds = checks = 0
    deg = None
    converged = prev == 0
    for rnd in range(max_rounds):
        if converged:
            break
        au = alive.select(F.col("p").alias("_au"))
        av = alive.select(F.col("p").alias("_av"))
        if broadcast_alive:
            au, av = F.broadcast(au), F.broadcast(av)
        deg = (
            sym.join(au, F.col("_au") == F.col("u"))
            .join(av, F.col("_av") == F.col("v"))
            .groupBy(F.col("u").alias("p"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        alive = fresh_local_checkpoint(
            deg.filter(F.col("deg") >= k).select("p")
        )
        rounds += 1
        if (rnd + 1) % check_every == 0 or rnd == max_rounds - 1:
            checks += 1
            cur = alive.count()
            # an EMPTY alive set is definitionally the fixpoint — without
            # this short-circuit a graph whose core empties in the final
            # check block reads converged=False (and pays wasted empty
            # rounds); found by the r10 engine-agreement property test
            if cur == prev or cur == 0:
                converged = True
                break
            prev = cur
    if not converged and deg is not None:
        # max_rounds exhausted mid-peel: the last loop degree was computed
        # against the PREVIOUS alive set (it can count neighbors dropped in
        # the closing round) — recompute against the final alive set so the
        # returned degrees are at least internally consistent, and warn.
        import warnings

        warnings.warn(
            f"kcore(k={k}) hit max_rounds={max_rounds} before the peel "
            "fixpoint — the result is NOT a converged k-core (raise "
            "max_rounds); stats['converged'] is False",
            UserWarning,
            stacklevel=2,
        )
        au = alive.select(F.col("p").alias("_au"))
        av = alive.select(F.col("p").alias("_av"))
        if broadcast_alive:
            au, av = F.broadcast(au), F.broadcast(av)
        deg = (
            sym.join(au, F.col("_au") == F.col("u"))
            .join(av, F.col("_av") == F.col("v"))
            .groupBy(F.col("u").alias("p"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["checks"] = checks
        stats["converged"] = converged
    if deg is None:  # empty edge list
        sym.unpersist()
        from pyspark.sql.types import LongType, StructField, StructType

        # derive the node type from the input edges so the empty frame
        # unions cleanly with non-empty results for any id type
        return sym.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField("node", edges.schema[src].dataType, True),
                    StructField("core_degree", LongType(), True),
                ]
            ),
        )
    out = (
        deg.join(
            alive.withColumnRenamed("p", "_p"), F.col("_p") == F.col("p")
        )
        .select(F.col("p").alias("node"), F.col("deg").alias("core_degree"))
        .localCheckpoint()
    )
    sym.unpersist()
    return out


def _kcore_decremental(
    sym: DataFrame,
    k: int,
    max_rounds: int,
    stats: dict | None,
    broadcast_doomed_max: int,
) -> DataFrame:
    """Decremental peel engine (see :func:`kcore` for the contract).

    State is one ``(node, alive-degree)`` table, maintained exactly: each
    round removes the doomed frontier (degree < k) and SUBTRACTS, per
    surviving neighbor, the number of edges it lost to that frontier —
    only edges incident to the frontier are touched, so the decrement
    work summed over ALL rounds is O(E).  The maintained degree always
    equals the node's degree within the current alive set (doomed sets
    are disjoint across rounds, so no edge is subtracted twice), which
    also makes the non-converged exit exact with NO final recompute pass:
    on ``max_rounds`` exhaustion the table already holds degrees within
    the final alive set — the same value the recompute engine pays an
    extra full-graph pass to restore.
    """
    deg = fresh_local_checkpoint(
        sym.groupBy(F.col("u").alias("p"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    rounds = checks = 0
    converged = False
    for _ in range(max_rounds):
        doomed = deg.filter(F.col("deg") < k).select("p").localCheckpoint()
        checks += 1
        n_doomed = doomed.count()
        if n_doomed == 0:
            converged = True
            break
        d_dec = doomed.select(F.col("p").alias("_d"))
        d_anti = doomed.select(F.col("p").alias("_dp"))
        if n_doomed <= broadcast_doomed_max:
            d_dec, d_anti = F.broadcast(d_dec), F.broadcast(d_anti)
        dec = (
            sym.join(d_dec, F.col("_d") == F.col("v"))
            .groupBy(F.col("u").alias("p"))
            .agg(F.count(F.lit(1)).cast("long").alias("dec"))
        )
        deg = fresh_local_checkpoint(
            deg.join(d_anti, F.col("_dp") == F.col("p"), "left_anti")
            .join(dec, "p", "left")
            .select(
                "p",
                (F.col("deg") - F.coalesce(F.col("dec"), F.lit(0))).alias(
                    "deg"
                ),
            )
        )
        rounds += 1
    if not converged and deg.isEmpty():
        # an EMPTY state table is definitionally the fixpoint (nothing left
        # to peel): mirror the recompute engine's empty-core short-circuit
        # so a core that empties in the FINAL round under a tight
        # max_rounds reads converged — this keeps the documented one-way
        # flag guarantee (recompute True ⇒ decremental True) exact; found
        # by the r10 engine-agreement property test's (self-loop, k=2,
        # cap=2) counterexample.  Only paid on the exhaustion path.
        converged = True
    if not converged:
        import warnings

        warnings.warn(
            f"kcore(k={k}) hit max_rounds={max_rounds} before the peel "
            "fixpoint — the result is NOT a converged k-core (raise "
            "max_rounds); stats['converged'] is False",
            UserWarning,
            stacklevel=3,
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["checks"] = checks
        stats["converged"] = converged
    out = (
        # deg >= 1 mirrors the recompute engine's keyed-aggregate contract
        # on a NON-converged exit: an alive node whose last neighbor died
        # in the closing round produces no row there (no surviving edge to
        # aggregate), so it must not produce a zero-degree row here either.
        # On a converged exit every degree is >= k, so this is a no-op.
        deg.filter(F.col("deg") >= 1)
        .select(F.col("p").alias("node"), F.col("deg").alias("core_degree"))
        .localCheckpoint()
    )
    sym.unpersist()
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iter: int = 5,
    damping: str = "0.85",
    scale: int = 10**12,
) -> DataFrame:
    """Weighted PageRank in FIXED-POINT integer arithmetic — the second
    iterative graph operator next to :func:`connected_components` (power
    iteration instead of label propagation).

    Two deliberate design points:

    * **Fixed iteration count, no convergence action.**  The whole run is
      ONE job of ``n_iter`` chained keyed shuffles — no per-round driver
      round-trip — and the computation is exactly replayable as an
      unrolled SQL query (a convergence loop is not; recursive CTEs
      cannot aggregate in the recursive term).

    * **Integer (fixed-point) arithmetic throughout.**  Ranks are BIGINT
      multiples of ``1/scale``; edge probabilities stay as the exact
      integer ratio w(u,v)/out(u) and each contribution is
      ``(rank * w) DIV out``; the damped update is
      ``base + (num * Σ) DIV den`` with damping as the exact rational
      num/den.  Floating-point PageRank is NOT portable across engines —
      double→decimal rounding (Java shortest-repr BigDecimal vs exact
      binary expansion) diverges in the last ulp — whereas integer
      division and summation are bit-identical everywhere.  The floor
      losses (< |E|/scale of total mass per round) are part of the
      operator's SPEC, not error.  Dangling mass is not redistributed
      (graphs with sinks: add self-loops first).

    Overflow bound: per-edge product rank·w ≤ scale·max_w must fit BIGINT
    — with the default scale 1e12, max integer edge weight ~9e6; hotter
    edge weights need a smaller scale (the product bound is checked, not
    silent).

    Scale shape: edges with their out-degree totals are computed ONCE and
    persisted; each iteration is an edges⋈ranks equi-join on the source
    key plus a re-aggregate on the destination key — two keyed shuffles
    over |E| rows, rank state |V| rows, localCheckpoint truncating
    lineage per round.

    Returns (node, rank_fp BIGINT, rank DOUBLE = rank_fp/scale).
    """
    from fractions import Fraction

    fr = Fraction(damping)
    num, den = fr.numerator, fr.denominator
    w_col = (
        F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w_col.alias("_w")
    )
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_out"))
    ew = e.join(out_w, "_src").persist()
    max_w = ew.agg(F.max("_w").alias("m")).collect()[0]["m"]
    if max_w is not None and max_w * scale >= 2**63:
        raise ValueError(
            f"scale {scale} * max edge weight {max_w} overflows BIGINT; "
            "pass a smaller scale"
        )
    # derive nodes from the PERSISTED ew, not the raw edge plan: ew's
    # inner join with out_w loses no rows (every _src has an out_w row by
    # construction), and reading the cache avoids re-executing the
    # caller's edge build — often a multi-table fact join — a second
    # time for the node set (r10 opt, guide §1.2)
    nodes = (
        ew.select(F.col("_src").alias("_node"))
        .union(ew.select(F.col("_dst")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # one scalar action up front, not per round
    if n_nodes == 0:
        # empty edge set: return an empty rank table with the right schema
        # instead of dividing by zero (a filtered edge build legitimately
        # produces no edges)
        ew.unpersist(blocking=False)
        nodes.unpersist(blocking=False)
        return nodes.select(
            F.col("_node").alias("node"),
            F.lit(0).cast("long").alias("rank_fp"),
            F.lit(0.0).alias("rank"),
        )
    base = ((den - num) * scale) // (den * n_nodes)
    ranks = nodes.select(
        "_node", F.lit(scale // n_nodes).cast("long").alias("_r")
    )
    for i in range(n_iter):
        contrib = (
            ew.join(ranks, ew._src == ranks._node)
            .select(
                "_dst",
                F.expr("(_r * _w) DIV _out").alias("_c"),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = nodes.join(
            contrib, nodes._node == contrib._dst, "left_outer"
        ).select(
            "_node",
            (
                F.lit(base).cast("long")
                + F.expr(f"({num} * coalesce(_s, 0L)) DIV {den}")
            ).alias("_r"),
        )
        # chain iterations LAZILY — the docstring's "one job of n_iter
        # chained keyed shuffles" contract; a localCheckpoint per round
        # was n_iter driver-synchronized jobs on |V|-sized state.  Only
        # truncate mid-run on long runs (plan depth 2 shuffles/iter),
        # then once at the end so the persisted inputs can be released.
        if (i + 1) % 8 == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint()
    ranks = ranks.localCheckpoint()
    ew.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    return ranks.select(
        F.col("_node").alias("node"),
        F.col("_r").alias("rank_fp"),
        (F.col("_r").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def add_self_loops(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Give every SINK node (appears as dst, never as src) a unit
    self-loop — the standard pre-step for :func:`pagerank` on graphs with
    dangling nodes (the operator deliberately does not redistribute
    dangling mass; a self-loop keeps it in place instead of leaking).
    One anti-join on the source key; non-sink rows pass through with ALL
    their columns intact (loop rows carry nulls in any extra columns),
    and NULL destinations are ignored — they are data dirt, not sinks
    (anti-join null semantics would otherwise fabricate a (NULL, NULL)
    self-loop that pagerank counts as a real node)."""
    sinks = (
        edges.select(F.col(dst).alias(src))
        .filter(F.col(src).isNotNull())
        .distinct()
        .join(edges.select(src).distinct(), src, "left_anti")
    )
    loop = sinks.select(
        F.col(src),
        F.col(src).alias(dst),
        *[
            F.lit(1).cast(edges.schema[c].dataType).alias(c)
            if c == weight
            else F.lit(None).cast(edges.schema[c].dataType).alias(c)
            for c in edges.columns
            if c not in (src, dst)
        ],
    )
    return edges.unionByName(loop)


def connected_components_twophase(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "id",
    cluster_out: str = "cluster_id",
    max_rounds: int = 40,
    stats: dict | None = None,
    assume_symmetric: bool = False,
    driver_finish_max_edges: int | None = 200_000,
    precontract: bool = False,
) -> DataFrame:
    """Alternating LARGE-STAR / SMALL-STAR connected components (Kiveris
    et al. 2014, "Connected Components in MapReduce and Beyond") — the
    O(log² n)-round contraction that handles BOTH failure modes of plain
    min-label propagation in one algorithm: long chains (diameter-many
    rounds; :func:`connected_components` ``shortcut=True`` fixes this
    one) and HIGH-DEGREE HUBS (a hot hub key funnels its whole
    neighborhood through one reducer every round; here large-star
    rewires all larger neighbors of a node straight to its current
    minimum, so hub neighborhoods contract exponentially instead of
    being re-shuffled verbatim).

    * large-star(u): every neighbor v > u re-points to
      m = min(N(u) ∪ {u});
    * small-star(u), on parent edges (u > v only): every v ∈ N(u) ∪ {u}
      re-points to m = min(N(u) ∪ {u}).

    At the fixpoint the edge set is a forest of stars whose centers are
    the component minima — the same (node, min-reachable-id) contract as
    :func:`connected_components`, verified equivalent in
    tests/test_graph.py over chains, cliques, stars, and random graphs.

    Scale notes: each half-round is one groupBy(u) + one keyed join (the
    emitted edge list), dedup'd, with ``localCheckpoint`` lineage
    truncation; convergence is detected by a scalar (count,
    xxhash64-xor) signature of the canonical parent-edge set — no
    pairwise old-vs-new comparison.  Prefer the plain propagation for
    near-clique dedup graphs (it converges in 2-3 cheap rounds);
    prefer this for social/web-shaped graphs where hubs and chains
    coexist.

    ``assume_symmetric=True`` asserts the caller's pair list already
    contains BOTH orientations of every edge (e.g. a grid/band self-join
    whose predicate is symmetric): the symmetrize union + distinct + its
    checkpoint are skipped entirely (duplicates would only cost, never
    corrupt — every downstream step is a min-aggregate or distinct).

    ``precontract=True`` runs ONE closed-neighborhood-min contraction
    before the loop: every node u maps to r(u) = min(N(u) ∪ {u}) (the
    exact large-star aggregate), and the loop runs on the contracted rep
    graph {(r(u), r(v)) : (u,v) ∈ E, r(u) ≠ r(v)}.  Labels are provably
    identical: r(u) lies in u's component (it is u or a neighbor), the
    contracted graph preserves connectivity (r(u)—u—v—r(v) is a path),
    and a component's global minimum m is always its own representative
    (m ≤ every neighbor ⇒ r(m) = m), so the contracted component's
    minimum IS the original component's minimum; expansion is one
    (node → rep) join with ``coalesce`` for reps whose whole component
    contracted away (such a rep is the component min by the same
    argument).  Worth it on DENSE graphs — a clique collapses to its
    minimum in this single pass, and the loop's per-round shuffles then
    move the rep graph, not the raw edge set; on sparse chain-like
    graphs it is one extra pass for little contraction (measure — the
    declared callers each carry an A/B).

    ``driver_finish_max_edges`` is the SIZE-GATED driver finish (the
    kcore broadcast-gate pattern): contraction shrinks the parent-edge
    set geometrically, so the late rounds run 4 driver-synchronized
    keyed shuffles over a few thousand rows — pure per-round barrier
    cost at any cluster size.  When a round's signature count drops to
    the gate (default 200k edges ≈ 3 MB of longs collected, bounded the
    same way the kcore alive-set broadcast is), the remaining fixpoint
    is computed as one union-find over the collected parent edges —
    bit-identical labels (both sides produce (node, min-reachable-id);
    the parent set at every round spans the same components as the
    input, the contraction invariant the algorithm's correctness rests
    on — pinned by tests across gate settings).  The gate is also
    checked at ROUND 0: an input edge list already within the bound is
    union-found directly (one count job instead of up to two full-graph
    shuffle rounds; at scale the gate does not fire and the loop runs
    unchanged).  ``None`` disables the gate (pure distributed loop,
    e.g. for the engine-equivalence tests)."""
    # one materialization of the raw pair list: BOTH branches below (the
    # contraction working set and the self-loop singleton recovery) read
    # the checkpointed form, so the upstream pair pipeline (often an LSH /
    # grid-join build) is scanned exactly once — same source-pass count as
    # before the self-loop fix
    p0 = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint()
    # self-loop pairs carry no connectivity but DO declare the node: a node
    # whose only pairs are self-loops must surface as its own singleton
    # cluster (same contract as connected_components, which
    # incremental_components' self-star rows rely on) — remember them and
    # union the missing ones back after the contraction.
    selfs = p0.filter(F.col("u") == F.col("v")).select("u").distinct()
    e0 = p0.filter(F.col("u") != F.col("v"))
    rounds = 0
    finished_on_driver = False
    uf_edges = None
    if driver_finish_max_edges is not None:
        # ROUND-0 gate (r10 opt): when the RAW edge list is already
        # within the driver-finish bound, every distributed round the
        # loop would run is pure overhead — the same union-find that
        # finishes the late rounds labels the input directly (it needs
        # neither parent orientation nor deduplication, and the gate
        # bounds the collect exactly as it does mid-loop).  One count
        # over the p0 checkpoint replaces up to two full-graph shuffle
        # rounds; at scale the count is trivial next to one round and
        # the gate simply does not fire.
        if e0.count() <= driver_finish_max_edges:
            finished_on_driver = True
            uf_edges = e0
    if uf_edges is not None:
        edges = e0  # loop skipped; nothing else reads this
    elif assume_symmetric:
        # caller guarantees both orientations are present: the working
        # set reads straight off the p0 checkpoint — no symmetrize
        # union, no second distinct+checkpoint job over 2|E| rows
        edges = e0
    else:
        # undirected working set, both orientations
        edges = e0.union(
            e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct().localCheckpoint()

    reps = None
    if precontract and uf_edges is None:
        # r(u) = min(N(u) ∪ {u}) over the symmetric working set — the
        # large-star aggregate applied once to BOTH endpoints.  `edges`
        # carries both orientations, so mapping each endpoint through
        # reps yields both orientations of every contracted edge and the
        # loop's invariants (symmetric input, parent orientation) hold
        # unchanged on the rep graph.
        reps = edges.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("r")
        ).localCheckpoint()
        edges = (
            edges.join(reps, "u")
            .select(F.col("r").alias("cu"), "v")
            .join(
                reps.select(F.col("u").alias("v"), F.col("r").alias("cv")),
                "v",
            )
            .filter(F.col("cu") != F.col("cv"))
            .select(F.col("cu").alias("u"), F.col("cv").alias("v"))
            .distinct()
            .localCheckpoint()
        )

    def _sig(parent_edges: DataFrame):
        r = parent_edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    prev_sig = None
    for _ in (range(max_rounds) if uf_edges is None else ()):
        # -- large-star: v > u re-points to min(N(u) + {u})
        mins = edges.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # large-star rows are ALREADY parent-oriented: m = min(N(u) ∪ {u})
        # ≤ u < v strictly, so the emitted (v, m) pair has u' > v' with no
        # reorientation and no self-pair possible — one distinct suffices
        # (the historical reorient-then-re-distinct paid a second full
        # shuffle per round on an identity mapping; r10 opt, guide §2.2)
        par = (
            edges.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # -- small-star on parent edges: all of N(u) + {u} -> min
        smins = par.groupBy("u").agg(F.min("v").alias("m"))
        ss_children = (
            par.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        ss_self = smins.select("u", F.col("m").alias("v"))
        par = (
            ss_children.unionAll(ss_self)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        rounds += 1
        sig = _sig(par)
        if sig == prev_sig:
            break
        if (
            driver_finish_max_edges is not None
            and sig[0] <= driver_finish_max_edges
        ):
            finished_on_driver = True
            uf_edges = par
            break
        prev_sig = sig
        # resymmetrize LAZILY over the just-checkpointed parent set: the
        # union is narrow, so the next round's two scans replay it from
        # the checkpoint — materializing it was a third driver-
        # synchronized job per round for no lineage benefit (r10 opt)
        edges = par.union(
            par.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["driver_finish"] = finished_on_driver
    if finished_on_driver:
        # gated finish: the collected edge set (the raw input at round 0,
        # or the round's parent set mid-loop) spans the same components
        # as the input, so one union-find over its (bounded,
        # just-counted) rows yields the final (node, component-min) map
        # directly — no more distributed rounds.  Path-halving find,
        # union by lesser root id (the label IS the min, so roots are
        # kept as minima); duplicate rows and either orientation are
        # harmless to union-find.
        parent: dict = {}

        def _find(x):
            r = x
            while parent.get(r, r) != r:
                parent[r] = parent.get(parent[r], parent[r])
                r = parent[r]
            return r

        for row in uf_edges.collect():
            ra, rb = _find(row[0]), _find(row[1])
            if ra == rb:
                continue
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
        lab_rows = [(n, _find(n)) for n in parent] + [
            (n, n)
            for n in {_find(n) for n in parent}
        ]
        utype = p0.schema["u"].dataType
        labeled = p0.sparkSession.createDataFrame(
            lab_rows,
            T.StructType(
                [
                    T.StructField(id_out, utype, False),
                    T.StructField(cluster_out, utype, False),
                ]
            ),
        )
    else:
        # parent edges now form stars: (child, root); roots label
        # themselves
        roots = (
            par.select(F.col("v").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("label"))
        )
        children = par.select(
            F.col("u").alias("id"), F.col("v").alias("label")
        )
        labeled = (
            children.unionAll(roots)
            .groupBy("id")
            .agg(F.min("label").alias(cluster_out))
            .select(F.col("id").alias(id_out), cluster_out)
        )
    if reps is not None:
        # expand rep labels back to every original node; a rep absent
        # from `labeled` had its whole component contract onto it in the
        # pre-pass, which makes it the component minimum — coalesce to
        # itself
        labeled = (
            reps.join(
                labeled.withColumnRenamed(id_out, "_rid"),
                F.col("_rid") == F.col("r"),
                "left",
            )
            .select(
                F.col("u").alias(id_out),
                F.coalesce(F.col(cluster_out), F.col("r")).alias(
                    cluster_out
                ),
            )
        )
    singles = selfs.join(
        labeled, selfs["u"] == labeled[id_out], "left_anti"
    ).select(F.col("u").alias(id_out), F.col("u").alias(cluster_out))
    return labeled.unionByName(singles)


def incremental_components(
    prev_labels: DataFrame,
    new_pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "id",
    cluster_out: str = "cluster_id",
    strategy: str = "twophase",
    **cc_kwargs,
) -> DataFrame:
    """Incremental re-clustering: fold NEW near-dup pairs into an existing
    clustering WITHOUT re-reading the old edge list.

    The trick: a finished clustering is a lossless connectivity summary
    of its edges — replace them with STAR edges (member → its cluster
    label), which preserve exactly the old components (every old
    component stays connected through its label node), union the new
    pairs, and run the ordinary min-propagation.  The star list is
    |nodes|-sized where the discarded edge list was |edges|-sized, and
    convergence is fast: unaffected components are 1 hop from their
    label already, so only components actually MERGED by new pairs
    propagate further.  This is how a daily 100 TB dedup absorbs a new
    partition: yesterday's labels + today's candidate pairs, never
    yesterday's pairs.

    ``prev_labels`` must be a (id, cluster) frame as produced by
    :func:`connected_components` (labels are member ids — true for
    min-propagation output).  Exact: the result equals a full recompute
    over (old edges ∪ new pairs).

    ``strategy`` picks the propagation engine — both produce the identical
    (node, min-reachable-id) labeling (agreement pinned in
    tests/test_graph.py), they differ only in round count:

    * ``'twophase'`` (default) — :func:`connected_components_twophase`,
      O(log² n) rounds regardless of shape.  The default here because the
      merge TOPOLOGY is caller-data-dependent: one new pair per adjacent
      component chains k old components into a diameter-k path of label
      nodes, and min-label propagation then pays diameter-many rounds
      (SCALE_BENCH §16: 520 rounds / 80.6 s vs 10 rounds / 4.0 s on the
      chain worst case).  Star edges keep unaffected components 1 hop
      deep either way.
    * ``'minlabel'`` — :func:`connected_components` (pass ``shortcut=``/
      ``check_every=`` through ``cc_kwargs``).  Marginally cheaper per
      round; pick it when new pairs provably merge few components
      (near-clique dedup deltas).
    """
    # self-star rows (a cluster min's own row, and any SINGLETON
    # component) pass through unfiltered: both engines keep self-loop
    # nodes as singleton clusters, and dropping them would silently
    # delete 1-node components from the output — breaking the
    # full-recompute equality
    stars = prev_labels.select(
        F.col(prev_labels.columns[0]).alias(src),
        F.col(prev_labels.columns[1]).alias(dst),
    )
    merged = new_pairs.select(
        F.col(src), F.col(dst)
    ).unionByName(stars)
    if strategy == "twophase":
        return connected_components_twophase(
            merged, src=src, dst=dst, id_out=id_out,
            cluster_out=cluster_out, **cc_kwargs,
        )
    if strategy != "minlabel":
        raise ValueError(f"unknown strategy {strategy!r}")
    return connected_components(
        merged, src=src, dst=dst, id_out=id_out, cluster_out=cluster_out,
        **cc_kwargs,
    )


def triangle_counts(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    use_driver_kernel: bool = True,
) -> DataFrame:
    """Per-node triangle counts with DEGREE ORIENTATION (Chiba-Nishizeki;
    Suri & Vassilvitskii's MapReduce adaptation): each undirected edge is
    directed from its lower-(degree, id) endpoint, so every wedge is
    enumerated exactly once AT its lowest vertex and the wedge join's
    per-key fan-out is bounded by oriented out-degree — O(sqrt(m)) — the
    hub vertex that explodes a naive 2-hop self-join never becomes a
    join key.  Closing edges resolve with one equi-join back to the
    oriented set (the total order makes the closing direction unique).

    ``edges`` must be an undirected simple edge list (each edge once, in
    either orientation, no self-loops).  Returns ``(node, triangles)``
    for every node in at least one triangle.

    r11: below the :func:`triangle_counts_driver_dense` gates the counts
    come from the driver bitset kernel (identical integers, one bounded
    collect instead of the wedge join — see its docstring); the wedge
    engine below is the scale shape above the gates.
    ``use_driver_kernel=False`` forces the distributed engine (used by the
    engine-equivalence tests and SCALE_BENCH's A/B)."""
    e = edges.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("bb")
    ).persist()
    if use_driver_kernel:
        dense = triangle_counts_driver_dense(e, "a", "bb")
        if dense is not None:
            e.unpersist()
            spark = edges.sparkSession
            node_t = edges.schema[a_col].dataType
            schema = T.StructType(
                [
                    T.StructField("node", node_t),
                    T.StructField("triangles", T.LongType()),
                ]
            )
            return spark.createDataFrame(dense, schema)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("bb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("bb"), F.col("d").alias("db"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("bb"))
    )
    d = (
        e.join(da, "a")
        .join(db, "bb")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("bb")).alias("u"),
            F.when(fwd, F.col("bb")).otherwise(F.col("a")).alias("v"),
        )
        .persist()
    )
    dv = d.join(
        deg.select(F.col("node").alias("v"), F.col("d").alias("dvg")), "v"
    )
    w1 = dv.select(F.col("u"), F.col("v").alias("v1"), F.col("dvg").alias("g1"))
    w2 = dv.select(F.col("u"), F.col("v").alias("v2"), F.col("dvg").alias("g2"))
    wedge_order = (F.col("g1") < F.col("g2")) | (
        (F.col("g1") == F.col("g2")) & (F.col("v1") < F.col("v2"))
    )
    tri = (
        w1.join(w2, "u")
        .filter(wedge_order)
        .join(
            d.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
            ["v1", "v2"],
            "left_semi",
        )
        .select(
            F.col("u").alias("x"), F.col("v1").alias("y"), F.col("v2").alias("z")
        )
    )
    # ONE streaming pass over the triangle set: the historical 3-way
    # unionAll of per-corner projections re-executed the wedge join (the
    # operator's dominant cost) once per branch — tri was never
    # materialized.  explode(array(x,y,z)) feeds the same map-side-
    # combinable count from a single execution; counts are identical
    # (each triangle still contributes exactly one row per corner).
    # (r10 opt, guide §1.2/§2.2)
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )


#: Gates for :func:`triangle_counts_driver_dense`.  24576 nodes keeps the
#: packed bit adjacency at 75 MB (the transient byte matrix it is packed
#: from at ~600 MB, well inside the driver sandbox) and the per-edge
#: AND+popcount sweep under ~1 s; the edge cap bounds the Arrow collect
#: (2 int64 cols, ≤128 MB).  Both are driver-memory constants, not
#: data-size tunables — above either gate the distributed engines
#: (array_intersect adjacency / degree-oriented wedge join) carry the
#: query, so the fallback is the scale plan, not an error path.
DENSE_TRIANGLE_MAX_NODES = 24_576
DENSE_TRIANGLE_MAX_EDGES = 8_000_000


#: 16-bit popcount lookup table, built once per process (the 8-bit table
#: indexed per byte measured ~1.6x slower end-to-end: half the gather count
#: wins even though the table no longer fits in L1).
_POPCOUNT16: "object" = None


def _popcount16_lut():
    global _POPCOUNT16
    if _POPCOUNT16 is None:
        import numpy as np

        l8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)
        _POPCOUNT16 = (l8[:, None] + l8[None, :]).reshape(-1).astype(np.uint8)
    return _POPCOUNT16


def triangle_counts_driver_dense(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_nodes: int | None = None,
    max_edges: int | None = None,
    raw_count: int | None = None,
) -> list[tuple[int, int]] | None:
    """Per-node triangle counts for a METADATA-SIZED graph, computed on the
    driver with a packed-bitset adjacency and one vectorized AND+popcount
    sweep over the edges — the same size-gated driver-finish pattern as the
    CC union-find finish and the Markov absorption iteration (both <= a
    fixed collect bound, both falling back to the distributed engine above
    it).

    ``edges`` is an undirected edge list with no self-loops; DUPLICATE rows
    are fine (deduplicated after the remap), which lets callers skip their
    edge-distinct exchange on the fast path — the edge gate then bounds the
    raw COLLECT size, its actual job.  Node ids may be any orderable type
    (ints here; strings work via the same remap).  Returns
    ``[(node, n_triangles), ...]`` for every node in >=1 triangle, or
    ``None`` when the graph exceeds either gate (the caller then runs its
    distributed engine; the wasted work is one bounded collect).

    Math: a triangle {a,b,c} is seen from node ``a`` at BOTH its incident
    edges ((a,b) closing through c and (a,c) closing through b), so with a
    symmetric bit adjacency ``tri(x) = (sum over edges (x,y) of
    |N(x) & N(y)|) / 2`` — per distinct edge, one bitwise AND of two packed
    rows and a popcount, credited to both endpoints.  All-integer, exact by
    construction (an r11 rework of the r11 float32-matmul first cut: the
    bitset form is O(m*n/64) instead of O(n^3), which lifts the node gate
    from 4096 to 24576 and brings the 20k-node part co-purchase graph of
    graph_triangle_counts / graph_clustering_coefficient under it).

    Why a driver bitset beats every distributed engine at this size: the
    r10 round measured the per-edge ``array_intersect`` plan at ~4 s beyond
    the shared edge build and a Catalyst packed-bitset engine <=1.08x with
    an 8-90 s janino cold-start; numpy does the same ANDs over a <=75 MB
    packed matrix in milliseconds and the edge list ships once (~7 MB at
    sf0.1).  The crossover the gates encode: the bit matrix is O(n^2/8)
    memory and the sweep O(m*n/64) work — driver-trivial ONLY below the
    fixed bounds.

    Gates default to the module constants and are env-overridable
    (``SPARK_GRAFT_DENSE_TRI_MAX_NODES`` / ``_MAX_EDGES``) so a deploy with
    a bigger/smaller driver can move the crossover without a code change —
    and so tests can force the distributed fallback with a 0 gate.

    ``raw_count`` lets a caller supply the edge-gate count when a CHEAPER
    exact count exists than executing the edge stream (supplier_triangles
    derives it from per-basket sizes, sum of k*(k-1)/2, one small aggregate
    instead of materializing the 1.19M-row pair join twice)."""
    import os

    import numpy as np
    import pandas as pd

    if max_nodes is None:
        max_nodes = int(
            os.environ.get(
                "SPARK_GRAFT_DENSE_TRI_MAX_NODES", DENSE_TRIANGLE_MAX_NODES
            )
        )
    if max_edges is None:
        max_edges = int(
            os.environ.get(
                "SPARK_GRAFT_DENSE_TRI_MAX_EDGES", DENSE_TRIANGLE_MAX_EDGES
            )
        )
    if max_nodes <= 0 or max_edges <= 0:
        return None
    if raw_count is None:
        raw_count = edges.count()
    if raw_count > max_edges:
        return None
    pdf = edges.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).toPandas()
    a = pdf["a"].to_numpy()
    b = pdf["b"].to_numpy()
    if len(a) == 0:
        return []
    # hash-based id remap (r11: pd.factorize replaces the sorting
    # np.unique(return_inverse) — O(m) vs O(m log m); output row order is
    # appearance order, fine for set-compared query results)
    inv, nodes = pd.factorize(np.concatenate([a, b]))
    nodes = np.asarray(nodes)
    n = len(nodes)
    if n > max_nodes:
        return None
    ia = inv[: len(a)].astype(np.int64)
    ib = inv[len(a):].astype(np.int64)
    cnt = _dense_tri_sweep(ia, ib, n)
    keep = cnt > 0
    return list(zip(nodes[keep].tolist(), cnt[keep].tolist()))


def _dense_tri_sweep(ia, ib, n):
    """The numpy core of the dense driver kernel: per-node triangle counts
    from REMAPPED pair endpoints (``0 <= ia, ib < n``; duplicates and
    self-loops tolerated — deduped on the pair key).  Returns an
    ``int64[n]`` count vector."""
    import numpy as np

    # dedupe (and drop residual self-loops) on the remapped pair key
    key = np.unique(np.minimum(ia, ib) * n + np.maximum(ia, ib))
    ia, ib = key // n, key % n
    keep = ia != ib
    ia, ib = ia[keep], ib[keep]
    # symmetric adjacency as packed bits: byte matrix (duplicate-safe
    # constant assignment) -> packbits rows, padded to an even byte width
    # so the sweep can gather uint16 words (half the lookups of the r11
    # first-cut 8-bit LUT, measured ~1.6x end-to-end)
    byte = np.zeros((n, n), dtype=np.uint8)
    byte[ia, ib] = 1
    byte[ib, ia] = 1
    nb = (n + 15) // 16 * 2
    packed = np.zeros((n, nb), dtype=np.uint8)
    packed[:, : (n + 7) // 8] = np.packbits(byte, axis=1)
    del byte
    p16 = packed.view(np.uint16)
    lut = _popcount16_lut()
    # float64 accumulator: np.bincount(weights=...) is the vectorized
    # scatter-add (np.add.at measured 2-3x slower); every partial is an
    # integer < 2^53, so the float64 sums are exact by IEEE construction
    cnt = np.zeros(n, dtype=np.float64)
    step = max(1, 32_000_000 // max(1, nb))
    for s in range(0, len(ia), step):
        ca, cb = ia[s : s + step], ib[s : s + step]
        common = lut[p16[ca] & p16[cb]].sum(axis=1, dtype=np.int64)
        cnt += np.bincount(ca, weights=common, minlength=n)
        cnt += np.bincount(cb, weights=common, minlength=n)
    return cnt.astype(np.int64) // 2


def triangle_counts_driver_dense_from_baskets(
    baskets: DataFrame,
    order_col: str,
    item_col: str,
    max_nodes: int | None = None,
    max_edges: int | None = None,
) -> list[tuple[int, int]] | None:
    """Dense driver triangle counts straight from a BASKET table (each row
    one (order, item); items distinct within an order): the co-occurrence
    pair stream the distributed engines self-join for is generated ON THE
    DRIVER from the collected baskets instead — the collect ships the
    basket rows (sum k, HALF the bytes of the pair stream at this corpus)
    and no pair-join job runs at all.  The edge gate is exact and cheap:
    one small aggregate computes sum k·(k−1)/2 (the pair join's output
    cardinality) plus the basket row count, and BOTH must clear
    ``max_edges`` before anything is collected.  Returns the same
    ``[(item, n_triangles), ...]`` contract as
    :func:`triangle_counts_driver_dense`, or ``None`` above a gate."""
    import os

    if max_nodes is None:
        max_nodes = int(
            os.environ.get(
                "SPARK_GRAFT_DENSE_TRI_MAX_NODES", DENSE_TRIANGLE_MAX_NODES
            )
        )
    if max_edges is None:
        max_edges = int(
            os.environ.get(
                "SPARK_GRAFT_DENSE_TRI_MAX_EDGES", DENSE_TRIANGLE_MAX_EDGES
            )
        )
    if max_nodes <= 0 or max_edges <= 0:
        return None
    if not _basket_pair_gate(baskets, order_col, max_edges):
        return None
    got = _baskets_to_dense_pairs(baskets, order_col, item_col, max_nodes)
    if got is None:
        return None
    ia, ib, nodes = got
    n = len(nodes)
    if n == 0:
        return []
    cnt = _dense_tri_sweep(ia, ib, n)
    keep = cnt > 0
    return list(zip(nodes[keep].tolist(), cnt[keep].tolist()))


def _baskets_to_dense_pairs(baskets, order_col, item_col, max_nodes):
    """Collect a basket table and generate its within-basket co-occurrence
    pairs on the driver: returns ``(ia, ib, nodes)`` with remapped endpoint
    codes (``0 <= ia, ib < len(nodes)``; each unordered pair once per
    basket containing it), or ``None`` when the node count exceeds
    ``max_nodes``.  The EDGE gate must be enforced by the caller BEFORE
    calling (this function collects).  Shared by the dense triangle and
    k-hop reachability driver kernels."""
    import numpy as np
    import pandas as pd

    pdf = baskets.select(
        F.col(order_col).alias("o"), F.col(item_col).alias("i")
    ).toPandas()
    if len(pdf) == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    o = pdf["o"].to_numpy()
    inv, nodes = pd.factorize(pdf["i"].to_numpy())
    nodes = np.asarray(nodes)
    n = len(nodes)
    if n > max_nodes:
        return None
    # group items by basket (stable sort on the factorized order id keeps
    # this O(rows log rows) with a tiny constant), then emit every within-
    # basket pair with the classic repeat/cumsum ranges construction: the
    # element at local index L pairs with the L elements before it.
    oc, _ = pd.factorize(o)
    srt = np.argsort(oc, kind="stable")
    items = inv[srt].astype(np.int64)
    sizes = np.bincount(oc)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    loc = np.arange(len(items), dtype=np.int64) - np.repeat(starts, sizes)
    b_idx = np.repeat(np.arange(len(items), dtype=np.int64), loc)
    csum = np.concatenate([[0], np.cumsum(loc)])
    within = np.arange(csum[-1], dtype=np.int64) - np.repeat(csum[:-1], loc)
    a_idx = np.repeat(np.arange(len(items), dtype=np.int64) - loc, loc) + within
    return items[a_idx], items[b_idx], nodes


def _basket_pair_gate(
    baskets: DataFrame, order_col: str, max_edges: int
) -> bool:
    """True iff the basket table's within-basket pair cardinality
    (sum k·(k−1)/2, exactly the co-occurrence join's output size) AND its
    row count both clear ``max_edges`` — the bounded-collect precondition
    of the dense driver kernels, computed with ONE small aggregate."""
    gate = (
        baskets.groupBy(order_col)
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(
            F.sum(F.col("k") * (F.col("k") - 1) / 2).alias("pairs"),
            F.sum("k").alias("rows"),
        )
        .collect()[0]
    )
    n_pairs = int(gate["pairs"] or 0)
    n_rows = int(gate["rows"] or 0)
    return n_pairs <= max_edges and n_rows <= max_edges


def khop_reachability_driver_dense_from_baskets(
    baskets: DataFrame,
    order_col: str,
    item_col: str,
    n_seeds: int = 5,
    max_hops: int = 3,
    max_nodes: int | None = None,
    max_edges: int | None = None,
) -> list[tuple[int, int, int]] | None:
    """Bounded-depth BFS on a METADATA-SIZED co-occurrence graph, computed
    on the driver with the packed-bitset adjacency — the k-hop sibling of
    :func:`triangle_counts_driver_dense_from_baskets` (same gates, same
    basket collect, same fallback contract).

    Semantics pinned to graph_reachability_3hop's declared SQL: seeds are
    the ``n_seeds`` highest-degree nodes (degree = distinct neighbors;
    ties by ascending node id); hop h's frontier is the neighbor set of
    hop h−1's; a node's ``min_hops`` is the smallest h at which it
    appears; the seed itself is excluded.  Returns
    ``[(seed, min_hops, n_reachable), ...]`` or ``None`` above a gate.

    Why the driver wins here: each distributed hop is a frontier⋈edges
    join + a distinct exchange over ~frontier×degree rows (≈4.5M on the
    91%-dense 1k-node supplier graph), three times; the bitset form is
    max_hops row-gathers + OR-reduces over a ≤75 MB packed matrix —
    microseconds — and the collect it needs is the same bounded basket
    table the triangle kernel already ships."""
    import os

    import numpy as np

    if max_nodes is None:
        max_nodes = int(
            os.environ.get(
                "SPARK_GRAFT_DENSE_TRI_MAX_NODES", DENSE_TRIANGLE_MAX_NODES
            )
        )
    if max_edges is None:
        max_edges = int(
            os.environ.get(
                "SPARK_GRAFT_DENSE_TRI_MAX_EDGES", DENSE_TRIANGLE_MAX_EDGES
            )
        )
    if max_nodes <= 0 or max_edges <= 0:
        return None
    if not _basket_pair_gate(baskets, order_col, max_edges):
        return None
    got = _baskets_to_dense_pairs(baskets, order_col, item_col, max_nodes)
    if got is None:
        return None
    ia, ib, nodes = got
    n = len(nodes)
    if n == 0:
        return []
    # symmetric packed adjacency (dedupe is implicit: bit assignment)
    byte = np.zeros((n, n), dtype=np.uint8)
    byte[ia, ib] = 1
    byte[ib, ia] = 1
    np.fill_diagonal(byte, 0)
    deg = byte.sum(axis=1, dtype=np.int64)
    packed = np.packbits(byte, axis=1)
    del byte
    # top-n_seeds by (degree DESC, original id ASC); isolated nodes can
    # seed too (they then reach nothing, matching the SQL's empty h1)
    order = np.lexsort((nodes, -deg))
    seed_codes = order[:n_seeds]
    out: list[tuple[int, int, int]] = []
    for sc in seed_codes:
        seen = np.zeros(n, dtype=bool)
        frontier = np.unpackbits(packed[sc], count=n).astype(bool)
        counts = []
        for _hop in range(max_hops):
            newly = frontier.copy()
            newly[sc] = False  # node <> seed
            counts.append((newly & ~seen).sum())
            seen |= newly
            rows = np.flatnonzero(frontier)
            if len(rows) == 0:
                frontier = np.zeros(n, dtype=bool)
                continue
            nxt = np.bitwise_or.reduce(packed[rows], axis=0)
            frontier = np.unpackbits(nxt, count=n).astype(bool)
        for h, c in enumerate(counts, start=1):
            if c > 0:
                out.append((int(nodes[sc]), h, int(c)))
    return out
