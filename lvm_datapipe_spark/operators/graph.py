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
- rounds needed = graph diameter.  Near-dup clusters are near-cliques
  (diameter ≤ ~2-3), so 3-5 rounds close most corpora; ``max_rounds``
  bounds the worst case;
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


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "id",
    cluster_out: str = "cluster_id",
    max_rounds: int = 20,
    check_every: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """Cluster assignment for an undirected pair list: every node that
    appears in ``pairs`` is mapped to the minimum node id reachable from it.

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
    passed) receives ``rounds`` and ``checks`` counters for tests.
    """
    check_every = max(1, check_every)
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

    rounds = checks = 0
    for rnd in range(max_rounds):
        # neighbor-min pass: every edge (u,v) proposes u's label to v
        prop = (
            edges.join(labels.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_label = F.least(F.col("label"), F.coalesce("nbr_label", "label"))
        labels = (
            labels.join(prop, "id", "left")
            .select(
                "id",
                new_label.alias("label"),
                (new_label < F.col("label")).cast("int").alias("changed"),
            )
            .localCheckpoint()
        )
        rounds += 1
        if (rnd + 1) % check_every == 0 or rnd == max_rounds - 1:
            checks += 1
            if (labels.agg(F.sum("changed")).collect()[0][0] or 0) == 0:
                break
        labels = labels.drop("changed")
    labels = labels.drop("changed")

    if stats is not None:
        stats["rounds"] = rounds
        stats["checks"] = checks
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
) -> DataFrame:
    """The end-to-end dedup decision: keep exactly one row per near-dup
    cluster (the minimum id — deterministic) plus every row that has no
    near-dup at all.  One left join against the (small relative to the
    corpus) cluster table; rows whose id is not a cluster member are kept
    by the null branch."""
    cc = connected_components(pairs, src=src, dst=dst)
    return (
        df.join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .filter(F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col(id_col)))
        .drop("cluster_id")
    )
