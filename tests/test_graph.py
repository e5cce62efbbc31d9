"""Connected-components cluster assignment (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lvm_datapipe_spark.operators.graph import (
    connected_components,
    dedup_keep_representatives,
)

SF0001 = "/root/testdata/sf0.001"


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["id_a", "id_b"])


def _uf_components(rows):
    """Reference union-find, pure python."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_chain_and_triangle_and_disjoint(spark):
    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = {
        (r.id, r.cluster_id)
        for r in connected_components(_pairs(spark, rows)).collect()
    }
    assert got == set(_uf_components(rows).items())


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_long_chain_needs_multiple_rounds(spark):
    # a 12-node path has diameter 11 — exercises the iteration loop well past
    # round one and the convergence detection
    rows = [(i, i + 1) for i in range(100, 112)]
    got = dict(
        (r.id, r.cluster_id)
        for r in connected_components(_pairs(spark, rows)).collect()
    )
    assert got == _uf_components(rows)
    assert set(got.values()) == {100}


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_convergence_checks_throttled(spark):
    # check_every=k must run ~rounds/k convergence actions (VERDICT r4 item
    # 7: per-round collect() was the driver-side bottleneck on deep chains),
    # produce the identical labeling, and run at most k-1 extra rounds
    rows = [(i, i + 1) for i in range(100, 112)]
    s1, s3 = {}, {}
    got1 = dict(
        (r.id, r.cluster_id)
        for r in connected_components(
            _pairs(spark, rows), check_every=1, stats=s1
        ).collect()
    )
    got3 = dict(
        (r.id, r.cluster_id)
        for r in connected_components(
            _pairs(spark, rows), check_every=3, stats=s3
        ).collect()
    )
    assert got1 == got3 == _uf_components(rows)
    assert s1["checks"] == s1["rounds"]
    assert s3["checks"] <= (s3["rounds"] + 2) // 3
    assert s3["rounds"] <= s1["rounds"] + 2


def test_label_direction_independent(spark):
    # min id on the "wrong" side of every pair: propagation must flow both ways
    rows = [(5, 1), (9, 5), (9, 7)]
    got = dict(
        (r.id, r.cluster_id)
        for r in connected_components(_pairs(spark, rows)).collect()
    )
    assert got == {1: 1, 5: 1, 9: 1, 7: 1}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_string_ids(spark):
    rows = [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("doc_x", "doc_y")]
    got = dict(
        (r.id, r.cluster_id)
        for r in connected_components(_pairs(spark, rows)).collect()
    )
    assert got == _uf_components(rows)


@pytest.mark.parametrize("seed", [7, 19])
@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_random_graph_matches_union_find(spark, seed):
    import random

    rng = random.Random(seed)
    nodes = list(range(60))
    rows = [
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
        )
        if a != b
    ]
    got = dict(
        (r.id, r.cluster_id)
        for r in connected_components(_pairs(spark, rows)).collect()
    )
    assert got == _uf_components(rows)


def test_keep_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = _pairs(spark, [(0, 3), (3, 5)])  # cluster {0,3,5}; 1,2,4 singletons
    kept = {
        r.doc_id
        for r in dedup_keep_representatives(docs, pairs, "doc_id").collect()
    }
    assert kept == {0, 1, 2, 4}


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_plan_no_cartesian(spark):
    rows = [(1, 2), (2, 3)]
    out = connected_components(_pairs(spark, rows))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# pagerank (fixed-point power iteration)
# ---------------------------------------------------------------------------


def _pagerank_model(edges, n_iter=5, scale=10**12, num=17, den=20):
    """Pure-python fixed-point replay: same integer arithmetic as the op."""
    out = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    base = ((den - num) * scale) // (den * n)
    r = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for u, v, w in edges:
            s[v] += (r[u] * w) // out[u]
        r = {v: base + (num * s[v]) // den for v in nodes}
    return r


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_pagerank_matches_python_model(spark):
    from lvm_datapipe_spark.operators.graph import pagerank

    edges = [("a", "b", 3), ("b", "a", 1), ("a", "c", 1), ("c", "a", 2),
             ("b", "c", 5), ("c", "b", 1)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, weight="w", n_iter=5).collect()
    }
    assert got == _pagerank_model(edges)


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_pagerank_mass_nearly_conserved(spark):
    from lvm_datapipe_spark.operators.graph import pagerank

    # a ring has no dangling mass; total rank stays ~1 (floor losses only)
    edges = [(i, (i + 1) % 7, 1) for i in range(7)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    out = pagerank(df, n_iter=8)
    total = sum(r["rank"] for r in out.collect())
    assert 0.999 < total <= 1.0


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_pagerank_favors_high_indegree(spark):
    from lvm_datapipe_spark.operators.graph import pagerank

    # every node points at 'hub'; hub points at one spoke
    edges = [(f"s{i}", "hub", 1) for i in range(5)] + [("hub", "s0", 1)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    ranks = {r["node"]: r["rank"] for r in pagerank(df, n_iter=6).collect()}
    # mass ping-pongs between hub and its one successor (near-bipartite
    # graph, no convergence damping at 6 rounds) — but BOTH dominate the
    # plain spokes, and s0 (fed by the hub) beats its siblings
    assert min(ranks["hub"], ranks["s0"]) > 10 * ranks["s1"]
    assert ranks["s0"] > ranks["s1"]


def test_pagerank_overflow_guard(spark):
    import pytest

    from lvm_datapipe_spark.operators.graph import pagerank

    df = spark.createDataFrame([("a", "b", 2**53)], ["src", "dst", "w"])
    with pytest.raises(ValueError, match="overflows"):
        pagerank(df, weight="w")


def test_pagerank_single_job_no_cartesian(spark):
    from lvm_datapipe_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2, 1), (2, 1, 1)], ["src", "dst", "w"])
    out = pagerank(df, weight="w", n_iter=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_pagerank_empty_edges_returns_empty(spark):
    from lvm_datapipe_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src string, dst string, w long")
    out = pagerank(empty, weight="w")
    assert out.columns == ["node", "rank_fp", "rank"]
    assert out.count() == 0


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_add_self_loops_only_on_sinks(spark):
    from lvm_datapipe_spark.operators.graph import add_self_loops, pagerank

    edges = [("a", "b", 2), ("b", "c", 1)]  # c is a sink
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    fixed = add_self_loops(df, weight="w")
    got = {(r["src"], r["dst"], r["w"]) for r in fixed.collect()}
    assert got == {("a", "b", 2), ("b", "c", 1), ("c", "c", 1)}
    # with the loop, total rank mass is conserved (no dangling leak)
    total = sum(r["rank"] for r in pagerank(fixed, weight="w", n_iter=6).collect())
    assert 0.999 < total <= 1.0


def test_contiguous_ids_empty_input(spark):
    from lvm_datapipe_spark.operators.relational import contiguous_ids

    empty = spark.createDataFrame([], "k long")
    out = contiguous_ids(empty, ["k"])
    assert out.columns == ["k", "row_id"]
    assert out.count() == 0


def test_add_self_loops_preserves_columns_and_ignores_null_dst(spark):
    from lvm_datapipe_spark.operators.graph import add_self_loops

    e = spark.createDataFrame(
        [("a", "b", 2, "x"), ("b", "c", 1, "y"), ("a", None, 5, "z")],
        "src string, dst string, w long, tag string",
    )
    out = add_self_loops(e, weight="w").collect()
    got = {(r["src"], r["dst"], r["w"], r["tag"]) for r in out}
    assert ("c", "c", 1, None) in got      # the one real sink gets a loop
    assert ("a", "b", 2, "x") in got       # originals keep ALL columns
    assert ("a", None, 5, "z") in got      # dirty row passes through
    assert not any(r["src"] is None for r in out)  # no (NULL,NULL) loop
    assert len(out) == 4


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_incremental_components_equals_full_recompute(spark):
    from lvm_datapipe_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    old_edges = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)]
    new_edges = [(3, 10), (21, 40), (50, 51)]  # merge, extend, brand-new
    prev = connected_components(_pairs(spark, old_edges))
    inc = dict(
        (r.id, r.cluster_id)
        for r in incremental_components(prev, _pairs(spark, new_edges)).collect()
    )
    full = dict(
        (r.id, r.cluster_id)
        for r in connected_components(
            _pairs(spark, old_edges + new_edges)
        ).collect()
    )
    assert inc == full
    assert inc[11] == 1  # the merged chain collapses to the global min
    assert inc[40] == 20


def test_incremental_components_no_new_edges_is_identity(spark):
    from lvm_datapipe_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    old_edges = [(5, 6), (6, 7), (9, 8)]
    prev = connected_components(_pairs(spark, old_edges))
    empty = spark.createDataFrame([], "id_a long, id_b long")
    inc = dict(
        (r.id, r.cluster_id)
        for r in incremental_components(prev, empty).collect()
    )
    assert inc == dict((r.id, r.cluster_id) for r in prev.collect())


def test_incremental_components_keeps_singletons(spark):
    from lvm_datapipe_spark.operators.graph import incremental_components

    # a full-corpus labeling includes SINGLETON rows (id, id) — they must
    # survive the incremental pass, not vanish with the star compression
    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 9)], ["id", "cluster_id"]
    )
    new = spark.createDataFrame([(2, 3)], "id_a long, id_b long")
    inc = dict(
        (r.id, r.cluster_id)
        for r in incremental_components(prev, new).collect()
    )
    assert inc == {1: 1, 2: 1, 3: 1, 9: 9}


# --- triangle counting (degree orientation) --------------------------------


def _brute_triangles(edges):
    from itertools import combinations

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


@pytest.mark.parametrize(
    "edges",
    [
        # K4 plus a pendant: every K4 node is in 3 triangles, pendant in 0
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        # two triangles sharing an edge + an isolated edge
        [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (8, 9)],
        # triangle-free (star + path)
        [(1, 2), (1, 3), (1, 4), (5, 6), (6, 7)],
    ],
)
@pytest.mark.parametrize("driver_kernel", [True, False])
def test_triangle_counts_match_brute_force(spark, edges, driver_kernel):
    from lvm_datapipe_spark.operators.graph import triangle_counts

    df = _pairs(spark, edges)
    got = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, use_driver_kernel=driver_kernel).collect()
    }
    assert got == _brute_triangles(edges)


def test_triangle_counts_deterministic_under_repartition_and_orientation(spark):
    from lvm_datapipe_spark.operators.graph import triangle_counts

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 1), (2, 4)]  # K4 again
    flipped = [(b, a) for a, b in edges]  # reversed orientations
    a = {r["node"]: r["triangles"]
         for r in triangle_counts(_pairs(spark, edges)).collect()}
    b = {r["node"]: r["triangles"]
         for r in triangle_counts(_pairs(spark, flipped).repartition(7)).collect()}
    assert a == b == _brute_triangles(edges)


# -- dense driver triangle kernel (r11, graph_supplier_triangles fast path) --


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],  # K4+pendant
        [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (8, 9)],
        [(1, 2), (1, 3), (1, 4), (5, 6), (6, 7)],  # triangle-free
        [(10**9 + i, 10**9 + j) for i in range(6) for j in range(i + 1, 6)],  # K6, big ids
    ],
)
def test_dense_driver_triangles_match_brute_force(spark, edges):
    from lvm_datapipe_spark.operators.graph import triangle_counts_driver_dense

    rows = triangle_counts_driver_dense(_pairs(spark, edges), "id_a", "id_b")
    assert rows is not None
    assert dict(rows) == _brute_triangles(edges)


def test_dense_driver_triangles_dedupe_duplicate_rows(spark):
    # callers may pass the RAW per-order pair stream (duplicates); the
    # matrix assignment must be idempotent
    from lvm_datapipe_spark.operators.graph import triangle_counts_driver_dense

    edges = [(1, 2), (2, 3), (1, 3)]
    dup = _pairs(spark, edges + edges + edges[:1])
    assert dict(triangle_counts_driver_dense(dup, "id_a", "id_b")) == {
        1: 1, 2: 1, 3: 1
    }


def test_dense_driver_triangles_gate_returns_none(spark):
    from lvm_datapipe_spark.operators.graph import triangle_counts_driver_dense

    df = _pairs(spark, [(1, 2), (2, 3), (1, 3)])
    assert triangle_counts_driver_dense(df, "id_a", "id_b", max_edges=2) is None
    assert triangle_counts_driver_dense(df, "id_a", "id_b", max_nodes=2) is None


def test_dense_driver_triangles_match_distributed_engine(spark):
    # the two engines behind graph_supplier_triangles must agree on a
    # non-trivial random graph (seeded, ~200 edges incl. dense pockets)
    import random

    from lvm_datapipe_spark.operators.graph import (
        triangle_counts,
        triangle_counts_driver_dense,
    )

    rng = random.Random(11)
    edges = {tuple(sorted(rng.sample(range(40), 2))) for _ in range(220)}
    edges = sorted(edges)
    df = _pairs(spark, edges)
    dense = dict(triangle_counts_driver_dense(df, "id_a", "id_b"))
    dist = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, use_driver_kernel=False).collect()
    }
    assert dense == dist == _brute_triangles(edges)


def test_dense_driver_triangles_from_baskets_match_edge_kernel(spark):
    # the basket entry point (collect baskets, generate pairs in numpy)
    # must agree with the edge kernel and brute force on random baskets,
    # including singleton baskets (0 pairs) and repeated co-occurrences
    import itertools
    import random

    from lvm_datapipe_spark.operators.graph import (
        triangle_counts_driver_dense,
        triangle_counts_driver_dense_from_baskets,
    )

    rng = random.Random(23)
    rows, edge_set = [], set()
    for order in range(60):
        k = rng.choice([1, 2, 3, 4, 5])
        items = rng.sample(range(30), k)
        rows.extend((order, i) for i in items)
        edge_set |= {tuple(sorted(p)) for p in itertools.combinations(items, 2)}
    baskets = spark.createDataFrame(rows, "o long, i long")
    via_baskets = triangle_counts_driver_dense_from_baskets(baskets, "o", "i")
    edges = sorted(edge_set)
    via_edges = triangle_counts_driver_dense(_pairs(spark, edges), "id_a", "id_b")
    assert dict(via_baskets) == dict(via_edges) == _brute_triangles(edges)


def test_dense_driver_triangles_from_baskets_gates(spark):
    from lvm_datapipe_spark.operators.graph import (
        triangle_counts_driver_dense_from_baskets,
    )

    baskets = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11)], "o long, i long"
    )
    # pairs = 3 + 1 = 4; rows = 5
    assert (
        triangle_counts_driver_dense_from_baskets(baskets, "o", "i", max_edges=3)
        is None
    )
    assert (
        triangle_counts_driver_dense_from_baskets(baskets, "o", "i", max_nodes=2)
        is None
    )
    out = triangle_counts_driver_dense_from_baskets(baskets, "o", "i")
    assert dict(out) == {10: 1, 11: 1, 12: 1}


def test_khop_driver_dense_matches_brute_force(spark):
    # a path-ish graph where min_hops actually varies: baskets are edges
    # {i, i+1} plus one hub basket, seeds = top-degree nodes
    from lvm_datapipe_spark.operators.graph import (
        khop_reachability_driver_dense_from_baskets,
    )

    rows = []
    for i in range(12):  # path 0-1-2-...-12 (each basket one edge)
        rows += [(i, i), (i, i + 1)]
    rows += [(100, 0), (100, 5), (100, 9)]  # hub basket {0, 5, 9}
    baskets = spark.createDataFrame(rows, "o long, i long")
    out = khop_reachability_driver_dense_from_baskets(
        baskets, "o", "i", n_seeds=3, max_hops=3
    )
    # brute force in python
    import itertools
    from collections import defaultdict

    adj = defaultdict(set)
    baskets_by_o = defaultdict(set)
    for o, i in rows:
        baskets_by_o[o].add(i)
    for items in baskets_by_o.values():
        for a, b in itertools.combinations(items, 2):
            adj[a].add(b)
            adj[b].add(a)
    deg = {n: len(s) for n, s in adj.items()}
    seeds = sorted(deg, key=lambda n: (-deg[n], n))[:3]
    expect = []
    for s in seeds:
        h1 = set(adj[s])
        h2 = set().union(*(adj[x] for x in h1)) if h1 else set()
        h3 = set().union(*(adj[x] for x in h2)) if h2 else set()
        minh = {}
        for h, nodes in ((1, h1), (2, h2), (3, h3)):
            for n in nodes:
                if n != s and n not in minh:
                    minh[n] = h
        from collections import Counter

        for h, c in sorted(Counter(minh.values()).items()):
            expect.append((s, h, c))
    assert sorted(out) == sorted(expect)


def test_reachability_env_gate_forces_distributed_plan(spark, monkeypatch):
    from lvm_datapipe_spark.queries import QUERIES

    fast = QUERIES["graph_reachability_3hop"](spark, SF0001)
    fast_rows = {tuple(r) for r in fast.collect()}
    monkeypatch.setenv("SPARK_GRAFT_DENSE_TRI_MAX_EDGES", "0")
    slow = QUERIES["graph_reachability_3hop"](spark, SF0001)
    assert fast_rows == {tuple(r) for r in slow.collect()}
    assert [f.name for f in fast.schema.fields] == [
        f.name for f in slow.schema.fields
    ]


def test_supplier_triangles_env_gate_forces_distributed_plan(spark, monkeypatch):
    # with a 0 gate the declared query must run the array_intersect scale
    # engine and still match the oracle-shaped fast-path output
    from lvm_datapipe_spark.queries import QUERIES

    fast = QUERIES["graph_supplier_triangles"](spark, SF0001)
    fast_rows = {(r[0], r[1]) for r in fast.collect()}
    monkeypatch.setenv("SPARK_GRAFT_DENSE_TRI_MAX_EDGES", "0")
    slow = QUERIES["graph_supplier_triangles"](spark, SF0001)
    plan = slow._jdf.queryExecution().executedPlan().toString()
    assert "array_intersect" in plan
    assert fast_rows == {(r[0], r[1]) for r in slow.collect()}
    assert [f.name for f in fast.schema.fields] == [
        f.name for f in slow.schema.fields
    ]
    assert [f.dataType for f in fast.schema.fields] == [
        f.dataType for f in slow.schema.fields
    ]


# -- converged k-core (VERDICT r7 item 5) ------------------------------------


def _kcore_reference(edge_rows, k):
    """Pure-python peel to the true fixpoint."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edge_rows:
        adj[u].add(v)
        adj[v].add(u)
    alive = set(adj)
    while True:
        drop = {u for u in alive if len(adj[u] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {u: len(adj[u] & alive) for u in alive}


def test_kcore_matches_reference_fixpoint(spark):
    from lvm_datapipe_spark.operators.graph import kcore

    # two triangles sharing a bridge node + a pendant path that must peel
    # away layer by layer (exercises multi-round convergence)
    rows = [
        (1, 2), (2, 3), (1, 3),
        (3, 4), (4, 5), (5, 6), (4, 6),
        (6, 7), (7, 8), (8, 9),
    ]
    e = spark.createDataFrame(rows, ["u", "v"])
    stats: dict = {}
    got = {
        (r.node, r.core_degree)
        for r in kcore(e, k=2, max_rounds=30, stats=stats).collect()
    }
    assert got == set(_kcore_reference(rows, 2).items())
    assert stats["rounds"] <= 30 and stats["checks"] >= 1


def test_kcore_empty_core(spark):
    from lvm_datapipe_spark.operators.graph import kcore

    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
    assert kcore(e, k=3).count() == 0


def test_kcore_agrees_with_declared_query(spark):
    """The library fixpoint and the declared query (which delegates to it
    since the r9 converged-spec promotion) must agree on the declared
    corpus — this pins the query's edge-build (cap_baskets + distinct
    pair join) to the library peel."""
    from lvm_datapipe_spark.catalog import load_table
    from lvm_datapipe_spark.operators.graph import cap_baskets, kcore
    from lvm_datapipe_spark.queries import MAX_BASKET_SIZE, QUERIES

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    b = cap_baskets(li.distinct(), "l_orderkey", MAX_BASKET_SIZE)
    x = b.select("l_orderkey", F.col("l_partkey").alias("p1"))
    y = b.select("l_orderkey", F.col("l_partkey").alias("p2"))
    e = (
        x.join(y, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
    )
    lib = {
        (r.node, r.core_degree)
        for r in kcore(e, src="p1", dst="p2", k=3).collect()
    }
    declared_rows = QUERIES["graph_kcore_parts"](spark, sf).collect()
    declared = {(r.p_partkey, r.core_degree) for r in declared_rows}
    assert lib == declared and len(lib) > 0
    # r9 verdict item 4: convergence is an output column; the declared
    # corpus reaches the fixpoint well inside max_rounds, so every row
    # must read True (the oracle emits a constant TRUE — a max_rounds
    # exhaustion would diff visibly instead of hash-mismatching mutely)
    assert all(r.converged is True for r in declared_rows)


def test_kcore_query_surfaces_nonconvergence_as_false_column(spark, tmp_path):
    """The declared query must plumb stats['converged'] through to the
    output column: cap the peel at 1 round on a corpus that needs more
    (a pendant chain cascading into a clique) and every surviving row
    reads converged=False."""
    import datetime as dt
    from unittest import mock

    from lvm_datapipe_spark.operators import graph as graph_mod
    from lvm_datapipe_spark.queries import QUERIES

    orders, ok = [], 100
    clique = [1, 2, 3, 4]
    for i, p1 in enumerate(clique):
        for p2 in clique[i + 1:]:
            orders += [(ok, p1), (ok, p2)]
            ok += 1
    for a, b2 in ((4, 5), (5, 6), (6, 7), (7, 8)):
        orders += [(ok, a), (ok, b2)]
        ok += 1
    rows = [
        (o, p, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", dt.date(2024, 1, 2))
        for o, p in orders
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate date",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    real_kcore = graph_mod.kcore

    def capped(*args, **kwargs):
        kwargs["max_rounds"] = 1
        return real_kcore(*args, **kwargs)

    import pytest

    with mock.patch.object(graph_mod, "kcore", capped):
        with pytest.warns(UserWarning, match="max_rounds"):
            got = QUERIES["graph_kcore_parts"](spark, str(tmp_path)).collect()
    assert len(got) > 0
    assert all(r.converged is False for r in got)


# -- pointer-jumping shortcut (r8) -------------------------------------------


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_shortcut_matches_plain_on_long_chain(spark):
    """A 60-node path: plain propagation needs ~diameter rounds, the
    jumped walk converges in O(log) — same labels."""
    rows = [(i, i + 1) for i in range(60)]
    plain_stats: dict = {}
    jump_stats: dict = {}
    plain = {
        (r.id, r.cluster_id)
        for r in connected_components(
            _pairs(spark, rows), max_rounds=100, stats=plain_stats
        ).collect()
    }
    jumped = {
        (r.id, r.cluster_id)
        for r in connected_components(
            _pairs(spark, rows), max_rounds=100, stats=jump_stats, shortcut=True
        ).collect()
    }
    assert plain == jumped
    assert all(c == 0 for _, c in jumped)
    assert jump_stats["rounds"] < plain_stats["rounds"]


def test_shortcut_matches_union_find_on_mixed_graph(spark):
    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21),
            (30, 31), (31, 32), (32, 33), (33, 34), (34, 35)]
    got = {
        (r.id, r.cluster_id)
        for r in connected_components(
            _pairs(spark, rows), shortcut=True
        ).collect()
    }
    assert got == set(_uf_components(rows).items())


# -- large-star/small-star two-phase CC (r8) ---------------------------------


def _assert_cc_equiv(spark, rows):
    from lvm_datapipe_spark.operators.graph import connected_components_twophase

    got = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(_pairs(spark, rows)).collect()
    }
    assert got == set(_uf_components(rows).items())


def test_twophase_chain(spark):
    _assert_cc_equiv(spark, [(i, i + 1) for i in range(40)])


def test_twophase_hub_star(spark):
    # one hub connected to 50 leaves — the shape that funnels plain
    # propagation through a single hot reducer key
    _assert_cc_equiv(spark, [(100, i) for i in range(50)])


def test_twophase_clique_plus_chain_plus_singleton_edge(spark):
    rows = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(10, 11), (11, 12), (12, 13)]
        + [(20, 21)]
    )
    _assert_cc_equiv(spark, rows)


def test_twophase_random_graphs_match_union_find(spark):
    import random

    rng = random.Random(20260816)
    for trial in range(3):
        n = 60
        rows = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(70)
        ]
        rows = [(a, b) for a, b in rows if a != b]
        _assert_cc_equiv(spark, rows)


def test_twophase_converges_in_log_rounds_on_chain(spark):
    from lvm_datapipe_spark.operators.graph import connected_components_twophase

    stats: dict = {}
    out = connected_components_twophase(
        _pairs(spark, [(i, i + 1) for i in range(100)]), stats=stats
    )
    assert {(r.id, r.cluster_id) for r in out.collect()} == {
        (i, 0) for i in range(101)
    }
    # 100-hop chain: plain propagation needs ~100 rounds; the contraction
    # must close it in O(log^2) — single digits in practice
    assert stats["rounds"] <= 12


def test_twophase_agrees_with_declared_dedup_clusters(spark):
    """Both CC algorithms label the declared LSH near-dup pair list
    identically (the oracle-checked dedup_clusters output)."""
    from lvm_datapipe_spark.catalog import load_table
    from lvm_datapipe_spark.operators import similarity as V
    from lvm_datapipe_spark.operators.graph import connected_components_twophase
    from lvm_datapipe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    pairs = V.lsh_near_dup_pairs(emb, threshold=0.4, n_tables=12, n_planes=None)
    tp = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(pairs).collect()
    }
    declared = {
        (r.id, r.cluster_id)
        for r in QUERIES["dedup_clusters"](spark, sf).collect()
    }
    assert tp == declared and len(tp) > 0


def test_twophase_self_loop_only_node_is_singleton(spark):
    """A node whose ONLY pairs are self-loops must surface as its own
    singleton cluster — same contract as connected_components, and the
    row incremental_components' self-star compression depends on
    (r8 ADVICE item 3)."""
    from lvm_datapipe_spark.operators.graph import (
        connected_components,
        connected_components_twophase,
    )

    rows = [(9, 9), (2, 3), (3, 3)]  # 9 is self-loop-only; 3 also self-loops
    tp = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(_pairs(spark, rows)).collect()
    }
    plain = {
        (r.id, r.cluster_id)
        for r in connected_components(_pairs(spark, rows)).collect()
    }
    assert tp == plain == {(9, 9), (2, 2), (3, 2)}


def test_twophase_driver_finish_matches_distributed_fixpoint(spark):
    """The size-gated driver union-find finish must label identically to
    the pure distributed contraction loop (gate disabled), on shapes that
    exercise multi-round contraction, and the stats flag must record
    which path ran."""
    from lvm_datapipe_spark.operators.graph import connected_components_twophase

    rows = (
        [(i, i + 1) for i in range(50)]                      # chain
        + [(a, b) for a in range(100, 106) for b in range(a + 1, 106)]
        + [(300, 300), (7, 7)]                               # self-loops
    )
    pairs = _pairs(spark, rows)
    s_gated: dict = {}
    s_pure: dict = {}
    gated = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(pairs, stats=s_gated).collect()
    }
    pure = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(
            pairs, stats=s_pure, driver_finish_max_edges=None
        ).collect()
    }
    assert gated == pure == set(_uf_components(rows).items())
    assert s_gated["driver_finish"] is True
    assert s_pure["driver_finish"] is False
    # the gate fires after fewer distributed rounds than the fixpoint
    assert s_gated["rounds"] < s_pure["rounds"]


def test_twophase_assume_symmetric_equivalence(spark):
    """A pair list that already carries both orientations must label
    identically through assume_symmetric=True (which skips the
    symmetrize union + distinct) and the default path."""
    from lvm_datapipe_spark.operators.graph import connected_components_twophase

    rows = [(1, 2), (2, 3), (3, 3), (10, 11)]
    sym_rows = rows + [(b, a) for a, b in rows]
    sym = _pairs(spark, sym_rows)
    got = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(
            sym, assume_symmetric=True
        ).collect()
    }
    ref = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(sym).collect()
    }
    assert got == ref == set(_uf_components(rows).items())


def test_twophase_driver_finish_string_ids(spark):
    """The driver finish derives its output schema from the input edge
    type — string node ids must survive both the union-find and the
    createDataFrame round-trip."""
    from lvm_datapipe_spark.operators.graph import connected_components_twophase

    rows = [("b", "a"), ("b", "c"), ("x", "y"), ("z", "z")]
    stats: dict = {}
    got = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(
            _pairs(spark, rows), stats=stats
        ).collect()
    }
    assert stats["driver_finish"] is True
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("x", "x"), ("y", "x"), ("z", "z"),
    }


def test_incremental_components_strategies_agree(spark):
    from lvm_datapipe_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    old_edges = [(1, 2), (2, 3), (10, 11), (30, 31)]
    new_edges = [(3, 10), (31, 50)]
    prev = connected_components(_pairs(spark, old_edges))
    new = _pairs(spark, new_edges)
    a = dict(
        (r.id, r.cluster_id)
        for r in incremental_components(prev, new, strategy="twophase").collect()
    )
    b = dict(
        (r.id, r.cluster_id)
        for r in incremental_components(prev, new, strategy="minlabel").collect()
    )
    assert a == b and a[11] == 1 and a[50] == 30
    import pytest

    with pytest.raises(ValueError):
        incremental_components(prev, new, strategy="nope")


# -- converged k-core: non-convergence handling (r9, ADVICE item 2) ----------


def _kcore_peel_rounds(edge_rows, k, n_rounds):
    """Pure-python peel for EXACTLY n_rounds, degrees within the final
    alive set (nodes with zero surviving neighbors drop out of the
    degree table, mirroring the keyed aggregate)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edge_rows:
        adj[u].add(v)
        adj[v].add(u)
    alive = set(adj)
    for _ in range(n_rounds):
        alive = {u for u in alive if len(adj[u] & alive) >= k}
    return {
        u: len(adj[u] & alive) for u in alive if len(adj[u] & alive) >= 1
    }


def test_kcore_max_rounds_exhaustion_warns_and_recomputes_degrees(spark):
    """When max_rounds trips before the fixpoint the exit must not be
    silent (stats['converged'] False + UserWarning) and core_degree must
    be recomputed against the FINAL alive set — the pre-fix code returned
    degrees against the penultimate set, counting since-dropped
    neighbors."""
    import pytest

    from lvm_datapipe_spark.operators.graph import kcore

    # a 30-node path with k=2 peels one layer (both ends) per round and
    # needs ~15 rounds to die entirely; cap at 3
    rows = [(i, i + 1) for i in range(29)]
    e = spark.createDataFrame(rows, ["u", "v"])
    stats: dict = {}
    with pytest.warns(UserWarning, match="max_rounds"):
        got = {
            (r.node, r.core_degree)
            for r in kcore(e, k=2, max_rounds=3, check_every=2, stats=stats).collect()
        }
    assert stats["converged"] is False
    assert got == set(_kcore_peel_rounds(rows, 2, 3).items())
    # sanity: the true core is empty, so the truncated result over-keeps
    assert len(got) > 0


def test_kcore_converged_flag_true_on_fixpoint(spark):
    from lvm_datapipe_spark.operators.graph import kcore

    rows = [(1, 2), (2, 3), (1, 3), (3, 4)]
    e = spark.createDataFrame(rows, ["u", "v"])
    stats: dict = {}
    got = {
        (r.node, r.core_degree)
        for r in kcore(e, k=2, stats=stats).collect()
    }
    assert stats["converged"] is True
    assert got == {(1, 2), (2, 2), (3, 2)}


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_kcore_broadcast_gate_modes_agree(spark):
    """Forced-broadcast, forced-shuffle, and the auto gate (driven to the
    shuffle path via broadcast_max_nodes=0) must return identical cores."""
    from lvm_datapipe_spark.operators.graph import kcore

    rows = [
        (1, 2), (2, 3), (1, 3),
        (3, 4), (4, 5), (5, 6), (4, 6),
        (6, 7), (7, 8), (8, 9),
    ]
    e = spark.createDataFrame(rows, ["u", "v"])
    expect = set(_kcore_reference(rows, 2).items())
    for kwargs in (
        {"broadcast_alive": True},
        {"broadcast_alive": False},
        {"broadcast_max_nodes": 0},  # auto-gate falls back to shuffled
    ):
        got = {
            (r.node, r.core_degree)
            for r in kcore(e, k=2, **kwargs).collect()
        }
        assert got == expect, kwargs


def test_kcore_empty_edge_list(spark):
    from lvm_datapipe_spark.operators.graph import kcore

    e = spark.createDataFrame([], "u long, v long")
    stats: dict = {}
    out = kcore(e, k=2, stats=stats)
    assert out.count() == 0
    assert out.columns == ["node", "core_degree"]
    assert stats["converged"] is True and stats["rounds"] == 0


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_truncate_every_is_exact_and_batches_jobs(spark):
    """truncate_every batches the per-round localCheckpoint jobs without
    changing any label (r10 candidate, measured in BENCH_NOTES r9): the
    plan doubles between truncations but the fixpoint is identical, and
    convergence-check rounds always truncate first."""
    rows = [(i, i + 1) for i in range(10)] + [(100, 101), (101, 102),
                                              (100, 102), (200, 200)]
    st0: dict = {}
    base = {
        (r.id, r.cluster_id)
        for r in connected_components(_pairs(spark, rows), stats=st0).collect()
    }
    for t in (2, 4):
        st: dict = {}
        got = {
            (r.id, r.cluster_id)
            for r in connected_components(
                _pairs(spark, rows), truncate_every=t, stats=st
            ).collect()
        }
        assert got == base
        assert st["rounds"] == st0["rounds"]
        # with check_every=2 every check round truncates, so the batch
        # bound is min(truncate_every, check_every) rounds per truncation
        assert st["truncations"] <= st0["truncations"] // 2 + 1


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_kcore_engines_agree_on_random_graphs(spark):
    """The decremental (default) and recompute peel engines must return
    identical (node, core_degree) sets and converged flags — the two are
    independently-derived implementations of the same fixpoint, so their
    agreement on random graphs is a strong cross-check."""
    import random

    from lvm_datapipe_spark.operators.graph import kcore

    rng = random.Random(20261016)
    for trial, (n, m, k) in enumerate([(60, 120, 2), (80, 240, 3), (50, 90, 4)]):
        rows = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
        rows = [(a, b) for a, b in rows if a != b]
        e = spark.createDataFrame(rows, ["u", "v"])
        out = {}
        for engine in ("decremental", "recompute"):
            st: dict = {}
            out[engine] = (
                {
                    (r.node, r.core_degree)
                    for r in kcore(e, k=k, engine=engine, stats=st).collect()
                },
                st["converged"],
            )
        assert out["decremental"] == out["recompute"], (trial, n, m, k)
        assert out["decremental"][0] == set(_kcore_reference(rows, k).items())


def test_kcore_engines_agree_on_exhausted_peel(spark):
    """Non-converged exits must match too — including the contract corner
    where a node's LAST alive neighbor dies in the closing round: the
    recompute engine's keyed aggregate emits no row for it, and the
    decremental engine must filter its maintained zero-degree row the
    same way.  A star at k=2 exhausted after 1 round hits exactly that:
    the leaves die, the center survives with alive-degree 0."""
    from lvm_datapipe_spark.operators.graph import kcore

    star = [(0, i) for i in range(1, 5)]
    path = [(i, i + 1) for i in range(29)]
    for rows, k, cap in ((star, 2, 1), (path, 2, 3)):
        e = spark.createDataFrame(rows, ["u", "v"])
        out = {}
        for engine in ("decremental", "recompute"):
            st: dict = {}
            with pytest.warns(UserWarning, match="max_rounds"):
                got = {
                    (r.node, r.core_degree)
                    for r in kcore(
                        e, k=k, max_rounds=cap, engine=engine, stats=st
                    ).collect()
                }
            out[engine] = (got, st["converged"])
        assert out["decremental"] == out["recompute"], (rows[:2], k, cap)
        assert out["decremental"][1] is False
        assert out["decremental"][0] == set(
            _kcore_peel_rounds(rows, k, cap).items()
        )


def test_kcore_rejects_unknown_engine(spark):
    from lvm_datapipe_spark.operators.graph import kcore

    e = spark.createDataFrame([(1, 2)], ["u", "v"])
    with pytest.raises(ValueError, match="engine"):
        kcore(e, engine="decremental ")


def test_fresh_local_checkpoint_bounds_catalyst_stats(spark):
    """Regression for the r10 latent driver bug: a loop that joins TWO
    references of the previous round's checkpoint doubles the carried
    Catalyst sizeInBytes estimate's DIGIT COUNT per round (measured
    9 -> 19 -> 41 -> 83 ... under plain localCheckpoint), stalling the
    driver in BigInteger multiplication around round ~20 and dying with
    'BigInteger would overflow supported range' on long peels.
    fresh_local_checkpoint rebuilds the frame from the checkpointed RDD
    WITHOUT originStats, pinning the estimate at defaultSizeInBytes."""
    from lvm_datapipe_spark.operators.graph import fresh_local_checkpoint

    def digits(df):
        s = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return len(str(s))

    e = spark.createDataFrame([(i, i + 1) for i in range(29)], ["u", "v"])
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    rows_before = None
    a = fresh_local_checkpoint(sym.select(F.col("u").alias("p")).distinct())
    for _ in range(4):
        au = a.select(F.col("p").alias("_au"))
        av = a.select(F.col("p").alias("_av"))
        deg = (
            sym.join(au, F.col("_au") == F.col("u"))
            .join(av, F.col("_av") == F.col("v"))
            .groupBy(F.col("u").alias("p"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        a = fresh_local_checkpoint(deg.filter(F.col("deg") >= 2).select("p"))
        # plain localCheckpoint reads 41 digits by the 2nd round and 169
        # by the 4th; the fresh rebuild must stay at defaultSizeInBytes
        # scale (19-20 digits) every round
        assert digits(a) <= 25
        n = a.count()
        assert rows_before is None or n <= rows_before
        rows_before = n
    sym.unpersist()
    # and the data itself survives the rebuild: schema + row identity
    assert a.columns == ["p"]


def test_kcore_string_node_ids_both_engines(spark):
    """kcore is type-generic in the node id (the ADVICE r9 empty-frame fix
    derives the type from the edges); both engines must handle non-long
    ids end to end, including the typed empty result."""
    from lvm_datapipe_spark.operators.graph import kcore

    rows = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    e = spark.createDataFrame(rows, "u string, v string")
    expect = {("a", 2), ("b", 2), ("c", 2)}
    for engine in ("decremental", "recompute"):
        got = {
            (r.node, r.core_degree)
            for r in kcore(e, k=2, engine=engine).collect()
        }
        assert got == expect, engine
    empty = spark.createDataFrame([], "u string, v long")
    for engine in ("decremental", "recompute"):
        out = kcore(
            empty.select("u", F.col("v").cast("string")), k=2, engine=engine
        )
        assert out.count() == 0
        assert dict(out.dtypes)["node"] == "string", engine


def test_fresh_local_checkpoint_roundtrips_mixed_schema(spark):
    """The rebuilt frame must be data-identical to the checkpointed one
    for the schema shapes the engine actually uses (longs, strings,
    doubles, arrays, nulls) — internalCreateDataFrame wraps the SAME
    checkpointed InternalRow RDD, so this pins the plumbing, not Spark."""
    from lvm_datapipe_spark.operators.graph import fresh_local_checkpoint

    df = spark.createDataFrame(
        [
            (1, "a", 1.5, [1, 2], None),
            (2, None, float("nan"), [], "x"),
            (3, "c", -0.0, None, "y"),
        ],
        "id long, s string, d double, arr array<int>, t string",
    )
    got = fresh_local_checkpoint(df)
    assert got.schema == df.schema
    a = sorted(map(repr, df.collect()))
    b = sorted(map(repr, got.collect()))
    assert a == b
    # and it is reusable downstream like any frame: joins + aggregates
    assert got.join(got.select(F.col("id").alias("id2")),
                    F.col("id") == F.col("id2")).count() == 3


def test_kcore_engines_agree_with_self_loops_and_duplicates(spark):
    """Degenerate edge lists (self-loops, duplicate and reversed pairs)
    must not split the engines: the symmetric-distinct edge build
    canonicalizes them identically, and a self-loop contributes exactly
    one degree on both paths (matching the python reference, whose
    adjacency set also holds u in adj[u])."""
    from lvm_datapipe_spark.operators.graph import kcore

    rows = [
        (1, 2), (2, 1), (1, 2),          # duplicate + reversed
        (2, 3), (1, 3),
        (3, 3),                          # self-loop on a core member
        (9, 9),                          # isolated self-loop node
    ]
    e = spark.createDataFrame(rows, ["u", "v"])
    out = {}
    for engine in ("decremental", "recompute"):
        st: dict = {}
        out[engine] = (
            {
                (r.node, r.core_degree)
                for r in kcore(e, k=2, engine=engine, stats=st).collect()
            },
            st["converged"],
        )
    assert out["decremental"] == out["recompute"]
    assert out["decremental"][0] == set(_kcore_reference(rows, 2).items())


def test_twophase_precontract_matches_union_find(spark):
    """precontract=True must label chains, cliques, hubs, self-loops and
    random graphs identically to the union-find ground truth (and hence
    to the plain loop, pinned separately by the Hypothesis property)."""
    import random

    from lvm_datapipe_spark.operators.graph import (
        connected_components_twophase,
    )

    rng = random.Random(20260817)
    shapes = [
        [(i, i + 1) for i in range(40)],
        [(a, b) for a in range(8) for b in range(a + 1, 8)] + [(20, 21)],
        [(100, i) for i in range(50)] + [(7, 7), (300, 300)],
        [(rng.randrange(60), rng.randrange(60)) for _ in range(70)],
    ]
    for rows in shapes:
        expect = set(_uf_components(rows).items())
        got = {
            (r.id, r.cluster_id)
            for r in connected_components_twophase(
                _pairs(spark, rows), precontract=True
            ).collect()
        }
        assert got == expect


def test_twophase_precontract_full_contraction_coalesce_path(spark):
    """Disjoint cliques contract away ENTIRELY in the pre-pass (empty
    contracted edge set): every rep must label itself via the expansion
    coalesce, and the rep is provably the component minimum."""
    from lvm_datapipe_spark.operators.graph import (
        connected_components_twophase,
    )

    rows = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [
        (a, b) for a in range(10, 14) for b in range(a + 1, 14)
    ]
    stats: dict = {}
    got = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(
            # gate BELOW the 16 raw edges so the round-0 driver finish
            # does not bypass the pre-contraction under test
            _pairs(spark, rows),
            precontract=True,
            stats=stats,
            driver_finish_max_edges=4,
        ).collect()
    }
    assert got == {(i, 0) for i in range(5)} | {
        (i, 10) for i in range(10, 14)
    }
    # the loop saw an (empty) contracted graph and stopped immediately
    assert stats["rounds"] == 1


def test_twophase_precontract_string_ids_and_symmetric(spark):
    """precontract composes with string node ids and with
    assume_symmetric=True (the geo_dbscan calling convention)."""
    from lvm_datapipe_spark.operators.graph import (
        connected_components_twophase,
    )

    rows = [("b", "a"), ("b", "c"), ("x", "y"), ("z", "z")]
    expect = set(_uf_components(rows).items())
    got = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(
            _pairs(spark, rows), precontract=True
        ).collect()
    }
    assert got == expect
    sym_rows = rows + [(b, a) for a, b in rows]
    got_sym = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(
            _pairs(spark, sym_rows),
            precontract=True,
            assume_symmetric=True,
        ).collect()
    }
    assert got_sym == expect


def test_geo_dbscan_subcell_contraction_invariants(spark):
    """The r11 geometric pre-contraction in geo_dbscan_clusters rests on
    two facts, pinned here: (1) the subcell side s = 35355 satisfies the
    diameter identity 2*s^2 <= eps^2 (any two points in one subcell are
    within eps, so same-subcell CORE points are directly connected and
    provably one cluster); (2) on real data, all core points sharing a
    subcell get the SAME cluster label from the declared query."""
    from lvm_datapipe_spark.queries import QUERIES, _geo_col
    from pyspark.sql import functions as F

    s, eps = 35_355, 50_000
    assert 2 * s * s <= eps * eps  # exact integer identity
    out = QUERIES["geo_dbscan_clusters"](spark, SF0001)
    core = out.filter(F.col("role") == "core").select(
        F.col("c_custkey").alias("id"), "cluster_id"
    )
    from lvm_datapipe_spark.catalog import load_table

    cust = load_table(spark, SF0001, "customer")
    cells = cust.select(
        F.col("c_custkey").alias("id"),
        (_geo_col("c_custkey", "geox") / s).cast("long").alias("sx"),
        (_geo_col("c_custkey", "geoy") / s).cast("long").alias("sy"),
    )
    per_cell = (
        core.join(cells, "id")
        .groupBy("sx", "sy")
        .agg(F.count_distinct("cluster_id").alias("k"))
        .agg(F.max("k").alias("mx"))
        .collect()[0]["mx"]
    )
    assert per_cell in (None, 1)


@pytest.mark.slow  # >=7 s equivalence test (r11 tier split)
def test_twophase_round0_and_midloop_gate_paths_agree(spark):
    """The driver-finish gate has two firing points: ROUND 0 (raw edge
    list already within the bound — skips the loop entirely) and
    MID-LOOP (a round's parent set contracts under the bound).  Both
    must label identically to the pure distributed fixpoint.  A
    30-clique (435 raw edges, 29 parent edges after one round) with
    gate=100 exercises the mid-loop path; gate=1000 exercises round 0."""
    from lvm_datapipe_spark.operators.graph import (
        connected_components_twophase,
    )

    rows = [(a, b) for a in range(30) for b in range(a + 1, 30)] + [
        (100, 101), (101, 102), (200, 200)
    ]
    pairs = _pairs(spark, rows)
    expect = set(_uf_components(rows).items())
    s0: dict = {}
    round0 = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(
            pairs, driver_finish_max_edges=1000, stats=s0
        ).collect()
    }
    s_mid: dict = {}
    mid = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(
            pairs, driver_finish_max_edges=100, stats=s_mid
        ).collect()
    }
    s_pure: dict = {}
    pure = {
        (r.id, r.cluster_id)
        for r in connected_components_twophase(
            pairs, driver_finish_max_edges=None, stats=s_pure
        ).collect()
    }
    assert round0 == mid == pure == expect
    assert s0["driver_finish"] and s0["rounds"] == 0
    assert s_mid["driver_finish"] and s_mid["rounds"] >= 1
    assert not s_pure["driver_finish"]
