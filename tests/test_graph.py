"""PageRank tests: closed-form checks on known graphs, dangling-mass
handling, mass conservation, and parallelism invariance."""

import pyspark.sql.functions as F
import pytest

from minimel_spark.operators.graph import pagerank


def _mk(spark, edge_list, node_ids):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in node_ids], "node long")
    return edges, nodes


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_cycle_is_uniform(spark):
    """On a directed cycle every node has the same rank = 1/N at every
    iteration (the uniform distribution is stationary)."""
    n = 5
    edges, nodes = _mk(spark, [(i, (i + 1) % n) for i in range(n)], range(n))
    got = _ranks(pagerank(edges, nodes, n_iter=7))
    for v in got.values():
        assert v == pytest.approx(1.0 / n, abs=1e-12)


def test_pagerank_matches_numpy_power_iteration(spark):
    """Exact recurrence parity with an independent dense NumPy implementation
    on a small asymmetric graph with a dangling node."""
    import numpy as np

    n, d, iters = 6, 0.85, 10
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 0), (4, 1), (4, 2)]
    # node 5 is isolated (dangling, never linked); node 3 dangles nothing in,
    # out-degree 1
    edges, nodes = _mk(spark, edge_list, range(n))

    deg = np.zeros(n)
    for s, _ in edge_list:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = r[deg == 0].sum()
        nxt += d * dangling / n
        for s, t in edge_list:
            nxt[t] += d * r[s] / deg[s]
        r = nxt
    got = _ranks(pagerank(edges, nodes, n_iter=iters, damping=d))
    for i in range(n):
        assert got[i] == pytest.approx(r[i], abs=1e-12), i


def test_pagerank_conserves_mass(spark):
    """Σ rank = 1 after any number of iterations (dangling redistribution
    keeps the distribution normalized)."""
    edges, nodes = _mk(spark, [(0, 1), (1, 2), (3, 1)], range(5))
    total = sum(_ranks(pagerank(edges, nodes, n_iter=10)).values())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_parallelism_invariant(spark):
    """Repartitioned input produces the same 6-decimal ranks (accumulation-
    order noise stays far below the gate's rounding)."""
    edge_list = [(i, (i * 7 + 3) % 40) for i in range(40)] + [
        (i, (i * 11 + 5) % 40) for i in range(40)
    ]
    edge_list = [(s, t) for s, t in edge_list if s != t]
    edges, nodes = _mk(spark, edge_list, range(40))
    a = _ranks(pagerank(edges, nodes, n_iter=10))
    b = _ranks(pagerank(edges.repartition(13), nodes.repartition(7), n_iter=10))
    assert {k: round(v, 6) for k, v in a.items()} == {
        k: round(v, 6) for k, v in b.items()
    }


# --------------------------------------------------------------------------
# triangle_counts
# --------------------------------------------------------------------------

from minimel_spark.operators.graph import triangle_counts  # noqa: E402


def _tri(df):
    return {r["node"]: (r["deg"], r["n_tri"], r["lcc"]) for r in df.collect()}


def test_triangles_k4(spark):
    """K4: every node has deg 3, sits in C(3,2)=3 triangles, lcc 1.0."""
    edge_list = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges, nodes = _mk(spark, edge_list, range(4))
    got = _tri(triangle_counts(edges, nodes))
    assert got == {i: (3, 3, 1.0) for i in range(4)}


def test_triangles_direction_loops_parallel_edges_erased(spark):
    """Triangle 0-1-2 plus pendant 3: reversed duplicates, a self-loop and a
    parallel edge must not change the undirected simple-graph answer; the
    pendant and the isolated node 4 get n_tri=0, lcc=0.0."""
    edge_list = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2), (2, 3)]
    edges, nodes = _mk(spark, edge_list, range(5))
    got = _tri(triangle_counts(edges, nodes))
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, pytest.approx(1.0 / 3))
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def _py_triangles(edge_list, node_ids):
    """Brute-force reference: undirected simple graph, count per node."""
    adj = {i: set() for i in node_ids}
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = {}
    for v in node_ids:
        nbrs = sorted(adj[v])
        t = sum(
            1
            for i, x in enumerate(nbrs)
            for y in nbrs[i + 1 :]
            if y in adj[x]
        )
        d = len(nbrs)
        out[v] = (d, t, 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0)
    return out


def test_triangles_match_bruteforce_random_graph(spark):
    """md5-style deterministic pseudo-random graph vs the O(n*d^2)
    brute force — exercises ties in the (deg, node) total order."""
    import hashlib

    n, m = 40, 180
    edge_list = []
    for k in range(m):
        h = hashlib.md5(f"t{k}".encode()).hexdigest()
        edge_list.append((int(h[:8], 16) % n, int(h[8:16], 16) % n))
    edges, nodes = _mk(spark, edge_list, range(n))
    got = _tri(triangle_counts(edges, nodes))
    want = _py_triangles(edge_list, range(n))
    assert set(got) == set(want)
    for v in want:
        assert got[v][:2] == want[v][:2], (v, got[v], want[v])
        assert got[v][2] == pytest.approx(want[v][2], abs=1e-12)


def test_triangles_parallelism_invariant(spark):
    import hashlib

    n, m = 30, 100
    edge_list = []
    for k in range(m):
        h = hashlib.md5(f"p{k}".encode()).hexdigest()
        edge_list.append((int(h[:8], 16) % n, int(h[8:16], 16) % n))
    a = _tri(
        triangle_counts(*_mk(spark, edge_list, range(n)))
    )
    b = _tri(
        triangle_counts(
            spark.createDataFrame(edge_list, "src long, dst long").repartition(17),
            spark.createDataFrame([(i,) for i in range(n)], "node long").coalesce(1),
        )
    )
    assert a == b


def test_triangles_persisted_out_identical_and_released(spark):
    edge_list = [(a, b) for a in range(4) for b in range(4) if a < b] + [(0, 4)]
    edges, nodes = _mk(spark, edge_list, range(5))
    caches = []
    a = _tri(triangle_counts(edges, nodes, persisted_out=caches))
    assert len(caches) == 3  # und, deg, oriented
    assert all(c.storageLevel.useMemory or c.storageLevel.useDisk for c in caches)
    for c in caches:
        c.unpersist(blocking=True)
    b = _tri(triangle_counts(edges, nodes))
    assert a == b
    # per-cache check, not a global persistent-RDD count: unpersists from
    # OTHER tests sharing the session complete asynchronously, so a global
    # count races (the source of a full-suite-only flake)
    assert not any(
        c.storageLevel.useMemory or c.storageLevel.useDisk for c in caches
    )


def test_lpa_two_triangles_bridge(spark):
    from minimel_spark.operators.graph import lpa_communities

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    got = {
        r["node"]: r["community"]
        for r in lpa_communities(edges, nodes, n_iter=6).collect()
    }
    # the two triangles settle into distinct communities despite the bridge
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]
    # isolated node keeps its own label
    assert got[7] == 7


def test_lpa_deterministic_ties(spark):
    from minimel_spark.operators.graph import lpa_communities

    # single edge: both nodes adopt the partner's label, min-tie irrelevant;
    # after 2 rounds labels swap back — fixed n_iter pins the oscillation
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "node long")
    one = {
        r["node"]: r["community"]
        for r in lpa_communities(edges, nodes, n_iter=1).collect()
    }
    assert one == {1: 2, 2: 1}
    two = {
        r["node"]: r["community"]
        for r in lpa_communities(edges, nodes, n_iter=2).collect()
    }
    assert two == {1: 1, 2: 2}


def test_k_core_peels_tail(spark):
    from minimel_spark.operators.graph import k_core

    # triangle {1,2,3} + path 3-4-5: 2-core = the triangle only
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    got = {
        r["node"]: r["in_core"] for r in k_core(edges, nodes, k=2, n_iter=5).collect()
    }
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False}
    # peeling is monotone: one more round past fixpoint changes nothing
    again = {
        r["node"]: r["in_core"] for r in k_core(edges, nodes, k=2, n_iter=6).collect()
    }
    assert again == got


def test_k_core_validates_k(spark):
    import pytest

    from minimel_spark.operators.graph import k_core

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "node long")
    with pytest.raises(ValueError, match="k must be"):
        k_core(edges, nodes, k=0)


def test_neighborhood_evidence_hand_example(spark):
    import math

    from minimel_spark.operators.graph import neighborhood_evidence

    # a: {x, y}; b: {y, z}; c: {} — y is shared by a,b (deg 2)
    links = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "y"), (2, "z"), (1, "y")],  # dup link dropped
        "rec_id long, nbr_id string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in neighborhood_evidence(pairs, links).collect()
    }
    r12 = rows[(1, 2)]
    assert (r12["n_a"], r12["n_b"], r12["n_shared"]) == (2, 2, 1)
    assert abs(r12["jacc_nbr"] - 1 / 3) < 1e-12
    assert abs(r12["adamic_adar"] - 1 / math.log(2)) < 1e-12
    # record 3 has no links at all: zeros, not dropped
    r13 = rows[(1, 3)]
    assert (r13["n_a"], r13["n_b"], r13["n_shared"]) == (2, 0, 0)
    assert r13["jacc_nbr"] == 0.0 and r13["adamic_adar"] == 0.0


def test_neighborhood_evidence_empty_both_sides(spark):
    from minimel_spark.operators.graph import neighborhood_evidence

    links = spark.createDataFrame([(9, "q")], "rec_id long, nbr_id string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = neighborhood_evidence(pairs, links).collect()[0]
    # both neighborhoods empty -> union 0 -> jaccard 0.0 (guarded)
    assert row["jacc_nbr"] == 0.0 and row["n_shared"] == 0


def test_transitivity_audit_hand_graph(spark):
    from minimel_spark.operators.graph import transitivity_audit

    # triangle 1-2-3 plus a pendant 3-4: wedges = C(2,2 at 1,2)=1+1,
    # at 3 deg=3 -> 3 wedges, at 4 deg=1 -> 0  => 5 wedges, 3 closed
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (3, 4), (4, 3), (5, 5)],
        "src long, dst long",
    )
    r = transitivity_audit(edges).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 4  # dups/self-loop erased
    assert r["n_wedges"] == 5
    assert r["n_closed"] == 3 and r["n_open"] == 2
    assert abs(r["transitivity"] - 0.6) < 1e-12


def test_transitivity_audit_wedge_free(spark):
    from minimel_spark.operators.graph import transitivity_audit

    edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    r = transitivity_audit(edges).collect()[0]
    assert r["n_wedges"] == 0 and r["transitivity"] == 0.0


def test_knn_sparsify_mutual_dehubs(spark):
    import pytest

    from minimel_spark.operators.graph import knn_sparsify

    # hub 0 connects to 1..5 with high scores; 1..5 also form a weak ring.
    # k=2 mutual: the hub keeps only its top-2 (1, 2), and only nodes that
    # rank the hub back survive.
    edges = [(0, i, 1.0 - 0.01 * i) for i in range(1, 6)]
    edges += [(1, 2, 0.5), (2, 3, 0.5), (3, 4, 0.5), (4, 5, 0.5)]
    df = spark.createDataFrame(edges, "src long, dst long, score double")
    out = {(r["src"], r["dst"]) for r in knn_sparsify(df, k=2, mutual=True).collect()}
    # hub's top-2 are 1 and 2; both rank the hub first (0.99/0.98 > 0.5)
    assert (0, 1) in out and (0, 2) in out
    # 3,4,5 were pruned from the hub's list -> no mutual edge with 0
    assert not any(a == 0 and b > 2 for a, b in out)
    # every node's degree is bounded by k
    from collections import Counter

    deg = Counter()
    for a, b in out:
        deg[a] += 1
        deg[b] += 1
    assert max(deg.values()) <= 2
    with pytest.raises(ValueError):
        knn_sparsify(df, k=0)


def test_knn_sparsify_union_mode_keeps_either_direction(spark):
    from minimel_spark.operators.graph import knn_sparsify

    # star: center 9 with 3 spokes; k=1. Center keeps only spoke 1, but
    # each spoke keeps the center -> union mode keeps all 3, mutual only 1.
    edges = [(9, 1, 0.9), (9, 2, 0.8), (9, 3, 0.7)]
    df = spark.createDataFrame(edges, "src long, dst long, score double")
    mutual = {(r["src"], r["dst"]) for r in knn_sparsify(df, k=1).collect()}
    union = {
        (r["src"], r["dst"]) for r in knn_sparsify(df, k=1, mutual=False).collect()
    }
    assert mutual == {(1, 9)}
    assert union == {(1, 9), (2, 9), (3, 9)}
    # scores survive the canonical src<dst ordering
    scores = {
        (r["src"], r["dst"]): r["score"]
        for r in knn_sparsify(df, k=1, mutual=False).collect()
    }
    assert scores[(2, 9)] == 0.8


def test_cocitation_coupling_hand_graph(spark):
    from minimel_spark.operators.graph import cocitation_coupling

    # 1->{10,11}, 2->{10,11}, 3->{10}, 4->{20}; 10 cited by 1,2,3
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (4, 20), (1, 10)],
        "src long, dst long",
    )
    got = {
        (r["kind"], r["node_a"], r["node_b"]): r["n_shared"]
        for r in cocitation_coupling(edges).collect()
    }
    # coupling: shared out-neighbors (parallel edge 1->10 counted once)
    assert got[("coupling", 1, 2)] == 2
    assert got[("coupling", 1, 3)] == 1 and got[("coupling", 2, 3)] == 1
    assert ("coupling", 1, 4) not in got
    # cocitation: shared in-neighbors
    assert got[("cocitation", 10, 11)] == 2
    assert ("cocitation", 10, 20) not in got
    # min_shared filter
    only2 = {
        (r["kind"], r["node_a"], r["node_b"])
        for r in cocitation_coupling(edges, min_shared=2).collect()
    }
    assert only2 == {("coupling", 1, 2), ("cocitation", 10, 11)}


def test_cocitation_coupling_partition_invariant(spark):
    import pytest as _pytest

    from minimel_spark.operators.graph import cocitation_coupling

    edges = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(60)] + [(i, (i * 5) % 13) for i in range(60)],
        "src long, dst long",
    )
    a = sorted(map(tuple, cocitation_coupling(edges.coalesce(1)).collect()))
    b = sorted(map(tuple, cocitation_coupling(edges.repartition(16)).collect()))
    assert a == b and len(a) > 0
    with _pytest.raises(ValueError):
        cocitation_coupling(edges, min_shared=0)


def test_bowtie_regions_hand_graph(spark):
    from minimel_spark.operators.graph import bowtie_regions

    # seed = max total degree -> node 1 (deg 3, cycle + in-link). core =
    # {1,2,3} cycle; 10 reaches core (in); 20 reached from core (out);
    # 50 hangs off OUT against the arrows (tendril); 60-61 separate.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 1), (3, 20), (50, 20), (60, 61)],
        "src long, dst long",
    )
    got = dict(map(tuple, bowtie_regions(edges).collect()))
    assert got == {
        1: "core", 2: "core", 3: "core", 10: "in", 20: "out",
        50: "tendril", 60: "disconnected", 61: "disconnected",
    }
    # isolated node from the nodes frame joins as disconnected
    nodes = spark.createDataFrame([(99,)], "node long")
    got2 = dict(map(tuple, bowtie_regions(edges, nodes=nodes).collect()))
    assert got2[99] == "disconnected" and got2[1] == "core"


def test_bowtie_partition_invariant(spark):
    import pytest as _pytest

    from minimel_spark.operators.graph import bowtie_regions

    edges = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)]         # one big cycle (core)
        + [(100 + i, i % 20) for i in range(10)]        # in-fringe
        + [(i % 20, 200 + i) for i in range(10)],       # out-fringe
        "src long, dst long",
    )
    a = sorted(map(tuple, bowtie_regions(edges.coalesce(1)).collect()))
    b = sorted(map(tuple, bowtie_regions(edges.repartition(16)).collect()))
    assert a == b
    regions = {r for _, r in a}
    assert regions == {"core", "in", "out"}
    with _pytest.raises(ValueError):
        bowtie_regions(edges, max_rounds=0)


def test_distance_census_hand_graph(spark):
    from minimel_spark.operators.graph import distance_census

    # chain 1 -> 2 -> 3 -> 4, plus isolated 9 (via nodes frame)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(9,)], "node long")
    got = {
        (r["seed"], r["dist"]): r["n_nodes"]
        for r in distance_census(edges, n_seeds=2, max_dist=12, nodes=nodes).collect()
    }
    # seeds = two smallest ids: 1 and 2
    assert got[(1, 0)] == 1 and got[(1, 1)] == 1 and got[(1, 3)] == 1
    assert got[(1, -1)] == 1            # node 9 unreachable from 1
    assert got[(2, 2)] == 1             # 2 -> 3 -> 4
    assert got[(2, -1)] == 2            # 1 and 9 unreachable from 2
    # distance bound is part of the semantics
    short = {
        (r["seed"], r["dist"]): r["n_nodes"]
        for r in distance_census(edges, n_seeds=1, max_dist=1).collect()
    }
    assert short[(1, -1)] == 2          # 3 and 4 beyond the 1-hop bound


def test_distance_census_partition_invariant(spark):
    import pytest as _pytest

    from minimel_spark.operators.graph import distance_census

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 50) for i in range(50)], "src long, dst long"
    )
    a = sorted(map(tuple, distance_census(edges.coalesce(1), n_seeds=3).collect()))
    b = sorted(map(tuple, distance_census(edges.repartition(16), n_seeds=3).collect()))
    assert a == b and len(a) > 0
    with _pytest.raises(ValueError):
        distance_census(edges, n_seeds=0)


def test_degree_assortativity_star_is_minus_one(spark):
    from minimel_spark.operators.graph import degree_assortativity

    # star K1,3: hub degree 3, leaves degree 1 -> perfectly disassortative
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "src long, dst long"
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["n_nodes"] == 4 and row["n_edges"] == 3
    assert row["assortativity"] == -1.0


def test_degree_assortativity_regular_graph_is_null(spark):
    from minimel_spark.operators.graph import degree_assortativity

    # 4-cycle: every degree 2 -> zero variance -> undefined (NULL)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["n_nodes"] == 4 and row["n_edges"] == 4
    assert row["assortativity"] is None


def test_degree_assortativity_dedups_and_drops_self_loops(spark):
    from minimel_spark.operators.graph import degree_assortativity

    # same star, buried in duplicates / reversals / self-loops
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 3), (3, 3), (1, 4), (4, 4)],
        "src long, dst long",
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["n_nodes"] == 4 and row["n_edges"] == 3
    assert row["assortativity"] == -1.0


def test_degree_assortativity_matches_numpy_and_partitioning(spark):
    import numpy as np

    from minimel_spark.operators.graph import degree_assortativity

    pairs = sorted(
        {
            (min(i, (i * 7 + 3) % 40), max(i, (i * 7 + 3) % 40))
            for i in range(40)
            if i != (i * 7 + 3) % 40
        }
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    row = degree_assortativity(edges.repartition(16)).collect()[0]
    row1 = degree_assortativity(edges.coalesce(1)).collect()[0]
    assert tuple(row) == tuple(row1)

    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = np.array([deg[a] for a, b in pairs] + [deg[b] for a, b in pairs], float)
    ys = np.array([deg[b] for a, b in pairs] + [deg[a] for a, b in pairs], float)
    expected = np.corrcoef(xs, ys)[0, 1]
    assert row["n_nodes"] == len(deg) and row["n_edges"] == len(pairs)
    assert abs(row["assortativity"] - expected) < 1e-6


def test_ktruss_peel_k4_core_survives(spark):
    from minimel_spark.operators.graph import ktruss_peel

    # K4 on {1..4} + pendant triangle {4,5,6} + bridge (6,7):
    # round 1 peels the triangle (support 1) and the bridge (support 0),
    # round 2 finds the K4 fixpoint (every edge support 2).
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 6), (4, 6), (6, 7)], "src long, dst long"
    )
    rows = [tuple(r) for r in ktruss_peel(edges, k=4, rounds=3).collect()]
    assert rows == [
        (1, 10, 4, 6, False),
        (2, 6, 0, 6, True),
        (3, 6, 0, 6, True),
    ]


def test_ktruss_peel_cascade_multiround(spark):
    from minimel_spark.operators.graph import ktruss_peel

    # triangle strip 1..6: peeling cascades — end edges fall first, the
    # survivors lose their triangles, everything is gone by round 2.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)] + [(i, i + 2) for i in range(1, 5)],
        "src long, dst long",
    )
    rows = [tuple(r) for r in ktruss_peel(edges, k=4, rounds=3).collect()]
    assert rows == [
        (1, 9, 6, 3, False),
        (2, 3, 3, 0, False),
        (3, 0, 0, 0, True),
    ]


def test_ktruss_peel_partition_invariant_and_validation(spark):
    import pytest as _pytest

    from minimel_spark.operators.graph import ktruss_peel

    edges = spark.createDataFrame(
        [(i % 23, (i * 7 + 3) % 23) for i in range(80)], "src long, dst long"
    )
    a = [tuple(r) for r in ktruss_peel(edges.coalesce(1), k=4, rounds=3).collect()]
    b = [tuple(r) for r in ktruss_peel(edges.repartition(16), k=4, rounds=3).collect()]
    assert a == b and len(a) == 3
    # duplicates / reversals / self-loops collapse before round 1
    noisy = edges.unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    c = [tuple(r) for r in ktruss_peel(noisy, k=4, rounds=3).collect()]
    assert c == a
    with _pytest.raises(ValueError):
        ktruss_peel(edges, k=2)
    with _pytest.raises(ValueError):
        ktruss_peel(edges, rounds=0)


def test_rich_club_hand_graph(spark):
    from minimel_spark.operators.graph import rich_club

    # K4 core {1..4} plus a pendant leaf on each core node: core degrees 4,
    # leaves degree 1. k=1..3 rich set = core (+nothing else), phi = density
    # of K4 = 1.0; k>=4 empty.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    leaves = [(i, i + 10) for i in range(1, 5)]
    edges = spark.createDataFrame(k4 + leaves, "src long, dst long")
    rows = {r["k"]: tuple(r) for r in rich_club(edges, max_k=5).collect()}
    assert rows[1] == (1, 4, 6, 1.0)
    assert rows[3] == (3, 4, 6, 1.0)
    assert rows[4] == (4, 0, 0, None)
    assert rows[5] == (5, 0, 0, None)


def test_rich_club_star_no_club(spark):
    from minimel_spark.operators.graph import rich_club

    # star: hub degree 5, leaves 1 -> for k in 1..4 the rich set is {hub}
    # alone (N_k = 1 -> phi NULL, no self-edges)
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    rows = {r["k"]: tuple(r) for r in rich_club(edges, max_k=4).collect()}
    assert rows[1] == (1, 1, 0, None)
    assert rows[4] == (4, 1, 0, None)


def test_rich_club_partition_invariant_and_validation(spark):
    import pytest as _pytest

    from minimel_spark.operators.graph import rich_club

    edges = spark.createDataFrame(
        [(i % 31, (i * 11 + 5) % 31) for i in range(120)], "src long, dst long"
    )
    a = sorted(map(tuple, rich_club(edges.coalesce(1), max_k=6).collect()))
    b = sorted(map(tuple, rich_club(edges.repartition(16), max_k=6).collect()))
    assert a == b and len(a) == 6
    with _pytest.raises(ValueError):
        rich_club(edges, max_k=0)


def test_pagerank_weighted_reduces_to_uniform_on_equal_weights(spark):
    from minimel_spark.operators.graph import pagerank, pagerank_weighted

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "node long")
    wedges = edges.withColumn("w", F.lit(7))
    a = {r["node"]: round(r["rank"], 12)
         for r in pagerank(edges, nodes, n_iter=8).collect()}
    b = {r["node"]: round(r["rank"], 12)
         for r in pagerank_weighted(wedges, nodes, n_iter=8).collect()}
    assert a == b


def test_pagerank_weighted_mass_conserved_and_weight_skew(spark):
    from minimel_spark.operators.graph import pagerank_weighted

    # node 1 sends 9/10 of its rank to 2 and 1/10 to 3
    edges = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1), (2, 1, 1), (3, 1, 1)],
        "src long, dst long, w long",
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    got = {r["node"]: r["rank"]
           for r in pagerank_weighted(edges, nodes, n_iter=12).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[2] > got[3] * 2


def test_pagerank_weighted_dangling_and_partition_invariance(spark):
    from minimel_spark.operators.graph import pagerank_weighted

    # node 3 has no out-edges: its mass redistributes uniformly
    edges = spark.createDataFrame(
        [(1, 3, 2), (2, 3, 5)], "src long, dst long, w long"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    a = sorted(
        (r["node"], round(r["rank"], 12))
        for r in pagerank_weighted(edges.coalesce(1), nodes, n_iter=6).collect()
    )
    b = sorted(
        (r["node"], round(r["rank"], 12))
        for r in pagerank_weighted(edges.repartition(8), nodes, n_iter=6).collect()
    )
    assert a == b
    got = dict(a)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[3] > got[1]


def test_pointer_doubling_chain_depths(spark):
    from minimel_spark.operators.graph import pointer_doubling_roots

    # chain 5->4->3->2->1->root(0), plus isolated root 9
    parents = spark.createDataFrame(
        [(0, None), (1, 0), (2, 1), (3, 2), (4, 3), (5, 4), (9, None)],
        "node long, parent long",
    )
    got = {r["node"]: (r["root"], r["depth"], r["resolved"])
           for r in pointer_doubling_roots(parents, rounds=3).collect()}
    assert got == {
        0: (0, 0, True), 1: (0, 1, True), 2: (0, 2, True), 3: (0, 3, True),
        4: (0, 4, True), 5: (0, 5, True), 9: (9, 0, True),
    }


def test_pointer_doubling_forest_and_budget_audit(spark):
    import pytest as _pytest

    from minimel_spark.operators.graph import pointer_doubling_roots

    # two trees; rounds=1 reaches ancestors at distance <= 2 only:
    # node 3 (depth 3) must come back resolved=False, not silently wrong
    parents = spark.createDataFrame(
        [(0, None), (1, 0), (2, 1), (3, 2), (10, None), (11, 10)],
        "node long, parent long",
    )
    got = {r["node"]: (r["root"], r["depth"], r["resolved"])
           for r in pointer_doubling_roots(parents, rounds=1).collect()}
    # rounds=1 certifies depth <= 2^1 - 1 = 1; node 2 already POINTS at the
    # root with the right depth but its certificate arrives a round later
    assert got[1] == (0, 1, True) and got[2] == (0, 2, False)
    assert got[11] == (10, 1, True)
    assert got[3][2] is False
    full = {r["node"]: r for r in pointer_doubling_roots(parents, rounds=2).collect()}
    assert full[3]["root"] == 0 and full[3]["depth"] == 3 and full[3]["resolved"]
    with _pytest.raises(ValueError):
        pointer_doubling_roots(parents, rounds=-1)


def test_pointer_doubling_partition_invariant(spark):
    from minimel_spark.operators.graph import pointer_doubling_roots

    rows = [(0, None)] + [(i, (i * 7 + 3) % i if i > 1 else 0) for i in range(1, 60)]
    parents = spark.createDataFrame(rows, "node long, parent long")
    a = sorted(map(tuple, pointer_doubling_roots(parents.coalesce(1), rounds=6).collect()))
    b = sorted(map(tuple, pointer_doubling_roots(parents.repartition(16), rounds=6).collect()))
    assert a == b and all(t[3] for t in a)


def _kruskal(n_edges):
    """Pure-python Kruskal with (w, a, b) tie-break — the sequential
    reference the distributed Borůvka must equal (unique forest under the
    lexicographic total order even with duplicate weights)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = []
    for w, a, b in sorted((w, a, b) for a, b, w in n_edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            mst.append((a, b, w))
    return sorted(mst)


def test_boruvka_mst_equals_kruskal_random(spark):
    from minimel_spark.operators.graph import boruvka_mst

    edges = []
    for i in range(150):
        a, b = i % 60, (i * 7 + 3) % 60
        if a != b:
            w = (a * 131071 + b * 524287 + i * 7919) % 100003
            edges.append((min(a, b), max(a, b), w))
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = sorted((r["a"], r["b"], r["w"]) for r in boruvka_mst(df, rounds=8).collect())
    # dedupe parallel edges to min weight, as the operator does
    best = {}
    for a, b, w in edges:
        best[(a, b)] = min(best.get((a, b), w), w)
    want = _kruskal([(a, b, w) for (a, b), w in best.items()])
    assert got == want and len(got) > 0


def test_boruvka_mst_forest_and_chain(spark):
    from minimel_spark.operators.graph import boruvka_mst

    # two components: a triangle (drop the heaviest edge) + a chain
    edges = [(1, 2, 5), (2, 3, 3), (1, 3, 9), (10, 11, 1), (11, 12, 2)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = sorted(map(tuple, boruvka_mst(df, rounds=6).collect()))
    assert got == [(1, 2, 5), (2, 3, 3), (10, 11, 1), (11, 12, 2)]
    assert len(got) == 6 - 2  # N - #components


def test_boruvka_mst_duplicates_selfloops_partition_invariance(spark):
    import pytest as _pytest

    from minimel_spark.operators.graph import boruvka_mst

    edges = [(1, 2, 7), (2, 1, 4), (1, 1, 0), (2, 3, 4), (3, 2, 8), (1, 3, 6)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = sorted(map(tuple, boruvka_mst(df, rounds=4).collect()))
    # parallel (1,2) collapses to 4; self-loop dropped; (2,3)->4, (1,3)->6
    assert got == [(1, 2, 4), (2, 3, 4)]
    a = sorted(map(tuple, boruvka_mst(df.coalesce(1), rounds=4).collect()))
    b = sorted(map(tuple, boruvka_mst(df.repartition(8), rounds=4).collect()))
    assert a == b == got
    with _pytest.raises(ValueError):
        boruvka_mst(df, rounds=0)


def test_hyperball_nf_monotone_and_saturates(spark):
    from minimel_spark.operators.graph import hyperball_anf

    # path graph 0-1-2-3-4: balls grow then saturate at the component
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )
    rows = {r["r"]: r["nf"] for r in hyperball_anf(edges, rounds=5).collect()}
    assert len(rows) == 6
    # monotone non-decreasing, saturated once r >= diameter
    vals = [rows[i] for i in range(6)]
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))
    assert abs(vals[4] - vals[5]) < 1e-9
    # r=0: every ball has exactly 1 element -> 5 * (16 ln(16/15))
    import math

    assert abs(vals[0] - 5 * 16 * math.log(16 / 15)) < 1e-6


def test_hyperball_estimates_near_truth_small_balls(spark):
    from minimel_spark.operators.graph import hyperball_anf

    # two cliques of 6 and 4 (disjoint): at r>=1 every ball = its clique.
    # m=16 linear counting is ~20% SE per ball, and errors are FULLY
    # correlated within a clique (every member holds the same ball), so
    # the honest tolerance on the sum is ~30%
    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    k4 = [(10 + a, 10 + b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k6 + k4, "src long, dst long")
    rows = {r["r"]: r["nf"] for r in hyperball_anf(edges, rounds=2).collect()}
    truth = 6 * 6 + 4 * 4  # sum over nodes of |ball| = 36 + 16 = 52
    assert abs(rows[1] - truth) / truth < 0.3
    assert abs(rows[2] - rows[1]) < 1e-9  # saturated


def test_hyperball_partition_invariant_and_validation(spark):
    import pytest as _pytest

    from minimel_spark.operators.graph import hyperball_anf

    edges = spark.createDataFrame(
        [(i % 17, (i * 5 + 1) % 17) for i in range(50)], "src long, dst long"
    )
    a = [tuple(r) for r in hyperball_anf(edges.coalesce(1), rounds=3).collect()]
    b = [tuple(r) for r in hyperball_anf(edges.repartition(16), rounds=3).collect()]
    assert a == b and len(a) == 4
    with _pytest.raises(ValueError):
        hyperball_anf(edges, rounds=0)


def test_link_prediction_square_scores(spark):
    import math

    from minimel_spark.operators.graph import link_prediction_scores

    # 4-cycle 1-2-3-4-1: diagonals (1,3) and (2,4) share exactly {2,4} /
    # {1,3}; all degrees 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    got = {(r["node_a"], r["node_b"]): r
           for r in link_prediction_scores(edges).collect()}
    assert set(got) == {(1, 3), (2, 4)}
    r = got[(1, 3)]
    assert r["cn"] == 2 and r["jaccard"] == 1.0 and r["pref_attach"] == 4
    assert r["adamic_adar"] == round(2 / math.log(2), 6)
    assert r["resource_alloc"] == 1.0


def test_link_prediction_excludes_existing_edges_and_filters(spark):
    from minimel_spark.operators.graph import link_prediction_scores

    # close one diagonal: (1,3) is now an EDGE -> must disappear even
    # though it still has 2 shared neighbors
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "src long, dst long"
    )
    got = {(r["node_a"], r["node_b"]) for r in link_prediction_scores(edges).collect()}
    assert (1, 3) not in got and (2, 4) in got
    # min_common raises the floor
    import pytest as _pt

    assert link_prediction_scores(edges, min_common=3).count() == 0
    with _pt.raises(ValueError):
        link_prediction_scores(edges, min_common=0)


def test_link_prediction_partition_invariant(spark):
    from minimel_spark.operators.graph import link_prediction_scores

    edges = spark.createDataFrame(
        [(i % 19, (i * 3 + 1) % 19) for i in range(60)]
        + [(i % 19, (i * 7 + 2) % 19) for i in range(60)],
        "src long, dst long",
    )
    a = sorted(
        map(tuple, link_prediction_scores(edges.coalesce(1), min_common=1).collect())
    )
    b = sorted(
        map(tuple, link_prediction_scores(edges.repartition(16), min_common=1).collect())
    )
    assert a == b and len(a) > 0


def test_reciprocity_hand_graphs(spark):
    from minimel_spark.operators.graph import reciprocity

    # 1<->2 mutual, 1->3 and 3->2 one-way: L=4, mutual=2, N=3, abar=4/6
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 2)], "src long, dst long"
    )
    row = reciprocity(edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_mutual"]) == (3, 4, 2)
    assert row["r"] == 0.5
    abar = 4 / 6
    assert row["rho"] == round((0.5 - abar) / (1 - abar), 6)
    # fully mutual pair: r = 1, rho = 1 (abar = 1 -> NULL guard is for
    # the COMPLETE graph; here N=2, abar=1 -> rho NULL)
    pair = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    row2 = reciprocity(pair).collect()[0]
    assert row2["r"] == 1.0 and row2["rho"] is None


def test_reciprocity_ignores_loops_duplicates_and_is_invariant(spark):
    from minimel_spark.operators.graph import reciprocity

    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 1), (2, 3), (3, 2), (4, 4)], "src long, dst long"
    )
    row = reciprocity(edges).collect()[0]
    # simple edges: (1,2), (2,3), (3,2); mutual: (2,3),(3,2)
    assert (row["n_nodes"], row["n_edges"], row["n_mutual"]) == (3, 3, 2)
    a = tuple(reciprocity(edges.coalesce(1)).collect()[0])
    b = tuple(reciprocity(edges.repartition(8)).collect()[0])
    assert a == b


def test_deterministic_walks_structure_and_adjacency(spark):
    from minimel_spark.operators.graph import deterministic_walks

    # triangle: every step must land on a neighbor of the previous node
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    rows = deterministic_walks(edges, n_walks=2, walk_len=3).collect()
    # 3 starts x 2 walks x 4 steps (incl. step 0)
    assert len(rows) == 3 * 2 * 4
    adj = {1: {2, 3}, 2: {1, 3}, 3: {1, 2}}
    traj = {}
    for r in rows:
        traj[(r["start"], r["walk_id"], r["step"])] = r["node"]
    for (s, w, t), node in traj.items():
        if t == 0:
            assert node == s
        else:
            assert node in adj[traj[(s, w, t - 1)]], (s, w, t)


def test_deterministic_walks_python_replay(spark):
    import hashlib

    from minimel_spark.operators.graph import deterministic_walks

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 11) for i in range(11) if i != (i * 3 + 1) % 11],
        "src long, dst long",
    )
    got = {
        (r["start"], r["walk_id"], r["step"]): r["node"]
        for r in deterministic_walks(edges, n_walks=1, walk_len=4).collect()
    }
    adj = {}
    for r in edges.collect():
        a, b = min(r["src"], r["dst"]), max(r["src"], r["dst"])
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for s in adj:
        cur = s
        assert got[(s, 0, 0)] == s
        for t in range(1, 5):
            nbrs = sorted(adj[cur])
            h = int(hashlib.md5(f"walk:{s}:0:{t}".encode()).hexdigest()[:15], 16)
            cur = nbrs[h % len(nbrs)]
            assert got[(s, 0, t)] == cur, (s, t)


def test_deterministic_walks_partition_invariant_and_validation(spark):
    import pytest as _pt

    from minimel_spark.operators.graph import deterministic_walks

    edges = spark.createDataFrame(
        [(i % 13, (i * 5 + 2) % 13) for i in range(40)], "src long, dst long"
    )
    a = sorted(map(tuple, deterministic_walks(edges.coalesce(1)).collect()))
    b = sorted(map(tuple, deterministic_walks(edges.repartition(16)).collect()))
    assert a == b and len(a) > 0
    with _pt.raises(ValueError):
        deterministic_walks(edges, n_walks=0)
    with _pt.raises(ValueError):
        deterministic_walks(edges, walk_len=0)


def _py_luby(edge_list, node_list, rounds):
    """Pure-python replay of luby_mis: same md5 priorities, same rule."""
    import hashlib

    def pri(r, v):
        return int(hashlib.md5(f"mis:{r}:{v}".encode()).hexdigest()[:15], 16)

    und = {tuple(sorted((a, b))) for a, b in edge_list if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(node_list)
    out = []
    for r in range(1, rounds + 1):
        p = {v: (pri(r, v), v) for v in active}
        win = {
            v
            for v in active
            if all(p[v] < p[u] for u in adj.get(v, ()) if u in active)
        }
        dom = {
            u for v in win for u in adj.get(v, ()) if u in active
        }
        out += [(v, "mis", r) for v in win]
        out += [(u, "dominated", r) for u in dom]
        active -= win | dom
        if not active:
            break
    out += [(v, "unresolved", -1) for v in active]
    return sorted(out)


def test_luby_mis_matches_python_and_is_maximal_independent(spark):
    import random

    from minimel_spark.operators.graph import luby_mis

    rng = random.Random(5)
    for trial in range(3):
        n = 30
        edge_list = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(60)
        ]
        nodes = list(range(n))
        edges = spark.createDataFrame(edge_list or [(0, 0)], "src long, dst long")
        ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
        got = sorted(
            (r["node"], r["status"], r["round"])
            for r in luby_mis(edges, nodes=ndf, rounds=12).collect()
        )
        assert got == _py_luby(edge_list, nodes, 12), trial
        # structural checks: independence + maximality + full cover
        status = {v: s for v, s, _ in got}
        assert set(status) == set(nodes)
        und = {tuple(sorted((a, b))) for a, b in edge_list if a != b}
        mis = {v for v, s in status.items() if s == "mis"}
        assert not any(a in mis and b in mis for a, b in und)
        for v, s in status.items():
            if s == "dominated":
                assert any(
                    (min(v, u), max(v, u)) in und for u in mis
                ), v
        assert "unresolved" not in status.values()


def test_luby_mis_unresolved_certificate_and_invariance(spark):
    import pytest as _pt

    from minimel_spark.operators.graph import luby_mis

    # a path graph with rounds=1: exactly the round-1 winners + their
    # neighbors decide; interior leftovers surface as unresolved
    edge_list = [(i, i + 1) for i in range(40)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    one = luby_mis(edges, rounds=1).collect()
    assert {r["status"] for r in one} >= {"mis"}
    py = _py_luby(edge_list, sorted({v for e in edge_list for v in e}), 1)
    assert sorted((r["node"], r["status"], r["round"]) for r in one) == py
    a = sorted(map(tuple, luby_mis(edges.coalesce(1), rounds=6).collect()))
    b = sorted(map(tuple, luby_mis(edges.repartition(8), rounds=6).collect()))
    assert a == b
    # isolated nodes join the MIS in round 1
    ndf = spark.createDataFrame([(v,) for v in range(50)], "node long")
    iso = {
        r["node"]: (r["status"], r["round"])
        for r in luby_mis(edges, nodes=ndf, rounds=6).collect()
    }
    for v in range(41, 50):
        assert iso[v] == ("mis", 1), v
    with _pt.raises(ValueError):
        luby_mis(edges, rounds=0)


def test_katz_matches_python_and_truncation_series(spark):
    import pytest as _pt

    from minimel_spark.operators.graph import katz_centrality

    edge_list = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(v,) for v in range(5)], "node long")
    alpha, T = 0.1, 6
    got = {
        r["node"]: r["katz"]
        for r in katz_centrality(edges, nodes, n_iter=T, alpha=alpha).collect()
    }
    # python replay of the same recurrence
    x = {v: 0.0 for v in range(5)}
    for _ in range(T):
        nxt = {v: 0.0 for v in range(5)}
        for s, d in edge_list:
            nxt[d] += x[s] + 1.0
        x = {v: alpha * nxt[v] for v in x}
    for v in range(5):
        assert abs(got[v] - x[v]) < 1e-12, v
    # truncated-series identity: x_T(v) == sum_k alpha^k #paths of length k
    import itertools

    adj = {}
    for s, d in edge_list:
        adj.setdefault(s, []).append(d)
    paths_ending = {v: 0.0 for v in range(5)}
    for k in range(1, T + 1):
        for start in range(5):
            stack = [(start, 0)]
            while stack:
                cur, depth = stack.pop()
                if depth == k:
                    paths_ending[cur] += alpha**k
                    continue
                for nx in adj.get(cur, ()):
                    stack.append((nx, depth + 1))
    for v in range(5):
        assert abs(got[v] - paths_ending[v]) < 1e-12, v
    # isolated node 4 scores 0; partition invariance
    assert got[4] == 0.0
    a = sorted(map(tuple, katz_centrality(edges.coalesce(1), nodes, n_iter=4).collect()))
    b = sorted(map(tuple, katz_centrality(edges.repartition(8), nodes.repartition(4), n_iter=4).collect()))
    assert a == b
    with _pt.raises(ValueError):
        katz_centrality(edges, nodes, n_iter=0)
    with _pt.raises(ValueError):
        katz_centrality(edges, nodes, alpha=0.0)


def _py_brandes(edge_list, sources, max_dist=None):
    import collections

    adj = {}
    nodes = set()
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        nodes |= {a, b}
    btw = {v: 0.0 for v in nodes}
    for s in sources:
        dist = {s: 0}
        sig = {s: 1}
        order = [s]
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            if max_dist is not None and dist[u] >= max_dist:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sig[v] = 0
                    dq.append(v)
                    order.append(v)
                if dist[v] == dist[u] + 1:
                    sig[v] += sig[u]
        delta = {v: 0.0 for v in dist}
        for v in reversed(order):
            for u in adj.get(v, ()):
                if u in dist and dist[u] == dist[v] - 1:
                    delta[u] += sig[u] / sig[v] * (1 + delta[v])
            if v != s:
                btw[v] += delta[v]
    return btw


def test_betweenness_matches_python_brandes(spark):
    import random

    from minimel_spark.operators.graph import betweenness_panel

    rng = random.Random(23)
    for trial in range(2):
        n = 25
        edge_list = list({(rng.randrange(n), rng.randrange(n)) for _ in range(50)})
        edges = spark.createDataFrame(edge_list, "src long, dst long")
        ndf = spark.createDataFrame([(v,) for v in range(n)], "node long")
        got = {
            r["node"]: r["btw"]
            for r in betweenness_panel(edges, n_seeds=4, max_dist=12, nodes=ndf).collect()
        }
        seen = {v for e in edge_list for v in e if e[0] != e[1]}
        seeds = sorted(range(n))[:4]
        want = _py_brandes(edge_list, [s for s in seeds])
        for v in range(n):
            w = want.get(v, 0.0) if v in seen or v in want else 0.0
            assert abs(got[v] - w) < 1e-9, (trial, v, got[v], w)


def test_betweenness_star_and_validation(spark):
    import pytest as _pt

    from minimel_spark.operators.graph import betweenness_panel

    # star: center 0, leaves 1..5; seeds = {0,1,2,3}; from each leaf seed,
    # center carries (n_leaves-1) pair paths; from the center seed, no
    # intermediate exists
    edge_list = [(0, i) for i in range(1, 6)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["node"]: r["btw"]
        for r in betweenness_panel(edges, n_seeds=4, max_dist=4).collect()
    }
    want = _py_brandes(edge_list, [0, 1, 2, 3])
    for v in got:
        assert abs(got[v] - want[v]) < 1e-12, v
    assert got[0] == 12.0  # 3 leaf seeds x 4 other leaves
    a = sorted(map(tuple, betweenness_panel(edges.coalesce(1), n_seeds=3, max_dist=3).collect()))
    b = sorted(map(tuple, betweenness_panel(edges.repartition(8), n_seeds=3, max_dist=3).collect()))
    assert a == b
    with _pt.raises(ValueError):
        betweenness_panel(edges, n_seeds=0)
    with _pt.raises(ValueError):
        betweenness_panel(edges, max_dist=0)


def test_modularity_matches_python_and_known_cases(spark):
    from minimel_spark.operators.graph import modularity

    # two triangles joined by one bridge edge; perfect 2-community split
    edge_list = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    part_list = [(v, 0 if v < 3 else 1) for v in range(6)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    part = spark.createDataFrame(part_list, "node long, community long")
    rows = modularity(edges, part).collect()
    m = 7
    # python replay
    import collections

    deg = collections.Counter()
    for a, b in edge_list:
        deg[a] += 1
        deg[b] += 1
    comm = dict(part_list)
    ein = collections.Counter()
    for a, b in edge_list:
        if comm[a] == comm[b]:
            ein[comm[a]] += 1
    want_q = 0.0
    for c in (0, 1):
        dc = sum(d for v, d in deg.items() if comm[v] == c)
        want_q += ein[c] / m - (dc / (2 * m)) ** 2
    got = {r["community"]: r for r in rows}
    for c in (0, 1):
        dc = sum(d for v, d in deg.items() if comm[v] == c)
        assert got[c]["e_in"] == ein[c] and got[c]["deg_sum"] == dc
        assert abs(got[c]["q"] - want_q) < 1e-12
    # everything in ONE community: Q = 1 - 1 = 0 exactly
    one = spark.createDataFrame([(v, 9) for v in range(6)], "node long, community long")
    q1 = modularity(edges, one).collect()[0]["q"]
    assert abs(q1) < 1e-12
    # partition invariance
    a = sorted(map(tuple, modularity(edges.coalesce(1), part).collect()))
    b = sorted(map(tuple, modularity(edges.repartition(8), part.repartition(4)).collect()))
    assert a == b


def test_mis_coloring_proper_and_matches_python(spark):
    import random

    import pytest as _pt

    from minimel_spark.operators.graph import mis_coloring

    rng = random.Random(41)
    n = 30
    edge_list = list({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    ndf = spark.createDataFrame([(v,) for v in range(n)], "node long")
    got = {
        r["node"]: r["color"]
        for r in mis_coloring(edges, nodes=ndf, max_colors=10, mis_rounds=10).collect()
    }
    assert set(got) == set(range(n))
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    # proper: no same-colored edge (among colored nodes)
    for a, b in und:
        if got[a] != -1 and got[b] != -1:
            assert got[a] != got[b], (a, b)
    assert -1 not in got.values()  # 10 waves suffice at this density
    # python replay: iterated luby using the same priorities
    remaining = set(range(n))
    res = set(und)
    want = {}
    for c in range(1, 11):
        if not remaining:
            break
        mis_nodes = {
            v for v, s, _ in _py_luby(
                [(a, b) for a, b in res], sorted(remaining), 10
            )
            if s == "mis"
        }
        for v in mis_nodes:
            want[v] = c
        remaining -= mis_nodes
        res = {e for e in res if e[0] in remaining and e[1] in remaining}
    for v in remaining:
        want[v] = -1
    assert got == want
    # budget certificate: 1 color on a triangle leaves -1 rows
    tri = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    one = {r["node"]: r["color"] for r in mis_coloring(tri, max_colors=1).collect()}
    assert sorted(one.values()).count(-1) == 2
    a1 = sorted(map(tuple, mis_coloring(edges.coalesce(1), max_colors=4, mis_rounds=6).collect()))
    b1 = sorted(map(tuple, mis_coloring(edges.repartition(8), max_colors=4, mis_rounds=6).collect()))
    assert a1 == b1
    with _pt.raises(ValueError):
        mis_coloring(edges, max_colors=0)


def test_harmonic_panel_matches_python(spark):
    import collections

    from minimel_spark.operators.graph import harmonic_panel

    # DIRECTED semantics (the distance_census contract): a path 0→1→2→3
    # and a detached edge 10→11; seeds {0,1,2,3} — harmonic stays finite
    # across the disconnect, closeness only counts the reached side
    edge_list = [(0, 1), (1, 2), (2, 3), (10, 11)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["seed"]: (r["n_reached"], r["sum_dist"], r["harmonic"], r["closeness"])
        for r in harmonic_panel(edges, n_seeds=4, max_dist=6).collect()
    }
    adj = collections.defaultdict(set)
    for a, b in edge_list:
        adj[a].add(b)
    for s in (0, 1, 2, 3):
        dist = {s: 0}
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        reach = [d for v, d in dist.items() if d > 0]
        want = (
            len(reach) + 1,
            sum(reach),
            sum(1 / d for d in reach),
            len(reach) / sum(reach) if reach else 0.0,
        )
        g = got[s]
        assert g[0] == want[0] and g[1] == want[1]
        assert abs(g[2] - want[2]) < 1e-9 and abs(g[3] - want[3]) < 1e-9
    # the unreached component never contributes (harmonic's 1/inf = 0)
    assert got[0][0] == 4
    a = sorted(map(tuple, harmonic_panel(edges.coalesce(1), n_seeds=2).collect()))
    b = sorted(map(tuple, harmonic_panel(edges.repartition(8), n_seeds=2).collect()))
    assert a == b
