"""Triangle enumeration: brute-force differential + oracle parity."""

from __future__ import annotations

import itertools
import random

from honors_p1_mapreduce_spark.operators.graph import (
    TRADE_TRIANGLES_ORACLE,
    enumerate_triangles,
    trade_triangles,
)

from .oracle import compare_query


def _brute(edges):
    es = set(map(tuple, edges))
    nodes = sorted({n for e in es for n in e})
    return sorted(
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def _spark_triangles(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    return sorted(
        (r["n1"], r["n2"], r["n3"]) for r in enumerate_triangles(df).collect()
    )


def test_triangles_differential_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(5):
        nodes = [f"n{i:02d}" for i in range(rng.randint(4, 14))]
        edges = [
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.4
        ]
        if not edges:
            continue
        assert _spark_triangles(spark, edges) == _brute(edges), f"trial {trial}"


def test_triangles_hub_graph_counts_each_once(spark):
    """A star hub plus a rim cycle — the exact shape where naive
    wedge joins blow up at the hub; every rim triangle must appear
    exactly once."""
    rim = [f"r{i}" for i in range(6)]
    edges = [("hub", r) for r in rim] + [
        (min(a, b), max(a, b)) for a, b in zip(rim, rim[1:] + rim[:1])
    ]
    got = _spark_triangles(spark, edges)
    assert got == _brute(edges)
    assert len(got) == 6  # hub + each adjacent rim pair


def test_trade_triangles_matches_oracle(spark, sf_dir):
    compare_query(spark, sf_dir, trade_triangles, TRADE_TRIANGLES_ORACLE)


# --------------------------------------- k-core decomposition (r9)


def _brute_kcore(edges, k):
    """Reference peel: remove min-degree-< k nodes until fixpoint."""
    es = {tuple(e) for e in edges}
    while True:
        deg: dict = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        dead = {n for n, d in deg.items() if d < k}
        if not dead:
            return sorted(deg.items())
        es = {(u, v) for u, v in es if u not in dead and v not in dead}


def test_kcore_cascade_golden(spark):
    """Planted cascade: a 4-clique (a 3-core) with a pendant chain
    c1-c2-c3 hung off it, plus node 'x' wired to THREE chain nodes —
    x's raw degree meets k, but the chain peels first and takes x
    with it. Only the clique may survive k=3."""
    from honors_p1_mapreduce_spark.operators.graph import kcore_edges

    clique = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    chain = [("d", "c1"), ("c1", "c2"), ("c2", "c3")]
    x = [("c1", "x"), ("c2", "x"), ("c3", "x")]
    df = spark.createDataFrame(clique + chain + x, ["u", "v"])
    out = sorted(
        (r["u"], r["v"]) for r in kcore_edges(df, 3).collect()
    )
    assert out == sorted(clique)


def test_kcore_differential_random_graphs(spark):
    """Engine peel vs the Python reference on random graphs, across
    k values — including graphs whose k-core is empty."""
    from honors_p1_mapreduce_spark.operators.graph import kcore_edges

    rng = random.Random(9)
    for trial in range(4):
        nodes = [f"n{i}" for i in range(14)]
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(rng.randint(8, 40))
            }
        )
        for k in (2, 3, 4):
            df = spark.createDataFrame(edges, ["u", "v"])
            surv = kcore_edges(df, k).collect()
            got: dict = {}
            for r in surv:
                got[r["u"]] = got.get(r["u"], 0) + 1
                got[r["v"]] = got.get(r["v"], 0) + 1
            assert sorted(got.items()) == _brute_kcore(edges, k), (trial, k)


def test_trade_kcore_matches_oracle(spark, sf_dir):
    from honors_p1_mapreduce_spark.operators.graph import (
        TRADE_KCORE_ORACLE,
        trade_kcore,
    )

    compare_query(spark, sf_dir, trade_kcore, TRADE_KCORE_ORACLE)


# ------------------------------------------ integer PageRank (r9)


def _brute_pagerank(edges, n_iter, damp_pct, scale):
    """Python reference of the integer recurrence (floor division)."""
    deg: dict = {}
    adj: dict = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        adj.setdefault(v, []).append(u)
        adj.setdefault(u, []).append(v)
    r = {n: scale for n in deg}
    for _ in range(n_iter):
        r = {
            n: (
                (100 - damp_pct) * scale
                + damp_pct * sum(r[m] // deg[m] for m in adj.get(n, []))
            )
            // 100
            for n in deg
        }
    return sorted(r.items())


def test_pagerank_differential_random_graphs(spark):
    from honors_p1_mapreduce_spark.operators.graph import (
        PAGERANK_DAMP_PCT,
        PAGERANK_ITERS,
        PAGERANK_SCALE,
        pagerank_nodes,
    )

    rng = random.Random(17)
    for trial in range(3):
        nodes = [f"n{i}" for i in range(12)]
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(rng.randint(8, 30))
            }
        )
        df = spark.createDataFrame(edges, ["u", "v"])
        got = sorted(
            (r["n"], r["rank_ppm"]) for r in pagerank_nodes(df).collect()
        )
        assert got == _brute_pagerank(
            edges, PAGERANK_ITERS, PAGERANK_DAMP_PCT, PAGERANK_SCALE
        ), trial


def test_pagerank_hub_ranks_highest(spark):
    """A star's hub must out-rank every leaf (the sanity property any
    PageRank variant owes), and leaves tie by symmetry."""
    from honors_p1_mapreduce_spark.operators.graph import pagerank_nodes

    edges = [("hub", f"leaf{i}") for i in range(6)]
    df = spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in edges], ["u", "v"]
    )
    out = {r["n"]: r["rank_ppm"] for r in pagerank_nodes(df).collect()}
    leaves = [out[f"leaf{i}"] for i in range(6)]
    assert len(set(leaves)) == 1
    assert out["hub"] > leaves[0]


def test_trade_pagerank_matches_oracle(spark, sf_dir):
    from honors_p1_mapreduce_spark.operators.graph import (
        TRADE_PAGERANK_ORACLE,
        trade_pagerank,
    )

    compare_query(spark, sf_dir, trade_pagerank, TRADE_PAGERANK_ORACLE)


# ----------------------------- label propagation (r10)


def _lpa_ref(edges, rounds):
    """Plain-Python synchronous LPA with min-label tie-break — the
    differential reference for labelprop_nodes."""
    from collections import Counter, defaultdict

    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            cnt = Counter(lbl[m] for m in adj[n])
            mx = max(cnt.values())
            new[n] = min(l for l, c in cnt.items() if c == mx)
        lbl = new
    return lbl


def test_labelprop_two_cliques_golden(spark):
    """Two 4-cliques joined by one bridge edge: LPA must settle each
    clique on its min member and keep the bridge from merging them."""
    from honors_p1_mapreduce_spark.operators.graph import labelprop_nodes

    cliques = [
        (a, b)
        for grp in (["a1", "a2", "a3", "a4"], ["b1", "b2", "b3", "b4"])
        for i, a in enumerate(grp)
        for b in grp[i + 1 :]
    ]
    edges = cliques + [("a1", "b1")]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["n"]: r["community"] for r in labelprop_nodes(df).collect()}
    assert got == {
        "a1": "a1", "a2": "a1", "a3": "a1", "a4": "a1",
        "b1": "b1", "b2": "b1", "b3": "b1", "b4": "b1",
    }


def test_labelprop_differential_random_graphs(spark):
    import itertools
    import random

    from honors_p1_mapreduce_spark.operators.graph import labelprop_nodes

    rng = random.Random(23)
    for trial in range(5):
        nodes = [f"n{i:02d}" for i in range(rng.randint(4, 12))]
        edges = [
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.35
        ]
        if not edges:
            continue
        df = spark.createDataFrame(edges, ["u", "v"])
        got = {
            r["n"]: r["community"] for r in labelprop_nodes(df).collect()
        }
        assert got == _lpa_ref(edges, 4), f"trial {trial}"


def test_trade_labelprop_matches_oracle(spark, sf_dir):
    from honors_p1_mapreduce_spark.operators.graph import (
        TRADE_LABELPROP_ORACLE,
        trade_labelprop,
    )

    compare_query(spark, sf_dir, trade_labelprop, TRADE_LABELPROP_ORACLE)


def test_kcore_raises_without_fixpoint(spark):
    """r9 advisor: exhausting max_iter without convergence must raise,
    not silently return a non-k-core edge set. A 12-node path with
    k=2 peels one vertex pair per round — needs ~5 rounds."""
    import pytest as _pytest

    from honors_p1_mapreduce_spark.operators.graph import kcore_edges

    path = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(11)]
    df = spark.createDataFrame(path, ["u", "v"])
    with _pytest.raises(RuntimeError, match="fixpoint"):
        kcore_edges(df, 2, max_iter=2)
    # with budget it converges to the empty 2-core (a path has none)
    assert kcore_edges(df, 2, max_iter=12).count() == 0


def test_local_finishing_mirrors_distributed_rounds(spark):
    """r17 optimization: the registered trade_* wrappers finish the
    rounds driver-locally on the collected <= 300-row reduced frame.
    The local mirrors must reproduce the distributed library loops
    value-for-value on random graphs (integer floor-div recurrence,
    min-label ties, round-parallel peel, exactly-once triangles)."""
    from honors_p1_mapreduce_spark.operators.graph import (
        LABELPROP_ROUNDS,
        PAGERANK_DAMP_PCT,
        PAGERANK_ITERS,
        PAGERANK_SCALE,
        _kcore_local,
        _labelprop_local,
        _pagerank_local,
        _triangles_local,
        enumerate_triangles,
        kcore_edges,
        labelprop_nodes,
        pagerank_nodes,
    )

    rng = random.Random(29)
    for trial in range(3):
        nodes = [f"n{i:02d}" for i in range(10)]
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(rng.randint(8, 28))
            }
        )
        df = spark.createDataFrame(edges, ["u", "v"])

        got = sorted(
            (r["n"], r["rank_ppm"]) for r in pagerank_nodes(df).collect()
        )
        want = sorted(
            _pagerank_local(
                edges, PAGERANK_ITERS, PAGERANK_DAMP_PCT, PAGERANK_SCALE
            ).items()
        )
        assert got == want, ("pagerank", trial)

        got = sorted(
            (r["n"], r["community"]) for r in labelprop_nodes(df).collect()
        )
        want = sorted(_labelprop_local(edges, LABELPROP_ROUNDS).items())
        assert got == want, ("labelprop", trial)

        got = sorted(
            (r["u"], r["v"]) for r in kcore_edges(df, 2, max_iter=30).collect()
        )
        assert got == sorted(_kcore_local(edges, 2)), ("kcore", trial)

        got = sorted(
            (r["n1"], r["n2"], r["n3"])
            for r in enumerate_triangles(df).collect()
        )
        assert got == sorted(_triangles_local(edges)), ("triangles", trial)
