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
