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
