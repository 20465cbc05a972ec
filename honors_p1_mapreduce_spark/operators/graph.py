"""Graph-pattern mining over a fact-derived graph: triangle counting.

The reference engine has no graph surface at all (its only iterative
shape is the wordcount-style two-stage MR, SURVEY.md §2.4); the one
graph operator this repo already ships is connected components
(``operators/dedup.py:dedup_clusters``, large-star/small-star).
Triangle enumeration is the canonical NEXT graph primitive — the
building block of clustering coefficients, community detection, and
spam/link-farm detection — and it has a famously bad naive plan
(join every wedge at a hub node: a node of degree d contributes d²
wedges, and real graphs have power-law hubs).

The scale-correct plan here is the degree-ordering technique of
Suri & Vassilvitskii ("Counting triangles and the curse of the last
reducer", WWW 2011; also Schank & Wagner 2005): orient every
undirected edge from its lower-(degree, name) endpoint to its
higher one. Every triangle then has exactly ONE source node where
both its out-edges meet, so enumerating wedges over ORIENTED
out-neighbourhoods counts each triangle exactly once — and a node's
out-degree under this orientation is bounded by O(√m) however big
its raw degree, so the wedge stage does O(m^{3/2}) work total
instead of Σd² and the "last reducer" hub task disappears. Every
step is an equi-join or aggregation: the same plan runs on a
web-scale edge table.

The graph itself is derived from the full fact data (the 100 TB
part): supplier-nation → customer-nation trade volume via
lineitem⋈orders⋈customer⋈supplier, aggregated down to at most
25×24/2 weighted undirected edges, keeping edges whose exact-decimal
revenue is at least 1/400 of total cross-nation trade (a relative
threshold, so the graph shape is scale-free across SFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table

# keep an edge iff its revenue * EDGE_KEEP_DENOM >= total trade
EDGE_KEEP_DENOM = 400


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected (u, v, w) nation-trade edges, u < v by
    name, w = exact-decimal revenue; only edges above the relative
    volume threshold survive. The fact joins mirror
    cross_nation_volume (relational.py): nation broadcasts always,
    supplier/customer broadcast as key→nation maps."""
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            F.least("supp_nation", "cust_nation").alias("u"),
            F.greatest("supp_nation", "cust_nation").alias("v"),
        )
        .agg(F.sum(rev.cast("decimal(27,6)")).alias("w"))
    )
    # relative threshold on EXACT decimal sums: identical decimals
    # cast to identical doubles in both engines, so the comparison is
    # engine-portable with no float-accumulation boundary risk
    total = edges.agg(F.sum("w").alias("t"))
    return (
        edges.crossJoin(F.broadcast(total))  # 1-row total, broadcast-tiny
        .filter(
            F.col("w").cast("double") * EDGE_KEEP_DENOM
            >= F.col("t").cast("double")
        )
        .select("u", "v")
    )


# ------------------------- driver-local finishing (r17 optimization)
#
# The registered trade_* queries all iterate over the REDUCED
# nation-trade graph, which is bounded by the nation dimension at
# EVERY scale factor: <= 25 nodes, <= 25*24/2 = 300 undirected edges
# (the facts are aggregated away by _trade_edges — the one stage that
# scales). The distributed round loops below (pagerank_nodes /
# labelprop_nodes / kcore_edges / enumerate_triangles) are the library
# surface for UNBOUNDED edge frames and stay exactly as they were;
# but running 4-26 rounds of 3-5 tiny exchanges each over a 300-row
# frame is pure scheduling overhead (measured: trade_labelprop 5.1 s
# cold at sf0.1, of which the fact-side derivation is ~1 s — and its
# unchecked 4-round lineage re-expands to a 548-Exchange plan). The
# registered wrappers therefore collect the bounded frame once and
# finish the rounds driver-side in exact integer/string arithmetic —
# the BPE "driver-local finishing" precedent, same bounded-collect
# class as the vocab/centroid/Bloom-bitmap collects. Every local
# mirror reproduces its distributed twin's recurrence value-for-value
# (integer floor-div, min-label ties), pinned by equality tests and
# by the unchanged DuckDB oracles.


def _collect_edges(edges: DataFrame) -> list[tuple[str, str]]:
    """The bounded (<= 300-row) reduced edge list, driver-side."""
    return [(r.u, r.v) for r in edges.collect()]


def _pagerank_local(
    pairs: list[tuple[str, str]], n_iter: int, damp_pct: int, scale: int
) -> dict[str, int]:
    """Exact mirror of :func:`pagerank_nodes`'s integer recurrence:
    same floor-div contributions, same teleport, same round count —
    integer sums commute, so the result is identical bit-for-bit."""
    deg: dict[str, int] = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    ranks = {n: scale for n in deg}
    teleport = (100 - damp_pct) * scale
    for _ in range(n_iter):
        s = dict.fromkeys(deg, 0)
        for u, v in pairs:
            s[v] += ranks[u] // deg[u]
            s[u] += ranks[v] // deg[v]
        ranks = {n: (teleport + damp_pct * s[n]) // 100 for n in deg}
    return ranks


def _labelprop_local(
    pairs: list[tuple[str, str]], n_rounds: int
) -> dict[str, str]:
    """Exact mirror of :func:`labelprop_nodes`: synchronous rounds,
    most-frequent neighbour label, ties to the MIN label."""
    nbrs: dict[str, list[str]] = {}
    for u, v in pairs:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    labels = {n: n for n in nbrs}
    for _ in range(n_rounds):
        new = {}
        for n, ns in nbrs.items():
            cnt: dict[str, int] = {}
            for m in ns:
                lbl = labels[m]
                cnt[lbl] = cnt.get(lbl, 0) + 1
            mx = max(cnt.values())
            new[n] = min(l for l, c in cnt.items() if c == mx)
        labels = new
    return labels


def _kcore_local(
    pairs: list[tuple[str, str]], k: int
) -> list[tuple[str, str]]:
    """Exact mirror of :func:`kcore_edges`: round-parallel peel of
    nodes with degree < k until the edge set stops shrinking."""
    live = list(pairs)
    while True:
        deg: dict[str, int] = {}
        for u, v in live:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        new_live = [(u, v) for u, v in live if u in keep and v in keep]
        if len(new_live) == len(live):
            return live
        live = new_live


def _triangles_local(
    pairs: list[tuple[str, str]]
) -> list[tuple[str, str, str]]:
    """All triangles of the canonical (u < v) edge list, each exactly
    once with names sorted — the same output set as
    :func:`enumerate_triangles` (which guarantees exactly-once by
    degree ordering; here the canonical u < v orientation already
    makes {a<b<c} enumerable directly)."""
    eset = set(pairs)
    nbrs: dict[str, set[str]] = {}
    for u, v in pairs:
        nbrs.setdefault(u, set()).add(v)
    out = []
    for a, b in pairs:  # a < b
        for c in nbrs.get(b, ()):  # b < c, so a < b < c
            if (a, c) in eset:
                out.append((a, b, c))
    return out


def enumerate_triangles(edges: DataFrame) -> DataFrame:
    """Degree-ordered triangle enumeration over a canonical
    undirected edge frame (columns ``u`` < ``v``, one row per edge).

    Orient each edge from its lower-(degree, name) endpoint, self-join
    oriented out-edges on their source to form wedges (each wedge's
    two far ends ordered by the same total order, so no wedge
    repeats), and close wedges against the oriented edge set with one
    more equi-join. Each triangle is produced exactly once, at its
    lowest-ordered corner, and out-degrees are O(√m) — the
    Suri-Vassilvitskii bound that removes the hub-wedge blowup.

    Output: (n1, n2, n3) sorted by name.
    """
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .count()
    )
    # total order: ordinal by (degree, name). Unpartitioned window is
    # bounded by the node count (<= 25 nations at ANY scale factor —
    # the graph is the REDUCED frame, the facts never enter a window)
    ordn = deg.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("count"), F.col("n")))
        .alias("ord"),
    )
    ou = ordn.select(F.col("n").alias("u"), F.col("ord").alias("u_ord"))
    ov = ordn.select(F.col("n").alias("v"), F.col("ord").alias("v_ord"))
    with_ord = edges.join(F.broadcast(ou), "u").join(F.broadcast(ov), "v")
    oriented = with_ord.select(
        F.when(F.col("u_ord") < F.col("v_ord"), F.col("u"))
        .otherwise(F.col("v"))
        .alias("src"),
        F.when(F.col("u_ord") < F.col("v_ord"), F.col("v"))
        .otherwise(F.col("u"))
        .alias("dst"),
        F.least("u_ord", "v_ord").alias("src_ord"),
        F.greatest("u_ord", "v_ord").alias("dst_ord"),
    )
    e1 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), "dst_ord"
    )
    e2 = oriented.select(
        F.col("src").alias("a"),
        F.col("dst").alias("c"),
        F.col("dst_ord").alias("c_ord"),
    )
    wedges = e1.join(e2, "a").filter(F.col("dst_ord") < F.col("c_ord"))
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"])
    names = F.sort_array(F.array("a", "b", "c"))
    return tri.select(
        F.element_at(names, 1).alias("n1"),
        F.element_at(names, 2).alias("n2"),
        F.element_at(names, 3).alias("n3"),
    )


def trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All triangles of the thresholded nation-trade graph, one row
    per triangle with (n1, n2, n3) sorted by name.

    The fact-side edge derivation (the only big-data stage — one
    aggregation pass over lineitem⋈orders⋈customer⋈supplier) is
    persisted because the enumeration reads it three times (degrees +
    both wedge sides); the graph frame it caches is <= 300 rows.
    Unlike the checkpoint-at-entry loops (k-core / PageRank / LPA,
    which release their edge cache before returning), the
    enumeration is LAZY — the cache must live until the caller
    materializes the result, so it is released by the session's
    clearCache, not here (<= 300 rows resident, by design).

    Output: (n1, n2, n3).
    """
    tri = _triangles_local(_collect_edges(_trade_edges(spark, sf_dir)))
    return spark.createDataFrame(
        tri,
        T.StructType(
            [
                T.StructField("n1", T.StringType()),
                T.StructField("n2", T.StringType()),
                T.StructField("n3", T.StringType()),
            ]
        ),
    )


_TRADE_EDGES_CTES = f"""rev AS (
  SELECT sn.n_name AS sa, cn.n_name AS sb,
         l_extendedprice * (1 - l_discount) AS r
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE sn.n_name <> cn.n_name
),
edges AS (
  SELECT least(sa, sb) AS u, greatest(sa, sb) AS v,
         SUM(CAST(r AS DECIMAL(27,6))) AS w
  FROM rev GROUP BY 1, 2
),
tot AS (SELECT SUM(w) AS t FROM edges),
kept AS (
  SELECT u, v FROM edges, tot
  WHERE CAST(w AS DOUBLE) * {EDGE_KEEP_DENOM} >= CAST(t AS DOUBLE)
)"""

TRADE_TRIANGLES_ORACLE = f"""
WITH {_TRADE_EDGES_CTES}
SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
FROM kept e1
JOIN kept e2 ON e2.u = e1.v
JOIN kept e3 ON e3.u = e1.u AND e3.v = e2.v
"""


# --------------------------------------- k-core decomposition (r9)

TRADE_KCORE_K = 3
_KCORE_ORACLE_ROUNDS = 26  # > max peel rounds for a <= 25-node graph


def kcore_edges(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """Edges of the k-core: iteratively PEEL nodes of degree < k
    (Seidman 1983; the Batagelj-Zaveršnik peel in round-parallel
    form) until fixpoint. Each round is one degree aggregate + two
    semi-joins — equi-joins only, so the same plan runs on a
    web-scale edge table; convergence costs ONE scalar action per
    round (edge count: peeling strictly shrinks the edge set, so an
    unchanged count IS the fixpoint; the previous round's count is
    carried driver-side — r9 verdict #6: the earlier form recomputed
    it in a 1-row crossJoin, two job launches per round where one
    suffices), every round frame is ``localCheckpoint``ed to truncate
    iterative lineage, and the previous round's blocks are released
    as the next materializes — the ``connected_components`` loop
    discipline. Rounds are bounded by the peel depth (O(graph
    degeneracy), not O(n): every non-final round removes at least one
    node).

    Raises ``RuntimeError`` when ``max_iter`` rounds pass without
    reaching the fixpoint (r9 advisor: peel depth is O(degeneracy)
    and can exceed any fixed budget on web-scale graphs; silently
    returning the non-converged edge set would hand the caller
    something that is NOT a k-core with no signal).

    No broadcast hint on the survivor sets: at scale the survivor
    frame is corpus-proportional in early rounds; AQE picks the
    strategy per round.
    """
    live = edges.select("u", "v").localCheckpoint()
    prev = live.count()
    for _ in range(max_iter):
        deg = (
            live.select(F.col("u").alias("n"))
            .unionAll(live.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("n")
        new_live = (
            live.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
        cur = new_live.count()
        live.unpersist()
        live = new_live
        if cur == prev:
            return live
        prev = cur
    raise RuntimeError(
        f"k-core peel did not reach fixpoint within max_iter={max_iter} "
        "rounds; raise max_iter (peel depth is O(graph degeneracy))"
    )


def trade_kcore(
    spark: SparkSession, sf_dir: str, k: int = TRADE_KCORE_K
) -> DataFrame:
    """Registered query: the k-core of the thresholded nation-trade
    graph — the maximal subgraph where every surviving nation still
    trades heavily with >= k other survivors (the standard cohesion
    primitive after components + triangles: periphery nations peel
    off even when their raw degree exceeds k, because their
    neighbours peel first).

    Output: (nation, core_degree) for each surviving node, with its
    degree WITHIN the core (>= k by construction). The fact-side edge
    derivation is persisted once; every peel round runs on the
    <= 300-row reduced frame.
    """
    core = _kcore_local(_collect_edges(_trade_edges(spark, sf_dir)), k)
    deg: dict[str, int] = {}
    for u, v in core:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return spark.createDataFrame(
        sorted(deg.items()),
        T.StructType(
            [
                T.StructField("nation", T.StringType()),
                T.StructField("core_degree", T.LongType()),
            ]
        ),
    )


def _kcore_oracle(k: int = TRADE_KCORE_K) -> str:
    """Peel loop unrolled to fixed CTE rounds (the Lloyd-chain trick:
    DuckDB's recursive CTEs are monotone-append, peeling is not). A
    <= 25-node graph reaches fixpoint in < _KCORE_ORACLE_ROUNDS
    rounds, so the last round IS the fixpoint."""
    # every round CTE is MATERIALIZED: s{{r}} is referenced twice by
    # round r+1, so inlined CTEs would re-expand the whole chain
    # exponentially (observed as fd exhaustion re-opening the fact
    # parquet files); materialization makes each round evaluate once
    rounds = []
    rounds.append(
        "s0 AS MATERIALIZED (SELECT u AS n FROM kept UNION SELECT v FROM kept)"
    )
    for r in range(1, _KCORE_ORACLE_ROUNDS + 1):
        rounds.append(
            f"""d{r} AS MATERIALIZED (
  SELECT e.n, count(*) AS d FROM dirboth e
  WHERE e.n IN (SELECT n FROM s{r - 1})
    AND e.m IN (SELECT n FROM s{r - 1})
  GROUP BY e.n
),
s{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE d >= {k})"""
        )
    last = _KCORE_ORACLE_ROUNDS
    return f"""
WITH {_TRADE_EDGES_CTES},
dirboth AS MATERIALIZED (
  SELECT u AS n, v AS m FROM kept UNION ALL SELECT v, u FROM kept
),
{",".join(rounds)}
SELECT e.n AS nation, count(*) AS core_degree
FROM dirboth e
WHERE e.n IN (SELECT n FROM s{last})
  AND e.m IN (SELECT n FROM s{last})
GROUP BY e.n
"""


TRADE_KCORE_ORACLE = _kcore_oracle()


# ------------------------------------------ integer PageRank (r9)

PAGERANK_ITERS = 8
PAGERANK_DAMP_PCT = 85  # d = 0.85 as an integer percentage
PAGERANK_SCALE = 1_000_000  # ranks in parts-per-million


def pagerank_nodes(
    edges: DataFrame,
    n_iter: int = PAGERANK_ITERS,
    damp_pct: int = PAGERANK_DAMP_PCT,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """(n, rank_ppm) — PageRank over a canonical undirected edge
    frame in PURE INTEGER arithmetic (ranks in parts-per-million,
    per-edge contributions by integer division), run for a FIXED
    n_iter rounds: truncating division makes the recurrence
    engine-portable bit-for-bit (floor-div agrees in Spark and
    DuckDB for non-negative ints), and the fixed round count makes
    the whole computation expressible as an unrolled oracle — the
    same portability-over-libm rule as the HLL/chi-square families.
    The truncation error is bounded by deg(n) ppm per node per round.

    Ranks are in PER-NODE NORMALIZED units (average rank == scale,
    r0 = scale for every node): the recurrence never divides by the
    node count, so the integer grain never collapses however large
    the graph (a mass-normalized r0 = scale/N would round to 0 past
    N = scale nodes) and no driver-side scalar is needed at all.

    Every round is one equi-join (ranks onto directed edges) + one
    aggregation + one left join back to the node spine — web-scale
    plan shapes. Unlike the data-dependent CC/kcore loops, the round
    count is FIXED and small, so per-round lineage truncation is
    round-overhead without benefit (measured: per-round
    localCheckpoint cost ~4s of an 8s query on the tiny trade graph);
    the loop checkpoints every CHECKPOINT_EVERY rounds instead, which
    bounds plan depth at web scale while paying the materialization
    cost only twice. Undirected edges contribute in both directions;
    the graph has no dangling nodes by construction (every node is an
    edge endpoint).
    """
    dirb = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    dirb = dirb.localCheckpoint()
    deg = dirb.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("n"), "deg")
    ranks = nodes.select("n", F.lit(scale).cast("bigint").alias("r"))
    teleport = (100 - damp_pct) * scale
    CHECKPOINT_EVERY = 4
    for it in range(n_iter):
        contrib = (
            dirb.join(
                ranks.select(F.col("n").alias("src"), "r"), "src"
            )
            .join(deg, "src")
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.n == contrib.dst, "left")
            .select(
                "n",
                F.expr(
                    f"({teleport} + {damp_pct}"
                    " * coalesce(s, CAST(0 AS BIGINT))) div 100"
                ).alias("r"),
            )
        )
        if (it + 1) % CHECKPOINT_EVERY == 0 and (it + 1) < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("n", F.col("r").alias("rank_ppm"))


def trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: integer PageRank over the thresholded
    nation-trade graph — which nations sit at the center of the
    heavy-trade topology (the influence primitive after components /
    triangles / k-core). Output: (nation, rank_ppm)."""
    ranks = _pagerank_local(
        _collect_edges(_trade_edges(spark, sf_dir)),
        PAGERANK_ITERS,
        PAGERANK_DAMP_PCT,
        PAGERANK_SCALE,
    )
    return spark.createDataFrame(
        sorted(ranks.items()),
        T.StructType(
            [
                T.StructField("nation", T.StringType()),
                T.StructField("rank_ppm", T.LongType()),
            ]
        ),
    )


def _pagerank_oracle(
    n_iter: int = PAGERANK_ITERS,
    damp_pct: int = PAGERANK_DAMP_PCT,
    scale: int = PAGERANK_SCALE,
) -> str:
    """Fixed-round unroll, every CTE MATERIALIZED (the kcore lesson:
    inlined CTE chains re-expand exponentially)."""
    rounds = []
    for t in range(1, n_iter + 1):
        rounds.append(
            f"""c{t} AS MATERIALIZED (
  SELECT e.dst, sum(r.r // d.deg) AS s
  FROM dirb e
  JOIN r{t - 1} r ON e.src = r.n
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r{t} AS MATERIALIZED (
  SELECT nodes.n,
         ({(100 - damp_pct) * scale}
          + {damp_pct} * coalesce(c{t}.s, 0)) // 100 AS r
  FROM nodes LEFT JOIN c{t} ON nodes.n = c{t}.dst
)"""
        )
    return f"""
WITH {_TRADE_EDGES_CTES},
dirb AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM kept UNION ALL SELECT v, u FROM kept
),
deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM dirb GROUP BY src),
nodes AS MATERIALIZED (SELECT src AS n FROM deg),
r0 AS MATERIALIZED (SELECT n, CAST({scale} AS BIGINT) AS r FROM nodes),
{",".join(rounds)}
SELECT n AS nation, CAST(r AS BIGINT) AS rank_ppm FROM r{n_iter}
"""


TRADE_PAGERANK_ORACLE = _pagerank_oracle()


# ----------------------------- label-propagation communities (r10)

# Fixed synchronous rounds (oracle-unrollable). CONVERGENCE CAVEAT
# (r10 verdict #6): a fixed unroll is convergence-BY-CONSTRUCTION —
# an oracle-portability choice that is correct for the <= 25-node
# thresholded trade graph, where all structure resolves in < 4 rounds
# (pinned by the two-clique-plus-bridge golden). A web-scale LPA
# pointed at a corpus-sized graph should instead loop to a FIXPOINT
# with one driver-side action per round on the label-change count
# (`labels_t JOIN labels_{t-1} ON n WHERE lbl <> prev` → count), the
# k-core discipline in this module — including its per-round
# localCheckpoint lineage truncation and the RuntimeError raise at
# max_iter so non-convergence (synchronous LPA can 2-cycle on
# bipartite structures) fails loudly instead of returning a
# mid-oscillation labeling.
LABELPROP_ROUNDS = 4


def labelprop_nodes(
    edges: DataFrame, n_rounds: int = LABELPROP_ROUNDS
) -> DataFrame:
    """(n, community) — synchronous label propagation (Raghavan,
    Albert & Kumara 2007, "Near linear time algorithm to detect
    community structures in large-scale networks") over a canonical
    undirected edge frame, made DETERMINISTIC and engine-portable:

    - labels start as the node's own name;
    - each round, every node adopts the most frequent label among its
      neighbours, ties broken by MIN label (the paper's random
      tie-break is replaced by a total order both engines agree on);
    - updates are synchronous (all nodes step on round t's labels),
      so round t+1 is a pure function of round t and the whole
      computation unrolls into a fixed MATERIALIZED-CTE oracle —
      the PageRank portability recipe. Synchronous LPA can oscillate
      on bipartite structures instead of converging; a FIXED round
      count makes the output well-defined either way, and community
      quality at small round counts is the documented LPA behavior
      (most structure resolves in < 5 rounds).

    Plan shape per round: one equi-join (labels onto directed edges),
    one (node, label) count aggregate, one per-node max aggregate,
    one filter+min aggregate — every stage keyed by node or
    (node, label), so the same plan runs on a web-scale edge table;
    no window functions over anything larger than a per-node
    partition, nothing collected to the driver. The round count is
    fixed and small (like PageRank, unlike the data-dependent
    CC/k-core loops), so per-round lineage truncation is skipped and
    plan depth stays bounded by n_rounds.
    """
    dirb = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    dirb = dirb.localCheckpoint()
    nodes = dirb.select(F.col("src").alias("n")).distinct()
    labels = nodes.select("n", F.col("n").alias("lbl"))
    for _ in range(n_rounds):
        nbr = dirb.join(
            labels.select(F.col("n").alias("src"), "lbl"), "src"
        ).select(F.col("dst").alias("n"), "lbl")
        cnt = nbr.groupBy("n", "lbl").agg(F.count("*").alias("c"))
        mx = cnt.groupBy("n").agg(F.max("c").alias("mx"))
        labels = (
            cnt.join(mx, "n")
            .filter(F.col("c") == F.col("mx"))
            .groupBy("n")
            .agg(F.min("lbl").alias("lbl"))
        )
    return labels.select("n", F.col("lbl").alias("community"))


def trade_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: label-propagation communities of the
    thresholded nation-trade graph — the modularity-flavored
    counterpart to connected components (CC merges anything touching;
    LPA splits a connected blob into densely-knit trade blocs). The
    fact-side edge derivation is persisted once; every round runs on
    the <= 300-row reduced frame.

    Output: (nation, community, community_size) — community is the
    round-LABELPROP_ROUNDS label (min-tie-break), size its member
    count."""
    labels = _labelprop_local(
        _collect_edges(_trade_edges(spark, sf_dir)), LABELPROP_ROUNDS
    )
    sizes: dict[str, int] = {}
    for lbl in labels.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    rows = [(n, lbl, sizes[lbl]) for n, lbl in sorted(labels.items())]
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("nation", T.StringType()),
                T.StructField("community", T.StringType()),
                T.StructField("community_size", T.LongType()),
            ]
        ),
    )


def _labelprop_oracle(n_rounds: int = LABELPROP_ROUNDS) -> str:
    """Fixed-round synchronous unroll, every CTE MATERIALIZED (the
    kcore lesson: inlined CTE chains re-expand exponentially)."""
    rounds = []
    for t in range(1, n_rounds + 1):
        rounds.append(
            f"""c{t} AS MATERIALIZED (
  SELECT e.dst AS n, l.lbl, count(*) AS c
  FROM dirb e JOIN l{t - 1} l ON e.src = l.n
  GROUP BY e.dst, l.lbl
),
l{t} AS MATERIALIZED (
  SELECT n, min(lbl) AS lbl
  FROM (SELECT n, lbl, c, max(c) OVER (PARTITION BY n) AS mx FROM c{t}) w
  WHERE c = mx GROUP BY n
)"""
        )
    return f"""
WITH {_TRADE_EDGES_CTES},
dirb AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM kept UNION ALL SELECT v, u FROM kept
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS n, src AS lbl FROM dirb),
{",".join(rounds)},
final AS (SELECT n, lbl AS community FROM l{n_rounds}),
sizes AS (
  SELECT community, count(*) AS community_size FROM final GROUP BY community
)
SELECT n AS nation, community, community_size
FROM final JOIN sizes USING (community)
"""


TRADE_LABELPROP_ORACLE = _labelprop_oracle()
