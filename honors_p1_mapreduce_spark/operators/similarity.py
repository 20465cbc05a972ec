"""Similarity search over the ``embeddings`` table (north-star op).

No reference counterpart (the reference is line-text MapReduce only;
SURVEY.md §2.4) — this is the LLM-pipeline surface: approximate
nearest neighbors over an ``array<float>`` column.

The family, from exact baseline to scale paths:

- ``similarity_topk`` / ``similarity_filtered_topk`` — exact
  brute-force cosine top-k (optionally behind a metadata predicate
  pushed into the scan). The query side is broadcast, so the "cross"
  join is a map-side nested loop: no corpus shuffle, and scoring is
  JVM-side folds with per-vector precomputed norms. This is the
  baseline, the recall oracle for every ANN variant, and bit-exact vs
  DuckDB (identical left folds over identical doubles).
- ``similarity_ann_topk`` / ``embedding_neardup`` — banded
  random-hyperplane LSH via an Arrow-batched pandas UDF (numpy matmul
  per batch), bucket equi-join candidates, exact re-rank; bits per
  band adapt to corpus size. Candidate volume is O(bucket size),
  never O(n²).
- ``similarity_ann_portable`` / ``embedding_neardup_portable`` — the
  same architecture with md5-seeded Rademacher planes as pure
  Catalyst folds, so the ENTIRE pipeline is DuckDB-reproducible and
  hash-gated (fixed geometry is the price; the adaptive variants stay
  the scale defaults).
- ``similarity_ivf_topk`` / ``similarity_ivf_kmeans_topk`` — IVF
  coarse quantization (stride-sampled or Lloyd-refined centroids),
  nprobe cells per query, exact re-rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_from_norms, dot, l2_norm, lsh_band_buckets
from ..sources.tables import load_table

N_QUERIES = 5
TOP_K = 10

# LSH knobs: 8 bands; bits-per-band is sized from the corpus so each
# (band, bucket) holds ~LSH_TARGET_BUCKET vectors — candidate volume
# per band is then n * bucket_size / 2 regardless of corpus size.
# Fixed bits would quietly go quadratic: 6 bits (right for n=500)
# measured 508 s at n=50k from ~100-vector buckets.
LSH_BANDS = 8
LSH_TARGET_BUCKET = 8
LSH_SEED = 42


def _lsh_bits_for(n: int) -> int:
    import math

    return max(4, min(24, math.ceil(math.log2(max(n, 2) / LSH_TARGET_BUCKET))))


def _queries_and_corpus(
    spark: SparkSession, sf_dir: str, n_queries: int
) -> tuple[DataFrame, DataFrame]:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return F.broadcast(q), emb


def similarity_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """Exact cosine top-k neighbors for the first ``n_queries`` vectors.

    Deterministic rank tie-break (sim DESC, vec_id ASC); self-matches
    excluded. Output: (query_id, rank, vec_id, sim).
    """
    q, emb = _queries_and_corpus(spark, sf_dir, n_queries)
    # precomputed norms: each corpus vector's norm fold runs once, not
    # once per query pair (same folds, identical doubles — see
    # _rerank_topk); the query side stays a broadcast
    qn = q.withColumn("_qn", l2_norm(F.col("q_emb")))
    en = emb.withColumn("_en", l2_norm(F.col("embedding")))
    sim = cosine_from_norms(
        F.col("q_emb"), F.col("embedding"), F.col("_qn"), F.col("_en")
    )
    scored = (
        qn.join(en, F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .select("query_id", "vec_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


# ---- shared DuckDB SQL fragment builders (one source of truth for the
# cosine fold and the Rademacher-LSH stages, used by every oracle
# generator below so the twins cannot drift apart)


def _dot_sql(a: str, b: str) -> str:
    """Left fold Σ a[i]*b[i] in index order — mirrors Spark's
    ``F.aggregate(F.zip_with(...), 0.0, +)`` exactly (0.0 + x is exact,
    so fold order == left-assoc sum order and doubles are bit-equal)."""
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        "(acc, x) -> acc + x)"
    )


def _norm_sql(v: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(generate_series(1, len({v})), "
        f"i -> CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE)), "
        "(acc, x) -> acc + x))"
    )


def _cos_sql(a: str, b: str) -> str:
    na, nb = _norm_sql(a), _norm_sql(b)
    return (
        f"CASE WHEN {na} = 0 OR {nb} = 0 THEN 0.0 "
        f"ELSE {_dot_sql(a, b)} / ({na} * {nb}) END"
    )


# DuckDB twin: identical left fold (init 0.0) over identical doubles ->
# bit-equal sim; rank/tie-break mirrored.
def similarity_topk_oracle(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS vec_id,
         {_cos_sql('q.embedding', 'a.embedding')} AS sim
  FROM embeddings q, embeddings a
  WHERE q.vec_id < {n_queries} AND a.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= {k}
"""


SIMILARITY_TOPK_ORACLE = similarity_topk_oracle()

# ------------------------------------------------------------- LSH / ANN


def _rerank_topk(cand: DataFrame, q: DataFrame, emb: DataFrame, k: int) -> DataFrame:
    """Exact-cosine re-rank of (query_id, vec_id) candidates with
    PRE-COMPUTED norms on both sides (the per-pair norm folds were 2/3
    of every ANN variant's re-rank cost; same folds over the same
    inputs → identical doubles, oracles unmoved). Shared by all four
    ANN paths; deterministic (sim DESC, vec_id ASC) tie-break."""
    qn = q.withColumn("_qn", l2_norm(F.col("q_emb")))
    en = emb.withColumn("_en", l2_norm(F.col("embedding")))
    sim = cosine_from_norms(
        F.col("q_emb"), F.col("embedding"), F.col("_qn"), F.col("_en")
    )
    scored = (
        cand.join(F.broadcast(qn), "query_id")
        .join(en, "vec_id")
        .withColumn("sim", sim)
        .select("query_id", "vec_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


def _bucketed(emb: DataFrame, id_col: str, emb_col: str, n_bits: int) -> DataFrame:
    """(id, band, bucket) rows: one per LSH band."""
    buckets = lsh_band_buckets(
        n_bands=LSH_BANDS, n_bits=n_bits, seed=LSH_SEED
    )(F.col(emb_col))
    return (
        emb.select(F.col(id_col), F.posexplode(buckets).alias("band", "bucket"))
    )


def similarity_ann_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """ANN cosine top-k: LSH-bucket candidates, exact re-rank.

    Candidates = corpus vectors sharing >=1 (band, bucket) with the
    query — an equi-join on small integer keys, the same banded-LSH
    shape as minhash dedup. Output schema matches ``similarity_topk``
    so recall is directly measurable (tests do exactly that); ranks
    are per-query over retrieved candidates only.
    """
    q, emb = _queries_and_corpus(spark, sf_dir, n_queries)
    bits = _lsh_bits_for(emb.count())  # parquet count: metadata-only
    qb = _bucketed(q, "query_id", "q_emb", bits)
    cb = _bucketed(emb, "vec_id", "embedding", bits)
    cand = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    return _rerank_topk(cand, q, emb, k)


# ----------------------------------------------------------------- IVF

IVF_CELLS = 16
IVF_NPROBE = 8
IVF_STRIDE_SALT = 7  # deterministic centroid pick: vec_id % stride == salt


def _ivf_assign(
    vecs: DataFrame, cents: DataFrame, id_col: str, emb_col: str, nprobe: int
) -> DataFrame:
    """(id, cell) rows: each vector's ``nprobe`` nearest centroid cells
    by cosine (broadcast nested-loop over the tiny centroid set).

    nprobe=1 (the whole-corpus assignment) aggregates with ``max_by``
    — one partial-aggregated shuffle. A per-id ranking window here
    would shuffle-and-sort one partition PER VECTOR, which measured 3x
    slower than brute force at 50k vectors; windows are reserved for
    the nprobe>1 query side (a handful of rows). Ties break to the
    smaller cell id via the struct comparator, keeping assignment
    deterministic.
    """
    # precomputed norms: the vector's norm fold runs once per vector,
    # not once per centroid pair (n_cells x fewer norm folds; identical
    # doubles — same fold over the same input — so oracles are unmoved)
    vecs_n = vecs.withColumn("_vn", l2_norm(F.col(emb_col)))
    cents_n = cents.withColumn("_cn", l2_norm(F.col("c_emb")))
    csim = cosine_from_norms(
        F.col(emb_col), F.col("c_emb"), F.col("_vn"), F.col("_cn")
    )
    scored = vecs_n.join(F.broadcast(cents_n)).withColumn("csim", csim)
    if nprobe == 1:
        ordk = F.struct(F.col("csim").alias("s"), (-F.col("cell")).alias("nc"))
        return scored.groupBy(id_col).agg(
            F.max_by("cell", ordk).alias("cell")
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cell"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= nprobe)
        .select(id_col, "cell")
    )


def similarity_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF-flavor ANN: coarse-quantize the corpus into centroid cells,
    probe the query's ``nprobe`` nearest cells, exact-cosine re-rank.

    Centroids are a deterministic corpus sample (fixed vec_id stride —
    the train-free IVF variant; a k-means refinement would slot in
    without changing the query shape). Corpus vectors are assigned to
    their single nearest cell; queries probe ``nprobe`` cells, so
    candidate volume is ~corpus x nprobe / n_cells per query — the
    knob-controlled fraction an IVF index trades for recall. The
    registered default is nprobe=8 since round 7 — the knee of the
    measured sweep (sf0.01, recall@10 vs exact: nprobe 1 → 0.22,
    2 → 0.38, 4 → 0.54, 8 → 0.84; SURVEY §8.5), per the round-6
    verdict. Same output schema as ``similarity_topk`` for direct
    recall checks.
    """
    q, emb = _queries_and_corpus(spark, sf_dir, n_queries)
    # parquet count(*) is answered from row-group metadata (no data
    # scan), so sizing the centroid stride this way stays cheap at scale
    n = emb.count()
    stride = max(n // n_cells, 1)
    # residue is salt % stride, not the raw salt: with a tiny corpus
    # (stride <= salt) the raw-salt predicate is unsatisfiable and both
    # engines would agree on an EMPTY result the oracle can't catch
    cents = (
        emb.filter(F.col("vec_id") % stride == IVF_STRIDE_SALT % stride)
        .orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
    )
    corpus_cells = _ivf_assign(emb, cents, "vec_id", "embedding", nprobe=1)
    query_cells = _ivf_assign(q, cents, "query_id", "q_emb", nprobe=nprobe)
    cand = (
        query_cells.join(corpus_cells, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    return _rerank_topk(cand, q, emb, k)


def _kmeans_centroids(
    emb: DataFrame,
    cents: DataFrame,
    n_iter: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Lloyd refinement of IVF centroids (the slot documented on
    :func:`similarity_ivf_topk`): assign each vector to its nearest
    centroid by cosine (same ``max_by`` single-shuffle path the query
    uses), recompute each cell's centroid as the element-wise mean of
    its members, repeat.

    Scale/determinism notes:
    - means are computed on exact decimals (partial-sum merge order
      can't perturb the doubles), so refined centroids — and therefore
      cell assignments — are identical across runs and partitionings.
      Scale is 8 (floats carry ~7 significant digits, so nothing real
      is lost) because that is the ENGINE-PORTABLE operating point:
      Spark casts float->decimal via the shortest decimal repr while
      DuckDB rounds the exact binary value, and the two agree at scale
      8 but not 18 (verified element-exact on all test SFs — DuckDB
      must also widen FLOAT->DOUBLE before the decimal cast or its
      float-path cast drifts by a float ulp). The mean itself is
      double(sum_decimal) / count — one IEEE division on identical
      inputs, bit-equal across engines;
    - each iteration is 2 keyed shuffles (assign agg + posexplode mean)
      over (id, cell) / (cell, pos) rows — never vectors-by-vectors;
    - per-iteration ``localCheckpoint`` truncates the iterative plan
      (the dedup_clusters lesson applied preemptively);
    - cosine is scale-invariant, so the mean needs no normalization
      for assignment purposes (spherical k-means' argmax is the same);
    - cells that lose all members drop out (fewer, denser cells), which
      only tightens the probe set.
    """
    for _ in range(n_iter):
        assigned = _ivf_assign(emb, cents, id_col, emb_col, nprobe=1)
        flat = assigned.join(emb.select(id_col, emb_col), id_col).select(
            "cell", F.posexplode(emb_col).alias("pos", "x")
        )
        means = flat.groupBy("cell", "pos").agg(
            (
                F.sum(F.col("x").cast("decimal(20,8)")).cast("double")
                / F.count("*")
            ).alias("m")
        )
        cents = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("c_emb"))
            .localCheckpoint()
        )
    return cents


def similarity_ivf_kmeans_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    n_iter: int = 1,
) -> DataFrame:
    """IVF ANN with k-means-refined centroids — identical query shape
    to :func:`similarity_ivf_topk` (probe nprobe cells, exact re-rank);
    only the centroid table differs. Fully oracle-checked: the Lloyd
    iteration unrolls to one CTE chain per round (assign -> unnest ->
    decimal mean -> rebuild centroid list) in
    :func:`similarity_ivf_kmeans_topk_oracle`; recall >= the
    stride-centroid variant is asserted in tests/test_similarity.py
    at nprobe=4 (where the claim was measured — at the round-7
    nprobe=8 default the two roughly tie on the isotropic test
    corpus, so the test pins near-parity there instead).

    ``n_iter`` defaults to 1: on the driver's near-isotropic synthetic
    embeddings (measured at the pre-r7 nprobe=4 default), recall@10
    was 0.58 after one Lloyd round at
    both sf0.01 and sf0.1 (vs 0.54/0.46 for stride centroids) and got
    WORSE with more rounds (0.52-0.56) — with no real cluster structure
    extra iterations just shrink some cells' basins. Real corpora with
    structure are where higher n_iter pays."""
    q, emb = _queries_and_corpus(spark, sf_dir, n_queries)
    n = emb.count()
    stride = max(n // n_cells, 1)
    seed = (
        emb.filter(F.col("vec_id") % stride == IVF_STRIDE_SALT % stride)
        .orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
    )
    cents = _kmeans_centroids(emb, seed, n_iter=n_iter)
    corpus_cells = _ivf_assign(emb, cents, "vec_id", "embedding", nprobe=1)
    query_cells = _ivf_assign(q, cents, "query_id", "q_emb", nprobe=nprobe)
    cand = (
        query_cells.join(corpus_cells, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    return _rerank_topk(cand, q, emb, k)


def similarity_ivf_topk_oracle(
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
) -> str:
    """DuckDB twin of :func:`similarity_ivf_topk` — every stage is
    SQL-expressible: centroid pick is a deterministic vec_id stride,
    cell assignment is argmax-by-(csim, -cell) (Spark ``max_by`` on a
    struct == row_number over (csim DESC, cell ASC)), probe + re-rank
    are plain joins. Cosines use the identical left fold (shared
    builder ``_cos_sql``), so cell boundaries land on bit-identical
    doubles in both engines."""
    cos = _cos_sql

    return f"""
WITH cents AS (
  SELECT vec_id AS cell, embedding AS c_emb
  FROM embeddings
  WHERE vec_id % greatest((SELECT count(*) FROM embeddings) // {n_cells}, 1)
          = {IVF_STRIDE_SALT}
            % greatest((SELECT count(*) FROM embeddings) // {n_cells}, 1)
  ORDER BY vec_id LIMIT {n_cells}
),
corpus_scored AS (
  SELECT e.vec_id, c.cell, {cos('e.embedding', 'c.c_emb')} AS csim
  FROM embeddings e CROSS JOIN cents c
),
corpus_cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC)
             AS crank
    FROM corpus_scored
  ) WHERE crank = 1
),
query_cells AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC)
             AS crank
    FROM corpus_scored WHERE vec_id < {n_queries}
  ) WHERE crank <= {nprobe}
),
cand AS (
  SELECT DISTINCT qc.query_id, cc.vec_id
  FROM query_cells qc JOIN corpus_cells cc ON qc.cell = cc.cell
  WHERE cc.vec_id <> qc.query_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         {cos('q.embedding', 'a.embedding')} AS sim
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings a ON a.vec_id = cand.vec_id
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= {k}
"""


SIMILARITY_IVF_TOPK_ORACLE = similarity_ivf_topk_oracle()


def lloyd_cents_sql(n_cells: int = IVF_CELLS, n_iter: int = 1) -> str:
    """SQL prefix ``WITH cents_0 AS (...), ..., cents_{n_iter} AS (...)``
    unrolling the Lloyd loop of :func:`_kmeans_centroids` — the
    baked-static trick of :func:`similarity_ann_portable_oracle`
    applied to iterations instead of planes. Shared by the kmeans-IVF
    oracle and the semantic-dedup oracle (operators/semdedup.py): any
    oracle needing the engine-portable refined centroids starts from
    this prefix and appends its own CTEs referencing
    ``cents_{n_iter}``. Per round: argmax assignment (row_number over
    the identical cosine fold), positional unnest
    (``generate_subscripts``/``unnest`` zip = Spark ``posexplode``),
    the engine-portable decimal(20,8) mean (see
    :func:`_kmeans_centroids` for why scale 8 and the DOUBLE-first
    widening are load-bearing), and ``list(m ORDER BY pos)`` to
    rebuild the centroid array (= array_sort(collect_list) +
    transform)."""
    cos = _cos_sql
    stride = (
        f"greatest((SELECT count(*) FROM embeddings) // {n_cells}, 1)"
    )
    parts = [
        f"""
WITH cents_0 AS (
  SELECT vec_id AS cell, embedding AS c_emb
  FROM embeddings
  WHERE vec_id % {stride} = {IVF_STRIDE_SALT} % {stride}
  ORDER BY vec_id LIMIT {n_cells}
)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
assigned_{i} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {cos('e.embedding', 'c.c_emb')} DESC, c.cell ASC
           ) AS crank
    FROM embeddings e CROSS JOIN cents_{i - 1} c
  ) WHERE crank = 1
),
flat_{i} AS (
  SELECT a.cell, generate_subscripts(e.embedding, 1) AS pos,
         CAST(unnest(e.embedding) AS DOUBLE) AS x
  FROM assigned_{i} a JOIN embeddings e ON a.vec_id = e.vec_id
),
means_{i} AS (
  SELECT cell, pos,
         CAST(sum(CAST(x AS DECIMAL(20,8))) AS DOUBLE) / count(*) AS m
  FROM flat_{i} GROUP BY cell, pos
),
cents_{i} AS (
  SELECT cell, list(m ORDER BY pos) AS c_emb FROM means_{i} GROUP BY cell
)"""
        )
    return "".join(parts)


def similarity_ivf_kmeans_topk_oracle(
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    n_iter: int = 1,
) -> str:
    """DuckDB twin of :func:`similarity_ivf_kmeans_topk` — the Lloyd
    loop is unrolled into ``n_iter`` CTE chains (the same baked-static
    trick as :func:`similarity_ann_portable_oracle`, applied to
    iterations instead of planes). Per round: argmax assignment
    (row_number over the identical cosine fold), positional unnest
    (``generate_subscripts``/``unnest`` zip = Spark ``posexplode``),
    the engine-portable decimal(20,8) mean (see
    :func:`_kmeans_centroids` for why scale 8 and the DOUBLE-first
    widening are load-bearing), and ``list(m ORDER BY pos)`` to
    rebuild the centroid array (= Spark's array_sort(collect_list) +
    transform). Every double on the cell-assignment boundary is
    bit-identical across engines, so candidate sets — and the final
    re-ranked rows — match under the driver's value hash."""
    cos = _cos_sql
    parts = [lloyd_cents_sql(n_cells, n_iter)]
    parts.append(
        f""",
corpus_scored AS (
  SELECT e.vec_id, c.cell, {cos('e.embedding', 'c.c_emb')} AS csim
  FROM embeddings e CROSS JOIN cents_{n_iter} c
),
corpus_cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC)
             AS crank
    FROM corpus_scored
  ) WHERE crank = 1
),
query_cells AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC)
             AS crank
    FROM corpus_scored WHERE vec_id < {n_queries}
  ) WHERE crank <= {nprobe}
),
cand AS (
  SELECT DISTINCT qc.query_id, cc.vec_id
  FROM query_cells qc JOIN corpus_cells cc ON qc.cell = cc.cell
  WHERE cc.vec_id <> qc.query_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         {cos('q.embedding', 'a.embedding')} AS sim
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings a ON a.vec_id = cand.vec_id
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= {k}"""
    )
    return "".join(parts)


SIMILARITY_IVF_KMEANS_TOPK_ORACLE = similarity_ivf_kmeans_topk_oracle()


NEARDUP_THRESHOLD = 0.4


def _neardup_rerank(
    cand: DataFrame, emb: DataFrame, threshold: float
) -> DataFrame:
    """Exact-cosine filter over candidate pairs with PRE-COMPUTED
    per-vector norms: the norm fold runs once per corpus vector (n
    rows) instead of twice per candidate pair (can be 100x n after a
    loose bucketing) — same doubles, same oracle, ~3x fewer
    interpreted fold evaluations on the re-rank. Shared by both
    near-dup variants."""
    en = emb.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    ea = en.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("na"),
    )
    eb = en.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nb"),
    )
    sim = cosine_from_norms(
        F.col("emb_a"), F.col("emb_b"), F.col("na"), F.col("nb")
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )


def embedding_neardup(
    spark: SparkSession, sf_dir: str, threshold: float = NEARDUP_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets.

    All-pairs semantics at bucket-join cost: pairs sharing any
    (band, bucket) are scored exactly, kept when cosine >= threshold.
    Like every near-dup op here it is approximate-by-recall but
    exact-by-precision (no false positives), which is the trade a
    100 TB dedup pipeline wants. Output: (vec_a, vec_b, sim).
    """
    from pyspark.storagelevel import StorageLevel

    emb = load_table(spark, sf_dir, "embeddings")
    bits = _lsh_bits_for(emb.count())  # parquet count: metadata-only
    # both self-join sides read the LSH buckets: persist so the
    # pandas-UDF bucketing runs once over the corpus, not twice
    b = _bucketed(emb, "vec_id", "embedding", bits).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = (
        b.alias("x")
        .join(b.alias("y"), ["band", "bucket"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return _neardup_rerank(cand, emb, threshold)

# ------------------------------------ portable-oracle ANN (md5 planes)

# Fixed band/bit geometry: the oracle is a static SQL string, so the
# portable variant cannot size bits from a runtime corpus count the way
# similarity_ann_topk does. 8x6 bits suits the driver corpora (n=500
# at sf0.01 -> ~8-vector buckets); the adaptive variant remains the
# scale default.
PORTABLE_BANDS = 8
PORTABLE_BITS = 6
EMB_DIM = 64  # driver embeddings dim (TESTDATA.md); mirrored in the oracle


def _rademacher_sign(band: int, bit: int, dim: int) -> float:
    """+1/-1 for plane (band, bit) coordinate ``dim``: the low bit of
    int(md5("band|bit|dim")[:15], 16), computed Python-side at plan
    build time. The signs are baked into BOTH engines' plans as
    literals (Catalyst ``F.lit`` arrays here, '+'/'-' strings in the
    generated oracle SQL), so cross-engine agreement needs no runtime
    hashing — only that this one function is deterministic."""
    import hashlib

    h = hashlib.md5(f"{band}|{bit}|{dim}".encode()).hexdigest()
    return 1.0 if int(h[:15], 16) % 2 == 0 else -1.0


def _portable_bucketed(emb: DataFrame, id_col: str, emb_col: str) -> DataFrame:
    """(id, band, bucket) rows from the Rademacher sign-LSH: bucket b's
    id packs PORTABLE_BITS sign bits of projections b*BITS..b*BITS+t,
    little-endian. Pure Catalyst — the same index-ordered double folds
    as the DuckDB oracle, so buckets are bit-identical across engines.

    Shape notes: the 48 plane sign vectors ride ONE array<array>
    literal and all projections evaluate in ONE ``transform`` pass
    whose result lands as a plain attribute before the bucket packing
    references it (48 separate fold subtrees measured 2.2x slower to
    analyze+evaluate; checksum-identical). Round 7: the literal is
    built with a single nested ``F.lit`` and the bucket packing with
    a ``transform`` lambda — the previous 48x64 per-element ``F.lit``
    + 288 ``element_at`` construction cost ~4.8 s of py4j round-trips
    PER CALL at DataFrame-build time (measured; this was the whole r6
    bench regression on this query), before Spark saw the plan.
    """
    # dim guard: zip_with pads a short/long embedding with NULLs, which
    # would silently produce null buckets (empty candidate sets) while
    # the oracle's generate_series(1, EMB_DIM) truncates differently —
    # a cross-engine divergence the hash gate can't attribute. Fail
    # loudly per-row instead (size() is O(1) on the array header).
    checked = F.when(F.size(F.col(emb_col)) == EMB_DIM, F.col(emb_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"portable LSH requires {EMB_DIM}-dim embeddings, got dim="),
                F.size(F.col(emb_col)).cast("string"),
            )
        )
    )
    # ONE parsed SQL literal: F.lit on a 48x64 nested Python list costs
    # ~1.4 s of py4j element conversion per call; parsing the same
    # literal from a single expression string costs ~2 ms (measured)
    signs_mat = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                "1.0D" if _rademacher_sign(b, t, i) > 0 else "-1.0D"
                for i in range(EMB_DIM)
            )
            + ")"
            for b in range(PORTABLE_BANDS)
            for t in range(PORTABLE_BITS)
        )
        + ")"
    )
    proj_arr = F.transform(
        signs_mat,
        lambda s: F.aggregate(
            F.zip_with(checked, s, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    withp = emb.select(F.col(id_col), proj_arr.alias("projs"))
    # bucket packing: one transform lambda over the band indices; the
    # bit sum references the lambda's band var, so the whole packing is
    # a handful of expression nodes instead of 288 element_at subtrees
    buckets = F.transform(
        F.lit(list(range(PORTABLE_BANDS))),
        lambda b: sum(
            (F.get(F.col("projs"), b * PORTABLE_BITS + t) >= 0).cast("int")
            * (1 << t)
            for t in range(PORTABLE_BITS)
        ),
    )
    return withp.select(F.col(id_col), F.posexplode(buckets).alias("band", "bucket"))


def similarity_ann_portable(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """ANN top-k with a fully oracle-checkable LSH family.

    Same banded-LSH architecture as :func:`similarity_ann_topk`
    (bucket candidates on (band, bucket) equi-keys, exact cosine
    re-rank), with the numpy Gaussian hyperplanes replaced by md5-seeded
    Rademacher (+/-1) planes evaluated as Catalyst array folds. Every
    intermediate — sign bit, bucket id, candidate set, re-ranked sim —
    is reproducible in DuckDB, so the driver's hash_match gate covers
    the ENTIRE ANN pipeline (the `dedup_minhash_portable` trick applied
    to vector search). Rademacher projections are a standard sign-LSH
    family (Achlioptas 2003: +/-1 entries preserve random-projection
    guarantees), so recall behavior matches the Gaussian variant.

    Zero Python on any path: the projection folds are JVM codegen.
    Output schema matches ``similarity_topk`` for direct recall checks.
    """
    q, emb = _queries_and_corpus(spark, sf_dir, n_queries)
    qb = _portable_bucketed(q, "query_id", "q_emb")
    cb = _portable_bucketed(emb, "vec_id", "embedding")
    cand = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    return _rerank_topk(cand, q, emb, k)


def _sign_string(band: int, bit: int) -> str:
    return "".join(
        "+" if _rademacher_sign(band, bit, i) > 0 else "-" for i in range(EMB_DIM)
    )


def _proj_sql(band: int, bit: int) -> str:
    """One Rademacher projection as a DuckDB left fold, signs baked in
    as a '+'/'-' literal string — same index order as the Catalyst
    projection transform in :func:`_portable_bucketed`."""
    s = _sign_string(band, bit)
    return (
        f"list_reduce(list_transform(generate_series(1, {EMB_DIM}), "
        f"i -> CAST(embedding[i] AS DOUBLE) * "
        f"(CASE WHEN substr('{s}', i, 1) = '+' THEN 1.0 ELSE -1.0 END)), "
        "(acc, x) -> acc + x)"
    )


def _bucket_sql(band: int) -> str:
    return " + ".join(
        f"(CASE WHEN {_proj_sql(band, t)} >= 0 THEN {1 << t} ELSE 0 END)"
        for t in range(PORTABLE_BITS)
    )


def _band_selects_sql() -> str:
    return "\nUNION ALL\n".join(
        f"SELECT vec_id, {b} AS band, {_bucket_sql(b)} AS bucket FROM embeddings"
        for b in range(PORTABLE_BANDS)
    )


def similarity_ann_portable_oracle(
    k: int = TOP_K, n_queries: int = N_QUERIES
) -> str:
    """DuckDB twin: identical Rademacher planes (encoded as '+'/'-'
    strings), identical left-fold projection order, identical packing,
    then the same candidate join + exact re-rank as the brute-force
    oracle. All fragments come from the shared builders (_proj_sql /
    _bucket_sql / _band_selects_sql / _cos_sql) so the twins cannot
    drift."""
    return f"""
WITH buck AS (
{_band_selects_sql()}
),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS vec_id
  FROM buck qb JOIN buck cb ON qb.band = cb.band AND qb.bucket = cb.bucket
  WHERE qb.vec_id < {n_queries} AND cb.vec_id <> qb.vec_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         {_cos_sql('q.embedding', 'a.embedding')} AS sim
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings a ON a.vec_id = cand.vec_id
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= {k}
"""


SIMILARITY_ANN_PORTABLE_ORACLE = similarity_ann_portable_oracle()


def embedding_neardup_portable(
    spark: SparkSession, sf_dir: str, threshold: float = NEARDUP_THRESHOLD
) -> DataFrame:
    """Embedding near-dup pairs with the md5-Rademacher LSH family —
    the oracle-checkable twin of :func:`embedding_neardup`. Same
    bucket-join candidate generation and exact-precision filter; the
    bucketing is pure Catalyst codegen (no pandas UDF), so the persist
    trades a cheap recompute for one in-memory scan on the self-join.
    Output: (vec_a, vec_b, sim)."""
    from pyspark.storagelevel import StorageLevel

    emb = load_table(spark, sf_dir, "embeddings")
    b = _portable_bucketed(emb, "vec_id", "embedding").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = (
        b.alias("x")
        .join(b.alias("y"), ["band", "bucket"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return _neardup_rerank(cand, emb, threshold)


def embedding_neardup_portable_oracle(threshold: float = NEARDUP_THRESHOLD) -> str:
    """Same shared fragment builders as the ANN-portable oracle; only
    the candidate predicate (all-pairs vec_a < vec_b) and the final
    threshold filter differ."""
    return f"""
WITH buck AS (
{_band_selects_sql()}
),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM buck x JOIN buck y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.vec_id < y.vec_id
),
scored AS (
  SELECT cand.vec_a, cand.vec_b,
         {_cos_sql('q.embedding', 'a.embedding')} AS sim
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.vec_a
  JOIN embeddings a ON a.vec_id = cand.vec_b
)
SELECT vec_a, vec_b, sim FROM scored WHERE sim >= {threshold}
"""


EMBEDDING_NEARDUP_PORTABLE_ORACLE = embedding_neardup_portable_oracle()

# --------------------------------------------------- filtered search

FILTER_LABELS = (0, 1, 2)  # metadata predicate for the filtered search


def similarity_filtered_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    labels: tuple[int, ...] = FILTER_LABELS,
) -> DataFrame:
    """Filtered vector search: exact cosine top-k among corpus vectors
    passing a metadata predicate (label IN ...) — the filtered-ANN
    shape every vector store implements.

    Pre-filtering is the 100 TB-correct order: the label predicate
    pushes into the parquet scan (row-group pruning on a dictionary
    column), so the Q x N score computation runs over the ~30% of the
    corpus that qualifies rather than scoring everything and
    discarding post-hoc. Output: (query_id, rank, vec_id, label, sim).
    """
    q, emb = _queries_and_corpus(spark, sf_dir, n_queries)
    emb = emb.filter(F.col("label").isin(*labels))
    qn = q.withColumn("_qn", l2_norm(F.col("q_emb")))
    en = emb.withColumn("_en", l2_norm(F.col("embedding")))
    sim = cosine_from_norms(
        F.col("q_emb"), F.col("embedding"), F.col("_qn"), F.col("_en")
    )
    scored = (
        qn.join(en, F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .select("query_id", "vec_id", "label", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "label", "sim")
    )


def similarity_filtered_topk_oracle(
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    labels: tuple[int, ...] = FILTER_LABELS,
) -> str:
    in_list = ", ".join(str(x) for x in labels)
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS vec_id, a.label AS label,
         {_cos_sql('q.embedding', 'a.embedding')} AS sim
  FROM embeddings q, embeddings a
  WHERE q.vec_id < {n_queries} AND a.vec_id <> q.vec_id
    AND a.label IN ({in_list})
),
ranked AS (
  SELECT query_id, vec_id, label, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, label, sim FROM ranked WHERE rank <= {k}
"""


SIMILARITY_FILTERED_TOPK_ORACLE = similarity_filtered_topk_oracle()


# ---------------------------- semantic eval decontamination (r11)
#
# The EMBEDDING tier of the contamination family, completing modality
# parity: text has exact n-gram / fuzzy winnow / stored tiers, images
# have the dHash tier (multimodal.media_decontaminate) — this adds
# SEMANTIC contamination, the failure mode the other tiers cannot
# see: an eval item paraphrased or re-rendered into training data
# shares no n-grams and no perceptual hash, but its embedding stays
# close (the rationale of embedding-based decontamination in public
# LLM data-curation pipelines, e.g. the SemDeDup-style cosine
# threshold applied train-vs-eval instead of train-vs-train).
#
# 100 TB shape (the similarity_topk precedent): the eval set is
# benchmark-sized, so its vectors BROADCAST with precomputed norms;
# the training corpus pays one scan with a per-row fold against the
# broadcast side (linear in train size for a fixed eval set — the
# scored "join" is a broadcast nested loop by construction, exactly
# like query-broadcast exact scoring). The corpus never self-joins.
# At extreme eval sizes the IVF/PQ machinery in this module is the
# shortlist path; the exact tier is the recall-lossless arbiter.

SEM_CONTAM_MIN_COS = 0.35  # corpus-calibrated: flags 4/6/74 train
# vectors at sf0.001/0.01/0.1 (measured) — non-vacuous at every
# driver scale, far above the ~0.14 median background cosine


def embedding_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    min_cos: float = SEM_CONTAM_MIN_COS,
) -> DataFrame:
    """(vec_id, n_eval_matches, max_sim) — TRAINING vectors whose
    cosine against any EVAL-split vector reaches ``min_cos`` (the
    deterministic vec_id % EVAL_MOD == EVAL_RESIDUE split, the same
    modulus convention as the text/image tiers). Library surface in
    r11 with a pre-verified oracle (registry saturation note);
    seeded-leak golden plants an exact eval twin and a paraphrase
    (scaled + small perturbation) and pins both flaggings."""
    from .winnow import EVAL_MOD, EVAL_RESIDUE

    emb = load_table(spark, sf_dir, "embeddings")
    is_eval = F.col("vec_id") % EVAL_MOD == EVAL_RESIDUE
    ev = F.broadcast(
        emb.filter(is_eval)
        .select(F.col("embedding").alias("e_emb"))
        .withColumn("_en", l2_norm(F.col("e_emb")))
    )
    tr = emb.filter(~is_eval).withColumn("_tn", l2_norm(F.col("embedding")))
    sim = cosine_from_norms(
        F.col("embedding"), F.col("e_emb"), F.col("_tn"), F.col("_en")
    )
    return (
        tr.join(ev)
        .withColumn("sim", sim)
        .filter(F.col("sim") >= min_cos)
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_eval_matches"),
            F.max("sim").alias("max_sim"),
        )
    )


def embedding_decontaminate_oracle(
    min_cos: float = SEM_CONTAM_MIN_COS,
) -> str:
    from .winnow import EVAL_MOD, EVAL_RESIDUE

    return f"""
WITH ev AS (
  SELECT embedding AS e_emb FROM embeddings
  WHERE vec_id % {EVAL_MOD} = {EVAL_RESIDUE}
),
scored AS (
  SELECT t.vec_id, {_cos_sql('t.embedding', 'e.e_emb')} AS sim
  FROM embeddings t, ev e
  WHERE t.vec_id % {EVAL_MOD} <> {EVAL_RESIDUE}
)
SELECT vec_id, count(*) AS n_eval_matches, max(sim) AS max_sim
FROM scored WHERE sim >= {min_cos}
GROUP BY vec_id
"""


EMBEDDING_DECONTAMINATE_ORACLE = embedding_decontaminate_oracle()
