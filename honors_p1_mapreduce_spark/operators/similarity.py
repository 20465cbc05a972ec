"""Similarity search over the ``embeddings`` table (north-star op).

No reference counterpart (the reference is line-text MapReduce only;
SURVEY.md §2.4) — this is the LLM-pipeline surface: approximate
nearest neighbors over an ``array<float>`` column.

Two paths:

- ``similarity_topk`` — exact brute-force cosine top-k for a small
  query set. The query side is broadcast, so the "cross" join is a
  map-side nested loop over each partition: no shuffle of the corpus,
  embarrassingly parallel, and the per-row cost is one fused
  zip_with/aggregate fold (JVM-side, no Python). This is the baseline
  and the verification oracle for the ANN path. Oracle parity is
  bit-exact because both engines run the identical left fold over the
  identical doubles (DuckDB ``list_reduce`` mirrors Spark's
  ``F.aggregate`` with 0.0 init).
- ``similarity_ann_topk`` / ``embedding_neardup`` — the 100 TB path:
  random-hyperplane LSH (signed projections, banded like minhash) via
  an Arrow-batched pandas UDF (numpy matmul per batch), bucket
  equi-join for candidates, exact cosine re-rank. Candidate volume is
  O(bucket size), never O(n²); band/bit counts trade recall vs
  candidate count and are explicit knobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_sim, lsh_band_buckets
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
    scored = (
        q.join(emb, F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", cosine_sim(F.col("q_emb"), F.col("embedding")))
        .select("query_id", "vec_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


# DuckDB twin: identical left fold (init 0.0) over identical doubles ->
# bit-equal sim; rank/tie-break mirrored.
def similarity_topk_oracle(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    dot = (
        "list_reduce(list_transform(generate_series(1, len(a.embedding)), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), "
        "(acc, x) -> acc + x)"
    )
    norm = (
        "sqrt(list_reduce(list_transform(generate_series(1, len({v}.embedding)), "
        "i -> CAST({v}.embedding[i] AS DOUBLE) * CAST({v}.embedding[i] AS DOUBLE)), "
        "(acc, x) -> acc + x))"
    )
    nq, na = norm.format(v="q"), norm.format(v="a")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS vec_id,
         CASE WHEN {nq} = 0 OR {na} = 0 THEN 0.0
              ELSE {dot} / ({nq} * {na}) END AS sim
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
    scored = (
        cand.join(q, "query_id")
        .join(emb, "vec_id")
        .withColumn("sim", cosine_sim(F.col("q_emb"), F.col("embedding")))
        .select("query_id", "vec_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


# ----------------------------------------------------------------- IVF

IVF_CELLS = 16
IVF_NPROBE = 4
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
    scored = vecs.join(F.broadcast(cents)).withColumn(
        "csim", cosine_sim(F.col(emb_col), F.col("c_emb"))
    )
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
    knob-controlled fraction an IVF index trades for recall. Same
    output schema as ``similarity_topk`` for direct recall checks.
    """
    q, emb = _queries_and_corpus(spark, sf_dir, n_queries)
    # parquet count(*) is answered from row-group metadata (no data
    # scan), so sizing the centroid stride this way stays cheap at scale
    n = emb.count()
    stride = max(n // n_cells, 1)
    cents = (
        emb.filter(F.col("vec_id") % stride == IVF_STRIDE_SALT)
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
    scored = (
        cand.join(q, "query_id")
        .join(emb, "vec_id")
        .withColumn("sim", cosine_sim(F.col("q_emb"), F.col("embedding")))
        .select("query_id", "vec_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


NEARDUP_THRESHOLD = 0.4


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
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("sim", cosine_sim(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )

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
    scored = (
        q.join(emb, F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", cosine_sim(F.col("q_emb"), F.col("embedding")))
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
    dot = (
        "list_reduce(list_transform(generate_series(1, len(a.embedding)), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), "
        "(acc, x) -> acc + x)"
    )
    norm = (
        "sqrt(list_reduce(list_transform(generate_series(1, len({v}.embedding)), "
        "i -> CAST({v}.embedding[i] AS DOUBLE) * CAST({v}.embedding[i] AS DOUBLE)), "
        "(acc, x) -> acc + x))"
    )
    nq, na = norm.format(v="q"), norm.format(v="a")
    in_list = ", ".join(str(x) for x in labels)
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS vec_id, a.label AS label,
         CASE WHEN {nq} = 0 OR {na} = 0 THEN 0.0
              ELSE {dot} / ({nq} * {na}) END AS sim
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
