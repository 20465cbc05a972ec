"""Cross-table composition: similarity search gated by document quality.

The retrieval shape a curation pipeline actually runs — "nearest
neighbors among documents worth keeping" — which needs the embedding
table JOINED to a predicate computed on the document table
(vec_id == doc_id is the corpus alignment), not a same-table metadata
filter like ``similarity_filtered_topk``'s label predicate.

Plan shape: the quality features are one map-only projection over
documents; the qualifying-id set SEMI-joins the embedding scan BEFORE
any scoring, so the cosine folds only run over surviving vectors
(filter-then-score, the filtered-ANN ordering that matters at 100 TB
— score-then-filter pays the full fold cost to throw most of it
away). The inner join that carries ``quality`` into the output is on
the same key and co-planned with the semi filter; top-k is the
standard deterministic (sim DESC, vec_id ASC) window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_from_norms, l2_norm
from ..sources.tables import load_table
from .similarity import N_QUERIES, TOP_K, _cos_sql
from .text_analysis import QUALITY_SCORE_ORACLE, quality_score

QUALITY_FLOOR = 0.55  # corpus mean quality is ~0.54: keeps roughly half


def similarity_doc_quality_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    floor: float = QUALITY_FLOOR,
) -> DataFrame:
    """(query_id, rank, vec_id, quality, sim): exact cosine top-k over
    the corpus restricted to vectors whose document clears the quality
    floor. Queries are the first ``n_queries`` vectors, unfiltered."""
    qual = (
        quality_score(spark, sf_dir)
        .filter(F.col("quality") >= floor)
        .select("doc_id", "quality")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = (
        emb.join(qual, emb.vec_id == qual.doc_id)
        .select("vec_id", "embedding", "quality")
        .withColumn("_en", l2_norm(F.col("embedding")))
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
        .withColumn("_qn", l2_norm(F.col("q_emb")))
    )
    sim = cosine_from_norms(
        F.col("q_emb"), F.col("embedding"), F.col("_qn"), F.col("_en")
    )
    scored = (
        q.join(corpus, F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .select("query_id", "vec_id", "quality", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "quality", "sim")
    )


SIMILARITY_DOC_QUALITY_TOPK_ORACLE = f"""
WITH qual AS (
  SELECT doc_id, quality FROM ({QUALITY_SCORE_ORACLE}) qs
  WHERE quality >= {QUALITY_FLOOR}
),
scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS vec_id, qual.quality AS quality,
         {_cos_sql('q.embedding', 'a.embedding')} AS sim
  FROM embeddings q, embeddings a
  JOIN qual ON a.vec_id = qual.doc_id
  WHERE q.vec_id < {N_QUERIES} AND a.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, vec_id, quality, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, quality, sim FROM ranked WHERE rank <= {TOP_K}
"""
