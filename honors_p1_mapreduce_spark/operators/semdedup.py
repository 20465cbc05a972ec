"""Semantic deduplication over the embedding corpus (SemDeDup-style).

Cluster the corpus with the engine-portable k-means
(:func:`..operators.similarity._kmeans_centroids`), then mark
within-cluster near-duplicates by exact cosine: a vector is dropped
when a *lower-id* vector in the same cell sits above the similarity
threshold (the deterministic keep-first greedy most training-data
pipelines use; Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540).

The reference engine has nothing like this (no joins, no vectors —
SURVEY.md §2.4); it is north-star LLM-pipeline surface, like the rest
of the dedup family in ``operators/dedup.py`` / ``similarity.py``.

Why clustering first: exact all-pairs cosine is O(n²) and dead at
100 TB. K-means cells bound the quadratic term to Σ|cell|² — with
cells sized ~√n (the ``n_cells`` knob; 16 suits the 500–2000-vector
driver corpora) the pair join is near-linear, and each cell's pair
set co-locates under ONE (cell) shuffle. The trade is recall at cell
boundaries: a dup pair split across cells is missed — the same
recall-for-scale trade as SemDeDup itself, which dedups within
k-means clusters only.

Plan shape: Lloyd refinement (2 keyed shuffles/round, localCheckpoint
per round) → nprobe=1 assignment (``max_by`` agg, one shuffle) →
within-cell self-join on the assignment frame (equi-join on cell,
id-ordered to halve the pairs) → exact cosine with per-vector
precomputed norms → distinct dropped ids → left-anti-style kept flag.
Every stage is the same machinery the oracle-green kmeans/near-dup
queries already use; the oracle chains :func:`lloyd_cents_sql` with
the pair/drop CTEs so the whole pipeline hash-matches in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.vectors import cosine_from_norms, l2_norm
from ..sources.tables import load_table
from .similarity import (
    IVF_CELLS,
    IVF_STRIDE_SALT,
    _cos_sql,
    _ivf_assign,
    _kmeans_centroids,
    lloyd_cents_sql,
)

SEMDEDUP_THRESHOLD = 0.4  # driver embeddings are near-isotropic; the
# 0.95 of real SemDeDup corpora would match nothing here (same
# operating point as NEARDUP_THRESHOLD in similarity.py)
SEMDEDUP_ITER = 1


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int = IVF_CELLS,
    n_iter: int = SEMDEDUP_ITER,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> DataFrame:
    """One row per corpus vector: (vec_id, cell, kept).

    ``kept`` is false iff some lower-id vector in the same k-means
    cell has cosine >= ``threshold`` — deleting the false rows leaves
    exactly one representative (the lowest id) of every within-cell
    dup pair chain's head, deterministically.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_from(emb, n_cells=n_cells, n_iter=n_iter, threshold=threshold)


def semantic_dedup_from(
    emb: DataFrame,
    n_cells: int = IVF_CELLS,
    n_iter: int = SEMDEDUP_ITER,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> DataFrame:
    """Library-level dedup over any (vec_id, embedding) frame — the
    body of :func:`semantic_dedup`, factored so scale probes and tests
    can drive it with synthetic corpora (``n_cells`` is the knob that
    must scale with corpus size, ~sqrt(n), to bound Σ|cell|²)."""
    n = emb.count()
    stride = max(n // n_cells, 1)
    seed = (
        emb.filter(F.col("vec_id") % stride == IVF_STRIDE_SALT % stride)
        .orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
    )
    cents = _kmeans_centroids(emb, seed, n_iter=n_iter)
    assigned = _ivf_assign(emb, cents, "vec_id", "embedding", nprobe=1)

    # (vec, cell, embedding, norm) feeds BOTH pair-join sides and the
    # kept-flag output — persist so the assignment runs once, not 3x
    # (the embedding_neardup bucket-persist pattern)
    en = (
        assigned.join(emb, "vec_id")
        .select(
            "vec_id", "cell", "embedding", l2_norm(F.col("embedding")).alias("nrm")
        )
        .persist()
    )
    a = en.select(
        F.col("cell"),
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("na"),
    )
    b = en.select(
        F.col("cell"),
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nb"),
    )
    sim = cosine_from_norms(
        F.col("emb_a"), F.col("emb_b"), F.col("na"), F.col("nb")
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return en.select("vec_id", "cell").join(dropped, "vec_id", "left").select(
        "vec_id",
        "cell",
        F.coalesce(~F.col("is_dup"), F.lit(True)).alias("kept"),
    )


def semantic_dedup_oracle(
    n_cells: int = IVF_CELLS,
    n_iter: int = SEMDEDUP_ITER,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> str:
    """DuckDB twin: :func:`lloyd_cents_sql` centroid chain + argmax
    assignment + within-cell ordered pair join on the identical cosine
    fold. Every double on the cell and threshold boundaries is
    bit-identical across engines, so the kept flags hash-match."""
    cos = _cos_sql
    return f"""{lloyd_cents_sql(n_cells, n_iter)},
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {cos('e.embedding', 'c.c_emb')} DESC, c.cell ASC
           ) AS crank
    FROM embeddings e CROSS JOIN cents_{n_iter} c
  ) WHERE crank = 1
),
pairs AS (
  SELECT b.vec_id AS b_id
  FROM assigned a
  JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE {cos('ea.embedding', 'eb.embedding')} >= {threshold}
),
dropped AS (SELECT DISTINCT b_id AS vec_id FROM pairs)
SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


SEMANTIC_DEDUP_ORACLE = semantic_dedup_oracle()


# --------------------------- fast path (Arrow/numpy, non-portable) ---


def semantic_dedup_fast(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int = IVF_CELLS,
    n_iter: int = SEMDEDUP_ITER,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> DataFrame:
    """The 100 TB face of :func:`semantic_dedup`: identical pipeline
    shape (stride seed → Lloyd → assign → within-cell pairs →
    keep-lowest-id), but every cosine evaluation runs as an
    Arrow-batched numpy matmul instead of Catalyst's interpreted fold
    — measured 21x end-to-end at a 20k-vector probe (178 s -> 8.3 s,
    IDENTICAL kept counts; see SURVEY §8.5). Float-summation order differs from the fold, so doubles on
    cell/threshold boundaries can flip: this variant is rows-only
    (no DuckDB oracle) and ``tests/test_similarity.py`` pins
    agreement with the oracle-checked portable twin instead — the
    same fast/portable twin contract as similarity_ann_topk."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_fast_from(
        emb, n_cells=n_cells, n_iter=n_iter, threshold=threshold
    )


def semantic_dedup_fast_from(
    emb: DataFrame,
    n_cells: int = IVF_CELLS,
    n_iter: int = SEMDEDUP_ITER,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> DataFrame:
    """Library-level fast dedup over any (vec_id, embedding) frame."""
    n = emb.count()
    stride = max(n // n_cells, 1)
    seed = (
        emb.filter(F.col("vec_id") % stride == IVF_STRIDE_SALT % stride)
        .orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
    )

    def _assign_udf(cells: np.ndarray, mat_c: np.ndarray):
        mat_cn = mat_c / np.maximum(np.linalg.norm(mat_c, axis=1, keepdims=True), 1e-30)

        @pandas_udf("long")
        def _assign(vecs: pd.Series) -> pd.Series:
            if len(vecs) == 0:
                return pd.Series([], dtype="int64")
            m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = mn @ mat_cn.T  # (batch, n_cells)
            # argmax with smaller-cell-id tie-break: argmax returns the
            # FIRST max index, and cells[] is sorted ascending
            return pd.Series(cells[np.argmax(sims, axis=1)])

        return _assign

    cents = seed
    for _ in range(n_iter):
        rows = cents.orderBy("cell").collect()
        cells = np.array([r["cell"] for r in rows], dtype=np.int64)
        mat_c = np.stack([np.asarray(r["c_emb"], dtype=np.float64) for r in rows])
        assigned = emb.select(
            "vec_id", _assign_udf(cells, mat_c)(F.col("embedding")).alias("cell")
        )
        cents = (
            assigned.join(emb, "vec_id")
            .select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda t: t["m"]).alias("c_emb"))
            .localCheckpoint()
        )
    rows = cents.orderBy("cell").collect()
    cells = np.array([r["cell"] for r in rows], dtype=np.int64)
    mat_c = np.stack([np.asarray(r["c_emb"], dtype=np.float64) for r in rows])
    en = (
        emb.select(
            "vec_id",
            "embedding",
            _assign_udf(cells, mat_c)(F.col("embedding")).alias("cell"),
        )
        .persist()
    )

    @pandas_udf("double")
    def _pair_cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        mb = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        na = np.maximum(np.linalg.norm(ma, axis=1), 1e-30)
        nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-30)
        return pd.Series(np.einsum("ij,ij->i", ma, mb) / (na * nb))

    a = en.select(
        "cell", F.col("vec_id").alias("a_id"), F.col("embedding").alias("emb_a")
    )
    b = en.select(
        "cell", F.col("vec_id").alias("b_id"), F.col("embedding").alias("emb_b")
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("sim", _pair_cos(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("sim") >= threshold)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return en.select("vec_id", "cell").join(dropped, "vec_id", "left").select(
        "vec_id",
        "cell",
        F.coalesce(~F.col("is_dup"), F.lit(True)).alias("kept"),
    )
