"""Quality-weighted importance sampling over the document corpus.

The data-recipe step between hard filtering and uniform sampling:
instead of keeping everything above a quality threshold (cliff
effects) or sampling uniformly (wastes budget on junk), accept each
document with probability proportional to its quality score — the
soft selection used by modern pretraining mixes (e.g. quality-
classifier-weighted sampling in DCLM, Li et al. 2024,
arXiv:2406.11794).

Acceptance rule: ``p_keep = min(1, RATE * quality / mean_quality)``
— a document of average quality keeps with probability ``RATE``,
better documents proportionally more. The keep decision is the
md5-derived deterministic uniform of ``operators/pipeline.py`` (same
rationale: task retries and engine swaps must agree on every
keep/drop at 100 TB; ``rand()`` does not survive either), under its
own seed so this sampler is independent of the mixture sampler.

Plan shape: the per-doc quality features are one map-only projection
(``quality_score``); the corpus mean is a single-row decimal-exact
aggregate BROADCAST back over the frame (one scalar join, no
reshuffle of the docs); the keep decision is a per-row hash compare.
Two passes over the scan, zero keyed shuffles of the corpus.

Output: (doc_id, quality, p_keep, kept) — the audit frame a pipeline
would persist next to the sampled corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text_analysis import QUALITY_SCORE_ORACLE, quality_score

IMPORTANCE_RATE = 0.3  # corpus-level target keep rate at mean quality
IMPORTANCE_SEED = "imp1"  # independent of pipeline.SAMPLE_SEED


def _uniform(doc_id: F.Column) -> F.Column:
    """Deterministic uniform in [0,1) from (IMPORTANCE_SEED, doc_id);
    the ``operators/pipeline.py:_uniform`` construction under this
    module's own seed."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(IMPORTANCE_SEED), doc_id.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return h.cast("double") / F.lit(4294967296.0)


def importance_sample(
    spark: SparkSession, sf_dir: str, rate: float = IMPORTANCE_RATE
) -> DataFrame:
    """(doc_id, quality, p_keep, kept): quality-proportional sampling
    decisions for every document, deterministic across runs/engines."""
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    # decimal-exact mean: partial-sum merge order cannot perturb the
    # double, so p_keep is bit-identical to the oracle's. Scale 8, not
    # 18: Spark rounds double->decimal through the shortest decimal
    # repr while DuckDB rounds the exact binary value, and the two
    # only agree at scale 8 (the _kmeans_centroids lesson — scale 18
    # diverged by one trailing digit at sf0.01 and failed the hash)
    stats = q.agg(
        (
            F.sum(F.col("quality").cast("decimal(20,8)")).cast("double")
            / F.count("*")
        ).alias("mean_q")
    )
    p = F.least(F.lit(rate) * F.col("quality") / F.col("mean_q"), F.lit(1.0))
    return (
        q.join(F.broadcast(stats))
        .withColumn("p_keep", p)
        .withColumn("kept", _uniform(F.col("doc_id")) < F.col("p_keep"))
        .select("doc_id", "quality", "p_keep", "kept")
    )


IMPORTANCE_SAMPLE_ORACLE = f"""
WITH q AS (
  SELECT doc_id, quality FROM ({QUALITY_SCORE_ORACLE}) qs
),
stats AS (
  SELECT CAST(sum(CAST(quality AS DECIMAL(20,8))) AS DOUBLE) / count(*)
           AS mean_q
  FROM q
)
SELECT doc_id, quality,
       least({IMPORTANCE_RATE} * quality / mean_q, 1.0) AS p_keep,
       CAST(CAST(concat('0x', substr(md5(concat('{IMPORTANCE_SEED}',
             CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) AS DOUBLE)
         / 4294967296.0
         < least({IMPORTANCE_RATE} * quality / mean_q, 1.0) AS kept
FROM q CROSS JOIN stats
"""
