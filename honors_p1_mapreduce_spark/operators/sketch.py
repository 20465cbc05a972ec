"""Sketches and quantiles: count-min frequency sketch + exact percentiles.

The reference engine has no sketch/quantile surface at all (its only
aggregations are the per-key count/sum shapes in the example reducers,
mr/examples/*/reducer.py) — this module is Spark-first capability
fill-in for the summary statistics a 100 TB training-data pipeline
needs:

- ``pricing_percentiles``: exact per-group percentiles via Spark's
  built-in ``percentile`` aggregate. Spark's exact percentile and
  DuckDB's ``quantile_cont`` use the same linear interpolation and are
  bit-identical (verified empirically at sf0.01), so the oracle is a
  hash_match, not rows-only. Scale note: the exact aggregate buffers
  each group's values — fine for bounded group counts (3 groups here);
  at 100 TB with huge groups the knob is ``approx_percentile``
  (t-digest-style, mergeable map-side) at the cost of oracle
  exactness.

- ``cms_sketch`` / ``cms_estimate``: a count-min sketch (Cormode &
  Muthukrishnan 2005) over the corpus token stream. The sketch IS a
  DataFrame aggregate: D×W cells, each cell the sum of counts of
  tokens hashing into it. The plan does the heavy lifting in the
  right order for scale — explode tokens → hash-aggregate exact
  per-token counts FIRST (map-side combine makes the shuffle
  O(distinct tokens), not O(token occurrences)) → expand each distinct
  token to its D cells and aggregate the D×W≤2048-row sketch. Point
  estimates then read min-over-depths of the probed cells: the
  classic CMS guarantee est ≥ true, est ≤ true + εN w.h.p.

All hashing is the engine-portable 60-bit md5-derived hash (same trick
as simhash/minhash) so the DuckDB oracle reproduces the sketch cell
for cell — the whole family is hash_match-checked, no rows-only
escape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col, tokens_sql
from ..sources.tables import load_table

# --------------------------------------------------- exact percentiles

PCT_PROBES = (0.25, 0.5, 0.75, 0.95)


def pricing_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag exact price/quantity percentiles over lineitem.

    One pruned scan (3 columns) → exact ``percentile`` aggregate on a
    3-group key. Group-by percentile is the distribution-summary
    companion to ``pricing_summary``'s moments.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [
        F.expr(f"percentile(l_extendedprice, {p})").alias(f"p{int(p * 100)}_price")
        for p in PCT_PROBES
    ]
    return li.groupBy("l_returnflag").agg(
        *aggs,
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.count("*").alias("n_items"),
    )


PRICING_PERCENTILES_ORACLE = f"""
SELECT l_returnflag,
       {", ".join(f"quantile_cont(l_extendedprice, {p}) AS p{int(p * 100)}_price" for p in PCT_PROBES)},
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
"""

# ---------------------------------------------------- count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 512

# Probe mix: frequent corpus tokens + one absent token (true count 0,
# estimate still ≥ 0 shows the collision-overcount side of the bound).
CMS_PROBES = ("join", "scan", "merge", "window", "hash", "zzz_absent")


def _cms_bucket(tok: Column, depth: int) -> Column:
    """Row-hash for depth d: 60-bit md5 of 'd:token', mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{depth}:"), tok)), 1, 15), 16, 10
    ).cast("bigint")
    return (h % CMS_WIDTH).cast("int")


def _cms_bucket_sql(tok: str, depth: int) -> str:
    return (
        f"CAST(CAST(concat('0x', substr(md5(concat('{depth}:', {tok})), 1, 15)) "
        f"AS BIGINT) % {CMS_WIDTH} AS INT)"
    )


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-token counts — the pre-aggregation that keeps every
    downstream sketch stage O(vocabulary), not O(corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col("text")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
    )


_TOKEN_COUNTS_SQL = f"""
tok AS (
  SELECT t.t AS t FROM documents, unnest({tokens_sql("text")}) AS t(t)
),
tf AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t)
"""


def cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the D×W count-min sketch as (depth, bucket, cnt).

    posexplode expands each distinct token to its D cells — D plain
    hash columns over an attribute, no subtree re-inlining — then one
    tiny aggregate produces ≤ D×W rows regardless of corpus size.
    """
    tf = _token_counts(spark, sf_dir)
    cells = tf.select(
        "cnt",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("t"), d) for d in range(CMS_DEPTH)])
        ).alias("depth", "bucket"),
    )
    return cells.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


CMS_SKETCH_ORACLE = f"""
WITH {_TOKEN_COUNTS_SQL},
cells AS (
  {" UNION ALL ".join(
      f"SELECT CAST({d} AS INT) AS depth, {_cms_bucket_sql('t', d)} AS bucket, cnt FROM tf"
      for d in range(CMS_DEPTH)
  )}
)
SELECT depth, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
FROM cells GROUP BY depth, bucket
"""


def cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-frequency estimates for the probe words, vs exact truth.

    Probes each word's D cells against the sketch and takes the min;
    joins exact counts back for the (word, cms_estimate, true_count)
    audit row. Both sides of the final join are tiny (|probes| and
    |vocabulary| rows) — at 100 TB the sketch itself is the only thing
    the full corpus ever touches, and it's one map-side-combined
    aggregate.
    """
    sketch = cms_sketch(spark, sf_dir)
    tf = _token_counts(spark, sf_dir)
    # literal explode keeps the probe frame JVM-only (createDataFrame
    # would route a Python RDD through applySchemaToPythonRDD)
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(w) for w in CMS_PROBES])).alias("word")
    )
    probe_cells = probes.select(
        "word",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("word"), d) for d in range(CMS_DEPTH)])
        ).alias("depth", "bucket"),
    )
    est = (
        probe_cells.join(sketch, ["depth", "bucket"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )
    return (
        est.join(tf, est.word == tf.t, "left")
        .select(
            "word",
            "cms_estimate",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("true_count"),
        )
    )


CMS_ESTIMATE_ORACLE = f"""
WITH {_TOKEN_COUNTS_SQL},
cells AS (
  {" UNION ALL ".join(
      f"SELECT CAST({d} AS INT) AS depth, {_cms_bucket_sql('t', d)} AS bucket, cnt FROM tf"
      for d in range(CMS_DEPTH)
  )}
),
sketch AS (
  SELECT depth, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM cells GROUP BY depth, bucket
),
probes AS (
  SELECT unnest({list(CMS_PROBES)!r}) AS word
),
probe_cells AS (
  {" UNION ALL ".join(
      f"SELECT word, CAST({d} AS INT) AS depth, {_cms_bucket_sql('word', d)} AS bucket FROM probes"
      for d in range(CMS_DEPTH)
  )}
),
est AS (
  SELECT word, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cms_estimate
  FROM probe_cells p
  LEFT JOIN sketch s USING (depth, bucket)
  GROUP BY word
)
SELECT word, cms_estimate, CAST(coalesce(tf.cnt, 0) AS BIGINT) AS true_count
FROM est LEFT JOIN tf ON est.word = tf.t
"""
