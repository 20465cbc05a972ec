"""Columnar sinks: partitioned parquet and bucketed tables.

The reference's only sink is per-partition TSV (SURVEY.md §2.1 E8,
kept in ``sources.text``); at 100 TB the real sinks are:

- **hive-partitioned parquet** (``partitionBy``): one directory per
  partition value, so downstream readers prune whole directories on
  the partition predicate (no footer even opened);
- **bucketed tables** (``bucketBy``): rows pre-hashed into a fixed
  bucket count on the join/agg key at WRITE time, so later joins and
  aggregations on that key run with NO exchange — the write-once,
  shuffle-never co-location strategy (tests assert the exchange-free
  plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet: readers prune directories on any
    predicate over ``partition_cols``. Keep partition cardinality
    bounded (dates/categories, never raw ids) or the file count
    explodes."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) table at ``path``.

    Joining two tables bucketed into the same ``n_buckets`` on the
    same key needs no shuffle on either side; sorting within buckets
    additionally drops the sort from sort-merge joins.
    """
    w = df.write.mode(mode).option("path", path).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read hive-partitioned parquet (partition columns recovered from
    the directory layout)."""
    return spark.read.parquet(path)


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None, mode: str = "overwrite"
) -> None:
    """JSON-Lines sink — the interchange format LLM data pipelines
    exchange corpora in (one JSON object per line; Spark's json sink
    IS jsonl). ``compression='gzip'``/'zstd' for wire-size; files stay
    line-splittable for parallel re-reads only when uncompressed or
    using a splittable codec."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL source. Pass an explicit ``schema`` (DDL string or
    StructType) in production — schema inference reads the data twice
    and infers from a sample, both wrong at 100 TB."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into files
    sized ~``target_file_bytes`` (the HDFS/S3-friendly 128 MB default).

    Append-heavy stores accumulate small files — a streaming
    foreachBatch sink (``streaming/windows.py:streaming_incremental_
    rollup``) appends one file set per micro-batch, and at 100 TB the
    per-file open/footer cost comes to dominate the read path. The
    standard companion job reads the store, coalesces to
    ceil(bytes / target) files, and atomically swaps directories
    (write to ``path + '.compact'``, then rename — the last-step
    rename is the only non-idempotent moment, and re-running after a
    crash just re-compacts).

    Returns (files_before, files_after). ``coalesce`` (not
    ``repartition``) — compaction must not pay a shuffle, only a
    narrow merge of input splits.
    """
    import math
    import shutil
    from pathlib import Path

    p = Path(path)
    files_before = [f for f in p.rglob("*.parquet") if f.is_file()]
    total_bytes = sum(f.stat().st_size for f in files_before)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = str(p) + ".compact"
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    Path(tmp).rename(p)
    files_after = len([f for f in p.rglob("*.parquet") if f.is_file()])
    return len(files_before), files_after
