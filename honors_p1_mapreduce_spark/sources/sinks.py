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


def write_parquet_parallel(*frames_and_paths) -> None:
    """Overwrite-write INDEPENDENT artifact frames from driver
    threads (optimization guide §2.6 "overlap independent jobs"): an
    artifact cycle that ships several frames with no data dependency
    between them (merge table + vocabulary; unigram + bigram counts;
    codebook + codes) otherwise serializes their write jobs, leaving
    the cluster idle through each commit. Each write still recomputes
    from its inputs on every call — nothing is cached across calls."""
    from concurrent.futures import ThreadPoolExecutor

    def write(fp):
        df, path = fp
        df.write.mode("overwrite").parquet(path)

    with ThreadPoolExecutor(max_workers=len(frames_and_paths)) as pool:
        list(pool.map(write, frames_and_paths))


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


def _recover_swap(path) -> None:
    """Entry-time crash recovery for :func:`_promote_dir`.

    A leftover ``.old`` directory means a prior run died mid-swap:
    if the live path also exists the crash was after the promote
    (finish the cleanup); if the live path is gone the crash was
    between rename-aside and promote (roll the old directory back so
    the store is never absent). A leftover ``.compact`` is stale or
    partial output from a run that died before/during the swap —
    discard it; the caller re-compacts from the recovered live dir.
    """
    import shutil
    from pathlib import Path

    path = Path(path)
    old = Path(str(path) + ".old")
    tmp = Path(str(path) + ".compact")
    if old.exists():
        if path.exists():
            shutil.rmtree(old)
        else:
            old.rename(path)
    if tmp.exists():
        shutil.rmtree(tmp)


def _promote_dir(path, tmp) -> None:
    """Crash-safe swap: promote freshly-written ``tmp`` over ``path``.

    Rename the live directory ASIDE first (``path`` -> ``path.old``),
    promote ``tmp``, delete ``.old`` last — so the data always exists
    under either ``path`` or ``path.old`` and every crash point is
    repaired by :func:`_recover_swap` at the next entry (the naive
    rmtree-then-rename order has a window where the store exists
    nowhere and a re-run fails reading the missing path).
    """
    import shutil
    from pathlib import Path

    path, tmp = Path(path), Path(tmp)
    old = Path(str(path) + ".old")
    path.rename(old)
    tmp.rename(path)
    shutil.rmtree(old)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into files
    sized ~``target_file_bytes`` (the HDFS/S3-friendly 128 MB default).

    Append-heavy stores accumulate small files, and at 100 TB the
    per-file open/footer cost comes to dominate the read path. The
    standard companion job reads the store, coalesces to
    ceil(bytes / target) files, and swaps directories crash-safely
    (write to ``path + '.compact'``, rename the live dir aside,
    promote, delete ``.old`` last — ``_recover_swap`` repairs any
    crash point on the next entry, so a re-run after a crash really
    does just re-compact).

    Concurrency contract: SINGLE WRITER, and readers see the store
    vanish for the instant between the two renames — schedule the
    companion job in a quiescent window (or on a rename-atomic store
    overlay). For the streaming rollup's partitioned store use
    ``streaming.windows.compact_rollup_store``, which additionally
    merges partials and preserves the batch-partition layout.

    Returns (files_before, files_after). ``coalesce`` (not
    ``repartition``) — compaction must not pay a shuffle, only a
    narrow merge of input splits.
    """
    import math
    from pathlib import Path

    p = Path(path)
    _recover_swap(p)
    files_before = [f for f in p.rglob("*.parquet") if f.is_file()]
    total_bytes = sum(f.stat().st_size for f in files_before)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = str(p) + ".compact"
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    _promote_dir(p, tmp)
    files_after = len([f for f in p.rglob("*.parquet") if f.is_file()])
    return len(files_before), files_after


# ------------------------------------------------------ z-order layout

ZORDER_BITS = 12  # bits per dimension (4096 buckets each)


def zorder_key(cols: list, mins: list, maxs: list, bits: int = ZORDER_BITS):
    """Morton (Z-curve) key over 2+ numeric columns: each value is
    scaled to a ``bits``-bit bucket inside its [min, max] range, and
    the bucket bits are interleaved — points close in EVERY dimension
    get close keys, so range-partitioning + sorting by the key makes
    parquet row-group min/max stats tight in ALL dimensions at once
    (a single-column sort gives tight stats in that column only).
    Pure Catalyst bit arithmetic; no UDF.

    The interleaved key must fit a signed BIGINT: ``len(cols) * bits``
    may not exceed 63, else shiftleft would silently wrap and the key
    would stop clustering (round-6 advisor finding) — guarded below.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} interleaved "
            "bits exceeds the 63 available in a signed BIGINT key; lower "
            "`bits` or cluster on fewer columns"
        )
    if n < 2:
        raise ValueError("zorder_key needs 2+ columns (1-D is a plain sort)")
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi - lo) or 1.0
        b = F.least(
            F.lit((1 << bits) - 1),
            F.greatest(
                F.lit(0),
                ((c.cast("double") - F.lit(float(lo))) / F.lit(span)
                 * F.lit(float((1 << bits) - 1))).cast("bigint"),
            ),
        )
        scaled.append(b)
    one = F.lit(1).cast("bigint")
    z = F.lit(0).cast("bigint")
    for bit in range(bits - 1, -1, -1):
        for d in range(n):
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(scaled[d], bit).bitwiseAND(one)
            )
    return z


def write_zordered(
    df,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``
    — the multi-dimensional clustering a 100 TB table uses so that
    selective predicates on ANY of the clustered columns prune row
    groups via min/max statistics (the OPTIMIZE ZORDER pattern).

    Ranges are taken from one tiny min/max aggregate (2 numbers per
    column); the data pays one range shuffle + in-partition sort by
    the interleaved key. The key itself is dropped before writing —
    the layout, not a column, carries the information.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    z = zorder_key(
        [F.col(c) for c in cols],
        [stats[f"lo_{c}"] for c in cols],
        [stats[f"hi_{c}"] for c in cols],
        bits=bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
