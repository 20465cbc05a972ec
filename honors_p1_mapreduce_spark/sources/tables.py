"""Table registry over the driver's parquet star schema.

The reference engine's only source is a line-oriented text file copied
into a shared volume (mr/client/client.py:21-40, E10 in SURVEY.md §2.1);
here the primary source is columnar parquet so Catalyst gets predicate
pushdown + column pruning for free, with text ingestion kept in
``sources.text`` for reference-shaped workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should broadcast in joins at any scale.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})

# The under-parallel-scan fix below (guide §2.5 "input skew: one huge
# unsplittable file ... otherwise repartition immediately after the
# read") is strictly OPT-IN per call site: interleaved A/B (min-of-N,
# one JVM, order-alternating) showed the repartition pays only where
# per-row work directly on the scan is heavy — per-gram md5 winnowing
# 3.7 -> 0.9 s, substring grams 3.7 -> 2.0 s, PNG zlib inflate
# 2.25 -> 1.15 s — and LOSES elsewhere: cheap-tokenize consumers (BPE
# id stream 3.2 -> 8+ s cold, publish manifest), multi-scan media
# plans (audio dedup 2.0 -> 3.8 s: each re-scan re-shuffles payload
# bytes), and even the embedding consumers (LSH bucketing
# 1.3 -> 1.9 s; post-vectorization the PQ/IVF compute at
# trigger-firing scales is trivial, parity measured). The trigger
# only ever fires when the layout under-splits — i.e. at SMALL
# inputs — which is exactly where fixed exchange overhead is most
# visible, so the default must be off. Sites opt in via
# ``load_table(..., wide_scan=True)``.
_WIDE_SCAN_TABLES: frozenset[str] = frozenset()


def _size_bytes(conf_value: str) -> int:
    """Parse a Spark size conf ("134217728", "128m", "1g") to bytes."""
    v = conf_value.strip().lower().removesuffix("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if v.endswith(suffix):
            v, mult = v[:-1], m
            break
    return int(v) * mult


def _scan_parallelize(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Round-robin repartition AFTER the read when the file layout
    cannot split into at least ``defaultParallelism`` scan tasks.

    The driver corpora are single-file, single-row-group parquet, so
    every scan is ONE task and all per-row expression work serializes
    on one core until the first exchange (measured 5.5x on winnowing
    extraction at sf0.1/local[32], r17 A/B). The trigger derives from
    the input layout vs the session's core count — never a local-mode
    constant: at 100 TB the byte-based split estimate exceeds any core
    count, the condition is false, and the plan is unchanged (the
    zero-extra-exchange posture at scale is preserved by construction).
    The exchange carries raw scan rows (pre-decode, pre-expression),
    so nothing heavy is shuffled. ``SPARK_GRAFT_SCAN_PAR=0`` disables
    it for A/B runs."""
    import os

    if os.environ.get("SPARK_GRAFT_SCAN_PAR", "1") == "0":
        return df
    try:
        if os.path.isdir(path):
            size = sum(
                e.stat().st_size
                for e in os.scandir(path)
                if e.name.endswith(".parquet")
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        return df  # non-local path: layout unknown, leave the plan alone
    try:
        max_bytes = _size_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
    except ValueError:
        max_bytes = 128 << 20
    par = spark.sparkContext.defaultParallelism
    est_tasks = max(1, -(-size // max_bytes))
    if est_tasks >= par:
        return df
    return df.repartition(par)


def corpus_token(sf_dir: str) -> str:
    """Cheap corpus snapshot token for build-once memo keys: a digest
    of every parquet file's (relative path, size, mtime_ns) under
    ``sf_dir``. The session memos (_MERGES_CACHE, _CODEBOOK_CACHE,
    _WORD_IDS_CACHE, _FP_CACHE) are keyed by (application, corpus dir,
    params); without this token, rewriting the data under the same
    directory within one application — a test or notebook regenerating
    a corpus in place — would silently serve stale artifacts (advisor
    r7). A local-FS walk of ~10 table files costs microseconds per
    memo access; on object stores the moral equivalent is the
    manifest/snapshot id. Non-existent paths hash to a constant so
    synthetic cache keys in tests stay usable."""
    import hashlib
    import os

    parts: list[str] = []
    try:
        for root, dirs, files in sorted(os.walk(sf_dir)):
            dirs.sort()
            for f in sorted(files):
                if f.endswith(".parquet"):
                    st = os.stat(os.path.join(root, f))
                    rel = os.path.relpath(os.path.join(root, f), sf_dir)
                    parts.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
    except OSError:
        return "no-such-corpus"
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def load_table(
    spark: SparkSession, sf_dir: str, name: str, wide_scan: bool = False
) -> DataFrame:
    """``wide_scan=True`` opts a documents read into the
    under-parallel-scan repartition (see _WIDE_SCAN_TABLES) — set it
    at call sites whose per-row work on top of the scan is heavy
    enough to win from the extra exchange (measured, not assumed)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects
        # ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos and convert
        # losslessly (data has no sub-microsecond components). The
        # session factory sets nanosAsLong up front, but the driver
        # calls queries() with ITS OWN SparkSession — guard here so
        # events load under any session (idempotent runtime conf).
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # nanos -> TIMESTAMP_NTZ, matching how Spark reads the other
            # tables' naive parquet timestamps: epoch + exact dt-interval,
            # computed without any session-timezone dependence (a plain
            # timestamp_micros would render shifted under a non-UTC
            # driver session and break oracle value hashes). Integer div
            # first: double seconds would lose precision on 1e18 nanos.
            df = df.withColumn(
                "ts",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
                + F.expr(
                    "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
                ),
            )
        return df
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name in _WIDE_SCAN_TABLES or wide_scan:
        df = _scan_parallelize(spark, df, path)
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register temp views so operators can be written in pure SQL."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
