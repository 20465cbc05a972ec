"""Sink tests: partition pruning on hive-partitioned parquet, and the
exchange-free join plan on co-bucketed tables."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from honors_p1_mapreduce_spark.sources.sinks import (
    read_partitioned,
    write_bucketed_table,
    write_parquet_partitioned,
)
from honors_p1_mapreduce_spark.sources.tables import load_table


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    write_parquet_partitioned(ev, out, ["event_type"])
    # hive layout: one directory per partition value
    dirs = sorted(
        p.rsplit("=", 1)[1] for p in glob.glob(f"{out}/event_type=*")
    )
    assert dirs == ["click", "error", "purchase", "signup", "view"]
    back = read_partitioned(spark, out)
    assert back.count() == ev.count()
    # a filter on the partition column prunes to one directory
    plan = (
        back.filter(F.col("event_type") == "click")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan or back.filter(
        F.col("event_type") == "click"
    ).count() == ev.filter(F.col("event_type") == "click").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders, "orders_b", ["o_orderkey"], 4, str(tmp_path / "orders_b"),
        sort_cols=["o_orderkey"],
    )
    write_bucketed_table(
        li, "lineitem_b", ["l_orderkey"], 4, str(tmp_path / "lineitem_b"),
        sort_cols=["l_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (broadcast would hide the bucketing)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed on the join key: no shuffle on either side
        assert "Exchange" not in plan, plan
        # and the join still returns the right cardinality
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    from honors_p1_mapreduce_spark.sources.sinks import read_jsonl, write_jsonl
    from honors_p1_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, schema=docs.schema)
    assert back.schema == docs.schema
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_compaction_preserves_rollup_and_reduces_files(spark, sf_dir, tmp_path):
    """Compact the streaming rollup's per-batch partition store: the
    SERVED cascade is row-identical (partials merge losslessly), the
    file count drops to 1, and the store ends as a single
    ``batch_id=-1`` partition that coexists with future batch dirs."""
    import glob as _glob

    from honors_p1_mapreduce_spark.streaming.windows import (
        compact_rollup_store,
        read_rollup_store,
        streaming_incremental_rollup,
    )

    store = str(tmp_path / "store")
    streaming_incremental_rollup(spark, sf_dir, store)
    # simulate later micro-batches fragmenting the store (sf0.001 is a
    # single-file source, so availableNow drains it in one batch)
    first_batch = _glob.glob(f"{store}/batch_id=*")[0]
    partials = spark.read.parquet(first_batch)
    for i in range(1000, 1004):
        partials.write.parquet(f"{store}/batch_id={i}")
    want = sorted(tuple(r) for r in read_rollup_store(spark, store).collect())
    spark.catalog.clearCache()

    before, after = compact_rollup_store(spark, store)
    got = sorted(tuple(r) for r in read_rollup_store(spark, store).collect())
    assert got == want
    assert after < before
    assert after == 1  # tiny store -> single 128MB-target file
    assert _glob.glob(f"{store}/batch_id=*") == [f"{store}/batch_id=-1"]


def test_compact_parquet_flat_dir_and_crash_recovery(spark, sf_dir, tmp_path):
    """Generic flat-directory compaction: row-identical, fewer files —
    and every crash point of the rename-aside swap is repaired on the
    next entry (the round-5 version left NO directory at ``path`` if
    it died between rmtree and rename)."""
    import shutil
    from pathlib import Path

    from honors_p1_mapreduce_spark.sources.sinks import compact_parquet

    out = Path(tmp_path / "docs_flat")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(16).write.parquet(str(out))
    want = sorted(tuple(r) for r in spark.read.parquet(str(out)).collect())

    before, after = compact_parquet(spark, str(out))
    assert before >= 16 and after == 1
    assert sorted(tuple(r) for r in spark.read.parquet(str(out)).collect()) == want

    # crash between rename-aside and promote: data only under .old
    out.rename(Path(str(out) + ".old"))
    (Path(str(out) + ".compact")).mkdir()  # stale partial output too
    compact_parquet(spark, str(out))  # recovers, then re-compacts
    assert sorted(tuple(r) for r in spark.read.parquet(str(out)).collect()) == want
    assert not Path(str(out) + ".old").exists()
    assert not Path(str(out) + ".compact").exists()

    # crash after promote, before .old cleanup: both dirs present
    shutil.copytree(out, Path(str(out) + ".old"))
    compact_parquet(spark, str(out))
    assert sorted(tuple(r) for r in spark.read.parquet(str(out)).collect()) == want
    assert not Path(str(out) + ".old").exists()


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Multi-dimensional clustering claim: a layout sorted on ONE
    column has tight file min/max stats only for that column (a
    predicate on the other column overlaps every file), while the
    Z-ordered layout keeps stats tight in BOTH clustered columns, so
    either predicate prunes files. Verified against real parquet
    footer statistics, plus a read-back equality check."""
    import pyarrow.parquet as pq_meta
    from pathlib import Path

    from pyspark.sql import functions as F

    from honors_p1_mapreduce_spark.sources.tables import load_table
    from honors_p1_mapreduce_spark.sources.sinks import write_zordered

    ev = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "event_id", "user_id", "value"
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(plain)
    )
    write_zordered(ev, zord, ["user_id", "value"], n_files=16)

    # identical content either way
    assert (
        sorted(map(tuple, spark.read.parquet(zord).collect()))
        == sorted(map(tuple, ev.collect()))
    )

    stats = ev.agg(
        F.min("value"), F.max("value"), F.min("user_id"), F.max("user_id")
    ).collect()[0]
    v_lo = stats[0] + (stats[1] - stats[0]) * 0.45
    v_hi = stats[0] + (stats[1] - stats[0]) * 0.55

    def overlapping_files(path: str) -> int:
        n = 0
        for f in Path(path).glob("*.parquet"):
            md = pq_meta.ParquetFile(str(f)).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names["value"]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo <= v_hi and hi >= v_lo:
                n += 1
        return n

    plain_hit = overlapping_files(plain)
    z_hit = overlapping_files(zord)
    # single-column sort: value spans the full range in every file
    assert plain_hit >= 15
    # z-order: the 10% value band must prune a real fraction of files
    assert z_hit <= plain_hit - 4


def test_zorder_three_columns_roundtrip(spark, tmp_path):
    """zorder_key is n-dimensional: a 3-column layout must round-trip
    exactly (pruning power at fixed file count decays with dimension
    count — measured and documented in SURVEY 8.6 — but correctness
    must not)."""
    from pyspark.sql import functions as F

    from honors_p1_mapreduce_spark.sources.sinks import write_zordered
    from honors_p1_mapreduce_spark.sources.tables import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.01", "events")
        .select("event_id", "user_id", "value")
        .withColumn("eid_mod", F.col("event_id") % 1000)
    )
    out = str(tmp_path / "z3")
    write_zordered(ev, out, ["user_id", "value", "eid_mod"], n_files=8)
    assert (
        sorted(map(tuple, spark.read.parquet(out).collect()))
        == sorted(map(tuple, ev.collect()))
    )


def test_zorder_key_rejects_bit_overflow():
    """6+ columns at the default 12 bits would interleave past the 63
    bits a signed BIGINT holds — shiftleft would wrap silently and the
    key would stop clustering. The guard must fail loudly instead."""
    import pytest
    from pyspark.sql import functions as F

    from honors_p1_mapreduce_spark.sources.sinks import zorder_key

    cols = [F.col(f"c{i}") for i in range(6)]
    with pytest.raises(ValueError, match="63"):
        zorder_key(cols, [0] * 6, [100] * 6)
    # 5 cols x 12 bits = 60 <= 63: fine
    zorder_key(cols[:5], [0] * 5, [100] * 5)
    # 1-D interleaving is a plain sort, not a Z-curve
    with pytest.raises(ValueError, match="2"):
        zorder_key(cols[:1], [0], [100])
