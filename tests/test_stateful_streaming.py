"""applyInPandasWithState: per-user totals accumulated across multiple
micro-batches must converge to the batch groupBy result."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from honors_p1_mapreduce_spark.sources.tables import load_table
from honors_p1_mapreduce_spark.streaming.stateful import stateful_user_totals


def test_stateful_totals_match_batch_over_two_batches(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    src = str(tmp_path / "events_split")
    # two parquet files -> two micro-batches with maxFilesPerTrigger=1,
    # so state genuinely carries across batch boundaries
    ev.repartition(2).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # Update mode re-emits a user's row each batch it appears in; the
    # memory sink appends, so the LAST row per user is the final state.
    emitted = spark.table("user_totals").collect()
    final: dict[int, tuple[int, float]] = {}
    for r in emitted:  # sink preserves batch order
        final[r.user_id] = (r.n_events, r.total_value)

    want = {
        r.user_id: (r.n, r.total)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(want)
    for uid, (n, total) in want.items():
        assert final[uid][0] == n
        # pandas partial sums vs Spark sum: same values, different
        # association order -> compare within float tolerance
        assert math.isclose(final[uid][1], total, rel_tol=1e-9, abs_tol=1e-6)
    # state really spanned >1 batch: some users must have been emitted twice
    assert len(emitted) > len(want)
