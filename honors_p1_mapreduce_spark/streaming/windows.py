"""Streaming window aggregations: the ``readStream`` swap for the
batch operators in ``operators/events.py``.

The transformation functions are SHARED with batch (same
``F.window``-keyed aggregates); only the source differs. The file
source replays the events parquet as a stream — with
``Trigger.AvailableNow`` this processes all existing data then stops,
which is how the tests assert batch/stream equivalence exactly.

Watermarking: ``streaming_tumbling_counts`` takes a watermark delay —
in append mode a window only emits once the event-time watermark
passes its end (late data beyond the delay is dropped), which is the
state-bounding contract a 100 TB streaming job needs; the
batch-equivalence test runs complete mode where every window is
re-emitted each trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.events import tumbling_counts


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with the same
    nanos-timestamp normalization as the batch loader
    (sources/tables.py): the file carries TIMESTAMP(NANOS), which is
    read as raw nanos and converted losslessly to a timestamp."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source requires a directory path; select just the
    # events file out of the shared sf dir with a glob filter
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # streaming keeps tz-aware TIMESTAMP (watermarks reject NTZ:
        # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); the engine session is
        # pinned UTC so values match the batch loader's NTZ rendering
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def streaming_tumbling_counts(
    spark: SparkSession, sf_dir: str, watermark: str | None = None
) -> DataFrame:
    """Streaming per-(window, event_type) counts/sums — identical
    transformation to the batch ``events_tumbling``."""
    ev = stream_events(spark, sf_dir)
    if watermark is not None:
        ev = ev.withWatermark("ts", watermark)
    return tumbling_counts(ev)


def run_to_memory_sink(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain all available input through the streaming query into an
    in-memory table ``name`` and stop (Trigger.AvailableNow)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
