"""Incremental extraction via Structured Streaming.

The north rule specifies a batch job (SURVEY §2.6: no watermark/streaming
semantics required), but the same fused kernel runs unchanged as a
Structured Streaming sink for continuously-arriving transcript files:
`readStream` file source -> mapInArrow kernel -> parquet sink with
checkpointing.  Trigger.AvailableNow gives catch-up-then-stop batch
semantics; a long-lived trigger turns it into a tailing ingest.

This is the streaming twin of the files-mode pipeline: the streaming
checkpoint (source offsets = processed files) plays the role of the
manifest, managed by Spark itself.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from batukh_spark import kernels
from batukh_spark.schema import TRANSCRIPTS_SCHEMA

_OUT_SCHEMA_SQL = ("conv_id string, turn_idx int, role string, "
                   "tool string, ts timestamp")


def incremental_extract(spark: SparkSession, source_dir: str,
                        output_dir: str, checkpoint_dir: str,
                        available_now: bool = True):
    """Start (or resume) an incremental extraction stream.

    Returns the StreamingQuery; callers `query.awaitTermination()`.
    Exactly-once per input file via the streaming checkpoint — the
    Spark-managed equivalent of our manifest resume (S11/S13).
    """
    stream = (spark.readStream
              .schema(TRANSCRIPTS_SCHEMA)
              .option("maxFilesPerTrigger", "64")
              .parquet(source_dir))
    extracted = stream.mapInArrow(
        kernels.extract_turns_lean,
        schema=kernels.lean_schema_sql(_OUT_SCHEMA_SQL))
    writer = (extracted.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
