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


def windowed_turn_counts(spark: SparkSession, source_dir: str,
                         window: str = "1 hour",
                         watermark: str = "2 hours"):
    """Event-time windowed turn counts per role with late-data handling.

    `withWatermark` bounds state: rows later than `watermark` behind the
    max event time are dropped and windows older than that are finalized
    and evicted — the standard Structured Streaming late-data contract.
    Returns an unstarted streaming DataFrame (caller picks the sink)."""
    from pyspark.sql import functions as F
    stream = (spark.readStream
              .schema(TRANSCRIPTS_SCHEMA)
              .parquet(source_dir))
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "role")
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.sum(F.length("text")).alias("n_chars")))


def streaming_exact_dedup(spark: SparkSession, source_dir: str,
                          watermark: str = "2 hours"):
    """Streaming twin of `operators.dedup.exact_dedup`: keep the first
    arrival per canonical-text hash, with dedup STATE BOUNDED by the
    event-time watermark (`dropDuplicatesWithinWatermark` evicts a
    hash once the watermark passes its event time).  At 10^12-turn
    ingest the state size tracks the late-data horizon, not the corpus
    — the property that makes streaming dedup deployable at all.

    Returns an unstarted streaming DataFrame (caller picks the sink).
    """
    from pyspark.sql import functions as F

    from batukh_spark.operators.dedup import canonical_text

    stream = (spark.readStream
              .schema(TRANSCRIPTS_SCHEMA)
              .parquet(source_dir))
    hashed = stream.withColumn(
        "text_hash", F.md5(canonical_text(F.col("text"))))
    return (hashed
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["text_hash"]))


def streaming_store_dedup(spark: SparkSession, source_dir: str,
                          store_dir: str):
    """Streaming twin of `operators.dedup.incremental_keep_set`'s
    exact path: continuously-arriving transcripts are flagged against
    the PERSISTED signature store of previous runs via a stream-static
    left join on the canonical-text hash — the production-crawler
    shape, where new data is checked against all history without ever
    rescanning it.

    Stateless (no watermark needed): the static side is the store's
    (text_hash) table, re-read per micro-batch by Spark's stream-static
    join semantics, so a store updated between batches is picked up.
    Output = input rows + (text_hash, is_dup_of_history).  Compose with
    `streaming_exact_dedup` upstream to also dedup WITHIN the stream.

    Returns an unstarted streaming DataFrame (caller picks the sink).
    """
    from pyspark.sql import functions as F

    from batukh_spark.operators.dedup import canonical_text

    store = (spark.read.parquet(f"{store_dir}/exact")
             .select("text_hash", F.lit(True).alias("__hit")))
    stream = (spark.readStream
              .schema(TRANSCRIPTS_SCHEMA)
              .parquet(source_dir))
    hashed = stream.withColumn(
        "text_hash", F.md5(canonical_text(F.col("text"))))
    return (hashed.join(store, "text_hash", "left")
            .withColumn("is_dup_of_history",
                        F.coalesce(F.col("__hit"), F.lit(False)))
            .drop("__hit"))


# output schema of the stateful conversation assembler
CONV_STATE_SCHEMA = ("conv_id string, n_turns long, last_turn_idx int, "
                     "n_tool_turns long")
_CONV_STATE_TYPES = "n_turns long, last_turn_idx int, n_tool_turns long"


def conv_progress_stateful(spark: SparkSession, source_dir: str):
    """Custom stateful operator via applyInPandasWithState: running
    per-conversation progress (turn count, max turn_idx, tool-turn
    count) maintained across micro-batches in GroupState — the
    streaming analogue of the reference's incremental per-epoch
    counters (torch segmenter train loop, segmenter.py:107-133).

    State is one tiny tuple per conversation; a processing-time timeout
    would evict idle conversations in a long-lived deployment."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, last, tools = (state.get if state.exists else (0, -1, 0))
        for pdf in pdfs:
            n += len(pdf)
            last = max(last, int(pdf["turn_idx"].max()))
            tools += int((pdf["role"] == "tool").sum())
        state.update((n, last, tools))
        import pandas as _pd
        yield _pd.DataFrame([{"conv_id": key[0], "n_turns": n,
                              "last_turn_idx": last, "n_tool_turns": tools}])

    stream = (spark.readStream
              .schema(TRANSCRIPTS_SCHEMA)
              .parquet(source_dir))
    return (stream.groupBy("conv_id")
            .applyInPandasWithState(
                update,
                outputStructType=CONV_STATE_SCHEMA,
                stateStructType=_CONV_STATE_TYPES,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
