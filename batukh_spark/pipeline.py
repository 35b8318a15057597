"""The full extraction job (SURVEY §3 lifecycle, §7 step 5).

    read transcripts                                [scan: pruned to 6 cols]
      -> unit = pmod(xxhash64(conv_id, turn_idx//CHUNK), n_units)
                                                    [salted work-unit id]
      -> resume? anti-join units already 'done' in the manifest
      -> repartition(n_units, unit)                 [one shuffle]
      -> sortWithinPartitions(conv_id, turn_idx)    [stable turn ordering]
      -> mapInArrow(fused extraction kernel)        [ONE Python crossing]
      -> write extracted, partitionBy(unit), dynamic overwrite
      -> append per-unit manifest rows (from the WRITTEN data)

Design for 10^12 turns / 1000 executors:

* Extraction is per-turn, so a mega-conversation may legally span work
  units: the unit id hashes (conv_id, turn_idx // CHUNK_TURNS), the skew
  salt of SURVEY §4 — no conversation contributes more than CHUNK_TURNS
  rows to any unit, bounding the largest task regardless of skew (the
  class-weight analogue of /root/reference/batukh/torch/segmenter.py:824-826).
* Work-unit identity is a pure function of the DATA (not of sampling or
  cluster size), so manifests written at N executors resume correctly at
  4N.  `repartitionByRange` was rejected for unit identity precisely
  because its sampled range bounds are not stable across runs.
* The manifest is derived from the data actually committed by the write
  job, then appended — a unit is 'done' only if its parquet partition
  committed, giving exactly-once resume semantics on retry (the
  checkpoint-restore analogue of
  /root/reference/batukh/torch/segmenter.py:267-278,313-370).
* Ordering: (conv_id, turn_idx) sort within unit partitions + unit dirs
  in the output. Readers reconstruct global order with
  ORDER BY conv_id, turn_idx — same contract as the reference's sorted,
  name-aligned directory scan (torch dataloader.py:29-32).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batukh_spark import kernels
from batukh_spark.sources import io as bio

# max turns one conversation contributes to a single work unit
CHUNK_TURNS = 512

_INPUT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
_INPUT_SCHEMA_SQL = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp, unit int")

STATUS_DONE = "done"


def with_unit(df: DataFrame, n_units: int) -> DataFrame:
    """Deterministic, skew-salted work-unit id."""
    return df.withColumn(
        "unit",
        F.pmod(F.xxhash64("conv_id",
                          (F.col("turn_idx") / F.lit(CHUNK_TURNS))
                          .cast("long")),
               F.lit(n_units)).cast("int"))


def run_extraction(spark: SparkSession, source: str | DataFrame,
                   output: str, metrics: str | None = None,
                   run_id: str | None = None, n_units: int | None = None,
                   resume: bool = False) -> dict:
    """Run (or resume) the extraction job; returns a summary dict."""
    t0 = time.time()
    run_id = run_id or uuid.uuid4().hex[:12]
    n_units = n_units or max(
        32, spark.sparkContext.defaultParallelism * 4)

    df = (source if isinstance(source, DataFrame)
          else bio.read_transcripts(spark, source))
    # column pruning is explicit so the parquet scan reads only what the
    # kernel needs even if the table grows columns later
    df = with_unit(df.select(*_INPUT_COLS), n_units)

    done_units = None
    if resume and metrics:
        prior = bio.read_manifest(spark, metrics)
        if prior is not None:
            done_units = (prior.filter(F.col("status") == STATUS_DONE)
                          .select("unit").distinct())
            df = df.join(F.broadcast(done_units), "unit", "left_anti")

    # canonical column order: joins move the join key first, which would
    # desync the batch layout from the declared mapInArrow schema
    df = df.select(*_INPUT_COLS, "unit")

    extracted = (
        df.repartition(n_units, "unit")
          .sortWithinPartitions("conv_id", "turn_idx")
          .mapInArrow(kernels.extract_turns_batches,
                      schema=kernels.extracted_schema_sql(_INPUT_SCHEMA_SQL))
    )

    bio.write_extracted(extracted, output, partition_col="unit")

    summary = {"run_id": run_id, "n_units": n_units,
               "resumed": bool(resume and done_units is not None)}
    if metrics:
        written = spark.read.parquet(output) if "/" in output \
            else spark.read.table(output)
        if done_units is not None:
            written = written.join(F.broadcast(done_units), "unit",
                                   "left_anti")
        manifest = (
            written.groupBy("unit").agg(
                F.min("conv_id").alias("conv_id_min"),
                F.max("conv_id").alias("conv_id_max"),
                F.count(F.lit(1)).alias("rows_in"),
                F.count(F.lit(1)).alias("rows_out"),
                F.sum(F.octet_length("text")).alias("bytes_in"),
                F.sum(F.when(F.col("error").isNotNull(), 1)
                      .otherwise(0)).cast("long").alias("n_errors"),
            )
            .withColumn("run_id", F.lit(run_id))
            .withColumn("wall_ms",
                        F.lit(int((time.time() - t0) * 1000)))
            .withColumn("status", F.lit(STATUS_DONE))
            .withColumn("ts", F.current_timestamp())
            .select("run_id", "unit", "conv_id_min", "conv_id_max",
                    "rows_in", "rows_out", "bytes_in", "n_errors",
                    "wall_ms", "status", "ts")
        )
        bio.append_manifest(manifest, metrics)
        summary["units_completed"] = manifest.count()
    summary["wall_s"] = time.time() - t0
    return summary


def latest_done_units(spark: SparkSession, metrics: str) -> DataFrame | None:
    """Latest manifest row per unit (max_by ts, epoch-tie analogue of
    get_latest_ckpt_path, /root/reference/batukh/torch/segmenter.py:355-370).
    """
    prior = bio.read_manifest(spark, metrics)
    if prior is None:
        return None
    from pyspark.sql import Window
    w = Window.partitionBy("unit").orderBy(F.desc("ts"), F.desc("run_id"))
    return (prior.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1").drop("_rn"))
