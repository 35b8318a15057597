"""Iceberg-or-parquet IO abstraction (SURVEY §0 environment note).

The engine codes against `read_transcripts` / `write_extracted` /
`append_manifest`.  When a table identifier looks like a catalog table
("cat.db.tbl") AND an Iceberg catalog is configured on the session, the
catalog path is used (`spark.read.table`, `writeTo(...).append()`); plain
paths fall back to parquet — the only runtime available in this sandbox
(no Iceberg jars in the local pyspark install).

Scale notes: writes are partitioned by the work-unit column so a resumed
run overwrites ONLY re-processed units (dynamic partition overwrite) —
the job-commit analogue of per-epoch checkpoint files
(/root/reference/batukh/torch/segmenter.py:304-308).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _is_catalog_table(spark: SparkSession, ident: str) -> bool:
    if "/" in ident or ident.endswith(".parquet"):
        return False
    parts = ident.split(".")
    if len(parts) < 2:
        return False
    cat = parts[0]
    return spark.conf.get(f"spark.sql.catalog.{cat}", None) is not None


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """source = catalog table ident, parquet path/dir, or JSONL
    (.jsonl/.json) path/dir — web-scale transcript dumps commonly
    arrive as line-delimited JSON before compaction to parquet."""
    if _is_catalog_table(spark, source):
        return spark.read.table(source)
    if source.rstrip("/").endswith((".jsonl", ".json")):
        from batukh_spark.schema import TRANSCRIPTS_SCHEMA
        return (spark.read.schema(TRANSCRIPTS_SCHEMA)
                .option("timestampFormat",
                        "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
                .json(source))
    return spark.read.parquet(source)


def write_extracted(df: DataFrame, target: str, partition_col: str = "unit",
                    dynamic_overwrite: bool = True) -> None:
    spark = df.sparkSession
    if _is_catalog_table(spark, target):
        # Iceberg: overwritePartitions == dynamic overwrite semantics
        df.writeTo(target).overwritePartitions()
        return
    writer = df.write.mode("overwrite")
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(partition_col).parquet(target)


def append_manifest(df: DataFrame, target: str) -> None:
    spark = df.sparkSession
    if _is_catalog_table(spark, target):
        df.writeTo(target).append()
        return
    df.write.mode("append").parquet(target)


def rewrite_manifest(df: DataFrame, target: str) -> None:
    """Replace the manifest table contents (retention compaction).  The
    caller must have materialized `df` (e.g. localCheckpoint) if it was
    derived from the same path being overwritten."""
    spark = df.sparkSession
    if _is_catalog_table(spark, target):
        df.writeTo(target).replace()
        return
    df.write.mode("overwrite").parquet(target)


def read_manifest(spark: SparkSession, target: str) -> DataFrame | None:
    try:
        if _is_catalog_table(spark, target):
            return spark.read.table(target)
        return spark.read.parquet(target)
    except Exception:
        return None  # first run: no manifest yet
