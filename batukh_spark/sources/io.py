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


def _looks_jsonl(source: str) -> bool:
    """JSONL detection: path suffix OR — for a local directory whose
    name lacks a suffix (the common dump layout: dir of .jsonl part
    files) — the contents.  Non-local URIs (s3:// etc.) can't be
    listed cheaply here; pass fmt='jsonl' explicitly for those."""
    import os
    s = source.rstrip("/")
    if s.endswith((".jsonl", ".json")):
        return True
    if os.path.isdir(s):
        try:
            names = os.listdir(s)
        except OSError:
            return False
        data = [n for n in names if not n.startswith(("_", "."))]
        return bool(data) and all(n.endswith((".jsonl", ".json"))
                                  for n in data)
    return False


def read_transcripts(spark: SparkSession, source: str,
                     fmt: str | None = None) -> DataFrame:
    """source = catalog table ident, parquet path/dir, or JSONL
    (.jsonl/.json) path/dir — web-scale transcript dumps commonly
    arrive as line-delimited JSON before compaction to parquet.
    `fmt` ('jsonl' | 'parquet') overrides detection; without it, JSONL
    is detected by path suffix or by sniffing a local directory's
    contents (a dir of .jsonl part files routes correctly even when
    the dir name has no suffix)."""
    if _is_catalog_table(spark, source):
        return spark.read.table(source)
    if fmt is None:
        fmt = "jsonl" if _looks_jsonl(source) else "parquet"
    if fmt in ("jsonl", "json"):
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
    """Replace the manifest table contents (retention compaction)
    ATOMICALLY: the survivor rows are written to a temp sibling FIRST
    (which also materializes `df` while `target` is still readable),
    then swapped in via rename, keeping the previous manifest at
    `.old` until the swap completes.  A crash at any point leaves
    either the old or the new manifest recoverable (read_manifest
    falls back to `.old`) — never an empty path, which would force a
    full re-extraction on the next resume.  The Iceberg branch uses
    the catalog's transactional replace()."""
    spark = df.sparkSession
    if _is_catalog_table(spark, target):
        df.writeTo(target).replace()
        return
    import os
    import shutil
    base = target.rstrip("/")
    tmp, old = base + ".tmp", base + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(base):
        os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old, ignore_errors=True)


def read_manifest(spark: SparkSession, target: str) -> DataFrame | None:
    for path in (target, target.rstrip("/") + ".old"):
        try:
            if _is_catalog_table(spark, path):
                return spark.read.table(path)
            return spark.read.parquet(path)
        except Exception:
            continue  # first run (no manifest yet) or mid-swap crash
    return None
