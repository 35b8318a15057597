"""File-granular (shuffle-free, Iceberg-planning-style) pipeline mode."""

import shutil

import pytest
from pyspark.sql import functions as F

from batukh_spark import pipeline
from batukh_spark.corpus import make_transcripts


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("src", "out", "metrics")}
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_files_mode_run_and_resume(spark, dirs):
    make_transcripts(spark, 40, partitions=6) \
        .write.parquet(dirs["src"])
    n_files = len(spark.read.parquet(dirs["src"]).inputFiles())
    assert n_files >= 2

    s1 = pipeline.run_extraction(spark, dirs["src"], dirs["out"],
                                 metrics=dirs["metrics"], run_id="f1")
    assert s1["mode"] == "files"
    assert s1["units_completed"] == n_files
    out = spark.read.parquet(dirs["out"])
    assert out.count() == spark.read.parquet(dirs["src"]).count()
    # input_file_name() hashing must agree with the driver-side plan
    plan_units = {r.unit for r in
                  pipeline.file_units(spark, dirs["src"]).collect()}
    data_units = {r.unit for r in out.select("unit").distinct().collect()}
    assert data_units == plan_units

    # full resume: nothing pending
    s2 = pipeline.run_extraction(spark, dirs["src"], dirs["out"],
                                 metrics=dirs["metrics"], run_id="f2",
                                 resume=True)
    assert s2["units_completed"] == 0
    assert spark.read.parquet(dirs["out"]).count() == out.count()

    # materialize the expected final rows before mutating the dirs (lazy
    # DataFrames would otherwise point at deleted files)
    want = out.select("conv_id", "turn_idx", "extracted_text") \
        .orderBy("conv_id", "turn_idx").collect()

    # partial failure: drop 2 units from manifest AND their output rows
    m = spark.read.parquet(dirs["metrics"])
    victims = [r.unit for r in m.limit(2).collect()]
    kept_manifest = m.filter(~F.col("unit").isin(victims)).collect()
    kept_rows = out.filter(~F.col("unit").isin(victims)).collect()
    out_schema = out.schema
    shutil.rmtree(dirs["metrics"])
    shutil.rmtree(dirs["out"])
    spark.createDataFrame(kept_manifest, m.schema) \
        .write.parquet(dirs["metrics"])
    spark.createDataFrame(kept_rows, out_schema).write.parquet(dirs["out"])
    spark.catalog.refreshByPath(dirs["out"])
    spark.catalog.refreshByPath(dirs["metrics"])

    s3 = pipeline.run_extraction(spark, dirs["src"], dirs["out"],
                                 metrics=dirs["metrics"], run_id="f3",
                                 resume=True)
    assert s3["units_completed"] == 2
    final = spark.read.parquet(dirs["out"]) \
        .select("conv_id", "turn_idx", "extracted_text") \
        .orderBy("conv_id", "turn_idx").collect()
    assert final == want  # identical final table, no duplicates


def test_files_mode_extraction_equals_shuffle_mode(spark, dirs):
    make_transcripts(spark, 25, partitions=4).write.parquet(dirs["src"])
    pipeline.run_extraction(spark, dirs["src"], dirs["out"], mode="files")
    df = spark.read.parquet(dirs["src"])
    s_out = dirs["out"] + "_shuffle"
    pipeline.run_extraction(spark, df, s_out, n_units=8, mode="shuffle")
    a = spark.read.parquet(dirs["out"]).select(
        "conv_id", "turn_idx", "extracted_text", "family") \
        .orderBy("conv_id", "turn_idx").collect()
    b = spark.read.parquet(s_out).select(
        "conv_id", "turn_idx", "extracted_text", "family") \
        .orderBy("conv_id", "turn_idx").collect()
    assert a == b
