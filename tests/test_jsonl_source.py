"""JSONL transcript source: same pipeline, line-delimited JSON input."""

import shutil

import pytest
from pyspark.sql import functions as F

from batukh_spark import pipeline
from batukh_spark.corpus import make_transcripts
from batukh_spark.sources.io import read_transcripts


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("src.jsonl", "out", "metrics")}
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_jsonl_roundtrip_and_extraction(spark, dirs):
    df = make_transcripts(spark, 15, partitions=2)
    (df.withColumn("ts", F.date_format(
        "ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
       .write.json(dirs["src.jsonl"]))

    back = read_transcripts(spark, dirs["src.jsonl"])
    assert back.schema["turn_idx"].dataType.simpleString() == "int"
    assert back.count() == df.count()
    a = back.select("conv_id", "turn_idx", "text", "ts") \
        .orderBy("conv_id", "turn_idx").collect()
    b = df.select("conv_id", "turn_idx", "text", "ts") \
        .orderBy("conv_id", "turn_idx").collect()
    assert a == b  # values and timestamps survive the JSONL round-trip

    s = pipeline.run_extraction(spark, back, dirs["out"],
                                metrics=dirs["metrics"], n_units=8,
                                mode="shuffle")
    assert s["units_completed"] >= 1
    out = spark.read.parquet(dirs["out"])
    assert out.count() == df.count()
