"""Structured Streaming incremental extraction (availableNow trigger)."""

import shutil

import pytest

from batukh_spark.corpus import make_transcripts
from batukh_spark.streaming.incremental import incremental_extract


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("src", "out", "ckpt")}
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_incremental_extract_catches_up_and_resumes(spark, dirs):
    df1 = make_transcripts(spark, 20, partitions=3)
    df1.write.parquet(dirs["src"])
    n1 = df1.count()

    q = incremental_extract(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    assert not q.isActive
    out1 = spark.read.parquet(dirs["out"])
    assert out1.count() == n1
    assert "extracted_text" in out1.columns

    # new files arrive; a resumed stream processes ONLY them (streaming
    # checkpoint = the manifest analogue, exactly-once per file)
    extra = make_transcripts(spark, 10, seed=43, partitions=2)
    extra.write.mode("append").parquet(dirs["src"])
    n2 = extra.count()
    q2 = incremental_extract(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    q2.awaitTermination(120)
    spark.catalog.refreshByPath(dirs["out"])
    assert spark.read.parquet(dirs["out"]).count() == n1 + n2
