"""IO-abstraction routing tests (SURVEY §0 environment note).

The Iceberg catalog branch can't run for real in this sandbox (no jars),
so routing is exercised with a mocked catalog conf + patched reader /
writer entry points; the parquet/JSONL branches and the atomic manifest
swap run for real.
"""

import os
import shutil

from pyspark.sql import functions as F

from batukh_spark.corpus import make_transcripts
from batukh_spark.sources import io as bio


def test_is_catalog_table_detection(spark):
    spark.conf.set("spark.sql.catalog.cat", "org.example.FakeCatalog")
    try:
        assert bio._is_catalog_table(spark, "cat.db.transcripts")
        assert not bio._is_catalog_table(spark, "other.db.transcripts")
        assert not bio._is_catalog_table(spark, "/data/cat.db.parquet")
        assert not bio._is_catalog_table(spark, "cat")  # no db/table part
    finally:
        spark.conf.unset("spark.sql.catalog.cat")


def test_read_transcripts_catalog_routing(spark, monkeypatch):
    spark.conf.set("spark.sql.catalog.cat", "org.example.FakeCatalog")
    calls = {}
    from pyspark.sql.readwriter import DataFrameReader

    def fake_table(self, name):
        calls["table"] = name
        return spark.range(1)

    monkeypatch.setattr(DataFrameReader, "table", fake_table)
    try:
        bio.read_transcripts(spark, "cat.db.transcripts")
        assert calls["table"] == "cat.db.transcripts"
    finally:
        spark.conf.unset("spark.sql.catalog.cat")


def test_write_catalog_routing(spark, monkeypatch):
    """write_extracted -> overwritePartitions, append_manifest ->
    append, rewrite_manifest -> replace (Iceberg's transactional
    dynamic-overwrite / append / replace verbs)."""
    spark.conf.set("spark.sql.catalog.cat", "org.example.FakeCatalog")
    calls = []

    class FakeWriterV2:
        def __init__(self, tbl):
            self.tbl = tbl

        def overwritePartitions(self):
            calls.append(("overwritePartitions", self.tbl))

        def append(self):
            calls.append(("append", self.tbl))

        def replace(self):
            calls.append(("replace", self.tbl))

    df = spark.range(3)
    # patch the INSTANCE's class: pyspark 4 routes through the
    # classic/connect DataFrame subclass, not the abstract base
    monkeypatch.setattr(type(df), "writeTo",
                        lambda self, tbl: FakeWriterV2(tbl))
    try:
        bio.write_extracted(df, "cat.db.out")
        bio.append_manifest(df, "cat.db.metrics")
        bio.rewrite_manifest(df, "cat.db.metrics")
        assert calls == [("overwritePartitions", "cat.db.out"),
                         ("append", "cat.db.metrics"),
                         ("replace", "cat.db.metrics")]
    finally:
        spark.conf.unset("spark.sql.catalog.cat")


def test_jsonl_dir_without_suffix_is_sniffed(spark, tmp_path):
    """A directory of .json part files whose NAME lacks a suffix (the
    common dump layout) must route to the JSON reader, not parquet."""
    dump = str(tmp_path / "dump")
    df = make_transcripts(spark, 5, partitions=1)
    (df.withColumn("ts", F.date_format("ts",
                                       "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
       .write.json(dump))
    assert bio._looks_jsonl(dump)
    back = bio.read_transcripts(spark, dump)
    assert back.count() == df.count()
    # explicit hint also works (the non-listable-URI escape hatch)
    assert bio.read_transcripts(spark, dump, fmt="jsonl").count() \
        == df.count()
    shutil.rmtree(dump, ignore_errors=True)


def test_parquet_dir_not_sniffed_as_jsonl(spark, tmp_path):
    p = str(tmp_path / "pq")
    make_transcripts(spark, 5, partitions=1).write.parquet(p)
    assert not bio._looks_jsonl(p)
    assert bio.read_transcripts(spark, p).count() > 0


def test_rewrite_manifest_versioned_commit_and_gc(spark, tmp_path):
    """Object-store-safe compaction: survivors land in the NEXT
    vNNNNNN dir (committed by _SUCCESS, no rename anywhere on the
    data path), readers pick the highest committed version, and older
    versions + legacy loose files are GC'd only after commit."""
    target = str(tmp_path / "manifest")
    df1 = spark.range(10).withColumn("status", F.lit("done"))
    df1.write.parquet(target)        # legacy un-versioned layout

    # compaction derived from the target itself: the new-version write
    # means the source stays readable while the survivors materialize,
    # and it migrates the legacy layout to v000001
    survivors = bio.read_manifest(spark, target).filter("id < 4")
    bio.rewrite_manifest(survivors, target)
    assert bio.read_manifest(spark, target).count() == 4
    assert os.path.exists(os.path.join(target, "v000001", "_SUCCESS"))
    assert not any(f.endswith(".parquet") for f in os.listdir(target)
                   if os.path.isfile(os.path.join(target, f)))

    # second compaction bumps the version and GCs the old one
    bio.rewrite_manifest(bio.read_manifest(spark, target).filter("id < 2"),
                         target)
    assert bio.read_manifest(spark, target).count() == 2
    assert os.path.exists(os.path.join(target, "v000002", "_SUCCESS"))
    assert not os.path.exists(os.path.join(target, "v000001"))


def test_rewrite_manifest_crash_window_reads_old_version(spark, tmp_path):
    """An UNCOMMITTED higher version (crash before _SUCCESS) must be
    invisible: readers stay on the last committed version, and the
    next compaction simply claims the following version number."""
    target = str(tmp_path / "manifest")
    bio.append_manifest(spark.range(6).withColumn("s", F.lit("done")),
                        target)
    assert bio.read_manifest(spark, target).count() == 6
    # simulate a compaction that died mid-write: v000002 without _SUCCESS
    crash = os.path.join(target, "v000002")
    spark.range(1).write.parquet(crash)
    os.remove(os.path.join(crash, "_SUCCESS"))
    m = bio.read_manifest(spark, target)
    assert m is not None and m.count() == 6
    # appends keep landing in the committed version, not the orphan
    bio.append_manifest(spark.range(2).withColumn("s", F.lit("done")),
                        target)
    assert bio.read_manifest(spark, target).count() == 8


def test_orphan_only_store_stays_versioned(spark, tmp_path):
    """A crashed FIRST write leaves an orphan vNNNNNN without _SUCCESS.
    The store must still be treated as VERSIONED: reads report no
    committed manifest (never a recursive legacy read that would pick
    up the orphan's torn part files), and the next append opens the
    NEXT version number instead of writing into the torn dir or
    landing loose at the root."""
    target = str(tmp_path / "manifest")
    orphan = os.path.join(target, "v000001")
    spark.range(3).withColumn("s", F.lit("torn")).write.parquet(orphan)
    os.remove(os.path.join(orphan, "_SUCCESS"))

    # nothing committed -> no manifest, and the torn rows are invisible
    assert bio.read_manifest(spark, target) is None

    bio.append_manifest(spark.range(5).withColumn("s", F.lit("done")),
                        target)
    # append skipped the orphan and committed v000002
    assert os.path.exists(os.path.join(target, "v000002", "_SUCCESS"))
    assert not os.path.exists(os.path.join(orphan, "_SUCCESS"))
    m = bio.read_manifest(spark, target)
    assert m.count() == 5 and m.filter("s = 'torn'").count() == 0
    # no loose legacy files were written at the root
    assert all(os.path.isdir(os.path.join(target, f)) or f.startswith("_")
               for f in os.listdir(target))

    # compaction numbers above EVERY existing dir and GCs the orphan
    bio.rewrite_manifest(bio.read_manifest(spark, target).filter("id < 2"),
                         target)
    assert os.path.exists(os.path.join(target, "v000003", "_SUCCESS"))
    assert not os.path.exists(orphan)
    assert bio.read_manifest(spark, target).count() == 2


def test_read_manifest_propagates_versioned_read_errors(spark, tmp_path):
    """A transient IO failure on a store that HAS committed versions
    must PROPAGATE, not be swallowed into 'no manifest' (which would
    make resume re-extract every unit and append duplicate rows)."""
    import pytest

    target = str(tmp_path / "manifest")
    bio.append_manifest(spark.range(4).withColumn("s", F.lit("done")),
                        target)
    assert bio.read_manifest(spark, target).count() == 4
    # corrupt the committed version's data file: the read must raise
    vdir = os.path.join(target, "v000001")
    for f in os.listdir(vdir):
        if f.endswith(".parquet"):
            with open(os.path.join(vdir, f), "wb") as fh:
                fh.write(b"not a parquet file")
    with pytest.raises(Exception):
        bio.read_manifest(spark, target).collect()


def test_orphan_beside_committed_legacy_store(spark, tmp_path):
    """A crashed FIRST COMPACTION (orphan vNNNNNN without _SUCCESS, on
    a store that HAS committed legacy root files) must not strand the
    legacy rows: reads still return them (without leaking the orphan's
    torn part-files), appends keep landing at the legacy root, and the
    next compaction migrates everything while GC'ing the orphan."""
    target = str(tmp_path / "manifest")
    spark.range(6).withColumn("s", F.lit("legacy")).write.parquet(target)
    # crashed compaction: v000001 exists but was never committed
    orphan = os.path.join(target, "v000001")
    spark.range(99).withColumn("s", F.lit("torn")).write.parquet(orphan)
    os.remove(os.path.join(orphan, "_SUCCESS"))

    m = bio.read_manifest(spark, target)
    assert m is not None and m.count() == 6
    assert m.filter("s = 'torn'").count() == 0

    bio.append_manifest(spark.range(2).withColumn("s", F.lit("legacy")),
                        target)
    m2 = bio.read_manifest(spark, target)
    assert m2.count() == 8 and m2.filter("s = 'torn'").count() == 0

    # retry of the compaction: numbers above the orphan, migrates the
    # legacy rows, GCs both the orphan and the loose root files
    bio.rewrite_manifest(bio.read_manifest(spark, target), target)
    assert os.path.exists(os.path.join(target, "v000002", "_SUCCESS"))
    assert not os.path.exists(orphan)
    m3 = bio.read_manifest(spark, target)
    assert m3.count() == 8 and m3.filter("s = 'torn'").count() == 0
    assert all(os.path.isdir(os.path.join(target, f)) or
               f.startswith(("_", "."))
               for f in os.listdir(target))
