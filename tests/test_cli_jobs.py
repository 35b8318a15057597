"""CLI training-data jobs: extract -> mix -> batches over one corpus.

Each job runs in its OWN subprocess (the CLI stops its SparkSession on
exit, which would kill the shared test session if run in-process);
outputs are verified with DuckDB, independent of Spark.
"""

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "batukh_spark.cli"] + args,
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_extract_mix_batches(tmp_path):
    ext = str(tmp_path / "ext")
    mix = str(tmp_path / "mix")
    batches = str(tmp_path / "batches")

    s0 = _run(["--synthesize", "60", "--output", ext,
               "--metrics", str(tmp_path / "m"),
               "--n-units", "4", "--parallelism", "8"])
    assert s0["units_completed"] == 4

    s1 = _run(["--job", "mix", "--input", ext, "--output", mix,
               "--rates", '{"und": 1.0}', "--default-rate", "1.0",
               "--keep-unknown-lang", "--quality-min", "0.2",
               "--parallelism", "8"])
    assert s1["job"] == "mix" and s1["rows_out"] > 0

    s2 = _run(["--job", "batches", "--input", ext, "--output", batches,
               "--seq-len", "96", "--default-rate", "1.0",
               "--keep-unknown-lang", "--quality-min", "0.2",
               "--parallelism", "8"])
    assert s2["job"] == "batches" and s2["rows_out"] > 0

    convdocs = str(tmp_path / "convdocs")
    s3 = _run(["--job", "convdocs", "--input", ext, "--output", convdocs,
               "--parallelism", "8"])
    assert s3["job"] == "convdocs" and s3["rows_out"] > 0

    con = duckdb.connect()
    # convdocs: one row per conversation, n_turns sums to the turn count
    n_convs, n_turns = con.execute(
        f"select count(distinct conv_id), count(*) from "
        f"read_parquet('{ext}/*/*.parquet')").fetchone()
    got_convs, got_turns = con.execute(
        f"select count(*), sum(n_turns) from "
        f"read_parquet('{convdocs}/*.parquet')").fetchone()
    assert (got_convs, got_turns) == (n_convs, n_turns)
    assert con.execute(
        f"select count(*) from read_parquet('{convdocs}/*.parquet') "
        f"where doc_text not like '<|%'").fetchone()[0] == 0
    cols = {c[0] for c in con.execute(
        f"describe select * from read_parquet('{mix}/*.parquet')"
    ).fetchall()}
    assert {"doc_id", "chunk_idx", "n_tokens", "chunk_text",
            "pred_lang", "quality"} <= cols
    assert con.execute(
        f"select count(*) from read_parquet('{mix}/*.parquet') "
        f"where n_tokens > 64").fetchone()[0] == 0
    # every packed sequence except the last is exactly full
    n_bad = con.execute(
        f"select count(*) from read_parquet('{batches}/*.parquet') "
        f"where n_tokens <> 96 and seq_id <> (select max(seq_id) from "
        f"read_parquet('{batches}/*.parquet'))").fetchone()[0]
    assert n_bad == 0
