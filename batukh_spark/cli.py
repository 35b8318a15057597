"""spark-submit entry point (SURVEY §7 step 6).

Cluster usage:
    spark-submit --py-files batukh_spark.zip -m batukh_spark.cli \
        --input cat.db.transcripts --output cat.db.extracted \
        --metrics cat.db.extract_manifest --run-id r42 [--resume]

Local / sandbox usage (parquet fallback, synthesizes a corpus on demand):
    python -m batukh_spark.cli --synthesize 1000 --output /tmp/out \
        --metrics /tmp/metrics --parallelism 8
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="batukh-spark")
    p.add_argument("--input", help="transcripts table ident or parquet path")
    p.add_argument("--synthesize", type=int, default=0,
                   help="generate N synthetic conversations instead of "
                        "--input (deterministic, seed=42)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", required=True)
    p.add_argument("--metrics", default=None)
    p.add_argument("--run-id", default=None)
    p.add_argument("--n-units", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--compact-manifest", type=int, default=None,
                   metavar="N",
                   help="after the run, keep only the newest N manifest "
                        "rows per unit (checkpoint retention, the "
                        "max_to_keep analogue)")
    p.add_argument("--parallelism", type=int, default=None,
                   help="local[N] cores (ignored on a real cluster)")
    args = p.parse_args(argv)
    if not args.input and not args.synthesize:
        p.error("one of --input / --synthesize is required")

    from batukh_spark.session import get_spark
    from batukh_spark import pipeline
    spark = get_spark(app_name="batukh-extract", cores=args.parallelism)
    spark.sparkContext.setLogLevel("WARN")
    try:
        if args.synthesize:
            from batukh_spark.corpus import make_transcripts
            source = make_transcripts(spark, args.synthesize, seed=args.seed)
        else:
            source = args.input
        summary = pipeline.run_extraction(
            spark, source, args.output, metrics=args.metrics,
            run_id=args.run_id, n_units=args.n_units, resume=args.resume)
        if args.compact_manifest and args.metrics:
            summary["manifest_rows_kept"] = pipeline.compact_manifest(
                spark, args.metrics, max_to_keep=args.compact_manifest)
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
