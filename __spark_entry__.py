"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship fused extraction (real kernels over templated
                  3-turn conversations from the documents table) at
                  sf0.001 scale.
queries()       — one entry per implemented operator family from
                  SURVEY.md §2 (see batukh_spark/queries.py for the
                  operator-id mapping).
oracle_sql()    — DuckDB-equivalent SQL for EVERY query (the flagship
                  extraction kernels run over SQL-templated payloads
                  whose expected output is a closed form, so nothing is
                  rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full main-content extraction pipeline."""
    from batukh_spark.queries import extract_transcripts
    return extract_transcripts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from batukh_spark.queries import QUERIES

    def bind(fn):
        return lambda spark, sf_dir: fn(spark, sf_dir)

    return {name: bind(fn) for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from batukh_spark.queries import QUERIES
    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}
