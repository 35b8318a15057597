"""Deterministic stratified sampling for training-mix construction.

A pretraining pipeline rarely trains on the raw corpus mix: it
up/down-samples strata (language, source, quality band) to a target
mixture.  `stratified_sample` implements hash-gated Bernoulli sampling:
a row is kept when the first 4 hex chars of md5(salt || id) fall below
its stratum's threshold.  Properties that matter at 100 TB:

- deterministic: same corpus + salt -> the same sample on any cluster,
  any partitioning, any retry (no RNG state, no seed-per-partition
  coupling like `df.sample`);
- scan-local: a codegen'd filter, no shuffle — Catalyst pushes the
  stratum column read into the scan;
- SQL-reproducible: the DuckDB oracle computes the identical keep set.

Rate granularity is 1/65536.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _thr_hex(frac: float) -> str:
    """4-hex-char threshold; 'zzzz' sorts above every hex string, so
    rate >= 1.0 keeps everything."""
    n = round(max(0.0, frac) * 65536)
    return "zzzz" if n >= 65536 else format(n, "04x")


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.0,
                      strata_col: str = "lang",
                      id_col: str = "doc_id",
                      salt: str = "mix1") -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    `rates` maps stratum value -> keep fraction; unlisted strata use
    `default_rate`.  Change `salt` to draw an independent sample."""
    h = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        1, 4)
    thr = None
    for value, frac in sorted(rates.items()):
        cond = F.col(strata_col) == value
        thr = (F.when(cond, _thr_hex(frac)) if thr is None
               else thr.when(cond, _thr_hex(frac)))
    thr = (thr.otherwise(_thr_hex(default_rate)) if thr is not None
           else F.lit(_thr_hex(default_rate)))
    return docs.filter(h < thr)
