"""Corpus snapshot diff — what changed between two corpus versions.

An incremental training-data pipeline re-crawls / re-extracts sources
and must answer "what actually changed" before re-running dedup,
gates, and mixes: re-processing an unchanged corpus wastes the whole
cluster, and silently dropped documents poison incremental dedup
stores (`incremental_keep_set` assumes history ids stay valid).  This
is the corpus-level analogue of the reference's checkpoint
restore-or-init decision (resume only what moved,
/root/reference/batukh/tensorflow/utils/checkpoint.py) applied to the
data instead of the model.

Scale: both sides collapse to (id, md5) pairs at the scan — text
never shuffles; the diff is ONE full-outer key join of 40-byte rows,
and the verdict is a codegen CASE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_delta(old: DataFrame, new: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Diff two corpus snapshots by content hash.

    Returns one row per id present in EITHER side:
    (id_col, status) with status in
      'added'     — id only in `new`,
      'removed'   — id only in `old`,
      'changed'   — id in both, text hash differs,
      'unchanged' — id in both, text hash equal.
    NULL text hashes like NULL ids are legitimate content: md5 of a
    NULL text is NULL, and two NULLs compare as unchanged (both-null
    branch), never as changed.
    """
    # presence is tracked via per-side marker columns, not the hash
    # (a NULL text in a PRESENT row must not read as absence)
    om = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("__ho"),
                    F.lit(1).alias("__po"))
    nm = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("__hn"),
                    F.lit(1).alias("__pn"))
    j = om.join(nm, id_col, "full_outer")
    status = (F.when(F.col("__po").isNull(), F.lit("added"))
              .when(F.col("__pn").isNull(), F.lit("removed"))
              .when(F.col("__ho").eqNullSafe(F.col("__hn")),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(F.col(id_col), status.alias("status"))
