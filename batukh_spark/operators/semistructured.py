"""Semi-structured (JSON) column handling.

Event/telemetry tables carry a free-form JSON properties column next to
the typed columns; at corpus scale the engine must project TYPED fields
out of it without ever inferring schema from data (schema_of_json over
10^12 rows is a full scan before the real query even starts) and
without dropping malformed rows silently.

The reference's ignore_errors contract is counted-not-dropped
(/root/reference/batukh/tensorflow/utils/data/dataloader.py:47,176 —
decode errors surface as counted nulls, never silent row loss); the
same contract applies here: a malformed JSON value yields NULL
extracted fields plus a per-row `malformed` flag the caller can
aggregate.  Type-mismatch semantics: a syntactically valid JSON whose
field fails the declared type (e.g. a string where a bigint is
declared) is COUNTED AS MALFORMED — Spark's PERMISSIVE from_json sets
the corrupt-record column for it, and the oracle SQL's try_cast path
is aligned with that verdict on the checked corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_json_props(events: DataFrame,
                     fields: dict[str, str] | None = None,
                     json_col: str = "props",
                     id_col: str = "event_id") -> DataFrame:
    """Project typed fields out of a JSON string column: one
    `from_json` with an EXPLICIT schema (a Catalyst JsonToStructs
    expression — scan-local, codegen, no Python), exploded into one
    top-level column per requested field, plus a `malformed` flag
    (non-NULL input that failed to parse).

    `fields` maps field name -> Spark SQL type string (default
    {"k": "long"}).  A NULL json value is NOT malformed (absence vs
    corruption — the same distinction corpus_delta draws); a parsed
    object missing a field yields NULL for that field without raising.

    Scale: pure projection — no shuffle, parallelism follows the
    scan; the explicit schema means Catalyst prunes unreferenced
    fields and the JSON parser only materializes what the query
    reads."""
    fields = fields or {"k": "long"}
    if "__corrupt" in fields:
        raise ValueError("'__corrupt' is reserved")
    # PERMISSIVE from_json yields a struct of NULLs for corrupt input
    # (indistinguishable from a valid object missing every field), so
    # the corrupt-record column carries the detection: it is non-NULL
    # exactly when the parser rejected the value
    schema = ", ".join(f"{k} {t}" for k, t in fields.items())
    parsed = F.from_json(
        F.col(json_col), schema + ", __corrupt string",
        {"columnNameOfCorruptRecord": "__corrupt"})
    staged = events.withColumn("__p", parsed)
    malformed = F.coalesce(
        F.col("__p").getField("__corrupt").isNotNull(), F.lit(False))
    out = [F.col(c) for c in events.columns if c != json_col]
    out += [F.col("__p").getField(k).alias(k) for k in fields]
    out.append(malformed.alias("malformed"))
    return staged.select(*out)
