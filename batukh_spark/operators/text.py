"""Shared text-expression builders (tokens, shingles, char-grams).

Column-expression helpers used by dedup / textstats operators.  Everything
is a Catalyst expression — stays inside whole-stage codegen, scales
linearly with the scan, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(text: Column | str) -> Column:
    """lower → whitespace-split → drop empties."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def word_shingles(tokens: Column, k: int = 3) -> Column:
    """k-word shingle strings; empty array when fewer than k tokens."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    join_parts = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, (i + j).cast("int"))
               for j in range(k)])
    return F.when(n >= k, F.transform(idx, join_parts)) \
        .otherwise(F.array().cast("array<string>"))


def char_grams_md5(text: Column | str, k: int = 8) -> Column:
    """md5 of every k-char gram of the raw text (rolling-hash analogue)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    return F.when(n >= k, F.transform(
        idx, lambda i: F.md5(F.substring(c, i.cast("int"), F.lit(k))))) \
        .otherwise(F.array().cast("array<string>"))
