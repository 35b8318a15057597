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


def chunk_documents(docs, max_tokens: int = 64, overlap: int = 8,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Split documents into overlapping token-window chunks — the
    context-window preparation step of a training pipeline.  Returns
    one row per chunk: (id, chunk_idx, n_tokens, chunk_text), where
    chunk i covers canonical whitespace tokens
    [i*stride, i*stride + max_tokens) with stride = max_tokens -
    overlap; chunk_text is the space-joined canonical form.

    Scan-local fan-out (inline over a per-row struct array): no
    shuffle, parallelism follows the scan, output rows ~ n_tokens /
    stride per document."""
    from pyspark.sql import functions as F
    stride = max_tokens - overlap
    toks = tokens_col(text_col)
    n = F.size(toks)
    n_chunks = (F.when(n <= 0, F.lit(0))
                .when(n <= max_tokens, F.lit(1))
                .otherwise((F.lit(1) + F.ceil((n - max_tokens)
                                              / F.lit(float(stride))))
                           .cast("int")))
    # sequence(0, -1) would generate a DESCENDING range — guard empty
    seq = F.when(n_chunks > 0,
                 F.sequence(F.lit(0), n_chunks - 1)) \
        .otherwise(F.array().cast("array<int>"))
    arr = F.transform(seq, lambda i: F.struct(
        i.cast("long").alias("chunk_idx"),
        F.least(F.lit(max_tokens), n - i * stride).cast("long")
        .alias("n_tokens"),
        F.concat_ws(" ", F.slice(toks, i * stride + 1, max_tokens))
        .alias("chunk_text")))
    return docs.select(F.col(id_col), F.inline(arr))


def char_grams_md5(text: Column | str, k: int = 8) -> Column:
    """md5 of every k-char gram of the raw text (rolling-hash analogue)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    return F.when(n >= k, F.transform(
        idx, lambda i: F.md5(F.substring(c, i.cast("int"), F.lit(k))))) \
        .otherwise(F.array().cast("array<string>"))
