"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (winnowing).

All Catalyst expressions; the DuckDB oracle reproduces every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batukh_spark.operators.text import char_grams_md5, tokens_col

# tiny per-language stopword profiles for the n-gram/stopword heuristic;
# deterministic + identical in the SQL oracle
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我"],
}

STOPWORDS_EN = LANG_PROFILES["en"]

# Pre-tokenizer word/number/symbol segmentation (shared with the SQL
# oracle).  This is NOT a trained BPE: no tokenizer library ships in
# this sandbox, so `n_bpe_tokens` counts GPT-style pre-tokenization
# pieces (letter runs / digit runs / single symbols) — an upper-bound
# proxy that correlates with real BPE counts; swap in a real tokenizer
# via mapInPandas when one is available.
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens, n_chars).  n_bpe_tokens is the
    pre-tokenization proxy documented at BPE_REGEX, not a trained BPE."""
    return docs.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 0))
        .alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars"))


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Length / mean-word-length / stopword-ratio quality heuristic.

    score = 0.4*saturation(n_words/100) + 0.3*stopword_ratio-band
          + 0.3*mean-word-length-band, rounded to 4 — a standard
    pretraining-corpus quality gate shape (C4/Gopher-style rules).
    """
    toks = tokens_col(text_col)
    n_words = F.size(toks)
    sw = F.array([F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    mean_len = F.when(n_words > 0,
                      F.aggregate(toks, F.lit(0),
                                  lambda a, t: a + F.length(t))
                      / n_words).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(0.0)
    score = (
        F.lit(0.4) * F.least(n_words / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6),
                              1.0).otherwise(0.0)
        + F.lit(0.3) * F.when((mean_len >= 3.0) & (mean_len <= 12.0),
                              1.0).otherwise(0.0))
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality"))


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: argmax of per-language stopword hits
    (ties broken by language code asc).  Returns (id, pred_lang, hits)."""
    toks = tokens_col(text_col)
    scores = []
    for lang in sorted(LANG_PROFILES):
        prof = F.array([F.lit(w) for w in LANG_PROFILES[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(prof, t)))
        scores.append(F.struct(hits.alias("hits"),
                               F.lit(lang).alias("lang")))
    # max by (hits, reversed-lang) then tie-break asc: array_max on struct
    # compares fields in order — use (hits, negative-lang) is impossible on
    # strings, so sort desc by hits, asc by lang via aggregate:
    arr = F.array(*scores)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("hits"), F.lit("zz").alias("lang")),
        lambda acc, s: F.when(
            (s["hits"] > acc["hits"])
            | ((s["hits"] == acc["hits"]) & (s["lang"] < acc["lang"])),
            s).otherwise(acc))
    return docs.select(F.col(id_col),
                       best["lang"].alias("pred_lang"),
                       best["hits"].alias("hits"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", k: int = 8,
                w: int = 4) -> DataFrame:
    """Winnowing fingerprint: md5 k-char grams -> window-of-w minima ->
    distinct.  Returns (id, n_grams, n_fingerprints, fp_min).

    The per-document fingerprint set identifies near-identical passages
    (MOSS-style); fp_min is a 1-value sketch for cheap equality tests.
    """
    grams = char_grams_md5(F.col(text_col), k)
    n_grams = F.size(grams)
    win_idx = F.sequence(F.lit(1), n_grams - F.lit(w - 1))
    mins = F.when(
        n_grams >= w,
        F.array_distinct(F.transform(
            win_idx, lambda j: F.array_min(
                F.slice(grams, j.cast("int"), w))))) \
        .otherwise(F.array_distinct(grams))
    return docs.select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        F.size(mins).alias("n_fingerprints"),
        F.array_min(mins).alias("fp_min"))
