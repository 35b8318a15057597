"""Conversation-level assembly: extracted turns -> training documents.

The extraction pipeline emits one row per TURN; every downstream
corpus operator (dedup, quality, sampling, chunking, packing) works on
DOCUMENTS.  `assemble_conversations` is the bridge: it concatenates a
conversation's extracted turns, in stable (conv_id, turn_idx) order,
into one role-tagged training document — the standard chat-transcript
serialization (`<|role|>` headers, blank-line separated), analogous to
the reference's map2string assembly of per-line decodings into one
page string (/root/reference/batukh/tensorflow/utils/utils.py, map2string)
but at conversation granularity.

Scale: one groupBy(conv_id) shuffle that carries exactly the extracted
text (the minimum any assembly must move).  Per-group memory is bounded
by a single conversation's extracted bytes — mega-conversations
(~2000 turns in the synthetic corpus) are single-digit MB, far under
executor memory; there is no collect, no window over a global
ordering, and the aggregation state never exceeds one conversation.
The sort into turn order happens INSIDE each group's collected array
(array_sort on (turn_idx, text) structs), so no global sort stage is
needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assemble_conversations(turns: DataFrame,
                           id_col: str = "conv_id",
                           order_col: str = "turn_idx",
                           role_col: str = "role",
                           text_col: str = "extracted_text",
                           sep: str = "\n\n") -> DataFrame:
    """One training document per conversation.

    Returns (id_col, n_turns, n_bytes, doc_text) where doc_text is the
    turns in ascending `order_col` order, each rendered as
    ``<|role|>\\n<text>`` and joined by `sep`; n_bytes is the UTF-8
    byte length of doc_text (octet_length — byte-exact across engines,
    unlike code-point counts for non-BMP text).

    Empty extracted turns keep their role tag: a turn that extracted
    to '' is still a turn the model should see attributed, and
    dropping it silently would desync turn counts from the manifest.
    """
    # coalesce: concat is null-propagating and array_join silently
    # SKIPS null elements — a null role/text would otherwise drop the
    # whole turn from the document without any error
    piece = F.concat(F.lit("<|"), F.coalesce(F.col(role_col), F.lit("")),
                     F.lit("|>\n"), F.coalesce(F.col(text_col), F.lit("")))
    # struct sort key = (order_col, piece): order_col is unique within
    # a conversation, so the piece never participates in ordering —
    # it just rides along to avoid a second join back for the text
    agg = turns.groupBy(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"),
                                    piece.alias("p")))).alias("__ps"))
    doc = F.array_join(F.transform("__ps", lambda s: s["p"]), sep)
    return agg.select(
        F.col(id_col),
        F.col("n_turns").cast("long").alias("n_turns"),
        F.octet_length(doc).cast("long").alias("n_bytes"),
        doc.alias("doc_text"))


def loss_mask_spans(turns: DataFrame,
                    train_roles: tuple[str, ...] = ("assistant",),
                    id_col: str = "conv_id",
                    order_col: str = "turn_idx",
                    role_col: str = "role",
                    text_col: str = "extracted_text",
                    sep: str = "\n\n") -> DataFrame:
    """Loss-mask spans for assistant-only training: for each turn whose
    role is in `train_roles`, the [span_start, span_end) BYTE offsets
    of its extracted text inside the `assemble_conversations` document
    with the same parameters — the role header (``<|role|>\\n``) and
    the separators are serialization, not supervision, so they fall
    outside every span.  A trainer masks loss to these spans; byte
    offsets (not code points) are what a byte-level tokenizer slices,
    and octet_length is byte-exact across engines for any UTF-8 text.

    Returns (id_col, order_col, role, span_start, span_end), one row
    per trainable turn.  A trainable turn that extracted to '' yields
    an empty span (start == end) rather than disappearing — span
    count stays in lockstep with the turn manifest.

    Scale: piece lengths are computed scan-local; the running offset
    is a window over (id_col ORDER BY order_col) — doc-keyed and
    hash-partitioned (never SinglePartition), carrying only
    (ids, role, two ints); document text never shuffles.
    """
    role_ = F.coalesce(F.col(role_col), F.lit(""))
    text_ = F.coalesce(F.col(text_col), F.lit(""))
    header = F.concat(F.lit("<|"), role_, F.lit("|>\n"))
    slim = turns.select(
        F.col(id_col), F.col(order_col), role_.alias("role"),
        F.octet_length(header).cast("long").alias("__hlen"),
        (F.octet_length(header) + F.octet_length(text_))
        .cast("long").alias("__plen"))
    w = (Window.partitionBy(id_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    sep_b = len(sep.encode("utf-8"))
    off = F.coalesce(F.sum(F.col("__plen") + F.lit(sep_b)).over(w),
                     F.lit(0))
    return (slim.withColumn("__off", off)
            .filter(F.col("role").isin(*train_roles))
            .select(F.col(id_col), F.col(order_col), F.col("role"),
                    (F.col("__off") + F.col("__hlen")).cast("long")
                    .alias("span_start"),
                    (F.col("__off") + F.col("__plen")).cast("long")
                    .alias("span_end")))


def boilerplate_turns(turns: DataFrame, min_convs: int = 3,
                      id_col: str = "conv_id",
                      text_col: str = "extracted_text") -> DataFrame:
    """Flag turns whose extracted text repeats verbatim across many
    conversations — canned greetings, tool banners, template
    disclaimers.  Cross-conversation repetition is the transcript
    analogue of document boilerplate: a turn appearing in `min_convs`+
    distinct conversations carries no per-conversation signal and
    inflates n-gram counts downstream.

    Returns the input columns plus (n_convs, is_boilerplate), where
    n_convs counts distinct conversations sharing this turn's exact
    text.

    Scale: stats are keyed on md5(text) — the distinct-count shuffle
    carries (32B hash, conv_id) pairs, never the text; the flag joins
    back on the same 32B key.  True boilerplate is by definition a hot
    key (one hash held by millions of conversations) — the distinct
    count is a two-level hash aggregation with map-side partials, and
    AQE's skew handling splits the reduce side; if only the FLAG is
    needed downstream, filter the stats to n_convs >= min_convs first
    (a tiny relation) and broadcast it instead of the full join.
    """
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    keyed = turns.withColumn("__h", h)
    stats = (keyed.groupBy("__h")
             .agg(F.count_distinct(F.col(id_col)).alias("n_convs")))
    return (keyed.join(stats, "__h")
            .drop("__h")
            .withColumn("n_convs", F.col("n_convs").cast("long"))
            .withColumn("is_boilerplate",
                        F.col("n_convs") >= F.lit(int(min_convs))))


def repetition_loops(turns: DataFrame, threshold: float = 0.5,
                     k: int = 3,
                     id_col: str = "conv_id",
                     order_col: str = "turn_idx",
                     role_col: str = "role",
                     text_col: str = "extracted_text") -> DataFrame:
    """Agent-loop detection: for every turn that has an EARLIER turn
    of the same role in its conversation, the k-word-shingle Jaccard
    similarity against that immediately preceding same-role turn —
    an assistant (or tool) re-emitting near-identical output turn
    after turn is the classic stuck-agent loop, and transcripts
    caught in one are training poison (the model learns to repeat
    itself).  Returns (id_col, order_col, role, jaccard_prev,
    is_loop) for turns with a same-role predecessor; jaccard_prev is
    rounded to 6 places (cross-engine float stability), is_loop =
    jaccard_prev >= threshold.

    Scale: shingle arrays are staged as columns (never recomputed
    inside lambda bodies — the interpreted-HOF tax), the predecessor
    comes from a lag window keyed on (conversation, role) — doc-keyed
    and hash-partitioned, never SinglePartition — and the similarity
    is codegen array_intersect/array_union on the two arrays riding
    the same row; no self-join, no all-pairs stage.
    """
    from batukh_spark.operators.text import tokens_col, word_shingles
    toks = turns.select(
        F.col(id_col), F.col(order_col),
        F.coalesce(F.col(role_col), F.lit("")).alias("role"),
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("__tk"))
    sh = toks.select(
        F.col(id_col), F.col(order_col), F.col("role"),
        F.array_distinct(word_shingles(F.col("__tk"), k)).alias("__sh"))
    w = Window.partitionBy(id_col, "role").orderBy(order_col)
    lagged = sh.withColumn("__psh", F.lag("__sh").over(w)) \
        .filter(F.col("__psh").isNotNull())
    inter = F.size(F.array_intersect("__sh", "__psh"))
    union = F.size("__sh") + F.size("__psh") - inter
    jac = F.round(F.when(union > 0, inter / union).otherwise(0.0), 6)
    return lagged.select(
        F.col(id_col), F.col(order_col), F.col("role"),
        jac.alias("jaccard_prev"),
        (jac >= F.lit(float(threshold))).alias("is_loop"))


def trace_stats(turns: DataFrame,
                error_markers: tuple[str, ...] = ("error:", "traceback",
                                                  "exception:"),
                id_col: str = "conv_id",
                role_col: str = "role",
                text_col: str = "extracted_text",
                tool_col: str = "tool") -> DataFrame:
    """Per-conversation agent-trace profile — the triage view an
    agent-transcript corpus is filtered on before training: how much
    of a trace is tool traffic, how many distinct tools it touched,
    how often those tools errored, and what fraction of the bytes the
    assistant actually wrote.  Traces that are all tool output (or all
    tool FAILURES) are curation targets, not training documents.

    Returns one row per conversation:
      (id_col, n_turns, n_user, n_assistant, n_tool, n_tools_distinct,
       n_tool_errors, total_bytes, assistant_bytes,
       assistant_byte_frac)

    `n_tool_errors` counts tool-role turns whose lowered text contains
    any of `error_markers` — substring match, not regex, so Spark and
    any SQL oracle compute the identical flag (no Java-vs-RE2 regex
    dialect to reconcile) and the check stays in whole-stage codegen.
    `assistant_byte_frac` is rounded to 6 places (the repo's standard
    cross-engine float guard); 0.0 for a conversation with 0 bytes.

    Scale: ONE groupBy(id_col) over conditional codegen aggregates —
    the same single shuffle any per-conversation rollup needs; the
    shuffle rows carry a handful of ints (map-side partials collapse
    each conversation's turns before the exchange), never the text.
    """
    role_ = F.coalesce(F.col(role_col), F.lit(""))
    text_ = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(text_)
    is_err = F.lit(False)
    for m in error_markers:
        is_err = is_err | (F.instr(low, m.lower()) > 0)
    nbytes = F.octet_length(text_).cast("long")
    one = F.lit(1)
    agg = turns.groupBy(F.col(id_col)).agg(
        F.count(one).cast("long").alias("n_turns"),
        F.sum(F.when(role_ == "user", 1).otherwise(0))
        .cast("long").alias("n_user"),
        F.sum(F.when(role_ == "assistant", 1).otherwise(0))
        .cast("long").alias("n_assistant"),
        F.sum(F.when(role_ == "tool", 1).otherwise(0))
        .cast("long").alias("n_tool"),
        F.count_distinct(F.when(role_ == "tool", F.col(tool_col)))
        .cast("long").alias("n_tools_distinct"),
        F.sum(F.when((role_ == "tool") & is_err, 1).otherwise(0))
        .cast("long").alias("n_tool_errors"),
        F.sum(nbytes).cast("long").alias("total_bytes"),
        F.sum(F.when(role_ == "assistant", nbytes).otherwise(0))
        .cast("long").alias("assistant_bytes"))
    frac = F.when(F.col("total_bytes") > 0,
                  F.round(F.col("assistant_bytes")
                          / F.col("total_bytes"), 6)) \
        .otherwise(F.lit(0.0))
    return agg.withColumn("assistant_byte_frac", frac)


def role_transitions(turns: DataFrame,
                     id_col: str = "conv_id",
                     order_col: str = "turn_idx",
                     role_col: str = "role") -> DataFrame:
    """Corpus-wide role-bigram histogram: for every turn, the
    (previous role -> role) transition within its conversation (the
    first turn transitions from the sentinel '<start>'), counted over
    the whole corpus.  The transition profile is how a transcript
    corpus's PROTOCOL is audited at scale: user->user double-sends,
    assistant turns with no preceding user, tool output nothing
    requested — each anomaly is a cell that should be ~zero, and a
    fat cell localizes a broken producer without reading a single
    transcript.

    Returns (prev_role, role, n) sorted nowhere (order it at the
    consumer).  Scale: a lag window keyed on (id_col ORDER BY
    order_col) — hash-partitioned by conversation, never
    SinglePartition — carrying only the two role strings, then a
    groupBy over at most |roles|^2 keys (map-side partials make the
    final exchange a few dozen rows regardless of corpus size).
    """
    role_ = F.coalesce(F.col(role_col), F.lit(""))
    w = Window.partitionBy(id_col).orderBy(order_col)
    prev = F.coalesce(F.lag(role_).over(w), F.lit("<start>"))
    return (turns
            .select(F.col(id_col), F.col(order_col), role_.alias("role"))
            .withColumn("prev_role", prev)
            .groupBy("prev_role", "role")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def sft_samples(turns: DataFrame,
                train_roles: tuple[str, ...] = ("assistant",),
                id_col: str = "conv_id",
                order_col: str = "turn_idx",
                role_col: str = "role",
                text_col: str = "extracted_text",
                sep: str = "\n\n",
                materialize: bool = True) -> DataFrame:
    """SFT sample expansion: one training sample per trainable turn —
    the standard multi-turn supervised-fine-tuning transform.  Sample
    t's INPUT is the assembled conversation document up to and
    including turn t's role header; its TARGET is turn t's extracted
    text.  Offsets are BYTES into the `assemble_conversations`
    document with the same parameters (what a byte-level tokenizer
    slices).

    Returns one row per trainable turn:
      (id_col, order_col, role, context_bytes, target_bytes
       [, context_text, target_text])
    where context_bytes == the target span's start offset and the two
    text columns (when `materialize=True`) are BYTE slices of the
    assembled document — substring over the binary cast, so a
    multi-byte code point is never split (spans land on piece
    boundaries by construction).

    Materializing contexts duplicates bytes: a k-turn conversation
    emits ~k/2 prefixes of growing length (O(doc * k) output).  That
    is the correct shape for a small SFT corpus; at pretraining scale
    pass `materialize=False` to emit offsets only (no join, no text
    shuffle) and slice lazily at the reader.

    Scale: offsets come from `loss_mask_spans` (doc-keyed window over
    int lengths); materialization adds one join keyed on `id_col`
    shipping each document once (then fan-out is scan-local slicing).
    """
    spans = loss_mask_spans(turns, train_roles, id_col, order_col,
                            role_col, text_col, sep)
    if not materialize:
        return spans.select(
            F.col(id_col), F.col(order_col), F.col("role"),
            F.col("span_start").alias("context_bytes"),
            (F.col("span_end") - F.col("span_start")).cast("long")
            .alias("target_bytes"))
    docs = assemble_conversations(turns, id_col, order_col, role_col,
                                  text_col, sep) \
        .select(F.col(id_col), F.col("doc_text").alias("__doc"))
    j = spans.join(docs, id_col)
    ctx = F.expr("cast(substring(cast(__doc as binary), 1, span_start) "
                 "as string)")
    tgt = F.expr("cast(substring(cast(__doc as binary), span_start + 1, "
                 "span_end - span_start) as string)")
    return j.select(
        F.col(id_col), F.col(order_col), F.col("role"),
        F.col("span_start").alias("context_bytes"),
        (F.col("span_end") - F.col("span_start")).cast("long")
        .alias("target_bytes"),
        ctx.alias("context_text"),
        tgt.alias("target_text"))


def packed_loss_masks(turns: DataFrame, seq_len: int = 256,
                      train_roles: tuple[str, ...] = ("assistant",),
                      id_col: str = "conv_id",
                      order_col: str = "turn_idx",
                      role_col: str = "role",
                      text_col: str = "extracted_text") -> DataFrame:
    """Loss masks in PACKED-SEQUENCE token space — the last alignment
    step of the SFT path: `loss_mask_spans` gives byte spans in the
    assembled document, but a trainer consuming `pack_sequences`
    output needs, for every packed sequence, which TOKEN positions
    carry loss.  This operator maps each trainable turn through
    assembly and concat-and-split packing in one job.

    Token model: whitespace tokens of the assembled document.  Piece
    serialization makes per-turn token counts exact WITHOUT assembling
    text: ``<|role|>\\n<text>`` contributes 1 header token plus the
    turn's own whitespace tokens (the header contains no whitespace;
    the trailing newline and the ``\\n\\n`` separator guarantee no
    token ever merges across the boundary).  A turn's trainable range
    excludes its header token.  Packing is `text.pack_sequences` over
    one row per conversation (whole conversations enter the stream in
    conv-id order — the SFT analogue of chunk packing).

    Returns one row per (trainable turn x packed sequence) overlap:
      (id_col, order_col, role, seq_id, seq_start, seq_end)
    with [seq_start, seq_end) the in-sequence token positions of that
    turn's tokens inside seq_id.  A trainable turn that extracted to
    '' has an empty token range and yields no row (its BYTE span in
    `loss_mask_spans` still exists — byte accounting and token
    masking legitimately differ on empty turns).

    Scale: everything after the scan is int arithmetic — per-turn
    token counts are scan-local; turn offsets are a window over
    (id_col ORDER BY order_col); conversation totals feed the
    distributed-prefix-sum packer (no SinglePartition stage, k-row
    planning collect only); the final overlap join is keyed on id_col
    with per-conversation fan-out bounded by n_turns x n_sequences.
    Document text never shuffles, and no text is ever assembled.
    """
    from batukh_spark.operators.text import pack_sequences, tokens_col

    role_ = F.coalesce(F.col(role_col), F.lit(""))
    ntext = F.size(tokens_col(F.coalesce(F.col(text_col), F.lit(""))))
    pt = turns.select(
        F.col(id_col), F.col(order_col), role_.alias("role"),
        ntext.cast("long").alias("__ntext"),
        (ntext + 1).cast("long").alias("__ptoks"))
    # NOT checkpointed deliberately: pt is consumed twice (offsets
    # window + conversation totals), so the tokenize projection runs
    # once per consumer — but an interleaved A/B at sf0.1 measured the
    # checkpointed form a wash-to-slightly-slower (4.72 vs 4.82 s
    # median over 7 pairs): the duplicate is int-only, scan-local and
    # parallel, while a checkpoint serializes materialization before
    # either consumer starts (same finding as incremental_keep_set's
    # new-side and the winnow fps frame).
    w = (Window.partitionBy(id_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    off = pt.withColumn(
        "__a", F.coalesce(F.sum("__ptoks").over(w), F.lit(0)))
    trainable = (off.filter(F.col("role").isin(*train_roles))
                 .select(F.col(id_col), F.col(order_col), F.col("role"),
                         (F.col("__a") + 1).alias("__ta"),
                         (F.col("__a") + 1 + F.col("__ntext"))
                         .alias("__tb")))
    convtot = (pt.groupBy(F.col(id_col))
               .agg(F.sum("__ptoks").alias("n_tokens"))
               .withColumn("chunk_idx", F.lit(0)))
    overlaps = pack_sequences(convtot, seq_len, doc_col=id_col,
                              idx_col="chunk_idx")
    lo = F.greatest(F.col("__ta"), F.col("tok_begin"))
    hi = F.least(F.col("__tb"), F.col("tok_end"))
    return (trainable.join(overlaps, id_col)
            .filter(lo < hi)
            .select(F.col(id_col), F.col(order_col), F.col("role"),
                    F.col("seq_id"),
                    (F.col("seq_pos") + lo - F.col("tok_begin"))
                    .cast("long").alias("seq_start"),
                    (F.col("seq_pos") + hi - F.col("tok_begin"))
                    .cast("long").alias("seq_end")))


def truncate_conversations(turns: DataFrame, max_tokens: int,
                           id_col: str = "conv_id",
                           order_col: str = "turn_idx",
                           role_col: str = "role",
                           text_col: str = "extracted_text") -> DataFrame:
    """Fit each conversation into a context window: keep the OPENING
    turn (system prompt / task statement — the one turn a truncated
    chat cannot lose) plus the longest RECENT suffix whose combined
    token count stays within `max_tokens` — the standard
    keep-head-drop-middle chat truncation.

    Returns every input turn as (id_col, order_col, role_col,
    n_tokens, kept): callers filter kept for the training view and
    keep the full frame for truncation-loss accounting.  The opening
    turn is always kept, even when it alone exceeds the budget (a
    conversation must contribute its instruction or nothing — callers
    gate on n_tokens if they want a hard drop).  A turn is kept iff
    opening_tokens + (tokens of it and every later non-opening turn)
    <= max_tokens, so the kept set is by construction a suffix.

    Scale: ONE shuffle on (id_col) shared by both windows (min +
    reverse running sum); token counts are scan-local; per-row state
    is three longs, text never re-ships after tokenization.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens!r}")
    from batukh_spark.operators.text import tokens_col
    base = turns.select(
        F.col(id_col), F.col(order_col), F.col(role_col),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"))
    w = Window.partitionBy(id_col)
    first = F.min(F.col(order_col)).over(w)
    is_first = F.col(order_col) == F.col("__first")
    wdesc = (Window.partitionBy(id_col)
             .orderBy(F.col(order_col).desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tail = F.sum(F.when(is_first, F.lit(0))
                 .otherwise(F.col("n_tokens"))).over(wdesc)
    first_tok = F.max(F.when(is_first, F.col("n_tokens"))
                      .otherwise(F.lit(0))).over(w)
    staged = (base.withColumn("__first", first)
              .withColumn("__tail", tail)
              .withColumn("__ftok", first_tok))
    kept = F.when(is_first, F.lit(True)).otherwise(
        (F.col("__tail") + F.col("__ftok")) <= max_tokens)
    return staged.select(F.col(id_col), F.col(order_col),
                         F.col(role_col), F.col("n_tokens"),
                         kept.alias("kept"))


def merge_consecutive_turns(turns: DataFrame,
                            id_col: str = "conv_id",
                            order_col: str = "turn_idx",
                            role_col: str = "role",
                            text_col: str = "extracted_text",
                            sep: str = "\n") -> DataFrame:
    """Collapse runs of consecutive same-role turns into one turn —
    the conversation-granularity analogue of the reference's CTC
    merge-repeated collapse of adjacent duplicate symbols
    (/root/reference/batukh/tensorflow/model.py, ctc_decode): real
    agent transcripts frequently split one logical message across
    several same-role rows (streaming flushes, tool-call retries),
    and role-alternation consumers (chat templates, packed loss
    masks) require the merged form.

    Returns one row per run: (id_col, turn_idx = the run's first
    `order_col`, role_col, text = run texts joined by `sep` in turn
    order, n_merged).  Run identity is the running count of role
    CHANGES up to each turn, so runs are maximal and order-stable.

    Scale: one shuffle on (id_col) for the lag/run-id window, then a
    groupBy on (id_col, run) — same key prefix, so AQE/exchange reuse
    keeps it one real repartitioning; per-group state is bounded by a
    single run's text.
    """
    wseq = Window.partitionBy(id_col).orderBy(order_col)
    changed = F.when(
        F.lag(F.col(role_col)).over(wseq).isNull() |
        (F.lag(F.col(role_col)).over(wseq) != F.col(role_col)),
        1).otherwise(0)
    runs = turns.select(
        F.col(id_col), F.col(order_col), F.col(role_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("__t"),
        F.sum(changed).over(wseq).alias("__run"))
    agg = runs.groupBy(F.col(id_col), F.col("__run")).agg(
        F.min(F.col(order_col)).alias("turn_idx"),
        F.min_by(F.col(role_col), F.col(order_col)).alias(role_col),
        F.array_sort(F.collect_list(
            F.struct(F.col(order_col).alias("o"),
                     F.col("__t").alias("t")))).alias("__ps"),
        F.count(F.lit(1)).alias("n_merged"))
    return agg.select(
        F.col(id_col), F.col("turn_idx"), F.col(role_col),
        F.array_join(F.transform("__ps", lambda s: s["t"]), sep)
        .alias("text"),
        F.col("n_merged").cast("long").alias("n_merged"))


def transition_latency_profile(events: DataFrame, qs=(50, 90, 99),
                               key_col: str = "user_id",
                               type_col: str = "event_type",
                               ts_col: str = "ts",
                               tiebreak_col: str = "event_id") -> DataFrame:
    """Per-transition latency profile over an event/turn stream: for
    every (previous type -> type) adjacency within a key's
    time-ordered sequence, the count, total, and EXACT integer-second
    gap quantiles.  This is the agent-ops triage view — which tool
    calls are slow, how long users take to reply, where a pipeline
    stalls — computed the same histogram-first way as
    token_length_profile (textstats.py) so it is bit-identical across
    engines and partitionings (no percentile_approx sketch).

    Gaps are floor(microsecond delta / 1e6) — integer seconds — so the
    histogram collapse is meaningful and the quantile windows run on a
    bounded table.  Ordering within a key is (epoch_us, tiebreak_col):
    exact duplicate timestamps are broken deterministically.  The
    first event of each key has no predecessor and contributes no gap.

    Contract: rows with NULL ts or NULL tiebreak are DROPPED before
    the lag window — a NULL order key has no defined position in a
    latency sequence, and engines disagree on where to sort it (Spark
    windows default NULLS FIRST ascending, DuckDB NULLS LAST), so
    keeping them would make the gap histogram partitioning-dependent
    and oracle-divergent.

    Returns one row per observed transition:
      (prev_type, next_type, n_gaps, total_gap_s, p50, p90, ...)
    with inverse-CDF-lower quantiles (smallest gap whose cumulative
    count reaches ceil(q/100 * n); integer predicate 100*cum >= n*q).

    Scale: ONE shuffle by key_col for the lag window (the conversation
    shuffle every sequence operator shares), then the stream collapses
    to a (prev, next, gap_s, count) histogram via a map-side-partial
    groupBy; quantile windows run on the histogram, bounded by
    |type pairs| x |distinct integer gaps| — small-table class at any
    corpus size."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    seq = (events.select(F.col(key_col).alias("__k"),
                         F.col(type_col).alias("__t"),
                         us.alias("__us"),
                         F.col(tiebreak_col).alias("__tb"))
           .where(F.col("__us").isNotNull()
                  & F.col("__tb").isNotNull()))
    w = Window.partitionBy("__k").orderBy("__us", "__tb")
    lagd = seq.select(
        F.lag("__t").over(w).alias("prev_type"),
        F.col("__t").alias("next_type"),
        ((F.col("__us") - F.lag("__us").over(w)))
        .alias("__gap_us"))
    gaps = (lagd.where(F.col("prev_type").isNotNull())
            .select("prev_type", "next_type",
                    F.expr("__gap_us div 1000000").alias("__gap")))
    hist = gaps.groupBy("prev_type", "next_type", "__gap").agg(
        F.count(F.lit(1)).alias("__cnt"))
    wc = (Window.partitionBy("prev_type", "next_type").orderBy("__gap")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("prev_type", "next_type")
    cum = (hist
           .withColumn("__cum", F.sum("__cnt").over(wc))
           .withColumn("__n", F.sum("__cnt").over(wt))
           .withColumn("__tot", F.sum(F.col("__gap") * F.col("__cnt"))
                       .over(wt)))
    aggs = [F.max("__n").cast("long").alias("n_gaps"),
            F.max("__tot").cast("long").alias("total_gap_s")]
    for q in qs:
        aggs.append(
            F.min(F.when(F.col("__cum") * 100 >= F.col("__n") * q,
                         F.col("__gap")))
            .cast("long").alias(f"p{q}"))
    return cum.groupBy("prev_type", "next_type").agg(*aggs)


def contract_audit(turns: DataFrame,
                   roles: tuple[str, ...] = ("user", "assistant", "tool",
                                             "system"),
                   id_col: str = "conv_id",
                   order_col: str = "turn_idx",
                   role_col: str = "role") -> DataFrame:
    """Pre-flight data-contract audit for a transcript table — the
    validation every 100 TB extraction run does BEFORE committing
    cluster time, because the pipeline's correctness contract ("per-
    turn text equality under stable (conv_id, turn_idx) ordering")
    silently breaks if the input violates its key invariants:
    duplicate turn indices make the ordering unstable, index gaps make
    "turn k" ambiguous across re-crawls, and out-of-domain roles break
    role-gated extraction (tool-block detection keys on role='tool').

    Per conversation:
      (id_col, n_turns, n_dup_idx, n_null_idx, min_idx, n_gaps,
       n_bad_role, ok)
    where n_dup_idx = rows beyond the first per index, n_gaps =
    missing indices inside [min_idx, max_idx], n_bad_role counts roles
    outside `roles` (NULL counts as bad), and ok = every check clean
    AND min_idx = 0.

    Scale: one groupBy(id_col) of codegen conditional aggregates; the
    exact distinct-index count makes Spark plan it as TWO bounded
    exchanges — partials keyed by (id, index), then by id — both
    carrying a handful of longs per conversation, never text (pinned
    by the plan test)."""
    role_ok = F.col(role_col).isin(*roles)
    idx = F.col(order_col)
    agg = turns.groupBy(F.col(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.count_distinct(idx).alias("__nd"),
        F.sum(F.when(idx.isNull(), 1).otherwise(0))
        .cast("long").alias("n_null_idx"),
        F.min(idx).cast("long").alias("min_idx"),
        F.max(idx).cast("long").alias("__max"),
        F.sum(F.when(role_ok, 0).otherwise(1))
        .cast("long").alias("n_bad_role"))
    n_dup = (F.col("n_turns") - F.col("n_null_idx")
             - F.col("__nd")).cast("long")
    n_gaps = F.when(
        F.col("__nd") > 0,
        F.col("__max") - F.col("min_idx") + 1 - F.col("__nd")) \
        .otherwise(F.lit(0)).cast("long")
    out = (agg.withColumn("n_dup_idx", n_dup)
           .withColumn("n_gaps", n_gaps))
    # coalesce: an all-NULL-index conversation has NULL min_idx, which
    # would three-valued-logic the verdict to NULL instead of False
    ok = F.coalesce(
        (F.col("n_dup_idx") == 0) & (F.col("n_null_idx") == 0)
        & (F.col("n_gaps") == 0) & (F.col("n_bad_role") == 0)
        & (F.col("min_idx") == 0), F.lit(False))
    return out.select(F.col(id_col), "n_turns", "n_dup_idx",
                      "n_null_idx", "min_idx", "n_gaps", "n_bad_role",
                      ok.alias("ok"))
