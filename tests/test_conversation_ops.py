"""Conversation assembly + token-budget sampling (round-5 depth ops)."""

import pytest

from batukh_spark.operators.conversations import assemble_conversations
from batukh_spark.operators.sampling import token_budget_sample


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, "
              "extracted_text string")


def test_assemble_orders_and_tags(spark):
    # rows arrive deliberately out of turn order and interleaved
    df = _turns(spark, [
        ("c1", 2, "assistant", "final answer"),
        ("c2", 0, "user", "other conv"),
        ("c1", 0, "user", "question"),
        ("c1", 1, "tool", "RESULT ok"),
    ])
    out = {r.conv_id: r for r in assemble_conversations(df).collect()}
    assert out["c1"].doc_text == (
        "<|user|>\nquestion\n\n<|tool|>\nRESULT ok\n\n"
        "<|assistant|>\nfinal answer")
    assert out["c1"].n_turns == 3
    assert out["c2"].doc_text == "<|user|>\nother conv"
    assert out["c2"].n_turns == 1


def test_assemble_keeps_empty_and_null_turns(spark):
    # '' and NULL extracted texts must keep their role tag — array_join
    # silently drops null elements, which would desync turn counts
    df = _turns(spark, [
        ("c1", 0, "user", ""),
        ("c1", 1, None, None),
        ("c1", 2, "assistant", "x"),
    ])
    r = assemble_conversations(df).collect()[0]
    assert r.n_turns == 3
    assert r.doc_text == "<|user|>\n\n\n<||>\n\n\n<|assistant|>\nx"


def test_assemble_n_bytes_is_utf8_octets(spark):
    df = _turns(spark, [("c1", 0, "user", "你好")])
    r = assemble_conversations(df).collect()[0]
    assert r.doc_text == "<|user|>\n你好"
    assert r.n_bytes == len(r.doc_text.encode("utf-8"))


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long")


def test_token_budget_exact_boundary(spark):
    # single stratum, 10 docs x 100 tokens, budget 250: the walk keeps
    # docs while tokens_before < 250 -> exactly 3 docs (0/100/200),
    # and the crossing doc is kept
    df = _docs(spark, [(i, "en", 100) for i in range(10)])
    out = token_budget_sample(df, budget=250).collect()
    assert len(out) == 3
    assert sorted(r.tokens_before for r in out) == [0, 100, 200]
    total = sum(r.n_tokens for r in out)
    assert total >= 250 and total - min(r.n_tokens for r in out) < 250


def test_token_budget_small_stratum_kept_whole(spark):
    df = _docs(spark, [(1, "fr", 7), (2, "fr", 9),
                       (3, "en", 5000), (4, "en", 5000)])
    out = token_budget_sample(df, budget=1000).collect()
    fr = [r for r in out if r.lang == "fr"]
    en = [r for r in out if r.lang == "en"]
    assert len(fr) == 2                      # under budget: all kept
    assert len(en) == 1                      # first doc crosses 1000
    assert en[0].tokens_before == 0


def test_token_budget_partitioning_invariant(spark):
    # the keep verdict depends only on the (hash, id) walk order, not
    # on how the input happens to be partitioned
    rows = [(i, ["en", "de", "zh"][i % 3], 10 + i % 7) for i in range(60)]
    a = token_budget_sample(_docs(spark, rows).coalesce(1), budget=120)
    b = token_budget_sample(_docs(spark, rows).repartition(13), budget=120)
    ka = sorted((r.doc_id, r.tokens_before) for r in a.collect())
    kb = sorted((r.doc_id, r.tokens_before) for r in b.collect())
    assert ka == kb and len(ka) > 0


def test_token_budget_null_stratum_and_validation(spark):
    df = _docs(spark, [(1, None, 50), (2, None, 60), (3, "en", 10)])
    out = token_budget_sample(df, budget=55).collect()
    nulls = sorted(r.doc_id for r in out if r.lang is None)
    assert len(nulls) in (1, 2)  # walk order is hash-determined
    # crossing-doc rule: tokens_before of every kept null-stratum row < 55
    assert all(r.tokens_before < 55 for r in out)
    assert [r.doc_id for r in out if r.lang == "en"] == [3]
    with pytest.raises(ValueError):
        token_budget_sample(df, budget=0)


def test_token_budget_plan_has_no_global_window(spark):
    """Per-stratum prefix sum must never serialize onto one partition:
    the window exchange is keyed on the physical-partition id."""
    df = _docs(spark, [(i, "en", 10) for i in range(40)])
    out = token_budget_sample(df, budget=200)
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in physical
    assert "SinglePartition" not in physical
    assert "hashpartitioning(__part" in physical


def test_epoch_order_is_dense_permutation(spark):
    from batukh_spark.operators.text import epoch_order
    df = spark.createDataFrame([(i,) for i in range(97)], "seq_id long")
    out = epoch_order(df, epoch=1).collect()
    assert sorted(r.epoch_rank for r in out) == list(range(97))
    # deterministic under any input partitioning
    out2 = epoch_order(df.repartition(11), epoch=1).collect()
    assert {r.seq_id: r.epoch_rank for r in out} == \
           {r.seq_id: r.epoch_rank for r in out2}


def test_epoch_order_reseeds_per_epoch(spark):
    from batukh_spark.operators.text import epoch_order
    df = spark.createDataFrame([(i,) for i in range(50)], "seq_id long")
    e1 = {r.seq_id: r.epoch_rank for r in epoch_order(df, 1).collect()}
    e2 = {r.seq_id: r.epoch_rank for r in epoch_order(df, 2).collect()}
    assert e1 != e2
    assert sorted(e2.values()) == list(range(50))


def test_epoch_order_plan_has_no_global_window(spark):
    from batukh_spark.operators.text import epoch_order
    df = spark.createDataFrame([(i,) for i in range(40)], "seq_id long")
    physical = (epoch_order(df, 3)
                ._jdf.queryExecution().executedPlan().toString())
    assert "Window" in physical
    assert "SinglePartition" not in physical
    assert "hashpartitioning(__part" in physical


def test_boilerplate_turns_flags_cross_conv_repeats(spark):
    from batukh_spark.operators.conversations import boilerplate_turns
    rows = ([(f"c{i}", 0, "assistant", "canned greeting")
             for i in range(4)]
            + [("c0", 1, "user", "unique q"),
               ("c1", 1, "user", "repeated in one conv"),
               ("c1", 2, "user", "repeated in one conv")])
    df = _turns(spark, rows)
    out = {(r.conv_id, r.turn_idx): r
           for r in boilerplate_turns(df, min_convs=3).collect()}
    assert out[("c2", 0)].is_boilerplate and out[("c2", 0)].n_convs == 4
    assert not out[("c0", 1)].is_boilerplate
    # same text twice in ONE conversation counts one distinct conv
    assert out[("c1", 1)].n_convs == 1
    assert not out[("c1", 2)].is_boilerplate


def test_unigram_logprob_exact_micro_nats(spark):
    import math
    from batukh_spark.operators.textstats import unigram_logprob
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    # corpus: a=3, b=1, c=1, N=5
    q = lambda c: round(math.log(c) * 1e6)  # noqa: E731
    n5 = q(5)
    assert out[1].n_tokens == 3
    assert out[1].logprob_micro == 2 * q(3) + q(1) - 3 * n5
    assert out[2].logprob_micro == q(3) + q(1) - 2 * n5
    # empty doc survives the left join with zeros
    assert out[3].n_tokens == 0 and out[3].logprob_micro == 0
    # fluent text outscores rare-token text per token
    assert (out[1].logprob_micro / out[1].n_tokens
            > out[2].logprob_micro / out[2].n_tokens)


def test_loss_mask_spans_reconstruct_bytes(spark):
    # byte-slicing doc_text at each span must recover EXACTLY the
    # trainable turn's text — including non-ASCII, where byte and
    # code-point offsets diverge
    from batukh_spark.operators.conversations import loss_mask_spans
    rows = [
        ("c1", 0, "user", "héllo?"),
        ("c1", 1, "assistant", "答案 one"),
        ("c1", 2, "tool", "RESULT ok"),
        ("c1", 3, "assistant", "final"),
        ("c2", 0, "assistant", ""),       # empty trainable turn
    ]
    df = _turns(spark, rows)
    docs = {r.conv_id: r.doc_text.encode("utf-8")
            for r in assemble_conversations(df).collect()}
    spans = loss_mask_spans(df).collect()
    expect = {(c, i): t for c, i, r, t in rows if r == "assistant"}
    assert {(s.conv_id, s.turn_idx) for s in spans} == set(expect)
    for s in spans:
        got = docs[s.conv_id][s.span_start:s.span_end].decode("utf-8")
        assert got == expect[(s.conv_id, s.turn_idx)]
    empty = [s for s in spans if s.conv_id == "c2"][0]
    assert empty.span_start == empty.span_end


def test_loss_mask_spans_role_selection(spark):
    from batukh_spark.operators.conversations import loss_mask_spans
    df = _turns(spark, [
        ("c1", 0, "user", "q"),
        ("c1", 1, "assistant", "a"),
        ("c1", 2, "tool", "t"),
    ])
    both = loss_mask_spans(df, train_roles=("assistant", "tool"))
    assert sorted(r.role for r in both.collect()) == ["assistant", "tool"]


def test_split_assign_group_cohesion_and_stability(spark):
    from batukh_spark.operators.sampling import split_assign
    # 40 convs x 3 turns: every turn of a conv gets the SAME split
    rows = [(f"c{i}", j, "user", "t") for i in range(40) for j in range(3)]
    df = _turns(spark, rows)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(df, w).collect()
    per_conv = {}
    for r in out:
        per_conv.setdefault(r.conv_id, set()).add(r.split)
    assert all(len(s) == 1 for s in per_conv.values())
    # growing the corpus never reassigns an existing key
    grown = _turns(spark, rows + [(f"c{i}", 0, "user", "t")
                                  for i in range(40, 400)])
    again = {r.conv_id: r.split for r in split_assign(grown, w).collect()}
    for conv, splits in per_conv.items():
        assert again[conv] == next(iter(splits))
    # fractions land near the weights over the grown key set
    from collections import Counter
    c = Counter(again.values())
    assert c["train"] / 400 > 0.7 and c["val"] > 0 and c["test"] > 0


def test_split_assign_validates_weights(spark):
    from batukh_spark.operators.sampling import split_assign
    df = _turns(spark, [("c1", 0, "user", "t")])
    with pytest.raises(ValueError):
        split_assign(df, {})
    with pytest.raises(ValueError):
        split_assign(df, {"train": -0.5, "val": 0.5})
    # single split: everything lands there, no cut points needed
    assert split_assign(df, {"train": 3.0}).collect()[0].split == "train"


def test_repetition_loops_detects_and_clears(spark):
    from batukh_spark.operators.conversations import repetition_loops
    df = _turns(spark, [
        ("c1", 0, "user", "please fix the build it is broken again"),
        ("c1", 1, "assistant", "i will run the test suite to check it"),
        ("c1", 2, "user", "that did not work try something else"),
        ("c1", 3, "assistant", "i will run the test suite to check it"),
        ("c1", 4, "assistant", "switching to a totally new debugging plan"),
        ("c2", 0, "assistant", "lonely turn has no predecessor"),
    ])
    rows = {(r.conv_id, r.turn_idx): r for r in repetition_loops(df).collect()}
    # verbatim same-role repeat across an interleaved user turn -> loop
    assert rows[("c1", 3)].jaccard_prev == 1.0
    assert rows[("c1", 3)].is_loop
    # fresh content clears the flag
    assert rows[("c1", 4)].jaccard_prev < 0.5
    assert not rows[("c1", 4)].is_loop
    # turns without a same-role predecessor produce no row
    assert ("c1", 0) not in rows and ("c1", 1) not in rows
    assert ("c2", 0) not in rows


def _tool_turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, "
              "extracted_text string, tool string")


def test_trace_stats_counts_and_error_markers(spark):
    from batukh_spark.operators.conversations import trace_stats
    df = _tool_turns(spark, [
        ("c1", 0, "user", "run the thing", None),
        ("c1", 1, "assistant", "calling the tool", None),
        ("c1", 2, "tool", "RESULT ok", "search"),
        ("c1", 3, "tool", "ERROR: timeout after 30s", "search"),
        ("c1", 4, "tool", "Traceback (most recent call last)", "calc"),
        ("c2", 0, "user", "", None),
    ])
    out = {r.conv_id: r for r in trace_stats(df).collect()}
    r = out["c1"]
    assert (r.n_turns, r.n_user, r.n_assistant, r.n_tool) == (5, 1, 1, 3)
    assert r.n_tools_distinct == 2
    # marker match is case-insensitive substring, tool turns only
    assert r.n_tool_errors == 2
    assert r.total_bytes == sum(len(t.encode()) for t in (
        "run the thing", "calling the tool", "RESULT ok",
        "ERROR: timeout after 30s", "Traceback (most recent call last)"))
    assert r.assistant_bytes == len("calling the tool")
    assert abs(r.assistant_byte_frac
               - round(r.assistant_bytes / r.total_bytes, 6)) < 1e-9
    # zero-byte conversation: frac is 0.0, not null/NaN
    assert out["c2"].total_bytes == 0
    assert out["c2"].assistant_byte_frac == 0.0


def test_trace_stats_error_marker_outside_tool_role_ignored(spark):
    from batukh_spark.operators.conversations import trace_stats
    df = _tool_turns(spark, [
        ("c1", 0, "assistant", "I saw ERROR: timeout in the log", None),
        ("c1", 1, "tool", "RESULT ok", "search"),
    ])
    assert trace_stats(df).collect()[0].n_tool_errors == 0


def test_role_transitions_cells(spark):
    from batukh_spark.operators.conversations import role_transitions
    df = _turns(spark, [
        ("c1", 0, "user", "a"),
        ("c1", 1, "assistant", "b"),
        ("c1", 2, "user", "c"),
        ("c1", 3, "user", "d"),          # double-send
        ("c2", 0, "user", "e"),
    ])
    cells = {(r.prev_role, r.role): r.n
             for r in role_transitions(df).collect()}
    assert cells[("<start>", "user")] == 2   # one per conversation
    assert cells[("user", "assistant")] == 1
    assert cells[("assistant", "user")] == 1
    assert cells[("user", "user")] == 1      # the anomaly cell
    assert sum(cells.values()) == 5          # one transition per turn


def test_sft_samples_slices_match_assembly(spark):
    from batukh_spark.operators.conversations import sft_samples
    df = _turns(spark, [
        ("c1", 0, "user", "héllo wörld"),        # multibyte context
        ("c1", 1, "assistant", "grüß dich 你好"),  # multibyte target
        ("c1", 2, "user", "again"),
        ("c1", 3, "assistant", "bye"),
    ])
    rows = {r.turn_idx: r for r in sft_samples(df).collect()}
    assert set(rows) == {1, 3}
    r1 = rows[1]
    assert r1.context_text == "<|user|>\nhéllo wörld\n\n<|assistant|>\n"
    assert r1.target_text == "grüß dich 你好"
    # offsets are BYTES: slicing the utf-8 doc at them reproduces text
    assert r1.context_bytes == len(r1.context_text.encode("utf-8"))
    assert r1.target_bytes == len(r1.target_text.encode("utf-8"))
    r3 = rows[3]
    assert r3.context_text.endswith("<|user|>\nagain\n\n<|assistant|>\n")
    assert r3.target_text == "bye"


def test_sft_samples_offsets_only_mode(spark):
    from batukh_spark.operators.conversations import sft_samples
    df = _turns(spark, [
        ("c1", 0, "user", "q"),
        ("c1", 1, "assistant", "a"),
    ])
    out = sft_samples(df, materialize=False)
    assert set(out.columns) == {"conv_id", "turn_idx", "role",
                                "context_bytes", "target_bytes"}
    r = out.collect()[0]
    assert r.context_bytes == len("<|user|>\nq\n\n<|assistant|>\n")
    assert r.target_bytes == 1


def test_bigram_logprob_exact_micro_nats(spark):
    import math
    from batukh_spark.operators.textstats import bigram_logprob
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x"), (4, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    # corpus bigrams: (a b) x3, (b a) x1, (b c) x1
    # left counts:    a->3, b->2
    q = lambda c: round(math.log(c) * 1e6)  # noqa: E731
    assert out[1].n_bigrams == 3
    assert out[1].bigram_logprob_micro == (
        2 * (q(3) - q(3)) + (q(1) - q(2)))          # ab, ba, ab
    assert out[2].n_bigrams == 2
    assert out[2].bigram_logprob_micro == (
        (q(3) - q(3)) + (q(1) - q(2)))              # ab, bc
    # < 2 tokens (and empty) survive the left join with zeros
    assert out[3].n_bigrams == 0 and out[3].bigram_logprob_micro == 0
    assert out[4].n_bigrams == 0 and out[4].bigram_logprob_micro == 0


def test_bigram_logprob_flags_word_salad(spark):
    from batukh_spark.operators.textstats import bigram_logprob
    fluent = "the cat sat on the mat and the dog sat on the rug"
    # same unigram bag, scrambled transitions
    salad = "mat the on dog sat the cat rug the and on sat the"
    corpus = spark.createDataFrame(
        [(10 + i, fluent) for i in range(6)] + [(2, salad)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logprob(corpus).collect()}
    per = lambda r: r.bigram_logprob_micro / r.n_bigrams  # noqa: E731
    # the scrambled doc's transitions are corpus-rare: per-bigram
    # conditional log-likelihood far below the fluent copies
    assert per(out[2]) < per(out[10]) - 300_000


def test_sft_mix_end_to_end(spark):
    from batukh_spark.mix import sft_mix
    turns = _turns(spark, [
        # c1: normal 3-turn conversation
        ("c1", 0, "user", "please summarize the quarterly report"),
        ("c1", 1, "assistant", "the quarter closed well above plan"),
        ("c1", 2, "user", "thanks"),
        # c2: byte-identical twin of c1 (assembles to the same doc)
        ("c2", 0, "user", "please summarize the quarterly report"),
        ("c2", 1, "assistant", "the quarter closed well above plan"),
        ("c2", 2, "user", "thanks"),
        # c3: no assistant turn at all
        ("c3", 0, "user", "ping"),
        ("c3", 1, "tool", "RESULT ok"),
    ])
    out = {r.conv_id: r for r in
           sft_mix(turns, {"train": 0.9, "val": 0.1}).collect()}
    # exact-dup conversation dropped, keeper survives
    assert "c1" in out and "c2" not in out
    r1 = out["c1"]
    assert r1.split in ("train", "val")
    assert r1.n_turns == 3
    assert r1.n_trainable_turns == 1
    assert r1.trainable_bytes == len("the quarter closed well above plan")
    assert 0 < r1.trainable_frac < 1
    # conversation with no trainable turns survives with zeros
    r3 = out["c3"]
    assert r3.n_trainable_turns == 0 and r3.trainable_bytes == 0
    assert r3.trainable_frac == 0.0


def test_sft_mix_extra_docs_dedup_surface(spark):
    from batukh_spark.mix import sft_mix
    turns = _turns(spark, [
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "hi, how can i help"),
    ])
    # an earlier run already contains this conversation's document,
    # under an id that sorts BEFORE c1 -> c1 must be dropped
    prior = spark.createDataFrame(
        [("a0", "<|user|>\nhello there\n\n<|assistant|>\nhi, how can i help")],
        "doc_id string, text string")
    out = sft_mix(turns, {"train": 1.0}, extra_docs=prior).collect()
    assert out == []          # c1 deduped; a0 itself never reaches output
    # without the prior corpus, c1 survives
    out2 = sft_mix(turns, {"train": 1.0}).collect()
    assert [r.conv_id for r in out2] == ["c1"]


def test_packed_loss_masks_reconstruct_tokens(spark):
    """Slicing each packed sequence's token stream at every mask span
    must recover EXACTLY the trainable turns' tokens — across
    sequence boundaries, with headers and non-trainable turns masked
    out."""
    from batukh_spark.operators.conversations import packed_loss_masks
    rows = [
        ("c1", 0, "user", "alpha beta gamma delta"),
        ("c1", 1, "assistant", "one two three four five six"),
        ("c1", 2, "user", "epsilon"),
        ("c1", 3, "assistant", "seven eight"),
        ("c2", 0, "user", "zeta eta"),
        ("c2", 1, "assistant", "nine ten eleven"),
    ]
    df = _turns(spark, rows)
    L = 8  # tiny: forces straddling
    out = packed_loss_masks(df, seq_len=L).collect()

    # build the reference packed stream in plain python
    pieces = {}
    for cid, tid, role, text in rows:
        pieces.setdefault(cid, []).append((tid, role, text))
    stream = []
    for cid in sorted(pieces):
        for tid, role, text in sorted(pieces[cid]):
            stream.append(f"<|{role}|>")
            stream.extend(text.lower().split())
    seqs = {s: stream[s * L:(s + 1) * L]
            for s in range(-(-len(stream) // L))}

    got = {}
    for r in out:
        toks = seqs[r.seq_id][r.seq_start:r.seq_end]
        got.setdefault((r.conv_id, r.turn_idx), []).extend(
            (r.seq_id, r.seq_start + i, t) for i, t in enumerate(toks))
    # every trainable turn's tokens, in order, nothing else
    want_keys = {(cid, tid) for cid, tid, role, _ in rows
                 if role == "assistant"}
    assert set(got) == want_keys
    by_turn = {(cid, tid): text.lower().split()
               for cid, tid, role, text in rows if role == "assistant"}
    for key, pieces_got in got.items():
        toks = [t for _, _, t in sorted(pieces_got)]
        assert toks == by_turn[key], key
    # total masked positions == total trainable tokens
    assert sum(r.seq_end - r.seq_start for r in out) == \
        sum(len(v) for v in by_turn.values())


def test_packed_loss_masks_empty_turn_and_bounds(spark):
    from batukh_spark.operators.conversations import packed_loss_masks
    df = _turns(spark, [
        ("c1", 0, "user", "q"),
        ("c1", 1, "assistant", ""),        # empty: no mask row
        ("c1", 2, "assistant", "ans"),
    ])
    out = packed_loss_masks(df, seq_len=4).collect()
    assert [(r.turn_idx) for r in out] == [2]
    r = out[0]
    assert 0 <= r.seq_start < r.seq_end <= 4


def test_best_of_n_argmax_and_tiebreak(spark):
    from batukh_spark.operators.sampling import best_of_n
    df = spark.createDataFrame(
        [("g1", "a", 0.5), ("g1", "b", 0.9), ("g1", "c", 0.9),
         ("g2", "x", 0.1)],
        "group_id string, cand_id string, score double")
    out = {r.group_id: r for r in best_of_n(df).collect()}
    # highest score wins; exact tie -> highest cand_id, deterministically
    assert out["g1"].cand_id == "c" and out["g1"].score == 0.9
    assert out["g2"].cand_id == "x"
    # invariant under partitioning
    out2 = {r.group_id: r.cand_id
            for r in best_of_n(df.repartition(7)).collect()}
    assert out2 == {g: r.cand_id for g, r in out.items()}


def test_packed_loss_masks_plan_properties(spark):
    """The mask chain must stay distributed: the turn-offset window is
    conversation-keyed, the packer's window is partition-id-keyed, and
    nothing serializes onto a single partition."""
    from batukh_spark.operators.conversations import packed_loss_masks
    df = _turns(spark, [(f"c{i}", j, "assistant" if j % 2 else "user",
                         "some words here")
                        for i in range(20) for j in range(4)])
    plan = (packed_loss_masks(df, seq_len=16)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan
    assert "hashpartitioning(conv_id" in plan
    # the packer's broadcast offsets join must not degrade to shuffle
    assert "BroadcastHashJoin" in plan


def test_trace_stats_shuffle_plan(spark):
    """trace_stats plans as the standard two-phase distinct aggregate:
    a partial on (conv, tool) below the first exchange (so each
    conversation's turns collapse map-side), then the per-conv merge —
    the second exchange carries ONE row per (conv, tool), never turns.
    Nothing keys on anything but the conversation."""
    from batukh_spark.operators.conversations import trace_stats
    df = _tool_turns(spark, [("c1", 0, "tool", "RESULT ok", "search")])
    plan = (trace_stats(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_count" in plan  # map-side partials before any shuffle
    assert "SinglePartition" not in plan


def test_packed_loss_masks_mega_conversation(spark):
    """A pathological mega-conversation (5k turns) must pack correctly
    and stay bounded: per-row state is ints only, never assembled
    text.  Every one of its trainable tokens lands in exactly one
    mask position."""
    from batukh_spark.operators.conversations import packed_loss_masks
    n = 5000
    rows = [("mega", j, "assistant" if j % 2 else "user",
             "tok0 tok1 tok2 tok3 tok4") for j in range(n)]
    out = packed_loss_masks(_turns(spark, rows), seq_len=256).collect()
    # (6 tokens per piece) * 2500 assistant turns, 5 trainable each
    assert sum(r.seq_end - r.seq_start for r in out) == 2500 * 5
    assert all(0 <= r.seq_start < r.seq_end <= 256 for r in out)
    # spans never overlap within one sequence
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append((r.seq_start, r.seq_end))
    for spans in by_seq.values():
        spans.sort()
        assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))


def test_preference_pairs_extremes_ties_and_plan(spark):
    from batukh_spark.operators.sampling import best_of_n, preference_pairs
    df = spark.createDataFrame(
        [("g1", "a", 0.5), ("g1", "b", 0.9), ("g1", "c", 0.9),
         ("g2", "x", 0.1),                       # singleton: margin 0
         ("g3", "p", 0.3), ("g3", "q", 0.3)],    # all-tied: no signal
        "group_id string, cand_id string, score double")
    out = {r.group_id: r for r in preference_pairs(df).collect()}
    # chosen mirrors best_of_n's tie-break; rejected is the (score, id) min
    assert set(out) == {"g1"}
    assert out["g1"].chosen_id == "c" and out["g1"].rejected_id == "a"
    assert out["g1"].margin == 0.9 - 0.5
    winners = {r.group_id: r.cand_id for r in best_of_n(df).collect()}
    assert winners["g1"] == out["g1"].chosen_id
    # min_margin prunes weak pairs
    assert preference_pairs(df, min_margin=0.5).count() == 0
    # invariant under partitioning
    out2 = {(r.group_id, r.chosen_id, r.rejected_id)
            for r in preference_pairs(df.repartition(7)).collect()}
    assert out2 == {("g1", "c", "a")}
    # scale: one shuffle total, partial aggregation before it
    plan = (preference_pairs(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan and "partial_min" in plan


def test_truncate_keeps_opening_plus_suffix(spark):
    from batukh_spark.operators.conversations import truncate_conversations
    # opening turn = 2 tokens; later turns 3,4,5 tokens; budget 8
    # suffix sums (from the end): t3=5, t3+t2=9 -> only t3 fits with
    # the opening (2+5=7 <= 8); t2 would make 2+9=11 > 8.
    df = _turns(spark, [
        ("c1", 0, "user", "a b"),
        ("c1", 1, "assistant", "c d e"),
        ("c1", 2, "user", "f g h i"),
        ("c1", 3, "assistant", "j k l m n"),
    ])
    out = {r.turn_idx: r.kept
           for r in truncate_conversations(df, max_tokens=8).collect()}
    assert out == {0: True, 1: False, 2: False, 3: True}


def test_truncate_opening_always_kept_and_suffix_property(spark):
    from batukh_spark.operators.conversations import truncate_conversations
    # opening alone blows the budget: still kept, everything else drops
    df = _turns(spark, [
        ("c1", 0, "user", "w " * 50),
        ("c1", 1, "assistant", "x"),
    ])
    out = {r.turn_idx: r.kept
           for r in truncate_conversations(df, max_tokens=10).collect()}
    assert out[0] is True and out[1] is False
    # kept set is a suffix (plus the opening) for a longer conv
    df2 = _turns(spark, [("c2", i, "user", "t " * (i + 1))
                         for i in range(8)])
    rows = sorted(truncate_conversations(df2, max_tokens=20).collect(),
                  key=lambda r: r.turn_idx)
    kept_tail = [r.kept for r in rows[1:]]
    # once kept, every later turn is kept too
    first_kept = kept_tail.index(True) if True in kept_tail else len(kept_tail)
    assert all(kept_tail[first_kept:])
    assert not any(kept_tail[:first_kept])
    with pytest.raises(ValueError):
        truncate_conversations(df2, max_tokens=0)


def test_truncate_single_shuffle_plan(spark):
    from batukh_spark.operators.conversations import truncate_conversations
    df = _turns(spark, [("c1", 0, "user", "a b c")])
    plan = (truncate_conversations(df, max_tokens=8)
            ._jdf.queryExecution().executedPlan().toString())
    # both windows share one conv-keyed exchange; nothing single-partition
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan


def test_merge_consecutive_runs_and_counts(spark):
    from batukh_spark.operators.conversations import merge_consecutive_turns
    df = _turns(spark, [
        ("c1", 0, "user", "q"),
        ("c1", 1, "tool", "part one"),
        ("c1", 2, "tool", "part two"),
        ("c1", 3, "tool", None),         # null joins as empty string
        ("c1", 4, "assistant", "done"),
        ("c1", 5, "user", "q2"),
        ("c1", 6, "user", "q2 again"),
    ])
    out = {r.turn_idx: r for r in merge_consecutive_turns(df).collect()}
    assert sorted(out) == [0, 1, 4, 5]
    assert out[1].role == "tool"
    assert out[1].text == "part one\npart two\n"
    assert out[1].n_merged == 3
    assert out[5].text == "q2\nq2 again" and out[5].n_merged == 2
    # runs never merge across conversations
    df2 = _turns(spark, [("a", 0, "tool", "x"), ("b", 0, "tool", "y")])
    assert merge_consecutive_turns(df2).count() == 2


def test_merge_consecutive_partitioning_invariant(spark):
    from batukh_spark.operators.conversations import merge_consecutive_turns
    rows = [(f"c{i % 5}", j, ["user", "tool", "tool", "assistant"][j % 4],
             f"t{i}-{j}") for i in range(10) for j in range(8)]
    df = _turns(spark, rows)
    a = sorted(map(tuple, merge_consecutive_turns(df).collect()))
    b = sorted(map(tuple,
                   merge_consecutive_turns(df.repartition(13)).collect()))
    assert a == b
