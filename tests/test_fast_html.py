"""Differential tests: fast regex tokenizer vs html.parser reference.

Contract: on golden fixtures and realistic (synthetic-corpus) payloads
the two tokenizers are byte-identical.  On adversarial tag soup the fast
scanner may legally diverge (the oracle DEFINES extraction semantics;
goldens pin them) but must uphold all span/structure invariants.
"""

import random

from batukh_spark import synth
from batukh_spark.oracle.html_extract import (tokenize_html,
                                              tokenize_html_reference)
from fixture_corpus import FIXTURES


def _sig(blocks):
    return [(b.kind, b.start, b.end, b.text, b.structural,
             round(b.score, 9), round(b.link_density, 9)) for b in blocks]


def test_fast_equals_reference_on_fixtures():
    for fx in FIXTURES:
        t = fx["text"]
        if "<" not in t:
            continue
        assert _sig(tokenize_html(t)) == _sig(tokenize_html_reference(t)), \
            f"{fx['conv_id']}/{fx['turn_idx']}"


def test_fast_equals_reference_on_synthetic_corpus():
    for c in range(300):
        for ti in range(6):
            tu = synth.make_turn(c, ti)
            if "<" not in tu["text"]:
                continue
            assert _sig(tokenize_html(tu["text"])) == \
                _sig(tokenize_html_reference(tu["text"])), f"{c}/{ti}"


def test_fast_invariants_on_tag_soup():
    rng = random.Random(99)
    frags = ["<p>", "</p>", "<div>", "&amp;", "&", "<", ">", "w ",
             "<a href='x'>", "</a>", "<script>", "</script>", "<!--",
             "-->", "<br>", "<pre>", "</", '<div class="tool">',
             "<B>", "</b>", "<nav>", "</nav>", "&#x41;", "<!DOCTYPE html>",
             "<style>", "</style>", "<h2>", "</h2>", "<img src='x'>"]
    for _ in range(500):
        s = "".join(rng.choice(frags) for _ in range(rng.randrange(0, 60)))
        blocks = tokenize_html(s)
        last_end = 0
        for b in blocks:
            assert 0 <= b.start < b.end <= len(s)
            assert b.start >= last_end  # ordered, non-overlapping
            last_end = b.end
            assert b.text  # finalize drops empties
