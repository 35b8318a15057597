"""Pins the closed-form expectations behind the flagship templated
oracle queries (queries.extract_transcripts / html_block_kinds /
pdf_xycut_lines) against the frozen oracle directly — covering the
short/empty/special-char branches the testdata documents never hit.

The driver's DuckDB gate proves Spark == SQL on real testdata; these
tests prove the SQL closed forms equal the frozen oracle on the edge
branches (nw < 5, empty text, markup/backtick characters in text).
"""

import json
import math
import re

from batukh_spark.oracle.extract import extract


def _canon(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def _html_payload(doc_id: int, text: str) -> str:
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">",
                                                                  "&gt;")
    return ('<html><body><nav><a href="/">Home</a> '
            '<a href="/a">About</a></nav><h1>Doc '
            f'{doc_id}</h1><p>{esc}</p><footer><a href="/">links</a> '
            '<a href="/x">more</a></footer></body></html>')


def _pdf_payload(text: str) -> str:
    words = [w for w in _canon(text).split(" ") if w]
    toks = [{"t": w, "x0": (i % 8) * 30.0, "y0": (i // 8) * 30.0,
             "x1": (i % 8) * 30.0 + 20.0, "y1": (i // 8) * 30.0 + 10.0,
             "page": 0} for i, w in enumerate(words)]
    return json.dumps({"kind": "pdf_layout", "tokens": toks})


def _plain_payload(text: str) -> str:
    safe = _canon(text).replace("<", "(").replace("`", "'")
    return f"RESULT ok\n\n```\n{safe}\n```"


CASES = [
    "",                                        # empty
    "   \n\t ",                                # whitespace-only
    "one two",                                 # nw < 5: html drops block
    "one two three four",                      # nw = 4: still dropped
    "one two three four five",                 # nw = 5: kept
    "a < b & c > d `tick`",                    # escaping round-trip
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17",  # 3 pdf
    "lead   runs\n\nof\twhitespace here ok more pad pad pad",
]


def test_html_template_closed_form():
    for i, text in enumerate(CASES):
        c = _canon(text)
        nw = len([w for w in c.split(" ") if w])
        r = extract(_html_payload(i, text), role="user")
        assert r.family == "html"
        exp_blocks = 3 + (1 if c else 0)
        exp_kept = 2 if nw >= 5 else 0
        exp_text = f"Doc {i}\n{c}" if nw >= 5 else ""
        got_blocks = len(r.blocks)
        got_kept = sum(1 for b in r.blocks if b.keep)
        assert (got_blocks, got_kept, r.extracted_text) == \
            (exp_blocks, exp_kept, exp_text), repr(text)


def test_pdf_grid_template_closed_form():
    for text in CASES:
        words = [w for w in _canon(text).split(" ") if w]
        r = extract(_pdf_payload(text), role="assistant")
        # payload JSON is non-empty even for zero tokens: family is
        # always pdf_layout, lines/extracted are empty
        assert r.family == "pdf_layout"
        if not words:
            assert r.lines == [] and r.extracted_text == ""
            continue
        n_lines = math.ceil(len(words) / 8)
        exp = "\n".join(" ".join(words[i * 8:(i + 1) * 8])
                        for i in range(n_lines))
        assert len(r.lines) == n_lines, repr(text)
        assert r.extracted_text == exp, repr(text)


def test_plain_tool_template_closed_form():
    for text in CASES:
        c = _canon(text)
        safe = c.replace("<", "(").replace("`", "'")
        r = extract(_plain_payload(text), role="tool", tool="search")
        assert r.family == "plain", repr(text)
        exp = f"RESULT ok\n{safe}" if safe else "RESULT ok"
        assert r.extracted_text == exp, repr(text)
        exp_blocks = 1 + (1 if safe else 0)
        assert len(r.blocks) == exp_blocks
        assert all(b.keep for b in r.blocks)


def test_plain_tool_block_dropped_for_non_tool_role():
    """The fenced region is tool_output only for toolish turns; a user
    turn's fence is a code block and still kept — the role gate is on
    KIND, exercised here both ways."""
    p = _plain_payload("alpha beta")
    r_tool = extract(p, role="tool", tool="search")
    assert [b.kind for b in r_tool.blocks] == ["content", "tool_output"]
    r_user = extract(p, role="user")
    assert [b.kind for b in r_user.blocks] == ["content", "code"]
    assert all(b.keep for b in r_user.blocks)  # code blocks are kept
