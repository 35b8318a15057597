"""Hand-written golden fixture turns (SURVEY §5 / FIXTURES.md).

~30 turns across the three payload families plus malformed/empty edges.
`tests/gen_golden.py` runs the frozen oracle over these and commits the
expected outputs to tests/fixtures/golden_spans.json — the analogue of the
reference's hand-written golden cases for selection/ordering semantics
(/root/reference/test/torch/test_segmenter_methods.py:8-39).
"""

import json


def _pdf(tokens):
    return json.dumps({"kind": "pdf_layout", "tokens": tokens})


def _tok(t, x0, y0, w=None, h=10.0, page=0):
    w = w if w is not None else 8.0 * len(t)
    return {"t": t, "x0": float(x0), "y0": float(y0),
            "x1": float(x0 + w), "y1": float(y0 + h), "page": page}


_LOREM = ("the quick brown fox jumps over the lazy dog while the engine "
          "keeps extracting main content from every turn of the transcript")

FIXTURES = [
    # ---- html family -------------------------------------------------------
    dict(conv_id="fx-html", turn_idx=0, role="assistant", tool=None,
         case_family="html",
         text=("<html><head><title>Site</title></head><body>"
               "<nav><a href='/'>Home</a> <a href='/a'>About</a> "
               "<a href='/c'>Contact</a></nav>"
               f"<main><h1>Welcome</h1><p>{_LOREM}</p>"
               "<p>Short tail.</p></main>"
               "<footer><a href='/tos'>Terms</a></footer></body></html>")),
    dict(conv_id="fx-html", turn_idx=1, role="assistant", tool=None,
         case_family="html",
         text=("<div><header><h1>Chrome Title</h1></header>"
               f"<article><h2>Real Title</h2><p>{_LOREM} {_LOREM}</p>"
               "<aside>Related links and other sidebar junk</aside>"
               f"<p>{_LOREM}</p></article>"
               "<footer>(c) 2026 — <a href='/p'>Privacy</a></footer></div>")),
    dict(conv_id="fx-html", turn_idx=2, role="assistant", tool=None,
         case_family="html",
         text=("<ul><li><a href='/1'>One</a></li><li><a href='/2'>Two</a>"
               f"</li></ul><p>{_LOREM}</p>"
               "<ul><li>plain item not linky but short</li></ul>")),
    dict(conv_id="fx-html", turn_idx=3, role="assistant", tool=None,
         case_family="html",
         text=("<p>Entities: &amp; &lt; &gt; &#39;q&#39; &nbsp;end "
               "and enough extra words to stay above every frozen "
               "threshold here.</p>")),
    dict(conv_id="fx-html", turn_idx=4, role="assistant", tool=None,
         case_family="html",
         text=("<body><script>var x = '<p>not content</p>';</script>"
               "<style>.c{}</style><!-- a comment -->"
               f"<p>{_LOREM}</p></body>")),
    dict(conv_id="fx-html", turn_idx=5, role="assistant", tool=None,
         case_family="html",
         text=(f"<p>Inline <b>bold</b> and <i>italic</i> and a "
               f"<a href='/x'>link</a> inside {_LOREM}</p>")),
    dict(conv_id="fx-html", turn_idx=6, role="assistant", tool=None,
         case_family="html",
         text=(f"<pre>def f():\n    return 42</pre><p>{_LOREM}</p>")),
    dict(conv_id="fx-html", turn_idx=7, role="assistant", tool=None,
         case_family="html",
         text=('<div class="tool-output"><pre>$ make\nok</pre></div>'
               f"<p>{_LOREM}</p>")),
    dict(conv_id="fx-html", turn_idx=8, role="tool", tool="bash",
         case_family="html",
         text=('<div class="tool-output"><pre>exit 0\nfiles: 3</pre></div>')),
    dict(conv_id="fx-html", turn_idx=9, role="assistant", tool=None,
         case_family="html",
         text=("<table><tr><th>h1</th><th>h2</th></tr>"
               "<tr><td>a long cell with words enough to matter for "
               "density</td><td>b</td></tr></table>")),
    # malformed
    dict(conv_id="fx-html", turn_idx=10, role="assistant", tool=None,
         case_family="malformed",
         text=f"<p>unclosed paragraph {_LOREM}"),
    dict(conv_id="fx-html", turn_idx=11, role="assistant", tool=None,
         case_family="malformed",
         text=f"stray </div></p> then <p>{_LOREM}</p>"),
    dict(conv_id="fx-html", turn_idx=12, role="assistant", tool=None,
         case_family="malformed",
         text=f"<p>bare & ampersand and &unknownentity; inside {_LOREM}</p>"),
    dict(conv_id="fx-html", turn_idx=13, role="assistant", tool=None,
         case_family="malformed",
         text="<p><P>CASE <B>mixed</B> TAGS with plenty of additional "
              "words to be confidently content here</P></p>"),
    # empty-ish
    dict(conv_id="fx-html", turn_idx=14, role="assistant", tool=None,
         case_family="empty", text="<div>   </div>"),
    dict(conv_id="fx-html", turn_idx=15, role="assistant", tool=None,
         case_family="empty", text=""),
    dict(conv_id="fx-html", turn_idx=16, role="assistant", tool=None,
         case_family="html",
         text=("<body><nav><a href='/'>Only nav</a><a href='/b'>here</a>"
               "</nav></body>")),
    # heading kept only when it titles kept content
    dict(conv_id="fx-html", turn_idx=17, role="assistant", tool=None,
         case_family="html",
         text=("<h2>Orphan heading</h2>"
               "<div><a href='/1'>l</a> <a href='/2'>l</a> "
               "<a href='/3'>l</a></div>")),

    # ---- pdf_layout family -------------------------------------------------
    dict(conv_id="fx-pdf", turn_idx=0, role="assistant", tool=None,
         case_family="pdf_layout",
         text=_pdf([_tok("single", 10, 100), _tok("column", 70, 100),
                    _tok("second", 10, 115), _tok("line", 70, 115)])),
    dict(conv_id="fx-pdf", turn_idx=1, role="assistant", tool=None,
         case_family="pdf_layout",
         # two columns; reading order col1 top->bottom then col2
         text=_pdf([_tok("L1a", 10, 100), _tok("L1b", 45, 100),
                    _tok("L2a", 10, 115), _tok("L2b", 45, 115),
                    _tok("R1a", 300, 100), _tok("R1b", 335, 100),
                    _tok("R2a", 300, 115), _tok("R2b", 335, 115)])),
    dict(conv_id="fx-pdf", turn_idx=2, role="assistant", tool=None,
         case_family="pdf_layout",
         # running header + page numbers across two pages
         text=_pdf([_tok("HDR", 10, 0, page=0), _tok("body0", 10, 200, page=0),
                    _tok("pg", 100, 395, page=0), _tok("1", 130, 395, page=0),
                    _tok("HDR", 10, 0, page=1), _tok("body1", 10, 200, page=1),
                    _tok("pg", 100, 395, page=1), _tok("2", 130, 395, page=1)])),
    dict(conv_id="fx-pdf", turn_idx=3, role="assistant", tool=None,
         case_family="pdf_layout",
         # out-of-input-order tokens; geometry decides
         text=_pdf([_tok("last", 50, 130), _tok("first", 10, 100),
                    _tok("mid", 10, 115), _tok("word", 55, 100)])),
    dict(conv_id="fx-pdf", turn_idx=4, role="assistant", tool=None,
         case_family="pdf_layout",
         text=_pdf([])),  # empty token list
    dict(conv_id="fx-pdf", turn_idx=5, role="assistant", tool=None,
         case_family="malformed",
         text='{"kind": "pdf_layout", "tokens": [{BROKEN JSON'),

    # ---- plain / tool family ----------------------------------------------
    dict(conv_id="fx-plain", turn_idx=0, role="user", tool=None,
         case_family="plain",
         text="Just a single short user turn."),
    dict(conv_id="fx-plain", turn_idx=1, role="assistant", tool=None,
         case_family="plain",
         text=("# Answer\n\nHere is the explanation paragraph with "
               "plenty of words.\n\n```python\nprint('hi')\n```\n\n"
               "Closing remark.")),
    dict(conv_id="fx-plain", turn_idx=2, role="tool", tool="bash",
         case_family="tool",
         text="```\n$ pytest -q\n42 passed\n```"),
    dict(conv_id="fx-plain", turn_idx=3, role="assistant", tool=None,
         case_family="plain",
         # fenced block inside an assistant turn stays (code kind)
         text="Before.\n\n```\nx = 1\n```\n\nAfter."),
    dict(conv_id="fx-plain", turn_idx=4, role="user", tool=None,
         case_family="plain",
         text="Multi\n\nparagraph\n\nuser message"),
    dict(conv_id="fx-plain", turn_idx=5, role="tool", tool="search",
         case_family="tool",
         # tool output wrapped in HTML
         text=('<div class="tool-result"><pre>hit 1\nhit 2</pre></div>')),
    dict(conv_id="fx-plain", turn_idx=6, role="assistant", tool=None,
         case_family="plain",
         text="unterminated fence follows\n\n```\ndangling code"),
    dict(conv_id="fx-plain", turn_idx=7, role="system", tool=None,
         case_family="plain",
         text="You are a helpful assistant. Follow the rules carefully."),
    dict(conv_id="fx-plain", turn_idx=8, role="user", tool=None,
         case_family="plain",
         text="  \n\t\n  "),  # whitespace-only
]
