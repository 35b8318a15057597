"""HTML main-content extraction on stdlib only (no lxml/bs4 in env).

Transcript-domain analogue of PageExtractor + ImageExtractor +
LayoutExtractor (`/root/reference/batukh/torch/segmenter.py:414-702`,
`/root/reference/batukh/tensorflow/segmenter.py:11-197`): tokenizes markup
into blocks, classifies each block into k classes (content / boilerplate /
heading / code / tool_output), scores by text-density + link-density, and
keeps the main-content region — dropping chrome (nav/header/footer/aside),
scripts/styles and link farms the way the reference crops away page border
and background.

Tolerant of malformed markup (unclosed tags, stray close tags, bare `&`):
`html.parser.HTMLParser` never raises on bad input, mirroring the
error-tolerant scan `ignore_errors()` in the reference
(`/root/reference/batukh/tensorflow/utils/data/dataloader.py:47`).
"""

from __future__ import annotations

import html as _htmlmod
from html.parser import HTMLParser

from batukh_spark.oracle import constants as C
from batukh_spark.oracle.blocks import Block, finalize_block
from batukh_spark.oracle.canonical import canonicalize

_VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})


class _Frame:
    __slots__ = ("tag", "skip", "boiler", "code", "tool", "anchor")

    def __init__(self, tag, skip, boiler, code, tool, anchor):
        self.tag = tag
        self.skip = skip
        self.boiler = boiler
        self.code = code
        self.tool = tool
        self.anchor = anchor


class _BlockTokenizer(HTMLParser):
    """Streaming tokenizer: emits Blocks with char-offset spans.

    convert_charrefs=False so `getpos()` stays aligned with raw offsets;
    entities are decoded explicitly in handle_entityref/handle_charref.
    """

    def __init__(self, raw: str):
        super().__init__(convert_charrefs=False)
        self.raw = raw
        # absolute offset of each raw line start, for getpos() conversion
        self._line_starts = [0]
        idx = raw.find("\n")
        while idx != -1:
            self._line_starts.append(idx + 1)
            idx = raw.find("\n", idx + 1)
        self.blocks: list[Block] = []
        self._stack: list[_Frame] = []
        # current block accumulation
        self._parts: list[str] = []
        self._anchor_parts: list[str] = []
        self._b_start = -1
        self._b_end = -1
        self._b_kind: str | None = None
        self._b_path = ""
        self._b_structural = False
        self._block_tag: str | None = None  # last block-level tag opened

    # -- position helpers ---------------------------------------------------

    def _abs(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    # -- context flags ------------------------------------------------------

    def _flag(self, name: str) -> bool:
        return any(getattr(f, name) for f in self._stack)

    # -- block lifecycle ----------------------------------------------------

    def _flush(self) -> None:
        if self._b_start >= 0:
            anchor_len = len(canonicalize("".join(self._anchor_parts)))
            b = finalize_block(self._parts, anchor_len, self._b_start,
                              self._b_end, self._b_kind or C.KIND_CONTENT,
                              self._b_path, self._b_structural)
            if b is not None:
                self.blocks.append(b)
        self._parts = []
        self._anchor_parts = []
        self._b_start = -1
        self._b_end = -1
        self._b_kind = None

    def _append_text(self, decoded: str, raw_start: int, raw_len: int) -> None:
        if self._flag("skip"):
            return
        if self._b_start < 0:
            # lazily open a block; capture context at first segment
            self._b_start = raw_start
            self._b_path = "/".join(f.tag for f in self._stack)
            self._b_structural = self._flag("boiler")
            if self._flag("tool"):
                self._b_kind = C.KIND_TOOL
            elif self._flag("code"):
                self._b_kind = C.KIND_CODE
            elif self._block_tag in C.HEADING_TAGS:
                self._b_kind = C.KIND_HEADING
            else:
                self._b_kind = C.KIND_CONTENT
        self._b_end = raw_start + raw_len
        self._parts.append(decoded)
        if self._flag("anchor"):
            self._anchor_parts.append(decoded)

    # -- HTMLParser callbacks -----------------------------------------------

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag == "br":
            self._parts.append("\n")
            return
        if tag in _VOID_TAGS:
            return
        cls = ""
        for k, v in attrs:
            if k == "class" and v:
                cls = v.lower()
        is_tool = C.TOOL_CLASS_MARKER in cls
        frame = _Frame(
            tag,
            skip=tag in C.SKIP_TAGS,
            boiler=tag in C.BOILERPLATE_TAGS,
            code=tag in C.CODE_TAGS,
            tool=is_tool,
            anchor=tag == "a",
        )
        if tag in C.BLOCK_TAGS:
            self._flush()
            self._block_tag = tag
        self._stack.append(frame)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        if tag == "br":
            self._parts.append("\n")
        elif tag == "hr" and tag in C.BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in _VOID_TAGS:
            return
        if tag in C.BLOCK_TAGS:
            self._flush()
        # tolerant pop: stray close tags with no matching open are ignored
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break
        self._block_tag = next(
            (f.tag for f in reversed(self._stack) if f.tag in C.BLOCK_TAGS),
            None)

    def handle_data(self, data):
        if not data:
            return
        self._append_text(data, self._abs(), len(data))

    def handle_entityref(self, name):
        decoded = _htmlmod.unescape(f"&{name};")
        self._append_text(decoded, self._abs(), len(name) + 2)

    def handle_charref(self, name):
        try:
            cp = int(name[1:], 16) if name[0] in "xX" else int(name)
            decoded = chr(cp)
        except (ValueError, OverflowError):
            decoded = ""
        if decoded:
            self._append_text(decoded, self._abs(), len(name) + 3)

    def handle_comment(self, data):
        pass

    def close(self):
        super().close()
        self._flush()


def tokenize_html(raw: str) -> list[Block]:
    """raw HTML (document or fragment) → ordered list of Blocks."""
    tok = _BlockTokenizer(raw)
    try:
        tok.feed(raw)
        tok.close()
    except Exception:
        # html.parser is documented tolerant; belt-and-braces: salvage what
        # was tokenized so far (the ignore_errors analogue, but counted by
        # the caller instead of silently dropped).
        tok._flush()
    return tok.blocks
