"""Block model shared by every payload family.

A Block is the transcript-domain analogue of a contour bounding box
`(x, y, w, h)` in the reference (`/root/reference/batukh/torch/
segmenter.py:547-554`): a contiguous region of the payload with a class,
a score, and a keep decision.  `start`/`end` are char offsets into the raw
input `text` (html/plain); PDF-layout lines carry geometry instead (see
pdf_layout.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from batukh_spark.oracle import constants as C
from batukh_spark.oracle.canonical import canonicalize, word_count


@dataclass(slots=True)
class Block:
    kind: str = C.KIND_CONTENT
    start: int = 0            # char offset of first raw segment
    end: int = 0              # char offset one past last raw segment
    text: str = ""            # canonicalized block text
    tag_path: str = ""        # dom path at block start, e.g. "html/body/div/p"
    n_chars: int = 0          # len(canonical text)
    n_words: int = 0
    n_anchor_chars: int = 0   # canonical chars contributed inside <a>
    structural: bool = False  # hard boilerplate (nav/header/footer/aside)
    score: float = 0.0        # text density (words per virtual line)
    link_density: float = 0.0
    keep: bool = False


def finalize_block(raw_parts: list[str], anchor_chars: int, start: int,
                   end: int, kind: str, tag_path: str,
                   structural: bool) -> Block | None:
    """Build a Block from accumulated raw text segments; None if empty."""
    text = canonicalize("".join(raw_parts))
    if not text:
        return None
    n_chars = len(text)
    n_words = word_count(text)
    lines = max(1, math.ceil(n_chars / C.WRAP_CHARS))
    b = Block(kind=kind, start=start, end=end, text=text, tag_path=tag_path,
              n_chars=n_chars, n_words=n_words,
              n_anchor_chars=min(anchor_chars, n_chars),
              structural=structural)
    b.score = n_words / lines
    b.link_density = b.n_anchor_chars / n_chars if n_chars else 0.0
    return b


def classify_and_keep(blocks: list[Block], role: str | None = None) -> None:
    """Score → classify → neighbour-smooth → keep, in place.

    The transcript-domain analogue of the reference's inference pipeline
    `predict → get_coordinates → get_pages` (`/root/reference/batukh/torch/
    segmenter.py:394-411,541-573`): per-region class decision (argmax ≈ the
    threshold rules below), then context smoothing (erosion ≈ the
    neighbour pass), then the keep/filter stage (area threshold ≈ density
    and link-density thresholds).

    Deterministic, order-stable; mutates `blocks`.
    """
    is_tool_role = role == "tool"

    # Pass 1: local classification.  Structural chrome (nav/header/footer/
    # aside ancestry) wins over every tokenizer kind — a heading inside
    # <header> is site chrome, not article content.
    for b in blocks:
        if b.structural:
            b.kind = C.KIND_BOILERPLATE
            continue
        if b.kind in (C.KIND_CODE, C.KIND_TOOL, C.KIND_HEADING):
            continue  # non-structural tokenizer kinds stand
        if b.link_density > C.LINK_DENSITY_MAX:
            b.kind = C.KIND_BOILERPLATE
        elif (b.n_words >= C.CONTENT_MIN_WORDS
              or b.score >= C.CONTENT_MIN_DENSITY):
            b.kind = C.KIND_CONTENT
        elif b.n_words < C.SHORT_BLOCK_WORDS:
            b.kind = C.KIND_BOILERPLATE  # soft — may be rescued below
        else:
            b.kind = C.KIND_CONTENT

    # Pass 2: neighbour smoothing — a short, link-light block sandwiched
    # next to content is content (U-Net context analogue, SURVEY §2 K1).
    # Only soft boilerplate (not structural, not link-dense) is rescued.
    soft = [i for i, b in enumerate(blocks)
            if b.kind == C.KIND_BOILERPLATE and not b.structural
            and b.link_density <= C.LINK_DENSITY_MAX]
    # neighbour list skips hard boilerplate so a nav bar doesn't shield.
    seq = [i for i, b in enumerate(blocks)
           if not (b.structural or (b.kind == C.KIND_BOILERPLATE
                                    and b.link_density > C.LINK_DENSITY_MAX))]
    pos_in_seq = {i: j for j, i in enumerate(seq)}
    for i in soft:
        j = pos_in_seq.get(i)
        if j is None:
            continue
        prev_c = (j > 0 and blocks[seq[j - 1]].kind == C.KIND_CONTENT)
        next_c = (j + 1 < len(seq)
                  and blocks[seq[j + 1]].kind == C.KIND_CONTENT)
        if prev_c or next_c:
            blocks[i].kind = C.KIND_CONTENT

    # Pass 3: keep decision.
    for idx, b in enumerate(blocks):
        if b.kind == C.KIND_CONTENT:
            b.keep = True
        elif b.kind == C.KIND_CODE:
            b.keep = True
        elif b.kind == C.KIND_TOOL:
            b.keep = is_tool_role
        elif b.kind == C.KIND_HEADING:
            # A heading is kept iff the next non-heading, non-structural
            # block is kept (it "titles" kept content).
            b.keep = False
            for nb in blocks[idx + 1:]:
                if nb.structural or nb.kind == C.KIND_HEADING:
                    continue
                b.keep = nb.kind in (C.KIND_CONTENT, C.KIND_CODE) or (
                    nb.kind == C.KIND_TOOL and is_tool_role)
                break
        else:
            b.keep = False


def assemble(blocks: list[Block]) -> str:
    """Ordered kept spans → extracted text (map2string analogue,
    /root/reference/batukh/tensorflow/ocr.py:61-87)."""
    return "\n".join(b.text for b in blocks if b.keep)
