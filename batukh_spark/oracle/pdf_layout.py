"""PDF-layout payload: whitespace-cut recursive XY segmentation.

Transcript-domain analogue of BaselineDetector (`/root/reference/batukh/
torch/segmenter.py:705-832`): instead of localizing the baseline pixel-row
of each text line in a scanned image, we localize text lines among
positioned tokens, order them by recursive XY-cut (columns before rows,
the reading-order analogue of contour ranking at
`/root/reference/batukh/torch/segmenter.py:541-573`), and drop running
headers/footers (repeated-across-pages lines in the top/bottom band —
the "border region" class).

Input payload is a JSON string:
  {"kind": "pdf_layout",
   "tokens": [{"t": word, "x0":f, "y0":f, "x1":f, "y1":f, "page":int}, ...]}
Token input order is NOT trusted: ordering derives from geometry only.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

_DIGIT_RE = re.compile(r"\d+")

from batukh_spark.oracle import constants as C
from batukh_spark.oracle.canonical import canonicalize


@dataclass
class Line:
    page: int
    line: int          # final reading-order index within the document
    col: int           # column index within the page (0-based)
    x0: float
    y0: float
    x1: float
    y1: float
    text: str
    is_header_footer: bool = False


def _median(vals: list[float]) -> float:
    s = sorted(vals)
    n = len(s)
    if n == 0:
        return 0.0
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


# Internal token representation: (x0, y0, x1, y1, xc, yc, text) tuples —
# the centers are computed ONCE per token (same float expressions as the
# original per-call lambdas: 0.5 * (lo + hi)), so the XY-cut recursion and
# line grouping do tuple indexing instead of dict lookups + re-arithmetic.
_TX0, _TY0, _TX1, _TY1, _TXC, _TYC, _TT = range(7)


def _gaps(intervals: list[tuple[float, float]], min_gap: float):
    """Whitespace gaps >= min_gap in the union of intervals.

    Returns (cut_midpoints, widest_gap).  XY-cut recurses on ALL
    qualifying gaps along the chosen axis at this level.  The merge is
    streamed over the sorted intervals (no merged-list materialization);
    cut midpoints/widths are the same floats as the two-pass original.
    """
    ivs = sorted(intervals)
    cuts: list[float] = []
    widest = 0.0
    it = iter(ivs)
    try:
        _, cur_hi = next(it)
    except StopIteration:
        return cuts, widest
    for a, b in it:
        if a <= cur_hi:
            if b > cur_hi:
                cur_hi = b
        else:
            gap = a - cur_hi
            if gap >= min_gap:
                cuts.append(0.5 * (cur_hi + a))
                if gap > widest:
                    widest = gap
            cur_hi = b
    return cuts, widest


def _xycut(tokens: list[tuple], depth: int = 0) -> list[list[tuple]]:
    """Recursive XY-cut → ordered groups of tokens (pre-line-grouping).

    Vertical (column) cuts first: left column fully before right column.
    Then horizontal (row-band) cuts: top before bottom.  Recursion stops
    when no qualifying gap remains.
    """
    if not tokens or depth > 16:
        return [tokens] if tokens else []
    xcuts, xwide = _gaps([(t[_TX0], t[_TX1]) for t in tokens], C.XY_COL_GAP)
    ycuts, ywide = _gaps([(t[_TY0], t[_TY1]) for t in tokens], C.XY_ROW_GAP)
    if not xcuts and not ycuts:
        return [tokens]
    # cut along the axis with the widest whitespace valley: a page-wide
    # header/body/footer band gap beats a column gutter, so bands split
    # before columns and reading order is band-major.
    if ycuts and (not xcuts or ywide >= xwide):
        cuts, ki = ycuts, _TYC
    else:
        cuts, ki = xcuts, _TXC
    bounds = [float("-inf")] + cuts + [float("inf")]
    out: list[list[tuple]] = []
    for lo, hi in zip(bounds, bounds[1:]):
        part = [t for t in tokens if lo <= t[ki] < hi]
        if part:
            out.extend(_xycut(part, depth + 1))
    return out


def _group_lines(group: list[tuple]) -> list[list[tuple]]:
    """Cluster a leaf token group into lines by y-center proximity."""
    if not group:
        return []
    heights = [t[_TY1] - t[_TY0] for t in group]
    tol = max(1e-9, _median(heights) * C.LINE_TOL_FRACTION)
    toks = sorted(group, key=lambda t: (t[_TYC], t[_TX0]))
    lines: list[list[tuple]] = []
    cur: list[tuple] = []
    cur_yc = None
    for t in toks:
        yc = t[_TYC]
        if cur and abs(yc - cur_yc) > tol:
            lines.append(sorted(cur, key=lambda u: u[_TX0]))
            cur = []
        if not cur:
            cur_yc = yc
        cur.append(t)
    if cur:
        lines.append(sorted(cur, key=lambda u: u[_TX0]))
    return lines


def parse_pdf_layout(raw: str) -> list[Line] | None:
    """JSON layout payload → ordered Lines; None if unparseable."""
    try:
        doc = json.loads(raw)
    except (ValueError, TypeError):
        return None
    if not isinstance(doc, dict) or doc.get("kind") != "pdf_layout":
        return None
    by_page: dict[int, list[tuple]] = {}
    for t in doc.get("tokens", []):
        if (isinstance(t, dict) and "t" in t and "x0" in t and "y0" in t
                and "x1" in t and "y1" in t):
            x0 = t["x0"]
            y0 = t["y0"]
            x1 = t["x1"]
            y1 = t["y1"]
            by_page.setdefault(int(t.get("page", 0)), []).append(
                (x0, y0, x1, y1, 0.5 * (x0 + x1), 0.5 * (y0 + y1), t["t"]))

    all_lines: list[Line] = []
    per_page_bbox: dict[int, tuple[float, float]] = {}
    for page in sorted(by_page):
        ptoks = by_page[page]
        y_min = min(t[_TY0] for t in ptoks)
        y_max = max(t[_TY1] for t in ptoks)
        per_page_bbox[page] = (y_min, y_max)
        col = 0
        for group in _xycut(ptoks):
            for toks in _group_lines(group):
                text = canonicalize(" ".join(t[_TT] for t in toks))
                if not text:
                    continue
                all_lines.append(Line(
                    page=page, line=-1, col=col,
                    x0=min(t[_TX0] for t in toks),
                    y0=min(t[_TY0] for t in toks),
                    x1=max(t[_TX1] for t in toks),
                    y1=max(t[_TY1] for t in toks),
                    text=text))
            col += 1

    # running header/footer suppression: same canonical text on >1 page,
    # positioned inside the top/bottom band of its page.
    # page numbers vary per page, so the repetition key folds digit runs
    # ("page-1"/"page-2" → "page-#").
    if len(per_page_bbox) > 1:
        seen_pages: dict[str, set[int]] = {}
        keys = [_DIGIT_RE.sub("#", ln.text) for ln in all_lines]
        for ln, k in zip(all_lines, keys):
            seen_pages.setdefault(k, set()).add(ln.page)
        for ln, k in zip(all_lines, keys):
            if len(seen_pages[k]) <= 1:
                continue
            y_min, y_max = per_page_bbox[ln.page]
            h = max(1e-9, y_max - y_min)
            yc = 0.5 * (ln.y0 + ln.y1)
            band = C.HEADER_FOOTER_BAND
            if yc <= y_min + band * h or yc >= y_max - band * h:
                ln.is_header_footer = True

    kept = [ln for ln in all_lines if not ln.is_header_footer]
    for i, ln in enumerate(kept):
        ln.line = i
    return kept


def assemble_pdf(lines: list[Line]) -> str:
    return "\n".join(ln.text for ln in lines)
