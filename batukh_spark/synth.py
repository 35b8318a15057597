"""Deterministic synthetic transcript payload generators (pure Python).

Seeded per (conv_idx, turn_idx) so output is identical regardless of Spark
partitioning or parallelism.  Used by corpus.py (distributed generation)
and by the bench corpus.  No external data (per round instructions).
"""

from __future__ import annotations

import json
import random

_WORDS = (
    "engine spark extract content block density anchor layout line token "
    "turn transcript schema partition shuffle arrow batch kernel oracle "
    "column page header footer nav main article heading paragraph span "
    "score keep drop merge sort filter join window salt bucket manifest "
    "resume metric throughput scale cluster executor driver memory "
).split()

_TOOLS = ["bash", "python", "search", "browser", "editor"]
_ROLES_CYCLE = ["user", "assistant", "assistant", "tool", "assistant"]


def _sentence(rng: random.Random, lo=6, hi=18) -> str:
    n = rng.randint(lo, hi)
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _paragraph(rng: random.Random, lo=2, hi=5) -> str:
    return ". ".join(_sentence(rng) for _ in range(rng.randint(lo, hi))) + "."


def make_html_payload(rng: random.Random) -> str:
    nav = "".join(f"<li><a href='/{w}'>{w}</a></li>"
                  for w in rng.sample(_WORDS, rng.randint(3, 6)))
    paras = "".join(f"<p>{_paragraph(rng)}</p>"
                    for _ in range(rng.randint(1, 4)))
    extra = ""
    if rng.random() < 0.3:
        extra = f"<pre>{_sentence(rng, 3, 6)}\n{_sentence(rng, 3, 6)}</pre>"
    if rng.random() < 0.2:
        extra += ("<div class='tool-output'><pre>"
                  f"{_sentence(rng, 2, 5)}</pre></div>")
    aside = (f"<aside>{_sentence(rng, 3, 8)}</aside>"
             if rng.random() < 0.4 else "")
    foot = "".join(f"<a href='/{w}'>{w}</a> "
                   for w in rng.sample(_WORDS, 3))
    malformed = rng.random() < 0.1
    doc = (f"<html><head><title>{rng.choice(_WORDS)}</title>"
           f"<style>p{{margin:0}}</style></head><body>"
           f"<nav><ul>{nav}</ul></nav>"
           f"<main><h1>{_sentence(rng, 2, 4)}</h1>{paras}{extra}{aside}</main>"
           f"<footer>{foot}</footer></body></html>")
    if malformed:
        doc = doc.replace("</p>", "", 1).replace("</body></html>", "")
    return doc


def make_pdf_payload(rng: random.Random) -> str:
    tokens = []
    n_pages = rng.randint(1, 3)
    two_col = rng.random() < 0.5
    for page in range(n_pages):
        if n_pages > 1:
            tokens.append({"t": "CorpDoc", "x0": 10.0, "y0": 2.0,
                           "x1": 66.0, "y1": 12.0, "page": page})
            tokens.append({"t": f"p{page + 1}", "x0": 250.0, "y0": 395.0,
                           "x1": 270.0, "y1": 405.0, "page": page})
        cols = ([10.0, 310.0] if two_col else [10.0])
        for ci, cx in enumerate(cols):
            n_lines = rng.randint(2, 6)
            for li in range(n_lines):
                x = cx
                y = 60.0 + li * 15.0
                for _ in range(rng.randint(2, 5)):
                    w = rng.choice(_WORDS)
                    tokens.append({"t": w, "x0": x, "y0": y,
                                   "x1": x + 8.0 * len(w), "y1": y + 10.0,
                                   "page": page})
                    x += 8.0 * len(w) + 6.0
    rng.shuffle(tokens)  # generator does not promise input order
    return json.dumps({"kind": "pdf_layout", "tokens": tokens})


def make_plain_payload(rng: random.Random, toolish: bool) -> str:
    parts = []
    if rng.random() < 0.3:
        parts.append(f"# {_sentence(rng, 2, 4)}")
    parts.append(_paragraph(rng))
    if toolish or rng.random() < 0.25:
        parts.append("```\n" + "\n".join(
            _sentence(rng, 3, 7) for _ in range(rng.randint(1, 4))) + "\n```")
    if rng.random() < 0.5:
        parts.append(_paragraph(rng))
    return "\n\n".join(parts)


def make_turn(conv_idx: int, turn_idx: int, seed: int = 42) -> dict:
    """Fully deterministic turn row (independent of partitioning)."""
    rng = random.Random(f"{seed}:{conv_idx}:{turn_idx}")
    role = _ROLES_CYCLE[turn_idx % len(_ROLES_CYCLE)]
    tool = rng.choice(_TOOLS) if role == "tool" else None
    u = rng.random()
    if role == "tool":
        text = (make_plain_payload(rng, toolish=True) if u < 0.6
                else "<div class='tool-output'><pre>"
                     f"{_sentence(rng, 3, 8)}</pre></div>")
    elif u < 0.60:
        text = make_html_payload(rng)
    elif u < 0.80:
        text = make_pdf_payload(rng)
    else:
        text = make_plain_payload(rng, toolish=False)
    return {
        "conv_id": f"conv-{conv_idx:08d}",
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        # epoch seconds; converted to timestamp by the corpus generator
        "ts": 1_700_000_000 + conv_idx * 3600 + turn_idx * 7,
    }


def turns_in_conv(conv_idx: int, seed: int = 42, mega_every: int = 997,
                  mega_turns: int = 2000) -> int:
    """Heavy-tail turns-per-conversation (median ~8, rare mega-convs) to
    exercise skew salting — the data-skew analogue of the reference's
    [1, 700] class weights (/root/reference/batukh/torch/segmenter.py:824-826).
    """
    rng = random.Random(f"{seed}:nturns:{conv_idx}")
    if mega_every and conv_idx % mega_every == mega_every - 1:
        return mega_turns
    n = int(rng.paretovariate(1.3) * 5)
    return max(1, min(n, 400))
