"""Pinned text canonicalization.

The single place where text normalization happens, shared by the oracle and
every Spark kernel — the analogue of the reference's shape normalization to
floor-multiples of 32 (`/root/reference/batukh/tensorflow/utils/data/
dataloader.py:66-67`), which likewise pins ONE canonical form so that every
downstream stage agrees.
"""

import re
import unicodedata

_WS_RE = re.compile("[ \t\r\n\f\v\u00a0]+")


def canonicalize(s: str) -> str:
    """NFC-normalize, fold NBSP into space, collapse whitespace runs, strip."""
    if not s:
        return ""
    if not s.isascii():  # NFC is the identity on ASCII — skip the call
        s = unicodedata.normalize("NFC", s)
    return _WS_RE.sub(" ", s).strip()


def word_count(s: str) -> int:
    """Number of whitespace-separated words in an already-canonical string."""
    return len(s.split()) if s else 0
