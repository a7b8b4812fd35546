"""Shared text helpers: normalization (E8) and word statistics."""

from __future__ import annotations

import re
import unicodedata

_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_NL_RUN = re.compile(r"\n{3,}")

# Small English stopword list — used only as a weak tie-break signal in the
# block classifier (E6); the synthetic fixture vocabulary is language-neutral
# so thresholds never *depend* on it (FIXTURES.md §A).
STOPWORDS = frozenset(
    """a an and are as at be but by for from has have if in into is it its of on
    or that the their there these they this to was were will with you your we
    not can which when what who how all also than then so no do does did""".split()
)


def nfc(s: str) -> str:
    # ASCII is NFC-invariant; str.isascii() is a cheap C scan that skips the
    # normalize call for the overwhelmingly common case
    return s if s.isascii() else unicodedata.normalize("NFC", s)


def collapse_ws(s: str) -> str:
    """Collapse horizontal whitespace runs to one space; trim line ends."""
    s = _WS_RUN.sub(" ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    return s.strip()


def normalize_block_text(s: str) -> str:
    """Single-block normalization: all whitespace (incl. newlines) → space.
    C-level equivalent of ``re.sub(r"\\s+", " ", nfc(s)).strip()``."""
    return " ".join(nfc(s).split())


def word_count(s: str) -> int:
    return len(s.split())


def stopword_ratio(s: str) -> float:
    words = [w.strip(".,;:!?()[]\"'").lower() for w in s.split()]
    words = [w for w in words if w]
    if not words:
        return 0.0
    return sum(1 for w in words if w in STOPWORDS) / len(words)
