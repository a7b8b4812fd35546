"""E1 — payload sniffer.

The reference dispatches work by file extension (image vs PDF; SURVEY.md §2A
A2). Payloads here are strings, so dispatch is by content signals instead:
regex-scored classification into html / pdf_layout / mixed_markup / plain.
Deterministic and total over arbitrary strings.
"""

from __future__ import annotations

import re

from ocrautomator_spark.kernel.types import PK_HTML, PK_MIXED, PK_PDF, PK_PLAIN

_DOCTYPE = re.compile(r"<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>]", re.I)
_BLOCK_TAG = re.compile(r"<(?:p|div|ul|ol|li|h[1-6]|table|nav|footer|header|article|section|blockquote|pre)[\s>/]", re.I)
_ANY_TAG = re.compile(r"</?[a-zA-Z][a-zA-Z0-9]*(?:\s[^<>]*)?>")
_MD_HEADING = re.compile(r"^#{1,6}\s+\S", re.M)
_MD_FENCE = re.compile(r"^```", re.M)
_MD_LIST = re.compile(r"^(?:[-*+]|\d+\.)\s+\S", re.M)
_PAGE_MARKER = re.compile(r"^[ \t]*page\s+\d+(\s+of\s+\d+)?[ \t]*$", re.I | re.M)
_HYPHEN_BREAK = re.compile(r"[a-z]-\n[a-z]")


def sniff(text: str) -> str:
    """Classify a raw payload. Precedence: html > mixed_markup > pdf_layout >
    plain. Hot path: every full-text regex scan is gated behind a C-level
    substring test for a character the pattern requires, so the common plain
    payload pays only cheap `in` checks — decisions are identical to the
    ungated version (every gated pattern literally requires the gate char)."""
    if not text or not text.strip():
        return PK_PLAIN

    has_lt = "<" in text
    # ≥2 block-level tags: even a two-paragraph fragment routes through the
    # HTML path (a single stray tag in prose stays plain)
    if has_lt:
        if _DOCTYPE.search(text):
            return PK_HTML
        n_block = 0
        for _ in _BLOCK_TAG.finditer(text):  # stop at 2, don't findall
            n_block += 1
            if n_block >= 2:
                return PK_HTML

    md_signals = len(_MD_HEADING.findall(text)) if "#" in text else 0
    if md_signals < 2 and "```" in text:
        md_signals += len(_MD_FENCE.findall(text))
    if md_signals < 2:
        md_signals += len(_MD_LIST.findall(text))
    if md_signals >= 2 or (md_signals >= 1 and has_lt and _ANY_TAG.search(text)):
        return PK_MIXED

    if (
        "\f" in text
        or _PAGE_MARKER.search(text)
        or ("-\n" in text and len(_HYPHEN_BREAK.findall(text)) >= 2)
    ):
        return PK_PDF

    # many hard-wrapped mid-sentence lines ⇒ pdf-style layout
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if len(lines) >= 4:
        wrapped = sum(
            1
            for ln in lines[:-1]
            if 45 <= len(ln) <= 90 and not ln.rstrip().endswith((".", "!", "?", ":", ";"))
        )
        if wrapped / len(lines) > 0.5:
            return PK_PDF

    return PK_PLAIN
