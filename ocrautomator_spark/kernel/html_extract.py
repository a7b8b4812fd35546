"""E2–E6 — HTML tokenizer, block segmenter, scorer, classifier.

Shallow-text-feature main-content extraction in the Boilerpipe/jusText family
(public literature), per the north_star mandate (BASELINE.json:6): tag-density
scoring, link-text ratio, block-level content classification with neighbor
smoothing. Pure Python, deterministic, total over arbitrary strings; replaces
ocrAutomator's per-document Tesseract call (SURVEY.md §2A A6) as the "core
map" run inside one mapInPandas stage.
"""

from __future__ import annotations

import html as _html
import re

from ocrautomator_spark.kernel.textutil import stopword_ratio, word_count
from ocrautomator_spark.kernel.types import (
    KIND_CODE,
    KIND_CONTENT,
    KIND_HEADING,
    KIND_LIST,
    Block,
)

# ---- classifier thresholds (frozen named constants; bump EXTRACTOR_VERSION
# in extractor.py whenever any of these change — SURVEY.md §7 M0) ----
MAX_LINK_RATIO = 0.40          # above ⇒ boilerplate regardless of length
GOOD_WORDS = 10                # at/above with low link ratio ⇒ content
GOOD_LINK_RATIO = 0.30         # "low link ratio" bound for the rule above
MIN_WORDS = 3                  # below ⇒ boilerplate (unless heading/code)
CHROME_RESCUE_WORDS = 20       # block inside nav/footer/aside/header needs this
CHROME_RESCUE_LINK_RATIO = 0.20
STOPWORD_BONUS = 0.30          # stopword ratio ≥ this lets a 'near' block lean content
HEADING_LOOKAHEAD = 3          # heading kept if content within next N blocks

BLOCK_TAGS = frozenset(
    "p div ul ol li h1 h2 h3 h4 h5 h6 table thead tbody tr td th blockquote pre "
    "article section nav aside header footer main form fieldset dl dt dd hr "
    "figure figcaption address title".split()
)
SKIP_TAGS = frozenset("script style noscript head svg template iframe".split())
CHROME_TAGS = frozenset("nav aside footer header".split())
TABLE_STRUCTURE_TAGS = frozenset("thead tbody tfoot tr td th caption colgroup col".split())
VOID_TAGS = frozenset("br img hr input meta link area base col embed source track wbr".split())
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6 title".split())

_TOKEN = re.compile(r"<!--.*?(?:-->|$)|<!\[CDATA\[.*?(?:\]\]>|$)|<[^>]*>|[^<]+", re.S)
_TAG_NAME = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9-]*)")
_WS_ANY = re.compile(r"\s+")
# Single-pass tokenizer for the hot loop: group 1 captures a well-formed
# tag's name in the same pass (token extents are IDENTICAL to _TOKEN: the
# named-tag alternative and the generic <[^>]*> both stop at the first '>',
# so dispatch never changes — only the per-tag second regex pass and the
# token-string allocation are saved). Group 2 is a text run.
_TOKEN_FAST = re.compile(
    r"<!--.*?(?:-->|$)|<!\[CDATA\[.*?(?:\]\]>|$)|"
    r"</?\s*([a-zA-Z][a-zA-Z0-9-]*)[^>]*>|<[^>]*>|([^<]+)",
    re.S,
)


# Bounded memo for the (unescape + whitespace-collapse) normalization of
# text-run tokens OUTSIDE <pre>. Web corpora repeat boilerplate runs
# massively (nav labels, footer strings — this corpus measures 4.2 tokens
# per distinct run, real crawls are far more repetitive), so the common case
# becomes one dict hit. The transformation is a pure function of the token,
# so caching cannot change behavior; the cap bounds executor memory on
# adversarial all-distinct input, trading hit rate, never correctness.
_RUN_MEMO: dict[str, str] = {}
_RUN_MEMO_CAP = 200_000


def segment_html(raw: str) -> list[Block]:
    """Tokenize raw HTML and group text runs into scored candidate blocks.

    This is the kernel's hottest loop (≈60% of per-turn time at 10^12-turn
    scale), so it is written allocation-lean: block state lives in closure
    locals rather than an object, the parts list is reused across blocks
    (bound ``append``), and source spans are tracked as four scalars — only
    the FIRST and LAST part spans ever matter to the flush trim — instead of
    a tuple per text part. Behavior is bit-identical to the original
    object-based segmenter (pinned by goldens + the distributed equality
    harness).
    """
    blocks: list[Block] = []
    blocks_append = blocks.append
    parts: list[str] = []
    parts_append = parts.append
    parts_clear = parts.clear
    n_link_chars = 0
    n_inline_tags = 0
    kind = KIND_CONTENT
    kind_set = False
    in_chrome = False
    n_spans = 0
    first_start = first_end = last_start = last_end = 0

    def flush() -> None:
        nonlocal n_link_chars, n_inline_tags, kind, kind_set, in_chrome, n_spans
        # callers gate on `parts` non-empty; empty-state reset is inlined there
        text = "".join(parts)
        stripped = text.strip()
        if stripped:
            # trim offsets to the non-whitespace extent of the block;
            # leading/trailing ws may live entirely in first/last part — the
            # adjustment is approximate only when entities shift lengths,
            # which never moves offsets outside the true source region.
            # (the stripped block's first occurrence in text IS at the lead
            # offset — one C find instead of lstrip+rstrip allocations)
            lead = text.find(stripped)
            trail = len(text) - lead - len(stripped)
            start = first_start
            end = last_end
            # inline conditional min/max: these four clamps run ~6 times per
            # document and builtins.min/max were ~4% of kernel tottime
            fl = first_end - first_start - 1
            if fl < 0:
                fl = 0
            if fl > lead:
                fl = lead
            start += fl
            ll = last_end - last_start - 1
            if ll < 0:
                ll = 0
            if ll > trail:
                ll = trail
            end -= ll
            if start >= end:  # degenerate after trimming; fall back
                start, end = first_start, last_end
            n_chars = len(stripped)
            blocks_append(
                Block(
                    text=text,
                    start=start,
                    end=end,
                    kind=kind,
                    n_words=len(stripped.split()),
                    n_chars=n_chars,
                    n_link_chars=n_link_chars if n_link_chars < n_chars else n_chars,
                    n_inline_tags=n_inline_tags,
                    label="chrome" if in_chrome else "",
                )
            )
        parts_clear()
        n_spans = 0
        n_link_chars = 0
        n_inline_tags = 0
        kind = KIND_CONTENT
        kind_set = False
        in_chrome = False

    skip_depth = 0
    a_depth = 0
    pre_depth = 0
    heading_depth = 0
    li_depth = 0
    chrome_depth = 0
    table_depth = 0

    for m in _TOKEN_FAST.finditer(raw):
        last = m.lastindex
        if last == 2:
            # text run — the common case, handled first
            if skip_depth:
                continue
            tok = m[2]
            if pre_depth == 0:
                text = _RUN_MEMO.get(tok)
                if text is None:
                    text = _html.unescape(tok) if "&" in tok else tok
                    # C-level equivalent of _WS_ANY.sub(" ", text): collapse
                    # all (unicode) whitespace runs to single spaces,
                    # preserving one-space boundaries at the ends
                    mid = " ".join(text.split())
                    if mid:
                        if text[0].isspace():
                            mid = " " + mid
                        if text[-1].isspace():
                            mid += " "
                        text = mid
                    elif text:
                        text = " "
                    if len(_RUN_MEMO) >= _RUN_MEMO_CAP:
                        _RUN_MEMO.clear()
                    _RUN_MEMO[tok] = text
            else:
                text = _html.unescape(tok) if "&" in tok else tok
            if not text:
                continue
            if not kind_set and not text.isspace():
                if pre_depth:
                    kind = KIND_CODE
                elif heading_depth:
                    kind = KIND_HEADING
                elif li_depth or table_depth:
                    kind = KIND_LIST
                kind_set = True
                in_chrome = chrome_depth > 0
            parts_append(text)
            if n_spans:
                last_start, last_end = m.span()
                n_spans += 1
            else:
                first_start, first_end = last_start, last_end = m.span()
                n_spans = 1
            if a_depth > 0:
                n_link_chars += len(text.strip())
            continue
        if last is None:
            continue  # comment / doctype / CDATA / PI / malformed tag
        name = m[1]
        if not name.islower():  # already-lowercase names skip the alloc
            name = name.lower()
        closing = raw[m.start() + 1] == "/"
        # tag tokens always end with ">" (the regex guarantees it), so the
        # original `tok.rstrip().endswith("/>")` reduces to one char test
        selfclosing = raw[m.end() - 2] == "/" or name in VOID_TAGS

        if name in SKIP_TAGS:
            if selfclosing:
                continue
            if closing:
                if skip_depth:
                    skip_depth -= 1
            else:
                skip_depth += 1
            continue
        if skip_depth:
            continue

        if table_depth and name in TABLE_STRUCTURE_TAGS:
            # inside a <table>, structural tags are cell/row separators, not
            # block boundaries: the whole table becomes ONE candidate block
            # (a data table in a turn payload is content; a link-farm layout
            # table still dies on link ratio)
            if parts:
                if closing and name == "tr":
                    parts_append("\n")
                elif closing or name in ("td", "th"):
                    parts_append(" ")
            continue
        if name in BLOCK_TAGS:
            if parts:
                flush()
            elif n_inline_tags or kind_set:
                # inlined empty-block reset (the old flush fast path)
                n_inline_tags = 0
                n_link_chars = 0
                kind = KIND_CONTENT
                kind_set = False
                in_chrome = False
            if not selfclosing:
                d = -1 if closing else 1
                if name in CHROME_TAGS:
                    chrome_depth = chrome_depth + d if chrome_depth + d > 0 else 0
                elif name == "pre":
                    pre_depth = pre_depth + d if pre_depth + d > 0 else 0
                elif name in HEADING_TAGS:
                    heading_depth = heading_depth + d if heading_depth + d > 0 else 0
                elif name == "li":
                    li_depth = li_depth + d if li_depth + d > 0 else 0
                elif name == "table":
                    table_depth = table_depth + d if table_depth + d > 0 else 0
        else:
            if name == "a" and not selfclosing:
                if closing:
                    if a_depth:
                        a_depth -= 1
                else:
                    a_depth += 1
            if name == "br":
                parts_append("\n" if pre_depth else " ")
                if n_spans:
                    # extends the LAST part span; when only one span exists
                    # the last span IS the first, so both ends move
                    last_end = m.end()
                    if n_spans == 1:
                        first_end = last_end
                continue
            if not closing:
                n_inline_tags += 1
    if parts:
        flush()
    return blocks


def link_ratio(b: Block) -> float:
    """E5 — chars inside <a> ÷ total chars of the block."""
    return b.n_link_chars / b.n_chars if b.n_chars else 0.0


def tag_density(b: Block) -> float:
    """E4 — inline tags ÷ (inline tags + words)."""
    denom = b.n_inline_tags + b.n_words
    return b.n_inline_tags / denom if denom else 0.0


def classify_blocks(blocks: list[Block]) -> list[Block]:
    """E6 — label each block content/boilerplate with neighbor smoothing;
    return kept blocks in document order."""
    for b in blocks:
        chrome = b.label == "chrome"
        lr = link_ratio(b)
        if b.kind == KIND_CODE:
            b.label = "content" if b.n_chars > 0 else "boilerplate"
        elif b.kind == KIND_HEADING:
            b.label = "near" if (b.n_words >= 1 and lr <= MAX_LINK_RATIO and not chrome) else "boilerplate"
        elif chrome and not (b.n_words >= CHROME_RESCUE_WORDS and lr < CHROME_RESCUE_LINK_RATIO):
            b.label = "boilerplate"
        elif lr > MAX_LINK_RATIO:
            b.label = "boilerplate"
        elif b.n_words >= GOOD_WORDS and lr <= GOOD_LINK_RATIO:
            b.label = "content"
        elif b.n_words < MIN_WORDS:
            b.label = "boilerplate"
        else:
            b.label = "near"
            if stopword_ratio(b.text) >= STOPWORD_BONUS and lr <= GOOD_LINK_RATIO:
                b.label = "lean"  # near, leaning content

    # neighbor smoothing: a near block adjacent (ignoring headings) to a
    # content block on either side becomes content; 'lean' needs one side,
    # plain 'near' needs a content neighbor too but not between two boiler.
    n = len(blocks)
    body = [b for b in blocks if b.kind != KIND_HEADING]

    def _neighbor_content(i: int, direction: int) -> bool:
        j = i + direction
        while 0 <= j < len(body):
            if body[j].label == "content":
                return True
            if body[j].label == "boilerplate":
                return False
            j += direction
        return False

    was_near: list[Block] = []
    for i, b in enumerate(body):
        if b.label in ("near", "lean"):
            was_near.append(b)
            if _neighbor_content(i, -1) or _neighbor_content(i, +1):
                b.label = "content"
            elif b.label == "lean" and b.n_words >= MIN_WORDS:
                b.label = "content"
            else:
                b.label = "boilerplate"

    # transcript-domain rescue: a webpage with ONLY short blocks is chrome,
    # but a turn payload whose every block is short IS the message — if
    # nothing survived, keep the plausible near blocks rather than nothing
    if not any(b.label == "content" for b in body):
        for b in was_near:
            if b.n_words >= MIN_WORDS and link_ratio(b) <= GOOD_LINK_RATIO:
                b.label = "content"

    # headings survive only when content follows within HEADING_LOOKAHEAD
    for i, b in enumerate(blocks):
        if b.kind == KIND_HEADING and b.label == "near":
            window = blocks[i + 1 : i + 1 + HEADING_LOOKAHEAD]
            b.label = "content" if any(x.label == "content" for x in window) else "boilerplate"

    _ = n  # document-order length retained for future windowed rules
    return [b for b in blocks if b.label == "content"]
