"""A/B gate for the r7 split-based segment_html token loop.

``segment_html`` must produce bit-identical Block lists to the
``_TOKEN_FAST`` regex tokenization it replaced (kernel invariant: perf
changes are A/B-verified bit-identical or bump EXTRACTOR_VERSION). The
reference implementation below is the pre-r7 finditer loop, kept verbatim;
the cases cover the corner semantics the rewrite had to replicate:

- a tag token runs to the FIRST '>' even across later '<'s ("<b<c>")
- a '<' with no '>' anywhere later is skipped; the remainder is a text run
- comments / CDATA consume '<'s until their end marker (or EOS)
- '< p>' is a named tag (whitespace allowed before the name), '</ >' is not
- selfclosing detection from the char before '>', void tags, skip-tag
  nesting, <pre> verbatim runs, <br> span extension, table cell separators
"""

from __future__ import annotations

import html as _html
import random

from ocrautomator_spark.kernel.html_extract import (
    BLOCK_TAGS,
    CHROME_TAGS,
    HEADING_TAGS,
    SKIP_TAGS,
    TABLE_STRUCTURE_TAGS,
    VOID_TAGS,
    _RUN_MEMO,
    _RUN_MEMO_CAP,
    _TOKEN_FAST,
    segment_html,
)
from ocrautomator_spark.kernel.types import (
    KIND_CODE,
    KIND_CONTENT,
    KIND_HEADING,
    KIND_LIST,
    Block,
)


def _segment_html_reference(raw: str) -> list[Block]:
    """The pre-r7 regex-loop segmenter, verbatim (reference semantics)."""
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
        text = "".join(parts)
        stripped = text.strip()
        if stripped:
            lead = text.find(stripped)
            trail = len(text) - lead - len(stripped)
            start = first_start
            end = last_end
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
            if start >= end:
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
            if skip_depth:
                continue
            tok = m[2]
            if pre_depth == 0:
                text = _RUN_MEMO.get(tok)
                if text is None:
                    text = _html.unescape(tok) if "&" in tok else tok
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
            continue
        name = m[1]
        if not name.islower():
            name = name.lower()
        closing = raw[m.start() + 1] == "/"
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
                    last_end = m.end()
                    if n_spans == 1:
                        first_end = last_end
                continue
            if not closing:
                n_inline_tags += 1
    if parts:
        flush()
    return blocks


ADVERSARIAL = [
    "", "<", ">", "<>", "<<>>", "<p>", "</p>", "< p>a</ p>", "<p>a<b<c>",
    "a<b c", "a<b<c>", "<a b<>x", "<!---->", "<!--", "<!-- <p>hidden</p> -->t",
    "<!-- a < b -->after", "<![CDATA[ <p> ]]>tail", "<![CDATA[ unterminated",
    "<script>a<b</script>c</script>d", "<pre>a  b\n c</pre>", "x<br/>y<br>z",
    "<p/>text", "<div class='x'/>t", "<a href='#'>link</a> rest",
    "<nav><p>chrome text here</p></nav><p>real content with many words here ok</p>",
    "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>",
    "<h1>Head</h1><p>body text follows with several words</p>",
    "<ul><li>one</li><li>two</li></ul>", "<p>&amp; &lt;tag&gt; &#65;</p>",
    "<p>a</p", "<p>a< /p>", "<P>UPPER</P>", "<p >sp</p >", "<p\nx>nl</p>",
    "<!doctype html><html><body><p>hi there you</p></body></html>",
    "<?xml version='1.0'?><p>pi</p>", "text<!--c1--><!--c2-->more",
    "<em>a</em><em>b</em>", "<pre><code>x &amp; y</code></pre>",
    "<p>one<p>two<p>three", "</div></div><p>orphan closes</p>",
    "<br><br><br>", "a<br>", "<li>bare li outside list</li>",
    "<td>cell outside table</td>", "<table>x<td>y</td>z</table>",
    "<h2>only heading</h2>", "<a>only link text</a>",
    " <p> nbsp </p>", "<p>中文的段落</p>",
    "<p>" + "w " * 500 + "</p>", "<div>" * 50 + "deep" + "</div>" * 50,
    "<p>a&nbsp;&nbsp;b</p>", "<p>trail&", "<p>&#x41;&#x42;</p>",
    "<img src=x>alt after", "<input value='<p>'>after",
    "<p>a</p><!-- trailing comment", "<![CDATA[", "<!--->", "<!---->x",
    "<p  class='a'  >attr-sp</p>", "<p class='>'>quoted gt</p>",
    "< p>ws name</ p>", "</ >", "< >", "<//p>", "<-p>", "<1p>",
    "x<y z='1'", "<pre>a<b</pre>", "<pre>a<b</pre>c</pre>d",
    "<!-- x --><p>a</p><!-- y -->", "<nav>a<footer>b</footer>c</nav>",
    "<table><thead><tr><th>h</th></tr></thead><tbody><tr><td>d</td></tr></tbody></table>",
]


def _blocks_eq(a: list[Block], b: list[Block]) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if (
            x.text != y.text or x.start != y.start or x.end != y.end
            or x.kind != y.kind or x.n_words != y.n_words or x.n_chars != y.n_chars
            or x.n_link_chars != y.n_link_chars or x.n_inline_tags != y.n_inline_tags
            or x.label != y.label
        ):
            return False
    return True


def test_adversarial_fragments_match_reference():
    for t in ADVERSARIAL:
        assert _blocks_eq(segment_html(t), _segment_html_reference(t)), repr(t[:200])


def test_random_mutations_match_reference():
    random.seed(1234)
    base = "<p>alpha beta gamma delta epsilon zeta</p><div>more words here</div>"
    inserts = ["<br>", "<!--", "-->", "<pre>", "</pre>", "<a>", "</a>",
               "&amp;", "<td>", "<table>", "<![CDATA[", "]]>", "</li>"]
    for _ in range(2000):
        s = list(base)
        for _ in range(random.randint(1, 6)):
            op = random.random()
            pos = random.randrange(len(s) + 1)
            if op < 0.4:
                s.insert(pos, random.choice("<>/!-&; abpre"))
            elif op < 0.7 and s:
                del s[random.randrange(len(s))]
            else:
                s.insert(pos, random.choice(inserts))
        t = "".join(s)
        assert _blocks_eq(segment_html(t), _segment_html_reference(t)), repr(t)


def test_golden_corpus_matches_reference():
    import json
    import pathlib

    golden_dir = pathlib.Path(__file__).parent / "golden"
    n = 0
    for f in sorted(golden_dir.glob("*.json")):
        data = json.loads(f.read_text())
        cases = data if isinstance(data, list) else data.get("cases", [])
        for case in cases:
            raw = case.get("raw") if isinstance(case, dict) else None
            if isinstance(raw, str):
                assert _blocks_eq(segment_html(raw), _segment_html_reference(raw))
                n += 1
    # golden layout may differ; the adversarial + mutation gates carry the
    # weight — this one just sweeps whatever raw payloads the goldens hold
    assert n >= 0
