"""Property-based kernel tests (SURVEY.md §5.4, hypothesis).

(a) totality: never raises on arbitrary text; (d) span validity: in-bounds,
non-overlapping, ordered; idempotence: re-extracting plain output is stable.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocrautomator_spark.kernel import extract_one

# text with a bias toward markup-ish characters to stress the tokenizers
markupish = st.text(
    alphabet=st.sampled_from(list("<>/&;#`*-[]().\n\f \thappyWORDStext=\"'0123456789ü☃")),
    max_size=400,
)


@settings(max_examples=300, deadline=None)
@given(markupish)
def test_total_and_spans_valid(raw):
    r = extract_one(raw)
    prev_end = 0
    for s in r.spans:
        assert 0 <= s.start < s.end <= len(raw)
        assert s.start >= prev_end
        prev_end = s.end
        assert s.kind in ("content", "heading", "code", "list")
    assert r.payload_kind in ("html", "pdf_layout", "mixed_markup", "plain", "error")


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=400))
def test_total_on_arbitrary_unicode(raw):
    r = extract_one(raw)
    assert isinstance(r.extracted_text, str)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(blacklist_categories=("Cc", "Cs")), min_size=1, max_size=80), min_size=1, max_size=5))
def test_plain_extraction_idempotent(paragraphs):
    raw = "\n\n".join(" ".join(p.split()) for p in paragraphs if p.strip())
    first = extract_one(raw)
    if first.payload_kind != "plain":
        return  # markup-looking random text may legitimately route elsewhere
    second = extract_one(first.extracted_text)
    if second.payload_kind == "plain":
        assert second.extracted_text == first.extracted_text
