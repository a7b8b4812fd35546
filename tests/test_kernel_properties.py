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


# ---- pure-Python union-find (the CC driver fast path) ----

@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        max_size=60,
    )
)
def test_uf_min_label_matches_bfs(edges):
    """The driver fast path's union-find equals a BFS reference on arbitrary
    edge lists: every node that appears gets the min node id of its
    component (same contract the distributed loop is property-tested to)."""
    from ocrautomator_spark.queries.pipeline_ops import _uf_min_label

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected: dict[int, int] = {}
    seen: set[int] = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            expected[u] = m
    assert dict(_uf_min_label(edges)) == expected
