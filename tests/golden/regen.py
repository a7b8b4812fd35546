"""Regenerate golden extraction fixtures (SURVEY.md §5.5).

Run manually after an INTENTIONAL kernel change, review the diff, and bump
EXTRACTOR_VERSION:  python tests/golden/regen.py
"""

from __future__ import annotations

import json
import pathlib

from ocrautomator_spark.kernel import EXTRACTOR_VERSION, extract_one
from ocrautomator_spark.synth.transcripts import make_payload

GOLDEN = pathlib.Path(__file__).parent / "kernel_golden.json"

# (conv_id, turn_idx) pairs chosen to cover all 4 payload classes ×4 each
CASES = [
    ("conv00000000", 1), ("conv00000001", 2), ("conv00000001", 3), ("conv00000001", 5),  # html
    ("conv00000000", 0), ("conv00000002", 1), ("conv00000003", 1), ("conv00000003", 4),  # pdf_layout
    ("conv00000000", 3), ("conv00000000", 4), ("conv00000000", 5), ("conv00000001", 0),  # mixed_markup
    ("conv00000000", 2), ("conv00000002", 2), ("conv00000003", 3), ("conv00000004", 3),  # plain
]

# Literal structural-HTML cases pinning the segmenter's behavior on the
# constructs the synth corpus under-exercises: nested lists, data tables
# (thead/tbody, one block per table, rows newline-joined), blockquotes,
# definition lists, figure/figcaption. Keyed as ("literal", i).
LITERAL_CASES = [
    # nested unordered/ordered lists: one list-kind block per <li> text run,
    # inner items flushed at their own boundaries
    "<html><body><p>The following ten items describe the complete deployment "
    "procedure for the staging cluster environment today.</p><ul><li>first "
    "outer item with enough words here</li><li>second outer item"
    "<ol><li>inner numbered one</li><li>inner numbered two</li></ol>"
    "tail text of the second outer item</li><li>third outer item</li></ul>"
    "<p>A closing paragraph with plenty of additional words so the block "
    "classifier keeps the surrounding prose as content.</p></body></html>",
    # data table: whole table is ONE candidate block; cells space-joined,
    # rows newline-joined; a data table inside a turn payload is content
    "<html><body><p>Quarterly results are summarized in the table below "
    "with revenue and headcount for each regional office this year.</p>"
    "<table><thead><tr><th>region</th><th>revenue</th><th>headcount</th></tr></thead>"
    "<tbody><tr><td>north</td><td>1200</td><td>38</td></tr>"
    "<tr><td>south</td><td>950</td><td>31</td></tr>"
    "<tr><td>west</td><td>1410</td><td>44</td></tr></tbody></table>"
    "<p>Revenue figures are in thousands and exclude the one-time licensing "
    "settlement recorded during the second quarter.</p></body></html>",
    # link-farm layout table: dies on link ratio even though it is a table
    "<html><body><p>Some genuine prose content appears here with enough "
    "words to be kept as the main content block of this page.</p>"
    "<table><tr><td><a href='/a'>Home</a></td><td><a href='/b'>About</a></td>"
    "<td><a href='/c'>Products</a></td><td><a href='/d'>Contact</a></td></tr></table>"
    "</body></html>",
    # blockquote: block-level boundary, quoted prose kept as content
    "<html><body><p>The reviewer summarized the decision in the following "
    "quoted passage from the original architecture document.</p>"
    "<blockquote>The system shall remain available during any single "
    "availability zone failure without operator intervention.</blockquote>"
    "<p>Everyone agreed that the quoted requirement was the binding "
    "constraint for the final design review meeting.</p></body></html>",
    # definition list + figure/figcaption
    "<html><body><dl><dt>latency</dt><dd>time from request arrival to the "
    "first byte of the response under nominal load</dd><dt>throughput</dt>"
    "<dd>sustained requests per second at the target error budget</dd></dl>"
    "<figure><figcaption>Figure 3: tail latency distribution across the "
    "three replication strategies measured in production.</figcaption></figure>"
    "</body></html>",
]


def main() -> None:
    out = {"extractor_version": EXTRACTOR_VERSION, "cases": []}
    kinds: dict[str, int] = {}
    for conv_id, turn_idx in CASES:
        raw = make_payload(conv_id, turn_idx)
        r = extract_one(raw)
        kinds[r.payload_kind] = kinds.get(r.payload_kind, 0) + 1
        out["cases"].append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "raw": raw,
                "payload_kind": r.payload_kind,
                "extracted_text": r.extracted_text,
                "spans": [list(s) for s in r.spans],
            }
        )
    for i, raw in enumerate(LITERAL_CASES):
        r = extract_one(raw)
        kinds[r.payload_kind] = kinds.get(r.payload_kind, 0) + 1
        out["cases"].append(
            {
                "conv_id": "literal",
                "turn_idx": i,
                "raw": raw,
                "payload_kind": r.payload_kind,
                "extracted_text": r.extracted_text,
                "spans": [list(s) for s in r.spans],
            }
        )
    GOLDEN.write_text(json.dumps(out, indent=1, ensure_ascii=False))
    print(f"wrote {len(CASES) + len(LITERAL_CASES)} cases, class coverage: {kinds}")


if __name__ == "__main__":
    main()
