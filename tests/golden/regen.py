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
    GOLDEN.write_text(json.dumps(out, indent=1, ensure_ascii=False))
    print(f"wrote {len(CASES)} cases, class coverage: {kinds}")


if __name__ == "__main__":
    main()
