"""Golden-file tests (SURVEY.md §5.5): frozen (raw → extracted text/spans)
pairs make kernel changes reviewable as diffs. Regenerate deliberately with
tests/golden/regen.py and bump EXTRACTOR_VERSION."""

from __future__ import annotations

import json
import pathlib

import pytest

from ocrautomator_spark.kernel import EXTRACTOR_VERSION, extract_one

GOLDEN = pathlib.Path(__file__).parent / "golden" / "kernel_golden.json"
DATA = json.loads(GOLDEN.read_text())


def test_golden_version_matches():
    assert DATA["extractor_version"] == EXTRACTOR_VERSION, (
        "kernel changed without regenerating goldens + bumping EXTRACTOR_VERSION"
    )


def test_golden_covers_all_payload_classes():
    kinds = {c["payload_kind"] for c in DATA["cases"]}
    assert kinds == {"html", "pdf_layout", "mixed_markup", "plain"}


@pytest.mark.parametrize("case", DATA["cases"], ids=lambda c: f"{c['conv_id']}:{c['turn_idx']}")
def test_golden_case(case):
    r = extract_one(case["raw"])
    assert r.payload_kind == case["payload_kind"]
    assert r.extracted_text == case["extracted_text"]
    assert [list(s) for s in r.spans] == case["spans"]
