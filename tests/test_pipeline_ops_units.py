"""Unit-level checks for pipeline operators whose semantics the DuckDB oracle
can't express (rows-only rows in SURVEY.md §2B): language ID on real-language
fixtures, simhash banding guarantee, LSH hyperplane determinism."""

from __future__ import annotations

import pandas as pd

from ocrautomator_spark.queries.pipeline_ops import _LANG_PROFILES, _hyperplanes


def test_lang_profiles_cover_testdata_langs():
    assert set(_LANG_PROFILES) == {"en", "de", "es", "fr", "zh"}


def test_lang_id_on_real_sentences(spark):
    samples = {
        "en": "The weather in the north of the country was colder than they expected this year.",
        "de": "Die schnellen Entwicklungen in der deutschen Industrie überraschten die internationalen Beobachter.",
        "es": "La ciudad de los ángeles es conocida por el cine y la industria del entretenimiento.",
        "fr": "Les enfants de la ville sont allés à l'école sous la pluie ce matin.",
        "zh": "我们的中国人民在这个国家有很多的好朋友。",
    }
    pdf = pd.DataFrame(
        {"doc_id": range(len(samples)), "lang": list(samples), "text": list(samples.values())}
    )
    df = spark.createDataFrame(pdf)

    # reuse the same pandas UDF the query uses, over a temp view shim
    from ocrautomator_spark.queries import pipeline_ops as po

    orig = po.T
    try:
        po.T = lambda s, sf, name: df  # the lang_id query reads only `documents`
        out = {r["lang"]: r["lang_pred"] for r in po.QUERIES["lang_id"](spark, "unused").collect()}
    finally:
        po.T = orig
    correct = sum(1 for k, v in out.items() if k == v)
    assert correct >= 4, f"language ID too weak on real text: {out}"


def test_hyperplanes_deterministic_and_spread():
    a = _hyperplanes(64)
    b = _hyperplanes(64)
    assert a == b
    flat = [x for row in a for x in row]
    assert all(-1.0 <= x <= 1.0 for x in flat)
    assert abs(sum(flat) / len(flat)) < 0.1  # roughly centered


def test_simhash_band_guarantee():
    # hamming distance ≤ 3 ⇒ at least one of 4 16-bit bands identical
    import itertools
    import random

    rnd = random.Random(7)
    for _ in range(200):
        sig = rnd.getrandbits(64)
        flips = rnd.sample(range(64), 3)
        other = sig
        for f in flips:
            other ^= 1 << f
        bands_a = [(sig >> (16 * i)) & 0xFFFF for i in range(4)]
        bands_b = [(other >> (16 * i)) & 0xFFFF for i in range(4)]
        assert any(x == y for x, y in zip(bands_a, bands_b))
    _ = itertools
