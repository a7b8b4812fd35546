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


def test_minhash_hot_bucket_cap_bounds_degenerate_corpus(spark):
    """A corpus of k near-identical docs puts all k in every band bucket —
    without the cap the self-join emits ~k² pairs. With MAX_BAND_BUCKET the
    candidate stage drops the degenerate buckets instead of exploding."""
    from ocrautomator_spark.queries import pipeline_ops as po

    k = po.MAX_BAND_BUCKET * 4
    pdf = pd.DataFrame(
        {
            "doc_id": range(k),
            "text": ["alpha beta gamma delta epsilon zeta eta theta"] * k,
        }
    )
    df = spark.createDataFrame(pdf)
    orig = po.T
    try:
        po.T = lambda s, sf, name: df
        n_pairs = po.QUERIES["dedup_minhash_lsh"](spark, "unused").count()
    finally:
        po.T = orig
    # identical docs share identical signatures → every band bucket has k
    # members (> MAX_BAND_BUCKET) → all dropped → zero candidate pairs,
    # rather than k*(k-1)/2 ≈ 32k pairs
    assert n_pairs == 0, f"hot-bucket cap failed: {n_pairs} pairs emitted"


def test_minhash_cap_keeps_small_buckets(spark):
    """Sanity: genuinely small duplicate groups still pair up under the cap."""
    from ocrautomator_spark.queries import pipeline_ops as po

    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "the quick brown fox jumps over the lazy dog near the river bank tonight",
        "completely different words about astronomy telescopes and distant galaxies",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    orig = po.T
    try:
        po.T = lambda s, sf, name: df
        rows = po.QUERIES["dedup_minhash_lsh"](spark, "unused").collect()
    finally:
        po.T = orig
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (0, 1) in pairs, f"near-identical pair not detected: {pairs}"
    assert all(2 not in p for p in pairs)
