"""Curation operators: semantic units + the plan shapes that make them
scale (narrow-map repetition stats, broadcast decontamination join,
single-scan funnel)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from ocrautomator_spark.queries.curation import (
    EVAL_MOD,
    QUERIES as CQ,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------------- plan shape

def test_repetition_stats_is_pure_narrow_map(spark):
    """All stats come from array HOFs — the plan must contain no exchange of
    any kind: scan -> project, nothing else."""
    plan = _plan(CQ["curation_repetition_stats"](spark, SF_DIR))
    assert "Exchange" not in plan, "repetition stats must not shuffle"


def test_decontaminate_joins_broadcast_never_smj(spark):
    """The eval gram set is the broadcast side; the 100 TB train side must
    never sort-merge against it."""
    plan = _plan(CQ["curation_decontaminate"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_funnel_single_scan_no_hash_exchange(spark):
    """One narrow map + one single-row agg: the only allowed exchange is the
    SinglePartition gather for the global aggregate — never a
    hashpartitioning shuffle, and only one parquet scan."""
    plan = _plan(CQ["curation_filter_funnel"](spark, SF_DIR))
    assert "hashpartitioning" not in plan
    # formatted explain prints each node in the tree AND the detail section
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "partial_" in plan, "flag counting must partial-agg map-side"


def test_term_df_dedups_before_explode(spark):
    """(doc, term) dedup must happen map-side via array_distinct, so the plan
    has exactly one hash exchange (the groupBy(term)) and no global
    distinct shuffle on exploded pairs."""
    plan = _plan(CQ["curation_term_df"](spark, SF_DIR))
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "array_distinct" in plan


# --------------------------------------------------------------- semantics

def test_funnel_is_monotone_and_anchored(spark):
    rows = {r["stage"]: r["n_docs"] for r in CQ["curation_filter_funnel"](spark, SF_DIR).collect()}
    stages = sorted(rows)
    assert stages[0] == "0_ingest"
    counts = [rows[s] for s in stages]
    assert all(a >= b for a, b in zip(counts, counts[1:])), f"funnel not monotone: {counts}"
    assert counts[0] > counts[-1] > 0, "thresholds must bite without emptying the corpus"


def test_decontaminate_covers_all_train_docs_and_flags_planted(spark):
    """Every non-eval doc appears exactly once; a doc that IS a verbatim
    copy of an eval doc must be flagged with every gram hit."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    eval_text = docs.filter(F.col("doc_id") % EVAL_MOD == 0).select("text").first()["text"]
    n_train = docs.filter(F.col("doc_id") % EVAL_MOD != 0).count()

    out = CQ["curation_decontaminate"](spark, SF_DIR)
    assert out.count() == n_train
    assert out.select("doc_id").distinct().count() == n_train

    # plant: write a temp view path is overkill — instead verify the flag on
    # the real corpus doc sharing the most grams, and that an eval doc's own
    # grams would all hit (identity check through the same gram builder).
    from ocrautomator_spark.queries.pipeline_ops import _word_ngrams

    planted = spark.createDataFrame([(999_999, eval_text)], "doc_id long, text string")
    n_grams = _word_ngrams(planted, 3).count()
    assert n_grams > 0
    # all grams of a verbatim eval copy are by construction in the eval set;
    # run the join logic inline on the planted frame
    grams = _word_ngrams(docs.select("doc_id", "text"), 3)
    eval_g = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0).select("gram").distinct()
    )
    hits = (
        _word_ngrams(planted, 3)
        .join(F.broadcast(eval_g), "gram", "left_semi")
        .count()
    )
    assert hits == n_grams, "verbatim eval copy must hit on every gram"


def test_repetition_stats_pin_known_doc(spark):
    """Hand-checkable doc: 'a a b c' -> n_words 4, distinct 3/4, top 2/4,
    bigrams [a a, a b, b c] all distinct -> dup fraction 0."""
    df = spark.createDataFrame([(1, "a a b c")], "doc_id long, text string")
    df.createOrReplaceTempView("_rep_pin")
    import ocrautomator_spark.queries.curation as cur

    words = F.split("text", " ")
    n_words, n_distinct, top_cnt = cur._word_stats_cols(words)
    n_2g, n_2g_d = cur._bigram_cols(words)
    r = df.select(
        n_words.alias("nw"), n_distinct.alias("nd"), top_cnt.alias("tc"),
        n_2g.alias("g"), n_2g_d.alias("gd"),
    ).first()
    assert (r["nw"], r["nd"], r["tc"], r["g"], r["gd"]) == (4, 3, 2, 3, 3)


def test_sample_stratified_is_narrow_deterministic_and_rate_sane(spark):
    from ocrautomator_spark.queries.curation import SAMPLE_THRESHOLDS

    plan = _plan(CQ["curation_sample_stratified"](spark, SF_DIR))
    assert "Exchange" not in plan, "hash sampling must be a pure narrow filter"

    a = {r["doc_id"] for r in CQ["curation_sample_stratified"](spark, SF_DIR).collect()}
    b = {r["doc_id"] for r in CQ["curation_sample_stratified"](spark, SF_DIR).collect()}
    assert a == b and a, "hash-based sample must be reproducible"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # zh threshold 'ff' keeps everything in that stratum
    n_zh = docs.filter(F.col("lang") == "zh").count()
    out = CQ["curation_sample_stratified"](spark, SF_DIR)
    assert out.filter(F.col("lang") == "zh").count() == n_zh
    # en is downsampled: strictly fewer than the stratum (25% target)
    n_en = docs.filter(F.col("lang") == "en").count()
    k_en = out.filter(F.col("lang") == "en").count()
    assert 0 < k_en < n_en
    assert SAMPLE_THRESHOLDS["en"] == "3f"  # threshold pinned with the test


def test_mix_plan_shares_sum_to_one_and_factor_inverts(spark):
    rows = CQ["curation_mix_plan"](spark, SF_DIR).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-12
    n = len(rows)
    for r in rows:
        assert r["mix_factor"] == (1.0 / n) / r["token_share"]


def test_term_df_hapax_dropped_and_fraction_exact(spark):
    out = CQ["curation_term_df"](spark, SF_DIR).collect()
    assert all(r["df"] >= 2 for r in out)
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for r in out[:20]:
        assert r["doc_frac"] == r["df"] / total


def test_pii_scrub_is_narrow_and_redacts_all_planted(spark):
    from ocrautomator_spark.queries.curation import PII_EMAIL_RE, PII_PHONE_RE

    plan = _plan(CQ["curation_pii_scrub"](spark, SF_DIR))
    assert "Exchange" not in plan, "PII scrub must be a pure narrow map"

    rows = CQ["curation_pii_scrub"](spark, SF_DIR).collect()
    assert rows
    # the planting guarantees at least one of each per doc
    assert all(r["n_emails"] >= 1 and r["n_phones"] >= 1 for r in rows)
    # redaction completeness: re-scanning the scrubbed text finds nothing —
    # verified via a spot recomputation of one doc through the same exprs
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    dirty = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact "), F.col("source"),
        F.lit("@example.com tel +1 (202) 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    scrub = F.regexp_replace(
        F.regexp_replace(dirty, PII_EMAIL_RE, "[EMAIL]"), PII_PHONE_RE, "[PHONE]"
    )
    leftover = docs.select(
        (F.regexp_count(scrub, F.lit(PII_EMAIL_RE))
         + F.regexp_count(scrub, F.lit(PII_PHONE_RE))).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert leftover == 0


def test_importance_weights_favor_target_lang(spark):
    """Sanity on the signal (parity gates exactness; this gates MEANING) on
    a corpus where the target slice HAS a distinct vocabulary — the driver
    testdata assigns lang labels independently of the shared word pool, so
    real-corpus means are uninformative there. Target-vocabulary docs must
    outscore foreign-vocabulary docs, with a half-mixed doc in between."""
    import pandas as pd

    from ocrautomator_spark.queries import curation as cu

    en = "the quick brown fox jumps over the lazy dog with great speed"
    de = "der schnelle braune fuchs springt ueber den faulen hund mit tempo"
    texts = {
        1: ("en", en),
        2: ("en", en + " and the dog sleeps"),
        3: ("de", de),
        4: ("de", de + " und der hund schlaeft"),
        5: ("de", en + " " + de),  # mixed vocabulary, foreign label
    }
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "lang": [v[0] for v in texts.values()],
            "text": [v[1] for v in texts.values()],
        }
    )
    df = spark.createDataFrame(pdf)
    orig = cu.T
    try:
        cu.T = lambda s, sf, name: df
        rows = {r["doc_id"]: r for r in cu.QUERIES["curation_importance_weights"](spark, "unused").collect()}
    finally:
        cu.T = orig
    norm = {k: r["raw_score"] / r["n_terms"] for k, r in rows.items()}
    assert norm[1] > norm[5] > norm[3], norm
    assert norm[2] > norm[4], norm


# ---------------------------------------------------------- LM rarity

def test_lm_rarity_planted_gibberish_ranks_top(spark, tmp_path):
    """A planted all-gibberish document (every word unique in the corpus, so
    every bigram is a corpus singleton) must score rare_ppm = 1,000,000 and
    rank first — the discrete analogue of maximal LM perplexity."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocrautomator_spark.queries import curation as cu

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet")
    gib = " ".join(f"zq{i}gibx" for i in range(60))
    extra = pa.table(
        {
            "doc_id": [999_999],
            "text": [gib],
            "lang": ["xx"],
            "source": ["plant"],
            "n_chars": [len(gib)],
        }
    ).cast(tbl.schema)
    pq.write_table(pa.concat_tables([tbl, extra]), str(tmp_path / "documents.parquet"))

    rows = cu.QUERIES["curation_lm_rarity"](spark, str(tmp_path)).collect()
    top = rows[0]
    assert top["doc_id"] == 999_999, [r["doc_id"] for r in rows[:3]]
    assert top["rare_ppm"] == 1_000_000
    assert top["n_rare"] == top["n_bigrams"] == 59


def test_lm_rarity_nonvacuous_and_scale_invariant_threshold(spark):
    """On the NATURAL corpus the relative-frequency tail is non-empty (the
    gate is not vacuously all-zero), scores are a valid ppm ordering, and
    n_rare never exceeds n_bigrams."""
    from ocrautomator_spark.queries import curation as cu

    rows = cu.QUERIES["curation_lm_rarity"](spark, SF_DIR).collect()
    assert len(rows) == cu.RARITY_TOPN
    assert sum(r["n_rare"] for r in rows) > 0, "rare tail vacuously empty"
    ppms = [r["rare_ppm"] for r in rows]
    assert ppms == sorted(ppms, reverse=True)
    for r in rows:
        assert 0 <= r["n_rare"] <= r["n_bigrams"]
        assert r["rare_ppm"] == (r["n_rare"] * 1_000_000) // r["n_bigrams"]
