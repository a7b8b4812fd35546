"""M2 — per-turn equality harness (SURVEY.md §5.2; the per-row invariant of
BASELINE.json:15).

The sequential pure-Python kernel run is the reference extractor; the Spark
job must match it per (conv_id, turn_idx) on extracted_text AND spans, 100%,
under stable sort — at multiple partition counts and Arrow batch sizes, since
partitioning/batching boundaries are exactly what distribution can break.
"""

from __future__ import annotations

import pytest

from ocrautomator_spark.kernel import extract_one
from ocrautomator_spark.spark.extract_job import run_extract
from ocrautomator_spark.spark.synth_job import synth_transcripts_df
from ocrautomator_spark.synth.transcripts import gen_pandas

N_CONVS = 50


@pytest.fixture(scope="module")
def reference_run():
    """Sequential, single-process, row-at-a-time — no Spark."""
    pdf = gen_pandas(N_CONVS)
    expected = {}
    for row in pdf.itertuples():
        r = extract_one(row.text)
        expected[(row.conv_id, row.turn_idx)] = (
            r.extracted_text,
            [tuple(s) for s in r.spans],
            r.payload_kind,
        )
    return expected


@pytest.mark.parametrize("n_partitions,arrow_batch", [(2, 117), (16, 2048), (7, 500)])
def test_per_turn_equality(spark, reference_run, n_partitions, arrow_batch):
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
    try:
        df = synth_transcripts_df(spark, N_CONVS)
        got_rows = run_extract(df, n_partitions=n_partitions).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")

    assert len(got_rows) == len(reference_run)
    mismatches = 0
    for r in got_rows:
        exp_text, exp_spans, exp_kind = reference_run[(r["conv_id"], r["turn_idx"])]
        got_spans = [(s["start"], s["end"], s["kind"]) for s in r["spans"]]
        if r["extracted_text"] != exp_text or got_spans != exp_spans or r["payload_kind"] != exp_kind:
            mismatches += 1
    assert mismatches == 0, f"{mismatches}/{len(got_rows)} turns differ from sequential reference"


def test_equality_rate_is_total(spark, reference_run):
    """Every input turn appears exactly once in the output (no dup/drop across
    salted repartition boundaries)."""
    df = synth_transcripts_df(spark, N_CONVS)
    got = run_extract(df, n_partitions=5).select("conv_id", "turn_idx").collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in got]
    assert len(keys) == len(set(keys)) == len(reference_run)
