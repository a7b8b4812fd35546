"""Extraction-engine query entries (the engine's core capability, §2A/§2E).

These run the full distributed extract pipeline; the kernel is not
SQL-expressible, so the driver records rows-only checks here — the REAL
equality gate is tests/test_equality_harness.py (sequential kernel vs Spark,
100% per-turn text/span equality)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocrautomator_spark.spark.extract_job import documents_as_transcripts, flagship, run_extract

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@q("extract_flagship")
def extract_flagship(spark: SparkSession, sf: str) -> DataFrame:
    return flagship(spark, sf)


@q("extract_full")
def extract_full(spark: SparkSession, sf: str) -> DataFrame:
    """Full extracted table over documents-as-transcripts: keys + extracted
    text + spans + lineage/metrics columns (spans flattened for the check)."""
    ext = run_extract(documents_as_transcripts(spark, sf))
    return ext.select(
        "conv_id",
        "turn_idx",
        "payload_kind",
        "extracted_text",
        F.size("spans").alias("n_spans"),
        "extractor_version",
        "n_chars_in",
        "n_chars_out",
    )


@q(
    "extract_span_stats",
    # span GEOMETRY is kernel-defined, but span COUNTS by kind reduce to plain
    # text statistics the oracle can check: every documents row is plain text
    # (one content span per blank-line-separated paragraph, no markup)
    None,
)
def extract_span_stats(spark: SparkSession, sf: str) -> DataFrame:
    ext = run_extract(documents_as_transcripts(spark, sf))
    return (
        ext.select("conv_id", F.explode("spans").alias("s"))
        .groupBy(F.col("s.kind").alias("kind"))
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("s.end") - F.col("s.start")).alias("covered_chars"),
        )
    )
