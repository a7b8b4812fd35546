"""The extract job — the Spark-first rebuild of ocrAutomator's pipeline spine.

Reference lifecycle (SURVEY.md §3.1): enumerate files → producer/consumer
queue → N worker threads each running Tesseract per document → write txt/exif.
Spark lifecycle (§3.2), one Python crossing total:

    read table
      → salted repartition                 (A11: defeats long-conversation skew;
                                            the reference's analogue is a huge PDF
                                            head-of-line-blocking one thread)
      → mapInPandas(extract_batches)       (A5+A6: batched Arrow/pandas UDF replaces
                                            the per-document worker loop)
      → sortWithinPartitions(conv_id, turn_idx)   (A7: stable turn ordering)
      → [caller writes + commits manifest]  (A8/A10, see checkpoint.py)

Lineage/metrics columns (extractor_version, partition_id, batch_latency_ms,
char counts) ride along with every row — the columnar rebuild of the
exif-writeback (A9). BASELINE.json:6 names every element of this design.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ocrautomator_spark.kernel.extractor import EXTRACTOR_VERSION, extract_one
from ocrautomator_spark.spark.schemas import EXTRACTED, TRANSCRIPTS

# A long conversation is spread over up to SALT_BUCKETS partitions; extraction
# is per-turn, so splitting a conversation across tasks is semantics-free.
SALT_BUCKETS = 16


def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched extraction: one Python crossing, kernel applied per row
    within the batch (the kernel itself is string-at-a-time, like Tesseract
    was document-at-a-time — but batching amortizes interpreter + transfer
    overhead, and all pre/post processing stays JVM-side)."""
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    for pdf in batches:
        t0 = time.perf_counter()
        results = [extract_one(t) for t in pdf["text"]]
        latency_ms = (time.perf_counter() - t0) * 1000.0
        out = pdf.copy()
        out["extracted_text"] = [r.extracted_text for r in results]
        out["spans"] = [
            [{"start": s.start, "end": s.end, "kind": s.kind} for s in r.spans]
            for r in results
        ]
        out["payload_kind"] = [r.payload_kind for r in results]
        out["extractor_version"] = EXTRACTOR_VERSION
        out["partition_id"] = pid
        out["batch_latency_ms"] = latency_ms
        out["n_chars_in"] = pdf["text"].str.len().fillna(0).astype("int32")
        out["n_chars_out"] = pd.Series(
            [len(r.extracted_text) for r in results], index=pdf.index, dtype="int32"
        )
        yield out


def _output_schema(df: DataFrame, passthrough: list[str]) -> StructType:
    extra = [f for f in df.schema.fields if f.name in passthrough]
    return StructType(list(EXTRACTED.fields) + extra)


def run_extract(
    df: DataFrame,
    n_partitions: int | None = None,
    salt_buckets: int = SALT_BUCKETS,
    passthrough: list[str] | None = None,
    observe: bool = False,
) -> DataFrame:
    """Transcripts-shaped df → extracted df. Lazy; caller triggers the action.

    ``passthrough`` columns (beyond the TRANSCRIPTS six) are carried through
    the Python stage unchanged and appended to the output schema.
    """
    passthrough = passthrough or []
    schema = _output_schema(df, passthrough)
    # column pruning before the Python stage: ship exactly the input columns
    df = df.select(*[f.name for f in TRANSCRIPTS.fields], *passthrough)
    spark = df.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # ONE repartition for the whole job (SURVEY.md §4): hash of
    # (conv_id, turn_idx mod salt) spreads hot conversations over salt buckets
    salted = df.repartition(n, F.col("conv_id"), F.pmod(F.col("turn_idx"), F.lit(salt_buckets)))
    ext = salted.mapInPandas(extract_batches, schema=schema)
    ext = ext.sortWithinPartitions("conv_id", "turn_idx")
    if observe:
        ext = ext.observe(
            "extract_stats",
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_chars_in").alias("chars_in"),
            F.sum("n_chars_out").alias("chars_out"),
            F.avg("batch_latency_ms").alias("avg_batch_latency_ms"),
            F.sum(F.when(F.col("payload_kind") == "error", 1).otherwise(0)).alias("errors"),
        )
    return ext


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` table to the transcripts input shape
    (one doc = a single-turn conversation), keeping lang/source as passthrough."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
        "lang",
        "source",
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (driver smoke): extraction kernel over ``documents`` +
    an agg_hash rollup by (lang, payload_kind). Stable schema, rows > 0."""
    ext = run_extract(documents_as_transcripts(spark, sf_dir), passthrough=["lang", "source"])
    return (
        ext.groupBy("lang", "payload_kind")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars_in").alias("chars_in"),
            F.sum("n_chars_out").alias("chars_out"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang", "payload_kind")
    )


__all__ = [
    "EXTRACTOR_VERSION",
    "TRANSCRIPTS",
    "EXTRACTED",
    "SALT_BUCKETS",
    "extract_batches",
    "run_extract",
    "documents_as_transcripts",
    "flagship",
]
