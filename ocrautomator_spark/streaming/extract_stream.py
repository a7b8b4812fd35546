"""Streaming extraction — the extract pipeline as a continuous job.

The batch spine (salted repartition → mapInArrow kernel) re-expressed over
``readStream``: new transcript files appearing in a directory are extracted
micro-batch by micro-batch and appended to the output sink. On a real cluster
the source is an Iceberg/Kafka ingest table and the sink
``writeStream.toTable(...)`` with a durable checkpoint — which also replaces
the manifest-based resume (streaming checkpoints ARE the resume state,
exactly-once per micro-batch).

Note: a streaming repartition by key is a stateless shuffle per micro-batch;
skew within one micro-batch is bounded by the batch size, so salting matters
less here than in the 10^12-row backfill, but the same salted partitioning is
kept for plan parity with the batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocrautomator_spark.spark.extract_job import SALT_BUCKETS, _output_schema, extract_batches
from ocrautomator_spark.spark.schemas import EXTRACT_KEY_COLS, TRANSCRIPTS


def transcripts_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(TRANSCRIPTS).parquet(input_dir)


def extract_stream(
    stream_df: DataFrame,
    n_partitions: int | None = None,
    salt_buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Streaming twin of run_extract (no per-partition sort: ordering of an
    unbounded stream is the sink's concern; equality checks sort on read)."""
    schema = _output_schema(stream_df, [])
    in_cols = [c for c in EXTRACT_KEY_COLS if c in stream_df.columns] + ["text"]
    df = stream_df.select(*in_cols)
    n = n_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    salted = df.repartition(n, F.col("conv_id"), F.pmod(F.col("turn_idx"), F.lit(salt_buckets)))
    return salted.mapInArrow(extract_batches, schema=schema)
