"""Fixed, explicit StructType schemas (SURVEY.md §1.2 — normative).

The reference has no schema system (extension sniffing only, SURVEY.md §1.1);
this engine uses explicit schemas everywhere in the production path — no
inference outside test helpers.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input: exactly the input_hint shape (BASELINE.json:15)
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

SPAN = StructType(
    [
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("kind", StringType(), False),
    ]
)

# Extraction result + lineage/metrics columns — the columnar rebuild of
# ocrAutomator's exif-writeback enrichment (SURVEY.md §2A A9, BASELINE.json:6).
EXTRACT_FIELDS = [
    StructField("extracted_text", StringType(), False),
    StructField("spans", ArrayType(SPAN, False), False),
    StructField("payload_kind", StringType(), False),
    StructField("extractor_version", StringType(), False),
    StructField("partition_id", IntegerType(), False),
    StructField("batch_latency_ms", DoubleType(), False),
    StructField("n_chars_in", IntegerType(), False),
    StructField("n_chars_out", IntegerType(), False),
]

# Input columns carried into the output. The raw ``text`` payload is
# deliberately NOT duplicated into the extracted table: at 10^12-turn scale
# that would double every shuffle, sort, and write for bytes that already
# live in the source table — ``spans`` are char-offset provenance pointers
# into it, and (conv_id, turn_idx) joins recover the payload when needed.
EXTRACT_KEY_COLS = ["conv_id", "turn_idx", "role", "tool", "ts"]

# output: keys + result + lineage (field types for the key columns follow the
# actual input schema at runtime — see extract_job._output_schema)
EXTRACTED = StructType(
    [f for f in TRANSCRIPTS.fields if f.name in EXTRACT_KEY_COLS] + EXTRACT_FIELDS
)
