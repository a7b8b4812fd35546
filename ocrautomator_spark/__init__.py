"""ocrautomator_spark — a from-scratch PySpark-native main-content extraction
engine with the capabilities of ``labinnovationdocapost/ocrAutomator``
(reference surveyed in SURVEY.md; the reference is a C++ mass-OCR pipeline —
this engine re-expresses its dataflow Spark-first, per BASELINE.json north_star).

Layout:
  kernel/     pure-Python extraction kernel (no pyspark imports) — the
              sequential reference implementation for per-turn equality
  spark/      schemas, extract job, salting, checkpoint/resume, table IO
  queries/    relational operator surface (SURVEY.md §2B) + data-pipeline ops
  synth/      deterministic synthetic transcripts generator (FIXTURES.md §A)
  streaming/  structured-streaming twins of the windowed operators
"""

from ocrautomator_spark.kernel.extractor import EXTRACTOR_VERSION, extract_one

__all__ = ["extract_one", "EXTRACTOR_VERSION"]
