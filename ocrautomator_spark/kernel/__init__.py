"""Pure-Python extraction kernel (SURVEY.md §2E, operators E1–E8).

No pyspark imports anywhere in this subpackage: the kernel is the sequential
reference implementation against which the distributed Spark run is checked
for per-turn text/span equality (BASELINE.json:15 "per-row invariant vs the
reference"). It replaces the reference's per-document Tesseract worker loop
(ocrAutomator master worker, SURVEY.md §2A A6) with deterministic
DOM-heuristic boilerplate stripping and layout-aware reflow.
"""

from ocrautomator_spark.kernel.extractor import (
    EXTRACTOR_VERSION,
    ExtractResult,
    Span,
    extract_one,
)

__all__ = ["extract_one", "ExtractResult", "Span", "EXTRACTOR_VERSION"]
