"""Spark-side engine: schemas, extract job, checkpoint/resume, table IO."""
