from ocrautomator_spark.synth.transcripts import gen_conversation, gen_pandas

__all__ = ["gen_conversation", "gen_pandas"]
