"""Structured Streaming twins of the windowed operators (SURVEY.md §2B)."""
