"""Batch-round drivers (the frontier is batch rounds by design —
SURVEY.md §2.9: no Structured Streaming state is needed; resume is an
Iceberg-style snapshot high-water mark)."""
