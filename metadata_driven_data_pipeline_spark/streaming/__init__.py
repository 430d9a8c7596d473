"""Structured Streaming surface: incremental file pipelines, watermarked
windows, streaming dedup (SURVEY §2.9 — extension beyond the batch-only
reference)."""
