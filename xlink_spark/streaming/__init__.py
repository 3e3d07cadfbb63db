"""Structured Streaming surface: incremental corpus ingestion."""
