"""Structured Streaming ingestion (SURVEY §2.10, §7.3.7)."""
