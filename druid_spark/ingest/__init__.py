"""Ingestion: batch spec compiler + streaming (SURVEY §7.1 M6)."""
