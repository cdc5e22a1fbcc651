"""Druid SQL function surface re-expressed for Spark (SURVEY §2.9)."""
