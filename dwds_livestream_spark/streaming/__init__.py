"""Structured Streaming pipelines (SURVEY.md §3) + metrics listener."""
