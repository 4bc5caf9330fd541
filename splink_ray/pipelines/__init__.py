"""Orchestrated pipelines: predict / train / cluster (SURVEY.md §3)."""
