"""Checkpoint / lineage state (SURVEY.md §4.2.4)."""
