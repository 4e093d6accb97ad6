"""Streaming semantics, batch-graded — SURVEY.md §2.9 ops #52-57 (filled in M4)."""
