"""Scalar function families — SURVEY.md §2.8 ops #46-51 (filled in M2+)."""
