"""Scalar function library (SURVEY.md §2.9) — thin, built-in-only."""
