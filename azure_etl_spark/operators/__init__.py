"""Relational + data-pipeline operators (SURVEY.md §2)."""
