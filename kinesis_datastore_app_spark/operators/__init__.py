"""Relational operator surface (SURVEY.md §2.B1–B6)."""
