"""Scalar function families (SURVEY.md §2.B7)."""
