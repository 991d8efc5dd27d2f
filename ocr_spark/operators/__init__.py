"""Relational + corpus operators (SURVEY.md §2 + training-data ops)."""
