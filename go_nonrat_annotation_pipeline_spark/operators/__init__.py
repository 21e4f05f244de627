"""Relational operators (SURVEY.md §2.3/§2.4) + scale extensions."""
