"""Column-level transforms (SURVEY.md §2.2, §2.5)."""
