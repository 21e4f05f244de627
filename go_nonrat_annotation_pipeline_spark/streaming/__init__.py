"""Structured Streaming wrappers (SURVEY.md §7 extension point)."""
