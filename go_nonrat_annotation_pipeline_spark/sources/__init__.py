"""Scans & sinks (SURVEY.md §2.1)."""
