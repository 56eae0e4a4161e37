"""Streaming / incremental operators (SURVEY.md §2.11)."""
