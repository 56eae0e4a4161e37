"""Composed query plans / iterative drivers (SURVEY.md §3)."""
