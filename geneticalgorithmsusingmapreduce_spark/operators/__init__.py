"""Dataflow operators (SURVEY.md §2 inventory)."""
