"""Dataflow operators — each module covers one family of SURVEY.md §2."""
