"""Evaluation harness — pairwise F1 + span-sequence equality."""
