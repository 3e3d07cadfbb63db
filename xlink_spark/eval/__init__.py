"""Evaluation harness — pairwise F1, span-sequence equality, blocking PC/RR."""
