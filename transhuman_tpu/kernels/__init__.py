"""Pallas TPU kernels for the hot ops (SURVEY.md §2.3)."""
