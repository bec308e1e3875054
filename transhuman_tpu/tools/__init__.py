"""Offline tools: reference-checkpoint conversion, weight import, k-means."""
