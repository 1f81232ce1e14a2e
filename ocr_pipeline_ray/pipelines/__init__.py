"""Assembled end-to-end pipelines."""
