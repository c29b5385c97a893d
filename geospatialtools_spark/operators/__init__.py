"""Spark operators: distributed re-expressions of the reference pipeline."""
