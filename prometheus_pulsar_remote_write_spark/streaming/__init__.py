"""Structured Streaming pipelines: the reference's produce/consume loops."""
