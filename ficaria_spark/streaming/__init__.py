"""Structured Streaming variants of the temporal kernel."""
