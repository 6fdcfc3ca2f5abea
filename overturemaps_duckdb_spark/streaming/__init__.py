"""Structured Streaming surface (SURVEY §2.9 extension phase)."""
