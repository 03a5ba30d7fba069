"""Structured Streaming: incremental exports over a growing documents
table."""
