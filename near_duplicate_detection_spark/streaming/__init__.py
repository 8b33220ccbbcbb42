"""Structured Streaming: incremental signature indexing."""
