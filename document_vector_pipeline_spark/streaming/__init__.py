"""Structured Streaming: blob-trigger-parity ingest and event analytics."""
