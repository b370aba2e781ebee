"""Observability: structured logging, metrics, profiling helpers."""
