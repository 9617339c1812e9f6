"""Benchmark harness and speed-of-light models."""
