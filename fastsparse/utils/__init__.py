"""Shared utilities: pytree dataclasses, checks, profiling, metrics."""
