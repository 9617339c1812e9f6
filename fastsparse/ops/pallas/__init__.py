"""Pallas TPU kernels (MXU tile engines)."""
