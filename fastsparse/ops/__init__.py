"""Sparse kernels: SpMV, SpMM, normal equations, SpGEMM."""
