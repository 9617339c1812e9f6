"""Factorization-workload solvers (CG on normal equations)."""
