"""Sparse matrix containers and format compilers."""
