from .metrics import format_stats, tree_nbytes
from .runner import time_fn, run_suite
from .timing import fetch_scalar, measure_rtt, time_chain
from .sol import measure_hbm_bw, spmm_sol_seconds, spmv_sol_seconds
from . import matrices

__all__ = [
    "format_stats",
    "tree_nbytes",
    "time_fn",
    "fetch_scalar",
    "measure_rtt",
    "time_chain",
    "run_suite",
    "measure_hbm_bw",
    "spmm_sol_seconds",
    "spmv_sol_seconds",
    "matrices",
]
