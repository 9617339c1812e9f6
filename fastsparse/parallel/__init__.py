from .partition import RowPartitioned, partition_rows
from .ops import (
    make_row_mesh,
    shard_partitioned,
    pad_operand,
    unpad_result,
    pspmv,
    pspmm,
    pspmv_t,
    pspmm_t,
    pnormal_mv,
    pnormal_mm,
)

__all__ = [
    "RowPartitioned",
    "partition_rows",
    "make_row_mesh",
    "shard_partitioned",
    "pad_operand",
    "unpad_result",
    "pspmv",
    "pspmm",
    "pspmv_t",
    "pspmm_t",
    "pnormal_mv",
    "pnormal_mm",
]
