"""fastsparse — a TPU-native sparse linear-algebra library.

Built from scratch in JAX/XLA with Pallas kernels, covering the capability
set of the C library ``jaak-s/libfastsparse`` (see SURVEY.md): COO / CSR /
bucketed-ELL / tiled-BSR formats (valued and binary), Hilbert- and
Morton-order on-device reordering, SpMV / multi-RHS SpMM / SpGEMM /
normal-equation products, and multi-host row-partitioned execution over
`jax.sharding` meshes with halo all-gather overlapped with compute.
"""
from .config import Config, DEFAULT, LANES
from .formats.coo import COO, BinaryCOO, coo_from_scipy, binary_coo_from_scipy
from .formats.csr import CSR, BinaryCSR, csr_from_scipy, binary_csr_from_scipy
from .formats.convert import to_csr, to_coo, transpose_coo, to_bcoo, from_bcoo
from .formats.ell import (
    DdEll,
    EllMatrix,
    SegmentedEll,
    build_ell,
    build_ell_dd,
    build_ell_segmented,
)
from .formats.bsr import BsrMatrix, build_bsr
from .formats.hybrid import HybridMatrix, build_hybrid
from .formats.segmented import ColSegmented, build_bsr_segmented
from .linops import SparseOperator, operator
from .reorder.sort import sort_coo, ORDERINGS
from .reorder.morton import morton_key, morton_key64
from .reorder.hilbert import hilbert_key, hilbert_key64, hilbert_d2xy
from .ops.spmv import spmv, spmv_t
from .ops.spmm import spmm, spmm_t, spmm_dd
from .ops.ata import ata_x, ata_X, aat_x
from .ops.spgemm import spgemm, spgemm_info
from .tuning import optimal_buckets, tuned_config
from .update import ValueUpdater, value_updater
from .utils.debug import validate
from .solvers.cg import cg, cg_normal, normal_jacobi, CGResult
from . import io
from . import bench
from . import parallel

__version__ = "0.1.0"

__all__ = [
    "Config",
    "DEFAULT",
    "LANES",
    "COO",
    "BinaryCOO",
    "CSR",
    "BinaryCSR",
    "EllMatrix",
    "SegmentedEll",
    "build_ell_segmented",
    "BsrMatrix",
    "build_bsr",
    "HybridMatrix",
    "build_hybrid",
    "ColSegmented",
    "build_bsr_segmented",
    "SparseOperator",
    "operator",
    "coo_from_scipy",
    "binary_coo_from_scipy",
    "csr_from_scipy",
    "binary_csr_from_scipy",
    "to_csr",
    "to_coo",
    "transpose_coo",
    "to_bcoo",
    "from_bcoo",
    "build_ell",
    "build_ell_dd",
    "DdEll",
    "sort_coo",
    "ORDERINGS",
    "morton_key",
    "morton_key64",
    "hilbert_key",
    "hilbert_key64",
    "hilbert_d2xy",
    "spmv",
    "spmv_t",
    "spmm",
    "spmm_t",
    "ata_x",
    "ata_X",
    "aat_x",
    "spgemm",
    "spgemm_info",
    "spmm_dd",
    "optimal_buckets",
    "tuned_config",
    "ValueUpdater",
    "value_updater",
    "validate",
    "cg",
    "cg_normal",
    "normal_jacobi",
    "CGResult",
    "io",
    "bench",
    "parallel",
    "__version__",
]
