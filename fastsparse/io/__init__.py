from .sbm import read_sbm, write_sbm, read_sdm, write_sdm
from .mtx import read_mtx, write_mtx
from .npz_cache import save_npz, load_npz, save_npz_sharded, load_npz_sharded

__all__ = [
    "read_sbm",
    "write_sbm",
    "read_sdm",
    "write_sdm",
    "read_mtx",
    "write_mtx",
    "save_npz",
    "load_npz",
    "save_npz_sharded",
    "load_npz_sharded",
]
