"""Sparse graph products: SpGEMM chaining + IO round trip.

Two-hop neighborhood counts of an R-MAT graph: C = A @ A computed with
fused output-nnz estimation, returned directly in execution format (tiled
BSR) and chained into an SpMM — no format round-trips.

    PYTHONPATH=. python examples/graph_products.py
"""
import time

import jax
import numpy as np

import fastsparse as fs
from fastsparse.bench.matrices import rmat


def main():
    scale = 13 if jax.default_backend() == "tpu" else 10
    A = rmat(scale, 8, seed=0, binary=False)
    print(f"graph: {A.shape[0]} vertices, {A.nnz} edges")

    # symbolic-only pass: structure estimate before any numerics
    info = fs.spgemm_info(A, A)
    print(
        f"symbolic: {info['n_pairs']} tile pairs, est_nnz<={info['est_nnz']},"
        f" {info['flops']/1e9:.1f} GFLOP planned"
    )

    t0 = time.perf_counter()
    C, info = fs.spgemm(A, A, out_format="bsr")  # C stays in execution form
    print(f"numeric: {time.perf_counter()-t0:.2f}s, tiles={C.n_tiles}")

    # chain: two-hop counts for a probe set of vertices
    X = np.zeros((A.shape[1], 8), np.float32)
    X[np.arange(8) * 7, np.arange(8)] = 1.0
    two_hop = np.asarray(fs.spmm(C, X))
    print("two-hop mass per probe:", np.round(two_hop.sum(axis=0), 1))

    # IO round trip of the compiled product
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "C.npz")
        fs.io.save_npz(p, C)
        C2 = fs.io.load_npz(p)
        assert type(C2) is type(C)
        print(f"npz round-trip OK ({os.path.getsize(p)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
