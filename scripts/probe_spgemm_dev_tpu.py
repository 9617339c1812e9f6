"""Device-resident ESC SpGEMM timing (rmat13^2 + proxies), real chip.

Operands live as device COO containers (the CG-caller scenario); timing
is warm wall with an in-region checksum fetch. Targets (VERDICT r2 #4):
warm rmat13^2 <= 0.2 s, proxies <= 1.5 s.
"""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded, powerlaw, rmat
from fastsparse.bench.timing import measure_rtt

assert jax.default_backend() == "tpu"
print(f"rtt={measure_rtt() * 1e3:.1f} ms", flush=True)

cases = [
    ("rmat13^2", rmat(13, 8, seed=5, binary=False),
     rmat(13, 8, seed=6, binary=False)),
    ("cage12-proxy^2", banded(130_228, 64, seed=11, density=0.273), None),
    ("webbase1M-proxy^2",
     powerlaw(1_000_005, 1_000_005, 3_105_536, seed=12), None),
]

for name, A, B in cases:
    if B is None:
        B = A
    A_dev = fs.coo_from_scipy(A.tocoo(), dtype=np.float32)
    B_dev = A_dev if B is A else fs.coo_from_scipy(B.tocoo(), dtype=np.float32)
    float(jnp.sum(A_dev.vals) + jnp.sum(B_dev.vals))
    t0 = time.perf_counter()
    C, info = fs.spgemm(A_dev, B_dev)
    chk = float(jnp.sum(C.vals))
    cold = time.perf_counter() - t0
    for rep in range(3):
        t0 = time.perf_counter()
        C, info = fs.spgemm(A_dev, B_dev)
        chk = float(jnp.sum(C.vals))
        dt = time.perf_counter() - t0
        print(f"{name} warm{rep}: {dt:.3f} s "
              f"({info['n_products'] / dt / 1e6:.1f} Mprod/s)", flush=True)
    ref = (A @ B).tocsr()
    got = C.to_scipy().tocsr()
    assert info["nnz"] == ref.nnz, (info["nnz"], ref.nnz)
    d = abs(got - ref)
    rel = float(d.max() / (abs(ref).max() + 1e-30)) if d.nnz else 0.0
    print(
        f"{name}: cold {cold:.2f}s nnz={info['nnz']} "
        f"products={info['n_products']} blocks={info['n_blocks']} "
        f"floor_sort={info['floor_sort_s']:.3f}s rel={rel:.2e}",
        flush=True,
    )
    assert rel <= 1e-5
