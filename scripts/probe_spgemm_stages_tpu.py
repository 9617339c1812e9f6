"""Stage timing inside the device ESC SpGEMM (rmat13^2, warm)."""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import rmat
from fastsparse.bench.timing import measure_rtt
from fastsparse.ops import spgemm as SG

assert jax.default_backend() == "tpu"
print(f"rtt={measure_rtt() * 1e3:.1f} ms", flush=True)

A = rmat(13, 8, seed=5, binary=False)
B = rmat(13, 8, seed=6, binary=False)
A_dev = fs.coo_from_scipy(A.tocoo(), dtype=np.float32)
B_dev = fs.coo_from_scipy(B.tocoo(), dtype=np.float32)
float(jnp.sum(A_dev.vals) + jnp.sum(B_dev.vals))

for rep in range(3):
    t0 = time.perf_counter()
    ra, ca, va, aok, (ma, ka) = SG._device_coo(A_dev)
    rb, cb, vb, bok, (kb, nb) = SG._device_coo(B_dev)
    t1 = time.perf_counter()
    pr = SG._esc_prep(ra, ca, va, aok, rb, cb, vb, bok, kb=int(kb), ma=int(ma))
    (ar_s, ac_s, av_s, okb, bc_s, bv_s, b_ptr, prod_end_d, ent_end_d) = pr
    t2 = time.perf_counter()
    tables = np.asarray(jnp.stack([prod_end_d, ent_end_d]))
    t3 = time.perf_counter()
    prod_end = np.maximum.accumulate(tables[0].astype(np.int64))
    ent_end = np.maximum.accumulate(tables[1].astype(np.int64))
    P = int(prod_end[-1])
    row_p = np.diff(np.concatenate([[0], prod_end]))
    cap = min(max(SG._pow2(P), 8), 1 << 23)
    cap = max(cap, SG._pow2(int(row_p.max())))
    bounds = [0]
    while bounds[-1] < ma:
        base = 0 if bounds[-1] == 0 else int(prod_end[bounds[-1] - 1])
        nxt = int(np.searchsorted(prod_end, base + cap, side="right"))
        bounds.append(max(nxt, bounds[-1] + 1))
    e_bnd = [0] + [int(ent_end[r - 1]) for r in bounds[1:]]
    e_lo = np.asarray(e_bnd[:-1], np.int32)
    e_hi = np.asarray(e_bnd[1:], np.int32)
    na = SG._pow2(max(int((e_hi - e_lo).max()), 8))
    t4 = time.perf_counter()
    outs = SG._esc_run(ar_s, ac_s, av_s, okb, jnp.asarray(e_lo),
                       jnp.asarray(e_hi), b_ptr, bc_s, bv_s,
                       p_cap=int(cap), na=int(na))
    t5 = time.perf_counter()
    ns = np.asarray(outs[3])
    t6 = time.perf_counter()
    chk = float(jnp.sum(outs[2]))
    t7 = time.perf_counter()
    print(
        f"rep{rep}: coo {t1-t0:.3f} | prep-dispatch {t2-t1:.3f} | "
        f"tables-fetch {t3-t2:.3f} | host {t4-t3:.3f} | "
        f"run-dispatch {t5-t4:.3f} | ns-fetch {t6-t5:.3f} | "
        f"chk {t7-t6:.3f} | total {t7-t0:.3f}",
        flush=True,
    )
