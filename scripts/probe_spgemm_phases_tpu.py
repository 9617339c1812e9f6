"""SpGEMM warm-call phase breakdown (rmat13 x rmat13, one process):
host symbolic / tile fill+upload / numeric scan / compaction / fetch.
"""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import rmat
from fastsparse.bench.timing import fetch_scalar, measure_rtt
from fastsparse.ops import spgemm as sg

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    rtt = measure_rtt()
    tick(f"tunnel ok (rtt {rtt*1e3:.0f} ms)")

    A = rmat(13, 8, seed=5, binary=False)
    B = rmat(13, 8, seed=6, binary=False)
    # warm everything once
    C, info = fs.spgemm(A, B)
    tick(f"warmup done (nnz={info['nnz']})")

    t0 = time.perf_counter()
    info2, sym = sg._symbolic(A, B, sg.DEFAULT)
    a_tiles, b_tiles, ai, bi, uout, out_idx, (ma, ka, nb), n_jslabs = sym
    fetch_scalar(a_tiles)  # force the device fills
    fetch_scalar(b_tiles)
    t_sym = time.perf_counter() - t0
    tick(f"symbolic+fill+upload: {t_sym:6.2f}s "
         f"(pairs={info2['n_pairs']}, out_tiles={info2['n_out_tiles']})")

    TM = TK = None
    TM, TK = sg.DEFAULT.resolve().tile_m, sg.DEFAULT.tile_k
    nt_out = max(int(uout.size), 1)
    C_tiles = jnp.zeros((nt_out + 1, TM, TK), jnp.float32)
    n_pairs = info2["n_pairs"]
    chunk = min(sg._PAIR_CHUNK, max(n_pairs, 1))
    n_chunks = -(-n_pairs // chunk)
    pad = n_chunks * chunk - n_pairs
    ai_j = np.concatenate([ai, np.zeros(pad, ai.dtype)])
    bi_j = np.concatenate([bi, np.zeros(pad, bi.dtype)])
    oi_j = np.concatenate([out_idx, np.full(pad, nt_out, out_idx.dtype)])
    t0 = time.perf_counter()
    aj = jnp.asarray(ai_j.reshape(n_chunks, chunk), jnp.int32)
    bj = jnp.asarray(bi_j.reshape(n_chunks, chunk), jnp.int32)
    oj = jnp.asarray(oi_j.reshape(n_chunks, chunk), jnp.int32)
    fetch_scalar(aj)
    t_up = time.perf_counter() - t0
    tick(f"pair-index upload: {t_up:6.2f}s ({3*ai_j.nbytes/1e6:.0f} MB)")

    t0 = time.perf_counter()
    C_tiles = sg._numeric_scan(C_tiles, a_tiles, b_tiles, aj, bj, oj)
    fetch_scalar(C_tiles[0])
    t_num = time.perf_counter() - t0
    tick(f"numeric scan: {t_num:6.2f}s ({info2['flops']/t_num/1e9:.1f} GFLOP/s)")

    t0 = time.perf_counter()
    rows_d, cols_d, vals_d, n_live = sg._compact_device(
        C_tiles[:nt_out], jnp.asarray(uout, jnp.int32),
        tm=TM, tk=TK, n_jslabs=n_jslabs,
    )
    n = int(n_live)
    t_cmp = time.perf_counter() - t0
    tick(f"compact sort + n_live fetch: {t_cmp:6.2f}s (n={n})")

    t0 = time.perf_counter()
    rows = np.asarray(rows_d[:n])
    cols = np.asarray(cols_d[:n])
    vals = np.asarray(vals_d[:n])
    t_f = time.perf_counter() - t0
    tick(f"prefix fetch: {t_f:6.2f}s ({3*rows.nbytes/1e6:.0f} MB)")

    tick("done")


if __name__ == "__main__":
    main()
