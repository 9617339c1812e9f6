"""XLA gather cost shapes for the ESC B-side (8.4M lookups).

(a) two separate gathers (current), (b) one packed (n,2) pair gather,
(c) sorted-index gather (locality), from 65k and 2M tables.
"""
import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from fastsparse.bench.timing import measure_rtt, time_fn

assert jax.default_backend() == "tpu"
print(f"rtt={measure_rtt() * 1e3:.1f} ms", flush=True)

P = 1 << 23
rng = np.random.default_rng(0)

for nb in (1 << 16, 1 << 21):
    cols = jnp.asarray(rng.integers(0, 1 << 15, nb), jnp.int32)
    vals = jnp.asarray(rng.standard_normal(nb), jnp.float32)
    pair = jnp.stack(
        [cols, jax.lax.bitcast_convert_type(vals, jnp.int32)], axis=1
    )
    idx = jnp.asarray(rng.integers(0, nb, P), jnp.int32)
    idx_sorted = jnp.sort(idx)

    f2 = jax.jit(lambda i, c, v: (c[i], v[i]))
    fp = jax.jit(lambda i, p: p[i])
    t2 = time_fn(f2, idx, cols, vals, reps=10)
    tp = time_fn(fp, idx, pair, reps=10)
    t2s = time_fn(f2, idx_sorted, cols, vals, reps=10)
    print(
        f"table={nb}: two-gathers {t2 * 1e3:.1f} ms | pair-gather "
        f"{tp * 1e3:.1f} ms | two-gathers(sorted idx) {t2s * 1e3:.1f} ms",
        flush=True,
    )
