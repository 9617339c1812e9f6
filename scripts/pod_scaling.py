"""Multi-host weak-scaling harness (BASELINE config 5).

On a real v5e pod slice run under `jax.distributed`:

    python scripts/pod_scaling.py            # uses all devices

Locally it exercises the same code on the CPU fake mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/pod_scaling.py --fake

Weak scaling: nnz per shard held constant; reports nnz/s at each device
count and efficiency vs the single-device rate (target >= 75% —
BASELINE.json:5,11).
"""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fake", action="store_true", help="force CPU fake mesh")
    ap.add_argument("--nnz-per-shard", type=int, default=1_000_000)
    ap.add_argument("--rows-per-shard", type=int, default=16_384)
    ap.add_argument("--n-rhs", type=int, default=64)
    ap.add_argument("--schedule", default="allgather",
                    choices=["allgather", "ring"])
    args = ap.parse_args()

    if args.fake:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fastsparse as fs
    from fastsparse.bench.matrices import powerlaw
    from fastsparse.bench.timing import time_fn
    from fastsparse.parallel import (
        make_row_mesh,
        partition_rows,
        pspmm,
        shard_partitioned,
    )
    from fastsparse.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    n_dev = jax.device_count()
    rng = np.random.default_rng(0)
    results = []
    base_rate = None
    counts = [1] + [n for n in (2, 4, 8, 16, 32) if n <= n_dev]
    for P in counts:
        nrow = args.rows_per_shard * P
        m = powerlaw(
            nrow, nrow, args.nnz_per_shard * P, seed=P, binary=True
        )
        mesh = make_row_mesh(P)
        Ap = shard_partitioned(partition_rows(m, P), mesh)
        X = jnp.asarray(
            rng.standard_normal((nrow, args.n_rhs)), jnp.float32
        )
        f = jax.jit(
            lambda Ap, X: pspmm(Ap, X, mesh, schedule=args.schedule)
        )
        dt = time_fn(f, Ap, X, reps=5)
        rate = m.nnz / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * P)
        row = {
            "devices": P,
            "nnz": int(m.nnz),
            "ms": round(dt * 1e3, 2),
            "nnz_per_s": round(rate, 1),
            "weak_scaling_eff": round(eff, 4),
            "schedule": args.schedule,
            "backend": jax.default_backend(),
        }
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
