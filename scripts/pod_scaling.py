"""Multi-host weak-scaling harness (BASELINE config 5).

On a real v5e pod slice run under `jax.distributed`:

    python scripts/pod_scaling.py --engine bsr --matrix banded

Locally it exercises the same code on the CPU fake mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/pod_scaling.py --fake --schedule both \
        --engine bsr --matrix banded --consumer both --bench-md

Weak scaling: nnz per shard held constant; reports nnz/s at each device
count and efficiency vs the single-device rate (target >= 75% —
BASELINE.json:5,11).

Round-5 upgrades (VERDICT r4 #5): the engine that actually ships on a
pod (--engine bsr: mono/int8 shard tilings through the Pallas kernels)
and the Macau consumer (--consumer normal: `pnormal_mm`, the AᵀA·X CG
step) are first-class; timing is min-of-batches (3 independent fetch
batches per point — single-shot rows disagreed by 1.3-1.5x at P=8
across same-config runs); `--repeats N` re-runs the whole ladder so the
table itself carries reproduction evidence. The P=1 base is measured
with the same estimator, which is what previously produced
host-norm eff > 1 rows (an overmeasured cold base, not real
superlinearity).

Every row additionally carries the COMM-BYTE MODEL: bytes each device
receives per product (all-gather: the (P-1)/P missing X rows; ring: P-1
`ppermute` hops of one X block — identical totals, different overlap
structure) next to the bytes its local compute must move (shard A + X +
Y). On a real v5e pod the ICI budget is ~45 GB/s/link/direction against
~820 GB/s HBM, so comm/compute byte ratios well below ~18x the link
count keep the exchange hidden under compute — the model says WHERE the
75% target binds; fake-CPU timings say only that the schedules scale
(collectives are memcpys there — an honest caveat carried in-row).
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
                    choices=["allgather", "ring", "both"])
    ap.add_argument("--engine", default="coo",
                    choices=["coo", "bsr", "ell"],
                    help="shard compute engine (bsr = the mono/int8 "
                         "Pallas tilings — the flagship single-chip path)")
    ap.add_argument("--matrix", default="powerlaw",
                    choices=["powerlaw", "banded"],
                    help="banded exercises the structure the mono/BSR "
                         "engine wins on (the headline family)")
    ap.add_argument("--consumer", default="spmm",
                    choices=["spmm", "normal", "both"],
                    help="normal = pnormal_mm (AᵀA+reg)·X, the Macau "
                         "CG step (SURVEY.md §3.3)")
    ap.add_argument("--repeats", type=int, default=1,
                    help="full-ladder repeats (reproduction evidence)")
    ap.add_argument("--batches", type=int, default=3,
                    help="independent timing batches per point (min wins)")
    ap.add_argument("--bench-md", action="store_true",
                    help="append the scaling table to BENCH.md")
    args = ap.parse_args()

    if args.fake:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fastsparse as fs  # noqa: F401
    from fastsparse.bench.matrices import banded, powerlaw
    from fastsparse.bench.metrics import tree_nbytes
    from fastsparse.bench.timing import time_fn_stats
    from fastsparse.parallel import (
        make_row_mesh,
        partition_rows,
        pnormal_mm,
        pspmm,
        shard_partitioned,
    )
    from fastsparse.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    n_dev = jax.device_count()
    rng = np.random.default_rng(0)
    schedules = (
        ["allgather", "ring"] if args.schedule == "both" else [args.schedule]
    )
    consumers = (
        ["spmm", "normal"] if args.consumer == "both" else [args.consumer]
    )
    results = []
    counts = [1] + [n for n in (2, 4, 8, 16, 32) if n <= n_dev]

    def make_mat(P):
        nrow = args.rows_per_shard * P
        if args.matrix == "banded":
            # per-shard density held constant: bandwidth 512, density
            # chosen so nnz ≈ nnz_per_shard * P
            density = min(
                args.nnz_per_shard * P / (nrow * 512), 0.9
            )
            m = banded(nrow, 512, seed=P, density=density)
            m.data[:] = 1.0
            return m
        return powerlaw(
            nrow, nrow, args.nnz_per_shard * P, seed=P, binary=True
        )

    # build all partitions once (host compile step — excluded from timing)
    parts = {}
    for P in counts:
        m = make_mat(P)
        mesh = make_row_mesh(P)
        Ap = shard_partitioned(
            partition_rows(
                m,
                P,
                build_bsr_shards=args.engine == "bsr",
                build_ell_shards=args.engine == "ell",
            ),
            mesh,
        )
        parts[P] = (m, mesh, Ap)

    import os

    ncores = os.cpu_count() or 1
    for rep in range(args.repeats):
        for consumer in consumers:
            for schedule in schedules:
                base_rate = base_dt = None
                sat_rate = None  # nnz/s at the first core-saturated P
                for P in counts:
                    m, mesh, Ap = parts[P]
                    nrow = m.shape[0]
                    X = jnp.asarray(
                        rng.standard_normal((nrow, args.n_rhs)), jnp.float32
                    )
                    if consumer == "normal":
                        f = jax.jit(
                            lambda Ap, X, s=schedule, ms=mesh: pnormal_mm(
                                Ap, X, ms, reg=0.5, schedule=s,
                                engine=args.engine,
                            )
                        )
                    else:
                        f = jax.jit(
                            lambda Ap, X, s=schedule, ms=mesh: pspmm(
                                Ap, X, ms, schedule=s, engine=args.engine
                            )
                        )
                    st = time_fn_stats(
                        f, Ap, X, batches=args.batches, reps=5
                    )
                    dt = st["min_ms"] * 1e-3
                    rate = m.nnz / dt
                    if base_rate is None:
                        base_rate = rate
                        base_dt = dt
                    eff = rate / (base_rate * P)
                    # fake-mesh reality check: P virtual devices share ONE
                    # host's cores, so the ideal weak-scaled wall is P x
                    # the 1-device wall — host_norm_eff isolates schedule/
                    # code overhead from core contention. CAVEAT (the r4
                    # "eff 1.48 > 1" rows, now explained): this ideal
                    # assumes P=1 already saturates the host. On this
                    # 4-core box one shard's XLA work does NOT, so small-P
                    # rows read >1 (idle-core headroom, not
                    # superlinearity). `sat_eff` is the saturated-regime
                    # metric: total nnz/s at P over nnz/s at P=ncores —
                    # once every core is busy, a flat total rate (~1.0)
                    # means the schedule adds no overhead as shards grow.
                    host_eff = (P * base_dt) / dt
                    if P >= ncores and sat_rate is None:
                        sat_rate = rate
                    sat_eff = None if sat_rate is None else rate / sat_rate
                    # comm-byte model (per device, per product): the dense
                    # operand is the only traffic (row ownership — SURVEY
                    # §3.4). The normal consumer adds the reduce-scatter
                    # of partial Z (same block size as the X exchange).
                    xrow_bytes = args.n_rhs * 4
                    comm = (P - 1) * args.rows_per_shard * xrow_bytes
                    if consumer == "normal":
                        comm *= 2
                    local = (
                        Ap.local_bsr if args.engine == "bsr" and
                        Ap.local_bsr is not None else Ap.local
                    )
                    a_bytes = tree_nbytes(local) // max(P, 1)
                    compute = (
                        a_bytes
                        + nrow * xrow_bytes
                        + args.rows_per_shard * xrow_bytes
                    )
                    row = {
                        "devices": P,
                        "rep": rep,
                        "consumer": consumer,
                        "nnz": int(m.nnz),
                        "ms": round(dt * 1e3, 2),
                        "ms_samples": st["samples_ms"],
                        "nnz_per_s": round(rate, 1),
                        "weak_scaling_eff": round(eff, 4),
                        "host_norm_eff": round(host_eff, 4),
                        "sat_eff": None if sat_eff is None else round(sat_eff, 4),
                        "ncores": ncores,
                        "schedule": schedule,
                        "engine": args.engine,
                        "matrix": args.matrix,
                        "comm_MB_per_dev": round(comm / 1e6, 2),
                        "compute_MB_per_dev": round(compute / 1e6, 2),
                        "comm_over_compute": round(comm / max(compute, 1), 4),
                        "backend": jax.default_backend(),
                    }
                    results.append(row)
                    print(json.dumps(row), flush=True)

    if args.bench_md:
        import datetime

        stamp = datetime.datetime.now().isoformat(timespec="seconds")
        backend = results[0]["backend"] if results else "?"
        with open("BENCH.md", "a") as f:
            f.write(
                f"\n## weak scaling ({backend}"
                f"{' fake mesh' if args.fake else ''}, "
                f"engine={args.engine}, matrix={args.matrix}) {stamp}\n\n"
            )
            f.write(
                "Weak scaling, nnz/shard "
                f"{args.nnz_per_shard} (N={args.n_rhs}); min-of-"
                f"{args.batches}-batches timing, {args.repeats} ladder "
                "repeat(s). "
            )
            if args.fake:
                f.write(
                    "CAVEAT: CPU fake-device mesh — collectives are "
                    "intra-process memcpys AND all P virtual devices "
                    "share one host's cores (weak-scaled work grows Px "
                    "on fixed silicon), so raw `eff` is bounded by ~1/P "
                    "— `host-norm eff` (ideal = Px the 1-device wall) "
                    "is the fake-mesh schedule-overhead read, NOT ICI. "
                    "host-norm reads >1 below P=ncores because one "
                    "shard's work does not saturate the host (measured "
                    "here; NOT superlinearity) — `sat eff` (total nnz/s "
                    "vs the P=ncores point) is the loaded-regime "
                    "schedule-overhead metric. The comm-byte model "
                    "is hardware-independent: per-device exchange bytes "
                    "vs local compute bytes locate where the >=75% pod "
                    "target binds (BASELINE.json:11).\n\n"
                )
            else:
                f.write("\n\n")
            f.write(
                "| rep | consumer | schedule | devices | ms | nnz/s | eff |"
                " host-norm eff | sat eff |"
                " comm MB/dev | compute MB/dev | comm/compute |\n"
                "|---|---|---|---|---|---|---|---|---|---|---|---|\n"
            )
            for r in results:
                f.write(
                    f"| {r['rep']} | {r['consumer']} | {r['schedule']} | "
                    f"{r['devices']} | {r['ms']} | "
                    f"{r['nnz_per_s']:.3g} | {r['weak_scaling_eff']} | "
                    f"{r['host_norm_eff']} | {r['sat_eff']} | "
                    f"{r['comm_MB_per_dev']} | {r['compute_MB_per_dev']} | "
                    f"{r['comm_over_compute']} |\n"
                )


if __name__ == "__main__":
    main()
