"""Device-trace the warm ESC SpGEMM run (rmat13^2) and attribute time.

Parses the perfetto trace.json.gz for the TPU XLA-Ops lane and prints
op-name totals — finds where the 0.71 s of device time goes (sort floor
is 24 ms)."""
import glob
import gzip
import json
import time
from collections import defaultdict

import sys

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded, rmat
from fastsparse.ops import spgemm as SG
from fastsparse.utils.profiling import trace

assert jax.default_backend() == "tpu"

if len(sys.argv) > 1 and sys.argv[1] == "cage":
    A = B = banded(130_228, 64, seed=11, density=0.273)
else:
    A = rmat(13, 8, seed=5, binary=False)
    B = rmat(13, 8, seed=6, binary=False)
A_dev = fs.coo_from_scipy(A.tocoo(), dtype=np.float32)
B_dev = fs.coo_from_scipy(B.tocoo(), dtype=np.float32)
float(jnp.sum(A_dev.vals))

# warm everything once
C, info = SG.spgemm_esc(A_dev, B_dev)
print("warmed", info["nnz"], flush=True)

ITERS = 3
logdir = "/tmp/esc_trace"
t0 = time.perf_counter()
with trace(logdir):
    for _ in range(ITERS):
        C, info = SG.spgemm_esc(A_dev, B_dev)
        chk = float(jnp.sum(C.vals))
print(f"traced {ITERS} iters in {time.perf_counter() - t0:.2f}s", flush=True)

files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
assert files, "no trace file"
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
# find the TPU XLA Ops lane
pid_names = {
    e["pid"]: e["args"].get("name", "")
    for e in events
    if e.get("ph") == "M" and e.get("name") == "process_name"
}
tid_names = {
    (e["pid"], e["tid"]): e["args"].get("name", "")
    for e in events
    if e.get("ph") == "M" and e.get("name") == "thread_name"
}
tot = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    if e.get("ph") != "X":
        continue
    lane = tid_names.get((e.get("pid"), e.get("tid")), "")
    proc = pid_names.get(e.get("pid"), "")
    if "TPU" not in proc and "TPU" not in lane:
        continue
    if "XLA Ops" not in lane:
        continue
    tot[e["name"]] += e.get("dur", 0.0)
    cnt[e["name"]] += 1
rows = sorted(tot.items(), key=lambda kv: -kv[1])
print(f"{'op':44s} {'ms/iter':>9s} {'n/iter':>7s}")
for name, us in rows[:25]:
    print(f"{name[:44]:44s} {us / 1e3 / ITERS:9.2f} {cnt[name] / ITERS:7.1f}")
print(f"{'TOTAL':44s} {sum(tot.values()) / 1e3 / ITERS:9.2f}")
