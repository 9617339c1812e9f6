"""Device-trace one hypersparse product (powerlaw 65k / rmat s18) and
attribute device time by op (round 5 tasks #2/#3).

After the round-5 kernel work (packed-full gather body, dense-column
block) powerlaw measured 8.3 ms busy and rmat 19.4 ms wall — both far
above their slot floors (~3.5 / ~2.7 ms), so the residue is NOT slot
issue rate. This prints the XLA-Ops lane totals to find it.

Usage: probe_hypertrace_tpu.py [powerlaw|rmat]
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import powerlaw, rmat  # noqa: E402
from fastsparse.utils.profiling import trace  # noqa: E402

assert jax.default_backend() == "tpu"

which = sys.argv[1] if len(sys.argv) > 1 else "powerlaw"
rng = np.random.default_rng(0)
if which == "rmat":
    m = rmat(18, 16, seed=3)
    op = fs.operator(m, reorder="auto", transpose=False)
else:
    m = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
    op = fs.operator(m, transpose=False, reorder="degree")
print("fmt", type(op.fwd).__name__, flush=True)
X = jnp.asarray(rng.standard_normal((m.shape[1], 128)), jnp.float32)
step = jax.jit(lambda op, X: op.matmat(X))
Y = step(op, X)
print("warm", float(jnp.sum(Y)), flush=True)

ITERS = 3
logdir = f"/tmp/hyper_trace_{which}"
t0 = time.perf_counter()
with trace(logdir):
    for _ in range(ITERS):
        Y = step(op, X)
    chk = float(jnp.sum(Y))
print(f"traced {ITERS} iters in {time.perf_counter() - t0:.2f}s", flush=True)

files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
assert files, "no trace file"
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
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
print(f"{'op':52s} {'ms/iter':>9s} {'n/iter':>7s}")
for name, us in rows[:30]:
    print(f"{name[:52]:52s} {us / 1e3 / ITERS:9.2f} {cnt[name] / ITERS:7.1f}")
print(f"{'TOTAL':52s} {sum(tot.values()) / 1e3 / ITERS:9.2f}")
