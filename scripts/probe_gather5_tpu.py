"""Device-trace the powerlaw 65k^2 N=128 gather product and attribute
time: where do the ~9.3 ms go after the round-4 kernel rework? (engine
kernels vs X prep vs plan-assembly gathers vs launch gaps)."""
import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import powerlaw
from fastsparse.utils.profiling import trace

assert jax.default_backend() == "tpu"

rng = np.random.default_rng(1)
mp = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
op = fs.operator(mp, transpose=False, reorder="degree")
X = jnp.asarray(rng.standard_normal((65_536, 128)), jnp.float32)
f = jax.jit(lambda op, X: op.matmat(X))
Y = f(op, X)
print("warm", float(jnp.sum(Y)), flush=True)

ITERS = 5
logdir = "/tmp/gather_trace"
t0 = time.perf_counter()
with trace(logdir):
    for _ in range(ITERS):
        chk = float(jnp.sum(f(op, X)))
print(f"traced {ITERS} iters in {time.perf_counter() - t0:.2f}s", flush=True)

files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
assert files, "no trace file"
with gzip.open(files[-1], "rt") as f2:
    tr = json.load(f2)
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
spans = []
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
    spans.append((e["ts"], e["ts"] + e.get("dur", 0.0)))
rows = sorted(tot.items(), key=lambda kv: -kv[1])
print(f"{'op':52s} {'ms/iter':>9s} {'n/iter':>7s}")
for name, us in rows[:30]:
    print(f"{name[:52]:52s} {us / 1e3 / ITERS:9.3f} {cnt[name] / ITERS:7.1f}")
print(f"{'TOTAL busy':52s} {sum(tot.values()) / 1e3 / ITERS:9.3f}")
# device idle gaps inside the traced window (launch/sequencing overhead)
spans.sort()
span0, span1 = spans[0][0], max(s[1] for s in spans)
busy = sum(b - a for a, b in spans)
print(f"window {(span1-span0)/1e3/ITERS:.3f} ms/iter, "
      f"gaps {((span1-span0)-busy)/1e3/ITERS:.3f} ms/iter")
