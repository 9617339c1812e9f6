"""Hypersparse iteration probe: cached operator builds + timing + trace.

Builds the powerlaw-65k² / rmat-s18 operators once, caches the format
pytrees under /tmp/fs_opcache (npz), and in one process measures
wall/busy and prints the XLA-Ops device-time decomposition. Pass
``nocache`` to force a rebuild after format-layout changes.

Usage: probe_hyper2_tpu.py [powerlaw] [rmat] [nocache]
"""
import glob
import gzip
import json
import os
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
from fastsparse.bench.timing import time_fn, time_scan  # noqa: E402
from fastsparse.io.npz_cache import load_npz, save_npz  # noqa: E402
from fastsparse.utils.profiling import trace  # noqa: E402

assert jax.default_backend() == "tpu"
CACHE = "/tmp/fs_opcache"
os.makedirs(CACHE, exist_ok=True)

args = [a for a in sys.argv[1:]]
nocache = "nocache" in args
which = [a for a in args if a != "nocache"] or ["powerlaw", "rmat"]


def build(name):
    path = f"{CACHE}/{name}.npz"
    if name == "rmat":
        m = rmat(18, 16, seed=3)
        kw = dict(reorder="auto", transpose=False)
    else:
        m = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
        kw = dict(reorder="degree", transpose=False)
    if not nocache and os.path.exists(path):
        t0 = time.time()
        op = load_npz(path)
        print(f"{name}: cache load {time.time()-t0:.0f}s", flush=True)
        return m, op
    t0 = time.time()
    op = fs.operator(m, **kw)
    print(f"{name}: build {time.time()-t0:.0f}s", flush=True)
    save_npz(path, op)
    return m, op


def decompose(logdir, iters):
    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
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
        if "XLA Ops" not in tid_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        n = e["name"].split(".")[0]
        tot[n] += e.get("dur", 0.0)
        cnt[n] += 1
    for n, us in sorted(tot.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {n[:48]:48s} {us/1e3/iters:8.2f} ms {cnt[n]/iters:6.1f} calls")
    print(f"  TOTAL {sum(tot.values())/1e3/iters:.2f} ms/iter", flush=True)


rng = np.random.default_rng(0)
for name in which:
    m, op = build(name)
    X = jnp.asarray(rng.standard_normal((m.shape[1], 128)), jnp.float32)
    step = jax.jit(lambda op, X: op.matmat(X))
    Y = np.asarray(step(op, X))
    ref = (m @ np.asarray(X)).astype(np.float64)
    rel = np.abs(Y - ref).max() / np.abs(ref).max()
    print(f"{name} rel {rel:.2e}", flush=True)
    assert rel < 1e-5
    for _ in range(2):
        dt = time_fn(step, op, X, reps=10)
        print(f"{name} wall {dt*1e3:.3f} ms", flush=True)
    try:
        b = time_scan(lambda X: op.matmat(X), X, iters=64)
        print(f"{name} busy {b*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"{name} busy failed:", repr(e)[:100], flush=True)
    logdir = f"/tmp/h2_trace_{name}"
    ITERS = 3
    with trace(logdir):
        for _ in range(ITERS):
            Yd = step(op, X)
        float(jnp.sum(Yd))
    decompose(logdir, ITERS)
