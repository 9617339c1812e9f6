"""Test configuration.

Per SURVEY.md §4.3: the whole suite runs on CPU with 8 fake devices so the
real `shard_map` + collective code paths execute in one process without a
pod; x64 is enabled so fp64 parity (rtol 1e-10, BASELINE.json:5) is testable
(TPU fp64 is emulated/slow — CPU is the fp64 oracle platform). These env
vars must be set before jax initializes a backend, hence at conftest import
time.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The runner environment pre-imports jax via a sitecustomize hook (PYTHONPATH
# /root/.axon_site) with JAX_PLATFORMS=axon, so the env vars above can be too
# late — force the config directly. Backends are not yet initialized at
# conftest-import time, so this still takes effect.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _check_devices():
    assert jax.device_count() >= 8, "expected 8 fake CPU devices"


def random_csr(nrow, ncol, density, seed, dtype=np.float64, binary=False):
    """Random scipy CSR test matrix."""
    rng = np.random.default_rng(seed)
    m = sp.random(
        nrow, ncol, density=density, format="csr", random_state=rng, dtype=np.float64
    )
    if binary:
        m.data[:] = 1.0
    return m.astype(dtype)


def powerlaw_csr(nrow, ncol, nnz, seed, dtype=np.float64, alpha=1.1):
    """Scale-free-ish matrix: Zipf-distributed row and column popularity
    (BASELINE.json:8's power-law config)."""
    rng = np.random.default_rng(seed)
    r = (nrow * (rng.random(nnz) ** alpha)).astype(np.int64) % nrow
    c = (ncol * (rng.random(nnz) ** alpha)).astype(np.int64) % ncol
    v = rng.standard_normal(nnz)
    m = sp.coo_matrix((v, (r, c)), shape=(nrow, ncol))
    m.sum_duplicates()
    return m.tocsr().astype(dtype)


def adversarial_cases():
    """Empty rows, dense rows, empty matrix, single column — SURVEY.md §4.1."""
    cases = []
    # empty matrix
    cases.append(("empty", sp.csr_matrix((16, 24))))
    # one fully dense row among empties
    m = np.zeros((16, 24))
    m[3, :] = np.arange(24) + 1.0
    cases.append(("dense_row", sp.csr_matrix(m)))
    # single column used by all rows
    m = np.zeros((16, 24))
    m[:, 7] = 2.0
    cases.append(("hot_col", sp.csr_matrix(m)))
    # tall skinny
    cases.append(("tall", sp.random(257, 3, density=0.4, random_state=0, format="csr")))
    # wide flat
    cases.append(("wide", sp.random(3, 257, density=0.4, random_state=1, format="csr")))
    return cases
