"""Save/load compiled execution formats as .npz (SURVEY.md §5.4).

Format conversion (sort + tiling) is the expensive offline step — caching
the bucketed form matters. Any fastsparse pytree (EllMatrix, BsrMatrix,
SparseOperator, RowPartitioned, …) round-trips: array leaves go into the
npz, static structure is pickled alongside via the pytree treedef.
"""
from __future__ import annotations

import pickle

import jax
import numpy as np

__all__ = ["save_npz", "load_npz", "save_npz_sharded", "load_npz_sharded"]


def _enc(a):
    """(storable array, dtype tag): npz can't hold bfloat16 (saves as a
    void dtype that neither numpy nor jax will read back) — store the
    raw bits as uint16 with the dtype name alongside."""
    a = np.asarray(a)
    if a.dtype.kind == "V" or a.dtype.name == "bfloat16":
        return a.view(np.uint16), a.dtype.name
    return a, ""


def _dec(a, tag):
    import jax.numpy as jnp

    if tag:
        import ml_dtypes

        return jnp.asarray(a.view(np.dtype(getattr(ml_dtypes, tag))))
    return jnp.asarray(a)


def save_npz(path, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {}
    tags = []
    for i, leaf in enumerate(leaves):
        arrays[f"leaf_{i}"], tag = _enc(leaf)
        tags.append(tag)
    arrays["__treedef__"] = np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8
    )
    arrays["__dtypes__"] = np.asarray(tags)
    np.savez_compressed(path, **arrays)


def load_npz(path, device=None):
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["__treedef__"].tobytes())
        n = len([k for k in z.files if k.startswith("leaf_")])
        tags = (
            [str(t) for t in z["__dtypes__"]]
            if "__dtypes__" in z.files
            else [""] * n
        )
        leaves = [_dec(z[f"leaf_{i}"], tags[i]) for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)


def save_npz_sharded(prefix, tree, n_shards=None) -> None:
    """Shard-parallel save: one ``{prefix}.shard{p}-of-{P}.npz`` per shard.

    Leaves whose leading axis equals ``n_shards`` (default:
    ``tree.n_shards`` — a `parallel.RowPartitioned`) are split along it;
    anything else is replicated into every shard file. In a multi-host job
    each process saves/loads only its own rows instead of the full matrix
    (SURVEY.md §5.4 / docs/ROADMAP.md item 12) — file p is a self-contained
    checkpoint of shard p.
    """
    if n_shards is None:
        n_shards = getattr(tree, "n_shards", None)
    if n_shards is None:
        raise ValueError("n_shards not given and tree has no .n_shards")
    P = int(n_shards)
    leaves, treedef = jax.tree.flatten(tree)
    td = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    split = [
        np.asarray(leaf).shape[:1] == (P,) for leaf in leaves
    ]
    for p in range(P):
        arrays = {"__treedef__": td, "__shard__": np.array([p, P])}
        tags = []
        for i, leaf in enumerate(leaves):
            a, tag = _enc(leaf)
            tags.append(tag)
            arrays[f"leaf_{i}"] = a[p] if split[i] else a
            arrays[f"split_{i}"] = np.array(split[i])
        arrays["__dtypes__"] = np.asarray(tags)
        np.savez_compressed(f"{prefix}.shard{p}-of-{P}.npz", **arrays)


def load_npz_sharded(prefix, shards=None, sharding=None):
    """Load a sharded checkpoint back into one stacked pytree.

    ``shards=None`` loads every shard (result identical to the tree that
    was saved); an int or list loads a subset (leading axis = number of
    shards requested — each host of a pod loads only its own block).
    ``sharding`` optionally `jax.device_put`s the result (a
    `NamedSharding` over the shard axis places each block on its device).
    """
    import glob as _glob
    import re

    import jax.numpy as jnp

    files = sorted(_glob.glob(f"{prefix}.shard*-of-*.npz"))
    if not files:
        raise FileNotFoundError(f"no shard files matching {prefix}.shard*")
    P = int(re.search(r"-of-(\d+)\.npz$", files[0]).group(1))
    if isinstance(shards, int):
        shards = [shards]
    if shards is None:
        shards = list(range(P))

    per_shard = []
    treedef = None
    split = None
    tags = None
    for p in shards:
        with np.load(f"{prefix}.shard{p}-of-{P}.npz", allow_pickle=False) as z:
            if treedef is None:
                treedef = pickle.loads(z["__treedef__"].tobytes())
                n = len([k for k in z.files if k.startswith("leaf_")])
                split = [bool(z[f"split_{i}"]) for i in range(n)]
                tags = (
                    [str(t) for t in z["__dtypes__"]]
                    if "__dtypes__" in z.files
                    else [""] * n
                )
            per_shard.append([np.asarray(z[f"leaf_{i}"]) for i in range(n)])

    leaves = []
    for i in range(len(split)):
        if split[i]:
            leaves.append(
                jnp.stack([_dec(s[i], tags[i]) for s in per_shard])
            )
        else:
            leaves.append(_dec(per_shard[0][i], tags[i]))
    tree = jax.tree.unflatten(treedef, leaves)
    if sharding is not None:
        tree = jax.device_put(tree, sharding)
    return tree
