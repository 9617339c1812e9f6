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

__all__ = ["save_npz", "load_npz"]


def save_npz(path, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_npz(path, device=None):
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["__treedef__"].tobytes())
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)
