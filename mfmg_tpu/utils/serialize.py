"""Hierarchy serialization: save a built hierarchy, reload without setup.

The reference has no checkpointing (hierarchies are rebuilt every run); here
the hierarchy is a pytree of arrays, so persisting it is a flatten +
``np.savez`` — reloading skips the entire AMGe setup (eigensolves, Galerkin
products), which dominates wall time at scale.  The pytree *structure*
(dataclass types, static fields) is pickled alongside the arrays.

Format: one ``.npz`` with arrays ``arr_0..arr_{n-1}`` plus ``__meta__``
(pickled treedef + config + per-level scipy matrices for the complexity
metrics).
"""

from __future__ import annotations

import io
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def save_hierarchy(hier, path: str) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tuple(hier.levels))
    meta = {
        "treedef": treedef,
        "config": hier.config,
        "A_shapes": list(hier._A_shapes),
        "A_nnzs": list(hier._A_nnzs),
        "dtypes": [str(np.asarray(l).dtype) for l in leaves],
    }
    arrays = {f"arr_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    buf = io.BytesIO()
    pickle.dump(meta, buf)
    arrays["__meta__"] = np.frombuffer(buf.getvalue(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_hierarchy(path: str, problem=None):
    """Rebuild a ready-to-apply Hierarchy from :func:`save_hierarchy` output.

    ``problem`` is optional; when given, rate/CG helpers that need mesh data
    (constrained dofs, n_dofs) work as on a freshly built hierarchy.
    """
    from mfmg_tpu.amge.hierarchy import Hierarchy

    with np.load(path, allow_pickle=False) as z:
        meta = pickle.loads(z["__meta__"].tobytes())
        leaves = []
        for i, dt in enumerate(meta["dtypes"]):
            a = z[f"arr_{i}"]
            if a.dtype.kind == "V":
                # extended dtypes (bfloat16 etc.) round-trip through npz as
                # raw void bytes; re-view them with the recorded dtype
                a = a.view(np.dtype(jnp.dtype(dt).name))
            leaves.append(jnp.asarray(a))
    levels = jax.tree_util.tree_unflatten(meta["treedef"], leaves)

    hier = Hierarchy.__new__(Hierarchy)
    hier.config = meta["config"]
    hier.problem = problem
    hier.dtype = jnp.dtype(hier.config.dtype)
    hier.levels = list(levels)
    hier._A_shapes = meta["A_shapes"]
    hier._A_nnzs = meta["A_nnzs"]
    return hier
