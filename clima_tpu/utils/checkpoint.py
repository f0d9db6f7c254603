"""Checkpoint/resume for model state and column-batch sweeps.

The reference has no solver checkpointing (SURVEY.md section 5) — only
warm-start by convention (passing the previous T_surf/T/convecting mask back
into RCE, tests/test_adiabat.f90:186-211). Here that convention becomes an
explicit, durable artifact: the full AdiabatClimate solution state (and any
batched pytree of column states) round-trips through a single ``.npz`` file,
so long parameter sweeps can resume mid-run.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_state", "load_state", "restore_state", "save_pytree", "load_pytree"]

_STATE_FIELDS = [
    "T_surf", "T", "P", "P_surf", "P_trop", "f_i", "f_i_surf", "z", "dz",
    "gravity", "gravity_surf", "densities", "N_atmos", "N_surface", "N_ocean",
    "pdensities", "pradii", "convecting_with_below", "lapse_rate",
    "lapse_rate_intended", "make_column_P_guess",
]


def save_state(c, filename):
    """Save an AdiabatClimate solution state (warm-start checkpoint)."""
    data = {}
    for f in _STATE_FIELDS:
        v = getattr(c, f, None)
        if v is not None:
            data[f] = np.asarray(v)
    data["__meta_nz"] = np.asarray(c.nz)
    data["__meta_ng"] = np.asarray(c.sp.ng)
    np.savez(filename, **data)


def load_state(filename):
    """Load a checkpoint into a dict of arrays."""
    with np.load(filename) as d:
        return {k: d[k] for k in d.files}


def restore_state(c, filename):
    """Restore a checkpoint onto a model (shapes must match)."""
    data = load_state(filename)
    if int(data["__meta_nz"]) != c.nz or int(data["__meta_ng"]) != c.sp.ng:
        raise ValueError("checkpoint shape does not match this model")
    for f in _STATE_FIELDS:
        if f in data:
            cur = getattr(c, f, None)
            v = data[f]
            if np.isscalar(cur) or (cur is not None and np.ndim(cur) == 0):
                setattr(c, f, float(v))
            else:
                setattr(c, f, np.asarray(v))
    return c


def save_pytree(tree, filename):
    """Save an arbitrary pytree of arrays (e.g. batched sweep state)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(
        filename,
        __treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_pytree(filename, treedef_example):
    """Load a pytree saved by save_pytree, using an example for structure."""
    import jax

    with np.load(filename) as d:
        n = len([k for k in d.files if k.startswith("leaf_")])
        leaves = [d[f"leaf_{i}"] for i in range(n)]
    _, treedef = jax.tree_util.tree_flatten(treedef_example)
    return jax.tree_util.tree_unflatten(treedef, leaves)
