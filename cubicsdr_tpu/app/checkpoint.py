"""Bit-continuous checkpoint/resume of pipeline state.

The reference's "resume" is session XML (frequencies/settings only); filter
internals restart from zero (SURVEY.md §5 checkpoint/resume). Here the
entire carried state pytree (filter histories, NCO phases, EMA trackers) can
be snapshotted to one .npz and restored, so a resumed stream continues
BIT-CONTINUOUSLY from where it stopped — no click, no transient.
"""

from __future__ import annotations

import io
import json

import numpy as np
import jax


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_state(path: str, state, meta: dict | None = None):
    """Serialize any pytree of arrays to an .npz (+ JSON meta)."""
    flat, treedef = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), np.uint8)
    np.savez(path, **arrays)
    return path


def load_state(path: str, like_state):
    """Restore into the same pytree structure as ``like_state`` (e.g. a fresh
    ``pipeline.init_state()``). Returns (state, meta)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) \
            if "__meta__" in z else {}
        flat_like, treedef = jax.tree_util.tree_flatten(like_state)
        flat = []
        for i, ref in enumerate(flat_like):
            arr = z[f"leaf_{i}"]
            assert arr.shape == tuple(np.shape(ref)), (
                f"leaf {i}: checkpoint shape {arr.shape} != "
                f"pipeline shape {np.shape(ref)} — plan changed?")
            flat.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, flat), meta
