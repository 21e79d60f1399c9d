"""Carry checkpoint/resume.

The reference has no checkpointing (SURVEY.md §5): all state lives in
opaque C structs whose only lifecycle affordance is `_reset()`.  In the
block/carry architecture, the entire runtime state of any chain IS the
carry pytree, so checkpointing is just serializing it — a stream can be
stopped, saved, moved between hosts, and resumed (filter state
exactly; phase accumulators within float32 wrap rounding).
"""
from __future__ import annotations


import numpy as np
import jax

__all__ = ["save_carry", "load_carry"]

_SEP = "::"


def save_carry(path, carry) -> None:
    """Serialize a carry pytree to an .npz file."""
    flat, treedef = jax.tree_util.tree_flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_carry(path, like):
    """Restore a carry saved by save_carry; `like` provides the pytree
    structure (e.g. proc.init(...))."""
    data = np.load(path)
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(flat_like)
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    for got, want in zip(leaves, flat_like):
        if got.shape != np.shape(want):
            raise ValueError(
                f"checkpoint leaf shape {got.shape} does not match "
                f"expected {np.shape(want)}")
    return jax.tree_util.tree_unflatten(treedef, leaves)
