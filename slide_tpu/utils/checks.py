"""Numerical sanity guards (SURVEY.md §5.2 — the reference's CUDA_CHECK /
tensor-layout macros become jit-time shape checks plus these explicit
finiteness validators)."""

from __future__ import annotations

import jax
import numpy as np


def tree_nonfinite_paths(tree) -> list[str]:
    """Paths of leaves containing NaN/Inf (host-side; pulls values)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    return bad


def assert_tree_finite(tree, context: str = ""):
    bad = tree_nonfinite_paths(tree)
    if bad:
        raise FloatingPointError(
            f"non-finite values {('in ' + context) if context else ''}: "
            + ", ".join(bad[:10]))
    return tree
