"""Model-size reporting (`util.py:117-126`)."""

from __future__ import annotations

import numpy as np
import jax


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def print_size(params, name: str = "network"):
    print("{} Parameters: {:.6f}M".format(name, param_count(params) / 1e6),
          flush=True)
    return param_count(params)
