"""Checkpointing with the reference's logical contents and naming contract
(`train.py:247-254`, SURVEY.md §5.4):

  <output_dir>/pointnet_ckpt_<iter>.pkl
  { iter, model_state_dict, optimizer_state_dict, training_time_seconds
    [, ema_state_list] }

Payload is a python pickle of numpy-ified pytrees (framework-portable, no
torch).  Resume-by-default: scan for the max iteration, fall back to scratch
on any load error (`train.py:130-158`, `find_max_epoch` `util.py:57-114`).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import numpy as np


@jax.jit
def _pack_groups(groups):
    """Concatenate each group of same-dtype leaves into ONE flat device
    array, so the host fetch is one transfer per dtype instead of one per
    leaf (module-level jit: retraced once per state structure, cached for
    every later checkpoint of the same run)."""
    import jax.numpy as jnp
    return [jnp.concatenate([jnp.ravel(x) for x in g]) for g in groups]


def _fetch_tree(tree):
    """Device pytree -> host numpy pytree with O(dtypes) transfers.

    Through the remote-tunnel backend every per-leaf ``np.asarray`` pays the
    ~30-40 ms per-call sync floor, so a few-hundred-leaf train state costs
    minutes per checkpoint (measured on the round-4 runtime: the keypoint
    DDPM save took ~150 s and the AE save never finished inside its stage
    timeout).  Packing all leaves into one flat device array per dtype under
    jit makes the save bandwidth-bound instead."""
    leaves, treedef = jax.tree.flatten(tree)
    dev_idx = [i for i, x in enumerate(leaves) if isinstance(x, jax.Array)]
    if not dev_idx:
        return jax.tree.map(np.asarray, tree)
    dev_set = set(dev_idx)
    out = [None] * len(leaves)
    for i, x in enumerate(leaves):
        if i not in dev_set:
            out[i] = np.asarray(x)
    groups: dict = {}
    for i in dev_idx:
        groups.setdefault(np.dtype(leaves[i].dtype), []).append(i)
    idx_groups = list(groups.values())
    packed = _pack_groups([[leaves[i] for i in idxs] for idxs in idx_groups])
    for idxs, flat in zip(idx_groups, packed):
        host = np.asarray(flat)                  # ONE fetch per dtype
        off = 0
        for i in idxs:
            shp = leaves[i].shape
            n = int(np.prod(shp)) if shp else 1
            out[i] = host[off:off + n].reshape(shp)
            off += n
    return jax.tree.unflatten(treedef, out)


def _to_numpy(tree):
    return _fetch_tree(tree)


def _list_iters(path: str, ckpt_name: str):
    if not os.path.isdir(path):
        return []
    iters = []
    for f in os.listdir(path):
        if f.startswith(ckpt_name + "_") and f.endswith(".pkl") and "best" not in f:
            try:
                iters.append(int(f[len(ckpt_name) + 1:-4]))
            except ValueError:
                pass
    return iters


def find_max_iter(path: str, ckpt_name: str = "pointnet_ckpt",
                  mode: str = "max"):
    """Checkpoint selection (`util.py:57-114`): 'max' -> newest iteration (or
    -1), 'all' -> iterations sorted descending, 'best' -> the iteration with
    the lowest avg_cd in ../../eval_result/gathered_eval_result.pkl."""
    iters = _list_iters(path, ckpt_name)
    if mode == "max":
        return max(iters) if iters else -1
    if mode == "all":
        return sorted(iters, reverse=True)
    if mode == "best":
        eval_file = os.path.join(path, "..", "..", "eval_result",
                                 "gathered_eval_result.pkl")
        with open(eval_file, "rb") as f:
            data = pickle.load(f)
        import numpy as _np
        idx = int(_np.argmin(_np.asarray(data["avg_cd"])))
        return data["iter"][idx]
    raise ValueError(f"{mode} mode is not supported")


def save_checkpoint(output_dir: str, n_iter: int, params, opt_state,
                    training_time_seconds: int, ema_state_list=None,
                    ckpt_name: str = "pointnet_ckpt") -> str:
    os.makedirs(output_dir, exist_ok=True)
    states = {
        "iter": n_iter,
        "model_state_dict": _to_numpy(params),
        "optimizer_state_dict": _to_numpy(opt_state),
        "training_time_seconds": int(training_time_seconds),
    }
    if ema_state_list is not None:
        states["ema_state_list"] = [_to_numpy(e) for e in ema_state_list]
    path = os.path.join(output_dir, f"{ckpt_name}_{n_iter}.pkl")
    # write-then-rename: a stage timeout (SIGTERM) mid-save must not leave a
    # truncated pickle where resume/eval will pick it as the max iteration
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(states, f)
    os.replace(tmp, path)
    return path


def load_checkpoint(output_dir: str, n_iter: Optional[int] = None,
                    ckpt_name: str = "pointnet_ckpt") -> Optional[dict]:
    """Load iteration `n_iter` (default: max found).  Returns None if there is
    no loadable checkpoint (scratch start)."""
    try:
        if n_iter is None:
            n_iter = find_max_iter(output_dir, ckpt_name)
        if n_iter < 0:
            return None
        path = os.path.join(output_dir, f"{ckpt_name}_{n_iter}.pkl")
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception as e:                                    # noqa: BLE001
        print(f"checkpoint load failed ({e}); starting from scratch", flush=True)
        return None
