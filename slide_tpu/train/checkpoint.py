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


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


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
    with open(path, "wb") as f:
        pickle.dump(states, f)
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
