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


# transient device copy bound per packed fetch: the concatenate materializes
# one extra copy of the chunk, so an unbounded pack of params+opt+EMA would
# spike HBM by the full state size — near-capacity AE runs could OOM at save
_PACK_CHUNK_BYTES = 256 << 20


@jax.jit
def _pack_concat(leaves):
    """Concatenate one chunk of same-(device,dtype) leaves into ONE flat
    device array (module-level jit: retraced once per chunk structure,
    cached for every later checkpoint of the same run)."""
    import jax.numpy as jnp
    return jnp.concatenate([jnp.ravel(x) for x in leaves])


def _fetch_tree(tree):
    """Device pytree -> host numpy pytree with O(dtypes * chunks) transfers.

    Through the remote-tunnel backend every per-leaf ``np.asarray`` pays the
    ~30-40 ms per-call sync floor, so a few-hundred-leaf train state costs
    minutes per checkpoint (measured on the round-4 runtime: the keypoint
    DDPM save took ~150 s and the AE save never finished inside its stage
    timeout).  Packing leaves into flat device arrays under jit makes the
    save bandwidth-bound instead.  Leaves are grouped by (devices, dtype) —
    mixed-placement trees (some leaves left on CPU from host init) must not
    meet in one concatenate — and each group is packed in <=256 MB chunks to
    bound the transient device copy; any pack failure falls back to the
    per-leaf path for that chunk."""
    leaves, treedef = jax.tree.flatten(tree)
    out = [None] * len(leaves)
    groups: dict = {}
    for i, x in enumerate(leaves):
        if not isinstance(x, jax.Array):
            out[i] = np.asarray(x)
            continue
        try:
            devkey = tuple(sorted(str(d) for d in x.devices()))
        except Exception:                                     # noqa: BLE001
            devkey = ("?",)
        groups.setdefault((devkey, np.dtype(x.dtype)), []).append(i)
    for (_devkey, dtype), idxs in groups.items():
        chunks, chunk, chunk_bytes = [], [], 0
        for i in idxs:
            n_bytes = int(leaves[i].size) * dtype.itemsize
            if chunk and chunk_bytes + n_bytes > _PACK_CHUNK_BYTES:
                chunks.append(chunk)
                chunk, chunk_bytes = [], 0
            chunk.append(i)
            chunk_bytes += n_bytes
        if chunk:
            chunks.append(chunk)
        for ch in chunks:
            if len(ch) == 1:
                out[ch[0]] = np.asarray(leaves[ch[0]])
                continue
            try:
                host = np.asarray(_pack_concat([leaves[i] for i in ch]))
            except Exception:                                 # noqa: BLE001
                for i in ch:                   # per-leaf fallback, still saves
                    out[i] = np.asarray(leaves[i])
                continue
            off = 0
            for i in ch:
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


def mirror_checkpoint(path: str, durable_dir: str, keep: int = 1) -> str:
    """Copy a just-saved checkpoint into a durable (git-tracked) directory,
    pruning older mirrored iterations so the tracked tree only ever holds the
    newest `keep`.

    Two VM resets in round 4 each wiped the gitignored runs/ tree and with it
    every training checkpoint — whole campaigns restarted from scratch.  The
    mirror makes a reset cost minutes (restore + resume) instead of the round
    (VERDICT r4 item 1a).  Copy is write-then-rename so a reset mid-copy
    cannot leave a truncated pickle as the restore candidate."""
    import shutil
    os.makedirs(durable_dir, exist_ok=True)
    name = os.path.basename(path)
    dst = os.path.join(durable_dir, name)
    tmp = dst + ".tmp"
    shutil.copyfile(path, tmp)
    os.replace(tmp, dst)
    ckpt_name = name.rsplit("_", 1)[0]
    for it in sorted(_list_iters(durable_dir, ckpt_name))[:-max(1, keep)]:
        try:
            os.remove(os.path.join(durable_dir, f"{ckpt_name}_{it}.pkl"))
        except OSError:
            pass
    return dst


def restore_from_mirror(output_dir: str, durable_dir: str,
                        ckpt_name: str = "pointnet_ckpt") -> Optional[str]:
    """If `output_dir` has no checkpoint (e.g. a VM reset wiped runs/) but the
    durable mirror has one, copy the newest mirrored checkpoint back so
    resume-by-default picks it up.  Returns the restored path or None."""
    if _list_iters(output_dir, ckpt_name):
        return None
    mirrored = _list_iters(durable_dir, ckpt_name)
    if not mirrored:
        return None
    import shutil
    name = f"{ckpt_name}_{max(mirrored)}.pkl"
    os.makedirs(output_dir, exist_ok=True)
    dst = os.path.join(output_dir, name)
    shutil.copyfile(os.path.join(durable_dir, name), dst)
    return dst


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
