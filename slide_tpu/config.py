"""Experiment configuration: the reference's JSON schema
(`data_utils/json_reader.py`, SURVEY.md §5.6) behind a safe reader.

The reference stores lists inside JSON as their `str()` representation and
`eval`s them back (`json_reader.py:7-26`).  We accept BOTH stringified lists
(for drop-in compatibility with the reference's shipped configs) and plain
JSON lists, using `ast.literal_eval` instead of `eval`.

Top-level sections (same schema as the reference):
  diffusion_config | standard_diffusion_config, pointnet_config,
  train_config, shapenet_psr_dataset_config, dist_config, dpsr_config,
  autoencoder_config.
"""

from __future__ import annotations

import ast
import copy
import json
import os
from typing import Any


def _restore(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _restore(v) for k, v in node.items()}
    if isinstance(node, str):
        try:
            v = ast.literal_eval(node)
        except (ValueError, SyntaxError):
            return node
        if isinstance(v, list):
            return _restore_lists_only(v)
        return node
    return node


def _restore_lists_only(v):
    # nested lists come back fully evaluated by literal_eval already
    return v


def restore_lists(config: dict) -> dict:
    """`restore_string_to_list_in_a_dict` equivalent: recursively convert
    stringified lists back to lists."""
    return _restore(config)


def stringify_lists(config: dict) -> dict:
    """`replace_list_with_string_in_a_dict` equivalent, for writing configs in
    the reference's on-disk form."""
    out = {}
    for k, v in config.items():
        if isinstance(v, list):
            out[k] = str(v)
        elif isinstance(v, dict):
            out[k] = stringify_lists(v)
        else:
            out[k] = v
    return out


def read_json_file(path: str) -> dict:
    with open(path) as f:
        config = json.load(f)
    return restore_lists(config)


def write_json_file(path: str, config: dict, reference_style: bool = False):
    cfg = stringify_lists(copy.deepcopy(config)) if reference_style else config
    with open(path, "w") as f:
        json.dump(cfg, f, indent=4)


def find_config_file(file_name: str) -> str:
    """Config discovery (`pointnet2/util.py:322-351`): given a config path or
    a directory, return the config json — preferring the file with the largest
    number in its name (checkpoint-iteration convention)."""
    import re

    if "config" in file_name and file_name.endswith(".json"):
        if os.path.isfile(file_name):
            return file_name
        file_path = os.path.split(file_name)[0]
    elif os.path.isdir(file_name):
        file_path = file_name
    else:
        raise FileNotFoundError(file_name)
    files = [f for f in os.listdir(file_path)
             if "config" in f and f.endswith(".json")]
    if not files:
        raise FileNotFoundError(f"no config json under {file_path}")
    best, best_num = files[0], -1
    for f in files:
        nums = [int(n) for n in re.findall(r"\d+", f)]
        num = max(nums) if nums else -1
        if num > best_num:
            best, best_num = f, num
    return os.path.join(file_path, best)


def autoencoder_read_config(config_dir: str, config: dict):
    """Resolve the autoencoder's config tree: the main config points at an
    encoder config file and a list of decoder config files
    (`json_reader.py:35-43`)."""
    pc = config["pointnet_config"]
    encoder = read_json_file(os.path.join(config_dir, pc["encoder_config_file"]))
    decoders = [read_json_file(os.path.join(config_dir, f))
                for f in pc["decoder_config_file"]]
    return encoder["pointnet_config"], [d["pointnet_config"] for d in decoders]
