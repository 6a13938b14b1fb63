"""Object-store IO with local-filesystem fallback — reference `oss_utils/`
(`oss_io_utils.py:14-162`, `text_oss_io_utils.py:16-45`): every reader/writer
transparently handles plain paths; `s3://` paths route to a pluggable client
(the reference uses petrel; register any client exposing get/put bytes).
"""

from __future__ import annotations

import io
import os
import pickle
from typing import Any, Callable, Optional

import numpy as np
import yaml

_S3_CLIENT: Optional[Any] = None


def register_s3_client(client: Any):
    """Register an object-store client with `.get(path) -> bytes` and
    `.put(path, bytes)` (the petrel-style interface)."""
    global _S3_CLIENT
    _S3_CLIENT = client


def _is_remote(path: str) -> bool:
    return path.startswith("s3://")


def _read_bytes(path: str) -> bytes:
    if _is_remote(path):
        if _S3_CLIENT is None:
            raise RuntimeError(f"no object-store client registered for {path}; "
                               "call register_s3_client() first")
        return _S3_CLIENT.get(path)
    with open(path, "rb") as f:
        return f.read()


def _write_bytes(path: str, data: bytes):
    if _is_remote(path):
        if _S3_CLIENT is None:
            raise RuntimeError(f"no object-store client registered for {path}")
        _S3_CLIENT.put(path, data)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


class NpzIO:
    """(`oss_io_utils.py` Npz_OSS_IO)."""

    def read(self, path: str, update_cache: bool = False) -> dict:
        with np.load(io.BytesIO(_read_bytes(path))) as d:
            return {k: d[k] for k in d.files}

    def write(self, path: str, **arrays):
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        _write_bytes(path, buf.getvalue())


class TextIO:
    """(`text_oss_io_utils.py` Text_OSS_IO): .yaml/.yml parse to objects,
    everything else returns text."""

    def read(self, path: str):
        data = _read_bytes(path).decode("utf-8")
        if path.endswith((".yaml", ".yml")):
            return yaml.safe_load(data)
        return data

    def write(self, path: str, content):
        if path.endswith((".yaml", ".yml")) and not isinstance(content, str):
            content = yaml.safe_dump(content)
        _write_bytes(path, content.encode("utf-8"))


class PickleIO:
    """(`oss_io_utils.py` Torch_OSS_IO equivalent for our pickle
    checkpoints)."""

    def read(self, path: str):
        return pickle.loads(_read_bytes(path))

    def write(self, path: str, obj):
        _write_bytes(path, pickle.dumps(obj))
