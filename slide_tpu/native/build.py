"""Compile-on-first-use loader for the C++ runtime pieces.

Sources live next to this file; each is built once into
`_<name>_<srchash>.so` in the same directory (falling back to a per-user
cache dir if the package dir is read-only) and loaded with ctypes.  A stale
hash in the filename invalidates old builds automatically.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE: dict[str, ctypes.CDLL | None] = {}


def native_enabled() -> bool:
    return os.environ.get("SLIDE_TPU_NATIVE", "1") != "0"


def _build_dir() -> str:
    if os.access(_DIR, os.W_OK):
        return _DIR
    d = os.path.join(tempfile.gettempdir(),
                     f"slide_tpu_native_{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.stat(d)
    if st.st_uid != os.getuid() or (st.st_mode & 0o077):
        # a shared-tmp dir we don't exclusively own could hold a pre-planted
        # .so (the digest is computable from public sources); never load
        # libraries from it — use a fresh private dir (no cross-process cache)
        d = tempfile.mkdtemp(prefix="slide_tpu_native_")
    return d


def load_library(name: str) -> ctypes.CDLL | None:
    """Build (if needed) and load `<name>.cpp`; None if disabled or the
    toolchain is unavailable (callers fall back to numpy)."""
    if name in _CACHE:
        return _CACHE[name]
    lib = _load_uncached(name) if native_enabled() else None
    _CACHE[name] = lib
    return lib


def _load_uncached(name: str) -> ctypes.CDLL | None:
    src = os.path.join(_DIR, name + ".cpp")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    so = os.path.join(_build_dir(), f"_{name}_{digest}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-fopenmp", src, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            os.replace(tmp, so)      # atomic: racing processes both succeed
        except (subprocess.SubprocessError, OSError):
            # retry without OpenMP (minimal toolchains)
            try:
                cmd.remove("-fopenmp")
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=300)
                os.replace(tmp, so)
            except (subprocess.SubprocessError, OSError, ValueError):
                return None
    try:
        return ctypes.CDLL(so)
    except OSError:
        return None
