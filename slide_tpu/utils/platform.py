"""Backend-topology helpers.

The development chip is reached through a remote tunnel ("axon") whose
runtime has very different cost characteristics from a directly-attached
device: per-call arg-tree overhead ~0.7 s, device->host ~10-20 MB/s, and
buffer DONATION forces round-trips (~4 s/call measured; newer runtime
versions reject donated executions outright with INVALID_ARGUMENT).  Code
paths that would donate or fetch aggressively must detect the tunnel.

Detection can't rely on `jax.default_backend() == "axon"`: newer tunnel
runtimes register the platform as plain "tpu".  The stable signal is the
JAX_PLATFORMS env var the image's sitecustomize sets for tunnel sessions.
"""

from __future__ import annotations

import os

import jax


def is_remote_tunnel() -> bool:
    """True when the default backend is the remote-tunnel ("axon") TPU.

    Checks both the legacy platform name and the JAX_PLATFORMS env var
    (newer tunnel runtimes report default_backend() == "tpu").
    """
    if jax.default_backend() == "axon":
        return True
    platforms = (os.environ.get("JAX_PLATFORMS") or "").lower()
    return "axon" in platforms


def donation_safe() -> bool:
    """Whether donate_argnums is safe/profitable on the default backend."""
    return not is_remote_tunnel()
