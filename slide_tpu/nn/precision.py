"""Process-wide activation-dtype switch for mixed-precision training.

The AE/SAP train steps are HBM-bandwidth-bound (measured: 213 GB accessed
per B=32 AE step vs 2.3 TFLOP — benchmarks/profile_ae.py), so halving
activation bytes is the first-order speedup.  `set_activation_dtype
(jnp.bfloat16)` makes every Dense/GroupNorm in the network bodies compute in
bf16 (flax casts inputs and params at use; PARAMS and the optimizer state
stay f32, and flax normalization layers keep their mean/var statistics in
f32).  Everything precision-critical is unaffected:

  - neighbor selection / chamfer distances go through
    `ops.neighbors.pairwise_sqdist`, which casts to f32 and runs HIGHEST
    (bf16 corrupts neighbor ordering — CLAUDE.md);
  - losses are reduced in f32 (bf16 inputs promote at the f32 targets);
  - the fused Pallas denoiser has its own precision policy.

Default is None (full f32) — weight-copy parity tests against the torch
reference rely on it.  The dtype is read at TRACE time: set it before
building/jitting a train step; changing it later does not retrace existing
compiled functions.

No reference counterpart (the reference trains pure f32 on A100s); this is
the TPU-native answer to its training-throughput story
(`README_training.md:25-77`).
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax.numpy as jnp

_ACT_DTYPE: Optional[object] = None
_NAMES = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
          "float32": None, "f32": None, "none": None, "": None}


def _drop_stale_jit_caches() -> None:
    """The activation dtype is read at TRACE time; dropping jax's trace/
    executable caches keeps an already-jitted step from silently retaining
    the previous mode (ADVICE r3: stale-toggle hazard)."""
    import jax
    jax.clear_caches()


def set_activation_dtype(dtype) -> None:
    """dtype: jnp dtype, a name ('bfloat16'/'float32'), or None for f32."""
    global _ACT_DTYPE
    if isinstance(dtype, str):
        key = dtype.lower()
        if key not in _NAMES:
            raise ValueError(f"unknown activation dtype {dtype!r}")
        dtype = _NAMES[key]
    if dtype is not _ACT_DTYPE:
        _ACT_DTYPE = dtype
        _drop_stale_jit_caches()


def activation_dtype():
    """Current activation compute dtype (None = f32, flax's default)."""
    return _ACT_DTYPE


@contextlib.contextmanager
def activation_dtype_scope(dtype):
    """Temporarily set the activation dtype.  Trace AND run inside this:
    entering/exiting drops jax's trace caches, so a function traced inside
    the scope retraces under the restored dtype once the scope exits."""
    prev = _ACT_DTYPE
    set_activation_dtype(dtype)
    try:
        yield
    finally:
        set_activation_dtype(prev)


# honor the env switch at import (lets CLI/benchmarks opt in without code);
# a typo'd value must not crash every `import slide_tpu.*` — warn and keep
# the f32 default instead (the opt-in feature fails soft, nothing else does)
try:
    set_activation_dtype(os.environ.get("SLIDE_TPU_ACT_DTYPE", ""))
except ValueError as _e:
    import warnings
    warnings.warn(f"ignoring invalid SLIDE_TPU_ACT_DTYPE: {_e}; "
                  "activations stay float32", stacklevel=1)


def Dense(*args, **kwargs):
    """`nn.Dense` computing in the current activation dtype (f32 params)."""
    from flax import linen as nn
    kwargs.setdefault("dtype", activation_dtype())
    return nn.Dense(*args, **kwargs)


def GroupNorm(*args, **kwargs):
    """`nn.GroupNorm` emitting the current activation dtype (f32 stats —
    flax computes normalization statistics in float32 for half inputs)."""
    from flax import linen as nn
    kwargs.setdefault("dtype", activation_dtype())
    return nn.GroupNorm(*args, **kwargs)
