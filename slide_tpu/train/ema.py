"""Exponential moving averages of parameters (`data_utils/ema.py:4-54`).

The reference keeps EMA shadows only on rank 0 and broadcasts for evaluation
(`train.py:118-122, 273-284`); with replicated params under pjit the shadows
are just replicated pytrees updated inside the jitted step — no rank
special-casing (SURVEY.md §2.3 row 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EMA_DEFAULT_RATES = (0.999, 0.9999)


def ema_init(params, rates):
    """One shadow copy per rate.  The copies must be REAL copies: aliasing the
    param buffers makes later donated train steps attempt to donate the same
    buffer twice (XLA Execute() error that wedges multi-device collectives)."""
    return tuple(jax.tree.map(jnp.copy, params) for _ in rates)


def ema_update(shadows, params, rates):
    """shadow <- mu * shadow + (1 - mu) * param  (`ema.py:20-24`)."""
    return tuple(
        jax.tree.map(lambda s, p: mu * s + (1.0 - mu) * p, shadow, params)
        for shadow, mu in zip(shadows, rates))
