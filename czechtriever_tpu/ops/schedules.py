"""Learning-rate schedules as optax-compatible scalar functions.

Exact math of the reference schedulers (/root/reference/src/utils.py:99-134),
including the `ratio` floor semantics — and fixing the reference's
CosineScheduler NameError (`math` unimported, src/utils.py:134) by
construction.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_linear(step, warmup: int, total: int, ratio: float = 0.0):
    """WarmupLinearScheduler.lr_lambda (src/utils.py:108-118).

    warmup phase: (1 - ratio) * step / warmup   (note: reaches 1-ratio, not 1)
    decay phase:  max(0, 1 + (ratio - 1) * (step - warmup) / (total - warmup))
    Returns the lr *multiplier* (multiply by base lr).
    """
    step = jnp.asarray(step, dtype=jnp.float32)
    w = jnp.float32(max(1, warmup))
    warm = (1.0 - ratio) * step / w
    denom = jnp.float32(max(1.0, total - warmup))
    decay = jnp.maximum(0.0, 1.0 + (ratio - 1.0) * (step - warmup) / denom)
    return jnp.where(step < warmup, warm, decay)


def cosine(step, warmup: int, total: int, ratio: float = 0.1):
    """CosineScheduler.lr_lambda (src/utils.py:130-134)."""
    step = jnp.asarray(step, dtype=jnp.float32)
    w = jnp.float32(max(1, warmup))
    warm = step / w
    s = (step - warmup) / jnp.float32(max(1, total - warmup))
    decay = ratio + (1.0 - ratio) * jnp.cos(0.5 * jnp.pi * s)
    return jnp.where(step < warmup, warm, decay)


def make_schedule(name: str, lr: float, warmup: int, total: int, ratio: float):
    """optax-style schedule fn: step -> learning rate (src/utils.py:154-165)."""
    warmup = max(0, warmup)
    if name == "linear":
        return lambda step: lr * warmup_linear(step, warmup, total, ratio)
    if name == "cosine":
        return lambda step: lr * cosine(step, warmup, total, ratio)
    raise ValueError(f"unknown scheduler: {name}")
