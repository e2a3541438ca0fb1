"""Warmup-cosine learning-rate factor (reference utils/scheduler.py:5-9).

The reference steps its LambdaLR on FRACTIONAL epochs (runner.py:168:
``lr_scheduler.step(epoch + batch/len)``); here the factor is a pure
function of fractional progress so it drops into optax schedules directly.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_factor(progress, total: float, warmup: float, alpha: float):
    """progress/total/warmup in the same units (epochs or steps)."""
    progress = jnp.asarray(progress, jnp.float32)
    warm = 0.1 + 0.9 * progress / jnp.maximum(warmup, 1e-8)
    cos = (jnp.cos(jnp.pi * (progress - warmup) / (total - warmup)) + 1.0) \
        * 0.5 * (1 - alpha) + alpha
    if warmup <= 0:
        return cos
    return jnp.where(progress < warmup, warm, cos)


def cos_anneal_ratio(progress, anneal_end: float):
    """NeuS cosine-anneal ratio (runner.py:394-398)."""
    if anneal_end <= 0:
        return 1.0
    return min(1.0, float(progress) / anneal_end)
