"""Evaluation metrics (PSNR/SSIM) — the reference's intended `scripts/evaluate.py`
capability (empty file in the reference; SURVEY §5 metrics checklist)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


@jax.jit
def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio for images in [0, 1]."""
    m = jnp.maximum(mse(pred, target), 1e-12)
    return -10.0 * jnp.log10(m)
