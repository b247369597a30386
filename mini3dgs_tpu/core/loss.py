"""Photometric loss: (1-lambda)*L1 + lambda*D-SSIM (JAX).

Reference semantics: `/root/reference/src/core/loss.py` — separable Gaussian
blur SSIM with window K=11, sigma = K/6, C1 = 0.01^2, C2 = 0.03^2, SSIM map
clamped to [0,1] (loss.py:14-39; B11 fixed: forward *returns* mean D-SSIM =
1 - mean(ssim)); total = (1-lambda)*L1 + lambda*D-SSIM with lambda = 0.2
(loss.py:56-58).

TPU notes: the two grouped 1-D convs lower to XLA convolutions that fuse well;
everything is pure and jit/vjp friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

C1 = 0.01 ** 2
C2 = 0.03 ** 2


def _gaussian_window(window_size: int) -> jnp.ndarray:
    x = jnp.arange(window_size, dtype=jnp.float32) - (window_size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2.0 * (window_size / 6.0) ** 2))
    return g / g.sum()


def _blur(img: jnp.ndarray, g1d: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise blur of [B,C,H,W] with 'same' zero padding
    (matches torch grouped conv2d with padding=K//2, loss.py:25-28)."""
    K = g1d.shape[0]
    pad = K // 2
    ch = img.shape[1]
    kx = jnp.tile(g1d.reshape(1, 1, 1, K), (ch, 1, 1, 1))  # [C,1,1,K]
    ky = jnp.tile(g1d.reshape(1, 1, K, 1), (ch, 1, 1, 1))  # [C,1,K,1]
    dn = jax.lax.conv_dimension_numbers(img.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(img, kx, (1, 1), [(0, 0), (pad, pad)],
                                       dimension_numbers=dn, feature_group_count=ch)
    out = jax.lax.conv_general_dilated(out, ky, (1, 1), [(pad, pad), (0, 0)],
                                       dimension_numbers=dn, feature_group_count=ch)
    return out


@partial(jax.jit, static_argnames=("window_size",))
def ssim(pred: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over the image. Inputs [C,H,W] or [B,C,H,W]."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    g1d = _gaussian_window(window_size)
    mu_x = _blur(pred, g1d)
    mu_y = _blur(target, g1d)
    sigma_x = _blur(pred ** 2, g1d) - mu_x ** 2
    sigma_y = _blur(target ** 2, g1d) - mu_y ** 2
    sigma_xy = _blur(pred * target, g1d) - mu_x * mu_y
    ssim_map = ((2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)) / (
        (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2))
    return jnp.clip(ssim_map, 0.0, 1.0).mean()


def dssim(pred: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    return 1.0 - ssim(pred, target, window_size)


def gaussian_loss(rendered: jnp.ndarray, target: jnp.ndarray,
                  lambda_dssim: float = 0.2) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss and components (reference loss.py:46-63)."""
    l1 = jnp.abs(rendered - target).mean()
    d = dssim(rendered, target)
    total = (1.0 - lambda_dssim) * l1 + lambda_dssim * d
    return total, {"l1": l1, "dssim": d, "total_loss": total}
