"""SSIM — the perceptual-parity metric for bf16 acceptance (BASELINE.md:
"perceptual (SSIM) parity at bf16, same seeds & sampler settings").

Standard Wang et al. SSIM with an 11×11 gaussian window, computed in jnp
(runs on TPU for large batches, CPU for tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    w = np.outer(g, g)
    return jnp.asarray(w, jnp.float32)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over (B,H,W,C) images in [0,max_val]. Returns (B,)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    w = _gaussian_window(window_size, sigma)
    ch = a.shape[-1]
    kernel = jnp.zeros((window_size, window_size, ch, ch), jnp.float32)
    for c in range(ch):
        kernel = kernel.at[:, :, c, c].set(w)

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sa = filt(a * a) - mu_aa
    sb = filt(b * b) - mu_bb
    sab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sab + c2)) / (
        (mu_aa + mu_bb + c1) * (sa + sb + c2)
    )
    # fp32 cancellation in filt(x*x) - mu² can nudge a window's variance
    # slightly negative, overshooting SSIM past 1 on near-identical pairs
    # (printed "1.0001" in bench rows); per-window SSIM is in [-1, 1]
    return jnp.clip(s, -1.0, 1.0).mean(axis=(1, 2, 3))
