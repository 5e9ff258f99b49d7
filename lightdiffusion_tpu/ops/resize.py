"""Latent/image resampling: bislerp, standard filters, center-crop scaling.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``bislerp``          :429-518 (bilinear positions, spherical interpolation
    of channel vectors with magnitude lerp)
  - ``common_upscale``   :521 (optional center crop + method dispatch)
  - ``LatentUpscale``    :6639 (the hires-fix ×2 latent upscale)

All NHWC, pure jnp (device-resident; replaces torch F.interpolate and the
CPU PIL paths where tensors are involved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

UPSCALE_METHODS = ["nearest-exact", "bilinear", "area", "bicubic", "lanczos", "bislerp"]


def _bilinear_coords(l_old: int, l_new: int):
    """Source gather indices + fractional ratios for align_corners=False
    bilinear (matches torch F.interpolate semantics the reference relies on)."""
    i = jnp.arange(l_new, dtype=jnp.float32)
    src = jnp.clip((i + 0.5) * (l_old / l_new) - 0.5, 0.0, l_old - 1)
    c1 = jnp.floor(src).astype(jnp.int32)
    c2 = jnp.minimum(c1 + 1, l_old - 1)
    return src - c1, c1, c2


def _slerp(b1, b2, r):
    """Spherical interpolation of channel vectors with magnitude lerp
    (ref :434-466). b1/b2: (..., C); r: (..., 1)."""
    norm1 = jnp.linalg.norm(b1, axis=-1, keepdims=True)
    norm2 = jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b1n = b1 / jnp.maximum(norm1, 1e-12)
    b2n = b2 / jnp.maximum(norm2, 1e-12)
    dot = jnp.sum(b1n * b2n, axis=-1, keepdims=True)
    omega = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    so = jnp.sin(omega)
    safe_so = jnp.where(jnp.abs(so) < 1e-7, 1.0, so)
    res = (
        jnp.sin((1.0 - r) * omega) / safe_so * b1n
        + jnp.sin(r * omega) / safe_so * b2n
    )
    res = res * (norm1 * (1.0 - r) + norm2 * r)
    lerp = b1 * (1.0 - r) + b2 * r
    return jnp.where(jnp.abs(dot) > 0.9995, lerp, res)


def bislerp(x: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """(B,H,W,C) → (B,height,width,C) with slerp'd channel vectors."""
    b, h, w, c = x.shape
    # width pass
    rw, c1, c2 = _bilinear_coords(w, width)
    x = _slerp(x[:, :, c1, :], x[:, :, c2, :], rw[None, None, :, None])
    # height pass
    rh, r1, r2 = _bilinear_coords(h, height)
    x = _slerp(x[:, r1, :, :], x[:, r2, :, :], rh[None, :, None, None])
    return x


def resize(x: jnp.ndarray, width: int, height: int, method: str) -> jnp.ndarray:
    """NHWC resize by named method."""
    b, h, w, c = x.shape
    if method == "bislerp":
        return bislerp(x, width, height)
    if method in ("nearest", "nearest-exact"):
        m = "nearest"
    elif method == "bilinear":
        m = "linear"
    elif method == "bicubic":
        m = "cubic"
    elif method == "lanczos":
        m = "lanczos3"
    elif method == "area":
        # antialiased linear ≈ area averaging for downscale; plain linear up
        return jax.image.resize(
            x, (b, height, width, c), "linear",
            antialias=(height < h or width < w),
        )
    else:
        raise ValueError(f"unknown upscale method {method!r}")
    antialias = method == "lanczos" or height < h or width < w
    return jax.image.resize(x, (b, height, width, c), m, antialias=antialias)


def common_upscale(
    x: jnp.ndarray, width: int, height: int, method: str, crop: str = "disabled"
) -> jnp.ndarray:
    """Optional center crop to target aspect, then resize (ref :521)."""
    b, h, w, c = x.shape
    if crop == "center":
        old_aspect = w / h
        new_aspect = width / height
        if old_aspect > new_aspect:
            new_w = round(h * new_aspect)
            off = (w - new_w) // 2
            x = x[:, :, off : off + new_w, :]
        elif old_aspect < new_aspect:
            new_h = round(w / new_aspect)
            off = (h - new_h) // 2
            x = x[:, off : off + new_h, :, :]
    return resize(x, width, height, method)
