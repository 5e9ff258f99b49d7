"""Masked (inpaint-style) denoising + DifferentialDiffusion.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``KSamplerX0Inpaint``        :2629-2637 (blend noised original outside
    the mask before the model call, restore original after)
  - ``DifferentialDiffusion``    :8945-8965 (per-step threshold of the soft
    mask by normalized timestep — used when noise_mask_feather > 0, :9451)
"""

from __future__ import annotations

import jax.numpy as jnp

from .parameterization import DiscreteSampling


def differential_diffusion_mask_fn(model_sampling: DiscreteSampling):
    """Returns mask_fn(sigma, soft_mask) → binary mask (ref :8951-8965)."""
    ts_from = model_sampling.timestep(model_sampling.sigma_max)
    ts_to = model_sampling.timestep(model_sampling.sigma_min)

    def fn(sigma, mask):
        ts = model_sampling.timestep(sigma)
        threshold = (ts - ts_to) / (ts_from - ts_to)
        return (mask >= threshold).astype(mask.dtype)

    return fn


def make_masked_denoiser(
    denoise_fn,
    latent_orig: jnp.ndarray,  # (B,h,w,4) clean latent
    noise: jnp.ndarray,  # (B,h,w,4) the sampling noise
    mask: jnp.ndarray,  # (B,h,w,1) 1 = region to regenerate
    mask_fn=None,
):
    """Wrap a denoiser with inpaint semantics (ref :2629)."""

    def fn(x, sigma):
        m = mask_fn(sigma, mask) if mask_fn is not None else mask
        m = m.astype(x.dtype)
        sigma_b = jnp.asarray(sigma, jnp.float32)
        while sigma_b.ndim < x.ndim:
            sigma_b = sigma_b[..., None]
        x_blend = x * m + (latent_orig + noise * sigma_b) * (1.0 - m)
        out = denoise_fn(x_blend, sigma)
        return out * m + latent_orig * (1.0 - m)

    return fn


def make_masked_stateful_denoiser(
    denoise_fn,  # (x, sigma, i, state) -> (denoised, state)
    latent_orig: jnp.ndarray,
    noise: jnp.ndarray,
    mask: jnp.ndarray,
    mask_fn=None,
):
    """Stateful-protocol variant of :func:`make_masked_denoiser`, so the
    cached accelerators (DeepCache / guidance-delta / dual) reach the masked
    flows — the detailer's per-seg passes and masked USDU tiles, the
    reference's slowest phases (:10646-10662). The blend wraps the model
    call exactly like the plain variant; the accelerator state threads
    through untouched."""

    def fn(x, sigma, i, state):
        m = mask_fn(sigma, mask) if mask_fn is not None else mask
        m = m.astype(x.dtype)
        sigma_b = jnp.asarray(sigma, jnp.float32)
        while sigma_b.ndim < x.ndim:
            sigma_b = sigma_b[..., None]
        x_blend = x * m + (latent_orig + noise * sigma_b) * (1.0 - m)
        out, state = denoise_fn(x_blend, sigma, i, state)
        return out * m + latent_orig * (1.0 - m), state

    return fn
