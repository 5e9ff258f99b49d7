"""Classifier-free-guidance denoiser: the CFG-batched UNet call.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``calc_cond_batch`` cond/uncond batching    :2492-2591
  - ``cfg_function`` uncond + (cond−uncond)·s   :2594-2605
  - ``sampling_function``                       :2609
  - ``CONDCrossAttn.concat`` lcm padding        :648-663
  - ``CFGGuider`` prediction plumbing           :2894-3007

TPU design: the reference sizes its cond batch by free VRAM at every step;
XLA wants static shapes, so we always run one UNet call with batch 2·B
(cond ‖ uncond) — exactly the fully-batched fast path the reference takes
when memory allows. Cross-attention contexts of different chunk counts are
repeat-padded to a common length (the reference's lcm trick).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .parameterization import DiscreteSampling


def pad_context_to(cond: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Repeat-pad a (B, L, C) cross-attn cond to target_len (ref :648-663:
    shorter conds are whole-sequence repeated, valid because each 77-chunk is
    a complete CLIP window)."""
    b, l, c = cond.shape
    if l == target_len:
        return cond
    reps = -(-target_len // l)
    return jnp.tile(cond, (1, reps, 1))[:, :target_len]


def common_context_length(*lens: int) -> int:
    out = lens[0]
    for l in lens[1:]:
        out = math.lcm(out, l)
    return out


def make_cfg_denoiser(
    unet_apply,
    params,
    cond: jnp.ndarray,  # (B, Lc, C)
    uncond: jnp.ndarray,  # (B, Lu, C)
    cfg_scale: float,
    model_sampling: DiscreteSampling,
    y_cond: jnp.ndarray | None = None,  # (B, adm) SDXL vector conditioning
    y_uncond: jnp.ndarray | None = None,
    concat: jnp.ndarray | None = None,  # (B, h, w, Cc) inpaint-model cond
):
    """Returns denoise_fn(x, sigma) → x0 prediction with CFG applied.

    x: (B, H, W, 4); sigma: scalar or (B,). One UNet call with batch 2·B:
    [cond ‖ uncond] (ref calc_cond_batch fast path + cfg_function).
    ``y_cond``/``y_uncond``: SDXL ADM vectors, forwarded as unet y.
    ``concat``: channels appended to the pre-scaled input each step — the
    9-channel inpainting UNet family's (mask ‖ masked-image-latent)
    conditioning (beyond the reference's 4-channel-only registry, :6015).
    """
    target = common_context_length(cond.shape[1], uncond.shape[1])
    cond_p = pad_context_to(cond, target)
    uncond_p = pad_context_to(uncond, target)

    def denoise(x, sigma):
        b = x.shape[0]
        # tile (1,L,C) conds across the sample batch (per-sample conds with
        # leading dim b pass through unchanged)
        context = jnp.concatenate(
            [
                jnp.broadcast_to(cond_p, (b,) + cond_p.shape[1:]),
                jnp.broadcast_to(uncond_p, (b,) + uncond_p.shape[1:]),
            ],
            axis=0,
        )
        sigma_b = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,))
        x_in = model_sampling.calculate_input(sigma_b, x)
        if concat is not None:
            cc = jnp.broadcast_to(
                concat, (b,) + concat.shape[1:]
            ).astype(x_in.dtype)
            x_in = jnp.concatenate([x_in, cc], axis=-1)
        t = model_sampling.timestep(sigma_b)
        x2 = jnp.concatenate([x_in, x_in], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        if y_cond is not None:
            y2 = jnp.concatenate(
                [
                    jnp.broadcast_to(y_cond, (b,) + y_cond.shape[1:]),
                    jnp.broadcast_to(y_uncond, (b,) + y_uncond.shape[1:]),
                ],
                axis=0,
            )
            eps2 = unet_apply(params, x2, t2, context, y2)
        else:
            eps2 = unet_apply(params, x2, t2, context)
        den2_in = jnp.concatenate([x, x], axis=0)
        den2 = model_sampling.calculate_denoised(
            jnp.concatenate([sigma_b, sigma_b]), eps2.astype(jnp.float32), den2_in
        )
        d_cond, d_uncond = den2[:b], den2[b:]
        # per-sample guidance scales ((B,)-shaped, the serving frontend's
        # cross-request batching) broadcast over the spatial dims
        scale = jnp.asarray(cfg_scale, jnp.float32)
        if scale.ndim:
            scale = scale.reshape(scale.shape + (1,) * (x.ndim - scale.ndim))
        return d_uncond + (d_cond - d_uncond) * scale

    return denoise


def make_denoiser_single(unet_apply, params, cond, model_sampling,
                         y_cond=None, concat=None):
    """No-CFG denoiser: one cond, UNet batch B instead of 2·B. Used for
    cfg_scale == 1.0 and for the tail of CFG-truncated sampling
    (SDPipeline ``cfg_cutoff``). ``y_cond``: SDXL ADM vector; ``concat``:
    inpaint-model input channels (as in make_cfg_denoiser)."""

    def denoise(x, sigma):
        b = x.shape[0]
        context = jnp.broadcast_to(cond, (b,) + cond.shape[1:])
        sigma_b = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,))
        x_in = model_sampling.calculate_input(sigma_b, x)
        if concat is not None:
            cc = jnp.broadcast_to(
                concat, (b,) + concat.shape[1:]
            ).astype(x_in.dtype)
            x_in = jnp.concatenate([x_in, cc], axis=-1)
        t = model_sampling.timestep(sigma_b)
        if y_cond is not None:
            y = jnp.broadcast_to(y_cond, (b,) + y_cond.shape[1:])
            eps = unet_apply(params, x_in, t, context, y)
        else:
            eps = unet_apply(params, x_in, t, context)
        return model_sampling.calculate_denoised(sigma_b, eps.astype(jnp.float32), x)

    return denoise
