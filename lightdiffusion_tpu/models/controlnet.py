"""ControlNet (SD1.x family) — spatial conditioning residuals.

"Adding Conditional Control to Text-to-Image Diffusion Models"
(arXiv 2302.05543): a trainable copy of the UNet's encoder half consumes the
latent + an image-space hint (canny/depth/pose map) and emits one residual
per encoder block plus one for the middle block, each through a zero-init
1×1 conv; the frozen UNet adds them to its skip connections. ABSENT in the
reference (no spatial conditioning of any kind) — capability extension.

Layout mirrors the LDM ``control_model.`` checkpoint tree:
  time_embed.{0,2}, input_blocks.* (identical to the UNet encoder),
  middle_block.{0,1,2}, zero_convs.i.0 (one per input block),
  middle_block_out.0, input_hint_block.{0,2,...,14} (8 convs, stride-2 at
  indices 2/4/6 halving hint resolution ×8 to latent resolution).

Reuses models/unet.py's plan/block machinery, so any UNetConfig the sniffing
supports works as a control encoder (SD1.5 and SD2.x)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import layers as L
from . import unet as U

# image-hint encoder channel ladder (fixed by the ControlNet release)
HINT_CHANNELS = (16, 16, 32, 32, 96, 96, 256)
_HINT_STRIDES = (1, 1, 2, 1, 2, 1, 2)  # ×8 total downsample


def apply_hint_block(params, hint, policy):
    """hint: (B, H·8, W·8, 3) in [0,1] → (B, H, W, model_channels)."""
    h = hint.astype(policy.compute_dtype)
    for p, stride in zip(params["convs"], _HINT_STRIDES):
        h = L.conv2d(p, h, stride=stride,
                     padding=[(1, 1), (1, 1)] if stride == 2 else "SAME",
                     policy=policy)
        h = L.silu(h)
    return L.conv2d(params["out"], h, policy=policy)  # zero conv, no act


def apply_controlnet(
    params,
    x: jnp.ndarray,  # (B, H, W, 4) latent (pre-scaled model input)
    hint: jnp.ndarray,  # (B, H·8, W·8, 3) conditioning image
    timesteps: jnp.ndarray,  # (B,)
    context: jnp.ndarray,  # (B, T, ctx)
    y: jnp.ndarray | None = None,  # (B, adm_in) SDXL ADM vector
    cfg: U.UNetConfig = U.SD15_UNET,
    policy: L.Policy = L.DEFAULT_POLICY,
):
    """Returns (per-input-block residuals tuple, middle residual) — consumed
    by ``apply_unet(..., control=...)``. SDXL-layout controlnets carry their
    own ADM label embedding; pass the same ``y`` the UNet receives."""
    input_plan, _ = U.build_plan(cfg)
    emb = U._time_label_emb(params, timesteps, y, cfg, policy)

    h = x.astype(policy.compute_dtype)
    context = context.astype(policy.compute_dtype)
    guided = apply_hint_block(params["hint"], hint, policy)

    outs = []
    for i, (spec, p, zc) in enumerate(
        zip(input_plan, params["input_blocks"], params["zero_convs"])
    ):
        h = U._block_apply(spec, p, h, emb, context, cfg, policy)
        if i == 0:
            h = h + guided
        outs.append(L.conv2d(zc, h, policy=policy))

    mid_ch = cfg.model_channels * cfg.channel_mult[-1]
    h = U.resblock_apply(params["middle"]["res1"], h, emb, policy)
    h = U.spatial_transformer_apply(
        params["middle"]["attn"], h, context, cfg.heads_for(mid_ch), policy,
        cfg.attn_force,
    )
    h = U.resblock_apply(params["middle"]["res2"], h, emb, policy)
    mid = L.conv2d(params["middle_out"], h, policy=policy)
    return tuple(outs), mid


# ------------------------------------------------------------------ init ----
def init_controlnet_params(key, cfg: U.UNetConfig = U.SD15_UNET,
                           hint_channels: int = 3, dtype=jnp.float32):
    """Random-init (zero convs at zero, per the paper's zero-initialization).
    Reuses the full UNet init and keeps the encoder halves — ~2× the needed
    init work, acceptable because random-init controlnets only appear in
    tests/smoke runs (real loads go through convert_controlnet)."""
    input_plan, _ = U.build_plan(cfg)
    full = U.init_unet_params(key, cfg, dtype=dtype)
    ks = jax.random.split(jax.random.fold_in(key, 1), len(HINT_CHANNELS) + 1)
    convs = []
    c_in = hint_channels
    for i, c_out in enumerate(HINT_CHANNELS):
        convs.append(L.init_conv2d(ks[i], 3, 3, c_in, c_out, dtype=dtype))
        c_in = c_out
    hint_out = L.init_conv2d(ks[-1], 3, 3, c_in, cfg.model_channels,
                             dtype=dtype)
    hint_out["weight"] = jnp.zeros_like(hint_out["weight"])

    def zero_conv(ch):
        return {
            "weight": jnp.zeros((1, 1, ch, ch), dtype),
            "bias": jnp.zeros((ch,), dtype),
        }

    out = {
        "time_fc1": full["time_fc1"],
        "time_fc2": full["time_fc2"],
        "input_blocks": full["input_blocks"],
        "middle": {
            "res1": full["middle"]["res1"],
            "attn": full["middle"]["attn"],
            "res2": full["middle"]["res2"],
        },
        "middle_out": zero_conv(
            cfg.model_channels * cfg.channel_mult[-1]
        ),
        "zero_convs": tuple(
            zero_conv(spec.ch_out) for spec in input_plan
        ),
        "hint": {"convs": tuple(convs), "out": hint_out},
    }
    if cfg.adm_in_channels:  # SDXL-layout: controlnet has its own ADM MLP
        out["label_fc1"] = full["label_fc1"]
        out["label_fc2"] = full["label_fc2"]
    return out
