"""TAESD tiny autoencoder — live latent previews.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``Encoder2``/``Decoder2``/``TAESD``  :683-760 (64-ch conv blocks,
    Clamp = 3·tanh(x/3), scale/unscale latents with magnitude 3 shift 0.5)
  - ``taesd_preview``                    :761-777 (per-step preview thread)
  - latent→RGB linear preview factors    :140-146 (SD15 LatentFormat)

The architecture follows the public TAESD design (madebyollin/taesd). The
reference instantiates TAESD *per preview call* (:762) — here params load
once and decode is a cached jit program; per-step previews are driven from
samplers via io_callback (samplers.py) instead of Python threads.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as L

LATENT_MAGNITUDE = 3.0
LATENT_SHIFT = 0.5

# SD15 latent→RGB linear projection (ref :140-146)
SD15_LATENT_RGB = np.array(
    [
        [0.3512, 0.2297, 0.3227],
        [0.3250, 0.4974, 0.2350],
        [-0.2829, 0.1762, 0.2721],
        [-0.2120, -0.2616, -0.7177],
    ],
    dtype=np.float32,
)


def latent_to_rgb_preview(latent: jnp.ndarray) -> jnp.ndarray:
    """(B,h,w,4) model-space latent → (B,h,w,3) [0,1] cheap preview."""
    rgb = jnp.einsum("bhwc,cd->bhwd", latent.astype(jnp.float32), SD15_LATENT_RGB)
    return jnp.clip(rgb / 2.0 + 0.5, 0.0, 1.0)


def _block(p, x, policy):
    h = L.conv2d(p["c0"], x, policy=policy)
    h = L.conv2d(p["c1"], jax.nn.relu(h), policy=policy)
    h = L.conv2d(p["c2"], jax.nn.relu(h), policy=policy)
    skip = L.conv2d(p["skip"], x, policy=policy) if "skip" in p else x
    return jax.nn.relu(h + skip)


@functools.partial(jax.jit, static_argnames=("policy",))
def taesd_decode(params, latent, policy: L.Policy = L.FP32):
    """(B,h,w,4) model-space latent → (B,8h,8w,3) in [0,1]."""
    x = latent.astype(policy.compute_dtype)
    x = jnp.tanh(x / LATENT_MAGNITUDE) * LATENT_MAGNITUDE  # Clamp
    x = L.conv2d(params["conv_in"], x, policy=policy)
    x = jax.nn.relu(x)
    for stage in params["stages"]:
        for blk in stage["blocks"]:
            x = _block(blk, x, policy)
        if "up_conv" in stage:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = L.conv2d(stage["up_conv"], x, policy=policy)
    x = L.conv2d(params["conv_out"], x, policy=policy)
    return jnp.clip(x.astype(jnp.float32), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("policy",))
def taesd_encode(params, pixels, policy: L.Policy = L.FP32):
    """(B,H,W,3) in [0,1] → (B,H/8,W/8,4) model-space latent."""
    x = pixels.astype(policy.compute_dtype)
    x = L.conv2d(params["conv_in"], x, policy=policy)
    for stage in params["stages"]:
        if "down_conv" in stage:
            x = L.conv2d(stage["down_conv"], x, stride=2,
                         padding=[(1, 1), (1, 1)], policy=policy)
        for blk in stage["blocks"]:
            x = _block(blk, x, policy)
    x = L.conv2d(params["conv_out"], x, policy=policy)
    return x.astype(jnp.float32)


# ----------------------------------------------------------- conversion -----
def _conv_p(sd, idx_or_name, dtype, bias=True):
    w = np.asarray(sd[f"{idx_or_name}.weight"], np.float32)
    p = {"weight": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)}
    if bias and f"{idx_or_name}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{idx_or_name}.bias"], np.float32), dtype)
    return p


def _block_p(sd, i, dtype):
    p = {
        "c0": _conv_p(sd, f"{i}.conv.0", dtype),
        "c1": _conv_p(sd, f"{i}.conv.2", dtype),
        "c2": _conv_p(sd, f"{i}.conv.4", dtype),
    }
    if f"{i}.skip.weight" in sd:
        p["skip"] = _conv_p(sd, f"{i}.skip", dtype)
    return p


def _strip_prefix(sd: dict, prefixes=("taesd_decoder.", "taesd_encoder.", "decoder.", "encoder.")) -> dict:
    for pfx in prefixes:
        if any(k.startswith(pfx) for k in sd):
            return {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
    return sd


def convert_taesd_decoder(sd: dict, dtype=jnp.float32) -> dict:
    """Sequential indices: 0 Clamp, 1 conv, 2 ReLU, then 3 stages of
    [Block×3, Upsample, conv(bias=False)], final Block + conv."""
    sd = _strip_prefix(sd)
    stages = []
    i = 3
    for _ in range(3):
        blocks = [_block_p(sd, i + j, dtype) for j in range(3)]
        up_conv = _conv_p(sd, i + 4, dtype, bias=False)
        stages.append({"blocks": tuple(blocks), "up_conv": up_conv})
        i += 5
    stages.append({"blocks": (_block_p(sd, i, dtype),)})
    return {
        "conv_in": _conv_p(sd, 1, dtype),
        "stages": tuple(stages),
        "conv_out": _conv_p(sd, i + 1, dtype),
    }


def convert_taesd_encoder(sd: dict, dtype=jnp.float32) -> dict:
    """Sequential: 0 conv, 1 Block, then 3 stages of [conv s2 (no bias),
    Block×3], final conv."""
    sd = _strip_prefix(sd)
    stages = [{"blocks": (_block_p(sd, 1, dtype),)}]
    i = 2
    for _ in range(3):
        down = _conv_p(sd, i, dtype, bias=False)
        blocks = [_block_p(sd, i + 1 + j, dtype) for j in range(3)]
        stages.append({"down_conv": down, "blocks": tuple(blocks)})
        i += 4
    return {
        "conv_in": _conv_p(sd, 0, dtype),
        "stages": tuple(stages),
        "conv_out": _conv_p(sd, i, dtype),
    }


def init_taesd_decoder(key, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 32))

    def blk():
        return {
            "c0": L.init_conv2d(next(ks), 3, 3, 64, 64, dtype=dtype),
            "c1": L.init_conv2d(next(ks), 3, 3, 64, 64, dtype=dtype),
            "c2": L.init_conv2d(next(ks), 3, 3, 64, 64, dtype=dtype),
        }

    stages = [
        {"blocks": (blk(), blk(), blk()),
         "up_conv": L.init_conv2d(next(ks), 3, 3, 64, 64, bias=False, dtype=dtype)}
        for _ in range(3)
    ] + [{"blocks": (blk(),)}]
    return {
        "conv_in": L.init_conv2d(next(ks), 3, 3, 4, 64, dtype=dtype),
        "stages": tuple(stages),
        "conv_out": L.init_conv2d(next(ks), 3, 3, 64, 3, dtype=dtype),
    }
