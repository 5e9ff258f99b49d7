"""VAE weight conversion: ``first_stage_model.`` LDM state dict → vae.py tree.

Key layout per the reference's AutoencoderKL loading
(/root/reference/LightDiffusion.py:6464-6469, model defs :3649-3882).
1×1-conv attention q/k/v stay convs (HWIO); all convs transpose OIHW→HWIO.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.vae import VAEConfig, SD15_VAE


def _conv(sd, name, dtype):
    w = np.asarray(sd[name + ".weight"], np.float32)
    if w.ndim == 4:
        w = w.transpose(2, 3, 1, 0)
    else:  # some attn q/k/v exported as linear — lift to 1×1 conv
        w = w.T[None, None]
    return {
        "weight": jnp.asarray(w, dtype),
        "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32), dtype),
    }


def _norm(sd, name, dtype):
    return {
        "weight": jnp.asarray(np.asarray(sd[name + ".weight"], np.float32), dtype),
        "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32), dtype),
    }


def _resnet(sd, pfx, dtype):
    p = {
        "norm1": _norm(sd, pfx + ".norm1", dtype),
        "conv1": _conv(sd, pfx + ".conv1", dtype),
        "norm2": _norm(sd, pfx + ".norm2", dtype),
        "conv2": _conv(sd, pfx + ".conv2", dtype),
    }
    if pfx + ".nin_shortcut.weight" in sd:
        p["nin"] = _conv(sd, pfx + ".nin_shortcut", dtype)
    return p


def _attn(sd, pfx, dtype):
    return {
        "norm": _norm(sd, pfx + ".norm", dtype),
        "q": _conv(sd, pfx + ".q", dtype),
        "k": _conv(sd, pfx + ".k", dtype),
        "v": _conv(sd, pfx + ".v", dtype),
        "proj_out": _conv(sd, pfx + ".proj_out", dtype),
    }


def convert_vae(
    sd: dict,
    cfg: VAEConfig = SD15_VAE,
    prefix: str = "first_stage_model.",
    dtype=jnp.float32,
):
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    n_levels = len(cfg.ch_mult)

    down = []
    for lv in range(n_levels):
        lvl = {
            "block": tuple(
                _resnet(sd, f"encoder.down.{lv}.block.{b}", dtype)
                for b in range(cfg.num_res_blocks)
            )
        }
        if f"encoder.down.{lv}.downsample.conv.weight" in sd:
            lvl["downsample"] = {"conv": _conv(sd, f"encoder.down.{lv}.downsample.conv", dtype)}
        down.append(lvl)

    encoder = {
        "conv_in": _conv(sd, "encoder.conv_in", dtype),
        "down": tuple(down),
        "mid": {
            "block_1": _resnet(sd, "encoder.mid.block_1", dtype),
            "attn_1": _attn(sd, "encoder.mid.attn_1", dtype),
            "block_2": _resnet(sd, "encoder.mid.block_2", dtype),
        },
        "norm_out": _norm(sd, "encoder.norm_out", dtype),
        "conv_out": _conv(sd, "encoder.conv_out", dtype),
        "quant_conv": _conv(sd, "quant_conv", dtype),
    }

    up = []
    for lv in range(n_levels):
        lvl = {
            "block": tuple(
                _resnet(sd, f"decoder.up.{lv}.block.{b}", dtype)
                for b in range(cfg.num_res_blocks + 1)
            )
        }
        if f"decoder.up.{lv}.upsample.conv.weight" in sd:
            lvl["upsample"] = {"conv": _conv(sd, f"decoder.up.{lv}.upsample.conv", dtype)}
        up.append(lvl)

    decoder = {
        "post_quant_conv": _conv(sd, "post_quant_conv", dtype),
        "conv_in": _conv(sd, "decoder.conv_in", dtype),
        "mid": {
            "block_1": _resnet(sd, "decoder.mid.block_1", dtype),
            "attn_1": _attn(sd, "decoder.mid.attn_1", dtype),
            "block_2": _resnet(sd, "decoder.mid.block_2", dtype),
        },
        "up": tuple(up),
        "norm_out": _norm(sd, "decoder.norm_out", dtype),
        "conv_out": _conv(sd, "decoder.conv_out", dtype),
    }
    return {"encoder": encoder, "decoder": decoder}
