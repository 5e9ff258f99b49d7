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


def detect_vae_config(
    sd: dict, prefix: str = "first_stage_model.", scale_factor: float = 0.18215
) -> VAEConfig:
    """Reconstruct the AutoencoderKL hyperparameters from key shapes (the
    reference hardcodes the SD1.5 config at :6300-6326; detection makes the
    loader robust to VAE variants and synthetic checkpoints)."""
    def shape(name):
        return tuple(sd[prefix + name].shape)

    ch = shape("encoder.conv_in.weight")[0]
    in_channels = shape("encoder.conv_in.weight")[1]
    n_levels = 0
    while f"{prefix}encoder.down.{n_levels}.block.0.conv1.weight" in sd:
        n_levels += 1
    num_res = 0
    while f"{prefix}encoder.down.0.block.{num_res}.conv1.weight" in sd:
        num_res += 1
    ch_mult = tuple(
        shape(f"encoder.down.{lv}.block.{num_res - 1}.conv2.weight")[0] // ch
        for lv in range(n_levels)
    )
    z = shape("quant_conv.weight")[0] // 2
    out_channels = shape("decoder.conv_out.weight")[0]
    return VAEConfig(
        ch=ch, ch_mult=ch_mult, num_res_blocks=num_res, z_channels=z,
        in_channels=in_channels, out_channels=out_channels,
        scale_factor=scale_factor,
    )


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
