"""UNet weight conversion: LDM state dict → the models/unet.py param tree.

Key layout follows the SD1.x ``model.diffusion_model.`` module tree that the
reference's UNet loads (``UNetModel1`` construction at
/root/reference/LightDiffusion.py:5390-5686 dictates these names):
  time_embed.{0,2}                          → time_fc1/time_fc2
  input_blocks.i.0 (conv|ResBlock|Downsample op)
  input_blocks.i.1 (SpatialTransformer)
  middle_block.{0,1,2}
  output_blocks.i.{0,1,2}
  out.{0,2}
Transposes: torch Linear (out,in)→(in,out); torch Conv (O,I,kh,kw)→(kh,kw,I,O).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.unet import UNetConfig, build_plan


def _lin(sd, name, dtype, bias=True):
    p = {"weight": jnp.asarray(np.asarray(sd[name + ".weight"], np.float32).T, dtype)}
    if bias and name + ".bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[name + ".bias"], np.float32), dtype)
    return p


def _conv(sd, name, dtype):
    w = np.asarray(sd[name + ".weight"], np.float32)
    p = {"weight": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)}
    if name + ".bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[name + ".bias"], np.float32), dtype)
    return p


def _norm(sd, name, dtype):
    return {
        "weight": jnp.asarray(np.asarray(sd[name + ".weight"], np.float32), dtype),
        "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32), dtype),
    }


def _res(sd, pfx, dtype):
    p = {
        "in_norm": _norm(sd, pfx + ".in_layers.0", dtype),
        "in_conv": _conv(sd, pfx + ".in_layers.2", dtype),
        "emb": _lin(sd, pfx + ".emb_layers.1", dtype),
        "out_norm": _norm(sd, pfx + ".out_layers.0", dtype),
        "out_conv": _conv(sd, pfx + ".out_layers.3", dtype),
    }
    if pfx + ".skip_connection.weight" in sd:
        p["skip"] = _conv(sd, pfx + ".skip_connection", dtype)
    return p


def _xattn(sd, pfx, dtype):
    return {
        "to_q": _lin(sd, pfx + ".to_q", dtype, bias=False),
        "to_k": _lin(sd, pfx + ".to_k", dtype, bias=False),
        "to_v": _lin(sd, pfx + ".to_v", dtype, bias=False),
        "to_out": _lin(sd, pfx + ".to_out.0", dtype),
    }


def _proj(sd, name, dtype):
    """proj_in/proj_out: 1×1 conv (SD1.x) or linear (SD2.x)."""
    w = np.asarray(sd[name + ".weight"], np.float32)
    if w.ndim == 2:
        return _lin(sd, name, dtype)
    return _conv(sd, name, dtype)


def _transformer(sd, pfx, depth, dtype):
    blocks = []
    for i in range(depth):
        b = f"{pfx}.transformer_blocks.{i}"
        blocks.append(
            {
                "ln1": _norm(sd, b + ".norm1", dtype),
                "ln2": _norm(sd, b + ".norm2", dtype),
                "ln3": _norm(sd, b + ".norm3", dtype),
                "attn1": _xattn(sd, b + ".attn1", dtype),
                "attn2": _xattn(sd, b + ".attn2", dtype),
                "ff_in": _lin(sd, b + ".ff.net.0.proj", dtype),
                "ff_out": _lin(sd, b + ".ff.net.2", dtype),
            }
        )
    return {
        "norm": _norm(sd, pfx + ".norm", dtype),
        "proj_in": _proj(sd, pfx + ".proj_in", dtype),
        "proj_out": _proj(sd, pfx + ".proj_out", dtype),
        "blocks": tuple(blocks),
    }


def convert_unet(
    sd: dict,
    cfg: UNetConfig,
    prefix: str = "model.diffusion_model.",
    dtype=jnp.bfloat16,
):
    """Flat (possibly prefixed) LDM state dict → unet param tree."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    input_plan, output_plan = build_plan(cfg)

    input_blocks = []
    for i, spec in enumerate(input_plan):
        pfx = f"input_blocks.{i}"
        if spec.kind == "conv_in":
            input_blocks.append({"conv": _conv(sd, pfx + ".0", dtype)})
        elif spec.kind == "down":
            input_blocks.append({"conv": _conv(sd, pfx + ".0.op", dtype)})
        else:
            p = {"res": _res(sd, pfx + ".0", dtype)}
            if spec.kind == "res_attn":
                p["attn"] = _transformer(sd, pfx + ".1", spec.depth, dtype)
            input_blocks.append(p)

    output_blocks = []
    for i, spec in enumerate(output_plan):
        pfx = f"output_blocks.{i}"
        p = {"res": _res(sd, pfx + ".0", dtype)}
        mod = 1
        if spec.kind == "res_attn":
            p["attn"] = _transformer(sd, pfx + ".1", spec.depth, dtype)
            mod = 2
        if spec.upsample:
            p["up"] = {"conv": _conv(sd, f"{pfx}.{mod}.conv", dtype)}
        output_blocks.append(p)

    out = {
        "time_fc1": _lin(sd, "time_embed.0", dtype),
        "time_fc2": _lin(sd, "time_embed.2", dtype),
        "input_blocks": tuple(input_blocks),
        "middle": {
            "res1": _res(sd, "middle_block.0", dtype),
            "attn": _transformer(sd, "middle_block.1", cfg.middle_depth, dtype),
            "res2": _res(sd, "middle_block.2", dtype),
        },
        "output_blocks": tuple(output_blocks),
        "out_norm": _norm(sd, "out.0", dtype),
        "out_conv": _conv(sd, "out.2", dtype),
    }
    if "label_emb.0.0.weight" in sd:
        out["label_fc1"] = _lin(sd, "label_emb.0.0", dtype)
        out["label_fc2"] = _lin(sd, "label_emb.0.2", dtype)
    return out


# ------------------------------------------------------------ controlnet ----
def convert_controlnet(
    sd: dict,
    cfg: UNetConfig,
    prefix: str = "control_model.",
    dtype=jnp.bfloat16,
):
    """Flat ``control_model.`` state dict → models/controlnet.py param tree.
    Key layout per the ControlNet release (arXiv 2302.05543): the UNet
    encoder tree + zero_convs.i.0 + middle_block_out.0 +
    input_hint_block.{0,2,..,14}."""
    from ..models.controlnet import HINT_CHANNELS

    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    input_plan, _ = build_plan(cfg)

    input_blocks = []
    for i, spec in enumerate(input_plan):
        pfx = f"input_blocks.{i}"
        if spec.kind == "conv_in":
            input_blocks.append({"conv": _conv(sd, pfx + ".0", dtype)})
        elif spec.kind == "down":
            input_blocks.append({"conv": _conv(sd, pfx + ".0.op", dtype)})
        else:
            p = {"res": _res(sd, pfx + ".0", dtype)}
            if spec.kind == "res_attn":
                p["attn"] = _transformer(sd, pfx + ".1", spec.depth, dtype)
            input_blocks.append(p)

    out = {
        "time_fc1": _lin(sd, "time_embed.0", dtype),
        "time_fc2": _lin(sd, "time_embed.2", dtype),
        "input_blocks": tuple(input_blocks),
        "middle": {
            "res1": _res(sd, "middle_block.0", dtype),
            "attn": _transformer(sd, "middle_block.1", cfg.middle_depth, dtype),
            "res2": _res(sd, "middle_block.2", dtype),
        },
        "middle_out": _conv(sd, "middle_block_out.0", dtype),
        "zero_convs": tuple(
            _conv(sd, f"zero_convs.{i}.0", dtype)
            for i in range(len(input_plan))
        ),
        "hint": {
            "convs": tuple(
                _conv(sd, f"input_hint_block.{2 * i}", dtype)
                for i in range(len(HINT_CHANNELS))
            ),
            "out": _conv(sd, f"input_hint_block.{2 * len(HINT_CHANNELS)}",
                         dtype),
        },
    }
    if "label_emb.0.0.weight" in sd:  # SDXL-layout controlnet ADM branch
        out["label_fc1"] = _lin(sd, "label_emb.0.0", dtype)
        out["label_fc2"] = _lin(sd, "label_emb.0.2", dtype)
    return out


# ---------------------------------------------------------------- detect ----
def detect_unet_config(sd: dict, prefix: str = "model.diffusion_model.") -> UNetConfig:
    """Reconstruct UNet hyperparameters from state-dict key shapes
    (ref ``detect_unet_config``, LightDiffusion.py:6065-6182)."""
    keys = [k[len(prefix):] for k in sd if k.startswith(prefix)]
    if not keys:
        raise KeyError(f"no keys under {prefix!r}")

    def shape(name):
        return tuple(sd[prefix + name].shape)

    model_channels = shape("input_blocks.0.0.weight")[0]
    in_channels = shape("input_blocks.0.0.weight")[1]
    # controlnets have no decoder/out head — keep the latent channel count
    out_channels = (
        shape("out.2.weight")[0] if prefix + "out.2.weight" in sd
        else in_channels
    )
    context_dim = None

    # walk input blocks
    num_blocks = 1 + max(int(k.split(".")[1]) for k in keys if k.startswith("input_blocks."))
    mults = []
    res_counts = []
    depths = []
    level_res = 0
    level_depth = 0
    last_ch = model_channels
    for i in range(1, num_blocks):
        res_key = f"input_blocks.{i}.0.out_layers.3.weight"
        down_key = f"input_blocks.{i}.0.op.weight"
        if prefix + res_key in sd:
            last_ch = shape(res_key)[0]
            level_res += 1
            d = 0
            while prefix + f"input_blocks.{i}.1.transformer_blocks.{d}.attn1.to_q.weight" in sd:
                if context_dim is None:
                    context_dim = shape(
                        f"input_blocks.{i}.1.transformer_blocks.0.attn2.to_k.weight"
                    )[1]
                d += 1
            level_depth = max(level_depth, d)
        elif prefix + down_key in sd:
            mults.append(last_ch // model_channels)
            res_counts.append(level_res)
            depths.append(level_depth)
            level_res, level_depth = 0, 0
    mults.append(last_ch // model_channels)
    res_counts.append(level_res)
    depths.append(level_depth)

    # SD2.x fingerprints: linear transformer projections + 1024-dim context
    # → num_head_channels 64 (the reference only registers SD1.5, :6015;
    # this extends coverage to the SD2 family)
    use_linear = False
    for k in keys:
        if k.endswith(".1.proj_in.weight"):
            use_linear = len(sd[prefix + k].shape) == 2
            break
    context_dim = context_dim or 768
    head_channels = 64 if (use_linear or context_dim >= 1024) else -1
    mid_depth = 0
    while prefix + (
        f"middle_block.1.transformer_blocks.{mid_depth}.attn1.to_q.weight"
    ) in sd:
        mid_depth += 1
    adm = 0
    if prefix + "label_emb.0.0.weight" in sd:
        adm = shape("label_emb.0.0.weight")[1]
    return UNetConfig(
        in_channels=in_channels,
        out_channels=out_channels,
        model_channels=model_channels,
        channel_mult=tuple(mults),
        num_res_blocks=tuple(res_counts),
        transformer_depth=tuple(depths),
        context_dim=context_dim,
        num_heads=8,
        num_head_channels=head_channels,
        use_linear_projections=use_linear,
        middle_depth=max(mid_depth, 1),
        adm_in_channels=adm,
    )
