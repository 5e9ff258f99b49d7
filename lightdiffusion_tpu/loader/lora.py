"""LoRA loading + functional merge.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``load_lora`` patch extraction       :548-581 (lora_up/down + alpha)
  - ``model_lora_keys_clip``             :582-604
  - ``model_lora_keys_unet`` / diffusers mapping :605-629, :302-394
  - ``ModelPatcher.calculate_weight``    :3407-3423 (W += α·(up@down), fp32)
  - ``load_lora_for_models``             :6203-6219

TPU design: no patch/backup/unpatch machinery — LoRA deltas merge once into
the flat checkpoint state dict (host numpy, fp32) BEFORE conversion to device
trees (SURVEY §7 table). Switching LoRAs = re-merge from the retained base
dict + re-convert; params remain pure pytrees.
"""

from __future__ import annotations

import logging

import numpy as np

from ..models.unet import UNetConfig

log = logging.getLogger(__name__)


# ----------------------------------------------------- key-map generation ---
def unet_to_diffusers(cfg: UNetConfig) -> dict[str, str]:
    """{diffusers module path: ldm module path} for the UNet (ref :302-394)."""
    from ..models.unet import build_plan

    input_plan, output_plan = build_plan(cfg)
    m = {}
    res_base = {
        "norm1": "in_layers.0", "conv1": "in_layers.2",
        "time_emb_proj": "emb_layers.1",
        "norm2": "out_layers.0", "conv2": "out_layers.3",
    }

    def res_map_for(ch_in, ch_out):
        r = dict(res_base)
        if ch_in != ch_out:
            r["conv_shortcut"] = "skip_connection"
        return r

    def attn_keys(dif_pfx, ldm_pfx, depth):
        m[f"{dif_pfx}.norm"] = f"{ldm_pfx}.norm"
        m[f"{dif_pfx}.proj_in"] = f"{ldm_pfx}.proj_in"
        m[f"{dif_pfx}.proj_out"] = f"{ldm_pfx}.proj_out"
        for t in range(depth):
            for sub in (
                "attn1.to_q", "attn1.to_k", "attn1.to_v", "attn1.to_out.0",
                "attn2.to_q", "attn2.to_k", "attn2.to_v", "attn2.to_out.0",
                "ff.net.0.proj", "ff.net.2", "norm1", "norm2", "norm3",
            ):
                m[f"{dif_pfx}.transformer_blocks.{t}.{sub}"] = (
                    f"{ldm_pfx}.transformer_blocks.{t}.{sub}"
                )

    n_levels = len(cfg.channel_mult)
    per_level = [cfg.num_res_blocks[l] for l in range(n_levels)]

    m["conv_in"] = "input_blocks.0.0"
    m["conv_norm_out"] = "out.0"
    m["conv_out"] = "out.2"
    m["time_embedding.linear_1"] = "time_embed.0"
    m["time_embedding.linear_2"] = "time_embed.2"

    idx = 1
    for level in range(n_levels):
        for j in range(per_level[level]):
            spec = input_plan[idx]
            for dk, lk in res_map_for(spec.ch_in, spec.ch_out).items():
                m[f"down_blocks.{level}.resnets.{j}.{dk}"] = f"input_blocks.{idx}.0.{lk}"
            if cfg.transformer_depth[level] > 0:
                attn_keys(
                    f"down_blocks.{level}.attentions.{j}",
                    f"input_blocks.{idx}.1",
                    cfg.transformer_depth[level],
                )
            idx += 1
        if level != n_levels - 1:
            m[f"down_blocks.{level}.downsamplers.0.conv"] = f"input_blocks.{idx}.0.op"
            idx += 1

    for dk, lk in res_base.items():  # mid resblocks never change channels
        m[f"mid_block.resnets.0.{dk}"] = f"middle_block.0.{lk}"
        m[f"mid_block.resnets.1.{dk}"] = f"middle_block.2.{lk}"
    attn_keys("mid_block.attentions.0", "middle_block.1", cfg.middle_depth)

    idx = 0
    for level in reversed(range(n_levels)):
        for j in range(per_level[level] + 1):
            spec = output_plan[idx]
            rm = res_map_for(spec.ch_in + spec.skip_ch, spec.ch_out)
            for dk, lk in rm.items():
                m[f"up_blocks.{n_levels-1-level}.resnets.{j}.{dk}"] = (
                    f"output_blocks.{idx}.0.{lk}"
                )
            mod = 1
            if cfg.transformer_depth[level] > 0:
                attn_keys(
                    f"up_blocks.{n_levels-1-level}.attentions.{j}",
                    f"output_blocks.{idx}.1",
                    cfg.transformer_depth[level],
                )
                mod = 2
            if spec.upsample:
                m[f"up_blocks.{n_levels-1-level}.upsamplers.0.conv"] = (
                    f"output_blocks.{idx}.{mod}.conv"
                )
            idx += 1
    return m


def clip_lora_key_map(num_layers: int = 12) -> dict[str, str]:
    """{lora_te underscore name: checkpoint key (module path)} (ref :582)."""
    m = {}
    base = "cond_stage_model.transformer.text_model"
    for i in range(num_layers):
        for sub in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m[f"lora_te_text_model_encoder_layers_{i}_self_attn_{sub}"] = (
                f"{base}.encoder.layers.{i}.self_attn.{sub}"
            )
        for sub in ("fc1", "fc2"):
            m[f"lora_te_text_model_encoder_layers_{i}_mlp_{sub}"] = (
                f"{base}.encoder.layers.{i}.mlp.{sub}"
            )
    return m


def unet_lora_key_map(cfg: UNetConfig) -> dict[str, str]:
    """{lora_unet underscore name: checkpoint key} covering both diffusers
    and ldm naming conventions (ref :605-629)."""
    m = {}
    for dif, ldm in unet_to_diffusers(cfg).items():
        target = f"model.diffusion_model.{ldm}"
        m["lora_unet_" + dif.replace(".", "_")] = target
        m["lora_unet_" + ldm.replace(".", "_")] = target
    return m


# --------------------------------------------------------------- loading ----
def load_lora(lora_sd: dict, key_map: dict[str, str]) -> dict:
    """Extract patches: {checkpoint_weight_key: (up, down, alpha_scale)}.

    alpha_scale = alpha/rank as in the reference's calculate_weight (:3407).
    """
    patches = {}
    loaded = set()
    for name, target in key_map.items():
        up_k = f"{name}.lora_up.weight"
        down_k = f"{name}.lora_down.weight"
        alpha_k = f"{name}.alpha"
        if up_k in lora_sd and down_k in lora_sd:
            up = np.asarray(lora_sd[up_k], np.float32)
            down = np.asarray(lora_sd[down_k], np.float32)
            rank = down.shape[0]
            alpha = (
                float(np.asarray(lora_sd[alpha_k])) / rank
                if alpha_k in lora_sd
                else 1.0
            )
            patches[target + ".weight"] = (up, down, alpha)
            loaded.update((up_k, down_k, alpha_k))
    leftover = [
        k for k in lora_sd
        if k not in loaded and k.endswith(".lora_up.weight")
    ]
    if leftover:
        log.warning("lora keys not mapped: %s ...", leftover[:4])
    return patches


def merge_lora_into_state_dict(
    sd: dict, patches: dict, strength: float
) -> dict:
    """W += strength · α · (up @ down) in fp32 (ref :3407-3423). Returns a
    new dict sharing unpatched arrays."""
    out = dict(sd)
    for key, (up, down, alpha) in patches.items():
        if key not in sd:
            log.warning("lora target missing in checkpoint: %s", key)
            continue
        w = np.asarray(sd[key], np.float32)
        # linear: (O,r)@(r,I); conv: up (O,r,1,1) @ down (r,I,kh,kw)
        up2 = up.reshape(up.shape[0], -1)
        down2 = down.reshape(down.shape[0], -1)
        delta = (up2 @ down2).reshape(w.shape)
        out[key] = w + strength * alpha * delta
    return out


def apply_loras_to_checkpoint(
    sd: dict,
    cfg: UNetConfig,
    loras: list[tuple[dict, float, float]],
) -> dict:
    """[(lora_sd, strength_model, strength_clip), ...] → merged flat dict
    (ref load_lora_for_models :6203)."""
    key_map = {**unet_lora_key_map(cfg), **clip_lora_key_map()}
    for lora_sd, s_model, s_clip in loras:
        patches = load_lora(lora_sd, key_map)
        unet_p = {k: v for k, v in patches.items() if k.startswith("model.")}
        clip_p = {k: v for k, v in patches.items() if k.startswith("cond_stage_model.")}
        sd = merge_lora_into_state_dict(sd, unet_p, s_model)
        sd = merge_lora_into_state_dict(sd, clip_p, s_clip)
    return sd
