"""LoRA: key mapping correctness against the torch LDM layout, merge math."""

import numpy as np
import pytest

from lightdiffusion_tpu.loader import lora as LR
from lightdiffusion_tpu.models.unet import UNetConfig, SD15_UNET


TINY = UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 0), context_dim=64, num_heads=2,
)


def test_unet_to_diffusers_targets_exist_in_ldm_layout():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniLDMUNet

    model = MiniLDMUNet(model_ch=32, channel_mult=(1, 2), num_res=(1, 1),
                        depths=(1, 0), context_dim=64, heads=2)
    sd_keys = set(model.state_dict().keys())
    mapping = LR.unet_to_diffusers(TINY)
    missing = [
        ldm for ldm in mapping.values()
        if f"{ldm}.weight" not in sd_keys and f"{ldm}.bias" not in sd_keys
    ]
    assert not missing, missing


def test_sd15_map_has_expected_counts():
    mapping = LR.unet_to_diffusers(SD15_UNET)
    attn_qs = [k for k in mapping if k.endswith("attn1.to_q")]
    # 6 down + 1 mid + 9 up spatial transformers for SD1.5
    assert len(attn_qs) == 16
    # downsamplers at levels 0..2
    assert "down_blocks.0.downsamplers.0.conv" in mapping
    assert mapping["down_blocks.0.downsamplers.0.conv"] == "input_blocks.3.0.op"
    assert mapping["mid_block.attentions.0.proj_in"] == "middle_block.1.proj_in"


def test_lora_merge_math_kohya_keys():
    rng = np.random.RandomState(0)
    w = rng.randn(32, 32).astype(np.float32)
    target = "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"
    sd = {target: w}
    up = rng.randn(32, 4).astype(np.float32)
    down = rng.randn(4, 32).astype(np.float32)
    lora_sd = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.alpha": np.float32(2.0),
    }
    merged = LR.apply_loras_to_checkpoint(sd, TINY, [(lora_sd, 0.7, 0.7)])
    expected = w + 0.7 * (2.0 / 4.0) * (up @ down)
    np.testing.assert_allclose(merged[target], expected, rtol=1e-6)


def test_lora_merge_ldm_style_keys():
    rng = np.random.RandomState(1)
    w = rng.randn(32, 32).astype(np.float32)
    target = "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight"
    sd = {target: w}
    up = rng.randn(32, 8).astype(np.float32)
    down = rng.randn(8, 32).astype(np.float32)
    lora_sd = {
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn2_to_k.lora_up.weight": up,
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn2_to_k.lora_down.weight": down,
    }
    merged = LR.apply_loras_to_checkpoint(sd, TINY, [(lora_sd, 1.0, 1.0)])
    np.testing.assert_allclose(merged[target], w + up @ down, rtol=1e-6)


def test_clip_lora_merge():
    rng = np.random.RandomState(2)
    w = rng.randn(64, 64).astype(np.float32)
    target = "cond_stage_model.transformer.text_model.encoder.layers.0.self_attn.q_proj.weight"
    sd = {target: w}
    up = rng.randn(64, 4).astype(np.float32)
    down = rng.randn(4, 64).astype(np.float32)
    lora_sd = {
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": up,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": down,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.alpha": np.float32(4.0),
    }
    merged = LR.apply_loras_to_checkpoint(sd, TINY, [(lora_sd, 1.0, 0.5)])
    np.testing.assert_allclose(merged[target], w + 0.5 * up @ down, rtol=1e-6)
    # strength 0 → unchanged
    merged0 = LR.apply_loras_to_checkpoint(sd, TINY, [(lora_sd, 0.0, 0.0)])
    np.testing.assert_array_equal(merged0[target], w)


def test_conv_lora_merge():
    rng = np.random.RandomState(3)
    w = rng.randn(32, 32, 3, 3).astype(np.float32)
    target = "model.diffusion_model.input_blocks.1.0.in_layers.2.weight"
    sd = {target: w}
    up = rng.randn(32, 4, 1, 1).astype(np.float32)
    down = rng.randn(4, 32, 3, 3).astype(np.float32)
    lora_sd = {
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight": up,
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight": down,
    }
    merged = LR.apply_loras_to_checkpoint(sd, TINY, [(lora_sd, 1.0, 1.0)])
    expected = w + (up.reshape(32, 4) @ down.reshape(4, -1)).reshape(w.shape)
    np.testing.assert_allclose(merged[target], expected, rtol=1e-5)


def test_xl_lora_map_covers_deep_middle():
    from lightdiffusion_tpu.models.unet import SDXL_UNET

    mapping = LR.unet_to_diffusers(SDXL_UNET)
    assert (
        mapping["mid_block.attentions.0.transformer_blocks.9.attn1.to_q"]
        == "middle_block.1.transformer_blocks.9.attn1.to_q"
    )
    # level1 depth-2 blocks exist
    assert "down_blocks.1.attentions.0.transformer_blocks.1.attn2.to_v" in mapping
    # level0 has no attention in SDXL
    assert not any(k.startswith("down_blocks.0.attentions") for k in mapping)
