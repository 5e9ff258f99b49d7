"""End-to-end checkpoint ingestion: write a synthetic SD-layout safetensors
file from the torch minis, load_checkpoint it (config sniffing included),
generate, then merge a LoRA through the retained flat dict."""

import numpy as np
import jax
import pytest

from lightdiffusion_tpu.loader import checkpoint as CKPT


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    torch = pytest.importorskip("torch")
    import safetensors.numpy as st
    from transformers import CLIPTextConfig, CLIPTextModel
    from tests.torch_ldm_ref import MiniLDMUNet, MiniAutoencoderKL

    torch.manual_seed(0)
    unet = MiniLDMUNet(model_ch=32, channel_mult=(1, 2), num_res=(1, 1),
                       depths=(1, 0), context_dim=128, heads=2)
    vae = MiniAutoencoderKL(ch=32, ch_mult=(1, 2), num_res=1, z=4)
    # heads must equal hidden/64 (the loader's head heuristic — exact for
    # every real CLIP text tower)
    clip = CLIPTextModel(CLIPTextConfig(
        vocab_size=49408, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=256,
        max_position_embeddings=77, hidden_act="quick_gelu",
    ))
    sd = {}
    sd.update({"model.diffusion_model." + k: v.numpy()
               for k, v in unet.state_dict().items()})
    sd.update({"first_stage_model." + k: v.numpy()
               for k, v in vae.state_dict().items()})
    sd.update({"cond_stage_model.transformer." + k: v.numpy()
               for k, v in clip.state_dict().items()
               if "position_ids" not in k})
    path = tmp_path_factory.mktemp("ckpt") / "mini_sd.safetensors"
    st.save_file(sd, str(path))
    return path


def test_load_checkpoint_full_path(ckpt_path):
    import jax.numpy as jnp

    model = CKPT.load_checkpoint(ckpt_path, unet_dtype=jnp.float32)
    assert model.unet_config.model_channels == 32
    assert model.unet_config.channel_mult == (1, 2)
    assert model.vae_config.ch == 32 and model.vae_config.ch_mult == (1, 2)
    assert model.clip_config.hidden_size == 128
    assert model.clip_config.num_heads == 2
    assert model.clip_config.num_layers == 2
    assert model.flat_sd is not None

    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.pipelines.sd import SDPipeline, txt2img

    pipe = SDPipeline(model, policy=L.FP32, clip_skip=-2)
    img = txt2img(pipe, "a cat", "", width=32, height=32, steps=2, seed=0,
                  sampler_name="euler_ancestral")
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(img).all()


def test_lora_merge_through_loaded_checkpoint(ckpt_path):
    import jax.numpy as jnp

    model = CKPT.load_checkpoint(ckpt_path, unet_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    base = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
    lora_sd = {
        f"{base}.lora_up.weight": rng.randn(32, 4).astype(np.float32),
        f"{base}.lora_down.weight": rng.randn(4, 32).astype(np.float32),
    }
    merged = CKPT.apply_loras(model, [(lora_sd, 1.0, 1.0)])
    w0 = np.asarray(
        model.unet_params["input_blocks"][1]["attn"]["blocks"][0]["attn1"]["to_q"]["weight"]
    )
    w1 = np.asarray(
        merged.unet_params["input_blocks"][1]["attn"]["blocks"][0]["attn1"]["to_q"]["weight"]
    )
    delta = lora_sd[f"{base}.lora_up.weight"] @ lora_sd[f"{base}.lora_down.weight"]
    np.testing.assert_allclose(w1 - w0, delta.T, atol=1e-5)  # (in,out) layout
