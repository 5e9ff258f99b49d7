"""CLIP text encoder: parity vs torch/HF CLIPTextModel with shared random
weights, clip-skip behavior, weighted-embedding math, TI splice."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import clip as C
from lightdiffusion_tpu.ops import layers as L


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg_hf = CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        # the reference (and real CLIP) locates EOT by argmax(ids) — align
        # HF's eos-based pooler with that by making eos the max test id
        eos_token_id=999,
    )
    torch.manual_seed(0)
    model = CLIPTextModel(cfg_hf).eval()
    sd = {
        "cond_stage_model.transformer." + k: v.numpy()
        for k, v in model.state_dict().items()
    }
    from lightdiffusion_tpu.loader.clip_weights import convert_clip_text_model

    params = convert_clip_text_model(sd)
    cfg = C.ClipConfig(
        vocab_size=1000,
        hidden_size=64,
        num_layers=3,
        num_heads=4,
        intermediate_size=128,
    )
    return model, params, cfg


def test_parity_with_hf(hf_pair):
    import torch

    model, params, cfg = hf_pair
    ids = np.array([[49, 2, 3, 999, 5] + [7] * 72], dtype=np.int64) % 1000
    with torch.no_grad():
        out = model(torch.from_numpy(ids), output_hidden_states=True)
    ref_last = out.last_hidden_state.numpy()

    table = np.asarray(params["token_embedding"])
    embeds = table[ids]
    hidden, pooled = C.clip_encode_embeds(
        params, jnp.asarray(embeds), jnp.asarray(ids.astype(np.int32)),
        cfg=cfg, policy=L.FP32, layer_idx=-1,
    )
    np.testing.assert_allclose(np.asarray(hidden), ref_last, atol=2e-5, rtol=2e-5)
    # pooled: HF pooler_output is last_hidden at argmax position
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5, rtol=2e-5
    )


def test_clip_skip_penultimate(hf_pair):
    import torch

    model, params, cfg = hf_pair
    ids = np.array([[1, 2, 3] + [0] * 74], dtype=np.int64)
    with torch.no_grad():
        out = model(torch.from_numpy(ids), output_hidden_states=True)
    # hidden_states[i] = input of layer i; [-2] = output of layer n-2 =
    # input of the final layer → penultimate layer output
    ref_pen = out.hidden_states[-2].numpy()
    # SD1 applies the final LayerNorm to the tapped hidden state
    with torch.no_grad():
        ref_pen = model.text_model.final_layer_norm(torch.from_numpy(ref_pen)).numpy()

    table = np.asarray(params["token_embedding"])
    embeds = table[ids]
    hidden, _ = C.clip_encode_embeds(
        params, jnp.asarray(embeds), jnp.asarray(ids.astype(np.int32)),
        cfg=cfg, policy=L.FP32, layer_idx=-2,
    )
    np.testing.assert_allclose(np.asarray(hidden), ref_pen, atol=2e-5, rtol=2e-5)


def test_encoder_end_to_end_weighting():
    """(z−z_empty)·w+z_empty: weight 1.0 must equal unweighted encode."""
    key = jax.random.PRNGKey(0)
    params = C.init_clip_params(key)
    enc = C.ClipTextEncoder(params, policy=L.FP32, clip_skip=-1)
    cond_plain, pooled = enc.encode("a photo of a cat")
    assert cond_plain.shape == (1, 77, 768)
    assert pooled.shape == (1, 768)
    # same text with explicit weight 1.0 → identical cond
    cond_w1, _ = enc.encode("(a photo of a cat:1.0)")
    np.testing.assert_allclose(
        np.asarray(cond_plain), np.asarray(cond_w1), atol=1e-5
    )
    # weight != 1 must change the cond
    cond_w2, _ = enc.encode("(a photo of a cat:1.4)")
    assert np.abs(np.asarray(cond_w2) - np.asarray(cond_plain)).max() > 1e-3


def test_long_prompt_concat_seq():
    params = C.init_clip_params(jax.random.PRNGKey(0))
    enc = C.ClipTextEncoder(params, policy=L.FP32)
    cond, _ = enc.encode(" ".join(["photorealistic"] * 60))
    assert cond.shape[1] % 77 == 0 and cond.shape[1] >= 154


def test_textual_inversion_splice(tmp_path):
    import safetensors.numpy as st
    from lightdiffusion_tpu.text.tokenizer import SDTokenizer

    emb = np.random.RandomState(1).randn(2, 768).astype(np.float32)
    st.save_file({"emb_params": emb}, str(tmp_path / "ti.safetensors"))
    params = C.init_clip_params(jax.random.PRNGKey(0))
    tok = SDTokenizer(embedding_dir=tmp_path)
    enc = C.ClipTextEncoder(params, tokenizer=tok, policy=L.FP32)
    chunks = tok.tokenize_with_weights("embedding:ti cat")
    embeds, safe = C.build_input_embeds(
        np.asarray(params["token_embedding"]), chunks
    )
    np.testing.assert_allclose(embeds[0, 1], emb[0])
    np.testing.assert_allclose(embeds[0, 2], emb[1])
    cond, _ = enc.encode_token_weights(chunks)
    assert np.isfinite(np.asarray(cond)).all()
