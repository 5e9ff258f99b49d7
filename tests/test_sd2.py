"""SD2.x family support: OpenCLIP text converter parity, linear-projection
UNet with num_head_channels, v-prediction transforms, config detection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import clip as C
from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L


def test_open_clip_converter_parity():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniOpenClipText
    from lightdiffusion_tpu.loader.clip_weights import convert_open_clip_text_model

    torch.manual_seed(0)
    model = MiniOpenClipText(vocab=1000, d=64, layers=3, heads=4).eval()
    sd = {"cond_stage_model.model." + k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_open_clip_text_model(sd)
    cfg = C.ClipConfig(
        vocab_size=1000, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=256, hidden_act="gelu", pad_with_end=False,
    )
    ids = np.array([[5, 8, 999] + [0] * 74], np.int64)
    with torch.no_grad():
        ref_hidden, ref_pooled = model(torch.from_numpy(ids))
        ref_pen, _ = model(torch.from_numpy(ids), penultimate=True)
    table = np.asarray(params["token_embedding"])
    embeds = table[ids]
    hidden, pooled = C.clip_encode_embeds(
        params, jnp.asarray(embeds), jnp.asarray(ids.astype(np.int32)),
        cfg=cfg, policy=L.FP32, layer_idx=-1,
    )
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden.numpy(), atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(), atol=5e-4, rtol=2e-3)
    hidden_pen, _ = C.clip_encode_embeds(
        params, jnp.asarray(embeds), jnp.asarray(ids.astype(np.int32)),
        cfg=cfg, policy=L.FP32, layer_idx=-2,
    )
    np.testing.assert_allclose(np.asarray(hidden_pen), ref_pen.numpy(), atol=5e-4, rtol=2e-3)


SD2_TINY = U.UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 0), context_dim=64, num_heads=-1,
    num_head_channels=16, use_linear_projections=True, attn_force="xla",
)


def test_sd2_style_unet_runs():
    params = U.init_unet_params(jax.random.PRNGKey(0), SD2_TINY)
    # proj_in is a linear now
    blk = params["input_blocks"][1]["attn"]
    assert blk["proj_in"]["weight"].ndim == 2
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    out = U.apply_unet(
        params, x, jnp.asarray([500.0]),
        jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64)),
        cfg=SD2_TINY, policy=L.FP32,
    )
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert SD2_TINY.heads_for(32) == 2 and SD2_TINY.heads_for(64) == 4


def test_detect_sd2_fingerprints():
    from lightdiffusion_tpu.loader.unet_weights import detect_unet_config

    class FakeTensor:
        def __init__(self, shape):
            self.shape = shape

    sd = {}
    P = "model.diffusion_model."
    sd[P + "input_blocks.0.0.weight"] = FakeTensor((320, 4, 3, 3))
    sd[P + "out.2.weight"] = FakeTensor((4, 320, 3, 3))
    sd[P + "input_blocks.1.0.out_layers.3.weight"] = FakeTensor((320, 320, 3, 3))
    sd[P + "input_blocks.1.1.proj_in.weight"] = FakeTensor((320, 320))  # linear!
    sd[P + "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"] = FakeTensor((320, 320))
    sd[P + "input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight"] = FakeTensor((320, 1024))
    cfg = detect_unet_config(sd)
    assert cfg.use_linear_projections
    assert cfg.num_head_channels == 64
    assert cfg.context_dim == 1024


def test_v_prediction_transforms():
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling

    ms = make_discrete_sampling("v")
    x = jnp.full((1, 2, 2, 4), 2.0)
    v = jnp.full((1, 2, 2, 4), 0.5)
    sigma = jnp.asarray([3.0])
    den = ms.calculate_denoised(sigma, v, x)
    expected = 2.0 / (9 + 1) - 0.5 * 3 / np.sqrt(10)
    np.testing.assert_allclose(np.asarray(den), expected, rtol=1e-5)
    # perfect v-model recovers x0: v = alpha*eps - sigma_*x0 in vp space;
    # check consistency: calculate_input same as eps
    np.testing.assert_allclose(
        np.asarray(ms.calculate_input(sigma, x)), 2.0 / np.sqrt(10), rtol=1e-6
    )


def test_sd2_pad_token():
    from lightdiffusion_tpu.text.tokenizer import SDTokenizer

    tok = SDTokenizer(pad_with_end=False, embedding_size=1024)
    c = tok.tokenize_with_weights("a cat")
    ids = c.ids[0]
    assert ids[0] == tok.bos
    payload = tok.bpe.encode("a cat")
    assert ids[1 + len(payload)] == tok.eos
    assert np.all(ids[2 + len(payload):] == 0)
