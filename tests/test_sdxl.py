"""SDXL family: XL-style UNet (ADM conditioning, linear projections, deep
middle), dual-tower text encoding, config detection, y-vector math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.models import clip as C
from lightdiffusion_tpu.ops import layers as L


XL_TINY = U.UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(0, 2), middle_depth=2, context_dim=64,
    num_heads=-1, num_head_channels=16, use_linear_projections=True,
    adm_in_channels=24, attn_force="xla",
)


@pytest.fixture(scope="module")
def torch_pair():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniLDMUNet

    torch.manual_seed(0)
    model = MiniLDMUNet(
        model_ch=32, channel_mult=(1, 2), num_res=(1, 1), depths=(0, 2),
        context_dim=64, heads=2, mid_depth=2, adm_ch=24, use_linear=True, head_ch=16,
    ).eval()
    sd = {"model.diffusion_model." + k: v.numpy() for k, v in model.state_dict().items()}
    from lightdiffusion_tpu.loader.unet_weights import convert_unet

    params = convert_unet(sd, XL_TINY, dtype=jnp.float32)
    return model, params, sd


def test_xl_unet_parity(torch_pair):
    import torch

    model, params, _ = torch_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([999.0, 10.0], np.float32)
    ctx = rng.randn(2, 77, 64).astype(np.float32)
    y = rng.randn(2, 24).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x), torch.from_numpy(t),
                    torch.from_numpy(ctx), torch.from_numpy(y)).numpy()
    out = U.apply_unet(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(ctx), y=jnp.asarray(y), cfg=XL_TINY, policy=L.FP32,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=3e-4, rtol=3e-4
    )


def test_detect_xl_config(torch_pair):
    from lightdiffusion_tpu.loader.unet_weights import detect_unet_config

    _, _, sd = torch_pair
    cfg = detect_unet_config(sd)
    assert cfg.adm_in_channels == 24
    assert cfg.middle_depth == 2
    assert cfg.transformer_depth == (0, 2)
    assert cfg.use_linear_projections


def test_sdxl_vector_conditioning_shape():
    pooled = jnp.ones((1, 1280))
    y = C.sdxl_vector_conditioning(pooled, 1024, 1024)
    assert y.shape == (1, 1280 + 6 * 256)
    # first 1280 entries are the pooled vector
    np.testing.assert_allclose(np.asarray(y[:, :1280]), 1.0)


def test_sdxl_dual_tower_encoder():
    kl, kg = jax.random.split(jax.random.PRNGKey(0))
    cfg_l = C.ClipConfig(hidden_size=64, num_layers=2, num_heads=2,
                         intermediate_size=128)
    cfg_g = C.ClipConfig(hidden_size=96, num_layers=3, num_heads=2,
                         intermediate_size=192, hidden_act="gelu",
                         pad_with_end=False)
    enc = C.SDXLTextEncoder(
        C.init_clip_params(kl, cfg_l), C.init_clip_params(kg, cfg_g),
        cfg_l, cfg_g, clip_skip=-2,
    )
    cond, pooled = enc.encode("a (cat:1.2)")
    assert cond.shape == (1, 77, 64 + 96)
    assert pooled.shape == (1, 96)
    assert np.isfinite(np.asarray(cond)).all()


def test_xl_pipeline_end_to_end():
    from tests.test_pipeline import TINY_VAE
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import vae as V
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline, txt2img

    k = jax.random.split(jax.random.PRNGKey(0), 4)
    cfg_l = C.ClipConfig(hidden_size=24, num_layers=2, num_heads=2,
                         intermediate_size=48)
    cfg_g = C.ClipConfig(hidden_size=40, num_layers=2, num_heads=2,
                         intermediate_size=80, hidden_act="gelu",
                         pad_with_end=False)
    xl_cfg = U.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(0, 1), middle_depth=1, context_dim=64,
        num_heads=-1, num_head_channels=16, use_linear_projections=True,
        adm_in_channels=40 + 6 * 256, attn_force="xla",
    )
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], xl_cfg), unet_config=xl_cfg,
        clip_params=C.init_clip_params(k[1], cfg_l), clip_config=cfg_l,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
        clip2_params=C.init_clip_params(k[3], cfg_g), clip2_config=cfg_g,
    )
    pipe = SDPipeline(sd, policy=L.FP32)
    img = txt2img(pipe, "a cat", "bad", width=32, height=32, steps=2,
                  seed=0, sampler_name="euler_ancestral")
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(img).all()


def test_xl_deepcache_runs():
    from tests.test_pipeline import TINY_VAE
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import vae as V
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline

    k = jax.random.split(jax.random.PRNGKey(0), 4)
    cfg_l = C.ClipConfig(hidden_size=24, num_layers=2, num_heads=2,
                         intermediate_size=48)
    cfg_g = C.ClipConfig(hidden_size=40, num_layers=2, num_heads=2,
                         intermediate_size=80, hidden_act="gelu",
                         pad_with_end=False)
    xl_cfg = U.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(0, 1), middle_depth=1, context_dim=64,
        num_heads=-1, num_head_channels=16, use_linear_projections=True,
        adm_in_channels=40 + 6 * 256, attn_force="xla",
    )
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], xl_cfg), unet_config=xl_cfg,
        clip_params=C.init_clip_params(k[1], cfg_l), clip_config=cfg_l,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
        clip2_params=C.init_clip_params(k[3], cfg_g), clip2_config=cfg_g,
    )
    pipe = SDPipeline(sd, policy=L.FP32)
    pos, neg = pipe.encode_text("cat"), pipe.encode_text("")
    latent = pipe.empty_latent(32, 32)
    out = pipe.sample_latent(
        latent, pos, neg, steps=4, sampler_name="euler_ancestral",
        deepcache_interval=2,
    )
    assert np.isfinite(np.asarray(out)).all()
    # masked XL path
    mask = np.zeros((1, latent.shape[1], latent.shape[2], 1), np.float32)
    mask[:, 2:6, 2:6] = 1.0
    out2 = pipe.sample_latent(
        latent, pos, neg, steps=3, denoise=0.6, noise_mask=jnp.asarray(mask),
        sampler_name="euler_ancestral",
    )
    assert np.isfinite(np.asarray(out2)).all()
