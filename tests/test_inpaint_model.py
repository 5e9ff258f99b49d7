"""9-channel inpaint-model family (concat input conditioning).

Beyond the reference, whose model registry is 4-channel SD1.5 only
(/root/reference/LightDiffusion.py:6015); the concat convention follows the
sd-1.5-inpainting release ([mask ‖ masked-image-latent] appended to the
pre-scaled UNet input each step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
from lightdiffusion_tpu.models import clip as C
from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.models import vae as V
from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.pipelines.sd import SDPipeline, inpaint, inpaint_conditioning

INPAINT_CFG = U.UNetConfig(
    in_channels=9,
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 0), context_dim=64, num_heads=2, attn_force="xla",
)


@pytest.fixture(scope="module")
def pipe():
    ccfg = C.ClipConfig(hidden_size=64, num_layers=2, num_heads=2,
                        intermediate_size=128)
    vcfg = V.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], INPAINT_CFG),
        unet_config=INPAINT_CFG,
        clip_params=C.init_clip_params(k[1], ccfg), clip_config=ccfg,
        vae_params=V.init_vae_params(k[2], vcfg), vae_config=vcfg,
        model_sampling=make_discrete_sampling("eps"),
    )
    return SDPipeline(sd, policy=L.FP32, clip_skip=-2)


def test_detect_9ch_config():
    """detect_unet_config sniffs in_channels=9 from a real torch-layout
    inpaint-model state dict (the 'auto-sniffed at load' contract)."""
    torch = pytest.importorskip("torch")
    from lightdiffusion_tpu.loader.unet_weights import detect_unet_config
    from tests.torch_ldm_ref import MiniLDMUNet

    torch.manual_seed(0)
    model = MiniLDMUNet(
        in_ch=9, out_ch=4, model_ch=32, channel_mult=(1, 2), num_res=(1, 1),
        depths=(1, 0), context_dim=64, heads=2,
    )
    sd = {
        "model.diffusion_model." + k: v.numpy()
        for k, v in model.state_dict().items()
    }
    cfg = detect_unet_config(sd)
    assert cfg.in_channels == 9
    assert cfg.out_channels == 4
    assert cfg.channel_mult == (1, 2)


def test_inpaint_conditioning_shapes(pipe):
    rng = np.random.RandomState(0)
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    mask = (rng.rand(1, 64, 64, 1) > 0.5).astype(np.float32)
    cc = inpaint_conditioning(pipe, img, mask)
    assert cc.shape == (1, 32, 32, 5)  # tiny VAE ratio 2
    # first channel is the downscaled mask (values 0/1)
    m = np.asarray(cc[..., 0])
    assert set(np.unique(m)).issubset({0.0, 1.0})


def test_inpaint_end_to_end(pipe):
    rng = np.random.RandomState(0)
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    mask = np.zeros((1, 64, 64, 1), np.float32)
    mask[:, 16:48, 16:48] = 1.0
    out = inpaint(pipe, img, mask, "a cat", "blurry", steps=3, seed=5)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
    # conditioning matters: a different mask changes the result
    mask2 = np.zeros_like(mask)
    mask2[:, :16, :16] = 1.0
    out2 = inpaint(pipe, img, mask2, "a cat", "blurry", steps=3, seed=5)
    assert np.abs(out - out2).max() > 1e-6


def test_inpaint_composes_with_cfg_cutoff_and_controlnet(pipe):
    """concat_cond forwards through the cfg_cutoff recursion, and a 4ch
    ControlNet sees only the latent channels of a 9ch model's input."""
    from lightdiffusion_tpu.models import controlnet as CN

    rng = np.random.RandomState(0)
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    mask = np.zeros((1, 64, 64, 1), np.float32)
    mask[:, 16:48, 16:48] = 1.0
    cc = inpaint_conditioning(pipe, img, mask)
    pos = pipe.encode_text("a cat")
    neg = pipe.encode_text("")
    latent = pipe.empty_latent(64, 64, 1)
    out = pipe.sample_latent(
        latent, pos, neg, seed=3, steps=4, cfg=7.0, concat_cond=cc,
        cfg_cutoff=0.5,
    )
    assert np.isfinite(np.asarray(out)).all()

    cn_cfg = U.UNetConfig(  # standard 4-channel controlnet
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 0), context_dim=64, num_heads=2,
        attn_force="xla",
    )
    cn = CN.init_controlnet_params(jax.random.PRNGKey(1), cn_cfg)
    hint = jax.random.uniform(jax.random.PRNGKey(5), (1, 256, 256, 3))
    out2 = pipe.sample_latent(
        latent, pos, neg, seed=3, steps=2, cfg=7.0, concat_cond=cc,
        control=(cn, cn_cfg, hint, 1.0),
    )
    assert np.isfinite(np.asarray(out2)).all()


def test_inpaint_masked_fill_is_gray(pipe):
    """The hole encodes as 0.5 gray (the sd-1.5-inpainting training
    distribution), not black."""
    img = np.ones((1, 64, 64, 3), np.float32)  # white image
    mask = np.ones((1, 64, 64, 1), np.float32)  # repaint everything
    cc = inpaint_conditioning(pipe, img, mask)
    all_gray = inpaint_conditioning(
        pipe, np.full((1, 64, 64, 3), 0.5, np.float32),
        np.zeros((1, 64, 64, 1), np.float32),
    )
    # fully-masked white image ≡ unmasked gray image in the latent half
    np.testing.assert_allclose(
        np.asarray(cc[..., 1:]), np.asarray(all_gray[..., 1:]), atol=1e-5
    )


def test_inpaint_rejects_4ch_models():
    from tests.test_quant import _tiny_pipe

    p4 = _tiny_pipe()
    img = np.zeros((1, 64, 64, 3), np.float32)
    mask = np.zeros((1, 64, 64, 1), np.float32)
    with pytest.raises(ValueError, match="9-channel"):
        inpaint(p4, img, mask, "x")
