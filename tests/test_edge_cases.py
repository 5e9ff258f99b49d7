"""Edge cases across the stack: odd sizes, combined prompt features,
non-square tiles, import surface."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_public_api_imports():
    import lightdiffusion_tpu as ld

    assert callable(ld.load_checkpoint)
    assert callable(ld.txt2img)
    assert callable(ld.ultimate_sd_upscale)
    assert callable(ld.adetailer)
    assert ld.__version__
    with pytest.raises(AttributeError):
        ld.nope


def test_warmup_module_importable():
    from lightdiffusion_tpu.runtime import warmup

    assert len(warmup.DEFAULT_BUCKETS) >= 4


def test_prompt_with_everything(tmp_path):
    """Weights + escapes + TI + long text together."""
    import safetensors.numpy as st
    from lightdiffusion_tpu.text.tokenizer import SDTokenizer

    emb = np.random.RandomState(0).randn(2, 768).astype(np.float32)
    st.save_file({"emb_params": emb}, str(tmp_path / "sty.safetensors"))
    tok = SDTokenizer(embedding_dir=tmp_path)
    text = (
        "(masterpiece:1.3) embedding:sty \\(scene\\) "
        + " ".join(["photorealistic"] * 50)
        + " ((bokeh))"
    )
    c = tok.tokenize_with_weights(text)
    assert c.ids.shape[0] >= 2
    assert len(c.embeddings) == 1
    assert (c.ids == -1).sum() == 2  # two TI rows spliced
    ws = np.unique(c.weights)
    assert np.any(np.isclose(ws, 1.3, atol=1e-4))
    assert np.any(np.isclose(ws, 1.21, atol=1e-4))


def test_txt2img_non_square_and_odd_steps():
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline, txt2img

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    pipe = SDPipeline(sd, policy=L.FP32)
    img = txt2img(pipe, "cat", "", width=48, height=32, steps=5, seed=0,
                  sampler_name="dpmpp_2m")
    assert img.shape == (1, 32, 48, 3)
    assert np.isfinite(img).all()


def test_usdu_non_divisible_size():
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu.postprocess.usdu import ultimate_sd_upscale

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    pipe = SDPipeline(sd, policy=L.FP32)
    img = np.random.RandomState(0).rand(1, 40, 56, 3).astype(np.float32)
    out = ultimate_sd_upscale(
        pipe, img, "x", "", upscale_by=1.5, steps=2, denoise=0.4,
        tile_width=32, tile_height=32, mask_blur=2, padding=4,
        seam_fix_mode="None",
    )
    assert out.shape == (1, 60, 84, 3)
    assert np.isfinite(out).all()


def test_tiled_apply_batch_gt_one():
    from lightdiffusion_tpu.postprocess.tiling import tiled_apply

    imgs = np.random.RandomState(0).rand(3, 40, 40, 3).astype(np.float32)
    out = tiled_apply(lambda t: t * 2.0, imgs, scale=1, tile=16, overlap=4,
                      tile_batch=4)
    np.testing.assert_allclose(out, imgs * 2, atol=1e-5)
