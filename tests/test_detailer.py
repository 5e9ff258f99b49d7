"""Detailer: masked inpaint denoising, DifferentialDiffusion, full
adetailer pass with tiny YOLO+SAM+SD models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.diffusion.inpaint import (
    differential_diffusion_mask_fn,
    make_masked_denoiser,
)
from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling


def test_masked_denoiser_preserves_outside():
    ms = make_discrete_sampling()
    latent = jnp.full((1, 8, 8, 4), 5.0)
    noise = jnp.zeros_like(latent)
    mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)

    def den(x, sigma):
        return jnp.zeros_like(x)  # predicts x0=0 inside mask

    fn = make_masked_denoiser(den, latent, noise, mask)
    out = fn(jnp.ones_like(latent), jnp.asarray(3.0))
    out = np.asarray(out)
    assert np.all(out[0, 0, 0] == 5.0)  # outside mask: original
    assert np.all(out[0, 4, 4] == 0.0)  # inside mask: denoiser output


def test_differential_diffusion_thresholding():
    ms = make_discrete_sampling()
    fn = differential_diffusion_mask_fn(ms)
    soft = jnp.asarray([[0.1, 0.5, 0.9]])
    # at sigma_max, threshold=1 → only mask=1 regions active
    m_hi = np.asarray(fn(jnp.asarray(float(ms.sigma_max)), soft))
    assert m_hi.sum() == 0.0
    # at sigma_min, threshold=0 → everything active
    m_lo = np.asarray(fn(jnp.asarray(float(ms.sigma_min)), soft))
    assert m_lo.sum() == 3.0
    # midway: partial
    mid_sigma = float(ms.sigma(jnp.asarray(500.0)))
    m_mid = np.asarray(fn(jnp.asarray(mid_sigma), soft))
    assert 0 < m_mid.sum() < 3


def test_masked_sampling_in_pipeline():
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.pipelines.sd import SDPipeline

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    pipe = SDPipeline(sd, policy=L.FP32)
    latent = jnp.full((1, 8, 8, 4), 0.3)
    mask = np.zeros((1, 8, 8, 1), np.float32)
    mask[:, 2:6, 2:6] = 1.0
    pos, neg = pipe.encode_text("x"), pipe.encode_text("")
    out = pipe.sample_latent(
        latent, pos, neg, steps=3, denoise=0.5, noise_mask=jnp.asarray(mask),
        sampler_name="euler_ancestral",
    )
    out = np.asarray(out)
    # hard mask: outside is untouched, inside regenerated
    np.testing.assert_allclose(out[0, 0, 0], 0.3, atol=1e-5)
    assert np.abs(out[0, 4, 4] - 0.3).max() > 1e-4
    # differential diffusion: the threshold reaches 0 on the last step, so
    # the whole image gets a final light denoise (reference semantics) —
    # outside changes slightly but far less than inside
    out_dd = np.asarray(
        pipe.sample_latent(
            latent, pos, neg, steps=3, denoise=0.5,
            noise_mask=jnp.asarray(mask), differential_diffusion=True,
            sampler_name="euler_ancestral",
        )
    )
    outside_delta = np.abs(out_dd[0, 0, 0] - 0.3).max()
    inside_delta = np.abs(out_dd[0, 4, 4] - 0.3).max()
    assert outside_delta < inside_delta


def test_full_adetailer_with_tiny_models():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniYolo, MiniSam
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from tests.test_sam import MINI as SAM_MINI
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.models import yolo as Y
    from lightdiffusion_tpu.models import sam as SM
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.pipelines.sd import SDPipeline
    from lightdiffusion_tpu.pipelines.adetailer import adetailer_pass

    torch.manual_seed(0)
    ymodel = MiniYolo(nc=2, seg=True)
    with torch.no_grad():
        ymodel.train(); ymodel(torch.randn(2, 3, 64, 64)); ymodel.eval()
    ysd = {"model." + k: v.numpy() for k, v in ymodel.state_dict().items()}
    yparams, ycfg = Y.convert_yolov8(ysd)
    detector = Y.YoloDetector(yparams, ycfg, {0: "person", 1: "face"}, input_size=64)

    smodel = MiniSam().eval()
    sparams = SM.convert_sam(
        {k: v.numpy() for k, v in smodel.state_dict().items()}, SAM_MINI
    )
    sam_pred = SM.SamPredictor(sparams, SAM_MINI)

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    pipe = SDPipeline(sd, policy=L.FP32)

    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    out = adetailer_pass(
        pipe, img, detector, sam_pred, bbox_threshold=0.0, steps=2,
        guide_size=32, max_size=48, feather=2, noise_mask_feather=4,
        drop_size=1,
    )
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 1


def test_detail_segs_interrupt_stops_within_one_seg():
    """on_seg/on_chunk make the detailer pass interruptible (VERDICT r2
    item 3): a False return stops after the current seg; on_chunk stops the
    in-flight 40-step sampling at a chunk boundary."""
    from lightdiffusion_tpu.postprocess.detailer import SEG, detail_segs
    from tests.test_usdu import _tiny_pipe

    pipe = _tiny_pipe()
    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    mask = np.ones((24, 24), np.float32)
    segs = [
        SEG(None, mask, 0.9, [0, 0, 24, 24], [4, 4, 20, 20], "face"),
        SEG(None, mask, 0.9, [24, 24, 48, 48], [28, 28, 44, 44], "face"),
        SEG(None, mask, 0.9, [40, 40, 64, 64], [44, 44, 60, 60], "face"),
    ]
    pos, neg = pipe.encode_text("x"), pipe.encode_text("")

    seg_calls, chunk_calls = [], []
    canvas, enhanced = detail_segs(
        pipe, img, segs, pos, neg, seed=0, steps=4, guide_size=32,
        max_size=48, noise_mask_feather=2,
        on_seg=lambda d, t, c: seg_calls.append((d, t)) or False,
        on_chunk=lambda d, t, x: chunk_calls.append(d),
    )
    assert seg_calls == [(1, 3)]  # stopped after the first seg
    assert len(enhanced) == 1
    assert canvas.shape == img.shape and np.isfinite(canvas).all()
    assert len(chunk_calls) >= 1  # sampling went through the chunked path

    # mid-seg interrupt: on_chunk False stops the sampling after one chunk
    chunk_calls2 = []
    canvas2, _ = detail_segs(
        pipe, img, segs[:1], pos, neg, seed=0, steps=6, guide_size=32,
        max_size=48, noise_mask_feather=2,
        on_chunk=lambda d, t, x: chunk_calls2.append(d) or False,
    )
    assert len(chunk_calls2) == 1
    assert np.isfinite(canvas2).all()


def test_adetailer_interrupt_poll():
    """adetailer(interrupt=...) wires the stop contract through both
    passes without loading real detectors."""
    from lightdiffusion_tpu.pipelines.adetailer import adetailer
    from tests.test_usdu import _tiny_pipe

    pipe = _tiny_pipe()
    imgs = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)

    def fake_detector(image, conf=0.5):
        return (np.array([[4.0, 4.0, 28.0, 28.0]]), np.array([0.9]),
                ["face"], None)

    out = adetailer(
        pipe, imgs, detectors=(None, fake_detector, None), steps=2,
        guide_size=32, max_size=48, noise_mask_feather=2,
        interrupt=lambda: True,
    )
    np.testing.assert_array_equal(out, imgs)  # stopped before any work
    out2 = adetailer(
        pipe, imgs, detectors=(None, fake_detector, None), steps=2,
        guide_size=32, max_size=48, noise_mask_feather=2,
        interrupt=lambda: False,
    )
    assert np.abs(out2 - imgs).max() > 1e-5  # ran the face pass


def test_detailer_accelerator_threading():
    """The cached accelerators reach the masked per-seg sampling (the
    slowest reference phase): enhance_detail forwards both intervals and
    the masked stateful program produces a finite crop."""
    from lightdiffusion_tpu.postprocess.detailer import SEG, enhance_detail
    from tests.test_usdu import _tiny_pipe

    pipe = _tiny_pipe()
    img = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    seg = SEG(cropped_image=None, cropped_mask=mask,
              crop_region=(16, 16, 48, 48), bbox=(24, 24, 40, 40),
              confidence=0.9, label="face")
    seen = []
    orig = pipe.sample_latent

    def spy(*a, **kw):
        seen.append((kw.get("deepcache_interval"), kw.get("uncond_interval")))
        return orig(*a, **kw)

    pipe.sample_latent = spy
    crop = enhance_detail(
        pipe, img, seg, pipe.encode_text("x"), pipe.encode_text(""),
        guide_size=32.0, max_size=48.0, steps=4, denoise=0.6,
        noise_mask_feather=2, deepcache_interval=2, uncond_interval=2,
    )
    assert crop is not None and np.isfinite(crop).all()
    assert seen and all(s == (2, 2) for s in seen)
