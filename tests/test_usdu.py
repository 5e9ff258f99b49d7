"""UltimateSDUpscale engine smoke + mask-op unit tests."""

import numpy as np
import jax
import pytest

from lightdiffusion_tpu.postprocess import maskops as M
from lightdiffusion_tpu.postprocess.usdu import ultimate_sd_upscale, upscale_image


def test_gaussian_blur_mass_preserved():
    m = np.zeros((32, 32), np.float32)
    m[12:20, 12:20] = 1.0
    b = M.gaussian_blur(m, 4)
    assert 0 < b[10, 10] < 1.0
    np.testing.assert_allclose(b.sum(), m.sum(), rtol=0.05)


def test_crop_region_and_expand():
    m = np.zeros((64, 64), np.float32)
    m[10:20, 30:40] = 1.0
    x1, y1, x2, y2 = M.get_crop_region(m, pad=4)
    assert (x1, y1, x2, y2) == (26, 6, 44, 24)
    (ex1, ey1, ex2, ey2), (tw, th) = M.expand_crop((x1, y1, x2, y2), 64, 64, 32, 32)
    assert tw == 32 and th == 32
    assert ex1 >= 0 and ey2 <= 64


def test_dilate_mask():
    m = np.zeros((16, 16), np.float32)
    m[8, 8] = 1.0
    d = M.dilate_mask(m, 2)
    assert d.sum() > 1
    e = M.dilate_mask(d, -1)
    assert 1 <= e.sum() < d.sum()


def test_paste_masked():
    dst = np.zeros((8, 8, 3), np.float32)
    src = np.ones((4, 4, 3), np.float32)
    mask = np.full((4, 4), 0.5, np.float32)
    M.paste_masked(dst, src, 2, 2, mask)
    assert dst[3, 3, 0] == 0.5 and dst[0, 0, 0] == 0.0


def test_upscale_image_lanczos_only():
    img = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    out = upscale_image(img, 32, 32, esrgan=None)
    assert out.shape == (1, 32, 32, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_tiled_apply_never_pads_past_tile_count():
    """A 1-tile job must run at batch 1, not balloon to tile_batch (the
    r5 USDU bench OOM: batch-4 512px tiles through ESRGAN x4)."""
    from lightdiffusion_tpu.postprocess.tiling import tiled_apply

    seen = []

    def fn(t):
        seen.append(t.shape[0])
        return t

    img = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    out = tiled_apply(fn, img, scale=1.0, tile=16, overlap=4, tile_batch=4)
    assert seen == [1]
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_tiled_apply_small_input_fractional_scale():
    """Overlap clamping on small tiles must keep overlap*scale integral
    (tiled VAE *encode* uses scale=1/8): a 72px input clamps tile to 72
    and overlap 64 -> 32 (multiple of 8), not 36 (-> s(36)=4.5 assert)."""
    from lightdiffusion_tpu.postprocess.tiling import tiled_apply

    img = np.random.RandomState(0).rand(1, 72, 72, 3).astype(np.float32)
    out = tiled_apply(lambda t: t[:, ::8, ::8], img, scale=1 / 8,
                      tile=512, overlap=64)
    assert out.shape == (1, 9, 9, 3)


def test_image_upscale_node_bounds_tile_batch(monkeypatch):
    """The node surface (ref :7356) must apply the same activation-memory
    bound as usdu.upscale_image — x4 512px tiles run solo."""
    import lightdiffusion_tpu.postprocess.tiling as TL
    from lightdiffusion_tpu.models.esrgan import (
        ESRGANConfig, init_esrgan_params)
    from lightdiffusion_tpu.nodes import ImageUpscaleWithModel

    seen = {}
    real = TL.tiled_apply

    def spy(fn, images, scale, **kw):
        seen.update(kw)
        return real(fn, images, scale, **kw)

    monkeypatch.setattr(TL, "tiled_apply", spy)
    import lightdiffusion_tpu.nodes as N
    cfg = ESRGANConfig(num_blocks=1, num_feat=8, scale=4)
    params = init_esrgan_params(jax.random.PRNGKey(0), cfg)
    img = np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32)
    (out,) = ImageUpscaleWithModel().upscale((params, cfg), img)
    assert out.shape == (1, 64, 64, 3)
    # num_feat=8 is tiny -> full batch allowed; the bound kwarg must be set
    assert seen.get("tile_batch") == 4
    # and at RealESRGAN width the 512px x4 regime is batch-1
    from lightdiffusion_tpu.postprocess.usdu import _esrgan_tile_batch
    assert _esrgan_tile_batch(512, 4, 64) == 1


def test_esrgan_tile_batch_memory_bound():
    """Output-side activation budget: x4 512px tiles run solo; VAE-decode
    scale tiles keep the full batch."""
    from lightdiffusion_tpu.postprocess.usdu import _esrgan_tile_batch

    assert _esrgan_tile_batch(512, 4) == 1
    assert _esrgan_tile_batch(384, 4) == 2
    assert _esrgan_tile_batch(64, 8) == 4   # tiled VAE decode regime
    assert _esrgan_tile_batch(128, 2) == 4


def test_upscale_image_esrgan_chains_to_target():
    """Tiny ESRGAN x2 chains twice for a x4 target and respects tile
    batching; values stay clipped to [0,1]."""
    import jax

    from lightdiffusion_tpu.models.esrgan import (
        ESRGANConfig, init_esrgan_params)

    cfg = ESRGANConfig(num_blocks=1, num_feat=8, scale=2)
    params = init_esrgan_params(jax.random.PRNGKey(0), cfg)
    img = np.random.RandomState(1).rand(1, 8, 8, 3).astype(np.float32)
    out = upscale_image(img, 32, 32, esrgan=(params, cfg), tile=8)
    assert out.shape == (1, 32, 32, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_usdu_end_to_end():
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET),
        unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP),
        clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE),
        vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    pipe = SDPipeline(sd, policy=L.FP32)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    out = ultimate_sd_upscale(
        pipe, img, "a cat", "", upscale_by=2.0, steps=2, denoise=0.4,
        tile_width=32, tile_height=32, mask_blur=4, padding=8,
        seam_fix_mode="Half Tile", seam_fix_denoise=0.3, seed=0,
    )
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 1


def _tiny_pipe():
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    return SDPipeline(sd, policy=L.FP32)


@pytest.mark.parametrize("mode,seam", [
    ("Chess", "None"),
    ("Linear", "Band Pass"),
    ("Linear", "Half Tile + Intersections"),
])
def test_usdu_modes(mode, seam):
    pipe = _tiny_pipe()
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    out = ultimate_sd_upscale(
        pipe, img, "x", "", upscale_by=2.0, steps=2, denoise=0.4,
        tile_width=32, tile_height=32, mask_blur=2, padding=4,
        seam_fix_mode=seam, seam_fix_denoise=0.3, seam_fix_width=16,
        mode_type=mode, seed=0,
    )
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


def test_usdu_half_tile_non_square_tiles():
    """Half Tile seams with tile_width != tile_height (ADVICE r1: the shared
    gradient crashed/truncated); also exercises edge-clamped bands."""
    pipe = _tiny_pipe()
    img = np.random.RandomState(1).rand(1, 48, 32, 3).astype(np.float32)
    out = ultimate_sd_upscale(
        pipe, img, "x", "", upscale_by=2.0, steps=2, denoise=0.4,
        tile_width=32, tile_height=48, mask_blur=2, padding=4,
        seam_fix_mode="Half Tile", seam_fix_denoise=0.3, seed=0,
    )
    assert out.shape == (1, 96, 64, 3)
    assert np.isfinite(out).all()


def test_half_tile_gradient_clamp_offset():
    """An edge-clamped feather band keeps the ramp portion matching its
    clamped offset (falling half at the top edge), not the rising half."""
    span = 8
    grad = np.concatenate(
        [np.linspace(0, 1, span // 2), np.linspace(1, 0, span - span // 2)]
    ).astype(np.float32)
    y1 = -3  # band clamped 3 px above the image top
    ys = slice(max(y1, 0), min(y1 + span, 16))
    g = grad[ys.start - y1 : ys.start - y1 + ys.stop - ys.start]
    np.testing.assert_array_equal(g, grad[3:])


def test_usdu_chess_batched_tiles():
    """Chess waves redraw as batched sampling programs (TPU-native tile
    parallelism); output stays finite/in-range and covers every tile."""
    pipe = _tiny_pipe()
    img = np.random.RandomState(2).rand(1, 64, 32, 3).astype(np.float32)
    out = ultimate_sd_upscale(
        pipe, img, "x", "", upscale_by=2.0, steps=2, denoise=0.9,
        tile_width=32, tile_height=32, mask_blur=2, padding=4,
        seam_fix_mode="None", mode_type="Chess", batch_tiles=True, seed=0,
    )
    assert out.shape == (1, 128, 64, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 1
    # at denoise 0.9 every region must have actually been redrawn
    up = np.asarray(upscale_image(img, 64, 128))
    assert np.abs(out - up).max() > 1e-3


def test_usdu_interrupt_stops_within_one_tile():
    """on_tile(done, total, canvas) with a False return stops the pass at
    the next tile boundary (VERDICT r2 item 3; ref interrupt_flag polling
    :922/:10794)."""
    pipe = _tiny_pipe()
    img = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    calls = []

    def stop_after_first(done, total, canvas):
        calls.append((done, total))
        assert canvas.shape == (128, 128, 3)
        return False

    out = ultimate_sd_upscale(
        pipe, img, "x", "", upscale_by=2.0, steps=2, denoise=0.9,
        tile_width=32, tile_height=32, mask_blur=2, padding=4,
        seam_fix_mode="Half Tile", seam_fix_denoise=0.3, seed=0,
        on_tile=stop_after_first,
    )
    # exactly one tile was redrawn before the stop — not the full 16-tile
    # grid plus 24 seam bands
    assert calls == [(1, 40)]
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(out).all()


def test_usdu_on_tile_progress_counts():
    """Full run reports monotonically increasing progress ending at total."""
    pipe = _tiny_pipe()
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    seen = []
    out = ultimate_sd_upscale(
        pipe, img, "x", "", upscale_by=2.0, steps=2, denoise=0.4,
        tile_width=32, tile_height=32, mask_blur=2, padding=4,
        seam_fix_mode="Half Tile", seam_fix_denoise=0.3, seed=0,
        on_tile=lambda d, t, c: seen.append((d, t)),
    )
    assert out.shape == (1, 64, 64, 3)
    dones = [d for d, _ in seen]
    totals = {t for _, t in seen}
    assert dones == sorted(dones) and len(totals) == 1
    assert dones[-1] == totals.pop() == 8  # 2x2 tiles + 4 half-tile seams


def test_usdu_chess_batched_interrupt():
    """Batched Chess waves honor the stop contract between wave chunks."""
    pipe = _tiny_pipe()
    img = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    calls = []

    def stop_immediately(done, total, canvas):
        calls.append(done)
        return False

    out = ultimate_sd_upscale(
        pipe, img, "x", "", upscale_by=2.0, steps=2, denoise=0.9,
        tile_width=32, tile_height=32, mask_blur=2, padding=4,
        seam_fix_mode="None", mode_type="Chess", batch_tiles=True, seed=0,
        on_tile=stop_immediately,
    )
    assert len(calls) == 1  # stopped after the first wave sub-batch
    assert out.shape == (1, 128, 128, 3)


def test_usdu_over_mesh_matches_single_device():
    """USDU tile waves ride the mesh: batched Chess waves (and sequential
    tiles) run through SDPipeline._shard_batch, so a dp4 x tp2 SPMD pipe
    reproduces the single-device canvas exactly at fp32 (the SURVEY §5.7
    'spatial tiling shards as extra batch on dp' claim, under test)."""
    from lightdiffusion_tpu.parallel import mesh as M
    from lightdiffusion_tpu.ops import layers as L
    from lightdiffusion_tpu.pipelines.sd import SDPipeline

    img = np.random.RandomState(1).rand(1, 48, 48, 3).astype(np.float32)
    kw = dict(upscale_by=2.0, steps=2, denoise=0.4, tile_width=32,
              tile_height=32, mask_blur=4, padding=8, mode_type="Chess",
              batch_tiles=True, seed=0)

    ref = ultimate_sd_upscale(_tiny_pipe(), img, "a cat", "", **kw)

    pipe2 = _tiny_pipe()
    mesh_pipe = SDPipeline(pipe2.sd, policy=L.FP32,
                           mesh=M.make_mesh(n_dp=4, n_tp=2))
    out = ultimate_sd_upscale(mesh_pipe, img, "a cat", "", **kw)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_usdu_accelerator_threading():
    """deepcache_interval/uncond_interval reach every tile AND seam redraw
    sampling call (the accel dict), and the result stays finite."""
    pipe = _tiny_pipe()
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    seen = []
    orig = pipe.sample_latent

    def spy(*a, **kw):
        seen.append((kw.get("deepcache_interval"), kw.get("uncond_interval")))
        return orig(*a, **kw)

    pipe.sample_latent = spy
    out = ultimate_sd_upscale(
        pipe, img, "x", "", upscale_by=2.0, steps=4, denoise=0.4,
        tile_width=32, tile_height=32, mask_blur=2, padding=4,
        seam_fix_mode="Band Pass", seam_fix_denoise=0.3, seam_fix_width=16,
        mode_type="Linear", seed=0,
        deepcache_interval=2, uncond_interval=3,
    )
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
    assert seen and all(s == (2, 3) for s in seen)
