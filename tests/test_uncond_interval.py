"""Guidance-delta caching (``uncond_interval``): the uncond CFG branch runs
every N steps; skip steps reuse the stored ``d_cond − d_uncond`` delta and run
the UNet cond-only at batch B. Beyond-reference accelerator (the reference
always runs the full 2·B CFG batch every step, LightDiffusion.py:648-663);
the temporal-redundancy observation is DeepCache's (arXiv 2312.03209) applied
to the guidance term.

Contracts tested here:
  - refresh steps are algebraically exact CFG; skip steps equal
    ``d_cond + (s−1)·delta`` with the stored delta
  - chunked == monolithic (the delta threads through the chunk state, even
    when a skip step opens a chunk)
  - composition with deepcache_interval (the dual-cache denoiser): skip
    steps run shallow cond-only, deep refresh promotes to a full step,
    ui=1 degenerates to pure DeepCache, chunked == monolithic
  - per-sample (B,) cfg scales match the scalar run
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.diffusion.cfg import make_cfg_denoiser
from lightdiffusion_tpu.pipelines.sd import _make_uncond_skip_cfg_denoiser
from tests.test_pipeline import TINY_UNET, pipe  # noqa: F401


def test_denoiser_refresh_exact_and_skip_algebra(pipe):  # noqa: F811
    ms = pipe.sd.model_sampling
    params = pipe.sd.unet_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    uncond = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 64))
    sigma = jnp.float32(5.0)
    cfg_scale = 7.0

    den = _make_uncond_skip_cfg_denoiser(
        ms, TINY_UNET, L.FP32, params, cond, uncond, cfg_scale, interval=2,
    )

    # i=0: full CFG batch — must equal the exact CFG denoiser
    def apply(p, xi, t, ctx):
        return U.apply_unet(p, xi, t, ctx, cfg=TINY_UNET, policy=L.FP32)

    exact = make_cfg_denoiser(apply, params, cond, uncond, cfg_scale, ms)
    d0, delta = den(x, sigma, jnp.int32(0), jnp.zeros_like(x))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(exact(x, sigma)), atol=1e-5, rtol=1e-5
    )
    assert np.abs(np.asarray(delta)).max() > 0

    # i=1 (skip): cond-only eval + stored delta, delta passes through
    x2 = x * 0.9
    d1, delta1 = den(x2, sigma, jnp.int32(1), delta)
    np.testing.assert_array_equal(np.asarray(delta1), np.asarray(delta))
    sig_b = jnp.full((2,), sigma)
    eps = apply(
        params, ms.calculate_input(sig_b, x2), ms.timestep(sig_b),
        jnp.broadcast_to(cond, (2,) + cond.shape[1:]),
    )
    d_cond = ms.calculate_denoised(sig_b, eps, x2)
    np.testing.assert_allclose(
        np.asarray(d1),
        np.asarray(d_cond + (cfg_scale - 1.0) * delta),
        atol=1e-5, rtol=1e-5,
    )


def test_chunked_matches_monolithic(pipe):  # noqa: F811
    """chunk_size=3 with interval=2 puts a SKIP step (i=3) at the head of
    chunk 2 — the stored delta must thread through the chunk state."""
    latent = pipe.empty_latent(32, 32)
    pos, neg = pipe.encode_text("cat"), pipe.encode_text("")
    full = pipe.sample_latent(
        latent, pos, neg, seed=3, steps=6, sampler_name="euler_ancestral",
        uncond_interval=2,
    )
    chunked = pipe.sample_latent_chunked(
        latent, pos, neg, seed=3, steps=6, sampler_name="euler_ancestral",
        uncond_interval=2, chunk_size=3,
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), atol=1e-5, rtol=1e-5
    )
    # the accelerator actually changes the trajectory vs plain CFG...
    plain = pipe.sample_latent(
        latent, pos, neg, seed=3, steps=6, sampler_name="euler_ancestral",
    )
    assert np.abs(np.asarray(full) - np.asarray(plain)).max() > 1e-6
    # ...and stays finite with a frozen first-step delta (interval > steps)
    frozen = pipe.sample_latent(
        latent, pos, neg, seed=3, steps=4, sampler_name="euler_ancestral",
        uncond_interval=999,
    )
    assert np.isfinite(np.asarray(frozen)).all()


def test_sde_sampler_and_cfg_cutoff_compose(pipe):  # noqa: F811
    latent = pipe.empty_latent(32, 32)
    pos, neg = pipe.encode_text("cat"), pipe.encode_text("")
    out = pipe.sample_latent(
        latent, pos, neg, seed=1, steps=4, sampler_name="dpmpp_2m_sde",
        uncond_interval=2,
    )
    assert np.isfinite(np.asarray(out)).all()
    # guided head runs delta-cached, cond-only tail unchanged
    full = pipe.sample_latent(
        latent, pos, neg, seed=2, steps=6, sampler_name="euler_ancestral",
        uncond_interval=2, cfg_cutoff=0.5,
    )
    chunked = pipe.sample_latent_chunked(
        latent, pos, neg, seed=2, steps=6, sampler_name="euler_ancestral",
        uncond_interval=2, cfg_cutoff=0.5, chunk_size=2,
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), atol=1e-5, rtol=1e-5
    )


def test_per_sample_cfg(pipe):  # noqa: F811
    pos, neg = pipe.encode_text("cat"), pipe.encode_text("")
    # (B,) cfg equal to the scalar reproduces the scalar run exactly
    lat2 = pipe.empty_latent(32, 32, batch=2)
    scalar = pipe.sample_latent(
        lat2, pos, neg, seed=5, steps=4, cfg=7.0,
        sampler_name="euler_ancestral", uncond_interval=2,
    )
    vec = pipe.sample_latent(
        lat2, pos, neg, seed=5, steps=4, cfg=jnp.asarray([7.0, 7.0]),
        sampler_name="euler_ancestral", uncond_interval=2,
    )
    np.testing.assert_allclose(
        np.asarray(scalar), np.asarray(vec), atol=1e-6, rtol=1e-6
    )


# --------------------------- DeepCache composition (dual-cache denoiser) ----

def test_dual_denoiser_step_semantics(pipe):  # noqa: F811
    """Per-step contracts of the composed denoiser: full step on either
    cadence, shallow cond-only otherwise, deep refresh promotes the step."""
    from lightdiffusion_tpu.pipelines.sd import _make_dual_cache_cfg_denoiser

    ms = pipe.sd.model_sampling
    params = pipe.sd.unet_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    uncond = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 64))
    sigma = jnp.float32(5.0)
    cfg_scale = 7.0
    cache0 = jnp.zeros(U.deepcache_shape(TINY_UNET, 4, 4, 4), jnp.float32)
    delta0 = jnp.zeros_like(x)

    den = _make_dual_cache_cfg_denoiser(
        ms, TINY_UNET, L.FP32, params, cond, uncond, cfg_scale,
        dc_interval=2, ui_interval=3,
    )

    # i=0 (both cadences fire): exact CFG with a fresh deep cache
    def apply(p, xi, t, ctx):
        return U.apply_unet(p, xi, t, ctx, cfg=TINY_UNET, policy=L.FP32)

    exact = make_cfg_denoiser(apply, params, cond, uncond, cfg_scale, ms)
    d0, (cache1, delta1) = den(x, sigma, jnp.int32(0), (cache0, delta0))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(exact(x, sigma)), atol=1e-5, rtol=1e-5
    )
    assert np.abs(np.asarray(delta1)).max() > 0
    assert np.abs(np.asarray(cache1)).max() > 0

    # i=1 (neither cadence): shallow cond-only + stored delta; state frozen
    x2 = x * 0.9
    d1, (cache2, delta2) = den(x2, sigma, jnp.int32(1), (cache1, delta1))
    np.testing.assert_array_equal(np.asarray(cache2), np.asarray(cache1))
    np.testing.assert_array_equal(np.asarray(delta2), np.asarray(delta1))
    sig_b = jnp.full((2,), sigma)
    eps, _ = U.apply_unet_cached(
        params, ms.calculate_input(sig_b, x2), ms.timestep(sig_b),
        jnp.broadcast_to(cond, (2,) + cond.shape[1:]), cache1[:2],
        jnp.asarray(False), cfg=TINY_UNET, policy=L.FP32,
    )
    d_cond = ms.calculate_denoised(sig_b, eps, x2)
    np.testing.assert_allclose(
        np.asarray(d1),
        np.asarray(d_cond + (cfg_scale - 1.0) * delta1),
        atol=1e-5, rtol=1e-5,
    )

    # i=2 (dc fires, ui doesn't): promoted to a full step — delta AND cache
    # both refresh
    x3 = x * 0.8
    d2, (cache3, delta3) = den(x3, sigma, jnp.int32(2), (cache2, delta2))
    assert np.abs(np.asarray(delta3) - np.asarray(delta2)).max() > 0
    assert np.abs(np.asarray(cache3) - np.asarray(cache2)).max() > 0
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(exact(x3, sigma)), atol=1e-5, rtol=1e-5
    )

    # i=3 with dc=4 (ui fires, dc doesn't): full CFG through the cached deep
    # blocks — delta refreshes (new input ⇒ new delta), cache passes through
    # unchanged
    den43 = _make_dual_cache_cfg_denoiser(
        ms, TINY_UNET, L.FP32, params, cond, uncond, cfg_scale,
        dc_interval=4, ui_interval=3,
    )
    x4 = x * 0.7  # distinct from x3: a refreshed delta must differ
    d3, (cache4, delta4) = den43(x4, sigma, jnp.int32(3), (cache3, delta3))
    np.testing.assert_array_equal(np.asarray(cache4), np.asarray(cache3))
    assert np.abs(np.asarray(delta4) - np.asarray(delta3)).max() > 0


def test_dual_ui1_equals_pure_deepcache(pipe):  # noqa: F811
    """ui_interval=1 makes every step full: the dual denoiser must follow
    the pure-DeepCache trajectory (same cached-apply, same refresh gate)."""
    from lightdiffusion_tpu.pipelines.sd import (
        _make_deepcache_cfg_denoiser,
        _make_dual_cache_cfg_denoiser,
    )

    ms = pipe.sd.model_sampling
    params = pipe.sd.unet_params
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 4), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(5), (1, 77, 64))
    uncond = jax.random.normal(jax.random.PRNGKey(6), (1, 77, 64))
    sigma = jnp.float32(3.0)
    cache0 = jnp.zeros(U.deepcache_shape(TINY_UNET, 4, 4, 2), jnp.float32)

    dc_den = _make_deepcache_cfg_denoiser(
        ms, TINY_UNET, L.FP32, params, cond, uncond, 7.0, interval=2,
    )
    dual_den = _make_dual_cache_cfg_denoiser(
        ms, TINY_UNET, L.FP32, params, cond, uncond, 7.0,
        dc_interval=2, ui_interval=1,
    )
    cache_a, cache_b = cache0, (cache0, jnp.zeros_like(x))
    # identical fresh inputs per step (feeding outputs forward amplifies the
    # benign d_uncond+s·Δ vs d_cond+(s−1)·Δ fp-association noise ~30× per
    # step through the UNet); the CACHE states must track exactly
    for i in range(3):
        xi = jax.random.normal(jax.random.PRNGKey(10 + i), x.shape)
        da, cache_a = dc_den(xi, sigma, jnp.int32(i), cache_a)
        db, cache_b = dual_den(xi, sigma, jnp.int32(i), cache_b)
        np.testing.assert_allclose(
            np.asarray(da), np.asarray(db), atol=2e-5, rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(cache_a), np.asarray(cache_b[0]), atol=1e-5, rtol=1e-5
        )


def test_dual_pipeline_runs_and_chunked_matches(pipe):  # noqa: F811
    """sample_latent accepts both intervals; chunk boundaries respect the
    composed state (a skip step opens chunk 2 at steps=7/chunk=3/dc=2/ui=3);
    the composed trajectory differs from both single-lever runs."""
    latent = pipe.empty_latent(32, 32)
    pos, neg = pipe.encode_text("cat"), pipe.encode_text("")
    kw = dict(seed=9, steps=7, sampler_name="euler_ancestral")
    dual = pipe.sample_latent(
        latent, pos, neg, deepcache_interval=2, uncond_interval=3, **kw
    )
    assert np.isfinite(np.asarray(dual)).all()
    chunked = pipe.sample_latent_chunked(
        latent, pos, neg, deepcache_interval=2, uncond_interval=3,
        chunk_size=3, **kw
    )
    np.testing.assert_allclose(
        np.asarray(dual), np.asarray(chunked), atol=1e-5, rtol=1e-5
    )
    dc_only = pipe.sample_latent(latent, pos, neg, deepcache_interval=2, **kw)
    ui_only = pipe.sample_latent(latent, pos, neg, uncond_interval=3, **kw)
    assert np.abs(np.asarray(dual) - np.asarray(dc_only)).max() > 1e-6
    assert np.abs(np.asarray(dual) - np.asarray(ui_only)).max() > 1e-6


def test_dual_through_txt2img_hires(pipe):  # noqa: F811
    """txt2img forwards both intervals to the base AND hires passes (the
    --preset max path: DC + ui + hires compose end-to-end)."""
    from lightdiffusion_tpu.pipelines.sd import txt2img

    img = txt2img(
        pipe, "a cat", "blurry", width=32, height=32, steps=5, seed=11,
        sampler_name="euler_ancestral", hires_fix=True, hires_steps=3,
        deepcache_interval=2, uncond_interval=2,
    )
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(img).all()


def test_masked_dual_chunked_matches_and_preserves_outside(pipe):  # noqa: F811
    """Cached accelerators now reach MASKED sampling (the detailer's per-seg
    path). Contracts: chunked == monolithic with the state threading through
    chunks; and the outside-mask region is bit-for-bit accelerator-
    independent (the masked denoiser restores latent_orig there every step,
    so only the in-mask trajectory can differ; 1e-4 tolerance = fp32
    fusion-order noise between distinct XLA programs)."""
    latent = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 4, 4),
                               jnp.float32)
    mask = np.zeros((1, 4, 4, 1), np.float32)
    mask[:, :2] = 1.0  # regenerate the top half only
    mask = jnp.asarray(mask)
    pos, neg = pipe.encode_text("cat"), pipe.encode_text("")
    kw = dict(seed=4, steps=6, sampler_name="euler_ancestral", denoise=0.7)

    dual = pipe.sample_latent(
        latent, pos, neg, noise_mask=mask, deepcache_interval=2,
        uncond_interval=3, **kw
    )
    assert np.isfinite(np.asarray(dual)).all()
    chunked = pipe.sample_latent_chunked(
        latent, pos, neg, noise_mask=mask, deepcache_interval=2,
        uncond_interval=3, chunk_size=3, **kw
    )
    np.testing.assert_allclose(
        np.asarray(dual), np.asarray(chunked), atol=1e-4, rtol=1e-4
    )

    plain = pipe.sample_latent(latent, pos, neg, noise_mask=mask, **kw)
    d, p = np.asarray(dual), np.asarray(plain)
    # in-mask trajectory differs (the accelerator is actually on)...
    assert np.abs(d[:, :2] - p[:, :2]).max() > 1e-6
    # ...outside-mask result identical to the unaccelerated masked run
    np.testing.assert_allclose(d[:, 2:], p[:, 2:], atol=1e-4, rtol=1e-4)

    # single-lever masked runs too (DeepCache alone / ui alone)
    for akw in ({"deepcache_interval": 2}, {"uncond_interval": 2}):
        out = pipe.sample_latent(latent, pos, neg, noise_mask=mask,
                                 **akw, **kw)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out)[:, 2:], p[:, 2:], atol=1e-4, rtol=1e-4
        )


def test_masked_differential_diffusion_stateful(pipe):  # noqa: F811
    """DifferentialDiffusion's per-step mask threshold composes with the
    stateful path (soft mask, the detailer's feathered-seg flow)."""
    latent = jax.random.normal(jax.random.PRNGKey(9), (1, 4, 4, 4),
                               jnp.float32)
    soft = np.linspace(0.0, 1.0, 16, dtype=np.float32).reshape(1, 4, 4, 1)
    out = pipe.sample_latent(
        latent, pipe.encode_text("cat"), pipe.encode_text(""),
        noise_mask=jnp.asarray(soft), differential_diffusion=True,
        deepcache_interval=2, uncond_interval=2, seed=2, steps=4,
        sampler_name="euler_ancestral", denoise=0.6,
    )
    assert np.isfinite(np.asarray(out)).all()
