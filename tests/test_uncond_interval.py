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
  - mutual exclusion with deepcache_interval
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


def test_mutual_exclusion_and_per_sample_cfg(pipe):  # noqa: F811
    latent = pipe.empty_latent(32, 32)
    pos, neg = pipe.encode_text("cat"), pipe.encode_text("")
    with pytest.raises(ValueError, match="mutually exclusive"):
        pipe.sample_latent(
            latent, pos, neg, steps=4, deepcache_interval=2,
            uncond_interval=2,
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        pipe.sample_latent_chunked(
            latent, pos, neg, steps=4, deepcache_interval=2,
            uncond_interval=2,
        )
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
