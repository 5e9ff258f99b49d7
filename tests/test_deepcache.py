"""DeepCache-style deep-block caching: refresh==True must equal the plain
forward exactly; stale cache reuses deep features."""

import numpy as np
import jax
import jax.numpy as jnp

from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L
from tests.test_pipeline import TINY_UNET


def test_refresh_equals_plain_forward():
    params = U.init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.asarray([500.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 64))
    ref = U.apply_unet(params, x, t, ctx, cfg=TINY_UNET, policy=L.FP32)
    cache0 = jnp.zeros(U.deepcache_shape(TINY_UNET, 16, 16, 2), jnp.float32)
    out, cache = U.apply_unet_cached(
        params, x, t, ctx, cache0, jnp.asarray(True), cfg=TINY_UNET,
        policy=L.FP32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert cache.shape == cache0.shape
    assert np.abs(np.asarray(cache)).max() > 0


def test_stale_cache_reuses_deep():
    params = U.init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    x2 = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    cache0 = jnp.zeros(U.deepcache_shape(TINY_UNET, 16, 16, 1), jnp.float32)
    out1, cache = U.apply_unet_cached(
        params, x1, t, ctx, cache0, jnp.asarray(True), cfg=TINY_UNET, policy=L.FP32
    )
    # stale: cache unchanged even though input changed
    out2, cache2 = U.apply_unet_cached(
        params, x2, t, ctx, cache, jnp.asarray(False), cfg=TINY_UNET, policy=L.FP32
    )
    np.testing.assert_array_equal(np.asarray(cache), np.asarray(cache2))
    # differs from a full fresh forward on x2 (deep part is stale)...
    ref2 = U.apply_unet(params, x2, t, ctx, cfg=TINY_UNET, policy=L.FP32)
    assert np.abs(np.asarray(out2) - np.asarray(ref2)).max() > 1e-4
    # ...but shallow path still reacts to the new input
    assert np.abs(np.asarray(out2) - np.asarray(out1)).max() > 1e-4


def test_pipeline_deepcache_interval1_equals_plain():
    from tests.test_pipeline import TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import vae as V, clip as C
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.pipelines.sd import SDPipeline

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    pipe = SDPipeline(sd, policy=L.FP32)
    latent = pipe.empty_latent(32, 32)
    pos, neg = pipe.encode_text("cat"), pipe.encode_text("")
    plain = pipe.sample_latent(
        latent, pos, neg, seed=1, steps=4, sampler_name="euler_ancestral",
    )
    # interval 2 (refresh every other step): valid and finite, differs
    dc2 = pipe.sample_latent(
        latent, pos, neg, seed=1, steps=4, sampler_name="euler_ancestral",
        deepcache_interval=2,
    )
    assert np.isfinite(np.asarray(dc2)).all()
    assert np.abs(np.asarray(dc2) - np.asarray(plain)).max() > 1e-5
    # chunked-protocol sanity: deepcache with sde sampler runs too
    dc_sde = pipe.sample_latent(
        latent, pos, neg, seed=1, steps=4, sampler_name="dpmpp_2m_sde",
        deepcache_interval=2,
    )
    assert np.isfinite(np.asarray(dc_sde)).all()
