"""FreeU decoder reweighting (models/unet.py freeu config field).

Free quality lever (arXiv 2309.11497) absent in the reference.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L

CFG = U.UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 0), context_dim=64, num_heads=2, attn_force="xla",
)


def _fwd(cfg, params):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64), jnp.float32)
    return np.asarray(U.apply_unet(params, x, t, ctx, cfg=cfg, policy=L.FP32))


def test_fourier_lowfreq_scale_identity_and_effect():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4), jnp.float32)
    ident = U._fourier_lowfreq_scale(x, 1, 1.0)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(x), atol=1e-5)
    damped = np.asarray(U._fourier_lowfreq_scale(x, 1, 0.0))
    # removing low frequencies shifts means toward zero
    assert abs(damped.mean()) < abs(np.asarray(x).mean()) + 1e-6
    assert np.abs(damped - np.asarray(x)).max() > 1e-6


def test_freeu_changes_output_and_unit_params_are_identity():
    params = U.init_unet_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    base = _fwd(CFG, params)
    on = _fwd(dataclasses.replace(CFG, freeu=(1.5, 1.6, 0.9, 0.2)), params)
    assert on.shape == base.shape and np.isfinite(on).all()
    assert np.abs(on - base).max() > 1e-6
    unit = _fwd(dataclasses.replace(CFG, freeu=(1.0, 1.0, 1.0, 1.0)), params)
    np.testing.assert_allclose(unit, base, atol=1e-4, rtol=1e-4)


def test_freeu_active_in_deepcache_path():
    """apply_unet_cached applies FreeU too (regression: --freeu --deepcache
    silently ignored FreeU)."""
    from tests.test_quant import _tiny_pipe

    pipe = _tiny_pipe()
    pos = pipe.encode_text("a cat")
    neg = pipe.encode_text("")
    latent = pipe.empty_latent(64, 64, 1)
    kw = dict(seed=3, steps=4, cfg=7.0, sampler_name="euler_ancestral",
              deepcache_interval=2)
    base = np.asarray(pipe.sample_latent(latent, pos, neg, **kw))
    pipe.set_freeu()
    on = np.asarray(pipe.sample_latent(latent, pos, neg, **kw))
    assert np.isfinite(on).all()
    assert np.abs(on - base).max() > 1e-6


def test_pipeline_set_freeu():
    from tests.test_quant import _tiny_pipe

    pipe = _tiny_pipe()
    pos = pipe.encode_text("a cat")
    neg = pipe.encode_text("")
    latent = pipe.empty_latent(64, 64, 1)
    kw = dict(seed=3, steps=2, cfg=7.0, sampler_name="euler_ancestral")
    base = np.asarray(pipe.sample_latent(latent, pos, neg, **kw))
    pipe.set_freeu()
    on = np.asarray(pipe.sample_latent(latent, pos, neg, **kw))
    assert np.isfinite(on).all()
    assert np.abs(on - base).max() > 1e-6
    pipe.set_freeu(None)
    off = np.asarray(pipe.sample_latent(latent, pos, neg, **kw))
    np.testing.assert_array_equal(off, base)
