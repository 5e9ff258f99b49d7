"""ToDo token downsampling (arXiv 2402.13573): self-attention K/V spatially
avg-pooled, queries full-resolution.

Opt-in accelerator absent in the reference (whose attention cost is paid in
full by xformers, /root/reference/LightDiffusion.py:3942-3992). There is no
matching/unmerge machinery, so the only moving part to test is the pooled-KV
attention path itself.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L


def _tiny_cfg(**kw):
    return U.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 0), context_dim=64, num_heads=2,
        attn_force="xla", **kw,
    )


def test_uniform_tokens_exact():
    """With spatially constant tokens, pooled K/V equal the full K/V rows,
    so ToDo attention must reproduce full attention EXACTLY (fp32)."""
    cfg = _tiny_cfg()
    p = U.init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    blk = p["input_blocks"][1]["attn"]["blocks"][0]
    # one token feature replicated over a 8x8 grid
    tok = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 32), jnp.float32)
    x = jnp.tile(tok, (1, 64, 1))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 64), jnp.float32)
    base = U.transformer_block_apply(blk, x, ctx, 2, L.FP32, force="xla")
    todo = U.transformer_block_apply(blk, x, ctx, 2, L.FP32, force="xla",
                                     spatial_hw=(8, 8), todo_factor=2)
    np.testing.assert_allclose(np.asarray(todo), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_unet_with_todo_runs_and_tracks_baseline():
    cfg = _tiny_cfg()
    params = U.init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64), jnp.float32)
    base = U.apply_unet(params, x, t, ctx, cfg=cfg, policy=L.FP32)
    cfg_todo = dataclasses.replace(cfg, todo_factor=2, todo_min_tokens=256)
    out = U.apply_unet(params, x, t, ctx, cfg=cfg_todo, policy=L.FP32)
    assert out.shape == base.shape
    assert np.isfinite(np.asarray(out)).all()
    a, b = np.asarray(out).ravel(), np.asarray(base).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.9, cos
    assert np.abs(a - b).max() > 1e-8  # it actually did something


def test_todo_skips_non_divisible_and_small_levels():
    """Levels below todo_min_tokens (or with non-divisible extents) run the
    exact full-attention path — outputs match the baseline bit-for-bit."""
    cfg = _tiny_cfg()
    params = U.init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64), jnp.float32)
    base = U.apply_unet(params, x, t, ctx, cfg=cfg, policy=L.FP32)
    # min_tokens above every level's token count -> identical
    cfg_off = dataclasses.replace(cfg, todo_factor=2, todo_min_tokens=10_000)
    out = U.apply_unet(params, x, t, ctx, cfg=cfg_off, policy=L.FP32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_set_tome_raises_superseded():
    """ToMe was removed round 4 (superseded by ToDo — MIGRATION.md): the old
    entry point stays as a clear error, not a silent no-op."""
    import pytest
    from tests.test_quant import _tiny_pipe

    with pytest.raises(RuntimeError, match="ToDo"):
        _tiny_pipe().set_tome(0.5)


def test_pipeline_set_todo():
    from tests.test_quant import _tiny_pipe

    pipe = _tiny_pipe()
    pipe.set_todo(2, min_tokens=64)
    assert pipe.sd.unet_config.todo_factor == 2
    pos = pipe.encode_text("a cat")
    neg = pipe.encode_text("")
    out = pipe.sample_latent(
        pipe.empty_latent(64, 64, 1), pos, neg, seed=3, steps=2, cfg=7.0
    )
    assert out.shape == (1, 32, 32, 4)
    assert np.isfinite(np.asarray(out)).all()
    pipe.set_todo(0)
    assert pipe.sd.unet_config.todo_factor == 0
