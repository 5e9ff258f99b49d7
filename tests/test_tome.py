"""ToMe token merging (ops/tome.py, arXiv 2303.17604).

Opt-in accelerator absent in the reference (whose attention cost is paid in
full by xformers, /root/reference/LightDiffusion.py:3942-3992).
"""

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_tpu.ops import tome


def test_grid_split_covers_all_tokens():
    dst, src = tome._grid_indices(8, 8)
    assert len(dst) == 16 and len(src) == 48
    assert sorted(dst + src) == list(range(64))


def test_merge_shapes_and_unmerge_coverage():
    h = w = 8
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h * w, 16), jnp.float32)
    merged, unmerge = tome.merge_and_unmerge(x, h, w, ratio=0.5)
    ns = 48
    r = ns // 2
    assert merged.shape == (2, h * w - r, 16)
    out = unmerge(merged)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # every output row is populated (no zero rows left from the scatter)
    assert (np.abs(np.asarray(out)).sum(axis=-1) > 0).all()


def test_ratio_zero_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 8), jnp.float32)
    merged, unmerge = tome.merge_and_unmerge(x, 8, 8, ratio=0.0)
    np.testing.assert_array_equal(np.asarray(merged), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(unmerge(merged)), np.asarray(x))


def test_duplicate_tokens_merge_losslessly():
    """If every src token exactly equals some dst token, merging + unmerging
    the IDENTITY map of those features reconstructs them exactly (the merged
    mean of identical rows is the row itself)."""
    h = w = 8
    dst_t, src_t = tome._grid_indices(h, w)
    feat = jax.random.normal(jax.random.PRNGKey(1), (len(dst_t), 16))
    x = jnp.zeros((1, h * w, 16))
    x = x.at[0, jnp.asarray(dst_t)].set(feat)
    # each src copies the feature of dst (i mod n_dst) — its best match
    src_feat = feat[jnp.arange(len(src_t)) % len(dst_t)]
    x = x.at[0, jnp.asarray(src_t)].set(src_feat)
    merged, unmerge = tome.merge_and_unmerge(x, h, w, ratio=0.5)
    out = unmerge(merged)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_unet_with_tome_runs_and_tracks_baseline():
    from lightdiffusion_tpu.models import unet as U
    from lightdiffusion_tpu.ops import layers as L

    import dataclasses

    cfg = U.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 0), context_dim=64, num_heads=2,
        attn_force="xla",
    )
    params = U.init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64), jnp.float32)
    base = U.apply_unet(params, x, t, ctx, cfg=cfg, policy=L.FP32)
    cfg_tome = dataclasses.replace(cfg, tome_ratio=0.5, tome_min_tokens=256)
    out = U.apply_unet(params, x, t, ctx, cfg=cfg_tome, policy=L.FP32)
    assert out.shape == base.shape
    assert np.isfinite(np.asarray(out)).all()
    # merging only approximates self-attention: output differs but correlates
    a, b = np.asarray(out).ravel(), np.asarray(base).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.9, cos
    assert np.abs(a - b).max() > 1e-8  # it actually did something


def test_pipeline_set_tome():
    from tests.test_quant import _tiny_pipe

    pipe = _tiny_pipe()
    pipe.set_tome(0.5, min_tokens=64)
    assert pipe.sd.unet_config.tome_ratio == 0.5
    pos = pipe.encode_text("a cat")
    neg = pipe.encode_text("")
    out = pipe.sample_latent(
        pipe.empty_latent(64, 64, 1), pos, neg, seed=3, steps=2, cfg=7.0
    )
    assert out.shape == (1, 32, 32, 4)
    assert np.isfinite(np.asarray(out)).all()
