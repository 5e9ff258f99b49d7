"""W8A8 int8 quantization (ops/quant.py) — numerics + pipeline integration.

The reference has no quantization (precision floor fp16,
/root/reference/LightDiffusion.py:6418-6423); this is the TPU int8-MXU
accelerator, opt-in via SDPipeline.quantize_unet().
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.ops import quant as Q


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def test_linear_q8_close_to_fp32():
    key = jax.random.PRNGKey(0)
    p = L.init_linear(key, 128, 64, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 37, 128), jnp.float32)
    ref = L.linear(p, x, L.FP32)
    q = Q.quantize_linear_params(p)
    out = Q.linear_q8(q, x, compute_dtype=jnp.float32)
    # two absmax-int8 roundings ⇒ ~1e-2 relative error on gaussian data
    assert _rel_err(out, ref) < 3e-2


def test_conv_q8_close_to_fp32():
    key = jax.random.PRNGKey(0)
    p = L.init_conv2d(key, 3, 3, 64, 48, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 64), jnp.float32)
    ref = L.conv2d(p, x, policy=L.FP32)
    q = Q.quantize_conv_params(p)
    out = Q.conv2d_q8(q, x, compute_dtype=jnp.float32)
    assert _rel_err(out, ref) < 3e-2


def test_layers_dispatch_on_quantized_dict():
    """L.linear / L.conv2d route to the q8 path when weight_q8 is present."""
    key = jax.random.PRNGKey(0)
    pl = L.init_linear(key, 32, 16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32), jnp.float32)
    ql = Q.quantize_linear_params(pl)
    np.testing.assert_allclose(
        np.asarray(L.linear(ql, x, L.FP32)),
        np.asarray(Q.linear_q8(ql, x, compute_dtype=jnp.float32)),
    )
    pc = L.init_conv2d(key, 3, 3, 32, 32, dtype=jnp.float32)
    xc = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 32), jnp.float32)
    qc = Q.quantize_conv_params(pc)
    np.testing.assert_allclose(
        np.asarray(L.conv2d(qc, xc, policy=L.FP32)),
        np.asarray(Q.conv2d_q8(qc, xc, compute_dtype=jnp.float32)),
    )


def test_quantize_unet_params_skips_boundary_layers():
    from lightdiffusion_tpu.models import unet as U

    cfg = U.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 1), context_dim=64, num_heads=2,
        attn_force="xla",
    )
    params = U.init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    q = Q.quantize_unet_params(params)
    # boundary layers stay fp
    assert "weight" in q["input_blocks"][0]["conv"]  # conv_in
    assert "weight" in q["out_conv"]
    assert "weight" in q["time_fc1"] and "weight" in q["time_fc2"]
    assert "weight" in q["input_blocks"][1]["res"]["emb"]  # time-emb proj
    # transformer projections quantize
    blk = q["input_blocks"][1]["attn"]["blocks"][0]
    assert blk["attn1"]["to_q"]["weight_q8"].dtype == jnp.int8
    assert blk["ff_in"]["weight_q8"].dtype == jnp.int8
    # norms untouched
    assert "weight" in blk["ln1"] and blk["ln1"]["weight"].ndim == 1
    # resblock 3x3 convs quantize — including the second conv, which shares
    # the name "out_conv" with the (skipped) top-level final projection
    assert q["input_blocks"][1]["res"]["in_conv"]["weight_q8"].dtype == jnp.int8
    assert q["input_blocks"][1]["res"]["out_conv"]["weight_q8"].dtype == jnp.int8
    n, _ = Q.count_quantized(q)
    assert n > 10


def test_quantized_unet_output_close():
    """Full tiny-UNet forward: int8 tracks fp32 within a few percent."""
    from lightdiffusion_tpu.models import unet as U

    cfg = U.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 1), context_dim=64, num_heads=2,
        attn_force="xla",
    )
    params = U.init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4), jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 64), jnp.float32)
    ref = U.apply_unet(params, x, t, ctx, cfg=cfg, policy=L.FP32)
    q = Q.quantize_unet_params(params)
    out = U.apply_unet(q, x, t, ctx, cfg=cfg, policy=L.FP32)
    err = _rel_err(out, ref)
    assert err < 0.15, err
    cos = float(
        jnp.vdot(out.ravel(), ref.ravel())
        / (jnp.linalg.norm(out) * jnp.linalg.norm(ref))
    )
    assert cos > 0.98, cos


def _tiny_pipe():
    from lightdiffusion_tpu.diffusion.parameterization import (
        make_discrete_sampling,
    )
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import clip as C
    from lightdiffusion_tpu.models import unet as U
    from lightdiffusion_tpu.models import vae as V
    from lightdiffusion_tpu.pipelines.sd import SDPipeline

    cfg = U.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 0), context_dim=64, num_heads=2,
        attn_force="xla",
    )
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], cfg),
        unet_config=cfg,
        clip_params=C.init_clip_params(
            k[1],
            C.ClipConfig(hidden_size=64, num_layers=2, num_heads=2,
                         intermediate_size=128),
        ),
        clip_config=C.ClipConfig(hidden_size=64, num_layers=2, num_heads=2,
                                 intermediate_size=128),
        vae_params=V.init_vae_params(
            k[2], V.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
        ),
        vae_config=V.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        model_sampling=make_discrete_sampling("eps"),
    )
    return SDPipeline(sd, policy=L.FP32, clip_skip=-2)


def test_pipeline_quantize_unet_smoke():
    """End-to-end: quantize_unet() re-specializes programs and samples."""
    pipe = _tiny_pipe()
    pos = pipe.encode_text("a photo of a cat")
    neg = pipe.encode_text("")
    latent = pipe.empty_latent(64, 64, 1)
    ref = pipe.sample_latent(latent, pos, neg, seed=3, steps=4, cfg=7.0)
    pipe.quantize_unet()
    out = pipe.sample_latent(latent, pos, neg, seed=3, steps=4, cfg=7.0)
    assert out.shape == ref.shape
    assert np.isfinite(np.asarray(out)).all()
    # same seed/schedule: quantization error stays bounded through 4 steps
    assert _rel_err(out, ref) < 0.5


def test_tp_specs_cover_quantized_leaves():
    from jax.sharding import PartitionSpec as P

    from lightdiffusion_tpu.parallel import mesh as M

    tree = {
        "attn1": {
            "to_q": {"weight_q8": jnp.zeros((8, 8), jnp.int8),
                     "w_scale": jnp.ones((8,), jnp.float32)},
            "to_out": {"weight_q8": jnp.zeros((8, 8), jnp.int8),
                       "w_scale": jnp.ones((8,), jnp.float32),
                       "bias": jnp.zeros((8,), jnp.float32)},
        }
    }
    specs = M.param_specs(tree)
    assert specs["attn1"]["to_q"]["weight_q8"] == P(None, "tp")
    assert specs["attn1"]["to_q"]["w_scale"] == P("tp")
    assert specs["attn1"]["to_out"]["weight_q8"] == P("tp", None)
    assert specs["attn1"]["to_out"]["w_scale"] == P()
