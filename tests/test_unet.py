"""UNet parity vs an independent torch LDM-layout reference, plus
config-sniffing and op-level padding-semantics checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L


TINY = U.UNetConfig(
    in_channels=4,
    out_channels=4,
    model_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=(1, 1),
    transformer_depth=(1, 0),
    context_dim=64,
    num_heads=2,
    attn_force="xla",
)


@pytest.fixture(scope="module")
def torch_pair():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniLDMUNet

    torch.manual_seed(0)
    model = MiniLDMUNet(
        model_ch=32, channel_mult=(1, 2), num_res=(1, 1), depths=(1, 0),
        context_dim=64, heads=2, groups=32,
    ).eval()
    sd = {"model.diffusion_model." + k: v.numpy() for k, v in model.state_dict().items()}
    from lightdiffusion_tpu.loader.unet_weights import convert_unet

    params = convert_unet(sd, TINY, dtype=jnp.float32)
    return model, params, sd


def test_unet_parity(torch_pair):
    import torch

    model, params, _ = torch_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([999.0, 500.0], dtype=np.float32)
    ctx = rng.randn(2, 77, 64).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)).numpy()
    out = U.apply_unet(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        cfg=TINY,
        policy=L.FP32,
    )
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_nchw, ref, atol=2e-4, rtol=2e-4)


def test_unet_parity_odd_size(torch_pair):
    """Non-power-of-two spatial dims exercise the up/downsample shape logic."""
    import torch

    model, params, _ = torch_pair
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 24, 16).astype(np.float32)
    t = np.array([10.0], dtype=np.float32)
    ctx = rng.randn(1, 77, 64).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)).numpy()
    out = U.apply_unet(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(ctx), cfg=TINY, policy=L.FP32,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=2e-4
    )


def test_detect_unet_config(torch_pair):
    from lightdiffusion_tpu.loader.unet_weights import detect_unet_config

    _, _, sd = torch_pair
    cfg = detect_unet_config(sd)
    assert cfg.model_channels == 32
    assert cfg.channel_mult == (1, 2)
    assert cfg.num_res_blocks == (1, 1)
    assert cfg.transformer_depth == (1, 0)
    assert cfg.context_dim == 64
    assert cfg.in_channels == 4 and cfg.out_channels == 4


def test_detect_sd15_shape_dummy():
    """detect_unet_config on a synthetic SD1.5-shaped key set."""
    from lightdiffusion_tpu.loader.unet_weights import detect_unet_config

    sd = {}
    P = "model.diffusion_model."

    class FakeTensor:
        def __init__(self, shape):
            self.shape = shape

    def add(name, shape):
        sd[P + name] = FakeTensor(shape)

    add("input_blocks.0.0.weight", (320, 4, 3, 3))
    add("out.2.weight", (4, 320, 3, 3))
    chans = [320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280, 1280, 1280]
    i = 1
    for level, (mult, attn) in enumerate(zip([1, 2, 4, 4], [True, True, True, False])):
        for _ in range(2):
            ch = 320 * mult
            add(f"input_blocks.{i}.0.out_layers.3.weight", (ch, ch, 3, 3))
            if attn:
                add(f"input_blocks.{i}.1.transformer_blocks.0.attn1.to_q.weight", (ch, ch))
                add(f"input_blocks.{i}.1.transformer_blocks.0.attn2.to_k.weight", (ch, 768))
            i += 1
        if level != 3:
            add(f"input_blocks.{i}.0.op.weight", (ch, ch, 3, 3))
            i += 1
    cfg = detect_unet_config(sd)
    assert cfg.model_channels == 320
    assert cfg.channel_mult == (1, 2, 4, 4)
    assert cfg.transformer_depth == (1, 1, 1, 0)
    assert cfg.context_dim == 768


def test_group_norm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 64).astype(np.float32)
    gn = torch.nn.GroupNorm(32, 64, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.arange(64, dtype=torch.float32) * 0.1)
        gn.bias.copy_(torch.ones(64) * 0.5)
        ref = gn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    p = {"weight": jnp.arange(64, dtype=jnp.float32) * 0.1, "bias": jnp.ones(64) * 0.5}
    out = L.group_norm(p, jnp.asarray(x), num_groups=32, eps=1e-5, policy=L.FP32)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5, rtol=1e-5
    )


def test_group_norm_nonzero_mean_and_token_layout():
    """Regression for the lane-friendly GroupNorm (NOTES_ROUND3): the
    E[x²]−E[x]² single-pass variance must stay torch-exact for inputs with
    non-trivial means (the cancellation-risk case), and the (B, L, C) token
    layout must normalize identically to its (B, H, W, C) reshape."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = (rng.randn(2, 8, 8, 64) * 2.0 + 3.0).astype(np.float32)
    w = rng.randn(64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    gn = torch.nn.GroupNorm(16, 64, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(w))
        gn.bias.copy_(torch.from_numpy(b))
        ref = gn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    p = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    out = L.group_norm(p, jnp.asarray(x), num_groups=16, eps=1e-6,
                       policy=L.FP32)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=2e-5
    )
    out_tok = L.group_norm(p, jnp.asarray(x.reshape(2, 64, 64)),
                           num_groups=16, eps=1e-6, policy=L.FP32)
    np.testing.assert_allclose(
        np.asarray(out_tok), np.asarray(out).reshape(2, 64, 64),
        atol=1e-6, rtol=1e-6,
    )


def test_strided_conv_matches_torch_padding():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    for hw in [(16, 16), (17, 15)]:
        x = rng.randn(1, 8, *hw).astype(np.float32)
        conv = torch.nn.Conv2d(8, 8, 3, stride=2, padding=1)
        with torch.no_grad():
            ref = conv(torch.from_numpy(x)).numpy()
        p = {
            "weight": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }
        out = L.conv2d(
            p, jnp.asarray(x.transpose(0, 2, 3, 1)), stride=2,
            padding=[(1, 1), (1, 1)], policy=L.FP32,
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5, rtol=1e-5
        )
