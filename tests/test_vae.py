"""VAE parity vs an independent torch AutoencoderKL (LDM layout)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import vae as V
from lightdiffusion_tpu.ops import layers as L


TINY = V.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)


@pytest.fixture(scope="module")
def torch_pair():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniAutoencoderKL

    torch.manual_seed(0)
    model = MiniAutoencoderKL(ch=32, ch_mult=(1, 2), num_res=1, z=4).eval()
    sd = {"first_stage_model." + k: v.numpy() for k, v in model.state_dict().items()}
    from lightdiffusion_tpu.loader.vae_weights import convert_vae

    params = convert_vae(sd, TINY, dtype=jnp.float32)
    return model, params


def test_encoder_parity(torch_pair):
    import torch

    model, params = torch_pair
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = model.encode_moments(torch.from_numpy(x)).numpy()
    out = V.encoder_apply(
        params["encoder"], jnp.asarray(x.transpose(0, 2, 3, 1)), TINY, L.FP32
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=2e-4
    )


def test_decoder_parity(torch_pair):
    import torch

    model, params = torch_pair
    rng = np.random.RandomState(1)
    z = rng.randn(1, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = model.decode(torch.from_numpy(z)).numpy()
    out = V.decoder_apply(
        params["decoder"], jnp.asarray(z.transpose(0, 2, 3, 1)), TINY, L.FP32
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=2e-4
    )


def test_encoder_odd_input(torch_pair):
    """Asymmetric (0,1) downsample padding shows up on odd sizes."""
    import torch

    model, params = torch_pair
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 34, 30).astype(np.float32)
    with torch.no_grad():
        ref = model.encode_moments(torch.from_numpy(x)).numpy()
    out = V.encoder_apply(
        params["encoder"], jnp.asarray(x.transpose(0, 2, 3, 1)), TINY, L.FP32
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=2e-4
    )


def test_vae_roundtrip_api():
    params = V.init_vae_params(jax.random.PRNGKey(0), TINY)
    vae = V.VAE(params, TINY, policy=L.FP32)
    px = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    z = vae.encode(px, key=jax.random.PRNGKey(1))
    assert z.shape == (1, 16, 16, 4)
    out = vae.decode(z)
    assert out.shape == (1, 32, 32, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_diagonal_gaussian_stats():
    moments = jnp.concatenate(
        [jnp.full((1, 2, 2, 4), 3.0), jnp.full((1, 2, 2, 4), -40.0)], axis=-1
    )
    s = V.sample_diagonal_gaussian(moments, jax.random.PRNGKey(0))
    # logvar clamped at -30 → tiny std → sample ≈ mean
    np.testing.assert_allclose(np.asarray(s), 3.0, atol=1e-3)


def test_decode_tiled_matches_full():
    params = V.init_vae_params(jax.random.PRNGKey(0), TINY)
    vae = V.VAE(params, TINY, policy=L.FP32)
    z = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 4) * 0.2, jnp.float32)
    full = np.asarray(vae.decode(z))
    tiled = np.asarray(vae.decode_tiled(z, tile=8, overlap=2))
    assert tiled.shape == full.shape
    # tiled decode is approximate by nature: the mid-block attention is
    # GLOBAL, so each tile sees less context (true of all tiled-VAE impls)
    assert np.median(np.abs(tiled - full)) < 0.1
    assert np.isfinite(tiled).all()


def test_encode_tiled_shape():
    params = V.init_vae_params(jax.random.PRNGKey(0), TINY)
    vae = V.VAE(params, TINY, policy=L.FP32)
    px = jnp.asarray(np.random.RandomState(1).rand(1, 64, 48, 3), jnp.float32)
    z = vae.encode_tiled(px, tile=32, overlap=8)
    assert z.shape == (1, 32, 24, 4)
    assert np.isfinite(np.asarray(z)).all()
