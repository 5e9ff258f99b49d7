"""TAESD decoder/encoder parity vs the public torch architecture."""

import numpy as np
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import taesd as T
from lightdiffusion_tpu.ops import layers as L


def test_taesd_decoder_parity():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import taesd_decoder_torch

    torch.manual_seed(0)
    dec = taesd_decoder_torch().eval()
    sd = {k: v.numpy() for k, v in dec.state_dict().items()}
    params = T.convert_taesd_decoder(sd)
    z = np.random.RandomState(0).randn(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = dec(torch.from_numpy(z)).clamp(0, 1).numpy()
    out = T.taesd_decode(params, jnp.asarray(z.transpose(0, 2, 3, 1)))
    assert out.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5, rtol=1e-4
    )


def test_taesd_encoder_parity():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import taesd_encoder_torch

    torch.manual_seed(1)
    enc = taesd_encoder_torch().eval()
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    params = T.convert_taesd_encoder(sd)
    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()
    out = T.taesd_encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5, rtol=1e-4
    )


def test_latent_rgb_preview():
    z = np.random.RandomState(0).randn(2, 8, 8, 4).astype(np.float32)
    img = T.latent_to_rgb_preview(jnp.asarray(z))
    assert img.shape == (2, 8, 8, 3)
    a = np.asarray(img)
    assert a.min() >= 0 and a.max() <= 1


def test_taesd_prefixed_keys():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import taesd_decoder_torch

    dec = taesd_decoder_torch()
    sd = {"decoder." + k: v.numpy() for k, v in dec.state_dict().items()}
    params = T.convert_taesd_decoder(sd)  # prefix stripped
    assert "conv_in" in params
