"""ESRGAN parity vs torch RRDBNet, tiled application, USDU smoke test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.models import esrgan as E
from lightdiffusion_tpu.postprocess.tiling import tiled_apply, tile_grid


@pytest.fixture(scope="module")
def torch_pair():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniRRDBNet

    torch.manual_seed(0)
    model = MiniRRDBNet(nf=32, gc=16, num_blocks=2, scale=4).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, cfg = E.convert_esrgan(sd)
    return model, params, cfg


def test_esrgan_config_detect(torch_pair):
    _, _, cfg = torch_pair
    assert cfg.num_blocks == 2 and cfg.num_feat == 32 and cfg.scale == 4


def test_esrgan_parity(torch_pair):
    import torch

    model, params, cfg = torch_pair
    x = np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    out = E.esrgan_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    assert out.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=2e-3
    )


def test_tile_grid_covers():
    coords = tile_grid(100, 100, 64, 16)
    covered = np.zeros((100, 100), bool)
    for (y, x) in coords:
        covered[y:y+64, x:x+64] = True
    assert covered.all()


def test_tiled_apply_identity():
    imgs = np.random.RandomState(0).rand(1, 80, 72, 3).astype(np.float32)
    out = tiled_apply(lambda t: t, imgs, scale=1, tile=32, overlap=8, tile_batch=2)
    np.testing.assert_allclose(out, imgs, atol=1e-5)


def test_tiled_esrgan_close_to_full(torch_pair):
    _, params, cfg = torch_pair
    imgs = np.random.RandomState(1).rand(1, 24, 24, 3).astype(np.float32)
    full = np.asarray(E.esrgan_apply(params, jnp.asarray(imgs), cfg))
    tiled = tiled_apply(
        lambda t: E.esrgan_apply(params, t, cfg), imgs, scale=4,
        tile=16, overlap=8, tile_batch=2,
    )
    assert tiled.shape == full.shape
    # interiors match; borders differ slightly due to conv padding on tiles
    diff = np.abs(tiled - full)
    assert np.median(diff) < 0.02


def test_old_arch_key_normalization():
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniRRDBNet

    model = MiniRRDBNet(nf=32, gc=16, num_blocks=2, scale=4)
    new_sd = {k: v.numpy() for k, v in model.state_dict().items()}
    old_sd = {}
    for k, v in new_sd.items():
        if k.startswith("conv_first."):
            old_sd[k.replace("conv_first.", "model.0.")] = v
        elif k.startswith("body."):
            parts = k.split(".")  # body.N.rdbJ.convC.w
            n, rdb, conv, wb = parts[1], parts[2], parts[3], parts[4]
            old_sd[f"model.1.sub.{n}.{rdb.upper().replace('RDB','RDB')}.{conv}.0.{wb}"] = v
        elif k.startswith("conv_body."):
            old_sd[k.replace("conv_body.", "model.1.sub.2.")] = v
        elif k.startswith("conv_up1."):
            old_sd[k.replace("conv_up1.", "model.3.")] = v
        elif k.startswith("conv_up2."):
            old_sd[k.replace("conv_up2.", "model.6.")] = v
        elif k.startswith("conv_hr."):
            old_sd[k.replace("conv_hr.", "model.8.")] = v
        elif k.startswith("conv_last."):
            old_sd[k.replace("conv_last.", "model.10.")] = v
    normalized = E.normalize_esrgan_keys(old_sd)
    assert set(normalized.keys()) == set(new_sd.keys())


def test_params_ema_unwrap(torch_pair):
    _, _, _ = torch_pair
    torch = pytest.importorskip("torch")
    from tests.torch_ldm_ref import MiniRRDBNet

    model = MiniRRDBNet(nf=32, gc=16, num_blocks=2, scale=4)
    sd = {"params_ema": {k: v.numpy() for k, v in model.state_dict().items()}}
    params, cfg = E.convert_esrgan(sd)
    assert cfg.scale == 4


def test_packed_rdb_matches_plain(torch_pair):
    """The lane-packed dense-block path (TPU default at image resolution)
    must match the plain conv path: zero-padded weight lanes contribute
    exact zeros, only fp32 accumulation order differs."""
    _, params, cfg = torch_pair
    x = np.random.RandomState(2).rand(1, 16, 16, 3).astype(np.float32)
    try:
        E.set_packed_rdb(False)
        plain = np.asarray(E.esrgan_apply(params, jnp.asarray(x), cfg))
        E.set_packed_rdb(True)
        E.esrgan_apply.clear_cache()  # same args -> force a packed retrace
        packed = np.asarray(E.esrgan_apply(params, jnp.asarray(x), cfg))
    finally:
        E.set_packed_rdb(None)
        E.esrgan_apply.clear_cache()
    np.testing.assert_allclose(packed, plain, atol=1e-4, rtol=1e-4)
