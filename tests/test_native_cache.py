"""Native (orbax) checkpoint cache roundtrip."""

import jax
import numpy as np

from lightdiffusion_tpu.loader.native_cache import save_native, load_native


def test_native_roundtrip(tmp_path):
    from tests.test_pipeline import TINY_UNET, TINY_VAE, TINY_CLIP
    from lightdiffusion_tpu.loader.checkpoint import StableDiffusion
    from lightdiffusion_tpu.models import unet as U, vae as V, clip as C
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    sd = StableDiffusion(
        unet_params=U.init_unet_params(k[0], TINY_UNET), unet_config=TINY_UNET,
        clip_params=C.init_clip_params(k[1], TINY_CLIP), clip_config=TINY_CLIP,
        vae_params=V.init_vae_params(k[2], TINY_VAE), vae_config=TINY_VAE,
        model_sampling=make_discrete_sampling("eps"),
    )
    save_native(sd, tmp_path / "cache")
    loaded = load_native(tmp_path / "cache")
    assert loaded is not None
    assert loaded.unet_config == TINY_UNET
    assert loaded.vae_config == TINY_VAE
    for a, b in zip(
        jax.tree_util.tree_leaves(sd.unet_params),
        jax.tree_util.tree_leaves(loaded.unet_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_missing_returns_none(tmp_path):
    assert load_native(tmp_path / "nope") is None
