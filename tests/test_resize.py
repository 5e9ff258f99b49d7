"""Resize ops: bislerp math, method dispatch, crop."""

import numpy as np
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.ops import resize as R


def test_bislerp_identity_at_same_size():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
    out = R.bislerp(x, 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_bislerp_preserves_norm_structure():
    """Midpoint between two vectors of equal norm keeps that norm (slerp
    property — unlike lerp which shrinks it)."""
    a = np.zeros((1, 1, 2, 4), np.float32)
    a[0, 0, 0] = [1, 0, 0, 0]
    a[0, 0, 1] = [0, 1, 0, 0]
    out = np.asarray(R.bislerp(jnp.asarray(a), 3, 1))
    mid = out[0, 0, 1]
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, rtol=1e-5)
    # lerp would give norm sqrt(0.5)
    assert abs(np.linalg.norm(mid) - np.sqrt(0.5)) > 0.2


def test_bislerp_doubling_matches_reference_coords():
    """x2 upscale: even output pixels sit 0.25 inside source cells (align_corners=False)."""
    x = jnp.asarray(np.arange(1, 5, dtype=np.float32).reshape(1, 1, 4, 1))
    out = np.asarray(R.bislerp(x, 8, 1))[0, 0, :, 0]
    # parallel (same-sign 1-d) vectors → dot≈1 → lerp == bilinear values
    expected = np.asarray([1, 1.25, 1.75, 2.25, 2.75, 3.25, 3.75, 4.0])
    np.testing.assert_allclose(out, expected, atol=1e-5)


@pytest.mark.parametrize("method", R.UPSCALE_METHODS)
def test_all_methods_run(method):
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 6, 3), jnp.float32)
    out = R.resize(x, 12, 16, method)
    assert out.shape == (1, 16, 12, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_common_upscale_center_crop():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 16, 3), jnp.float32)
    out = R.common_upscale(x, 8, 8, "bilinear", crop="center")
    assert out.shape == (1, 8, 8, 3)
