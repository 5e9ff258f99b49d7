"""SSIM metric sanity."""

import numpy as np
import jax.numpy as jnp

from lightdiffusion_tpu.utils.ssim import ssim


def test_identical_images():
    a = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    s = np.asarray(ssim(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_noise_reduces_ssim_monotonically():
    rng = np.random.RandomState(0)
    a = rng.rand(1, 48, 48, 3).astype(np.float32)
    prev = 1.0
    for amp in [0.02, 0.1, 0.4]:
        b = np.clip(a + rng.randn(*a.shape).astype(np.float32) * amp, 0, 1)
        s = float(ssim(jnp.asarray(a), jnp.asarray(b))[0])
        assert s < prev
        prev = s
    assert prev < 0.6


def test_constant_shift_high_ssim():
    a = np.full((1, 32, 32, 1), 0.5, np.float32)
    b = a + 0.01
    assert float(ssim(jnp.asarray(a), jnp.asarray(b))[0]) > 0.9
