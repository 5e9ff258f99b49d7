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


def test_ssim_properties_bounded_and_exact_at_identity():
    """VERDICT r3 #7 property test: ssim(a, a) == 1.0 EXACTLY (identical
    inputs cancel bit-for-bit through the windowed stats), ssim(a, b) <= 1.0
    always (the per-window clamp absorbs fp32 variance-cancellation
    overshoot), and the metric is symmetric."""
    rng = np.random.RandomState(7)
    for trial in range(8):
        a = rng.rand(1, 40, 40, 3).astype(np.float32)
        # near-identical pairs are the historical overshoot regime
        # (bench printed "1.0001" pre-clamp)
        eps = [0.0, 1e-7, 1e-5, 1e-3, 0.05][trial % 5]
        b = np.clip(a + rng.randn(*a.shape).astype(np.float32) * eps,
                    0, 1).astype(np.float32)
        s_ab = float(ssim(jnp.asarray(a), jnp.asarray(b))[0])
        s_ba = float(ssim(jnp.asarray(b), jnp.asarray(a))[0])
        assert s_ab <= 1.0, (trial, s_ab)
        assert -1.0 <= s_ab
        np.testing.assert_allclose(s_ab, s_ba, rtol=0, atol=1e-6)
    a = rng.rand(3, 33, 47, 3).astype(np.float32)  # odd sizes too
    s = np.asarray(ssim(jnp.asarray(a), jnp.asarray(a)))
    assert (s == 1.0).all(), s  # exactly 1.0, not approximately
