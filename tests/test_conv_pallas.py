"""Pallas 3x3 conv kernel: parity vs XLA conv, VJP wiring, dispatch gate.

Runs in interpret mode on the CPU test backend (the kernel auto-selects
interpret off-TPU); on-chip parity/perf is covered by
scratch/conv3x3_pallas2.py and the bench SSIM gates.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.ops.conv_pallas import (
    _xla_conv,
    conv3x3_same,
    pallas_conv_enabled,
    pallas_conv_viable,
    set_pallas_conv,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(1, 8, 16, 128, 64), (2, 16, 8, 96, 128)])
def test_parity_vs_xla(dtype, shape):
    B, H, W, cin, cout = shape
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, W, cin), dtype)
    w = jax.random.normal(k, (3, 3, cin, cout), dtype) * 0.05
    b = jax.random.normal(k, (cout,), dtype)
    ref = np.asarray(_xla_conv(x, w, b), np.float32)
    got = np.asarray(conv3x3_same(x, w, b), np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    err = np.abs(ref - got).max() / np.abs(ref).max()
    assert err < tol, f"rel err {err}"


def test_vjp_matches_xla_conv():
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (1, 8, 8, 64), jnp.float32)
    w = jax.random.normal(k, (3, 3, 64, 64), jnp.float32) * 0.05
    b = jax.random.normal(k, (64,), jnp.float32)
    g = jax.random.normal(k, (1, 8, 8, 64), jnp.float32)

    out_p, pull_p = jax.vjp(conv3x3_same, x, w, b)
    out_x, pull_x = jax.vjp(_xla_conv, x, w, b)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)
    for gp, gx in zip(pull_p(g), pull_x(g)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)


def test_dispatch_gate():
    ok = dict(x_shape=(1, 256, 256, 128), w_shape=(3, 3, 128, 128),
              stride=1, padding="SAME")
    assert pallas_conv_viable(**ok)
    assert pallas_conv_viable(**dict(ok, padding=[(1, 1), (1, 1)]))
    # kernel contract violations
    assert not pallas_conv_viable(**dict(ok, w_shape=(1, 1, 128, 128)))
    assert not pallas_conv_viable(**dict(ok, stride=2))
    assert not pallas_conv_viable(**dict(ok, padding="VALID"))
    # measured-loss regimes stay on XLA
    assert not pallas_conv_viable(**dict(ok, x_shape=(8, 64, 64, 320)))
    assert not pallas_conv_viable(**dict(ok, x_shape=(1, 512, 64, 128)))
    assert not pallas_conv_viable(**dict(ok, x_shape=(1, 256, 256, 32)))
    # 320-wide UNet channels measured ~1.0x — stay on XLA at every size
    assert not pallas_conv_viable(
        x_shape=(8, 128, 128, 320), w_shape=(3, 3, 320, 320),
        stride=1, padding="SAME")
    assert not pallas_conv_viable(
        x_shape=(1, 512, 512, 320), w_shape=(3, 3, 320, 320),
        stride=1, padding="SAME")
    # ESRGAN/TAESD 64-wide bodies qualify only at image resolution
    assert pallas_conv_viable(
        x_shape=(1, 512, 512, 64), w_shape=(3, 3, 64, 64),
        stride=1, padding="SAME")
    assert not pallas_conv_viable(
        x_shape=(1, 256, 256, 64), w_shape=(3, 3, 64, 64),
        stride=1, padding="SAME")
    assert not pallas_conv_viable(
        x_shape=(1, 256, 256, 128), w_shape=(3, 3, 128, 3),
        stride=1, padding="SAME")
    # VMEM cap: 1280-wide weights don't fit
    assert not pallas_conv_viable(
        x_shape=(1, 256, 256, 1280), w_shape=(3, 3, 1280, 1280),
        stride=1, padding="SAME")
    # fp32 halves the cap
    assert pallas_conv_viable(
        x_shape=(1, 256, 256, 512), w_shape=(3, 3, 512, 512),
        stride=1, padding="SAME", itemsize=2)
    assert not pallas_conv_viable(
        x_shape=(1, 256, 256, 640), w_shape=(3, 3, 640, 640),
        stride=1, padding="SAME", itemsize=4)
    # the measured on-chip VMEM OOM (SDXL fp32 1024^2 decode, scoped
    # 16.4M > 16M): must stay excluded
    assert not pallas_conv_viable(
        x_shape=(1, 1024, 1024, 256), w_shape=(3, 3, 256, 256),
        stride=1, padding="SAME", itemsize=4)
    # ...while the fp32 1024^2 x 128 SDXL decode tail stays admitted
    assert pallas_conv_viable(
        x_shape=(1, 1024, 1024, 128), w_shape=(3, 3, 128, 128),
        stride=1, padding="SAME", itemsize=4)


def test_conv2d_stays_on_xla_off_tpu():
    """On the CPU test backend L.conv2d must not route to Pallas even for
    gate-passing shapes (interpret mode there is only for direct tests)."""
    assert jax.default_backend() == "cpu"
    k = jax.random.PRNGKey(2)
    p = {"weight": jax.random.normal(k, (3, 3, 128, 128), jnp.float32) * 0.05,
         "bias": jnp.zeros((128,), jnp.float32)}
    x = jax.random.normal(k, (1, 128, 128, 128), jnp.float32)
    y = L.conv2d(p, x, policy=L.FP32)  # would be minutes in interpret mode
    assert y.shape == (1, 128, 128, 128)
    assert np.isfinite(np.asarray(y)).all()


def test_set_pallas_conv_toggle():
    assert pallas_conv_enabled()
    set_pallas_conv(False)
    try:
        assert not pallas_conv_enabled()
    finally:
        set_pallas_conv(True)
