"""Fused GEGLU FFN block kernel (x + FF(LN(x))): parity vs the
LN/linear/geglu/linear composition, VJP wiring, dispatch gate. Interpret
mode on the CPU test backend; on-chip parity/perf covered by
scratch/ffn_e2e.py (rel err ~5e-3 at bf16 inside the full UNet step).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.ops.ffn import (
    _ffn_fused,
    _ffn_pallas,
    _xla_block,
    fused_ffn_applicable,
    fused_ffn_viable,
    geglu_ffn_block,
    set_fused_ffn,
)


def _mk(M, C, inner, dtype, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 7)
    x = jax.random.normal(ks[0], (M, C), dtype)
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
    gb = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    w1 = jax.random.normal(ks[3], (C, 2 * inner), dtype) * 0.05
    b1 = jax.random.normal(ks[4], (2 * inner,), dtype) * 0.1
    w2 = jax.random.normal(ks[5], (inner, C), dtype) * 0.05
    b2 = jax.random.normal(ks[6], (C,), dtype) * 0.1
    return x, g, gb, w1, b1, w2, b2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_composition(dtype):
    args = _mk(1024, 128, 256, dtype)
    ref = np.asarray(_xla_block(*args, eps=1e-5), np.float32)
    got = np.asarray(
        _ffn_pallas(*args, bm=128, bn=128, eps=1e-5), np.float32)
    tol = 2e-5 if dtype == jnp.float32 else 3e-2
    err = np.abs(ref - got).max() / np.abs(ref).max()
    assert err < tol, f"rel err {err}"


def test_vjp_matches_composition():
    args = _mk(256, 64, 128, jnp.float32)

    def fused(*a):
        return _ffn_fused(*a, (128, 128), 1e-5).sum()

    def plain(*a):
        return _xla_block(*a, eps=1e-5).sum()

    idx = tuple(range(7))
    g_f = jax.grad(fused, argnums=idx)(*args)
    g_p = jax.grad(plain, argnums=idx)(*args)
    for a, b in zip(g_f, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dispatch_gate():
    # the two measured winning cells (SD1.5 512^2 CFG-batch-8 regime)
    assert fused_ffn_applicable(8, 4096, 320, 1280, 2)
    assert fused_ffn_applicable(8, 1024, 640, 2560, 2)
    # measured-loss regimes fall back: CFG batch < 8 …
    assert not fused_ffn_applicable(2, 4096, 320, 1280, 2)
    assert not fused_ffn_applicable(2, 4096, 640, 2560, 2)
    # … and per-sample token volume over 4096*320 (SD1.5 hires level-0,
    # SDXL 64^2 at C=640 — both measured neutral-to-loss)
    assert not fused_ffn_applicable(2, 16384, 320, 1280, 2)
    assert not fused_ffn_applicable(8, 4096, 640, 2560, 2)
    # small-M shapes (SDXL depth-10 level, SD1.5 16^2/middle): fewer than
    # 8 row tiles of bm>=512 loses to XLA's producer fusion in-context
    assert not fused_ffn_viable(2 * 1024, 1280, 5120, 2)
    assert not fused_ffn_viable(8 * 64, 1280, 5120, 2)
    # indivisible token counts fall back
    assert not fused_ffn_viable(577, 320, 1280, 2)
    assert not fused_ffn_viable(3 * 577, 320, 1280, 2)


def test_geglu_ffn_block_cpu_falls_back_exactly():
    """On the CPU backend geglu_ffn_block must be the plain composition —
    same bits, no interpret-mode Pallas in the hot test path."""
    assert jax.default_backend() == "cpu"
    k = jax.random.PRNGKey(1)
    p_ln = {"weight": jnp.ones((64,), jnp.float32),
            "bias": jnp.zeros((64,), jnp.float32)}
    p_in = {"weight": jax.random.normal(k, (64, 256), jnp.float32) * 0.05,
            "bias": jnp.zeros((256,), jnp.float32)}
    p_out = {"weight": jax.random.normal(k, (128, 64), jnp.float32) * 0.05,
             "bias": jnp.zeros((64,), jnp.float32)}
    x = jax.random.normal(k, (2, 77, 64), jnp.float32)
    got = geglu_ffn_block(p_ln, p_in, p_out, x, L.FP32)
    ref = x + L.linear(
        p_out, L.geglu(p_in, L.layer_norm(p_ln, x, policy=L.FP32), L.FP32),
        L.FP32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # force="xla" (the mesh/multichip pin, like attn_force) is also exact
    forced = geglu_ffn_block(p_ln, p_in, p_out, x, L.FP32, force="xla")
    np.testing.assert_array_equal(np.asarray(forced), np.asarray(ref))


def test_set_fused_ffn_toggle():
    from lightdiffusion_tpu.ops.ffn import fused_ffn_enabled
    assert fused_ffn_enabled()
    set_fused_ffn(False)
    try:
        assert not fused_ffn_enabled()
    finally:
        set_fused_ffn(True)
