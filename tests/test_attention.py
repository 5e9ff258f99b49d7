"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightdiffusion_tpu.ops import attention as A
from jax.experimental import pallas as pl


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("d", [40, 80, 128, 160])
def test_flash_matches_xla_interpret(monkeypatch, d):
    # run the pallas kernel in interpreter mode on CPU
    import functools
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))

    b, h, s = 1, 2, 512
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    ref = A.attention_xla(q, k, v)
    out = A.flash_attention(q, k, v, block_q=256, block_k=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_cross_attention_shape(monkeypatch):
    import functools
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))

    q = _rand(jax.random.PRNGKey(1), (2, 4, 256, 64))
    k = _rand(jax.random.PRNGKey(2), (2, 4, 128, 64))
    v = _rand(jax.random.PRNGKey(3), (2, 4, 128, 64))
    ref = A.attention_xla(q, k, v)
    out = A.flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_dispatcher_cpu_uses_xla():
    q = _rand(jax.random.PRNGKey(1), (1, 2, 64, 40))
    out = A.attention(q, q, q)
    ref = A.attention_xla(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_heads_last_layout():
    b, s, heads, d = 2, 64, 4, 32
    c = heads * d
    key = jax.random.PRNGKey(7)
    q, k, v = (_rand(kk, (b, s, c)) for kk in jax.random.split(key, 3))
    out = A.attention_heads_last(q, k, v, num_heads=heads)
    # manual reference
    qh = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    ref = A.attention_xla(qh, kh, vh).transpose(0, 2, 1, 3).reshape(b, s, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_softmax_fp32_with_bf16_inputs():
    # large logits that would overflow a bf16 softmax path
    q = jnp.full((1, 1, 8, 16), 30.0, jnp.bfloat16)
    out = A.attention_xla(q, q, q)
    assert jnp.all(jnp.isfinite(out.astype(jnp.float32)))


def test_flash_dispatch_grad_matches_xla(monkeypatch):
    """Gradients through the dispatcher's flash path equal XLA gradients
    (custom VJP recomputes via XLA)."""
    import functools
    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    monkeypatch.setattr(A, "_on_tpu", lambda: True)

    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (1, 2, 2048, 32)) for kk in jax.random.split(key, 3))

    def loss_flash(q, k, v):
        return jnp.sum(A.attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(A.attention_xla(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("d", [128, 40])
def test_flash_backward_kernel_parity(monkeypatch, d):
    """Fused Pallas backward (dQ/dK/dV, interpret mode) vs XLA vjp —
    including head_dim padding (d=40 → lanes 128)."""
    import functools

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))

    rng = np.random.RandomState(3)
    b, h, s, t = 1, 2, 256, 256
    q = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    g = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)

    o, lse = A.flash_attention(q, k, v, return_lse=True,
                               block_q=128, block_k=128)
    dq, dk, dv = A.flash_attention_bwd(q, k, v, o, lse, g,
                                       block_q=128, block_k=128)

    _, vjp = jax.vjp(lambda q, k, v: A.attention_xla(q, k, v), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               atol=2e-3, rtol=2e-3)


def test_flash_lse_matches_xla(monkeypatch):
    import functools

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 1, 256, 128), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 256, 128), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, 256, 128), jnp.float32)
    _, lse = A.flash_attention(q, k, v, return_lse=True,
                               block_q=128, block_k=128)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(128)
    ref = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_shrink_to_divisor():
    """Kernel blocks must DIVIDE the sequence length — a non-dividing block
    silently drops tail tokens (the grid uses integer division). Found on
    chip via NaN ToMe images at merged length 2560 (BENCH_r03 ssim gate)."""
    from lightdiffusion_tpu.ops.attention import shrink_to_divisor

    assert shrink_to_divisor(1024, 4096) == 1024
    assert shrink_to_divisor(1024, 2560) == 512   # 2560 = 5*512
    assert shrink_to_divisor(1024, 3328) == 256   # 3328 = 13*256
    assert shrink_to_divisor(1024, 2048) == 1024
    assert shrink_to_divisor(1024, 512) == 512    # block > seq clamps
    assert shrink_to_divisor(1024, 384) == 384
    assert shrink_to_divisor(1024, 333) == 333    # block clamps to n
    assert shrink_to_divisor(128, 333) == 1       # odd tail → degenerate


def test_attention_rejects_unknown_force():
    import jax
    import pytest as _pytest

    from lightdiffusion_tpu.ops.attention import attention

    q = jax.numpy.zeros((1, 2, 8, 16))
    with _pytest.raises(ValueError, match="unknown attention force"):
        attention(q, q, q, force="pallas")


def test_auto_flash_crossover_rule():
    """Dispatcher crossover retuned for SDXL (scratch/attn_crossover.py):
    flash at s>=2048 (unchanged), and at s=1024 when the grid is large
    (b*h>=32 — SDXL's 32² stage) or d is lane-misaligned (d%64!=0 —
    SD1.5's 32² stage at d=80). XLA keeps small aligned-1024 grids and
    everything at s<=512."""
    from lightdiffusion_tpu.ops.attention import _auto_flash

    # s >= 2048: always flash (when 256-divisible)
    assert _auto_flash(2, 8, 4096, 4096, 40)
    assert _auto_flash(1, 8, 2048, 2048, 64)
    # s = 1024 large grid (SDXL 32²: b=2 cfg-batch, h=20)
    assert _auto_flash(2, 20, 1024, 1024, 64)
    # s = 1024, lane-misaligned d (SD1.5 32²: d=80)
    assert _auto_flash(2, 8, 1024, 1024, 80)
    # s = 1024 small grid with MXU-aligned d → XLA
    assert not _auto_flash(2, 8, 1024, 1024, 64)
    # s <= 512 → XLA everywhere
    assert not _auto_flash(8, 20, 512, 512, 80)
    # non-256-divisible lengths → XLA (flash grids need divisible blocks)
    assert not _auto_flash(2, 20, 1088, 1088, 64)
    # cross-attention kv=77 never routes to flash
    assert not _auto_flash(2, 8, 4096, 77, 40)
