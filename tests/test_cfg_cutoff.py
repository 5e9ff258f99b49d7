"""CFG truncation (SDPipeline.sample_latent cfg_cutoff): guidance for the
first fraction of steps only, cond-only tail at UNet batch B.

Opt-in accelerator beyond the reference (which always runs cond+uncond,
/root/reference/LightDiffusion.py:2609-2626); the handoff reuses the
KSamplerAdvanced window machinery, so the tail draws exact suffix noise.
"""

import numpy as np
import pytest

from tests.test_quant import _tiny_pipe


@pytest.fixture(scope="module")
def pipe():
    return _tiny_pipe()


def _sample(pipe, **kw):
    pos = pipe.encode_text("a cat in a hat")
    neg = pipe.encode_text("blurry")
    latent = pipe.empty_latent(64, 64, 1)
    args = dict(seed=5, steps=6, cfg=7.0, sampler_name="euler_ancestral",
                scheduler="karras")
    args.update(kw)
    return np.asarray(pipe.sample_latent(latent, pos, neg, **args))


def test_cutoff_runs_and_differs_from_full_cfg(pipe):
    full = _sample(pipe)
    cut = _sample(pipe, cfg_cutoff=0.5)
    assert cut.shape == full.shape
    assert np.isfinite(cut).all()
    # the cond-only tail diverges from guided sampling...
    assert np.abs(cut - full).max() > 1e-6
    # ...but stays on the same trajectory family (same noise, same schedule)
    a, b = cut.ravel(), full.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.9, cos


def test_cutoff_with_unit_cfg_matches_full_run(pipe):
    """At cfg==1 the CFG combine IS the cond prediction, so truncation must
    reproduce the full run up to fp rounding of uncond+(cond−uncond)·1."""
    full = _sample(pipe, cfg=1.0)
    cut = _sample(pipe, cfg=1.0, cfg_cutoff=0.5)
    np.testing.assert_allclose(cut, full, atol=1e-3, rtol=1e-3)


def test_cutoff_deterministic(pipe):
    a = _sample(pipe, cfg_cutoff=0.6)
    b = _sample(pipe, cfg_cutoff=0.6)
    np.testing.assert_array_equal(a, b)


def test_cutoff_one_equals_baseline(pipe):
    full = _sample(pipe)
    one = _sample(pipe, cfg_cutoff=1.0)  # no-op: out of (0,1) range
    np.testing.assert_array_equal(one, full)


def test_cutoff_single_step_is_noop(pipe):
    """steps=1 skips truncation instead of producing a k=0 un-noised run."""
    full = _sample(pipe, steps=1)
    cut = _sample(pipe, steps=1, cfg_cutoff=0.7)
    np.testing.assert_array_equal(cut, full)


def test_cutoff_rejects_masked_and_windowed_runs(pipe):
    import jax.numpy as jnp

    pos = pipe.encode_text("a cat")
    neg = pipe.encode_text("")
    latent = pipe.empty_latent(64, 64, 1)
    mask = jnp.ones(latent.shape[:3] + (1,), jnp.float32)
    with pytest.raises(ValueError, match="masked"):
        pipe.sample_latent(latent, pos, neg, steps=4, cfg_cutoff=0.5,
                           noise_mask=mask)
    with pytest.raises(ValueError, match="step window"):
        pipe.sample_latent(latent, pos, neg, steps=4, cfg_cutoff=0.5,
                           start_step=1)
