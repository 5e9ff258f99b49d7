"""Trainer (training.py): objectives, EMA, remat, accumulation, persistence.

Capability extension beyond the reference (inference-only, SURVEY.md §2.14);
the multichip sharded path is covered by tests/test_parallel.py and
__graft_entry__.dryrun_multichip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lightdiffusion_tpu import training as T
from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L

CFG = U.UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 0), context_dim=64, num_heads=2, attn_force="xla",
)


@pytest.fixture(scope="module")
def params():
    return U.init_unet_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _batch(b=2):
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 64), jnp.float32)
    return x0, ctx


def test_eps_and_v_objectives_differ(params):
    x0, ctx = _batch()
    key = jax.random.PRNGKey(3)
    l_eps = T.diffusion_loss(params, x0, ctx, key, make_discrete_sampling("eps"), CFG, L.FP32)
    l_v = T.diffusion_loss(params, x0, ctx, key, make_discrete_sampling("v"), CFG, L.FP32)
    assert np.isfinite(float(l_eps)) and np.isfinite(float(l_v))
    assert abs(float(l_eps) - float(l_v)) > 1e-6


def test_min_snr_weighting_changes_loss(params):
    x0, ctx = _batch(b=16)
    key = jax.random.PRNGKey(3)
    ms = make_discrete_sampling("eps")
    base = float(T.diffusion_loss(params, x0, ctx, key, ms, CFG, L.FP32))
    # γ=1: every timestep with σ<1 (the lower half of the schedule) gets a
    # weight γ/SNR < 1; with batch 16 some draws land there w.h.p.
    wtd = float(
        T.diffusion_loss(params, x0, ctx, key, ms, CFG, L.FP32, snr_gamma=1.0)
    )
    # min-SNR caps high-noise weights below 1 ⇒ strictly smaller here
    assert wtd < base


def test_train_step_descends(params):
    ms = make_discrete_sampling("eps")
    opt = optax.adam(1e-3)
    step = jax.jit(T.make_train_step(opt, ms, CFG, policy=L.FP32))
    p = params
    st = opt.init(p)
    x0, ctx = _batch()
    losses = []
    for i in range(8):
        p, st, loss = step(p, st, x0, ctx, jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    # same data; loss trend must go down (allow per-step t-sampling noise)
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_remat_matches_baseline(params):
    ms = make_discrete_sampling("eps")
    opt = optax.sgd(1e-3)
    x0, ctx = _batch()
    key = jax.random.PRNGKey(7)
    st = opt.init(params)
    p1, _, l1 = jax.jit(T.make_train_step(opt, ms, CFG, policy=L.FP32))(
        params, st, x0, ctx, key
    )
    p2, _, l2 = jax.jit(
        T.make_train_step(opt, ms, CFG, policy=L.FP32, remat=True)
    )(params, st, x0, ctx, key)
    assert abs(float(l1) - float(l2)) < 1e-5
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2
    )
    assert max(jax.tree_util.tree_leaves(d)) < 1e-4


def test_grad_accumulation_runs(params):
    ms = make_discrete_sampling("eps")
    opt = optax.adam(1e-3)
    step = jax.jit(
        T.make_train_step(opt, ms, CFG, policy=L.FP32, accum_steps=2)
    )
    x0, ctx = _batch(b=4)
    p, st, loss = step(params, opt.init(params), x0, ctx, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    # params moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p, params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_trainer_ema_and_step(params):
    ms = make_discrete_sampling("eps")
    opt = optax.adam(1e-3)
    trainer = jax.jit(T.make_trainer(opt, ms, CFG, policy=L.FP32))
    state = T.init_train_state(params, opt)
    x0, ctx = _batch()
    s1, loss = trainer(state, x0, ctx, jax.random.PRNGKey(9))
    assert int(s1["step"]) == 1
    # EMA moved off the init but stays between init and new params
    leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
    e, p0, p1 = leaf(s1["ema"]), leaf(params), leaf(s1["params"])
    assert float(jnp.max(jnp.abs(e - p0))) > 0
    assert float(jnp.max(jnp.abs(e - p0))) <= float(jnp.max(jnp.abs(p1 - p0))) + 1e-8


def test_lora_init_zero_delta(params):
    lora = T.init_lora_params(jax.random.PRNGKey(0), params, rank=4)
    assert len(lora) > 0
    for p in lora.values():
        assert p["a"].shape[1] == 4 and p["b"].shape[0] == 4
        np.testing.assert_array_equal(np.asarray(p["b"]), 0)
    merged = T.merge_lora_params(params, lora)
    # zero-init b ⇒ merge is exactly the base
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_train_step_descends_and_freezes_base(params):
    ms = make_discrete_sampling("eps")
    opt = optax.adam(1e-2)
    lora = T.init_lora_params(jax.random.PRNGKey(0), params, rank=4)
    step = jax.jit(T.make_lora_train_step(opt, ms, CFG, policy=L.FP32))
    st = opt.init(lora)
    x0, ctx = _batch()
    losses = []
    lo = lora
    for i in range(8):
        lo, st, loss = step(lo, st, params, x0, ctx,
                            jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # adapters moved; merged weights now differ from the base
    moved = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(lo),
                        jax.tree_util.tree_leaves(lora))
    )
    assert moved > 0
    merged = T.merge_lora_params(params, lo)
    w0 = jax.tree_util.tree_leaves(params)[-1]
    # spot-check a targeted weight changed while the base tree is untouched
    sample_path = next(iter(lo))
    def get(t, path):
        for p in path:
            t = t[p]
        return t["weight"]
    assert float(jnp.max(jnp.abs(
        get(merged, sample_path) - get(params, sample_path)
    ))) > 0


def test_lora_kohya_export_roundtrip(params, tmp_path):
    """Trained adapters export to kohya safetensors that loader/lora.py
    parses back — every adapter covered, up@down == (a@b)^T at scale 1."""
    from safetensors.numpy import load_file

    from lightdiffusion_tpu.loader.lora import load_lora, unet_lora_key_map

    lora = T.init_lora_params(jax.random.PRNGKey(0), params, rank=4)
    # randomize b so deltas are non-zero
    lora = {
        p: {"a": ab["a"],
            "b": jax.random.normal(jax.random.PRNGKey(i), ab["b"].shape) * 0.1}
        for i, (p, ab) in enumerate(lora.items())
    }
    f = tmp_path / "trained_lora.safetensors"
    T.export_lora_kohya(lora, f)
    sd = load_file(str(f))
    key_map = unet_lora_key_map(CFG)
    patches = load_lora(sd, key_map)
    assert len(patches) == len(lora)
    # pick one adapter and check the torch-layout delta matches a@b
    path, ab = next(iter(lora.items()))
    ldm = T._lora_path_to_ldm(path)
    target = key_map["lora_unet_" + ldm.replace(".", "_")] + ".weight"
    up, down, alpha = patches[target]
    delta_torch = (np.asarray(up) @ np.asarray(down)) * alpha  # (out, in)
    delta_tree = np.asarray(ab["a"] @ ab["b"])  # (in, out)
    np.testing.assert_allclose(delta_torch, delta_tree.T, atol=1e-6)
    # a train-time scale folds into alpha so strength-1 load reproduces it
    f2 = tmp_path / "scaled.safetensors"
    T.export_lora_kohya(lora, f2, scale=2.0)
    patches2 = load_lora(load_file(str(f2)), key_map)
    _, _, alpha2 = patches2[target]
    np.testing.assert_allclose(alpha2, 2.0 * alpha, atol=1e-6)


def test_train_state_persistence_roundtrip(params, tmp_path):
    opt = optax.adam(1e-3)
    state = T.init_train_state(params, opt)
    state["step"] = jnp.int32(42)
    T.save_train_state(state, tmp_path / "run1", CFG)
    fresh = T.init_train_state(params, opt)
    out = T.load_train_state(tmp_path / "run1", fresh)
    assert out is not None
    restored, meta = out
    assert meta["step"] == 42
    assert int(restored["step"]) == 42
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state["params"])[0]),
    )
    assert T.load_train_state(tmp_path / "missing", fresh) is None
