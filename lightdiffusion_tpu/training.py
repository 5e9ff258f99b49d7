"""Diffusion training step (epsilon-prediction MSE) with mesh sharding.

The reference framework is inference-only (SURVEY.md top: "no training, no
distributed layer"); this module is a capability extension so the framework
scales past the reference: a jit'd train step with DP batch sharding + TP
param sharding over a ``jax.sharding.Mesh``, gradients reduced by XLA
collectives over ICI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from .models import unet as U
from .ops import layers as L
from .diffusion.parameterization import DiscreteSampling


def diffusion_loss(
    unet_params,
    x0: jnp.ndarray,  # (B, H, W, 4) clean model-space latents
    context: jnp.ndarray,  # (B, T, C)
    key,
    model_sampling: DiscreteSampling,
    unet_cfg: U.UNetConfig,
    policy: L.Policy = L.BF16,
):
    """Sample t ~ U, add noise, predict eps, MSE (the SD training objective)."""
    b = x0.shape[0]
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (b,), 0, model_sampling.sigmas.shape[0])
    sigma = model_sampling.sigmas[t]
    noise = jax.random.normal(k_n, x0.shape, jnp.float32)
    x_noisy = x0 + noise * sigma[:, None, None, None]
    x_in = model_sampling.calculate_input(sigma, x_noisy)
    eps_pred = U.apply_unet(
        unet_params, x_in, t.astype(jnp.float32), context, cfg=unet_cfg,
        policy=policy,
    )
    return jnp.mean((eps_pred.astype(jnp.float32) - noise) ** 2)


def make_train_step(
    optimizer: optax.GradientTransformation,
    model_sampling: DiscreteSampling,
    unet_cfg: U.UNetConfig,
    policy: L.Policy = L.BF16,
):
    """Returns jittable (params, opt_state, x0, context, key) → (params,
    opt_state, loss). Shard inputs batch-on-dp and params per
    parallel.mesh.param_specs; GSPMD inserts the grad all-reduces."""

    def step(params, opt_state, x0, context, key):
        loss, grads = jax.value_and_grad(diffusion_loss)(
            params, x0, context, key, model_sampling, unet_cfg, policy
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
