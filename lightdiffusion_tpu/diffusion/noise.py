"""Noise generation: seed-reproducible latents and per-step sampler noise.

The reference seeds torch's CPU generator and draws ``randn`` on the host for
device-independent reproducibility (``prepare_noise``,
/root/reference/LightDiffusion.py:3145-3153), and uses torchsde Brownian trees
for SDE samplers (:857-905). TPU-native equivalents:
  - ``prepare_noise``: threefry PRNGKey(seed) → normal. Deterministic across
    hosts/devices by construction (same contract, different bits — cross-
    framework bit-parity is impossible; parity tests inject noise instead).
  - per-step noise: ``jax.random.fold_in(key, step)`` — the hashed-key
    equivalent of the Brownian tree's per-interval determinism: the noise for
    step i is independent of how many steps precede it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prepare_noise(latent: jnp.ndarray, seed: int, dtype=None) -> jnp.ndarray:
    """Seeded standard normal with the latent's shape (ref :3145)."""
    key = jax.random.PRNGKey(seed)
    return jax.random.normal(key, latent.shape, dtype or latent.dtype)


def step_noise_key(seed_or_key, step) -> jax.Array:
    """Deterministic per-step key (Brownian-tree reproducibility contract)."""
    key = (
        jax.random.PRNGKey(seed_or_key)
        if isinstance(seed_or_key, int)
        else seed_or_key
    )
    return jax.random.fold_in(key, step)


def keys_for(seed) -> jax.Array:
    """int → a (2,) PRNG key; a sequence of ints → (B, 2) PER-SAMPLE keys.

    Per-sample keys make each batch element's sampler noise a function of its
    own seed only — a request co-batched with arbitrary neighbours (the
    serving frontend) reproduces exactly the image it gets in any other batch
    composition."""
    import numpy as _np

    if isinstance(seed, (int, _np.integer)):
        return jax.random.PRNGKey(int(seed))
    return jnp.stack([jax.random.PRNGKey(int(s)) for s in seed])


def step_noise(key, step, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Per-step sampler noise. ``key``: (2,) single key drawing the whole
    (B, ...) batch at once, or (B, 2) per-sample keys (keys_for) drawing each
    sample independently of its batch position."""
    if key.ndim == 2:
        ks = jax.vmap(lambda k: jax.random.fold_in(k, step))(key)
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(ks)
    return jax.random.normal(step_noise_key(key, step), shape, dtype)


def interval_noise_key(key, sigma_from, sigma_to) -> jax.Array:
    """PRNG key determined only by (key, σ_from, σ_to) — the reproducibility
    contract of the reference's Brownian tree seeded with the TOTAL sigmas
    (LightDiffusion.py:9025-9041): a partial-denoise window draws exactly the
    noise the continuous run would at the same sigma interval, independent of
    slicing/chunking. Endpoints are hashed in quantized log-sigma space (1e-4
    resolution), traced-safe under jit/scan."""

    def q(s):
        return jnp.round(
            jnp.log(jnp.maximum(jnp.asarray(s, jnp.float32), 1e-10)) * 1e4
        ).astype(jnp.int32)

    k = jax.random.fold_in(key, q(sigma_from))
    return jax.random.fold_in(k, q(sigma_to))


def interval_noise(key, sigma_from, sigma_to, shape, dtype=jnp.float32):
    """Interval-keyed SDE noise; (B, 2) per-sample keys as in step_noise."""
    if key.ndim == 2:
        ks = jax.vmap(
            lambda k: interval_noise_key(k, sigma_from, sigma_to)
        )(key)
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(ks)
    return jax.random.normal(
        interval_noise_key(key, sigma_from, sigma_to), shape, dtype
    )


class BrownianTreeNoiseSampler:
    """Seed-reproducible per-interval noise — the contract of the reference's
    torchsde Brownian tree (LightDiffusion.py:857-905), re-expressed over
    PRNG keys: the unit-variance normal for an interval (σ_from, σ_to)
    depends only on (seed, interval endpoints), independent of call order or
    chunking. Not bit-identical to torchsde (impossible cross-framework;
    SURVEY §7 'hard parts'). Used by ``sample_dpmpp_2m_sde`` (samplers.py) —
    the same sampler the reference feeds Brownian noise (:9017-9041)."""

    def __init__(self, x, sigma_min=None, sigma_max=None, seed: int = 0):
        self.shape = x.shape
        self.dtype = x.dtype
        self.key = (
            jax.random.PRNGKey(seed) if isinstance(seed, int) else seed
        )

    def __call__(self, sigma_from, sigma_to) -> jnp.ndarray:
        return interval_noise(
            self.key, sigma_from, sigma_to, self.shape, self.dtype
        )


class Noise_RandomNoise:
    """Seeded noise generator object (ref :9043)."""

    def __init__(self, seed: int):
        self.seed = seed

    def generate_noise(self, latent) -> jnp.ndarray:
        samples = latent["samples"] if isinstance(latent, dict) else latent
        return prepare_noise(jnp.asarray(samples, jnp.float32), self.seed)
