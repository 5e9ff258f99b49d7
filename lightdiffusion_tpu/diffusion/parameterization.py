"""Model-sampling parameterizations: EPS / V-prediction over a discrete schedule.

Behavioral parity targets in the reference (/root/reference/LightDiffusion.py):
  - ``EPS`` scalings                   LightDiffusion.py:1258-1277
  - ``ModelSamplingDiscrete``          LightDiffusion.py:1280-1351
    (1000-step linear betas 0.00085→0.012, sigma = sqrt((1-abar)/abar),
     nearest-log-sigma timestep lookup, interpolated sigma(timestep))

Design: instead of the reference's dynamically-composed mixin class
(``class ModelSampling(ModelSamplingDiscrete, EPS)``, :5787-5795) we keep a
plain frozen dataclass holding the sigma tables plus a parameterization tag.
All methods are jnp-traceable so they work inside jit'd samplers.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .schedules import make_beta_schedule


@dataclasses.dataclass(frozen=True)
class DiscreteSampling:
    """Sigma tables for a trained discrete diffusion model + prediction type.

    sigmas/log_sigmas are (T,) float32 ascending (index == trained timestep).
    """

    sigmas: jnp.ndarray
    log_sigmas: jnp.ndarray
    prediction_type: str = "eps"  # "eps" | "v"
    # host-side copies of the endpoints: usable under jit tracing (the jnp
    # tables become tracers inside jit, so float() on them would fail)
    sigma_min_f: float = 0.0
    sigma_max_f: float = 0.0

    # -- schedule --------------------------------------------------------
    @property
    def sigma_min(self) -> float:
        return self.sigma_min_f

    @property
    def sigma_max(self) -> float:
        return self.sigma_max_f

    def timestep(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """Continuous sigma → fractional trained timestep.

        The reference uses nearest-log-sigma argmin for ``timestep`` and
        piecewise-linear interpolation for ``sigma``; we use the standard
        k-diffusion interpolated inverse (identical on-grid, smooth off-grid).
        """
        log_sigma = jnp.log(jnp.maximum(sigma, 1e-10))
        dists = log_sigma[..., None] - self.log_sigmas
        low_idx = jnp.clip(
            jnp.sum(dists >= 0, axis=-1) - 1, 0, self.log_sigmas.shape[0] - 2
        )
        high_idx = low_idx + 1
        low = self.log_sigmas[low_idx]
        high = self.log_sigmas[high_idx]
        w = jnp.clip((low - log_sigma) / (low - high), 0.0, 1.0)
        return (1.0 - w) * low_idx + w * high_idx

    def sigma(self, timestep: jnp.ndarray) -> jnp.ndarray:
        """Fractional trained timestep → sigma (linear interp in log-sigma)."""
        t = jnp.clip(timestep, 0, self.log_sigmas.shape[0] - 1)
        low_idx = jnp.floor(t).astype(jnp.int32)
        high_idx = jnp.ceil(t).astype(jnp.int32)
        w = t - low_idx
        log_sigma = (1.0 - w) * self.log_sigmas[low_idx] + w * self.log_sigmas[
            high_idx
        ]
        return jnp.exp(log_sigma)

    def percent_to_sigma(self, percent: float) -> float:
        if percent <= 0.0:
            return 999999999.9
        if percent >= 1.0:
            return 0.0
        return float(self.sigma(jnp.asarray((1.0 - percent) * 999.0)))

    # -- prediction-space transforms --------------------------------------
    def calculate_input(self, sigma: jnp.ndarray, noisy: jnp.ndarray) -> jnp.ndarray:
        """Pre-scale the noisy latent before the UNet call."""
        sigma = _bcast(sigma, noisy)
        if self.prediction_type in ("eps", "v"):
            return noisy / jnp.sqrt(sigma**2 + 1.0)
        raise ValueError(self.prediction_type)

    def calculate_denoised(
        self, sigma: jnp.ndarray, model_output: jnp.ndarray, model_input: jnp.ndarray
    ) -> jnp.ndarray:
        """UNet output → x0 prediction."""
        sigma = _bcast(sigma, model_output)
        if self.prediction_type == "eps":
            return model_input - model_output * sigma
        if self.prediction_type == "v":
            return (
                model_input / (sigma**2 + 1.0)
                - model_output * sigma / jnp.sqrt(sigma**2 + 1.0)
            )
        raise ValueError(self.prediction_type)

    def noise_scaling(
        self,
        sigma: jnp.ndarray,
        noise: jnp.ndarray,
        latent: jnp.ndarray,
        max_denoise: bool = False,
    ) -> jnp.ndarray:
        """Scale initial noise into the sampler's sigma space and add latent."""
        sigma = _bcast(sigma, noise)
        if max_denoise:
            noise = noise * jnp.sqrt(1.0 + sigma**2)
        else:
            noise = noise * sigma
        return noise + latent

    def inverse_noise_scaling(self, sigma, latent):
        return latent


def _bcast(sigma: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a scalar or (B,) sigma against an (B, ...) tensor."""
    sigma = jnp.asarray(sigma, dtype=x.dtype)
    while sigma.ndim < x.ndim:
        sigma = sigma[..., None]
    return sigma


def make_discrete_sampling(
    prediction_type: str = "eps",
    timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
) -> DiscreteSampling:
    """Build the SD1.x trained schedule (defaults match the reference's
    ModelSamplingDiscrete at LightDiffusion.py:1284-1295)."""
    betas = make_beta_schedule(
        timesteps, linear_start=linear_start, linear_end=linear_end
    )
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
    sigmas32 = jnp.asarray(sigmas, dtype=jnp.float32)
    return DiscreteSampling(
        sigmas=sigmas32,
        log_sigmas=jnp.log(sigmas32),
        prediction_type=prediction_type,
        sigma_min_f=float(sigmas[0]),
        sigma_max_f=float(sigmas[-1]),
    )
