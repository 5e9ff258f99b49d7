"""Noise schedules: beta schedules, sigma schedules (karras / normal / others).

Behavioral parity targets in the reference (/root/reference/LightDiffusion.py):
  - ``make_beta_schedule``            LightDiffusion.py:787  (linear in sqrt space)
  - ``get_sigmas_karras``             LightDiffusion.py:831  (rho=7 power schedule)
  - ``normal_scheduler``              LightDiffusion.py:2639 (uniform in timestep space)
  - ``calculate_sigmas`` dispatch     LightDiffusion.py:3045
  - ``SCHEDULER_NAMES``               LightDiffusion.py:3034

Schedules are computed once at pipeline-setup time on the host, so we build
them in numpy float64 for precision (the reference builds betas in torch
float64 too) and hand back float32 jnp arrays that feed the jit'd samplers.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SCHEDULER_NAMES = [
    "normal",
    "karras",
    "exponential",
    "sgm_uniform",
    "simple",
    "ddim_uniform",
    "ays",       # Align Your Steps (SD1.x table)
    "ays_sdxl",  # Align Your Steps (SDXL table)
]


def make_beta_schedule(
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
) -> np.ndarray:
    """Linear-in-sqrt-space beta schedule (the SD1.x training schedule).

    Returns float64 — consumed by DiscreteSampling which keeps float64
    precision through the cumprod before casting sigmas to float32.
    """
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
        ** 2
    )


def append_zero(x: jnp.ndarray) -> jnp.ndarray:
    """Append the terminal sigma=0 to a sigma schedule."""
    return jnp.concatenate([jnp.asarray(x), jnp.zeros((1,), dtype=jnp.asarray(x).dtype)])


def get_sigmas_karras(
    n: int,
    sigma_min: float,
    sigma_max: float,
    rho: float = 7.0,
) -> jnp.ndarray:
    """Karras et al. (2022) power-law noise schedule; n sigmas + trailing 0."""
    ramp = np.linspace(0.0, 1.0, n, dtype=np.float64)
    min_inv_rho = float(sigma_min) ** (1.0 / rho)
    max_inv_rho = float(sigma_max) ** (1.0 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return append_zero(jnp.asarray(sigmas, dtype=jnp.float32))


def get_sigmas_exponential(n: int, sigma_min: float, sigma_max: float) -> jnp.ndarray:
    """Exponential (log-linear) schedule."""
    sigmas = np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), n))
    return append_zero(jnp.asarray(sigmas, dtype=jnp.float32))


def normal_scheduler(model_sampling, steps: int, sgm: bool = False) -> jnp.ndarray:
    """Uniform-in-timestep schedule mapped through the model's sigma(t).

    ``model_sampling`` is a DiscreteSampling instance (parameterization.py).
    """
    start = float(model_sampling.timestep(model_sampling.sigma_max))
    end = float(model_sampling.timestep(model_sampling.sigma_min))
    if sgm:
        timesteps = np.linspace(start, end, steps + 1)[:-1]
    else:
        timesteps = np.linspace(start, end, steps)
    sigs = model_sampling.sigma(jnp.asarray(timesteps, dtype=jnp.float32))
    return append_zero(sigs.astype(jnp.float32))


def simple_scheduler(model_sampling, steps: int) -> jnp.ndarray:
    """Every len/steps-th sigma of the trained discrete schedule."""
    sigmas_full = np.asarray(model_sampling.sigmas)
    n = sigmas_full.shape[0]
    ss = n / steps
    idx = n - 1 - np.floor(np.arange(steps) * ss).astype(np.int64)
    return append_zero(jnp.asarray(sigmas_full[idx], dtype=jnp.float32))


def ddim_uniform_scheduler(model_sampling, steps: int) -> jnp.ndarray:
    """DDIM-style uniform stride over trained timesteps."""
    sigmas_full = np.asarray(model_sampling.sigmas)
    n = sigmas_full.shape[0]
    c = n // steps
    ts = np.arange(1, steps + 1) * c - 1
    sigs = sigmas_full[ts][::-1]
    return append_zero(jnp.asarray(sigs.copy(), dtype=jnp.float32))


# Align Your Steps (Sabour et al., NVIDIA 2024, arXiv 2404.14507): optimized
# 10-step schedules minimizing discretization error of the SDE solve; other
# step counts via log-linear interpolation (the paper's prescription). A
# reduced-step option beyond the reference's schedulers: AYS-10 ≈ karras-20
# quality at half the UNet evaluations.
AYS_SIGMAS = {
    "sd15": [14.615, 6.475, 3.861, 2.697, 1.886, 1.396, 0.963, 0.652, 0.399,
             0.152, 0.029],
    "sdxl": [14.615, 6.315, 3.771, 2.181, 1.342, 0.862, 0.555, 0.380, 0.234,
             0.113, 0.029],
}


def _loglinear_interp(t_steps: np.ndarray, num_steps: int) -> np.ndarray:
    """Log-linear interpolation of a (descending) sigma table."""
    xs = np.linspace(0.0, 1.0, len(t_steps))
    ys = np.log(t_steps[::-1])
    new_xs = np.linspace(0.0, 1.0, num_steps)
    return np.exp(np.interp(new_xs, xs, ys))[::-1].copy()


def get_sigmas_ays(n: int, model_type: str = "sd15") -> jnp.ndarray:
    """(n+1,) sigmas: the table (interpolated to n+1 points when n≠10) with
    the terminal entry zeroed — the schedule therefore lands exactly at 0."""
    sig = np.asarray(AYS_SIGMAS[model_type], np.float64)
    if n + 1 != len(sig):
        sig = _loglinear_interp(sig, n + 1)
    sig = sig.copy()
    sig[-1] = 0.0
    return jnp.asarray(sig, jnp.float32)


def calculate_sigmas(model_sampling, scheduler_name: str, steps: int) -> jnp.ndarray:
    """Dispatch by scheduler name → (steps+1,) float32 descending sigmas."""
    if scheduler_name == "karras":
        return get_sigmas_karras(
            steps, float(model_sampling.sigma_min), float(model_sampling.sigma_max)
        )
    if scheduler_name == "normal":
        return normal_scheduler(model_sampling, steps)
    if scheduler_name == "exponential":
        return get_sigmas_exponential(
            steps, float(model_sampling.sigma_min), float(model_sampling.sigma_max)
        )
    if scheduler_name == "sgm_uniform":
        return normal_scheduler(model_sampling, steps, sgm=True)
    if scheduler_name == "simple":
        return simple_scheduler(model_sampling, steps)
    if scheduler_name == "ddim_uniform":
        return ddim_uniform_scheduler(model_sampling, steps)
    if scheduler_name == "ays":
        return get_sigmas_ays(steps, "sd15")
    if scheduler_name == "ays_sdxl":
        return get_sigmas_ays(steps, "sdxl")
    raise ValueError(f"unknown scheduler {scheduler_name!r}")


def partial_denoise_sigmas(sigmas_fn, steps: int, denoise: float) -> jnp.ndarray:
    """Denoise<1 semantics: compute int(steps/denoise) sigmas, keep the last
    steps+1 of them (img2img / hires-fix partial denoising)."""
    if denoise is None or denoise > 0.9999:
        return sigmas_fn(steps)
    if denoise <= 0.0:
        return jnp.zeros((0,), dtype=jnp.float32)
    new_steps = int(steps / denoise)
    sigmas = sigmas_fn(new_steps)
    return sigmas[-(steps + 1):]
