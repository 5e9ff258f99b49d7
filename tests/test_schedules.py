"""Unit tests for sigma schedules and model-sampling parameterization.

Golden values: the SD1.5 trained schedule's sigma_min/max are well-known
community constants (0.0291675, 14.6146); karras endpoints and monotonicity
are checked against the closed form.
"""

import numpy as np
import jax.numpy as jnp

from lightdiffusion_tpu.diffusion import schedules as S
from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling


def test_karras_endpoints_and_shape():
    sig = S.get_sigmas_karras(20, 0.0291675, 14.6146)
    assert sig.shape == (21,)
    np.testing.assert_allclose(float(sig[0]), 14.6146, rtol=1e-5)
    np.testing.assert_allclose(float(sig[19]), 0.0291675, rtol=1e-5)
    assert float(sig[20]) == 0.0
    assert np.all(np.diff(np.asarray(sig)) < 0)


def test_karras_closed_form_midpoint():
    n, smin, smax, rho = 10, 0.1, 10.0, 7.0
    sig = S.get_sigmas_karras(n, smin, smax, rho)
    i = 4
    expected = (
        smax ** (1 / rho) + (i / (n - 1)) * (smin ** (1 / rho) - smax ** (1 / rho))
    ) ** rho
    np.testing.assert_allclose(float(sig[i]), expected, rtol=1e-5)


def test_sd15_trained_schedule_constants():
    ms = make_discrete_sampling()
    assert ms.sigmas.shape == (1000,)
    np.testing.assert_allclose(float(ms.sigma_min), 0.0291675, rtol=1e-4)
    np.testing.assert_allclose(float(ms.sigma_max), 14.6146, rtol=1e-4)


def test_timestep_sigma_roundtrip():
    ms = make_discrete_sampling()
    for t in [0.0, 1.0, 57.0, 500.0, 999.0]:
        sigma = ms.sigma(jnp.asarray(t))
        t_back = ms.timestep(sigma)
        np.testing.assert_allclose(float(t_back), t, atol=1e-2)


def test_normal_scheduler_endpoints():
    ms = make_discrete_sampling()
    sig = S.normal_scheduler(ms, 10)
    assert sig.shape == (11,)
    np.testing.assert_allclose(float(sig[0]), float(ms.sigma_max), rtol=1e-4)
    np.testing.assert_allclose(float(sig[9]), float(ms.sigma_min), rtol=1e-4)
    assert float(sig[10]) == 0.0


def test_eps_scalings():
    ms = make_discrete_sampling("eps")
    x = jnp.ones((2, 4, 4, 4)) * 3.0
    sigma = jnp.asarray([2.0, 2.0])
    scaled = ms.calculate_input(sigma, x)
    np.testing.assert_allclose(np.asarray(scaled), 3.0 / np.sqrt(5.0), rtol=1e-6)
    eps = jnp.ones_like(x) * 0.5
    den = ms.calculate_denoised(sigma, eps, x)
    np.testing.assert_allclose(np.asarray(den), 3.0 - 0.5 * 2.0, rtol=1e-6)


def test_noise_scaling_max_denoise():
    ms = make_discrete_sampling()
    noise = jnp.ones((1, 2, 2, 1))
    latent = jnp.zeros_like(noise)
    out = ms.noise_scaling(jnp.asarray([3.0]), noise, latent, max_denoise=True)
    np.testing.assert_allclose(np.asarray(out), np.sqrt(10.0), rtol=1e-6)
    out2 = ms.noise_scaling(jnp.asarray([3.0]), noise, latent, max_denoise=False)
    np.testing.assert_allclose(np.asarray(out2), 3.0, rtol=1e-6)


def test_partial_denoise_sigma_slice():
    ms = make_discrete_sampling()

    def fn(steps):
        return S.calculate_sigmas(ms, "karras", steps)

    sig = S.partial_denoise_sigmas(fn, 10, 0.5)
    assert sig.shape == (11,)
    full = fn(20)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(full[-11:]), rtol=1e-6)


def test_all_schedulers_run():
    ms = make_discrete_sampling()
    for name in S.SCHEDULER_NAMES:
        sig = S.calculate_sigmas(ms, name, 8)
        assert sig.shape == (9,), name
        arr = np.asarray(sig)
        assert arr[-1] == 0.0
        assert np.all(np.diff(arr[:-1]) < 0), name


def test_ays_schedule():
    """Align Your Steps (arXiv 2404.14507): published 10-step tables verbatim,
    log-linear interpolation elsewhere, strictly descending + terminal zero."""
    from lightdiffusion_tpu.diffusion.schedules import (
        AYS_SIGMAS,
        get_sigmas_ays,
    )

    s10 = np.asarray(get_sigmas_ays(10, "sd15"))
    np.testing.assert_allclose(s10[:-1], AYS_SIGMAS["sd15"][:-1], rtol=1e-6)
    assert s10[-1] == 0.0 and s10.shape == (11,)
    for n in (8, 14, 20):
        s = np.asarray(get_sigmas_ays(n, "sdxl"))
        assert s.shape == (n + 1,)
        assert (np.diff(s[:-1]) < 0).all()
        assert s[0] == np.float32(14.615) and s[-1] == 0.0


def test_ays_dispatch():
    from lightdiffusion_tpu.diffusion.parameterization import make_discrete_sampling
    from lightdiffusion_tpu.diffusion.schedules import (
        SCHEDULER_NAMES,
        calculate_sigmas,
    )

    ms = make_discrete_sampling()
    assert "ays" in SCHEDULER_NAMES and "ays_sdxl" in SCHEDULER_NAMES
    s = np.asarray(calculate_sigmas(ms, "ays", 10))
    assert s.shape == (12,) or s.shape == (11,)
