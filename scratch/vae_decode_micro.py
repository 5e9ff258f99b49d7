"""Measure VAE decode cost fp32 vs bf16 at SD1.5/XL shapes on-chip.

The pipeline defaults to fp32 decode (the reference's default; it enables
bf16 VAE on Ampere+ — TPU is bf16-native, so the same opt-in applies here).
This measures what a bf16 decode would save end-to-end, in-scan style:
several decodes dispatched back-to-back, one sync (relay-safe).
"""
import sys
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models import vae as V
from lightdiffusion_tpu.ops import layers as L


def bench_decode(params, cfg, policy, batch, hw, reps=8):
    vae = V.VAE(params, cfg, policy=policy)
    z = jax.random.normal(jax.random.PRNGKey(0), (batch, hw // 8, hw // 8, 4),
                          jnp.float32)
    img = vae.decode(z)
    float(np.asarray(img.ravel()[0]))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        img = vae.decode(z)
    float(np.asarray(img.ravel()[0]))
    dt = (time.perf_counter() - t0) / reps
    return dt, np.asarray(img, np.float32)


def main():
    sd = init_random(jax.random.PRNGKey(0))
    for batch, hw in ((4, 512), (1, 1024)):
        t32, img32 = bench_decode(sd.vae_params, sd.vae_config, L.FP32, batch, hw)
        t16, img16 = bench_decode(sd.vae_params, sd.vae_config, L.BF16, batch, hw)
        from lightdiffusion_tpu.utils.ssim import ssim
        s = float(np.asarray(ssim(img16, img32)).min())
        print(f"batch={batch} {hw}x{hw}: fp32 {t32*1000:.1f} ms, "
              f"bf16 {t16*1000:.1f} ms ({t32/t16:.2f}x), ssim={s:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
