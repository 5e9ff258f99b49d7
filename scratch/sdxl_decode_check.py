"""Validate SDXL-scale fp32 1024^2 VAE decode with the Pallas conv gate:
must compile without VMEM OOM (no tiled fallback) and beat the XLA path.
"""
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models import vae as V
from lightdiffusion_tpu.ops import conv_pallas as CP
from lightdiffusion_tpu.ops import layers as L


def main():
    print("devices:", jax.devices(), flush=True)
    sd = init_random(jax.random.PRNGKey(0))
    vae = V.VAE(sd.vae_params, sd.vae_config, policy=L.FP32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 4),
                          jnp.float32)

    def dec(z):
        return V.decoder_apply(vae.params["decoder"], z, cfg=vae.cfg,
                               policy=vae.policy)

    for flag in (False, True):
        CP.set_pallas_conv(flag)
        V.decoder_apply.clear_cache()
        f = jax.jit(dec)
        img = f(z)
        float(np.asarray(img.ravel()[0]))
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            img = f(z)
            float(np.asarray(img.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        print(f"pallas={flag}: 1024^2 fp32 decode {best*1e3:.1f} ms "
              f"finite={bool(np.isfinite(np.asarray(img)).all())}",
              flush=True)
    CP.set_pallas_conv(True)


if __name__ == "__main__":
    main()
