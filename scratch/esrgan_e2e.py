"""Full ESRGAN x4 pass on-chip (random RRDBNet-23, fp32, 512^2 input):
lane-packed dense blocks vs the plain conv path.
"""
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.models import esrgan as E


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = E.ESRGANConfig(num_blocks=23, num_feat=64, scale=4)
    params = E.init_esrgan_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 512, 3),
                           jnp.float32)

    outs = {}
    for mode in (False, True):
        E.set_packed_rdb(mode)
        E.esrgan_apply.clear_cache()
        t0 = time.perf_counter()
        y = E.esrgan_apply(params, x, cfg)
        float(np.asarray(y.ravel()[0]))
        print(f"packed={mode}: compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            y = E.esrgan_apply(params, x, cfg)
            float(np.asarray(y.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        outs[mode] = np.asarray(y, np.float32)
        print(f"packed={mode}: 512^2 -> 2048^2 fp32 pass {best*1e3:.0f} ms",
              flush=True)
    E.set_packed_rdb(None)
    d = np.abs(outs[True] - outs[False]).max()
    print(f"max abs delta packed vs plain: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
