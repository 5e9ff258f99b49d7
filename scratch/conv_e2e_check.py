"""On-chip validation of the Pallas conv dispatch:
1. the 128^2 x 320 UNet hires shape (extrapolated, not yet measured)
2. VAE decode e2e (fp32, batch 4, 512^2) with the kernel on vs off
3. numerical delta of a decode with the kernel on vs off
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


def scan_time(fn, x, *consts, n1=6, n2=24):
    def make(n):
        @jax.jit
        def many(x, consts):
            def body(c, _):
                y = fn(c, *consts)
                flat = y.reshape(-1)
                if flat.size < x.size:
                    flat = jnp.tile(flat, -(-x.size // flat.size))
                return flat[: x.size].reshape(x.shape).astype(x.dtype), ()
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out
        return many

    def timed(many, reps=3):
        r = many(x, consts)
        float(np.asarray(r.ravel()[0]))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            r = many(x, consts)
            float(np.asarray(r.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(make(n1)), timed(make(n2))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)

    import sys

    # --- 1. hires UNet level-0 shapes, bf16 ---
    from lightdiffusion_tpu.ops.conv_pallas import _conv3x3_fwd, _xla_conv
    shapes = [] if "--decode-only" in sys.argv else [
        (8, 128, 128, 320, 320),
        (2, 128, 128, 320, 320),
        (8, 128, 128, 640, 320)]
    for (B, H, W, cin, cout) in shapes:
        x = jax.random.normal(k, (B, H, W, cin), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        b = jax.random.normal(k, (cout,), jnp.bfloat16)
        fl = 2.0 * B * H * W * 9 * cin * cout
        t_x = scan_time(_xla_conv, x, w, b)
        t_p = scan_time(lambda x, w, b: _conv3x3_fwd(x, w, b, interpret=False),
                        x, w, b)
        print(f"{(B,H,W,cin,cout)} XLA {t_x*1e3:6.2f} ms {fl/t_x/1e12:6.1f} "
              f"TF/s | pallas {t_p*1e3:6.2f} ms {fl/t_p/1e12:6.1f} TF/s "
              f"({t_x/t_p:.2f}x)", flush=True)

    # --- 2+3. VAE decode e2e, fp32 batch-4 512^2 ---
    sd = init_random(jax.random.PRNGKey(0))
    vae = V.VAE(sd.vae_params, sd.vae_config, policy=L.FP32)
    z = jax.random.normal(k, (4, 64, 64, 4), jnp.float32)

    def dec(z):
        return V.decoder_apply(vae.params["decoder"], z, cfg=vae.cfg,
                               policy=vae.policy)

    CP.set_pallas_conv(False)
    V.decoder_apply.clear_cache()
    t_off = scan_time(dec, z, n1=2, n2=6)
    img_off = np.asarray(jax.jit(dec)(z), np.float32)
    CP.set_pallas_conv(True)
    V.decoder_apply.clear_cache()  # drop the flag-off traces
    t_on = scan_time(dec, z, n1=2, n2=6)
    img_on = np.asarray(jax.jit(dec)(z), np.float32)
    print(f"decode fp32 b4 512^2: XLA {t_off*1e3:.1f} ms | pallas "
          f"{t_on*1e3:.1f} ms ({t_off/t_on:.2f}x)", flush=True)
    d = np.abs(img_on - img_off).max()
    rel = d / max(np.abs(img_off).max(), 1e-9)
    print(f"decode max abs delta {d:.3e} (rel {rel:.3e})", flush=True)


if __name__ == "__main__":
    main()
