"""On-chip numerics check for the new s=1024 flash dispatch shapes, plus a
quick SDXL UNet-step timing before/after comparison."""
import time

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_tpu.ops.attention import attention

print("devices:", jax.devices(), flush=True)
k0 = jax.random.PRNGKey(0)

for (b, h, s, d) in [(2, 20, 1024, 64), (2, 8, 1024, 80), (8, 8, 1024, 80)]:
    ks = jax.random.split(k0, 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    a_auto = np.asarray(jax.jit(attention)(q, k, v), np.float32)
    a_xla = np.asarray(
        jax.jit(lambda q, k, v: attention(q, k, v, force="xla"))(q, k, v),
        np.float32,
    )
    diff = np.abs(a_auto - a_xla).max()
    rel = diff / (np.abs(a_xla).max() + 1e-9)
    print(f"b{b} h{h} s{s} d{d}: max|auto-xla|={diff:.5f} rel={rel:.2e}",
          flush=True)

# SDXL one-step denoiser timing (20 chained steps in-scan)
from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models.unet import SDXL_UNET, apply_unet
from lightdiffusion_tpu.ops import layers as L

sdx = init_random(jax.random.PRNGKey(1), unet_config=SDXL_UNET)
params = sdx.unet_params
cfgm = sdx.unet_config
kc, kp = jax.random.split(jax.random.PRNGKey(2))
ctx = jax.random.normal(kc, (2, 77, 2048), jnp.bfloat16) * 0.3
adm = jax.random.normal(kp, (2, cfgm.adm_in_channels), jnp.bfloat16) * 0.3
x = jax.random.normal(k0, (2, 128, 128, 4), jnp.bfloat16)
t = jnp.full((2,), 500.0, jnp.float32)


@jax.jit
def many(params, x, ctx, adm):
    def body(c, _):
        y = apply_unet(params, c, t, ctx, y=adm, cfg=cfgm, policy=L.BF16)
        return y.astype(c.dtype), ()
    out, _ = jax.lax.scan(body, x, None, length=20)
    return out


r = many(params, x, ctx, adm)
float(np.asarray(r.ravel()[0]))
t0 = time.perf_counter()
for _ in range(3):
    r = many(params, x, ctx, adm)
float(np.asarray(r.ravel()[0]))
dt = (time.perf_counter() - t0) / 3 / 20
print(f"SDXL CFG-batch-2 UNet step: {dt*1000:.1f} ms (was ~150 pre-dispatch-fix)",
      flush=True)
