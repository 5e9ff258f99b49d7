"""Measure the composed DeepCache x uncond_interval stack at SDXL width
(1024^2 batch-1, same shapes as bench.bench_sdxl): dual vs the DC-3+ToDo-4
anchor. One-off scratch run."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models.unet import SDXL_UNET
from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.pipelines.sd import SDPipeline
from lightdiffusion_tpu.utils.ssim import ssim


def log(*a):
    print(*a, flush=True)


t0 = time.perf_counter()
sdx = init_random(jax.random.PRNGKey(1), unet_config=SDXL_UNET)
pipex = SDPipeline(sdx, policy=L.BF16)
log(f"init_random SDXL: {time.perf_counter()-t0:.1f}s")
kc, kp = jax.random.split(jax.random.PRNGKey(2))
cond = (jax.random.normal(kc, (1, 77, 2048), jnp.float32) * 0.3,
        jax.random.normal(kp, (1, 1280), jnp.float32) * 0.3)
neg = (jnp.zeros((1, 77, 2048), jnp.float32),
       jnp.zeros((1, 1280), jnp.float32))
latent = pipex.empty_latent(1024, 1024, 1)


def runx(seed, **skw):
    out = pipex.sample_latent(
        latent, cond, neg, seed=seed, steps=20, cfg=7.0,
        sampler_name="euler_ancestral", scheduler="karras", **skw,
    )
    return pipex.decode(out)


def timed(label, reps=2, groups=2, **skw):
    img = runx(0, **skw)  # compile + warm
    float(np.asarray(img.ravel()[0]))
    times = []
    for gi in range(groups):
        t0 = time.perf_counter()
        for i in range(reps):
            img = runx(gi * reps + i + 1, **skw)
        float(np.asarray(img.ravel()[0]))
        times.append((time.perf_counter() - t0) / reps)
    m = float(np.mean(times))
    log(f"{label}: {60.0/m:.2f} img/min/chip ({m*1000:.0f} ± "
        f"{float(np.std(times))*1000:.0f} ms/image)")
    return m, np.asarray(runx(777, **skw), np.float32)


base, img_base = timed("SDXL base")
rows = [
    ("SDXL DC-3", 0, {"deepcache_interval": 3}),
    ("SDXL DC-3+ui-2", 0, {"deepcache_interval": 3, "uncond_interval": 2}),
    ("SDXL DC-3+ToDo-4@1024 (anchor)", 4, {"deepcache_interval": 3}),
    ("SDXL DC-3+ui-2+ToDo-4@1024", 4,
     {"deepcache_interval": 3, "uncond_interval": 2}),
    ("SDXL DC-4+ui-2+ToDo-4@1024", 4,
     {"deepcache_interval": 4, "uncond_interval": 2}),
]
for label, todo, skw in rows:
    pipex.set_todo(todo, min_tokens=1024)
    m, img = timed(label, **skw)
    s = float(np.asarray(ssim(img, img_base)).min())
    log(f"  -> {base/m:.2f}x speedup, ssim={s:.4f}")
pipex.set_todo(0)
