"""SDXL batch-4 serving-regime attribution (VERDICT r4 #4).

Where does SDXL batch-4 pipelined's missing scaling go? r4 measured 1.08x
batch-1 (2550 vs 2758 ms/image) with four SEQUENTIAL full-res fp32 VAE
decodes inside the timed loop. Separate the parts:

  (a) 20-step sampler scan alone (batch 4, CFG batch 8), per image
  (b) per-sample fp32 VAE decode x4, per image
  (c) per-sample bf16 VAE decode x4 (the reference's own policy on capable
      GPUs, ref :1508-1526; bf16 keeps fp32 exponent range so the fp16
      overflow hazard does not apply), + SSIM vs fp32
  (d) full-batch bf16 decode (half the activation memory of the fp32 batch
      decode that OOMs at ~8.6 GB), if it fits

Run ALONE on the chip (one TPU process at a time).
"""

import sys
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models.unet import SDXL_UNET
from lightdiffusion_tpu.models import vae as V
from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.pipelines.sd import SDPipeline
from lightdiffusion_tpu.utils.ssim import ssim


def log(*a):
    print(*a, file=sys.stderr, flush=True)


NB = 4
sdx = init_random(jax.random.PRNGKey(1), unet_config=SDXL_UNET)
pipex = SDPipeline(sdx, policy=L.BF16)
vae_bf16 = V.VAE(sdx.vae_params, sdx.vae_config, policy=L.BF16)

kc, kp = jax.random.split(jax.random.PRNGKey(2))
cond = (jnp.tile(jax.random.normal(kc, (1, 77, 2048), jnp.float32) * 0.3,
                 (NB, 1, 1)),
        jnp.tile(jax.random.normal(kp, (1, 1280), jnp.float32) * 0.3,
                 (NB, 1)))
neg = (jnp.zeros((NB, 77, 2048), jnp.float32),
       jnp.zeros((NB, 1280), jnp.float32))
latent = pipex.empty_latent(1024, 1024, NB)


def sample(seed):
    return pipex.sample_latent(
        latent, cond, neg, seed=seed, steps=20, cfg=7.0,
        sampler_name="euler_ancestral", scheduler="karras")


def timed(label, fn, reps=3, per=1):
    out = fn(0)
    float(np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[0]))
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(i + 1)
        float(np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    log(f"{label}: {best*1000/per:.0f} ms/image (best of {reps})")
    return best / per, out


# (a) sampler alone
t_samp, lat_out = timed("sampler scan 20-step batch-4", sample, per=NB)

# (b) per-sample fp32 decode
t_f32, _ = timed(
    "fp32 decode x4 per-sample",
    lambda s: [np.asarray(pipex.decode(lat_out[i:i + 1])) for i in range(NB)],
    per=NB)

# (c) per-sample bf16 decode + quality
t_bf16, _ = timed(
    "bf16 decode x4 per-sample",
    lambda s: [np.asarray(vae_bf16.decode_safe(lat_out[i:i + 1]))
               for i in range(NB)],
    per=NB)
img_f32 = np.asarray(pipex.decode(lat_out[:1]), np.float32)
img_bf16 = np.asarray(vae_bf16.decode_safe(lat_out[:1]), np.float32)
s = float(np.asarray(ssim(img_bf16, img_f32)).min())
log(f"bf16-vs-fp32 decode ssim: {s:.4f} "
    f"{'PASS' if s >= 0.95 else 'FLAGGED(<0.95)'}")

# (d) full-batch bf16 decode
try:
    t_batch, _ = timed(
        "bf16 decode full batch-4",
        lambda s: np.asarray(vae_bf16.decode(lat_out)), per=NB)
except Exception as e:
    log(f"full-batch bf16 decode failed: {type(e).__name__}: {e}")
    t_batch = None

log("-- attribution --")
log(f"sampler {t_samp*1000:.0f} + fp32 decode {t_f32*1000:.0f} "
    f"= {1000*(t_samp+t_f32):.0f} ms/img (r4 measured 2550 pipelined)")
log(f"with bf16 per-sample decode: {1000*(t_samp+t_bf16):.0f} ms/img "
    f"-> {60/(t_samp+t_bf16):.2f} img/min")
if t_batch is not None:
    log(f"with bf16 batch decode:      {1000*(t_samp+t_batch):.0f} ms/img "
        f"-> {60/(t_samp+t_batch):.2f} img/min")

# ---- SD1.5 512² headline regime: same decode-policy question at batch 4.
# The fp32 batch-4 decode rides inside the 365 ms/img headline; how much
# would bf16 decode shave, and does it gate?
del sdx, pipex, vae_bf16, lat_out
import gc
gc.collect()

sd15 = init_random(jax.random.PRNGKey(0))
pipe15 = SDPipeline(sd15, policy=L.BF16, clip_skip=-2)
vae15_bf16 = V.VAE(sd15.vae_params, sd15.vae_config, policy=L.BF16)
lat15 = jax.random.normal(jax.random.PRNGKey(3), (4, 64, 64, 4),
                          jnp.float32)

t15_f32, _ = timed("SD1.5 fp32 decode batch-4 512^2",
                   lambda s: np.asarray(pipe15.decode(lat15)), per=4, reps=5)
t15_bf16, _ = timed("SD1.5 bf16 decode batch-4 512^2",
                    lambda s: np.asarray(vae15_bf16.decode(lat15)),
                    per=4, reps=5)
i15_f = np.asarray(pipe15.decode(lat15), np.float32)
i15_b = np.asarray(vae15_bf16.decode(lat15), np.float32)
s15 = float(np.asarray(ssim(i15_b, i15_f)).min())
log(f"SD1.5 bf16-vs-fp32 decode ssim: {s15:.4f}; saves "
    f"{(t15_f32-t15_bf16)*1000:.1f} ms/img of the 365 ms/img headline")
