"""Whole-UNet in-scan roofline check at SD1.5 512² serving shapes.

Post-GroupNorm-rewrite sanity: is the UNet eval actually near the MXU
roofline, or was NOTES_ROUND1's 199 TF/s figure an artifact of the old
measurement? Times unet_apply at CFG batch 8 (the batch-4 serving shape)
via scan-length ablation and divides by cost_analysis FLOPs.
"""
import sys
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.runtime.profiling import cost_analysis

policy = L.BF16
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
HW = 64

sd = init_random(jax.random.PRNGKey(0))
params = jax.tree.map(lambda a: a.astype(policy.param_dtype), sd.unet_params)
cfg = sd.unet_config

k = jax.random.PRNGKey(1)
x = jax.random.normal(k, (B, HW, HW, 4), jnp.float32)
t_emb = jnp.full((B,), 500.0, jnp.float32)
ctx = jax.random.normal(k, (B, 77, 768), jnp.float32) * 0.3


def eval_once(x, params, ctx):
    return U.apply_unet(params, x, t_emb, ctx, cfg=cfg, policy=policy)


# FLOPs of one eval
try:
    fl = cost_analysis(jax.jit(eval_once), x, params, ctx)["flops"]
    print(f"cost_analysis flops/eval: {fl/1e12:.3f} TFLOP (batch {B})",
          flush=True)
except Exception as e:
    fl = None
    print("cost_analysis failed:", e, flush=True)


def make(n):
    @jax.jit
    def many(x, params, ctx):
        def body(c, _):
            y = eval_once(c, params, ctx)
            return y.astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return many


def timed(f, reps=3):
    r = f(x, params, ctx)
    float(np.asarray(r.ravel()[0]))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(x, params, ctx)
        float(np.asarray(r.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    return best


n1, n2 = 4, 16
t1, t2 = timed(make(n1)), timed(make(n2))
per = (t2 - t1) / (n2 - n1)
print(f"unet eval (batch {B}): {per*1000:.2f} ms marginal", flush=True)
if fl:
    print(f"-> {fl/per/1e12:.1f} TF/s (v5e bf16 peak ~197)", flush=True)
