"""Decompose SDXL 1024² UNet step time on-chip (round-3 perf investigation).

Measured question: SDXL CFG step = 155 ms at batch 1 → ~85 TFLOP/s (43% of
the 199 TFLOP/s the SD1.5 loop sustains). Where does the time go, and does
batch>1 or attention-backend choice close the gap?

Stages (argv): "micro" = attention/matmul/conv micros only;
"unet" = full-UNet sweep; default = both. Params are passed as a jit
ARGUMENT (not closed over) — baking 5.14 GB of constants into the program
made compiles exceed 10 minutes.
"""
import dataclasses
import sys
import time

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_tpu.models.unet import SDXL_UNET, apply_unet, init_unet_params
from lightdiffusion_tpu.ops import layers as L
from lightdiffusion_tpu.ops.attention import attention
from lightdiffusion_tpu.runtime.timing import benchmark

print("devices:", jax.devices(), flush=True)
policy = L.BF16
stage = sys.argv[1] if len(sys.argv) > 1 else "both"


def tl(label, secs, flops=None):
    msg = f"{label:55s} {secs*1e3:9.3f} ms"
    if flops:
        msg += f"  {flops/secs/1e12:7.1f} TFLOP/s"
    print(msg, flush=True)


if stage in ("micro", "both"):
    # ---- attention microbenches at the SDXL shapes ----
    print("-- attention micro --", flush=True)
    for (b, h, s, t_kv, d, label) in [
        (2, 10, 4096, 4096, 64, "lvl1 self  (642, 640ch)"),
        (2, 10, 4096, 77, 64, "lvl1 cross (kv=77)"),
        (2, 20, 1024, 1024, 64, "lvl2 self  (322, 1280ch)"),
        (2, 20, 1024, 77, 64, "lvl2 cross (kv=77)"),
        (8, 20, 1024, 1024, 64, "lvl2 self  B8"),
    ]:
        q = jax.random.normal(jax.random.PRNGKey(4), (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(5), (b, h, t_kv, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(6), (b, h, t_kv, d), jnp.bfloat16)
        fl = 4.0 * b * h * s * t_kv * d

        t = benchmark(lambda q, k, v: attention(q, k, v, force="xla"), q, k, v,
                      iters=20, warmup=3)
        tl(f"{label} XLA", t, fl)
        if t_kv % 256 == 0:
            t = benchmark(lambda q, k, v: attention(q, k, v, force="flash"),
                          q, k, v, iters=20, warmup=3)
            tl(f"{label} flash(d_pad=128)", t, fl)
        t = benchmark(lambda q, k, v: attention(q, k, v), q, k, v,
                      iters=20, warmup=3)
        tl(f"{label} dispatcher-default", t, fl)

    # ---- FF / linear microbenches (the depth-10 stack is 60+ blocks) ----
    print("-- matmul micro --", flush=True)
    for (m, kk, n, label) in [
        (2 * 1024, 1280, 10240, "lvl2 ff_in  (B2)"),
        (2 * 1024, 5120, 1280, "lvl2 ff_out (B2)"),
        (2 * 1024, 1280, 1280, "lvl2 qkv/proj (B2)"),
        (8 * 1024, 1280, 10240, "lvl2 ff_in  (B8)"),
        (2 * 4096, 640, 5120, "lvl1 ff_in  (B2)"),
    ]:
        a = jax.random.normal(jax.random.PRNGKey(7), (m, kk), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(8), (kk, n), jnp.bfloat16)
        t = benchmark(lambda a, w: a @ w, a, w, iters=30, warmup=3)
        tl(f"{label} {m}x{kk}x{n}", t, 2.0 * m * kk * n)

    # ---- conv microbenches ----
    print("-- conv micro --", flush=True)
    for (b, hw, c_in, c_out, label) in [
        (2, 128, 320, 320, "lvl0 res conv (B2)"),
        (8, 128, 320, 320, "lvl0 res conv (B8)"),
        (2, 64, 640, 640, "lvl1 res conv (B2)"),
        (2, 32, 1280, 1280, "lvl2 res conv (B2)"),
    ]:
        x = jax.random.normal(jax.random.PRNGKey(9), (b, hw, hw, c_in), jnp.bfloat16)
        wp = {"weight": jax.random.normal(jax.random.PRNGKey(10),
                                          (3, 3, c_in, c_out), jnp.bfloat16) * 0.02,
              "bias": jnp.zeros((c_out,), jnp.bfloat16)}
        t = benchmark(lambda x, wp: L.conv2d(wp, x, policy=policy), x, wp,
                      iters=20, warmup=3)
        tl(f"{label} {hw}2x{c_in}->{c_out}", t, 2.0 * b * hw * hw * 9 * c_in * c_out)

    # ---- groupnorm (HBM-bound suspects) ----
    print("-- norm micro --", flush=True)
    for (b, hw, c, label) in [(2, 128, 320, "lvl0 GN (B2)"),
                              (2, 32, 1280, "lvl2 GN (B2)")]:
        x = jax.random.normal(jax.random.PRNGKey(11), (b, hw, hw, c), jnp.bfloat16)
        gp = {"weight": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
        t = benchmark(lambda x, gp: L.group_norm(gp, x, eps=1e-5, policy=policy),
                      x, gp, iters=30, warmup=3)
        byts = 2 * b * hw * hw * c * 2
        print(f"{label:55s} {t*1e3:9.3f} ms  {byts/t/1e9:7.1f} GB/s", flush=True)

if stage in ("unet", "both"):
    t0 = time.perf_counter()
    params = init_unet_params(jax.random.PRNGKey(0), SDXL_UNET, dtype=jnp.bfloat16)
    n_par = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"init {time.perf_counter()-t0:.1f}s params {n_par/1e9:.2f}B", flush=True)

    variants = [("default", SDXL_UNET), ("attn=xla", dataclasses.replace(SDXL_UNET, attn_force="xla"))]
    for b in (2, 4, 8):
        x = jax.random.normal(jax.random.PRNGKey(1), (b, 128, 128, 4), jnp.bfloat16)
        ts = jnp.full((b,), 500.0, jnp.float32)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 2048), jnp.bfloat16)
        y = jax.random.normal(jax.random.PRNGKey(3), (b, 2816), jnp.bfloat16)
        # cost_analysis (r3 session): 13.14 TFLOP per CFG(B=2) UNet step
        fl = 13.14e12 / 2 * b
        for vname, cfg in variants:
            def fwd(x, params):
                return apply_unet(params, x, ts, ctx, y=y, cfg=cfg, policy=policy)
            t = benchmark(fwd, x, params, iters=6, warmup=2)
            tl(f"UNet full fwd B={b} {vname}", t, fl)
