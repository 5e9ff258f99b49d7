"""Disambiguate the fused-FFN win/loss factor: per-sample token volume
(S*C) vs CFG batch size. Cells:

  SD1.5 512^2 B2  — (S=4096,C=320,M=8192): S*C small, B small
  SDXL 1024^2 B8  — (S=4096,C=640,M=32768): S*C big,   B big

If SD1.5-B2 wins and SDXL-B8 loses -> gate on S*C. If the reverse ->
gate on M (batch). Policies off/all only.
"""
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import ffn

N1, N2 = 5, 20


def scan_time(fn, x, *consts):
    def make(n):
        @jax.jit
        def many(x, consts):
            def body(c, _):
                y = fn(c, *consts)
                flat = y.reshape(-1)
                if flat.size < x.size:
                    flat = jnp.tile(flat, -(-x.size // flat.size))
                return flat[: x.size].reshape(x.shape).astype(x.dtype), None

            out, _ = jax.lax.scan(body, x, None, length=n)
            return out

        return many

    f1, f2 = make(N1), make(N2)
    consts = tuple(consts)
    np.asarray(jax.block_until_ready(f1(x, consts))[(0,) * x.ndim])
    np.asarray(jax.block_until_ready(f2(x, consts))[(0,) * x.ndim])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(f1(x, consts))[(0,) * x.ndim])
        t1 = time.perf_counter()
        np.asarray(jax.block_until_ready(f2(x, consts))[(0,) * x.ndim])
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (N2 - N1))
    return best * 1e3


def run(name, cfg, B, res, adm=None):
    key = jax.random.PRNGKey(0)
    sd = init_random(key, unet_config=cfg)
    params = sd.unet_params
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (B, res // 8, res // 8, 4), jnp.bfloat16)
    ts = jnp.full((B,), 500.0, jnp.float32)
    ctx = jax.random.normal(k, (B, 77, cfg.context_dim), jnp.bfloat16)
    y = (jax.random.normal(k, (B, adm), jnp.bfloat16)
         if adm is not None else None)
    raw = (U.apply_unet.__wrapped__
           if hasattr(U.apply_unet, "__wrapped__") else U.apply_unet)

    def step(c, params, ctx):
        return raw(params, c, ts, ctx, y=y, cfg=cfg).astype(c.dtype)

    for pol_name, enabled in (("off", False), ("all", True)):
        ffn.set_fused_ffn(enabled)
        ms = scan_time(step, x, params, ctx)
        print(f"{name} [{pol_name}]: {ms:.2f} ms/step", flush=True)
    ffn.set_fused_ffn(True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    run("SD1.5 512^2 B2", U.SD15_UNET, 2, 512)
    run("SDXL 1024^2 B8", U.SDXL_UNET, 8, 1024, adm=2816)
