"""E2E effect of the fused GEGLU FFN on the UNet step: in-scan marginal
timing with set_fused_ffn(True/False) + output parity.

  SD1.5 512^2 CFG batch 8, bf16; SDXL 1024^2 CFG batch 2, bf16.
"""
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops.ffn import set_fused_ffn

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
    raw_unet = U.apply_unet.__wrapped__ if hasattr(U.apply_unet, "__wrapped__") else U.apply_unet

    def step(c, params, ctx):
        return raw_unet(params, c, ts, ctx, y=y, cfg=cfg).astype(c.dtype)

    outs = {}
    for fused in (False, True):
        set_fused_ffn(fused)
        ms = scan_time(step, x, params, ctx)
        # NB: a fresh lambda per variant — jax.jit(step) with the same
        # function object reuses the first variant's executable (global
        # pjit cache), which made the delta read exactly 0.0.
        y0 = np.asarray(jax.block_until_ready(
            jax.jit(lambda a, b, c, _f=fused: step(a, b, c))(
                x, params, ctx)), np.float32)
        outs[fused] = (ms, y0)
        print(f"{name} fused={fused}: {ms:.2f} ms/step", flush=True)
    a, b = outs[False][1], outs[True][1]
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"{name}: speedup {outs[False][0] / outs[True][0]:.3f}x, "
          f"max rel delta {rel:.2e}", flush=True)
    set_fused_ffn(True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    run("SD1.5 512^2 B8", U.SD15_UNET, 8, 512)
    run("SDXL 1024^2 B2", U.SDXL_UNET, 2, 1024, adm=2816)
