"""Tune the fused-FFN dispatch gate per channel width: time the full UNet
step under several gate policies (in-scan marginal timing).

Policies:
  off        — no fusion anywhere
  all        — current _pick_blocks (bm in {1024,512}, 12M cap)
  c320       — fuse only C==320 blocks (SD1.5/hires level-0)
  big-bm     — bm=1024 required, cap raised to 14M (lets C=640 ride
               bm=1024/bn=128 instead of bm=512)
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
_ORIG = ffn._pick_blocks


def pick_c320(M, C, inner, itemsize):
    return _ORIG(M, C, inner, itemsize) if C == 320 else None


def pick_bigbm(M, C, inner, itemsize):
    for bm in (1024,):
        if M % bm or (M // bm) < 8:
            continue
        for bn in (256, 128):
            if inner % bn:
                continue
            est = (2 * bm * C * itemsize + bm * C * itemsize
                   + 2 * 2 * C * bn * itemsize + 2 * bn * C * itemsize
                   + bm * C * 4 + 2 * bm * bn * 4 + 2 * bm * C * itemsize)
            if est <= 14 * 1024 * 1024:
                return bm, bn
    return None


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

    for pol_name, enabled, picker in (
        ("off", False, _ORIG),
        ("all", True, _ORIG),
        ("c320", True, pick_c320),
        ("big-bm", True, pick_bigbm),
    ):
        ffn.set_fused_ffn(enabled)
        ffn._pick_blocks = picker
        ms = scan_time(step, x, params, ctx)
        print(f"{name} [{pol_name}]: {ms:.2f} ms/step", flush=True)
    ffn._pick_blocks = _ORIG
    ffn.set_fused_ffn(True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    run("SD1.5 512^2 B8", U.SD15_UNET, 8, 512)
    run("SDXL 1024^2 B2", U.SDXL_UNET, 2, 1024, adm=2816)
    # hires regime: SD1.5 at 1024^2, B2 CFG — level-0 is 16k tokens C=320
    run("SD1.5 1024^2 B2", U.SD15_UNET, 2, 1024)
