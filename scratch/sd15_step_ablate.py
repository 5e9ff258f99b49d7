"""Whole-step ablation for the SD1.5 512^2 UNet eval (CFG batch 8).

NOTES_ROUND3 attribution summed micro rows to 46 ms of a 65.6 ms step,
leaving ~19.6 ms "diffuse elementwise/copies". This measures the REAL
apply_unet with pieces ablated in place (monkeypatched shape-preserving
no-ops), in-scan marginal timing, so the gap is attributed by difference:

  full                 - no_transformers      = all SpatialTransformer cost
  full                 - attn_identity        = bare attention cost
  full                 - no_res_norm_act      = resblock GN+SiLU cost
  full                 - concat_free          = skip-concat materialization
  full                 - no_upsample_repeat   = nearest-x2 repeat cost
"""
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L

B = 8
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

    t1, t2 = timed(make(N1)), timed(make(N2))
    return max((t2 - t1) / (N2 - N1), 1e-9)


def main():
    print("devices:", jax.devices(), flush=True)
    sd = init_random(jax.random.PRNGKey(0))
    params = sd.unet_params
    cfg = sd.unet_config
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, 64, 64, 4), jnp.float32)
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)
    ts = jnp.full((B,), 500.0, jnp.float32)

    # apply_unet is jit-wrapped with a persistent trace cache; go through
    # __wrapped__ so each variant's monkeypatch is actually retraced.
    raw_unet = U.apply_unet.__wrapped__

    def step(x, params, ctx):
        return raw_unet(params, x, ts, ctx, cfg=cfg).astype(x.dtype)

    orig_st = U.spatial_transformer_apply
    orig_res = U.resblock_apply
    orig_up = U.upsample_apply
    orig_attn = U.cross_attention_apply

    def measure(label):
        # NOTE: apply_unet is jit-wrapped; closure over module fns happens
        # at trace time, and scan_time jits a fresh program per variant.
        t = scan_time(step, x, params, ctx)
        print(f"{label:32s} {t*1e3:7.2f} ms", flush=True)
        return t

    full = measure("full step")

    # ---- transformers entirely removed ----
    U.spatial_transformer_apply = (
        lambda p, h, context, num_heads, policy, force=None, **kw: h)
    no_tf = measure("no spatial transformers")
    U.spatial_transformer_apply = orig_st

    # ---- bare attention -> identity on q (projections etc. kept) ----
    def attn_id(p, x_, context, num_heads, policy, force=None):
        q = L.linear(p["to_q"], x_, policy)
        k = L.linear(p["to_k"], context, policy)
        v = L.linear(p["to_v"], context, policy)
        out = q + k.mean(axis=1, keepdims=True) + v.mean(axis=1, keepdims=True)
        return L.linear(p["to_out"], out, policy)
    U.cross_attention_apply = attn_id
    no_attn = measure("attention -> identity")
    U.cross_attention_apply = orig_attn

    # ---- resblock without GN+SiLU (convs kept) ----
    def res_nonorm(p, x_, emb, policy):
        h = L.conv2d(p["in_conv"], x_, policy=policy)
        emb_out = L.linear(p["emb"], emb, policy)
        h = h + emb_out[:, None, None, :]
        h = L.conv2d(p["out_conv"], h, policy=policy)
        if "skip" in p:
            x_ = L.conv2d(p["skip"], x_, policy=policy)
        return x_ + h
    U.resblock_apply = res_nonorm
    no_norm = measure("resblocks w/o GN+SiLU")
    U.resblock_apply = orig_res

    # ---- upsample without the repeat (conv on pre-broadcast trick) ----
    def up_norepeat(p, x_, policy, output_shape=None):
        b, h, w, c = x_.shape
        th, tw = (output_shape if output_shape else (h * 2, w * 2))
        x2 = jnp.broadcast_to(x_[:, :, None, :, None, :],
                              (b, h, 2, w, 2, c)).reshape(b, h * 2, w * 2, c)
        x2 = x2[:, :th, :tw]
        return L.conv2d(p["conv"], x2, policy=policy)
    U.upsample_apply = up_norepeat
    up_bcast = measure("upsample via broadcast")
    U.upsample_apply = orig_up

    # ---- skip-concat replaced by a read-free same-shape broadcast ----
    # Scope the patch to the unet module by swapping its `jnp` binding for a
    # proxy (patching jnp.concatenate itself would leak into ops.layers).
    class _JnpProxy:
        def __getattr__(self, name):
            return getattr(jnp, name)

        @staticmethod
        def concatenate(arrs, axis=-1):
            if axis in (-1, 3) and len(arrs) == 2 and arrs[0].ndim == 4:
                h_, s_ = arrs
                bb, hh, ww, c1 = h_.shape
                c2 = s_.shape[-1]
                return jnp.broadcast_to(h_[..., :1],
                                        (bb, hh, ww, c1 + c2)).astype(h_.dtype)
            return jnp.concatenate(arrs, axis=axis)

    U.jnp = _JnpProxy()
    no_cat = measure("skip concat -> broadcast")
    U.jnp = jnp

    def up_id(p, x_, policy, output_shape=None):
        b, h, w, c = x_.shape
        th, tw = (output_shape if output_shape else (h * 2, w * 2))
        x2 = jnp.zeros((b, th, tw, c), x_.dtype) + x_.mean()
        return L.conv2d(p["conv"], x2, policy=policy)
    U.upsample_apply = up_id
    up_zero = measure("upsample repeat -> fill")
    U.upsample_apply = orig_up

    print("\n---- attribution (ms of the full step) ----", flush=True)
    print(f"transformers total        {(full-no_tf)*1e3:7.2f}", flush=True)
    print(f"bare attention            {(full-no_attn)*1e3:7.2f}", flush=True)
    print(f"resblock GN+SiLU          {(full-no_norm)*1e3:7.2f}", flush=True)
    print(f"skip concat               {(full-no_cat)*1e3:7.2f}", flush=True)
    print(f"upsample bcast saves      {(full-up_bcast)*1e3:7.2f}", flush=True)
    print(f"upsample repeat cost      {(full-up_zero)*1e3:7.2f}", flush=True)


if __name__ == "__main__":
    main()
