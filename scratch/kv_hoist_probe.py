"""Marginal in-scan cost of the cross-attention K/V projections.

The text context is loop-invariant across all sampler steps, yet every
step recomputes to_k/to_v for all 16+1 transformer stacks.  Measure the
savings ceiling of hoisting them: time the full UNet step in a scan, vs
the same step PLUS a redundant recomputation of every attn2 to_k/to_v
projection (folded into the output at 1e-6 so XLA cannot DCE them).
marginal(B - A) ~= the per-step cost the hoist would remove.
"""
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.models import unet as U
from lightdiffusion_tpu.ops import layers as L

print("devices:", jax.devices(), flush=True)
policy = L.BF16


def collect_attn2_kv(node, out):
    if isinstance(node, dict):
        if "attn2" in node:
            out.append((node["attn2"]["to_k"], node["attn2"]["to_v"]))
        for v in node.values():
            collect_attn2_kv(v, out)
    elif isinstance(node, (list, tuple)):
        for v in node:
            collect_attn2_kv(v, out)


def bench(cfg, B, hw, ctx_dim, y_dim=None, n1=5, n2=20, label=""):
    params = U.init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    kvs = []
    collect_attn2_kv(params, kvs)
    print(f"{label}: {len(kvs)} attn2 kv pairs", flush=True)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, hw, hw, 4), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 77, ctx_dim),
                            jnp.bfloat16)
    t = jnp.full((B,), 500.0, jnp.float32)
    y = (jax.random.normal(jax.random.PRNGKey(3), (B, y_dim), jnp.bfloat16)
         if y_dim else None)

    def step_base(x):
        return U.apply_unet(params, x, t, ctx, y=y, cfg=cfg, policy=policy)

    def step_plus(x):
        eps = U.apply_unet(params, x, t, ctx, y=y, cfg=cfg, policy=policy)
        extra = 0.0
        for kp, vp in kvs:
            extra = extra + L.linear(kp, ctx, policy).mean()
            extra = extra + L.linear(vp, ctx, policy).mean()
        return eps + (extra * 1e-6).astype(eps.dtype)

    def make(fn, n):
        @jax.jit
        def many(x):
            def body(c, _):
                return c - 0.01 * fn(c), ()
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out
        return many

    def timed(many, reps=3):
        r = many(x0)
        float(np.asarray(r.ravel()[0], np.float32))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            r = many(x0)
            float(np.asarray(r.ravel()[0], np.float32))
            best = min(best, time.perf_counter() - t0)
        return best

    res = {}
    for name, fn in (("base", step_base), ("plus", step_plus)):
        t1, t2 = timed(make(fn, n1)), timed(make(fn, n2))
        res[name] = (t2 - t1) / (n2 - n1)
        print(f"  {name}: {res[name]*1e3:8.2f} ms/step", flush=True)
    d = res["plus"] - res["base"]
    print(f"  {label} kv-proj marginal: {d*1e3:+.2f} ms/step "
          f"({d/res['base']*100:+.1f}% of step)", flush=True)


bench(U.SD15_UNET, 8, 64, 768, label="SD1.5 512^2 CFG-B8")
if "--sdxl" in __import__("sys").argv:
    bench(U.SDXL_UNET, 2, 128, 2048, y_dim=2816, label="SDXL 1024^2 CFG-B2")
