"""Is fusing self-attention q/k/v (and cross k/v) projections worth it?

Compares 3x (M,C)@(C,C) vs 1x (M,C)@(C,3C) at SDXL/SD1.5 transformer shapes,
in-scan marginal timing (relay overhead cancels).
"""
import time

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)
N1, N2 = 40, 200
k0 = jax.random.PRNGKey(0)


def scan_time(fn, x, consts):
    def make(n):
        @jax.jit
        def many(x, consts):
            def body(c, _):
                y = fn(c, consts)
                return y.astype(c.dtype), ()
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out
        return many

    def timed(many, reps=3):
        r = many(x, consts)
        float(np.asarray(r.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = many(x, consts)
        float(np.asarray(r.ravel()[0]))
        return (time.perf_counter() - t0) / reps

    t1, t2 = timed(make(N1)), timed(make(N2))
    return max((t2 - t1) / (N2 - N1), 1e-9)


# self-attn qkv: x (B*S, C); out must keep full dependency on all 3 products
for (m, c, label) in [
    (2 * 1024, 1280, "SDXL 32^2 qkv C=1280"),
    (2 * 4096, 640, "SDXL 64^2 qkv C=640"),
    (2 * 1024, 640, "SD15 32^2 qkv C=640"),
    (8 * 1024, 1280, "SDXL b8 32^2 qkv C=1280"),
]:
    x = jax.random.normal(k0, (m, c), jnp.bfloat16)
    w1 = jax.random.normal(k0, (c, c), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(1), (c, c), jnp.bfloat16) * 0.02
    w3 = jax.random.normal(jax.random.PRNGKey(2), (c, c), jnp.bfloat16) * 0.02
    wf = jnp.concatenate([w1, w2, w3], axis=1)

    def sep(xc, ws):
        a, b_, c_ = ws
        return xc @ a + (xc @ b_) * 0.5 + (xc @ c_) * 0.25

    def fus(xc, wf):
        y = xc @ wf
        q, k, v = jnp.split(y, 3, axis=1)
        return q + k * 0.5 + v * 0.25

    ts = scan_time(sep, x, (w1, w2, w3))
    tf = scan_time(fus, x, wf)
    print(f"{label:28s} sep {ts*1e6:7.1f}us  fused {tf*1e6:7.1f}us "
          f"  speedup {ts/tf:.2f}x", flush=True)

# cross kv: context (B*77, ctx) @ (ctx, C) x2 vs (ctx, 2C)
for (m, ctx, c, label) in [
    (2 * 77, 2048, 1280, "SDXL cross kv ctx2048->1280"),
    (2 * 77, 768, 640, "SD15 cross kv ctx768->640"),
]:
    x = jax.random.normal(k0, (m, ctx), jnp.bfloat16)
    w1 = jax.random.normal(k0, (ctx, c), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(1), (ctx, c), jnp.bfloat16) * 0.02
    wf = jnp.concatenate([w1, w2], axis=1)

    # carry is the (m, c) output; fold it back into the (m, ctx) input so
    # the matmul can't be hoisted out of the scan (carry c <= ctx here)
    def sep2(cr, ws):
        a, b_, xc = ws
        xin = xc + jnp.pad(cr, ((0, 0), (0, ctx - c))) * 0.01
        return xin @ a + (xin @ b_) * 0.5

    def fus2(cr, ws):
        wf, xc = ws
        xin = xc + jnp.pad(cr, ((0, 0), (0, ctx - c))) * 0.01
        y = xin @ wf
        k, v = jnp.split(y, 2, axis=1)
        return k + v * 0.5

    c0 = jnp.zeros((m, c), jnp.bfloat16)
    ts = scan_time(sep2, c0, (w1, w2, x))
    tf = scan_time(fus2, c0, (wf, x))
    print(f"{label:28s} sep {ts*1e6:7.1f}us  fused {tf*1e6:7.1f}us "
          f"  speedup {ts/tf:.2f}x", flush=True)
