"""Pin down the flash-vs-XLA attention crossover on v5e.

Question from sdxl_scan_micro.py: at s=1024, XLA attention is 2.7x slower
than the Pallas flash kernel for SDXL's (h=20, d=64) shape but marginally
faster for SD1.5's (h=8, d=80). Is that driven by head_dim (64 vs 80: lane
padding) or by heads*batch (grid size)? Probe the cross product so the
dispatcher rule is measured, not guessed.
"""
import time

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_tpu.ops.attention import attention

print("devices:", jax.devices(), flush=True)
N1, N2 = 40, 200
k0 = jax.random.PRNGKey(0)


def scan_time(fn, q, k, v):
    def make(n):
        @jax.jit
        def many(q, kv):
            k, v = kv
            def body(c, _):
                y = fn(c, k, v)
                return y.astype(c.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=n)
            return out
        return many

    def timed(many, reps=3):
        r = many(q, (k, v))
        float(np.asarray(r.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = many(q, (k, v))
        float(np.asarray(r.ravel()[0]))
        return (time.perf_counter() - t0) / reps

    t1, t2 = timed(make(N1)), timed(make(N2))
    return max((t2 - t1) / (N2 - N1), 1e-9)


for s in (1024, 512):
    for h in (8, 20):
        for d in (64, 80, 128):
            q = jax.random.normal(k0, (2, h, s, d), jnp.bfloat16)
            k = jax.random.normal(k0, (2, h, s, d), jnp.bfloat16)
            v = jax.random.normal(k0, (2, h, s, d), jnp.bfloat16)
            res = {}
            for force in ("xla", "flash"):
                try:
                    t = scan_time(
                        lambda q, k, v: attention(q, k, v, force=force), q, k, v
                    )
                    res[force] = t
                except Exception as e:
                    print(f"s{s} h{h} d{d} {force}: FAIL {type(e).__name__}", flush=True)
            if len(res) == 2:
                print(
                    f"s={s:5d} h={h:2d} d={d:3d}  xla {res['xla']*1e6:7.1f}us"
                    f"  flash {res['flash']*1e6:7.1f}us"
                    f"  ratio xla/flash {res['xla']/res['flash']:.2f}",
                    flush=True,
                )

# SDXL b=8 (CFG batch for serving batch-4) at the two XL stages
for (b, h, s, d) in [(8, 20, 1024, 64), (8, 10, 4096, 64), (4, 20, 1024, 64)]:
    q = jax.random.normal(k0, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(k0, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(k0, (b, h, s, d), jnp.bfloat16)
    out = {}
    for force in ("xla", "flash"):
        t = scan_time(lambda q, k, v: attention(q, k, v, force=force), q, k, v)
        out[force] = t
    print(
        f"b={b} h={h:2d} s={s:5d} d={d}  xla {out['xla']*1e6:8.1f}us"
        f"  flash {out['flash']*1e6:8.1f}us"
        f"  ratio {out['xla']/out['flash']:.2f}",
        flush=True,
    )
