"""Calibrate in-scan timing: same op at scan lengths 10/30/100/300.
If per-iter time falls with length, a fixed per-call cost is leaking in."""
import time

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

k0 = jax.random.PRNGKey(0)
a = jax.random.normal(k0, (8192, 640), jnp.bfloat16)
w = jax.random.normal(k0, (640, 640), jnp.bfloat16)


def run(n):
    @jax.jit
    def many(a, w):
        def body(c, _):
            return (c @ w).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, a, None, length=n)
        return out

    r = many(a, w); float(np.asarray(r.ravel()[0]))
    t0 = time.perf_counter()
    r = many(a, w); float(np.asarray(r.ravel()[0]))
    dt = time.perf_counter() - t0
    fl = 2.0 * 8192 * 640 * 640
    print(f"scan n={n:4d}: total {dt*1e3:8.2f} ms  {dt/n*1e6:8.1f} us/iter "
          f"{fl/(dt/n)/1e12:6.1f} TF/s", flush=True)


for n in (10, 30, 100, 300):
    run(n)

# unrolled chain (no scan) for comparison
for n in (30, 100):
    @jax.jit
    def many(a, w):
        c = a
        for _ in range(n):
            c = (c @ w).astype(c.dtype)
        return c
    r = many(a, w); float(np.asarray(r.ravel()[0]))
    t0 = time.perf_counter()
    r = many(a, w); float(np.asarray(r.ravel()[0]))
    dt = time.perf_counter() - t0
    fl = 2.0 * 8192 * 640 * 640
    print(f"unroll n={n:4d}: total {dt*1e3:8.2f} ms  {dt/n*1e6:8.1f} us/iter "
          f"{fl/(dt/n)/1e12:6.1f} TF/s", flush=True)
