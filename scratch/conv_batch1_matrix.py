"""Batch-1 conv crossover matrix: the pallas-vs-XLA winner flips with
total grid rows (B*H), not just H*W — XLA picks a much better fp32
strategy at B=1 512^2 (1.29 ms for 128->128 vs Pallas 2.66). Pin the
gate's B-dependence for the common single-image decode shapes.
"""
import sys
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.ops.conv_pallas import _conv3x3_fwd, _xla_conv


def scan_time(fn, x, *consts, n1=6, n2=24):
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

    t1, t2 = timed(make(n1)), timed(make(n2))
    return max((t2 - t1) / (n2 - n1), 1e-9)


SHAPES = [  # single/low-batch decode + tile shapes
    (1, 512, 512, 128, 128),
    (2, 512, 512, 128, 128),
    (1, 512, 512, 256, 128),
    (1, 512, 512, 256, 256),
    (1, 256, 256, 512, 256),
    (1, 1024, 1024, 128, 128),
]


def main():
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)
    for dt in (jnp.float32, jnp.bfloat16):
        for (B, H, W, cin, cout) in SHAPES:
            x = jax.random.normal(k, (B, H, W, cin), dt)
            w = jax.random.normal(k, (3, 3, cin, cout), dt) * 0.05
            b = jax.random.normal(k, (cout,), dt)
            fl = 2.0 * B * H * W * 9 * cin * cout
            t_x = scan_time(_xla_conv, x, w, b)
            t_p = scan_time(
                lambda x, w, b: _conv3x3_fwd(x, w, b, interpret=False),
                x, w, b)
            print(f"{dt.__name__} {(B,H,W,cin,cout)} XLA {t_x*1e3:6.2f} ms "
                  f"{fl/t_x/1e12:5.1f} TF/s | pallas {t_p*1e3:6.2f} ms "
                  f"{fl/t_p/1e12:5.1f} TF/s ({t_x/t_p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
