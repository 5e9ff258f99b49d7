"""3x3 SAME conv as 9 shifted-slice matmuls in pure XLA, vs lax.conv.

XLA's conv emitter measures 45-57 TF/s at the VAE decoder's cout=128
large-spatial shapes; a (B*H*W, cin) @ (cin, cout) matmul formulation with
shift-slices may tile the MXU better.
"""
import sys
import time
import functools

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp


def xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + b.astype(y.dtype)


@functools.partial(jax.jit, static_argnames=())
def shiftmm_conv(x, w, b):
    """sum_{dy,dx} shift(x) @ w[dy,dx] with fp32 accumulation."""
    B, H, W, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(
                xp, (0, dy, dx, 0), (B, dy + H, dx + W, cin))
            ymm = jax.lax.dot_general(
                xs.reshape(B * H * W, cin), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = ymm if acc is None else acc + ymm
    y = (acc + b.astype(jnp.float32)).astype(x.dtype)
    return y.reshape(B, H, W, cout)


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


SHAPES = [
    (4, 512, 512, 128, 128),
    (4, 512, 512, 256, 128),
    (4, 512, 512, 256, 256),
    (4, 256, 256, 512, 256),
    (4, 256, 256, 512, 512),
    (4, 128, 128, 512, 512),
    (1, 1024, 1024, 128, 128),  # SDXL / hires decode tail
]


def main():
    if "--check" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (2, 16, 8, 64), jnp.float32)
        w = jax.random.normal(k, (3, 3, 64, 32), jnp.float32) * 0.05
        b = jax.random.normal(k, (32,), jnp.float32)
        err = float(jnp.max(jnp.abs(xla_conv(x, w, b) - shiftmm_conv(x, w, b)))
                    / jnp.max(jnp.abs(xla_conv(x, w, b))))
        print(f"max rel err {err:.2e}")
        assert err < 1e-5
        print("CHECK OK")
        return

    print("devices:", jax.devices(), flush=True)
    dt = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
    k = jax.random.PRNGKey(0)
    for (B, H, W, cin, cout) in SHAPES:
        x = jax.random.normal(k, (B, H, W, cin), dt)
        w = jax.random.normal(k, (3, 3, cin, cout), dt) * 0.05
        b = jax.random.normal(k, (cout,), dt)
        fl = 2.0 * B * H * W * 9 * cin * cout
        t_x = scan_time(xla_conv, x, w, b)
        t_s = scan_time(shiftmm_conv, x, w, b)
        print(f"{(B,H,W,cin,cout)} XLAconv {t_x*1e3:7.2f} ms "
              f"{fl/t_x/1e12:6.1f} TF/s | shiftmm {t_s*1e3:7.2f} ms "
              f"{fl/t_s/1e12:6.1f} TF/s ({t_x/t_s:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
