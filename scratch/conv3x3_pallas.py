"""Prototype: Pallas 3x3 SAME conv for the VAE decoder's large-spatial
shapes (512^2x128, 512^2x256->128, 256^2x512->256), where XLA's conv
emitter measures 55-94 TF/s (NOTES_ROUND3).

Design: pad H/W by 1 outside the kernel; grid over (batch, row-blocks,
col-blocks); each program loads an input block (bh+2, bw+2, Cin) into
VMEM and accumulates 9 shifted (bh*bw, Cin) @ (Cin, Cout) matmuls into an
fp32 accumulator, then writes (bh, bw, Cout) bf16.

Usage:
  python scratch/conv3x3_pallas.py --check   # CPU interpret-mode parity
  python scratch/conv3x3_pallas.py           # on-chip in-scan timing
"""
import functools
import sys
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, bh, bw, cin, cout):
    # x_ref: (bh+2, bw+2, cin); w_ref: (9*cin, cout); o_ref: (bh, bw, cout)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[dy:dy + bh, dx:dx + bw, :].reshape(bh * bw, cin)
            wk = w_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :]
            acc_ref[:] += jnp.dot(xs, wk, preferred_element_type=jnp.float32)
    out = acc_ref[:] + b_ref[:].astype(jnp.float32)
    o_ref[:] = out.reshape(bh, bw, cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "bw", "interpret"))
def conv3x3_pallas(x, w, b, bh=64, bw=64, interpret=False):
    """x: (B,H,W,Cin) bf16; w: (3,3,Cin,Cout) HWIO; b: (Cout,)."""
    B, H, W, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * cin, cout)
    grid = (B, H // bh, W // bw)
    return pl.pallas_call(
        functools.partial(_conv_kernel, bh=bh, bw=bw, cin=cin, cout=cout),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        grid=grid,
        in_specs=[
            # overlapping halo windows -> Element (elementwise start) dims
            pl.BlockSpec((pl.Squeezed(), pl.Element(bh + 2), pl.Element(bw + 2),
                          pl.Blocked(cin)),
                         lambda b_, i, j: (b_, i * bh, j * bw, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda b_, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda b_, i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pl.Squeezed(), pl.Blocked(bh), pl.Blocked(bw),
                                pl.Blocked(cout)),
                               lambda b_, i, j: (b_, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bh * bw, cout), jnp.float32)],
        interpret=interpret,
    )(xp, wf, b)


def xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + b.astype(y.dtype)


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


SHAPES = [  # (B, H, W, cin, cout) — VAE decoder hot shapes at 512^2 target
    (4, 512, 512, 128, 128),
    (4, 512, 512, 256, 128),   # level-1 tail: 256 -> 128 channel drop
    (4, 512, 512, 256, 256),
    (4, 256, 256, 512, 256),
    (4, 256, 256, 512, 512),
    (4, 128, 128, 512, 512),
]


def main():
    if "--check" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        k = jax.random.PRNGKey(0)
        for (B, H, W, cin, cout) in [(1, 8, 16, 128, 128), (2, 16, 8, 256, 128)]:
            x = jax.random.normal(k, (B, H, W, cin), jnp.float32)
            w = jax.random.normal(k, (3, 3, cin, cout), jnp.float32) * 0.05
            b = jax.random.normal(k, (cout,), jnp.float32)
            ref = xla_conv(x, w, b)
            got = conv3x3_pallas(x, w, b, bh=8, bw=8, interpret=True)
            err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
            print(f"{(B,H,W,cin,cout)}: max rel err {err:.2e}", flush=True)
            assert err < 1e-5, "parity failure"
        print("CHECK OK", flush=True)
        return

    print("devices:", jax.devices(), flush=True)
    dt = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
    k = jax.random.PRNGKey(0)
    for (B, H, W, cin, cout) in SHAPES:
        x = jax.random.normal(k, (B, H, W, cin), dt)
        w = jax.random.normal(k, (3, 3, cin, cout), dt) * 0.05
        b = jax.random.normal(k, (cout,), dt)
        fl = 2.0 * B * H * W * 9 * cin * cout
        t_x = scan_time(lambda x, w, b: xla_conv(x, w, b), x, w, b)
        print(f"{(B,H,W,cin,cout)} XLA   : {t_x*1e3:7.2f} ms "
              f"{fl/t_x/1e12:6.1f} TF/s", flush=True)
        for bh, bw in ((64, 64), (32, 128), (128, 64), (16, 256)):
            if H % bh or W % bw:
                continue
            try:
                t_p = scan_time(lambda x, w, b: conv3x3_pallas(
                    x, w, b, bh=bh, bw=bw), x, w, b)
                print(f"  pallas bh={bh:3d} bw={bw:3d}: {t_p*1e3:7.2f} ms "
                      f"{fl/t_p/1e12:6.1f} TF/s ({t_x/t_p:.2f}x)", flush=True)
            except Exception as e:
                print(f"  pallas bh={bh} bw={bw}: FAILED {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
