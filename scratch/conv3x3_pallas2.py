"""Pallas 3x3 SAME conv, take 2: halo via row-shifted operands.

pl.Element block specs don't lower on real TPU Mosaic (take 1), so the row
halo comes from three operands whose blocks are offset by one row each:

  variant A (brow>1): three shifted SLICES xs_dy = xp[:, dy:dy+H] with
    block (1, brow, W+2, cin), index map (b, i) -> (b, i, 0, 0).
    Costs 3 HBM copies up front + 3x block reads, but amortizes grid
    overhead over brow rows.
  variant B (brow=1): the SAME padded array passed three times, index map
    (b, i) -> (b, i+dy, 0, 0) — legal because the block row size is 1, so
    block index == row index. No copies, 3x row re-reads (pipelined).

Column halo: blocks carry the full padded width W+2; dx shifts are
in-VMEM sublane slices.

Usage:
  python scratch/conv3x3_pallas2.py --check    # CPU interpret parity
  python scratch/conv3x3_pallas2.py            # on-chip timing vs XLA
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


def _kernel(x0, x1, x2, w_ref, b_ref, o_ref, acc_ref, *, brow, W, cin, cout):
    # x_dy: (1, brow, W+2, cin); w: (9*cin, cout); o: (1, brow, W, cout)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy, xr in enumerate((x0, x1, x2)):
        for dx in range(3):
            xs = xr[0, :, dx:dx + W, :].reshape(brow * W, cin)
            wk = w_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :]
            acc_ref[:] += jnp.dot(xs, wk, preferred_element_type=jnp.float32)
    out = acc_ref[:] + b_ref[:].astype(jnp.float32)
    o_ref[:] = out.reshape(1, brow, W, cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("brow", "copies", "interpret"))
def conv3x3_pallas(x, w, b, brow=8, copies=True, interpret=False):
    """x: (B,H,W,Cin); w: (3,3,Cin,Cout) HWIO; b: (Cout,)."""
    B, H, W, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * cin, cout)
    grid = (B, H // brow)
    kern = functools.partial(_kernel, brow=brow, W=W, cin=cin, cout=cout)
    if copies:
        xs = [jax.lax.slice(xp, (0, dy, 0, 0), (B, dy + H, W + 2, cin))
              for dy in range(3)]
        in_specs = [
            pl.BlockSpec((1, brow, W + 2, cin), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ]
    else:
        assert brow == 1, "no-copy variant needs single-row blocks"
        xs = [xp, xp, xp]
        in_specs = [
            pl.BlockSpec((1, 1, W + 2, cin),
                         functools.partial(
                             lambda bb, i, dy=0: (bb, i + dy, 0, 0), dy=dy),
                         memory_space=pltpu.VMEM)
            for dy in range(3)
        ]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        grid=grid,
        in_specs=in_specs + [
            pl.BlockSpec((9 * cin, cout), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda bb, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, brow, W, cout), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((brow * W, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*xs, wf, b)


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


SHAPES = [
    (4, 512, 512, 128, 128),
    (4, 512, 512, 256, 128),
    (4, 512, 512, 256, 256),
    (4, 256, 256, 512, 256),
    (4, 256, 256, 512, 512),
    (4, 128, 128, 512, 512),
    (1, 1024, 1024, 128, 128),
]

UNET_SHAPES = [  # UNet (CFG batch 8 at 512^2) + ESRGAN-ish shapes
    (8, 64, 64, 320, 320),
    (8, 32, 32, 640, 640),
    (8, 16, 16, 1280, 1280),
    (8, 64, 64, 640, 320),   # decoder concat tail
    (4, 512, 512, 64, 64),   # ESRGAN body at image res
    (4, 64, 64, 512, 512),   # VAE mid at 512^2 target
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
            for kw in (dict(brow=4, copies=True), dict(brow=1, copies=False)):
                got = conv3x3_pallas(x, w, b, interpret=True, **kw)
                err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
                print(f"{(B,H,W,cin,cout)} {kw}: max rel err {err:.2e}",
                      flush=True)
                assert err < 1e-5, "parity failure"
        print("CHECK OK", flush=True)
        return

    print("devices:", jax.devices(), flush=True)
    dt = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
    shapes = UNET_SHAPES if "--unet" in sys.argv else SHAPES
    k = jax.random.PRNGKey(0)
    for (B, H, W, cin, cout) in shapes:
        x = jax.random.normal(k, (B, H, W, cin), dt)
        w = jax.random.normal(k, (3, 3, cin, cout), dt) * 0.05
        b = jax.random.normal(k, (cout,), dt)
        fl = 2.0 * B * H * W * 9 * cin * cout
        t_x = scan_time(xla_conv, x, w, b)
        print(f"{(B,H,W,cin,cout)} XLA: {t_x*1e3:7.2f} ms "
              f"{fl/t_x/1e12:6.1f} TF/s", flush=True)
        variants = [dict(brow=1, copies=False)]
        if "--copies" in sys.argv:  # the losing variant, kept for reference
            for brow in (4, 8, 16):
                variants.append(dict(brow=brow, copies=True))
        for kw in variants:
            try:
                t_p = scan_time(
                    lambda x, w, b: conv3x3_pallas(x, w, b, **kw), x, w, b)
                print(f"  pallas {kw}: {t_p*1e3:7.2f} ms "
                      f"{fl/t_p/1e12:6.1f} TF/s ({t_x/t_p:.2f}x)", flush=True)
            except Exception as e:
                print(f"  pallas {kw}: FAILED {str(e)[:110]}", flush=True)


if __name__ == "__main__":
    main()
