"""Fused GEGLU FFN Pallas kernel: out = (gelu-gated x@W1) @ W2 + b2.

XLA runs the transformer FF at 71.6 TF/s at SD1.5's 64^2 level (1.125 ms
per block, scratch/transformer_micro.py) and materializes the (M, 2*inner)
projection in HBM. This kernel streams inner-dim tiles: per (m, n) grid
cell compute u = x@W1a_n + b1a, v = x@W1g_n + b1g in fp32, gate
g = u * gelu(v), and accumulate g @ W2_n into an fp32 out scratch —
the 2*inner intermediate never leaves VMEM.

Usage:
  python scratch/geglu_pallas.py --check    # CPU interpret parity
  python scratch/geglu_pallas.py            # on-chip timing vs XLA
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


def _erf_f32(x):
    """Eigen generic_fast_erf_float — the rational poly XLA itself lowers
    fp32 erf to (~1e-7 abs err); erf/erfc have no Pallas TPU lowering."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    a = jnp.float32(-2.72614225801306e-10)
    a = a * x2 + jnp.float32(2.77068142495902e-08)
    a = a * x2 + jnp.float32(-2.10102402082508e-06)
    a = a * x2 + jnp.float32(-5.69250639462346e-05)
    a = a * x2 + jnp.float32(-7.34990630326855e-04)
    a = a * x2 + jnp.float32(-2.95459980854025e-03)
    a = a * x2 + jnp.float32(-1.60960333262415e-02)
    a = a * x
    b = jnp.float32(-1.45660718464996e-05)
    b = b * x2 + jnp.float32(-2.13374055278905e-04)
    b = b * x2 + jnp.float32(-1.68282697438203e-03)
    b = b * x2 + jnp.float32(-7.37332916720468e-03)
    b = b * x2 + jnp.float32(-1.42647390514189e-02)
    return a / b


def _gelu_exact(v):
    return 0.5 * v * (1.0 + _erf_f32(v * jnp.float32(0.7071067811865476)))


def _kernel(x_ref, w1a_ref, w1g_ref, b1a_ref, b1g_ref, w2_ref, b2_ref,
            o_ref, acc_ref, *, n_steps):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    u = jnp.dot(x, w1a_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(x, w1g_ref[:], preferred_element_type=jnp.float32)
    u = u + b1a_ref[0, :].astype(jnp.float32)
    v = v + b1g_ref[0, :].astype(jnp.float32)
    g = (u * _gelu_exact(v)).astype(x.dtype)
    acc_ref[:] += jnp.dot(g, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(n == n_steps - 1)
    def _done():
        o_ref[:] = (acc_ref[:] + b2_ref[0, :].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "interpret"))
def geglu_ffn(x, w1, b1, w2, b2, bm=512, bn=256, interpret=False):
    """x: (M, C); w1: (C, 2*inner); w2: (inner, C)."""
    M, C = x.shape
    inner = w2.shape[0]
    w1a, w1g = w1[:, :inner], w1[:, inner:]
    # biases as 2-D (1, n): 1-D operands get XLA/Mosaic tiling mismatches
    b1a, b1g = b1[None, :inner], b1[None, inner:]
    b2 = b2[None, :]
    bm = min(bm, M)
    bn = min(bn, inner)
    assert M % bm == 0 and inner % bn == 0
    n_steps = inner // bn
    grid = (M // bm, n_steps)
    return pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, C), lambda i, n: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bn), lambda i, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bn), lambda i, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, C), lambda i, n: (n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, C), lambda i, n: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w1a, w1g, b1a, b1g, w2, b2)


def xla_ffn(x, w1, b1, w2, b2):
    proj = jnp.dot(x, w1) + b1.astype(x.dtype)
    a, gate = jnp.split(proj, 2, axis=-1)
    g = a * jax.nn.gelu(gate, approximate=False)
    return jnp.dot(g, w2) + b2.astype(x.dtype)


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


# (M, C, inner): SD1.5 levels (CFG batch 8) + SDXL levels (CFG batch 2)
SHAPES = [
    (8 * 4096, 320, 1280),    # SD1.5 64^2
    (8 * 1024, 640, 2560),    # SD1.5 32^2
    (8 * 256, 1280, 5120),    # SD1.5 16^2 + middle
    (2 * 4096, 640, 2560),    # SDXL 64^2 (depth 2)
    (2 * 1024, 1280, 5120),   # SDXL 32^2 (depth 10) + middle
]


def main():
    if "--check" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        k = jax.random.PRNGKey(0)
        for (M, C, inner) in [(256, 128, 256), (512, 64, 128)]:
            x = jax.random.normal(k, (M, C), jnp.float32)
            w1 = jax.random.normal(k, (C, 2 * inner), jnp.float32) * 0.05
            b1 = jax.random.normal(k, (2 * inner,), jnp.float32)
            w2 = jax.random.normal(k, (inner, C), jnp.float32) * 0.05
            b2 = jax.random.normal(k, (C,), jnp.float32)
            ref = xla_ffn(x, w1, b1, w2, b2)
            got = geglu_ffn(x, w1, b1, w2, b2, bm=128, bn=128, interpret=True)
            err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
            print(f"(M={M},C={C},inner={inner}): max rel err {err:.2e}",
                  flush=True)
            assert err < 1e-5
        print("CHECK OK", flush=True)
        return

    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)
    for (M, C, inner) in SHAPES:
        x = jax.random.normal(k, (M, C), jnp.bfloat16)
        w1 = jax.random.normal(k, (C, 2 * inner), jnp.bfloat16) * 0.05
        b1 = jax.random.normal(k, (2 * inner,), jnp.bfloat16)
        w2 = jax.random.normal(k, (inner, C), jnp.bfloat16) * 0.05
        b2 = jax.random.normal(k, (C,), jnp.bfloat16)
        fl = 2.0 * M * (C * 2 * inner + inner * C)
        t_x = scan_time(xla_ffn, x, w1, b1, w2, b2)
        print(f"(M={M},C={C},inner={inner}) XLA {t_x*1e3:6.3f} ms "
              f"{fl/t_x/1e12:6.1f} TF/s", flush=True)
        for bm, bn in ((512, 256), (256, 256), (1024, 256), (512, 512),
                       (256, 512)):
            if M % bm or inner % bn:
                continue
            try:
                t_p = scan_time(lambda x, *c: geglu_ffn(x, *c, bm=bm, bn=bn),
                                x, w1, b1, w2, b2)
                print(f"  pallas bm={bm:4d} bn={bn:3d}: {t_p*1e3:6.3f} ms "
                      f"{fl/t_p/1e12:6.1f} TF/s ({t_x/t_p:.2f}x)", flush=True)
            except Exception as e:
                print(f"  pallas bm={bm} bn={bn}: FAILED {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
