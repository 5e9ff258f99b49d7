"""In-scan marginal timing of GroupNorm and the big VAE convs.

Wraps each op in a lax.scan of N iterations inside ONE jitted program and
reports (t(N2) - t(N1)) / (N2 - N1): pure device cost, relay dispatch
cancels (CLAUDE.md measurement rule).
"""
import sys
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.ops import layers as L

POLICY = L.BF16


def marginal(op, x, n1=2, n2=10, reps=3):
    """Device ms per op application via scan-length ablation."""

    def make(n):
        @jax.jit
        def run(x):
            def body(h, _):
                h = op(h)
                return h, ()
            h, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.float32(h.ravel()[0])
        return run

    f1, f2 = make(n1), make(n2)

    def t(f):
        float(np.asarray(f(x)))  # compile+warm
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(x)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(f2) - t(f1)) / (n2 - n1) * 1000


def main():
    key = jax.random.PRNGKey(0)
    B = 4

    # groupnorm at the decoder's big shapes (shape-preserving)
    for hw, c in ((512, 128), (512, 256), (256, 512)):
        gp = {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        x = jax.random.normal(key, (B, hw, hw, c), POLICY.compute_dtype)
        ms = marginal(lambda h: L.group_norm(gp, h, eps=1e-6, policy=POLICY), x)
        gb = B * hw * hw * c * 2 * 2  # read+write bf16
        print(f"groupnorm {hw}x{hw}x{c}: {ms:6.2f} ms  "
              f"-> {gb/ms/1e6:5.0f} GB/s eff", flush=True)

    # 3x3 convs (shape-preserving, SAME)
    for hw, c in ((512, 128), (512, 256), (256, 512), (128, 512)):
        w = jax.random.normal(key, (3, 3, c, c), POLICY.compute_dtype) * 0.01
        x = jax.random.normal(key, (B, hw, hw, c), POLICY.compute_dtype)

        def conv(h, w=w):
            return jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=POLICY.compute_dtype)
        ms = marginal(conv, x)
        fl = 2 * B * hw * hw * c * c * 9
        print(f"conv3x3 {hw}x{hw}x{c}: {ms:6.2f} ms  -> {fl/ms/1e9:6.1f} TF/s",
              flush=True)

    # silu+conv fused (what a resnet branch actually runs)
    hw, c = 512, 128
    w = jax.random.normal(key, (3, 3, c, c), POLICY.compute_dtype) * 0.01
    gp = {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    x = jax.random.normal(key, (B, hw, hw, c), POLICY.compute_dtype)

    def gn_silu_conv(h):
        h = L.group_norm(gp, h, eps=1e-6, policy=POLICY)
        return jax.lax.conv_general_dilated(
            jax.nn.silu(h), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=POLICY.compute_dtype)
    ms = marginal(gn_silu_conv, x)
    print(f"gn+silu+conv3x3 {hw}x{hw}x{c}: {ms:6.2f} ms")


if __name__ == "__main__":
    main()
