"""Stage-wise decoder timing: which part of the SD VAE decoder eats the
~55 ms/image (22 TF/s — far off roofline)?

Times each decoder stage as its own jitted program at the stage's true
input shape (batch 4, 512x512 target), serial dispatch x reps, one scalar
sync. Also prints cost_analysis FLOPs per stage when available.
"""
import sys
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.models import vae as V
from lightdiffusion_tpu.ops import layers as L


def timeit(fn, *args, reps=8):
    out = fn(*args)
    float(np.asarray(out.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(out.ravel()[0]))
    return (time.perf_counter() - t0) / reps


def main():
    policy = L.FP32 if "--fp32" in sys.argv else L.BF16
    sd = init_random(jax.random.PRNGKey(0))
    p = sd.vae_params["decoder"]
    cfg = sd.vae_config
    B = 4
    key = jax.random.PRNGKey(1)

    def stage(name, fn, shape):
        x = jax.random.normal(key, (B, *shape), policy.compute_dtype)
        f = jax.jit(fn)
        dt = timeit(f, x)
        print(f"  {name:34s} in={str(shape):18s} {dt*1000:7.2f} ms", flush=True)
        return dt

    total = 0.0
    # mid block @ 64x64 c=512
    total += stage(
        "mid (res+attn+res) @64x64x512",
        lambda x: V._resnet(p["mid"]["block_2"], V._attn_block(
            p["mid"]["attn_1"], V._resnet(p["mid"]["block_1"], x, policy),
            policy), policy),
        (64, 64, 512),
    )
    # level 3: 3 resnets c=512 @64 + upsample ->128
    lv = p["up"][3]
    total += stage(
        "level3 3xres+ups @64x64x512",
        lambda x: V._upsample(lv["upsample"], V._resnet(
            lv["block"][2], V._resnet(lv["block"][1], V._resnet(
                lv["block"][0], x, policy), policy), policy), policy),
        (64, 64, 512),
    )
    lv2 = p["up"][2]
    total += stage(
        "level2 3xres+ups @128x128x512",
        lambda x: V._upsample(lv2["upsample"], V._resnet(
            lv2["block"][2], V._resnet(lv2["block"][1], V._resnet(
                lv2["block"][0], x, policy), policy), policy), policy),
        (128, 128, 512),
    )
    lv1 = p["up"][1]
    total += stage(
        "level1 3xres+ups @256x256x512",
        lambda x: V._upsample(lv1["upsample"], V._resnet(
            lv1["block"][2], V._resnet(lv1["block"][1], V._resnet(
                lv1["block"][0], x, policy), policy), policy), policy),
        (256, 256, 512),
    )
    lv0 = p["up"][0]
    total += stage(
        "level0 3xres @512x512x256",
        lambda x: V._resnet(lv0["block"][2], V._resnet(
            lv0["block"][1], V._resnet(lv0["block"][0], x, policy),
            policy), policy),
        (512, 512, 256),
    )
    total += stage(
        "out norm+silu+conv @512x512x128",
        lambda x: L.conv2d(p["conv_out"], L.silu(
            L.group_norm(p["norm_out"], x, eps=1e-6, policy=policy)),
            policy=policy),
        (512, 512, 128),
    )
    print(f"  {'SUM of stages':34s} {'':18s} {total*1000:7.2f} ms "
          f"({total/B*1000:.1f} ms/img)")

    # whole decoder for comparison
    vae = V.VAE(sd.vae_params, cfg, policy=policy)
    z = jax.random.normal(key, (B, 64, 64, 4), jnp.float32)
    dt = timeit(vae.decode, z)
    print(f"  whole decode batch-{B}: {dt*1000:.2f} ms ({dt/B*1000:.1f} ms/img)")

    # isolate: one 3x3 conv at the two biggest shapes
    for (hw, c) in ((256, 512), (512, 256), (512, 128)):
        w = jax.random.normal(key, (3, 3, c, c), policy.compute_dtype) * 0.02
        x = jax.random.normal(key, (B, hw, hw, c), policy.compute_dtype)

        @jax.jit
        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=policy.compute_dtype)
        dt = timeit(conv, x, w)
        fl = 2 * B * hw * hw * c * c * 9
        print(f"  conv3x3 {hw}x{hw}x{c}: {dt*1000:7.2f} ms "
              f"-> {fl/dt/1e12:6.1f} TF/s", flush=True)
    # groupnorm alone at the big shape
    x = jax.random.normal(key, (B, 512, 512, 128), policy.compute_dtype)
    gp = {"weight": jnp.ones((128,)), "bias": jnp.zeros((128,))}
    f = jax.jit(lambda x: L.group_norm(gp, x, eps=1e-6, policy=policy))
    dt = timeit(f, x)
    gb = B * 512 * 512 * 128 * x.dtype.itemsize * 2
    print(f"  groupnorm 512x512x128: {dt*1000:.2f} ms "
          f"-> {gb/dt/1e9:.0f} GB/s eff")


if __name__ == "__main__":
    main()
