"""Headline benchmark: SD1.5 512×512 20-step txt2img on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's stable-fast CUDA path (README claims ~1.7× over
torch; commonly ~2 s/image for SD1.5 20 steps ⇒ 30 images/min/chip). We
report images/min/chip; vs_baseline = value / 30.

Runs with random weights (no checkpoints exist in this environment) — FLOPs
and memory traffic are weight-independent, so throughput is representative.
Diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from lightdiffusion_tpu.loader.checkpoint import init_random
    from lightdiffusion_tpu.pipelines.sd import SDPipeline, txt2img
    from lightdiffusion_tpu.ops import layers as L

    log("devices:", jax.devices())
    t0 = time.perf_counter()
    sd = init_random(jax.random.PRNGKey(0))
    pipe = SDPipeline(sd, policy=L.BF16, clip_skip=-2)
    log(f"init_random: {time.perf_counter()-t0:.1f}s")

    kwargs = dict(
        prompt="masterpiece, best quality, a cat on a mat",
        negative_prompt="blurry, low quality",
        width=512, height=512, steps=20, cfg=7.0,
        sampler_name="euler_ancestral", scheduler="karras",
    )

    # single-image latency (the <1s/image target)
    t0 = time.perf_counter()
    img = txt2img(pipe, seed=0, batch=1, **kwargs)
    log(f"first image (compile+run): {time.perf_counter()-t0:.1f}s shape={img.shape}")
    assert np.isfinite(img).all()
    t0 = time.perf_counter()
    for i in range(3):
        img = txt2img(pipe, seed=i + 1, batch=1, **kwargs)
    lat = (time.perf_counter() - t0) / 3
    log(f"batch-1 latency: {lat*1000:.0f} ms/image")

    # serving throughput at the saturating batch (measured: 4); fall back to
    # the batch-1 number if the larger program fails for any reason
    per_image = lat
    batch = 4
    try:
        img = txt2img(pipe, seed=0, batch=batch, **kwargs)  # compile
        n = 3
        t0 = time.perf_counter()
        for i in range(n):
            img = txt2img(pipe, seed=i + 1, batch=batch, **kwargs)
        per_image = (time.perf_counter() - t0) / n / batch
        log(f"batch-{batch} throughput: {per_image*1000:.0f} ms/image")
    except Exception as e:
        log(f"batch-{batch} failed ({e}); reporting batch-1 throughput")
    images_per_min = 60.0 / per_image
    log(f"-> {images_per_min:.1f} images/min/chip")
    log(f"per-UNet-step (incl. CLIP+VAE amortized): {per_image/20*1000:.1f} ms")

    print(json.dumps({
        "metric": "sd15_512x512_20step_txt2img_throughput",
        "value": round(images_per_min, 2),
        "unit": "images/min/chip",
        "vs_baseline": round(images_per_min / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
