"""Measure the composed DeepCache x uncond_interval (dual-cache) denoiser on
SD1.5 512^2 batch-4: the dc/ui grid with and without ToDo, vs the single-lever
anchors. img/min + ssim vs the fixed-seed baseline (protocol of stack_tune.py
/ ui_tune.py)."""
import sys
import time

import numpy as np

from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()

import jax  # noqa: E402

from lightdiffusion_tpu.loader.checkpoint import init_random  # noqa: E402
from lightdiffusion_tpu.pipelines.sd import SDPipeline  # noqa: E402
from lightdiffusion_tpu.utils.ssim import ssim  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    model = init_random(jax.random.PRNGKey(0))
    pipe = SDPipeline(model)
    kwargs = dict(steps=20, cfg=7.0, sampler_name="euler_ancestral",
                  scheduler="karras")
    batch = 4
    pos = pipe.encode_text("masterpiece, best quality, a cat on a mat")
    neg = pipe.encode_text("blurry, low quality")
    latent = pipe.empty_latent(512, 512, batch)
    QSEED = 1234

    def run(seed, **skw):
        out = pipe.sample_latent(latent, pos, neg, seed=seed, **kwargs, **skw)
        return pipe.decode(out)

    def timed(reps=3, groups=3, **skw):
        img = run(0, **skw)
        float(np.asarray(img.ravel()[0]))
        times = []
        for gi in range(groups):
            t0 = time.perf_counter()
            for i in range(reps):
                img = run(gi * reps + i + 1, **skw)
            float(np.asarray(img.ravel()[0]))
            times.append((time.perf_counter() - t0) / (reps * batch))
        return float(np.mean(times))

    def quality(**skw):
        out = pipe.sample_latent(latent, pos, neg, seed=QSEED, **kwargs, **skw)
        return np.asarray(pipe.decode(out), np.float32)

    base = timed()
    ref = quality()
    log(f"baseline: {60.0/base:.1f} img/min")

    rows = [
        ("DC-3 (anchor)", 0, {"deepcache_interval": 3}),
        ("ui-2 (anchor)", 0, {"uncond_interval": 2}),
        ("DC-3+ui-2", 0, {"deepcache_interval": 3, "uncond_interval": 2}),
        ("DC-4+ui-2", 0, {"deepcache_interval": 4, "uncond_interval": 2}),
        ("DC-4+ui-3", 0, {"deepcache_interval": 4, "uncond_interval": 3}),
        ("DC-3+ui-2+ToDo-2", 2,
         {"deepcache_interval": 3, "uncond_interval": 2}),
        ("DC-4+ui-2+ToDo-4", 4,
         {"deepcache_interval": 4, "uncond_interval": 2}),
        ("DC-4+ui-3+ToDo-4", 4,
         {"deepcache_interval": 4, "uncond_interval": 3}),
        ("DC-4+ToDo-4 (anchor)", 4, {"deepcache_interval": 4}),
    ]
    for name, todo, skw in rows:
        pipe.set_todo(todo)
        t = timed(**skw)
        s = np.asarray(ssim(quality(**skw), ref))
        log(f"{name}: {60.0/t:.1f} img/min ({base/t:.2f}x) "
            f"ssim={s.mean():.4f} min={s.min():.4f}")
    pipe.set_todo(0)


if __name__ == "__main__":
    main()
