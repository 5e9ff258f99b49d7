"""AOT warmup: precompile the common shape buckets into the persistent cache.

The reference's GUI recompiles stable-fast traces per shape at first use
(one-time "compile windup", README.md:24); SURVEY §7 prescribes bucketed
shapes + AOT warmup for the TPU build. Running this once (or after driver
updates) populates ~/.cache/lightdiffusion_tpu/xla so every later process
starts hot.

    python -m lightdiffusion_tpu.runtime.warmup [--random-init]
"""

from __future__ import annotations

import logging
import time

log = logging.getLogger(__name__)

# (width, height, steps, sampler, scheduler, denoise) buckets covering the
# reference's default workloads (BASELINE.md)
DEFAULT_BUCKETS = [
    (512, 512, 20, "euler_ancestral", "karras", 1.0),
    (512, 512, 40, "dpm_adaptive", "karras", 1.0),
    (1024, 1024, 10, "euler_ancestral", "normal", 0.45),  # hires pass
    (512, 512, 8, "dpmpp_2m_sde", "karras", 0.3),  # USDU tiles
]


def warmup(pipe, buckets=None, batch: int = 1, serving: bool = False):
    """``serving``: compile the SERVER-shaped programs instead — per-sample
    seed lists ((B,2) keys) and (B,) cfg arrays, at batch sizes 1 and
    ``batch`` — matching exactly what frontends/server.py submits (the
    scalar-seed trace is a different program and would leave the first real
    request paying the cold compile)."""
    import numpy as np

    buckets = buckets or DEFAULT_BUCKETS
    pos = pipe.encode_text("warmup")
    neg = pipe.encode_text("")
    batches = sorted({1, batch}) if serving else [batch]
    for (w, h, steps, sampler, scheduler, denoise) in buckets:
        for b in batches:
            t0 = time.time()
            latent = pipe.empty_latent(w, h, b)
            kw = dict(steps=steps, sampler_name=sampler,
                      scheduler=scheduler, denoise=denoise)
            if serving:
                kw["seed"] = list(range(b))
                kw["cfg"] = np.full((b,), 7.0, np.float32)
            pipe.sample_latent(latent, pos, neg, **kw)
            pipe.decode(latent)
            log.info("warm %dx%d b%d %s/%s %d steps: %.1fs", w, h, b,
                     sampler, scheduler, steps, time.time() - t0)


def main():  # pragma: no cover - tool entry
    import argparse

    from .cache import enable_compilation_cache

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()
    enable_compilation_cache()
    from ..frontends.headless import load_default_pipeline

    pipe = load_default_pipeline(
        checkpoint=args.checkpoint, random_init=args.random_init
    )
    warmup(pipe)


if __name__ == "__main__":  # pragma: no cover
    main()
