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


def warmup(pipe, buckets=None, batch: int = 1):
    buckets = buckets or DEFAULT_BUCKETS
    pos = pipe.encode_text("warmup")
    neg = pipe.encode_text("")
    for (w, h, steps, sampler, scheduler, denoise) in buckets:
        t0 = time.time()
        latent = pipe.empty_latent(w, h, batch)
        pipe.sample_latent(
            latent, pos, neg, steps=steps, sampler_name=sampler,
            scheduler=scheduler, denoise=denoise,
        )
        pipe.decode(latent)
        log.info("warm %dx%d %s/%s %d steps: %.1fs", w, h, sampler,
                 scheduler, steps, time.time() - t0)


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
