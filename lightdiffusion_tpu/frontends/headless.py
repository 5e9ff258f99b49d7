"""Headless generation entry (the reference's Discord-bot ``pipeline``).

Behavioral parity target: ``pipeline(prompt, w, h)``
(/root/reference/LightDiffusion.py:10001-10087): load checkpoint →
add_detail LoRA 0.7/0.7 → clip-skip −2 → encode (hardcoded negative with
embeddings) → dpm_adaptive/karras 40 steps cfg 7 → bislerp ×2 →
euler_ancestral/normal 10 steps denoise 0.45 cfg 8 → decode → save.
"""

from __future__ import annotations

import logging

import numpy as np

from .. import assets
from ..loader import checkpoint as CKPT
from ..pipelines.sd import SDPipeline, txt2img
from ..nodes import SaveImage
from .enhancer import enhance_prompt

log = logging.getLogger(__name__)

DEFAULT_NEGATIVE = (
    "(worst quality, low quality:1.4), embedding:badhandv4, (deformed, "
    "distorted, disfigured:1.3), bad anatomy, extra limb, missing limb"
)


def load_default_pipeline(
    checkpoint: str | None = None,
    loras: list[tuple[str, float, float]] | None = None,
    clip_skip: int = -2,
    random_init: bool = False,
    mesh=None,
    vae_bf16: bool = False,
) -> SDPipeline:
    """Load the first available checkpoint (+ add_detail LoRA if present,
    ref :10021-10031); ``random_init`` enables weightless smoke runs.
    ``mesh``: optional jax.sharding.Mesh("dp","tp") — the pipeline runs
    SPMD (TP-sharded UNet, dp-sharded batches; parallel/mesh.py).
    ``vae_bf16``: decode in bf16 (the reference's reduced-precision VAE
    policy on capable hardware, ref :1508-1526; measured −21 ms/img at
    512² batch 4, decode ssim 0.998 vs fp32 — bf16 keeps the fp32
    exponent range, so fp16's overflow hazard doesn't apply on TPU)."""
    from ..ops import layers as L

    vp = {"vae_policy": L.BF16} if vae_bf16 else {}
    if random_init:
        return SDPipeline(CKPT.init_random(), clip_skip=clip_skip, mesh=mesh,
                          **vp)
    names = assets.list_files("checkpoints")
    if checkpoint is None:
        if not names:
            raise FileNotFoundError(
                "no checkpoints found — put an SD1.5 .safetensors under "
                "_internal/checkpoints/ or set $LDT_ASSETS (or pass "
                "random_init=True for a smoke run)"
            )
        checkpoint = names[0]
    path = assets.resolve_file("checkpoints", checkpoint)
    if loras is None:
        loras = []
        try:
            assets.resolve_file("loras", "add_detail")
            loras = [("add_detail", 0.7, 0.7)]  # ref :10021
        except FileNotFoundError:
            pass
    lora_args = [
        (assets.resolve_file("loras", n), sm, sc) for (n, sm, sc) in loras
    ]
    if lora_args:
        sd = CKPT.load_checkpoint(path, loras=lora_args)
    else:
        # warm starts skip torch parsing + transposes via the orbax cache
        from ..loader.native_cache import load_checkpoint_cached

        sd = load_checkpoint_cached(path)
    return SDPipeline(sd, clip_skip=clip_skip, mesh=mesh, **vp)


def pipeline(
    prompt: str,
    w: int = 512,
    h: int = 512,
    number: int = 1,
    pipe: SDPipeline | None = None,
    enhance: bool = True,
    save: bool = True,
    seed: int = 0,
    random_init: bool = False,
    preset: str | None = None,
    vae_bf16: bool = False,
) -> np.ndarray:
    """(ref :10001) Returns the final images (B,H,W,3) in [0,1].

    ``preset``: "fast" | "max" | "quality" — apply a measured accelerator
    stack (presets.py) to the whole workload. ToDo is set on ``pipe``
    (config-level, so it also reaches the dpm_adaptive base pass);
    DeepCache/guidance-delta apply where the sampler supports them — the
    adaptive base pass downgrades them gracefully (txt2img), the hires
    pass runs the full stack. Beyond the reference, whose headless entry
    has no accelerator surface at all (:10001-10087)."""
    if pipe is None:
        pipe = load_default_pipeline(random_init=random_init,
                                     vae_bf16=vae_bf16)
    if enhance:
        prompt = enhance_prompt(prompt)
    deepcache_interval = uncond_interval = 0
    prior_todo = None
    if preset is not None:
        from ..presets import resolve

        deepcache_interval, todo, uncond_interval = resolve(preset)
        # set unconditionally (factor 0 disables) and restore after: a
        # caller-supplied pipe must not keep this run's ToDo factor
        # (ADVICE r3 — a later preset=None run would silently inherit it)
        prior_todo = (pipe.sd.unet_config.todo_factor,
                      pipe.sd.unet_config.todo_min_tokens)
        pipe.set_todo(todo)
    try:
        imgs = txt2img(
            pipe,
            prompt,
            DEFAULT_NEGATIVE,
            width=w,
            height=h,
            steps=40,
            cfg=7.0,
            seed=seed,
            sampler_name="dpm_adaptive",
            scheduler="karras",
            batch=number,
            hires_fix=True,
            hires_steps=10,
            hires_denoise=0.45,
            hires_cfg=8.0,
            deepcache_interval=deepcache_interval,
            uncond_interval=uncond_interval,
        )
    finally:
        if prior_todo is not None:
            pipe.set_todo(*prior_todo)
    if save:
        SaveImage().save_images(imgs, "LD-HiRes")
    return imgs
