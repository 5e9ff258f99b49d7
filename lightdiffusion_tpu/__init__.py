"""LightDiffusion-TPU: a TPU-native Stable Diffusion framework.

Public API:
    load_checkpoint / init_random  — checkpoint ingestion (loader.checkpoint)
    SDPipeline, txt2img            — generation (pipelines.sd)
    txt2img_refined                — SDXL two-stage base→refiner (pipelines.sd)
    ultimate_sd_upscale            — img2img/USDU (postprocess.usdu)
    adetailer                      — face/person detailer (pipelines.adetailer)
    ensure_downloaded              — first-run asset bootstrap (assets)
    nodes                          — ComfyUI-style node classes
"""

__version__ = "0.2.0"


def __getattr__(name):  # lazy imports keep `import lightdiffusion_tpu` light
    if name in ("load_checkpoint", "init_random", "StableDiffusion"):
        from .loader import checkpoint as m

        return getattr(m, name)
    if name in ("SDPipeline", "txt2img", "txt2img_refined"):
        from .pipelines import sd as m

        return getattr(m, name)
    if name == "ensure_downloaded":
        from .assets import ensure_downloaded

        return ensure_downloaded
    if name == "ultimate_sd_upscale":
        from .postprocess.usdu import ultimate_sd_upscale

        return ultimate_sd_upscale
    if name == "adetailer":
        from .pipelines.adetailer import adetailer

        return adetailer
    raise AttributeError(name)
