"""Node/op API — the reference's public surface (ComfyUI-style classes).

Behavioral parity targets (/root/reference/LightDiffusion.py §2.16, :6516-6766):
``CheckpointLoaderSimple`` :6591, ``CLIPTextEncode`` :6573,
``CLIPSetLastLayer`` :6604, ``LoraLoader`` :6611, ``EmptyLatentImage`` :6628,
``LatentUpscale`` :6639 (bislerp), ``KSampler`` :6704 / ``common_ksampler``
:6657, ``VAEDecode``/``VAEEncode`` :6580/:6585, ``SaveImage`` :6732,
``UpscaleModelLoader`` :7260, ``ImageUpscaleWithModel`` :7356.

Conventions kept from the reference so its users can switch:
  - conditioning is ``[[cond, {"pooled_output": pooled}]]``
  - latents are ``{"samples": array}`` dicts
  - images are float arrays in [0,1]
Layout differs on purpose: everything is NHWC (TPU-native), batch leading.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from . import assets
from .loader import checkpoint as CKPT
from .pipelines.sd import SDPipeline
from .ops.resize import common_upscale

MAX_RESOLUTION = 8192  # ref :6570 uses 16384/8=2048 px; we allow more


class CheckpointLoaderSimple:
    """(ref :6591) → (pipeline-model, clip, vae)."""

    def load_checkpoint(self, ckpt_name: str, policy=None, clip_skip: int = -1):
        path = assets.resolve_file("checkpoints", ckpt_name)
        sd = CKPT.load_checkpoint(path)
        pipe = SDPipeline(sd, clip_skip=clip_skip)
        return (pipe, pipe.clip, pipe.vae)


class CLIPSetLastLayer:
    """(ref :6604)"""

    def set_last_layer(self, clip, stop_at_clip_layer: int):
        clip.clip_layer(stop_at_clip_layer)
        return (clip,)


class CLIPTextEncode:
    """(ref :6573) → [[cond, {"pooled_output": pooled}]]"""

    def encode(self, clip, text: str):
        cond, pooled = clip.encode(text)
        return ([[cond, {"pooled_output": pooled}]],)


class LoraLoader:
    """(ref :6611): merges a LoRA functionally and returns a NEW pipeline."""

    def load_lora(self, model: SDPipeline, clip, lora_name: str,
                  strength_model: float, strength_clip: float):
        if strength_model == 0 and strength_clip == 0:
            return (model, clip)
        path = assets.resolve_file("loras", lora_name)
        lora_sd = CKPT.load_torch_file(path)
        new_sd = CKPT.apply_loras(
            model.sd, [(lora_sd, strength_model, strength_clip)]
        )
        pipe = SDPipeline(
            new_sd, policy=model.policy, vae_policy=model.vae_policy,
            clip_skip=model.clip.clip_skip,
        )
        return (pipe, pipe.clip)


class EmptyLatentImage:
    """(ref :6628)"""

    def generate(self, width: int, height: int, batch_size: int = 1):
        r = 8
        return ({"samples": jnp.zeros((batch_size, height // r, width // r, 4), jnp.float32)},)


class LatentUpscale:
    """(ref :6639) — bislerp and friends on latents."""

    upscale_methods = ["nearest-exact", "bilinear", "area", "bicubic", "bislerp"]

    def upscale(self, samples: dict, upscale_method: str, width: int,
                height: int, crop: str = "disabled"):
        s = common_upscale(
            samples["samples"], width // 8, height // 8, upscale_method, crop
        )
        return ({"samples": s},)


def _unpack_cond(c):
    """Node conditioning [[cond, {"pooled_output": p}]] → (cond, pooled)."""
    if isinstance(c, list):
        return (c[0][0], c[0][1].get("pooled_output"))
    return c


def common_ksampler(model: SDPipeline, seed, steps, cfg, sampler_name,
                    scheduler, positive, negative, latent, denoise=1.0,
                    disable_noise=False, control=None):
    """(ref :6657). ``control``: ControlNetApply output (beyond the ref)."""
    cond = _unpack_cond(positive)
    uncond = _unpack_cond(negative)
    out = model.sample_latent(
        latent["samples"], cond, uncond, seed=seed, steps=steps, cfg=cfg,
        sampler_name=sampler_name, scheduler=scheduler, denoise=denoise,
        disable_noise=disable_noise, control=control,
    )
    return ({"samples": out},)


class KSampler:
    """(ref KSampler2 :6704)"""

    def sample(self, model, seed, steps, cfg, sampler_name, scheduler,
               positive, negative, latent_image, denoise=1.0, control=None):
        return common_ksampler(
            model, seed, steps, cfg, sampler_name, scheduler,
            positive, negative, latent_image, denoise, control=control,
        )


class KSamplerAdvanced:
    """Advanced sampler with step-window control (the Impact-pack
    ``separated_sample``/``ksampler_wrapper`` surface, ref :9113/:9160)."""

    def sample(self, model, add_noise, noise_seed, steps, cfg, sampler_name,
               scheduler, positive, negative, latent_image,
               start_at_step=0, end_at_step=10000,
               return_with_leftover_noise="disable"):
        cond = _unpack_cond(positive)
        uncond = _unpack_cond(negative)
        out = model.sample_latent(
            latent_image["samples"], cond, uncond, seed=noise_seed,
            steps=steps, cfg=cfg, sampler_name=sampler_name,
            scheduler=scheduler,
            disable_noise=(add_noise in ("disable", False)),
            start_step=start_at_step,
            last_step=min(end_at_step, steps),
        )
        return ({"samples": out},)


class VAEDecode:
    """(ref :6580)"""

    def decode(self, vae, samples: dict):
        return (vae.decode(samples["samples"]),)


class VAEEncode:
    """(ref :6585)"""

    def encode(self, vae, pixels):
        return ({"samples": vae.encode(pixels)},)


# ------------------------------------------------------------ image save ----
def get_save_image_path(filename_prefix: str, output_dir: Path):
    """Counter-named output paths (ref :6531-6567). The prefix may carry a
    directory part ("sub/name" or "/tmp/name"): relative subfolders land
    under the output dir (the reference's ComfyUI-style split), absolute
    ones replace it."""
    pfx = Path(filename_prefix)
    output_dir = Path(output_dir)
    if pfx.is_absolute():
        output_dir = pfx.parent
    elif pfx.parent != Path("."):
        output_dir = output_dir / pfx.parent
    filename_prefix = pfx.name
    output_dir.mkdir(parents=True, exist_ok=True)
    counter = 0
    for p in output_dir.glob(f"{filename_prefix}_*.png"):
        try:
            counter = max(counter, int(p.stem.split("_")[-1]))
        except ValueError:
            pass
    return output_dir, filename_prefix, counter + 1


class SaveImage:
    """(ref :6732): PNGs under the output dir with monotonic numbering."""

    def save_images(self, images, filename_prefix: str = "LD"):
        from PIL import Image

        out_dir, prefix, counter = get_save_image_path(
            filename_prefix, assets.output_dir()
        )
        results = []
        arr = np.asarray(images)
        for i in range(arr.shape[0]):
            img = Image.fromarray(
                (np.clip(arr[i], 0, 1) * 255).astype(np.uint8)
            )
            fname = f"{prefix}_{counter + i:05d}.png"
            img.save(out_dir / fname)
            results.append(str(out_dir / fname))
        return {"ui": {"images": results}}


class ControlNetLoader:
    """Load a ControlNet from _internal/controlnet (models/controlnet.py,
    arXiv 2302.05543 — beyond the reference's node set)."""

    def load_controlnet(self, control_net_name: str):
        from .loader.checkpoint import load_controlnet

        path = assets.resolve_file("controlnet", control_net_name)
        return (load_controlnet(path),)


class ControlNetApply:
    """Attach a controlnet + hint image to the sampling call: returns the
    ``control`` tuple KSampler/sample_latent consume. ``image``:
    (B, H, W, 3) float in [0, 1] at pixel resolution."""

    def apply_controlnet(self, control_net, image, strength: float = 1.0):
        params, cfg = control_net
        return ((params, cfg, image, float(strength)),)


class UpscaleModelLoader:
    """(ref :7260): load an ESRGAN-family model from _internal/ESRGAN."""

    def load_model(self, model_name: str):
        from .models.esrgan import load_esrgan

        path = assets.resolve_file("ESRGAN", model_name)
        return (load_esrgan(path),)


class ImageUpscaleWithModel:
    """(ref :7356): tiled ESRGAN application with feathered blending."""

    def upscale(self, upscale_model, image, tile: int = 512, overlap: int = 32):
        from .models.esrgan import esrgan_apply
        from .postprocess.tiling import tiled_apply
        from .postprocess.usdu import _esrgan_tile_batch

        params, cfg = upscale_model
        out = tiled_apply(
            lambda t: jnp.clip(esrgan_apply(params, t, cfg), 0, 1),
            np.asarray(image), scale=cfg.scale, tile=tile, overlap=overlap,
            # bound tiles/call by output-side activation memory (x4 512px
            # tiles at batch 4 request ~16 GB and OOM v5e — see usdu.py)
            tile_batch=_esrgan_tile_batch(tile, cfg.scale, cfg.num_feat),
        )
        return (out,)


class UltralyticsDetectorProvider:
    """(ref :8687): load a YOLO detector from _internal/yolos."""

    def doit(self, model_name: str):
        from .models.yolo import load_yolo

        det = load_yolo(assets.resolve_file("yolos", model_name))
        return (det, det)  # (bbox_detector, segm_detector)


class SAMLoader:
    """(ref :8419): load SAM vit_b from _internal/yolos."""

    def load_model(self, model_name: str = "sam_vit_b_01ec64.pth"):
        from .models.sam import load_sam

        return (load_sam(assets.resolve_file("yolos", model_name)),)


class BboxDetectorForEach:
    """(ref :8703): detector + image → SEG list."""

    def doit(self, bbox_detector, image, threshold=0.5, dilation=10,
             crop_factor=3.0, drop_size=10):
        from .postprocess.detailer import bboxes_to_segs

        img = np.asarray(image)[0]
        boxes, scores, labels, masks = bbox_detector(img, conf=threshold)
        segs = bboxes_to_segs(
            img, boxes, scores, labels, threshold=threshold,
            dilation=dilation, crop_factor=crop_factor, drop_size=drop_size,
            masks=masks,
        )
        return (segs,)


class SAMDetectorCombined:
    """(ref :8808): SAM masks for all SEGs, combined."""

    def doit(self, sam_model, segs, image, detection_hint="center-1",
             dilation=0, threshold=0.93, bbox_expansion=0,
             mask_hint_threshold=0.7, mask_hint_use_negative="False"):
        from .models.sam import make_sam_mask

        mask = make_sam_mask(
            sam_model, segs, np.asarray(image)[0],
            detection_hint=detection_hint, threshold=threshold,
            dilation=dilation, mask_hint_threshold=mask_hint_threshold,
        )
        return (mask,)


class SegsBitwiseAndMask:
    """(ref :8867)"""

    def doit(self, segs, mask):
        from .postprocess.detailer import segs_bitwise_and_mask

        return (segs_bitwise_and_mask(segs, np.asarray(mask)),)


NODE_CLASS_MAPPINGS = {
    "CheckpointLoaderSimple": CheckpointLoaderSimple,
    "CLIPSetLastLayer": CLIPSetLastLayer,
    "CLIPTextEncode": CLIPTextEncode,
    "LoraLoader": LoraLoader,
    "EmptyLatentImage": EmptyLatentImage,
    "LatentUpscale": LatentUpscale,
    "KSampler": KSampler,
    "KSamplerAdvanced": KSamplerAdvanced,
    "VAEDecode": VAEDecode,
    "VAEEncode": VAEEncode,
    "SaveImage": SaveImage,
    "ControlNetLoader": ControlNetLoader,
    "ControlNetApply": ControlNetApply,
    "UpscaleModelLoader": UpscaleModelLoader,
    "ImageUpscaleWithModel": ImageUpscaleWithModel,
    "UltralyticsDetectorProvider": UltralyticsDetectorProvider,
    "SAMLoader": SAMLoader,
    "BboxDetectorForEach": BboxDetectorForEach,
    "SAMDetectorCombined": SAMDetectorCombined,
    "SegsBitwiseAndMask": SegsBitwiseAndMask,
}
