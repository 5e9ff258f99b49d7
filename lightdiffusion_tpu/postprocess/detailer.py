"""Impact-pack-style automatic detailer (ADetailer): detect → mask → masked
re-denoise per segment → paste.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``SEG`` container                    :8607
  - ``UltraBBoxDetector.detect``         :8622-8673 (threshold / dilation /
    crop_factor / drop_size → SEG list)
  - ``make_sam_mask`` / ``SAMDetectorCombined`` :8757/:8808
  - ``segs_bitwise_and_mask``            :8836
  - ``enhance_detail``                   :9208-9352 (guide_size upscale,
    VAE encode, masked ksampler cycles, decode, resize back)
  - ``DetailerForEach.do_detail``        :9402-9590 (per-SEG crop from the
    LIVE image, feathered mask, per-seg seed+i, paste composite)
  - ``DifferentialDiffusion`` hook       :9451-9455 (noise_mask_feather>0)

Detectors are injected callables (models/yolo.py, models/sam.py provide the
TPU-native implementations; any host detector with the same signature works).
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np
import jax.numpy as jnp

from ..ops.resize import resize
from .maskops import (
    dilate_mask,
    gaussian_blur,
    make_crop_region,
    paste_masked,
)

log = logging.getLogger(__name__)


@dataclasses.dataclass
class SEG:
    """(ref :8607)"""

    cropped_image: np.ndarray | None
    cropped_mask: np.ndarray
    confidence: float
    crop_region: list  # [x1, y1, x2, y2]
    bbox: list
    label: str


def bboxes_to_segs(
    image: np.ndarray,  # (H, W, 3)
    bboxes: np.ndarray,  # (N, 4) xyxy
    scores: np.ndarray,
    labels: list[str],
    threshold: float = 0.5,
    dilation: int = 10,
    crop_factor: float = 3.0,
    drop_size: int = 10,
    masks: np.ndarray | None = None,  # (N, H, W) soft masks (seg models)
) -> list[SEG]:
    """Detections → SEG list (ref UltraBBoxDetector.detect :8622)."""
    h, w = image.shape[:2]
    segs: list[SEG] = []
    for i in range(len(bboxes)):
        if scores[i] < threshold:
            continue
        x1, y1, x2, y2 = [int(v) for v in bboxes[i]]
        if (x2 - x1) < drop_size or (y2 - y1) < drop_size:
            continue
        if masks is not None:
            mask = np.asarray(masks[i], np.float32)
        else:
            mask = np.zeros((h, w), np.float32)
            mask[max(y1, 0):min(y2, h), max(x1, 0):min(x2, w)] = 1.0
        if dilation:
            mask = dilate_mask(mask, dilation)
        crop = make_crop_region(w, h, [x1, y1, x2, y2], crop_factor)
        cx1, cy1, cx2, cy2 = crop
        segs.append(
            SEG(
                cropped_image=image[cy1:cy2, cx1:cx2].copy(),
                cropped_mask=mask[cy1:cy2, cx1:cx2],
                confidence=float(scores[i]),
                crop_region=crop,
                bbox=[x1, y1, x2, y2],
                label=labels[i] if i < len(labels) else "",
            )
        )
    return segs


def segs_bitwise_and_mask(segs: list[SEG], mask: np.ndarray) -> list[SEG]:
    """(ref :8836/:8867)"""
    out = []
    for s in segs:
        x1, y1, x2, y2 = s.crop_region
        m = s.cropped_mask * (mask[y1:y2, x1:x2] > 0.5)
        out.append(dataclasses.replace(s, cropped_mask=m))
    return out


def _round8(v: float) -> int:
    return max(8, int(round(v / 8)) * 8)


def enhance_detail(
    pipe,
    image: np.ndarray,  # (H, W, 3) the live canvas
    seg: SEG,
    positive,
    negative,
    guide_size: float = 512.0,
    guide_size_for_bbox: bool = False,
    max_size: float = 768.0,
    seed: int = 0,
    steps: int = 20,
    cfg: float = 6.5,
    sampler_name: str = "dpmpp_2m_sde",
    scheduler: str = "karras",
    denoise: float = 0.5,
    noise_mask: bool = True,
    cycle: int = 1,
    noise_mask_feather: int = 20,
    on_chunk=None,  # fn(done, total, latent_np) -> False stops mid-pass
    deepcache_interval: int = 0,
    uncond_interval: int = 0,
) -> np.ndarray | None:
    """(ref :9208-9352) Returns the enhanced crop (crop-region sized).

    ``on_chunk``: threads into chunked sampling so the (slow, 40-step
    default) per-seg pass is interruptible/previewable — the reference
    polls app.interrupt_flag inside every sampler loop (:922/:1076); a
    False return stops sampling at the next chunk boundary and the
    partially-denoised crop is returned (matching the reference's
    break-and-continue interrupt semantics).

    ``deepcache_interval``/``uncond_interval``: the cached accelerators
    reach this masked per-seg pass (make_masked_stateful_denoiser) — at the
    reference's 40-step detail config this is the slowest phase, so the
    cadence savings matter most here."""
    x1, y1, x2, y2 = seg.crop_region
    crop = image[y1:y2, x1:x2]
    ch, cw = crop.shape[:2]
    if guide_size_for_bbox:
        bx1, by1, bx2, by2 = seg.bbox
        ref_w, ref_h = bx2 - bx1, by2 - by1
    else:
        ref_w, ref_h = cw, ch
    upscale = guide_size / min(max(ref_w, 1), max(ref_h, 1))
    new_w, new_h = cw * upscale, ch * upscale
    if max(new_w, new_h) > max_size:  # ref :9253-9267
        f = max_size / max(new_w, new_h)
        new_w, new_h = new_w * f, new_h * f
        upscale *= f
    if upscale <= 1.0 and denoise >= 1.0:
        return None
    sw, sh = _round8(new_w), _round8(new_h)

    tile = np.asarray(resize(jnp.asarray(crop[None]), sw, sh, "lanczos"))
    mask = np.asarray(
        resize(jnp.asarray(seg.cropped_mask[None, :, :, None]), sw, sh, "bilinear")
    )[0, :, :, 0]
    if noise_mask_feather > 0:
        mask = gaussian_blur(mask, noise_mask_feather // 2)

    latent = pipe.encode_image(jnp.clip(jnp.asarray(tile), 0, 1), seed=seed)
    lm = np.asarray(
        resize(
            jnp.asarray(mask[None, :, :, None]),
            latent.shape[2], latent.shape[1], "bilinear",
        )
    )
    # advanced_steps partial-denoise math (ref ksampler_wrapper :9183-9185)
    for c in range(cycle):
        if on_chunk is not None:
            latent = pipe.sample_latent_chunked(
                latent, positive, negative, seed=seed + c, steps=steps,
                cfg=cfg, sampler_name=sampler_name, scheduler=scheduler,
                denoise=denoise,
                noise_mask=jnp.asarray(lm) if noise_mask else None,
                differential_diffusion=noise_mask_feather > 0,
                on_chunk=on_chunk,
                deepcache_interval=deepcache_interval,
                uncond_interval=uncond_interval,
            )
        else:
            latent = pipe.sample_latent(
                latent, positive, negative, seed=seed + c, steps=steps,
                cfg=cfg, sampler_name=sampler_name, scheduler=scheduler,
                denoise=denoise,
                noise_mask=jnp.asarray(lm) if noise_mask else None,
                differential_diffusion=noise_mask_feather > 0,
                deepcache_interval=deepcache_interval,
                uncond_interval=uncond_interval,
            )
    decoded = np.asarray(pipe.decode(latent), np.float32)[0]
    back = np.asarray(resize(jnp.asarray(decoded[None]), cw, ch, "lanczos"))[0]
    return np.clip(back, 0.0, 1.0)


def detail_segs(
    pipe,
    image: np.ndarray,  # (H, W, 3)
    segs: list[SEG],
    positive,
    negative,
    feather: int = 5,
    seed: int = 0,
    on_seg=None,  # fn(done, total, canvas) -> False stops between segs
    on_chunk=None,  # fn(done, total, latent_np) -> False stops mid-seg
    **enhance_kwargs,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """(ref DetailerForEach.do_detail :9402) Returns (image, enhanced crops).

    Crops come from the LIVE canvas (ref :9458) so overlapping segs compose.
    ``on_seg`` is polled after every pasted segment with the live canvas
    (progress/preview hook); ``on_chunk`` makes each seg's sampling itself
    interruptible (enhance_detail) — together the detailer pass can be
    stopped within one chunk, like the reference's in-loop interrupt_flag
    polling (:922/:1076/:10794)."""
    canvas = image.copy()
    enhanced_list = []
    total = len(segs)
    for i, seg in enumerate(segs):
        if seg.cropped_mask.max() <= 0:  # empty-mask skip (ref :9465)
            if on_seg is not None and on_seg(i + 1, total, canvas) is False:
                break
            continue
        mask = gaussian_blur(seg.cropped_mask.astype(np.float32), feather) \
            if feather > 0 else seg.cropped_mask.astype(np.float32)
        enhanced = enhance_detail(
            pipe, canvas, seg, positive, negative, seed=seed + i,  # ref :9474
            on_chunk=on_chunk,
            **enhance_kwargs,
        )
        if enhanced is not None:
            x1, y1, _, _ = seg.crop_region
            paste_masked(canvas, enhanced, x1, y1, np.clip(mask, 0, 1))
            enhanced_list.append(enhanced)
        if on_seg is not None and on_seg(i + 1, total, canvas) is False:
            break
    return canvas, enhanced_list


class DetailerForEach:
    """Node facade (ref :9597 DetailerForEachTest)."""

    def doit(self, image, segs, model, clip, vae, guide_size, guide_size_for,
             max_size, seed, steps, cfg, sampler_name, scheduler, positive,
             negative, denoise, feather, noise_mask, force_inpaint,
             cycle=1, noise_mask_feather=20):
        out = []
        for i in range(np.asarray(image).shape[0]):
            canvas, _ = detail_segs(
                model, np.asarray(image)[i], segs, positive, negative,
                feather=feather, seed=seed, guide_size=guide_size,
                guide_size_for_bbox=guide_size_for, max_size=max_size,
                steps=steps, cfg=cfg, sampler_name=sampler_name,
                scheduler=scheduler, denoise=denoise, noise_mask=noise_mask,
                cycle=cycle, noise_mask_feather=noise_mask_feather,
            )
            out.append(canvas)
        return (np.stack(out),)
