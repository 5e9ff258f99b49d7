"""ADetailer orchestration: person pass + face pass over generated images.

Behavioral parity target: the GUI adetailer branch
(/root/reference/LightDiffusion.py:10621-10731): UltralyticsDetectorProvider →
BboxDetectorForEach → SAMLoader(vit_b) → SAMDetectorCombined →
SegsBitwiseAndMask → DetailerForEach, run twice (person_yolov8m-seg then
face_yolov9c) with dpmpp_2m_sde/karras/40 steps/cfg 6.5/denoise 0.5 and the
hardcoded detail-pass prompt (:10528-10531).
"""

from __future__ import annotations

import logging

import numpy as np

from .. import assets
from ..postprocess.detailer import bboxes_to_segs, detail_segs, segs_bitwise_and_mask

log = logging.getLogger(__name__)

# The reference's exact hardcoded detail-pass positive prompt (:10528-10531),
# typo included.
DETAIL_PROMPT = "royal, detailed, magnificient, beautiful, seducing"


def load_detectors(person_model: str = "person_yolov8m-seg.pt",
                   face_model: str = "face_yolov9c.pt",
                   sam_model: str = "sam_vit_b_01ec64.pth"):
    """Resolve + load the detection stack from the asset dirs; returns
    (yolo_person, yolo_face, sam_predictor), any of which may be None if the
    weight file is absent (the reference silently disables adetailer on
    failure, :10543-10544)."""
    from ..models.yolo import load_yolo
    from ..models.sam import load_sam

    def try_load(loader, name):
        try:
            return loader(assets.resolve_file("yolos", name))
        except FileNotFoundError:
            log.warning("adetailer: %s not found; pass disabled", name)
            return None
        except Exception as e:
            log.warning("adetailer: failed to load %s (%s)", name, e)
            return None

    return (
        try_load(load_yolo, person_model),
        try_load(load_yolo, face_model),
        try_load(load_sam, sam_model),
    )


def adetailer_pass(
    pipe,
    image: np.ndarray,  # (H, W, 3) [0,1]
    detector,
    sam_predictor=None,
    prompt: str = DETAIL_PROMPT,
    negative: str = "",
    bbox_threshold: float = 0.5,
    bbox_dilation: int = 10,
    crop_factor: float = 3.0,
    drop_size: int = 10,
    sam_threshold: float = 0.93,
    seed: int = 0,
    steps: int = 40,
    cfg: float = 6.5,
    sampler_name: str = "dpmpp_2m_sde",
    scheduler: str = "karras",
    denoise: float = 0.5,
    feather: int = 5,
    guide_size: float = 512.0,
    max_size: float = 768.0,
    noise_mask_feather: int = 20,
    on_seg=None,  # fn(done, total, canvas) -> False stops between segs
    on_chunk=None,  # fn(done, total, latent_np) -> False stops mid-seg
    deepcache_interval: int = 0,
    uncond_interval: int = 0,
) -> np.ndarray:
    """One detect→mask→detail pass (ref §3.3 call stack). The callbacks make
    the (slowest) detailer phase interruptible/previewable, like the
    reference's in-loop interrupt_flag polling (:922/:1076). The cached
    accelerators (deepcache/uncond_interval, composable) reach the masked
    per-seg sampling — at the 40-step default they cut the slowest phase
    the most."""
    boxes, scores, labels, masks = detector(image, conf=bbox_threshold)
    segs = bboxes_to_segs(
        image, boxes, scores, labels, threshold=bbox_threshold,
        dilation=bbox_dilation, crop_factor=crop_factor, drop_size=drop_size,
        masks=masks,
    )
    if not segs:
        return image
    log.info("adetailer: %d segments: %s",
             len(segs), [(s.label, round(s.confidence, 2)) for s in segs])
    if sam_predictor is not None:
        from ..models.sam import make_sam_mask

        sam_mask = make_sam_mask(
            sam_predictor, segs, image, threshold=sam_threshold
        )
        segs = segs_bitwise_and_mask(segs, sam_mask)

    positive = pipe.encode_text(prompt)
    negative_c = pipe.encode_text(negative)
    canvas, _ = detail_segs(
        pipe, image, segs, positive, negative_c, feather=feather, seed=seed,
        guide_size=guide_size, max_size=max_size, steps=steps, cfg=cfg,
        sampler_name=sampler_name, scheduler=scheduler, denoise=denoise,
        noise_mask=True, noise_mask_feather=noise_mask_feather,
        on_seg=on_seg, on_chunk=on_chunk,
        deepcache_interval=deepcache_interval,
        uncond_interval=uncond_interval,
    )
    return canvas


def adetailer(
    pipe,
    images: np.ndarray,  # (B, H, W, 3)
    detectors=None,  # (person, face, sam) or None → load from assets
    prompt: str = DETAIL_PROMPT,
    negative: str = "",
    seed: int = 0,
    interrupt=None,  # fn() -> True to stop (polled between passes too)
    **kwargs,
) -> np.ndarray:
    """Two detail passes: person seg then face (ref :10621-10731).
    ``interrupt``: zero-arg poll; when it returns True the current pass
    stops at the next seg/chunk boundary and the canvas so far is kept."""
    if detectors is None:
        detectors = load_detectors()
    person, face, sam_pred = detectors
    if interrupt is not None:
        kwargs.setdefault(
            "on_seg", lambda done, total, canvas: not interrupt()
        )
        kwargs.setdefault(
            "on_chunk", lambda done, total, latent: not interrupt()
        )
    out = []
    for i in range(images.shape[0]):
        img = np.asarray(images[i], np.float32)
        if person is not None and not (interrupt is not None and interrupt()):
            img = adetailer_pass(
                pipe, img, person, sam_pred, prompt, negative, seed=seed,
                **kwargs,
            )
        if face is not None and not (interrupt is not None and interrupt()):
            img = adetailer_pass(
                pipe, img, face, None, prompt, negative, seed=seed, **kwargs
            )
        out.append(img)
    return np.stack(out)
