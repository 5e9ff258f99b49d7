"""UltimateSDUpscale: ESRGAN pre-pass + per-tile img2img redraw + seams fix.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``UltimateSDUpscale.upscale`` node        :8236-8324
  - ``USDUpscaler`` scale-factor chain        :7794-7923
  - ``USDURedraw.linear_process``             :7945-7964 (rect mask per tile,
    per-tile img2img via ``process_images`` :7629-7739: crop → resize to tile
    → VAE encode → sample at denoise → decode → alpha paste)
  - ``USDUSeamsFix.half_tile_process``        :7978-8061 (gradient band masks)
  - tile rounding to multiples of 8           :8146-8219 monkeypatch

TPU notes: every tile resizes to exactly (tile_h, tile_w), so ONE compiled
sampling program serves all tiles; the redraw is sequential like the
reference (each tile pastes into the live canvas before the next crop).
"""

from __future__ import annotations

import logging
import math

import numpy as np
import jax.numpy as jnp

from ..ops.resize import resize
from .maskops import gaussian_blur, get_crop_region, expand_crop, paste_masked
from .tiling import tiled_apply

log = logging.getLogger(__name__)


def _round8(v: int) -> int:
    return max(8, int(round(v / 8)) * 8)


def _esrgan_tile_batch(tile: int, scale: int, feat: int = 64,
                       budget_bytes: float = 2.5e9) -> int:
    """Tiles per ESRGAN program call, bounded by output-side activation
    memory: the upsample-stage convs hold (batch, tile·scale, tile·scale,
    feat) fp32 temps that XLA pads ~2x, so a 512px tile through a x4 model
    costs ~2.1 GB PER TILE — batch 4 exceeds v5e HBM outright (measured:
    16.06G requested). Small tiles (VAE-decode scale) keep batch 4."""
    per_tile = (tile * scale) ** 2 * feat * 4 * 2
    return max(1, min(4, int(budget_bytes // max(per_tile, 1))))


def upscale_image(
    images: np.ndarray,
    target_w: int,
    target_h: int,
    esrgan=None,  # (params, cfg) or None
    tile: int = 512,
) -> np.ndarray:
    """ESRGAN chain to ≥ target then lanczos to exact size (ref :7825-7872)."""
    b, h, w, c = images.shape
    out = np.asarray(images, np.float32)
    if esrgan is not None:
        from ..models.esrgan import esrgan_apply

        params, cfg = esrgan
        while out.shape[1] < target_h or out.shape[2] < target_w:
            t = min(tile, max(out.shape[1], out.shape[2]))
            out = tiled_apply(
                lambda t_: jnp.clip(esrgan_apply(params, t_, cfg), 0, 1),
                out, scale=cfg.scale, tile=t,
                tile_batch=_esrgan_tile_batch(t, cfg.scale, cfg.num_feat),
            )
            if cfg.scale == 1:
                break
    if (out.shape[1], out.shape[2]) != (target_h, target_w):
        out = np.asarray(resize(jnp.asarray(out), target_w, target_h, "lanczos"))
    return np.clip(out, 0.0, 1.0)


def _redraw_tile(pipe, canvas, mask, positive, negative, tile_w, tile_h,
                 padding, mask_blur, steps, cfg, denoise, sampler_name,
                 scheduler, seed, accel=None):
    """One masked img2img redraw (the reference's process_images :7629).
    ``accel``: optional dict of cached-accelerator kwargs for the tile's
    sampling call (deepcache_interval/uncond_interval, composable)."""
    h, w = canvas.shape[:2]
    if mask.max() <= 0:
        return
    mask = gaussian_blur(mask, mask_blur)
    region = get_crop_region((mask > 0.01).astype(np.float32), padding)
    (x1, y1, x2, y2), _ = expand_crop(
        region, w, h, _round8(tile_w + 2 * padding), _round8(tile_h + 2 * padding)
    )
    crop = canvas[y1:y2, x1:x2]
    crop_mask = mask[y1:y2, x1:x2]
    ch, cw = crop.shape[:2]

    sw, sh = _round8(tile_w), _round8(tile_h)
    tile_px = np.asarray(
        resize(jnp.asarray(crop[None]), sw, sh, "lanczos")
    )
    latent = pipe.encode_image(jnp.clip(jnp.asarray(tile_px), 0, 1), seed=seed)
    sampled = pipe.sample_latent(
        latent, positive, negative, seed=seed, steps=steps, cfg=cfg,
        sampler_name=sampler_name, scheduler=scheduler, denoise=denoise,
        **(accel or {}),
    )
    decoded = np.asarray(pipe.decode(sampled), np.float32)
    back = np.asarray(resize(jnp.asarray(decoded), cw, ch, "lanczos"))[0]
    paste_masked(canvas, np.clip(back, 0, 1), x1, y1, np.clip(crop_mask, 0, 1))


def _redraw_tiles_batched(pipe, canvas, masks, positive, negative, tile_w,
                          tile_h, padding, mask_blur, steps, cfg, denoise,
                          sampler_name, scheduler, seed, tile_batch=4,
                          tick=None, accel=None):
    """Redraw several independent tiles in ONE batched sampling program —
    the TPU-native move (SURVEY §5.7: tiles shard as batch; the reference
    processes tiles strictly sequentially, :7945). Used for Chess waves,
    whose same-parity tiles don't overlap. Sub-batches are padded by
    repetition to `tile_batch` so one compiled program serves every wave."""
    h, w = canvas.shape[:2]
    sw, sh = _round8(tile_w), _round8(tile_h)
    jobs = []
    for m in masks:
        if m.max() <= 0:
            continue
        m = gaussian_blur(m, mask_blur)
        region = get_crop_region((m > 0.01).astype(np.float32), padding)
        (x1, y1, x2, y2), _ = expand_crop(
            region, w, h, _round8(tile_w + 2 * padding),
            _round8(tile_h + 2 * padding),
        )
        jobs.append((x1, y1, x2, y2, m))
    for lo in range(0, len(jobs), tile_batch):
        sub = jobs[lo:lo + tile_batch]
        n_real = len(sub)
        while len(sub) < min(tile_batch, len(jobs)):  # pad by repetition
            sub.append(sub[-1])
        tiles = np.stack([
            np.asarray(resize(
                jnp.asarray(canvas[y1:y2, x1:x2][None]), sw, sh, "lanczos"
            ))[0]
            for (x1, y1, x2, y2, _) in sub
        ])
        latent = pipe.encode_image(jnp.clip(jnp.asarray(tiles), 0, 1),
                                   seed=seed)
        sampled = pipe.sample_latent(
            latent, positive, negative, seed=seed, steps=steps, cfg=cfg,
            sampler_name=sampler_name, scheduler=scheduler, denoise=denoise,
            **(accel or {}),
        )
        decoded = np.asarray(pipe.decode(sampled), np.float32)
        for i in range(n_real):
            x1, y1, x2, y2, m = sub[i]
            ch_, cw_ = y2 - y1, x2 - x1
            back = np.asarray(
                resize(jnp.asarray(decoded[i:i + 1]), cw_, ch_, "lanczos")
            )[0]
            paste_masked(canvas, np.clip(back, 0, 1), x1, y1,
                         np.clip(m[y1:y2, x1:x2], 0, 1))
        if tick is not None and tick(n_real) is False:
            return


def ultimate_sd_upscale(
    pipe,
    images: np.ndarray,  # (B, H, W, 3) in [0,1]
    prompt: str = "",
    negative: str = "",
    upscale_by: float = 2.0,
    steps: int = 8,
    cfg: float = 6.0,
    denoise: float = 0.3,
    sampler_name: str = "dpmpp_2m_sde",
    scheduler: str = "karras",
    tile_width: int = 512,
    tile_height: int = 512,
    mask_blur: int = 16,
    padding: int = 32,
    seam_fix_mode: str = "Half Tile",
    seam_fix_denoise: float = 0.2,
    seam_fix_width: int = 64,
    seam_fix_mask_blur: int = 8,
    seam_fix_padding: int = 16,
    esrgan=None,
    seed: int = 0,
    mode_type: str = "Linear",
    batch_tiles: bool = True,
    on_tile=None,  # fn(done, total, canvas) -> False stops the upscale
    deepcache_interval: int = 0,
    uncond_interval: int = 0,
) -> np.ndarray:
    """Full USDU (defaults mirror the reference GUI img2img call
    :10392-10417). ``batch_tiles``: in Chess mode, redraw each parity wave
    as ONE batched sampling program (same-parity tiles are independent) —
    saturates the MXU like batch>1 txt2img; set False for strictly
    sequential reference-ordered processing.

    ``on_tile`` is polled after every redrawn tile (or batched wave chunk)
    with the LIVE canvas — the interrupt/preview hook the reference gets by
    polling app.interrupt_flag inside each tile's sampler loop (:922,
    :10794); returning False stops the pass and keeps the canvas so far."""
    positive = pipe.encode_text(prompt)
    negative_c = pipe.encode_text(negative)
    # cached accelerators (composable) for every tile/seam sampling call
    accel = {}
    if deepcache_interval > 1:
        accel["deepcache_interval"] = deepcache_interval
    if uncond_interval > 1:
        accel["uncond_interval"] = uncond_interval
    b, h, w, _ = images.shape
    target_w, target_h = round(w * upscale_by), round(h * upscale_by)
    upscaled = upscale_image(images, target_w, target_h, esrgan)

    # total tile count for progress reporting (per whole batch)
    ch0, cw0 = upscaled.shape[1:3]
    cols0 = math.ceil(cw0 / tile_width)
    rows0 = math.ceil(ch0 / tile_height)
    n_per_image = rows0 * cols0
    if seam_fix_mode == "Band Pass":
        n_per_image += (rows0 - 1) + (cols0 - 1)
    elif seam_fix_mode in ("Half Tile", "Half Tile + Intersections"):
        n_per_image += (rows0 - 1) * cols0 + (cols0 - 1) * rows0
        if seam_fix_mode == "Half Tile + Intersections":
            n_per_image += (rows0 - 1) * (cols0 - 1)
    progress = {"done": 0, "stop": False}

    def make_tick(canvas):
        def tick(k=1):
            progress["done"] += k
            if on_tile is not None and on_tile(
                progress["done"], b * n_per_image, canvas
            ) is False:
                progress["stop"] = True
                return False
            return True

        return tick

    out = []
    for i in range(b):
        canvas = upscaled[i].copy()
        tick = make_tick(canvas)
        if progress["stop"]:
            out.append(canvas)
            continue
        ch, cw = canvas.shape[:2]
        cols = math.ceil(cw / tile_width)
        rows = math.ceil(ch / tile_height)
        log.info("USDU redraw: %dx%d tiles of %dx%d", cols, rows,
                 tile_width, tile_height)

        def rect_mask(x1, y1, x2, y2):
            m = np.zeros((ch, cw), np.float32)
            m[max(y1, 0):min(y2, ch), max(x1, 0):min(x2, cw)] = 1.0
            return m

        # ---- redraw pass: Linear (ref :7945-7964) or Chess (alternating
        # parity so neighbours are redrawn in a second wave) ----
        if mode_type == "Chess" and batch_tiles:
            for parity in (0, 1):
                if progress["stop"]:
                    break
                wave = [
                    rect_mask(xi * tile_width, yi * tile_height,
                              (xi + 1) * tile_width, (yi + 1) * tile_height)
                    for yi in range(rows) for xi in range(cols)
                    if (xi + yi) % 2 == parity
                ]
                _redraw_tiles_batched(
                    pipe, canvas, wave, positive, negative_c, tile_width,
                    tile_height, padding, mask_blur, steps, cfg, denoise,
                    sampler_name, scheduler, seed, tick=tick,
                    accel=accel,
                )
            tile_order = []
        elif mode_type == "Chess":
            tile_order = [
                (yi, xi) for yi in range(rows) for xi in range(cols)
                if (xi + yi) % 2 == 0
            ] + [
                (yi, xi) for yi in range(rows) for xi in range(cols)
                if (xi + yi) % 2 == 1
            ]
        else:
            tile_order = [(yi, xi) for yi in range(rows) for xi in range(cols)]
        for yi, xi in tile_order:
            if progress["stop"]:
                break
            m = rect_mask(xi * tile_width, yi * tile_height,
                          (xi + 1) * tile_width, (yi + 1) * tile_height)
            _redraw_tile(
                pipe, canvas, m, positive, negative_c, tile_width,
                tile_height, padding, mask_blur, steps, cfg, denoise,
                sampler_name, scheduler, seed, accel=accel,
            )
            tick()

        # ---- seams fix: Band Pass (thin bands along every seam) ----
        if seam_fix_mode == "Band Pass":
            half_w = max(seam_fix_width // 2, 4)
            for yi in range(rows - 1):
                if progress["stop"]:
                    break
                band_y = (yi + 1) * tile_height
                m = rect_mask(0, band_y - half_w, cw, band_y + half_w)
                _redraw_tile(
                    pipe, canvas, m, positive, negative_c, cw,
                    seam_fix_width, seam_fix_padding, seam_fix_mask_blur,
                    steps, cfg, seam_fix_denoise, sampler_name, scheduler,
                    seed, accel=accel,
                )
                tick()
            for xi in range(cols - 1):
                if progress["stop"]:
                    break
                band_x = (xi + 1) * tile_width
                m = rect_mask(band_x - half_w, 0, band_x + half_w, ch)
                _redraw_tile(
                    pipe, canvas, m, positive, negative_c, seam_fix_width,
                    ch, seam_fix_padding, seam_fix_mask_blur, steps, cfg,
                    seam_fix_denoise, sampler_name, scheduler, seed,
                    accel=accel,
                )
                tick()

        # ---- seams fix: Half Tile (ref :7978-8061) ----
        if seam_fix_mode in ("Half Tile", "Half Tile + Intersections"):
            def _feather(span: int) -> np.ndarray:
                return np.concatenate(
                    [np.linspace(0, 1, span // 2),
                     np.linspace(1, 0, span - span // 2)]
                ).astype(np.float32)

            grad_y = _feather(tile_height)  # horizontal seams span tile_height
            grad_x = _feather(tile_width)   # vertical seams span tile_width
            # horizontal seams (rows boundaries)
            for yi in range(rows - 1):
                band_y = (yi + 1) * tile_height
                for xi in range(cols):
                    if progress["stop"]:
                        break
                    m = np.zeros((ch, cw), np.float32)
                    y1 = band_y - tile_height // 2
                    y2 = band_y + tile_height // 2
                    ys = slice(max(y1, 0), min(y2, ch))
                    # slice the ramp at the clamp offset so edge bands keep
                    # the portion corresponding to their position
                    g = grad_y[ys.start - y1 : ys.start - y1 + ys.stop - ys.start]
                    m[ys, xi * tile_width : (xi + 1) * tile_width] = g[:, None]
                    _redraw_tile(
                        pipe, canvas, m, positive, negative_c, tile_width,
                        tile_height, seam_fix_padding, seam_fix_mask_blur,
                        steps, cfg, seam_fix_denoise, sampler_name,
                        scheduler, seed, accel=accel,
                    )
                    tick()
            # vertical seams
            for xi in range(cols - 1):
                band_x = (xi + 1) * tile_width
                for yi in range(rows):
                    if progress["stop"]:
                        break
                    m = np.zeros((ch, cw), np.float32)
                    x1 = band_x - tile_width // 2
                    x2 = band_x + tile_width // 2
                    xs = slice(max(x1, 0), min(x2, cw))
                    g = grad_x[xs.start - x1 : xs.start - x1 + xs.stop - xs.start]
                    m[yi * tile_height : (yi + 1) * tile_height, xs] = g[None, :]
                    _redraw_tile(
                        pipe, canvas, m, positive, negative_c, tile_width,
                        tile_height, seam_fix_padding, seam_fix_mask_blur,
                        steps, cfg, seam_fix_denoise, sampler_name,
                        scheduler, seed, accel=accel,
                    )
                    tick()
        # ---- seams fix: + Intersections (radial masks at tile corners) ----
        if seam_fix_mode == "Half Tile + Intersections":
            yy, xx = np.mgrid[0:tile_height, 0:tile_width].astype(np.float32)
            cyx = (tile_height / 2, tile_width / 2)
            r = np.sqrt((yy - cyx[0]) ** 2 + (xx - cyx[1]) ** 2)
            radial = np.clip(1.0 - r / (min(tile_width, tile_height) / 2), 0, 1)
            for yi in range(rows - 1):
                for xi in range(cols - 1):
                    if progress["stop"]:
                        break
                    m = np.zeros((ch, cw), np.float32)
                    y0 = (yi + 1) * tile_height - tile_height // 2
                    x0 = (xi + 1) * tile_width - tile_width // 2
                    ys = slice(max(y0, 0), min(y0 + tile_height, ch))
                    xs = slice(max(x0, 0), min(x0 + tile_width, cw))
                    m[ys, xs] = radial[: ys.stop - ys.start, : xs.stop - xs.start]
                    _redraw_tile(
                        pipe, canvas, m, positive, negative_c, tile_width,
                        tile_height, seam_fix_padding, seam_fix_mask_blur,
                        steps, cfg, seam_fix_denoise, sampler_name,
                        scheduler, seed, accel=accel,
                    )
                    tick()
        out.append(canvas)
    return np.stack(out)


class UltimateSDUpscale:
    """Node facade (ref :8236)."""

    def upscale(self, image, model, positive_prompt, negative_prompt, vae=None,
                upscale_by=2.0, seed=0, steps=8, cfg=6.0,
                sampler_name="dpmpp_2m_sde", scheduler="karras", denoise=0.3,
                upscale_model=None, mode_type="Linear", tile_width=512,
                tile_height=512, mask_blur=16, tile_padding=32,
                seam_fix_mode="Half Tile", seam_fix_denoise=0.2,
                seam_fix_mask_blur=8, seam_fix_width=64, seam_fix_padding=16,
                force_uniform_tiles=True, batch_tiles=True, on_tile=None):
        """``batch_tiles=False`` restores the reference's strictly
        sequential tile ordering (each tile sees its neighbours' feather
        zones); True batches Chess waves into one program per wave."""
        out = ultimate_sd_upscale(
            model, np.asarray(image), positive_prompt, negative_prompt,
            upscale_by=upscale_by, steps=steps, cfg=cfg, denoise=denoise,
            sampler_name=sampler_name, scheduler=scheduler,
            tile_width=tile_width, tile_height=tile_height,
            mask_blur=mask_blur, padding=tile_padding,
            seam_fix_mode=seam_fix_mode, seam_fix_denoise=seam_fix_denoise,
            seam_fix_width=seam_fix_width, seam_fix_mask_blur=seam_fix_mask_blur,
            seam_fix_padding=seam_fix_padding, esrgan=upscale_model, seed=seed,
            mode_type=mode_type, batch_tiles=batch_tiles, on_tile=on_tile,
        )
        return (out,)
