"""Tiled model application with feathered blending.

Behavioral parity target: ``tiled_scale``
(/root/reference/LightDiffusion.py:7282-7353): 512px tiles, 32px overlap,
linear feather masks on tile borders, out/out_div accumulation.

TPU design: tiles are gathered into ONE batched tensor and run through the
model in a single call (batch = grid size) — the reference loops tiles
serially on GPU; on TPU the batch dimension keeps the MXU fed and tiles are
trivially shardable over the mesh ("dp"). Scatter-add blending happens on
host numpy (cheap, bandwidth-bound).
"""

from __future__ import annotations


import numpy as np
import jax.numpy as jnp


def _feather_mask(th: int, tw: int, overlap: int) -> np.ndarray:
    """Linear border feather (ref :7326-7336)."""
    mask = np.ones((th, tw, 1), np.float32)
    feather = overlap
    for t in range(feather):
        a = (t + 1) / feather
        mask[t, :, :] *= a
        mask[th - 1 - t, :, :] *= a
        mask[:, t, :] *= a
        mask[:, tw - 1 - t, :] *= a
    return mask


def tile_grid(h: int, w: int, tile: int, overlap: int):
    """Tile origin coordinates covering (h, w)."""
    ys = list(range(0, max(h - overlap, 1), tile - overlap))
    xs = list(range(0, max(w - overlap, 1), tile - overlap))
    ys = [min(y, max(h - tile, 0)) for y in ys]
    xs = [min(x, max(w - tile, 0)) for x in xs]
    # dedupe while keeping order
    ys = list(dict.fromkeys(ys))
    xs = list(dict.fromkeys(xs))
    return [(y, x) for y in ys for x in xs]


def tiled_apply(
    fn,
    images: np.ndarray,  # (B, H, W, C)
    scale: float,
    tile: int = 512,
    overlap: int = 32,
    tile_batch: int = 4,
    out_channels: int | None = None,
) -> np.ndarray:
    """Apply fn (NHWC→NHWC, ×scale) over overlapping tiles, feather-blend.

    fn receives (N, tile, tile, C) batches (padded tiles at borders), so one
    compiled program serves every tile. ``scale`` may be fractional (e.g.
    1/8 for tiled VAE *encode*) as long as tile·scale and the grid
    coordinates·scale are integral.
    """
    b, h, w, c = images.shape
    images = np.asarray(images, np.float32)
    tile = min(tile, max(h, w))
    if overlap > tile // 2:  # small tiles: keep the grid stride > 0
        overlap = tile // 2
        if 0 < scale < 1:  # keep overlap·scale integral (tiled VAE encode)
            r = int(round(1 / scale))
            overlap -= overlap % r
    # pad image so every tile is full-size (static shapes for the model)
    ph, pw = max(tile - h, 0), max(tile - w, 0)
    if ph or pw:
        images = np.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    h2, w2 = images.shape[1:3]

    coords = tile_grid(h2, w2, tile, overlap)

    def s(v: float) -> int:
        sv = v * scale
        assert abs(sv - round(sv)) < 1e-6, (v, scale)
        return int(round(sv))

    oc = out_channels if out_channels is not None else c
    out = np.zeros((b, s(h2), s(w2), oc), np.float32)
    div = np.zeros((b, s(h2), s(w2), 1), np.float32)
    mask = _feather_mask(s(tile), s(tile), max(s(overlap), 1))

    tiles = np.stack(
        [images[i, y : y + tile, x : x + tile] for i in range(b) for (y, x) in coords]
    )
    n = tiles.shape[0]
    # never pad PAST the real tile count: a 1-tile job must not balloon to
    # a batch-4 program (4x the FLOPs and activation memory for nothing —
    # the r5 USDU bench row OOMed exactly this way at ESRGAN x4 512px)
    tile_batch = max(1, min(tile_batch, n))
    # pad the tile batch so every model call has the same static batch size
    pad_n = (-n) % tile_batch
    if pad_n:
        tiles = np.concatenate([tiles, np.repeat(tiles[-1:], pad_n, 0)], axis=0)
    results = []
    for start in range(0, tiles.shape[0], tile_batch):
        batch = jnp.asarray(tiles[start : start + tile_batch])
        results.append(np.asarray(fn(batch), np.float32))
    results = np.concatenate(results, axis=0)[:n]

    k = 0
    for i in range(b):
        for (y, x) in coords:
            ys, xs = s(y), s(x)
            ts = s(tile)
            out[i, ys : ys + ts, xs : xs + ts] += results[k] * mask
            div[i, ys : ys + ts, xs : xs + ts] += mask
            k += 1
    blended = out / np.maximum(div, 1e-8)
    return blended[:, : s(h), : s(w)]
