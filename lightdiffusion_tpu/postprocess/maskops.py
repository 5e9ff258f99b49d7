"""Mask utilities: gaussian blur, dilation, bbox/crop helpers.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``tensor_gaussian_blur_mask``  :8979 (torchvision GaussianBlur)
  - ``dilate_masks``               :8524 (cv2.dilate)
  - ``get_crop_region``/``expand_crop`` :7459/:7486 (A1111 shim)
  - ``make_crop_region``           :8553

Host-side numpy implementations (masks are small; no cv2/torchvision deps).
"""

from __future__ import annotations


import numpy as np


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(int(round(3.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(mask: np.ndarray, blur: float) -> np.ndarray:
    """Separable gaussian blur; ``blur`` is the kernel radius parameter the
    reference passes (kernel_size = blur*2+1, sigma derived as torchvision
    does: 0.3*((ksize-1)*0.5 - 1) + 0.8)."""
    if blur <= 0:
        return mask
    ksize = int(blur) * 2 + 1
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    k = gaussian_kernel1d(sigma, radius=int(blur))
    out = mask.astype(np.float32)
    out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 0, out)
    out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, out)
    return out


def dilate_mask(mask: np.ndarray, dilation: int) -> np.ndarray:
    """Binary dilation (erosion for negative values), square kernel
    (ref :8524)."""
    if dilation == 0:
        return mask
    from scipy import ndimage

    it = abs(int(dilation))
    structure = np.ones((3, 3), bool)
    binary = mask > 0.5
    if dilation > 0:
        out = ndimage.binary_dilation(binary, structure, iterations=it)
    else:
        out = ndimage.binary_erosion(binary, structure, iterations=it)
    return out.astype(mask.dtype)


def get_crop_region(mask: np.ndarray, pad: int = 0):
    """Bbox of nonzero mask ± pad, clamped (ref :7459). Returns x1,y1,x2,y2."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return 0, 0, mask.shape[1], mask.shape[0]
    x1 = max(int(xs.min()) - pad, 0)
    y1 = max(int(ys.min()) - pad, 0)
    x2 = min(int(xs.max()) + 1 + pad, mask.shape[1])
    y2 = min(int(ys.max()) + 1 + pad, mask.shape[0])
    return x1, y1, x2, y2


def expand_crop(region, width, height, target_w, target_h):
    """Expand a crop region to the target aspect/size without leaving the
    image (ref :7486). Returns (x1,y1,x2,y2), (tw,th)."""
    x1, y1, x2, y2 = region
    actual_w, actual_h = x2 - x1, y2 - y1
    # grow to at least target size
    def grow(lo, hi, want, limit):
        need = want - (hi - lo)
        if need <= 0:
            return lo, hi
        lo = max(lo - need // 2, 0)
        hi = min(lo + want, limit)
        lo = max(hi - want, 0)
        return lo, hi

    x1, x2 = grow(x1, x2, min(target_w, width), width)
    y1, y2 = grow(y1, y2, min(target_h, height), height)
    return (x1, y1, x2, y2), (x2 - x1, y2 - y1)


def make_crop_region(w, h, bbox, crop_factor: float, drop_size: int = 1):
    """Expand a detection bbox by crop_factor (ref :8553)."""
    x1, y1, x2, y2 = bbox
    bw, bh = x2 - x1, y2 - y1
    cw, ch = bw * crop_factor, bh * crop_factor
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    nx1 = max(int(cx - cw / 2), 0)
    ny1 = max(int(cy - ch / 2), 0)
    nx2 = min(int(cx + cw / 2), w)
    ny2 = min(int(cy + ch / 2), h)
    return [nx1, ny1, nx2, ny2]


def paste_masked(dst: np.ndarray, src: np.ndarray, x1: int, y1: int,
                 mask: np.ndarray) -> None:
    """Alpha-composite src into dst at (x1,y1) with mask in [0,1]
    (ref tensor_paste :9546 / USDU paste :7719-7736). In place."""
    h, w = src.shape[:2]
    m = mask[..., None] if mask.ndim == 2 else mask
    region = dst[y1 : y1 + h, x1 : x1 + w]
    dst[y1 : y1 + h, x1 : x1 + w] = src * m + region * (1.0 - m)
