"""YOLOv8 detection / instance segmentation, TPU-native NHWC.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``load_yolo``                 :8464 (external ultralytics → here a JAX port)
  - ``inference_bbox``            :8471 (boxes → rectangle masks)
  - ``UltraBBoxDetector.detect``  :8622-8673
  - ``UltralyticsDetectorProvider``:8687

The reference delegates to the ultralytics CUDA package; this is a from-
scratch JAX implementation of the (public) YOLOv8 architecture: CSPDarknet
backbone with C2f blocks + SPPF, PAN-FPN neck, decoupled DFL detect head,
optional Segment head (mask protos + coefficients — used by
person_yolov8m-seg). BatchNorm folds into convs at load; NMS runs on host.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as L


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    depth: float = 0.67  # yolov8m defaults
    width: float = 0.75
    max_channels: int = 768
    nc: int = 80
    seg: bool = False  # Segment head (protos + mask coeffs)
    reg_max: int = 16
    nm: int = 32  # mask coefficients (seg)

    def ch(self, c: int) -> int:
        return int(math.ceil(min(c, self.max_channels) * self.width / 8) * 8)

    def n(self, n: int) -> int:
        return max(round(n * self.depth), 1)


YOLOV8N = YoloConfig(depth=0.34, width=0.25, max_channels=1024)
YOLOV8S = YoloConfig(depth=0.34, width=0.50, max_channels=1024)
YOLOV8M = YoloConfig(depth=0.67, width=0.75, max_channels=768)


def _conv(p, x, stride=1, policy=L.FP32, k=3):
    """Conv+SiLU with torch padding=k//2 semantics (BN pre-folded)."""
    kh = p["weight"].shape[0]
    pad = "VALID" if kh == 1 else [(kh // 2, kh // 2)] * 2
    y = L.conv2d(p, x, stride=stride, padding=pad, policy=policy)
    return jax.nn.silu(y)


def _bottleneck(p, x, shortcut, policy):
    y = _conv(p["cv1"], x, policy=policy)
    y = _conv(p["cv2"], y, policy=policy)
    return x + y if shortcut else y


def _c2f(p, x, shortcut, policy):
    y = _conv(p["cv1"], x, policy=policy, k=1)
    a, b = jnp.split(y, 2, axis=-1)
    chunks = [a, b]
    for m in p["m"]:
        chunks.append(_bottleneck(m, chunks[-1], shortcut, policy))
    return _conv(p["cv2"], jnp.concatenate(chunks, axis=-1), policy=policy, k=1)


def _maxpool5(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )


def _sppf(p, x, policy):
    y = _conv(p["cv1"], x, policy=policy, k=1)
    y1 = _maxpool5(y)
    y2 = _maxpool5(y1)
    y3 = _maxpool5(y2)
    return _conv(p["cv2"], jnp.concatenate([y, y1, y2, y3], axis=-1), policy=policy, k=1)


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _detect_branch(p, x, policy):
    y = _conv(p["0"], x, policy=policy)
    y = _conv(p["1"], y, policy=policy)
    return L.conv2d(p["2"], y, policy=policy)  # no act on final 1x1


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def yolo_apply(params, x, cfg: YoloConfig, policy: L.Policy = L.FP32):
    """x: (B, H, W, 3) in [0,1], H/W multiples of 32.

    Returns dict: boxes_raw (B, A, 4·reg_max), cls (B, A, nc), anchors (A,2),
    strides (A,), and for seg: coeffs (B, A, nm), protos (B, H/4, W/4, nm).
    """
    x = x.astype(policy.compute_dtype)
    # backbone
    feats = {}
    h = _conv(params["0"], x, stride=2, policy=policy)
    h = _conv(params["1"], h, stride=2, policy=policy)
    h = _c2f(params["2"], h, True, policy)
    h = _conv(params["3"], h, stride=2, policy=policy)
    h = _c2f(params["4"], h, True, policy)
    feats["p3"] = h
    h = _conv(params["5"], h, stride=2, policy=policy)
    h = _c2f(params["6"], h, True, policy)
    feats["p4"] = h
    h = _conv(params["7"], h, stride=2, policy=policy)
    h = _c2f(params["8"], h, True, policy)
    h = _sppf(params["9"], h, policy)
    feats["p5"] = h
    # neck (PAN-FPN)
    u = jnp.concatenate([_up2(feats["p5"]), feats["p4"]], axis=-1)
    p4 = _c2f(params["12"], u, False, policy)
    u = jnp.concatenate([_up2(p4), feats["p3"]], axis=-1)
    p3 = _c2f(params["15"], u, False, policy)
    d = _conv(params["16"], p3, stride=2, policy=policy)
    p4 = _c2f(params["18"], jnp.concatenate([d, p4], axis=-1), False, policy)
    d = _conv(params["19"], p4, stride=2, policy=policy)
    p5 = _c2f(params["21"], jnp.concatenate([d, feats["p5"]], axis=-1), False, policy)

    # head
    head = params["head"]
    boxes, cls, coeffs = [], [], []
    anchors, strides = [], []
    b = x.shape[0]
    for i, (feat, stride) in enumerate(zip((p3, p4, p5), (8, 16, 32))):
        box = _detect_branch(head["cv2"][i], feat, policy)
        c = _detect_branch(head["cv3"][i], feat, policy)
        fh, fw = feat.shape[1:3]
        boxes.append(box.reshape(b, fh * fw, 4 * cfg.reg_max))
        cls.append(c.reshape(b, fh * fw, cfg.nc))
        ys, xs = jnp.meshgrid(
            jnp.arange(fh, dtype=jnp.float32) + 0.5,
            jnp.arange(fw, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        anchors.append(jnp.stack([xs.ravel(), ys.ravel()], axis=-1))
        strides.append(jnp.full((fh * fw,), float(stride)))
        if cfg.seg:
            mc = _detect_branch(head["cv4"][i], feat, policy)
            coeffs.append(mc.reshape(b, fh * fw, cfg.nm))

    out = {
        "boxes_raw": jnp.concatenate(boxes, axis=1).astype(jnp.float32),
        "cls": jnp.concatenate(cls, axis=1).astype(jnp.float32),
        "anchors": jnp.concatenate(anchors, axis=0),
        "strides": jnp.concatenate(strides, axis=0),
    }
    if cfg.seg:
        pr = _conv(head["proto"]["cv1"], p3, policy=policy)
        pr = _conv_transpose2x2(head["proto"]["upsample"], pr)
        pr = _conv(head["proto"]["cv2"], pr, policy=policy)
        pr = _conv(head["proto"]["cv3"], pr, policy=policy)
        out["protos"] = pr.astype(jnp.float32)  # (B, H/4, W/4, nm)
        out["coeffs"] = jnp.concatenate(coeffs, axis=1).astype(jnp.float32)
    return out


def _conv_transpose2x2(p, x):
    """torch ConvTranspose2d(c, c, 2, stride=2): each pixel → 2×2 block.
    weight stored (2, 2, in, out)."""
    w = p["weight"].astype(x.dtype)
    y = jnp.einsum("bhwi,klio->bhkwlo", x, w)
    b, h, _, w_, _, o = y.shape
    y = y.reshape(b, h * 2, w_ * 2, o)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def decode_boxes(out: dict, reg_max: int = 16) -> np.ndarray:
    """DFL expectation → ltrb distances → xyxy (input-pixel coords)."""
    raw = np.asarray(out["boxes_raw"])  # (B, A, 4*reg_max)
    b, a, _ = raw.shape
    logits = raw.reshape(b, a, 4, reg_max)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    dist = (probs * np.arange(reg_max, dtype=np.float32)).sum(-1)  # (B,A,4) ltrb
    anchors = np.asarray(out["anchors"])  # (A,2) xy
    strides = np.asarray(out["strides"])[:, None]
    x1y1 = (anchors - dist[..., :2]) * strides
    x2y2 = (anchors + dist[..., 2:]) * strides
    return np.concatenate([x1y1, x2y2], axis=-1)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.45,
        max_det: int = 300) -> np.ndarray:
    """Greedy IoU NMS on host. Returns kept indices."""
    order = np.argsort(-scores)
    keep = []
    while order.size and len(keep) < max_det:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, np.int64)


class YoloDetector:
    """inference_bbox equivalent (ref :8471): detect → (bboxes, scores,
    labels[, masks]) in original-image pixel coords."""

    def __init__(self, params, cfg: YoloConfig, class_names=None,
                 input_size: int = 640, apply_fn=None):
        self.params = params
        self.cfg = cfg
        self.class_names = class_names or {}
        self.input_size = input_size
        self.apply_fn = apply_fn or yolo_apply

    def __call__(self, image: np.ndarray, conf: float = 0.25,
                 iou: float = 0.45):
        from ..ops.resize import resize

        h, w = image.shape[:2]
        s = self.input_size
        scale = min(s / h, s / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = np.asarray(resize(jnp.asarray(image[None]), nw, nh, "bilinear"))[0]
        canvas = np.full((s, s, 3), 0.447, np.float32)  # letterbox gray
        canvas[:nh, :nw] = resized

        out = self.apply_fn(self.params, jnp.asarray(canvas[None]), self.cfg)
        boxes = decode_boxes(out, self.cfg.reg_max)[0]
        cls = np.asarray(jax.nn.sigmoid(out["cls"]))[0]
        scores = cls.max(-1)
        labels_i = cls.argmax(-1)
        sel = scores >= conf
        boxes, scores, labels_i = boxes[sel], scores[sel], labels_i[sel]
        keep = nms(boxes, scores, iou)
        boxes, scores, labels_i = boxes[keep], scores[keep], labels_i[keep]

        masks = None
        if self.cfg.seg and len(keep):
            coeffs = np.asarray(out["coeffs"])[0][sel][keep]  # (N, nm)
            protos = np.asarray(out["protos"])[0]  # (s/4, s/4, nm)
            m = 1 / (1 + np.exp(-(protos @ coeffs.T)))  # (s/4, s/4, N)
            m = np.transpose(m, (2, 0, 1))
            full = np.asarray(
                resize(jnp.asarray(m[..., None]), s, s, "bilinear")
            )[..., 0]
            # crop to letterbox content, resize to original image
            full = full[:, :nh, :nw]
            masks = np.asarray(
                resize(jnp.asarray(full[..., None]), w, h, "bilinear")
            )[..., 0]
            masks = (masks > 0.5).astype(np.float32)

        boxes = boxes / scale
        if masks is not None:
            # crop each mask to its box (ultralytics process_mask semantics)
            for n in range(masks.shape[0]):
                bx1, by1, bx2, by2 = [int(v) for v in boxes[n]]
                cropped = np.zeros_like(masks[n])
                cropped[max(by1, 0):by2, max(bx1, 0):bx2] = \
                    masks[n, max(by1, 0):by2, max(bx1, 0):bx2]
                masks[n] = cropped
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
        labels = [self.class_names.get(int(i), str(int(i))) for i in labels_i]
        return boxes, scores, labels, masks


# ----------------------------------------------------------- YOLOv9 ---------
# GELAN backbone (yolov9c/e — the reference's default detail models,
# hand_yolov9c/face_yolov9c, LightDiffusion.py:57-75): RepNCSPELAN4 blocks,
# ADown downsampling, SPPELAN, same DFL detect head as v8. RepConvN branches
# (3×3 + 1×1, each with BN) fuse into single 3×3 convs at load.

def _avgpool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), "VALID"
    ) / 4.0


def _maxpool(x, k, stride, pad):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


def _repncsp(p, x, policy):
    """C3-style block of (fused) RepN bottlenecks."""
    y1 = _conv(p["cv1"], x, policy=policy)
    for m in p["m"]:
        h = _conv(m["cv1"], y1, policy=policy)  # fused RepConvN → 3×3 conv
        h = _conv(m["cv2"], h, policy=policy)
        # residual iff channels preserved (static shapes decide at trace)
        add = m["cv1"]["weight"].shape[2] == m["cv2"]["weight"].shape[3]
        y1 = y1 + h if add else h
    y2 = _conv(p["cv2"], x, policy=policy)
    return _conv(p["cv3"], jnp.concatenate([y1, y2], axis=-1), policy=policy)


def _repncspelan4(p, x, policy):
    y = _conv(p["cv1"], x, policy=policy)
    a, b = jnp.split(y, 2, axis=-1)
    chunks = [a, b]
    for branch in (p["cv2"], p["cv3"]):
        h = _repncsp(branch["csp"], chunks[-1], policy)
        h = _conv(branch["conv"], h, policy=policy)
        chunks.append(h)
    return _conv(p["cv4"], jnp.concatenate(chunks, axis=-1), policy=policy)


def _adown(p, x, policy):
    x = _avgpool2(x)
    x1, x2 = jnp.split(x, 2, axis=-1)
    x1 = _conv(p["cv1"], x1, stride=2, policy=policy)
    x2 = _maxpool(x2, 3, 2, 1)
    x2 = _conv(p["cv2"], x2, policy=policy)
    return jnp.concatenate([x1, x2], axis=-1)


def _sppelan(p, x, policy):
    y = [_conv(p["cv1"], x, policy=policy)]
    for _ in range(3):
        y.append(_maxpool(y[-1], 5, 1, 2))
    return _conv(p["cv5"], jnp.concatenate(y, axis=-1), policy=policy)


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def yolov9_apply(params, x, cfg: YoloConfig, policy: L.Policy = L.FP32):
    """yolov9-c GELAN forward. Same output contract as yolo_apply."""
    x = x.astype(policy.compute_dtype)
    h = _conv(params["0"], x, stride=2, policy=policy)
    h = _conv(params["1"], h, stride=2, policy=policy)
    h = _repncspelan4(params["2"], h, policy)
    h = _adown(params["3"], h, policy)
    p3 = _repncspelan4(params["4"], h, policy)
    h = _adown(params["5"], p3, policy)
    p4 = _repncspelan4(params["6"], h, policy)
    h = _adown(params["7"], p4, policy)
    h = _repncspelan4(params["8"], h, policy)
    p5 = _sppelan(params["9"], h, policy)
    # PAN head
    u = jnp.concatenate([_up2(p5), p4], axis=-1)
    n4 = _repncspelan4(params["12"], u, policy)
    u = jnp.concatenate([_up2(n4), p3], axis=-1)
    n3 = _repncspelan4(params["15"], u, policy)
    d = _adown(params["16"], n3, policy)
    n4 = _repncspelan4(params["18"], jnp.concatenate([d, n4], axis=-1), policy)
    d = _adown(params["19"], n4, policy)
    n5 = _repncspelan4(params["21"], jnp.concatenate([d, p5], axis=-1), policy)

    head = params["head"]
    boxes, cls, coeffs = [], [], []
    anchors, strides = [], []
    b = x.shape[0]
    for i, (feat, stride) in enumerate(zip((n3, n4, n5), (8, 16, 32))):
        box = _detect_branch(head["cv2"][i], feat, policy)
        c = _detect_branch(head["cv3"][i], feat, policy)
        fh, fw = feat.shape[1:3]
        boxes.append(box.reshape(b, fh * fw, 4 * cfg.reg_max))
        cls.append(c.reshape(b, fh * fw, cfg.nc))
        ys, xs = jnp.meshgrid(
            jnp.arange(fh, dtype=jnp.float32) + 0.5,
            jnp.arange(fw, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        anchors.append(jnp.stack([xs.ravel(), ys.ravel()], axis=-1))
        strides.append(jnp.full((fh * fw,), float(stride)))
        if cfg.seg:
            mc = _detect_branch(head["cv4"][i], feat, policy)
            coeffs.append(mc.reshape(b, fh * fw, cfg.nm))
    out = {
        "boxes_raw": jnp.concatenate(boxes, axis=1).astype(jnp.float32),
        "cls": jnp.concatenate(cls, axis=1).astype(jnp.float32),
        "anchors": jnp.concatenate(anchors, axis=0),
        "strides": jnp.concatenate(strides, axis=0),
    }
    if cfg.seg:
        pr = _conv(head["proto"]["cv1"], n3, policy=policy)
        pr = _conv_transpose2x2(head["proto"]["upsample"], pr)
        pr = _conv(head["proto"]["cv2"], pr, policy=policy)
        pr = _conv(head["proto"]["cv3"], pr, policy=policy)
        out["protos"] = pr.astype(jnp.float32)
        out["coeffs"] = jnp.concatenate(coeffs, axis=1).astype(jnp.float32)
    return out


# ----------------------------------------------------------- conversion -----
def _fold_bn(conv_w, bn_w, bn_b, bn_mean, bn_var, eps=1e-3):
    """Fold BatchNorm into conv: returns (HWIO weight, bias)."""
    scale = bn_w / np.sqrt(bn_var + eps)
    w = conv_w * scale[:, None, None, None]  # OIHW
    b = bn_b - bn_mean * scale
    return w.transpose(2, 3, 1, 0), b


def _conv_bn(sd, pfx, dtype):
    w, b = _fold_bn(
        np.asarray(sd[f"{pfx}.conv.weight"], np.float32),
        np.asarray(sd[f"{pfx}.bn.weight"], np.float32),
        np.asarray(sd[f"{pfx}.bn.bias"], np.float32),
        np.asarray(sd[f"{pfx}.bn.running_mean"], np.float32),
        np.asarray(sd[f"{pfx}.bn.running_var"], np.float32),
    )
    return {"weight": jnp.asarray(w, dtype), "bias": jnp.asarray(b, dtype)}


def _plain_conv(sd, pfx, dtype):
    w = np.asarray(sd[f"{pfx}.weight"], np.float32).transpose(2, 3, 1, 0)
    p = {"weight": jnp.asarray(w, dtype)}
    if f"{pfx}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{pfx}.bias"], np.float32), dtype)
    return p


def _c2f_p(sd, pfx, dtype):
    m = []
    j = 0
    while f"{pfx}.m.{j}.cv1.conv.weight" in sd:
        m.append({
            "cv1": _conv_bn(sd, f"{pfx}.m.{j}.cv1", dtype),
            "cv2": _conv_bn(sd, f"{pfx}.m.{j}.cv2", dtype),
        })
        j += 1
    return {
        "cv1": _conv_bn(sd, f"{pfx}.cv1", dtype),
        "cv2": _conv_bn(sd, f"{pfx}.cv2", dtype),
        "m": tuple(m),
    }


def _branch_p(sd, pfx, dtype):
    return {
        "0": _conv_bn(sd, f"{pfx}.0", dtype),
        "1": _conv_bn(sd, f"{pfx}.1", dtype),
        "2": _plain_conv(sd, f"{pfx}.2", dtype),
    }


def convert_yolov8(sd: dict, dtype=jnp.float32):
    """ultralytics state dict (model.N.* naming) → (params, YoloConfig)."""
    # strip "model." prefixes down to bare layer indices
    while any(k.startswith("model.model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    if any(k.startswith("model.0.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    # find head index (Detect/Segment is the last module)
    head_idx = max(int(k.split(".")[0]) for k in sd if k.split(".")[0].isdigit())
    seg = f"{head_idx}.proto.cv1.conv.weight" in sd
    nc = sd[f"{head_idx}.cv3.0.2.weight"].shape[0]
    c1 = sd["0.conv.weight"].shape[0]  # ch(64)
    width = c1 / 64 if c1 <= 64 else 1.0
    # depth from number of bottlenecks in layer 2 (base 3)
    n2 = 0
    while f"2.m.{n2}.cv1.conv.weight" in sd:
        n2 += 1
    depth = n2 / 3
    c5 = sd["9.cv2.conv.weight"].shape[0]  # ch(1024) = min(1024,maxc)*w
    max_channels = int(round(c5 / width / 8) * 8) if width else 1024
    reg_max = sd[f"{head_idx}.cv2.0.2.weight"].shape[0] // 4
    nm = sd[f"{head_idx}.cv4.0.2.weight"].shape[0] if seg else 32
    cfg = YoloConfig(depth=depth, width=width, max_channels=max_channels,
                     nc=nc, seg=seg, reg_max=reg_max, nm=nm)

    params = {}
    for i in ("0", "1", "3", "5", "7", "16", "19"):
        params[i] = _conv_bn(sd, i, dtype)
    for i in ("2", "4", "6", "8", "12", "15", "18", "21"):
        params[i] = _c2f_p(sd, i, dtype)
    params["9"] = {
        "cv1": _conv_bn(sd, "9.cv1", dtype),
        "cv2": _conv_bn(sd, "9.cv2", dtype),
    }
    head = {
        "cv2": tuple(_branch_p(sd, f"{head_idx}.cv2.{i}", dtype) for i in range(3)),
        "cv3": tuple(_branch_p(sd, f"{head_idx}.cv3.{i}", dtype) for i in range(3)),
    }
    if seg:
        head["cv4"] = tuple(
            _branch_p(sd, f"{head_idx}.cv4.{i}", dtype) for i in range(3)
        )
        up_w = np.asarray(sd[f"{head_idx}.proto.upsample.weight"], np.float32)
        head["proto"] = {
            "cv1": _conv_bn(sd, f"{head_idx}.proto.cv1", dtype),
            # ConvTranspose2d weight is (in, out, kh, kw) → (kh, kw, in, out)
            "upsample": {
                "weight": jnp.asarray(up_w.transpose(2, 3, 0, 1), dtype),
                "bias": jnp.asarray(
                    np.asarray(sd[f"{head_idx}.proto.upsample.bias"], np.float32),
                    dtype,
                ),
            },
            "cv2": _conv_bn(sd, f"{head_idx}.proto.cv2", dtype),
            "cv3": _conv_bn(sd, f"{head_idx}.proto.cv3", dtype),
        }
    params["head"] = head
    return params, cfg


def _fuse_repconvn(sd, pfx, dtype):
    """RepConvN (3×3 + 1×1 branches, each BN'd) → one fused 3×3 conv."""
    w3, b3 = _fold_bn(
        np.asarray(sd[f"{pfx}.conv1.conv.weight"], np.float32),
        np.asarray(sd[f"{pfx}.conv1.bn.weight"], np.float32),
        np.asarray(sd[f"{pfx}.conv1.bn.bias"], np.float32),
        np.asarray(sd[f"{pfx}.conv1.bn.running_mean"], np.float32),
        np.asarray(sd[f"{pfx}.conv1.bn.running_var"], np.float32),
    )
    w1, b1 = _fold_bn(
        np.asarray(sd[f"{pfx}.conv2.conv.weight"], np.float32),
        np.asarray(sd[f"{pfx}.conv2.bn.weight"], np.float32),
        np.asarray(sd[f"{pfx}.conv2.bn.bias"], np.float32),
        np.asarray(sd[f"{pfx}.conv2.bn.running_mean"], np.float32),
        np.asarray(sd[f"{pfx}.conv2.bn.running_var"], np.float32),
    )
    # w are HWIO; pad the 1×1 into the center of a 3×3
    w1_pad = np.zeros_like(w3)
    w1_pad[1:2, 1:2] = w1
    return {
        "weight": jnp.asarray(w3 + w1_pad, dtype),
        "bias": jnp.asarray(b3 + b1, dtype),
    }


def _repncsp_p(sd, pfx, dtype):
    m = []
    j = 0
    while f"{pfx}.m.{j}.cv1.conv1.conv.weight" in sd:
        m.append({
            "cv1": _fuse_repconvn(sd, f"{pfx}.m.{j}.cv1", dtype),
            "cv2": _conv_bn(sd, f"{pfx}.m.{j}.cv2", dtype),
        })
        j += 1
    return {
        "cv1": _conv_bn(sd, f"{pfx}.cv1", dtype),
        "cv2": _conv_bn(sd, f"{pfx}.cv2", dtype),
        "cv3": _conv_bn(sd, f"{pfx}.cv3", dtype),
        "m": tuple(m),
    }


def _elan_p(sd, pfx, dtype):
    return {
        "cv1": _conv_bn(sd, f"{pfx}.cv1", dtype),
        "cv2": {"csp": _repncsp_p(sd, f"{pfx}.cv2.0", dtype),
                "conv": _conv_bn(sd, f"{pfx}.cv2.1", dtype)},
        "cv3": {"csp": _repncsp_p(sd, f"{pfx}.cv3.0", dtype),
                "conv": _conv_bn(sd, f"{pfx}.cv3.1", dtype)},
        "cv4": _conv_bn(sd, f"{pfx}.cv4", dtype),
    }


def convert_yolov9(sd: dict, dtype=jnp.float32):
    """ultralytics yolov9-c state dict → (params, YoloConfig)."""
    while any(k.startswith("model.model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    if any(k.startswith("model.0.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    head_idx = max(int(k.split(".")[0]) for k in sd if k.split(".")[0].isdigit())
    seg = f"{head_idx}.proto.cv1.conv.weight" in sd
    nc = sd[f"{head_idx}.cv3.0.2.weight"].shape[0]
    reg_max = sd[f"{head_idx}.cv2.0.2.weight"].shape[0] // 4
    nm = sd[f"{head_idx}.cv4.0.2.weight"].shape[0] if seg else 32
    cfg = YoloConfig(nc=nc, seg=seg, reg_max=reg_max, nm=nm)

    params = {}
    for i in ("0", "1"):
        params[i] = _conv_bn(sd, i, dtype)
    for i in ("2", "4", "6", "8", "12", "15", "18", "21"):
        params[i] = _elan_p(sd, i, dtype)
    for i in ("3", "5", "7", "16", "19"):
        params[i] = {
            "cv1": _conv_bn(sd, f"{i}.cv1", dtype),
            "cv2": _conv_bn(sd, f"{i}.cv2", dtype),
        }
    params["9"] = {
        "cv1": _conv_bn(sd, "9.cv1", dtype),
        "cv5": _conv_bn(sd, "9.cv5", dtype),
    }
    head = {
        "cv2": tuple(_branch_p(sd, f"{head_idx}.cv2.{i}", dtype) for i in range(3)),
        "cv3": tuple(_branch_p(sd, f"{head_idx}.cv3.{i}", dtype) for i in range(3)),
    }
    if seg:
        up_w = np.asarray(sd[f"{head_idx}.proto.upsample.weight"], np.float32)
        head["cv4"] = tuple(
            _branch_p(sd, f"{head_idx}.cv4.{i}", dtype) for i in range(3)
        )
        head["proto"] = {
            "cv1": _conv_bn(sd, f"{head_idx}.proto.cv1", dtype),
            "upsample": {
                "weight": jnp.asarray(up_w.transpose(2, 3, 0, 1), dtype),
                "bias": jnp.asarray(
                    np.asarray(sd[f"{head_idx}.proto.upsample.bias"], np.float32),
                    dtype,
                ),
            },
            "cv2": _conv_bn(sd, f"{head_idx}.proto.cv2", dtype),
            "cv3": _conv_bn(sd, f"{head_idx}.proto.cv3", dtype),
        }
    params["head"] = head
    return params, cfg


def is_yolov9_state_dict(sd: dict) -> bool:
    return any(
        k.endswith("2.cv2.0.m.0.cv1.conv1.conv.weight")
        or k.endswith("2.cv2.0.cv1.conv.weight")
        for k in sd
    )


def load_yolo(path, dtype=jnp.float32):
    """(ref :8464) Load an ultralytics .pt without the ultralytics package.
    Supports YOLOv8 (det/seg) and YOLOv9-c (GELAN) architectures — the
    latter covers the reference's default hand/face_yolov9c models."""
    from ..loader.torch_pickle import load_any_torch_checkpoint

    sd = load_any_torch_checkpoint(path)
    if is_yolov9_state_dict(sd):
        params, cfg = convert_yolov9(sd, dtype)
        return YoloDetector(params, cfg, apply_fn=yolov9_apply)
    params, cfg = convert_yolov8(sd, dtype)
    return YoloDetector(params, cfg)
