"""Segment Anything (SAM) — image encoder ViT, prompt encoder, mask decoder.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``sam_predict``           :8336 (point+box prompts, threshold select)
  - ``SAMWrapper``            :8397
  - ``SAMLoader`` (vit_b)     :8419
  - ``make_sam_mask``         :8757

The reference calls Meta's segment-anything torch package; this is a from-
scratch JAX port of the (public) SAM architecture: ViT image encoder with
decomposed relative-position attention and 14×14 window attention, fourier
point/box prompt encoding, and the two-way transformer mask decoder.
All NHWC; weights convert from the official sam_vit_*.pth state dicts.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as L


@dataclasses.dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch: int = 16
    dim: int = 768  # vit_b
    depth: int = 12
    heads: int = 12
    global_blocks: tuple = (2, 5, 8, 11)
    window: int = 14
    out_dim: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 8
    num_mask_tokens: int = 4

    @property
    def grid(self) -> int:
        return self.img_size // self.patch


SAM_VIT_B = SamConfig()

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


# ------------------------------------------------------------ image enc -----
def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Select relative positional embeddings (assumes stored size matches
    2*max(q,k)-1, true for SAM's own configs)."""
    coords = (
        jnp.arange(q_size)[:, None] - jnp.arange(k_size)[None, :] + (k_size - 1)
    )
    return rel_pos[coords]


def _attn_rel_pos(q, attn, rel_h, rel_w, hw):
    """Add decomposed rel-pos terms. q: (B*nh, N, d); attn: (B*nh, N, N)."""
    h, w = hw
    bnh, n, d = q.shape
    rh = _get_rel_pos(h, h, rel_h)  # (h, h, d)
    rw = _get_rel_pos(w, w, rel_w)
    r_q = q.reshape(bnh, h, w, d)
    rel_h_term = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w_term = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = attn.reshape(bnh, h, w, h, w)
    attn = attn + rel_h_term[:, :, :, :, None] + rel_w_term[:, :, :, None, :]
    return attn.reshape(bnh, n, n)


def _vit_attention(p, x, heads, hw):
    """x: (B, H, W, C) → same. qkv joint projection + rel pos."""
    b, h, w, c = x.shape
    d = c // heads
    qkv = L.linear(p["qkv"], x.reshape(b, h * w, c), L.FP32)
    qkv = qkv.reshape(b, h * w, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = (t.reshape(b * heads, h * w, d) for t in qkv)
    attn = jnp.einsum("bnd,bmd->bnm", q * (d**-0.5), k)
    attn = _attn_rel_pos(q, attn, p["rel_pos_h"], p["rel_pos_w"], hw)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bnm,bmd->bnd", attn, v)
    out = out.reshape(b, heads, h * w, d).transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return L.linear(p["proj"], out, L.FP32)


def _window_partition(x, window):
    b, h, w, c = x.shape
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp), (h, w)


def _window_unpartition(x, window, padded, orig):
    hp, wp = padded
    h, w = orig
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _vit_block(p, x, cfg: SamConfig, is_global: bool):
    shortcut = x
    x = L.layer_norm(p["norm1"], x, eps=1e-6, policy=L.FP32)
    if not is_global:
        x, padded, orig = _window_partition(x, cfg.window)
        x = _vit_attention(p["attn"], x, cfg.heads, (cfg.window, cfg.window))
        x = _window_unpartition(x, cfg.window, padded, orig)
    else:
        x = _vit_attention(p["attn"], x, cfg.heads, x.shape[1:3])
    x = shortcut + x
    h = L.layer_norm(p["norm2"], x, eps=1e-6, policy=L.FP32)
    h = L.linear(p["lin1"], h, L.FP32)
    h = jax.nn.gelu(h, approximate=False)
    h = L.linear(p["lin2"], h, L.FP32)
    return x + h


@functools.partial(jax.jit, static_argnames=("cfg",))
def sam_encode_image(params, x, cfg: SamConfig = SAM_VIT_B):
    """x: (B, 1024, 1024, 3) normalized pixels → (B, 64, 64, 256)."""
    p = params["image_encoder"]
    x = L.conv2d(p["patch_embed"], x, stride=cfg.patch, padding="VALID", policy=L.FP32)
    x = x + p["pos_embed"]
    for i, blk in enumerate(p["blocks"]):
        x = _vit_block(blk, x, cfg, i in cfg.global_blocks)
    x = L.conv2d(p["neck0"], x, policy=L.FP32)
    x = L.layer_norm(p["neck_ln1"], x, eps=1e-6, policy=L.FP32)
    x = L.conv2d(p["neck2"], x, policy=L.FP32)
    x = L.layer_norm(p["neck_ln2"], x, eps=1e-6, policy=L.FP32)
    return x


# ------------------------------------------------------------ prompt enc ----
def _pe_encode(coords, gaussian_matrix):
    """coords in [0,1] → fourier features (SAM PositionEmbeddingRandom)."""
    c = 2.0 * coords - 1.0
    c = c @ gaussian_matrix  # (..., 128)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def image_pe(params, grid: int):
    """Dense positional encoding over the embedding grid → (grid,grid,256)."""
    g = params["prompt_encoder"]["pe_gaussian"]
    ys = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    xs = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return _pe_encode(jnp.stack([gx, gy], -1), g)


def encode_prompts(params, points, labels, box, img_size: int,
                   grid: int = SAM_VIT_B.grid):
    """points: (N,2) xy in input-pixel coords or None; labels: (N,) 1/0;
    box: (4,) xyxy or None. Returns sparse (1, T, 256), dense (1,g,g,256)."""
    pe = params["prompt_encoder"]
    g = pe["pe_gaussian"]
    tokens = []
    if points is not None and len(points) > 0:
        pts = (jnp.asarray(points, jnp.float32) + 0.5) / img_size
        emb = _pe_encode(pts, g)
        lab = jnp.asarray(labels, jnp.int32)
        emb = jnp.where(
            (lab == 1)[:, None], emb + pe["point_emb"][1],
            emb + pe["point_emb"][0],
        )
        tokens.append(emb)
        # SAM pads with a not-a-point token when no box is given
        if box is None:
            tokens.append(pe["not_a_point"][None])
    if box is not None:
        corners = (jnp.asarray(box, jnp.float32).reshape(2, 2) + 0.5) / img_size
        emb = _pe_encode(corners, g)
        emb = emb + jnp.stack([pe["point_emb"][2], pe["point_emb"][3]])
        tokens.append(emb)
    if not tokens:
        tokens.append(pe["not_a_point"][None])
    sparse = jnp.concatenate(tokens, axis=0)[None]
    dense = jnp.broadcast_to(
        pe["no_mask"][None, None, None, :], (1, grid, grid, pe["no_mask"].shape[0])
    )
    return sparse, dense


# ------------------------------------------------------------ mask dec ------
def _dec_attention(p, q, k, v, heads):
    b, nq, c = q.shape
    d_int = p["q"]["weight"].shape[1]
    d = d_int // heads

    def proj(pp, x):
        y = L.linear(pp, x, L.FP32)
        return y.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = proj(p["q"], q), proj(p["k"], k), proj(p["v"], v)
    attn = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", qh * (d**-0.5), kh), axis=-1
    )
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, d_int)
    return L.linear(p["out"], out, L.FP32)


def _twoway_block(p, queries, keys, query_pe, key_pe, heads, skip_first_pe):
    if skip_first_pe:
        # first layer: self-attention output REPLACES queries (SAM semantics)
        queries = _dec_attention(p["self_attn"], queries, queries, queries, heads)
    else:
        q = queries + query_pe
        queries = queries + _dec_attention(p["self_attn"], q, q, queries, heads)
    queries = L.layer_norm(p["norm1"], queries, policy=L.FP32)
    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _dec_attention(p["t2i"], q, k, keys, heads)
    queries = L.layer_norm(p["norm2"], queries, policy=L.FP32)
    h = L.linear(p["mlp1"], queries, L.FP32)
    queries = queries + L.linear(p["mlp2"], jax.nn.relu(h), L.FP32)
    queries = L.layer_norm(p["norm3"], queries, policy=L.FP32)
    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _dec_attention(p["i2t"], k, q, queries, heads)
    keys = L.layer_norm(p["norm4"], keys, policy=L.FP32)
    return queries, keys


def _mlp(p_list, x, act=jax.nn.relu, act_last=False):
    for i, p in enumerate(p_list):
        x = L.linear(p, x, L.FP32)
        if i < len(p_list) - 1 or act_last:
            x = act(x)
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def sam_decode_masks(params, image_embedding, sparse, dense,
                     cfg: SamConfig = SAM_VIT_B):
    """→ (masks (1, 4, 256, 256) logits, iou_pred (1, 4))."""
    dec = params["mask_decoder"]
    b = 1
    out_tokens = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]], axis=0)
    tokens = jnp.concatenate([out_tokens[None], sparse], axis=1)

    grid = cfg.grid
    src = image_embedding + dense  # (1, g, g, 256)
    pos = image_pe(params, grid)[None]
    keys = src.reshape(b, grid * grid, -1)
    key_pe = pos.reshape(b, grid * grid, -1)
    queries = tokens
    for i, blk in enumerate(dec["blocks"]):
        queries, keys = _twoway_block(
            blk, queries, keys, tokens, key_pe, cfg.decoder_heads, i == 0
        )
    q = queries + tokens
    k = keys + key_pe
    queries = queries + _dec_attention(dec["final_t2i"], q, k, keys, cfg.decoder_heads)
    queries = L.layer_norm(dec["norm_final"], queries, policy=L.FP32)

    iou_out = queries[:, 0]
    mask_tokens_out = queries[:, 1 : 1 + cfg.num_mask_tokens]

    src = keys.reshape(b, grid, grid, -1)
    up = _conv_transpose2x2_p(dec["up0"], src)
    up = L.layer_norm(dec["up_ln"], up, eps=1e-6, policy=L.FP32)
    up = jax.nn.gelu(up, approximate=False)
    up = _conv_transpose2x2_p(dec["up1"], up)
    up = jax.nn.gelu(up, approximate=False)  # (1, 256, 256, 32)

    hyper = jnp.stack(
        [
            _mlp(dec["hyper_mlps"][i], mask_tokens_out[:, i])
            for i in range(cfg.num_mask_tokens)
        ],
        axis=1,
    )  # (1, 4, 32)
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)
    iou_pred = _mlp(dec["iou_mlp"], iou_out)
    return masks, iou_pred


def _conv_transpose2x2_p(p, x):
    w = p["weight"].astype(x.dtype)  # (2,2,in,out)
    y = jnp.einsum("bhwi,klio->bhkwlo", x, w)
    b, h, _, w_, _, o = y.shape
    y = y.reshape(b, h * 2, w_ * 2, o)
    return y + p["bias"].astype(y.dtype)


# -------------------------------------------------------------- wrapper -----
class SamPredictor:
    """set_image / predict — the reference's SAMWrapper (:8397)."""

    def __init__(self, params, cfg: SamConfig = SAM_VIT_B):
        self.params = params
        self.cfg = cfg
        self._features = None
        self._scale = 1.0
        self._orig_hw = None
        self._input_hw = None

    def set_image(self, image: np.ndarray):
        """image: (H, W, 3) float [0,1] or uint8."""
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        h, w = img.shape[:2]
        s = self.cfg.img_size
        scale = s / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        from ..ops.resize import resize

        resized = np.asarray(
            resize(jnp.asarray(img[None].astype(np.float32)), nw, nh, "bilinear")
        )[0]
        norm = (resized - PIXEL_MEAN) / PIXEL_STD
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = norm
        self._features = sam_encode_image(
            self.params, jnp.asarray(canvas[None]), self.cfg
        )
        self._scale = scale
        self._orig_hw = (h, w)
        self._input_hw = (nh, nw)

    def predict(self, points=None, labels=None, box=None, multimask=True):
        """points (N,2) xy / box (4,) in ORIGINAL image coords.
        Returns (masks (4,H,W) bool, iou (4,))."""
        assert self._features is not None, "call set_image first"
        pts = np.asarray(points, np.float32) * self._scale if points is not None else None
        bx = np.asarray(box, np.float32) * self._scale if box is not None else None
        sparse, dense = encode_prompts(
            self.params, pts, labels, bx, self.cfg.img_size, self.cfg.grid
        )
        masks, iou = sam_decode_masks(
            self.params, self._features, sparse, dense, self.cfg
        )
        from ..ops.resize import resize

        m = np.asarray(masks)[0][..., None]  # (4, 256, 256, 1)
        s = self.cfg.img_size
        m = np.asarray(resize(jnp.asarray(m), s, s, "bilinear"))
        nh, nw = self._input_hw
        h, w = self._orig_hw
        m = m[:, :nh, :nw]
        m = np.asarray(resize(jnp.asarray(m), w, h, "bilinear"))[..., 0]
        return m > 0.0, np.asarray(iou)[0]


def make_sam_mask(predictor: SamPredictor, segs, image: np.ndarray,
                  detection_hint: str = "center-1", threshold: float = 0.93,
                  dilation: int = 0, mask_hint_threshold: float = 0.7) -> np.ndarray:
    """Combine per-SEG SAM masks (ref :8757-8806)."""
    from ..postprocess.maskops import dilate_mask

    h, w = image.shape[:2]
    total = np.zeros((h, w), np.float32)
    predictor.set_image(image)
    for seg in segs:
        x1, y1, x2, y2 = seg.bbox
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        masks, scores = predictor.predict(
            points=[[cx, cy]], labels=[1], box=np.asarray(seg.bbox)
        )
        # masks above threshold, else the single best (ref :8336-8371)
        sel = np.nonzero(scores >= threshold)[0]
        if len(sel) == 0:
            sel = [int(np.argmax(scores))]
        for i in sel:
            mask = masks[i].astype(np.float32)
            if dilation:
                mask = dilate_mask(mask, dilation)
            total = np.maximum(total, mask)
    return total


# ----------------------------------------------------------- conversion -----
def _lin_p(sd, name, dtype=jnp.float32):
    p = {"weight": jnp.asarray(np.asarray(sd[name + ".weight"], np.float32).T, dtype)}
    if name + ".bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[name + ".bias"], np.float32), dtype)
    return p


def _conv_p(sd, name, dtype=jnp.float32):
    w = np.asarray(sd[name + ".weight"], np.float32).transpose(2, 3, 1, 0)
    p = {"weight": jnp.asarray(w, dtype)}
    if name + ".bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[name + ".bias"], np.float32), dtype)
    return p


def _norm_p(sd, name, dtype=jnp.float32):
    return {
        "weight": jnp.asarray(np.asarray(sd[name + ".weight"], np.float32), dtype),
        "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32), dtype),
    }


def convert_sam(sd: dict, cfg: SamConfig = SAM_VIT_B, dtype=jnp.float32):
    """Official sam_vit_*.pth state dict → param tree."""
    enc_blocks = []
    for i in range(cfg.depth):
        b = f"image_encoder.blocks.{i}."
        enc_blocks.append(
            {
                "norm1": _norm_p(sd, b + "norm1", dtype),
                "norm2": _norm_p(sd, b + "norm2", dtype),
                "attn": {
                    "qkv": _lin_p(sd, b + "attn.qkv", dtype),
                    "proj": _lin_p(sd, b + "attn.proj", dtype),
                    "rel_pos_h": jnp.asarray(
                        np.asarray(sd[b + "attn.rel_pos_h"], np.float32), dtype
                    ),
                    "rel_pos_w": jnp.asarray(
                        np.asarray(sd[b + "attn.rel_pos_w"], np.float32), dtype
                    ),
                },
                "lin1": _lin_p(sd, b + "mlp.lin1", dtype),
                "lin2": _lin_p(sd, b + "mlp.lin2", dtype),
            }
        )
    pos = np.asarray(sd["image_encoder.pos_embed"], np.float32)  # (1,g,g,C)
    image_encoder = {
        "patch_embed": _conv_p(sd, "image_encoder.patch_embed.proj", dtype),
        "pos_embed": jnp.asarray(pos, dtype),
        "blocks": tuple(enc_blocks),
        "neck0": _conv_p(sd, "image_encoder.neck.0", dtype),
        "neck_ln1": _norm_p(sd, "image_encoder.neck.1", dtype),
        "neck2": _conv_p(sd, "image_encoder.neck.2", dtype),
        "neck_ln2": _norm_p(sd, "image_encoder.neck.3", dtype),
    }

    pe = {
        "pe_gaussian": jnp.asarray(
            np.asarray(
                sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
                np.float32,
            ),
            dtype,
        ),
        "point_emb": jnp.stack(
            [
                jnp.asarray(
                    np.asarray(
                        sd[f"prompt_encoder.point_embeddings.{i}.weight"], np.float32
                    )[0],
                    dtype,
                )
                for i in range(4)
            ]
        ),
        "not_a_point": jnp.asarray(
            np.asarray(sd["prompt_encoder.not_a_point_embed.weight"], np.float32)[0],
            dtype,
        ),
        "no_mask": jnp.asarray(
            np.asarray(sd["prompt_encoder.no_mask_embed.weight"], np.float32)[0],
            dtype,
        ),
    }

    def attn_p(pfx):
        return {
            "q": _lin_p(sd, pfx + ".q_proj", dtype),
            "k": _lin_p(sd, pfx + ".k_proj", dtype),
            "v": _lin_p(sd, pfx + ".v_proj", dtype),
            "out": _lin_p(sd, pfx + ".out_proj", dtype),
        }

    dec_blocks = []
    for i in range(cfg.decoder_depth):
        b = f"mask_decoder.transformer.layers.{i}."
        dec_blocks.append(
            {
                "self_attn": attn_p(b + "self_attn"),
                "norm1": _norm_p(sd, b + "norm1", dtype),
                "t2i": attn_p(b + "cross_attn_token_to_image"),
                "norm2": _norm_p(sd, b + "norm2", dtype),
                "mlp1": _lin_p(sd, b + "mlp.lin1", dtype),
                "mlp2": _lin_p(sd, b + "mlp.lin2", dtype),
                "norm3": _norm_p(sd, b + "norm3", dtype),
                "i2t": attn_p(b + "cross_attn_image_to_token"),
                "norm4": _norm_p(sd, b + "norm4", dtype),
            }
        )
    n_hyper = cfg.num_mask_tokens
    up0_w = np.asarray(sd["mask_decoder.output_upscaling.0.weight"], np.float32)
    up1_w = np.asarray(sd["mask_decoder.output_upscaling.3.weight"], np.float32)
    mask_decoder = {
        "iou_token": jnp.asarray(
            np.asarray(sd["mask_decoder.iou_token.weight"], np.float32), dtype
        ),
        "mask_tokens": jnp.asarray(
            np.asarray(sd["mask_decoder.mask_tokens.weight"], np.float32), dtype
        ),
        "blocks": tuple(dec_blocks),
        "final_t2i": attn_p("mask_decoder.transformer.final_attn_token_to_image"),
        "norm_final": _norm_p(sd, "mask_decoder.transformer.norm_final_attn", dtype),
        "up0": {
            "weight": jnp.asarray(up0_w.transpose(2, 3, 0, 1), dtype),
            "bias": jnp.asarray(
                np.asarray(sd["mask_decoder.output_upscaling.0.bias"], np.float32),
                dtype,
            ),
        },
        "up_ln": _norm_p(sd, "mask_decoder.output_upscaling.1", dtype),
        "up1": {
            "weight": jnp.asarray(up1_w.transpose(2, 3, 0, 1), dtype),
            "bias": jnp.asarray(
                np.asarray(sd["mask_decoder.output_upscaling.3.bias"], np.float32),
                dtype,
            ),
        },
        "hyper_mlps": tuple(
            tuple(
                _lin_p(sd, f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}", dtype)
                for j in range(3)
            )
            for i in range(n_hyper)
        ),
        "iou_mlp": tuple(
            _lin_p(sd, f"mask_decoder.iou_prediction_head.layers.{j}", dtype)
            for j in range(3)
        ),
    }
    return {
        "image_encoder": image_encoder,
        "prompt_encoder": pe,
        "mask_decoder": mask_decoder,
    }


def load_sam(path, cfg: SamConfig = SAM_VIT_B, dtype=jnp.float32) -> SamPredictor:
    """(ref SAMLoader :8419)"""
    from ..loader.checkpoint import load_torch_file

    sd = load_torch_file(path)
    return SamPredictor(convert_sam(sd, cfg, dtype), cfg)
