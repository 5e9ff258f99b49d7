"""CLIP-L/14 text encoder, TPU-native.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``CLIPAttention``/``CLIPMLP`` (quick_gelu)   :4268-4319
  - ``CLIPEncoder`` intermediate tap (clip-skip) :4352-4394
  - ``CLIPEmbeddings`` / causal mask / pooled    :4397-4465
  - ``SDClipModel`` layer select + TI splice     :4572-4730
  - weighted-embedding interpolation             :4539-4569
  - config _internal/clip/sd1_clip_config.json   (12 layers, 768 hidden,
    12 heads, 3072 intermediate, quick_gelu, 77 positions, vocab 49408)

Design: the 12 transformer layers are *stacked* into one pytree (leading dim
L) and driven by ``lax.scan``, which collects every layer's hidden state; the
clip-skip index is a static Python int that selects one of them. Textual
inversion is a host-side embedding-matrix splice before the jit boundary —
no nn.Embedding surgery/backup like the reference needs.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import layers as L
from ..text.tokenizer import SDTokenizer, TokenizedChunks


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 77
    hidden_act: str = "quick_gelu"
    projection_dim: int | None = None  # SD1.5 text encoder has no projection
    pad_with_end: bool = True  # SD1.x pads with EOS; SD2.x with token 0


SD1_CLIP = ClipConfig()
# SD2.x OpenCLIP ViT-H text tower (beyond the reference's SD1.5-only support)
SD2_CLIP = ClipConfig(
    hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096,
    hidden_act="gelu", pad_with_end=False,
)
# SDXL towers: CLIP-L (same arch as SD1) + OpenCLIP bigG
SDXL_CLIP_G = ClipConfig(
    hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
    hidden_act="gelu", pad_with_end=False,
)


def _act(name: str):
    return L.quick_gelu if name == "quick_gelu" else jax.nn.gelu


def clip_layer_apply(p, x, mask, cfg: ClipConfig, policy: L.Policy):
    """One pre-LN transformer layer. x: (B, T, C); mask added to logits."""
    h = L.layer_norm(p["ln1"], x, policy=policy)
    q = L.linear(p["q"], h, policy)
    k = L.linear(p["k"], h, policy)
    v = L.linear(p["v"], h, policy)
    a = _masked_attention(q, k, v, mask, cfg.num_heads)
    x = x + L.linear(p["out"], a, policy)
    h = L.layer_norm(p["ln2"], x, policy=policy)
    h = _act(cfg.hidden_act)(L.linear(p["fc1"], h, policy))
    x = x + L.linear(p["fc2"], h, policy)
    return x


def _masked_attention(q, k, v, mask, num_heads):
    """77-token causal attention — tiny; fused XLA path with fp32 softmax."""
    b, t, c = q.shape
    d = c // num_heads

    def split(x):
        return x.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    s = s * (1.0 / np.sqrt(d)) + mask
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return o.transpose(0, 2, 1, 3).reshape(b, t, c)


def causal_mask(t: int, dtype=jnp.float32):
    """(1,1,T,T) additive mask (ref builds it at :4447-4452)."""
    m = jnp.triu(jnp.full((t, t), -jnp.inf, dtype), k=1)
    return m[None, None]


@functools.partial(
    jax.jit, static_argnames=("cfg", "policy", "layer_idx", "norm_hidden")
)
def clip_encode_embeds(
    params,
    input_embeds: jnp.ndarray,  # (B, T, C) — token+TI embeddings, no positions
    input_ids: jnp.ndarray,  # (B, T) int32, for the pooled argmax-EOT lookup
    cfg: ClipConfig = SD1_CLIP,
    policy: L.Policy = L.FP32,
    layer_idx: int = -1,
    norm_hidden: bool = True,
):
    """Run the encoder. Returns (hidden, pooled).

    ``layer_idx``: which layer's output to return as ``hidden`` (clip-skip);
    -1 = last. ``norm_hidden``: pass the tapped hidden state through the
    final LayerNorm (SD1/SD2 behavior; SDXL towers skip it).
    ``pooled`` always comes from the *last* layer.
    """
    b, t, c = input_embeds.shape
    x = input_embeds.astype(policy.compute_dtype)
    x = x + params["position_embedding"][:t].astype(x.dtype)
    mask = causal_mask(t)

    def body(x, layer_params):
        x = clip_layer_apply(layer_params, x, mask, cfg, policy)
        return x, x

    _, hiddens = jax.lax.scan(body, x, params["layers"])  # (L, B, T, C)

    idx = layer_idx % cfg.num_layers
    hidden = hiddens[idx]
    if norm_hidden:
        hidden = L.layer_norm(params["final_ln"], hidden, policy=policy)

    last = L.layer_norm(params["final_ln"], hiddens[-1], policy=policy)
    eot = jnp.argmax(input_ids, axis=-1)  # EOT has the max token id
    pooled = jnp.take_along_axis(last, eot[:, None, None], axis=1)[:, 0]
    if "text_projection" in params:
        pooled = jnp.dot(pooled, params["text_projection"].astype(pooled.dtype))
    return hidden, pooled


def build_input_embeds(
    token_table: np.ndarray, chunks: TokenizedChunks
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side TI splice: ids<0 select rows of chunks.embeddings (sentinel
    -(i+1) → embeddings[i], consecutive sentinels consume consecutive rows).
    Returns (embeds (n,77,C) fp32, safe_ids (n,77) with sentinels→0)."""
    ids = chunks.ids
    n, t = ids.shape
    c = token_table.shape[1]
    out = np.zeros((n, t, c), dtype=np.float32)
    safe_ids = np.where(ids < 0, 0, ids)
    out[:] = token_table[safe_ids]
    for row in range(n):
        consumed: dict[int, int] = {}
        for pos in range(t):
            tid = int(ids[row, pos])
            if tid < 0:
                e = chunks.embeddings[-tid - 1]
                r = consumed.get(tid, 0)
                out[row, pos] = e[min(r, e.shape[0] - 1)]
                consumed[tid] = r + 1
    return out, safe_ids


class ClipTextEncoder:
    """Tokenizer + encoder + weighted-embedding math (the reference's
    ``SDClipModel`` + ``ClipTokenWeightEncoder`` + ``CLIP`` wrapper stack)."""

    def __init__(
        self,
        params,
        cfg: ClipConfig = SD1_CLIP,
        tokenizer: SDTokenizer | None = None,
        policy: L.Policy = L.FP32,
        clip_skip: int = -1,  # -1 last layer, -2 penultimate, ...
        norm_hidden: bool = True,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer or SDTokenizer(
            embedding_size=cfg.hidden_size, pad_with_end=cfg.pad_with_end
        )
        self.policy = policy
        self.clip_skip = clip_skip
        self.norm_hidden = norm_hidden
        self._token_table = np.asarray(params["token_embedding"], np.float32)

    def clip_layer(self, clip_skip: int):
        """Set clip-skip (ref ``CLIPSetLastLayer``, :6604; stores index)."""
        self.clip_skip = clip_skip

    def encode_token_weights(self, chunks: TokenizedChunks):
        """The weighted-embedding interpolation (ref :4539-4569): encode the
        weighted chunks plus one empty chunk; z = (z − z_empty)·w + z_empty;
        concat chunks along the sequence axis. Returns (cond, pooled)."""
        empty = self.tokenizer.tokenize_with_weights("")
        all_ids = np.concatenate([chunks.ids, empty.ids], axis=0)
        embeds, safe_ids = build_input_embeds(
            self._token_table,
            TokenizedChunks(all_ids, None, chunks.embeddings),
        )
        # ComfyUI convention: negative = from the end (-1 last, -2 penultimate)
        # A1111 convention: positive (1 = last, 2 = penultimate) → negate
        layer_idx = self.clip_skip if self.clip_skip < 0 else -self.clip_skip
        hidden, pooled = clip_encode_embeds(
            self.params,
            jnp.asarray(embeds),
            jnp.asarray(safe_ids),
            cfg=self.cfg,
            policy=self.policy,
            layer_idx=layer_idx,
            norm_hidden=self.norm_hidden,
        )
        hidden = np.asarray(hidden.astype(jnp.float32))
        z_w, z_empty = hidden[:-1], hidden[-1:]
        w = chunks.weights[..., None]
        z = (z_w - z_empty) * w + z_empty
        cond = z.reshape(1, -1, z.shape[-1])  # concat chunks along seq
        first_pooled = np.asarray(pooled[:1].astype(jnp.float32))
        return jnp.asarray(cond), jnp.asarray(first_pooled)

    def encode(self, text: str):
        """txt → (cond (1, 77·n, C), pooled (1, C)) — ref CLIPTextEncode :6573."""
        chunks = self.tokenizer.tokenize_with_weights(text)
        return self.encode_token_weights(chunks)


# ----------------------------------------------------------------- SDXL -----
class SDXLTextEncoder:
    """Dual-tower SDXL conditioning (beyond the reference's SD1.5-only
    support): CLIP-L + OpenCLIP bigG, both tapped at the penultimate layer
    WITHOUT the final LayerNorm; cond = concat(l, g) along features (2048),
    pooled from bigG's projected EOT (1280)."""

    def __init__(self, params_l, params_g, cfg_l: ClipConfig = SD1_CLIP,
                 cfg_g: ClipConfig = SDXL_CLIP_G, clip_skip: int = -2):
        self.clip_l = ClipTextEncoder(
            params_l, cfg_l, policy=L.FP32, clip_skip=clip_skip,
            norm_hidden=False,
        )
        self.clip_g = ClipTextEncoder(
            params_g, dataclasses.replace(cfg_g, pad_with_end=False),
            policy=L.FP32, clip_skip=clip_skip, norm_hidden=False,
        )
        self.clip_skip = clip_skip
        self.tokenizer = self.clip_l.tokenizer

    def clip_layer(self, clip_skip: int):
        self.clip_skip = clip_skip
        self.clip_l.clip_layer(clip_skip)
        self.clip_g.clip_layer(clip_skip)

    def encode(self, text: str):
        """→ (cond (1, 77·n, 2048), pooled (1, 1280))."""
        cond_l, _ = self.clip_l.encode(text)
        cond_g, pooled_g = self.clip_g.encode(text)
        n = min(cond_l.shape[1], cond_g.shape[1])
        cond = jnp.concatenate([cond_l[:, :n], cond_g[:, :n]], axis=-1)
        return cond, pooled_g


class SDXLRefinerTextEncoder:
    """SDXL-refiner conditioning: ONLY the OpenCLIP bigG tower (the refiner
    checkpoint has a single conditioner.embedders.0.model tower); cond is the
    penultimate bigG hidden (1280), pooled from the projected EOT. Beyond the
    reference (SD1.5-only, registry at LightDiffusion.py:6015)."""

    def __init__(self, params_g, cfg_g: ClipConfig = SDXL_CLIP_G,
                 clip_skip: int = -2):
        self.clip_g = ClipTextEncoder(
            params_g, dataclasses.replace(cfg_g, pad_with_end=False),
            policy=L.FP32, clip_skip=clip_skip, norm_hidden=False,
        )
        self.clip_skip = clip_skip
        self.tokenizer = self.clip_g.tokenizer

    def clip_layer(self, clip_skip: int):
        self.clip_skip = clip_skip
        self.clip_g.clip_layer(clip_skip)

    def encode(self, text: str):
        """→ (cond (1, 77·n, 1280), pooled (1, 1280))."""
        return self.clip_g.encode(text)


def sdxl_refiner_vector_conditioning(
    pooled: jnp.ndarray,  # (B, 1280)
    width: int,
    height: int,
    aesthetic_score: float = 6.0,
    crop_w: int = 0,
    crop_h: int = 0,
) -> jnp.ndarray:
    """Refiner ADM vector y (B, 2560): pooled text + fourier embeddings of
    (orig_h, orig_w, crop_top, crop_left, aesthetic_score). The aesthetic
    score replaces the base model's target size (positive≈6.0,
    negative≈2.5)."""
    from ..ops.layers import timestep_embedding

    vals = [height, width, crop_h, crop_w, aesthetic_score]
    embs = [timestep_embedding(jnp.asarray([float(v)]), 256) for v in vals]
    size_emb = jnp.concatenate(embs, axis=-1)  # (1, 1280)
    b = pooled.shape[0]
    size_emb = jnp.broadcast_to(size_emb, (b, size_emb.shape[1]))
    return jnp.concatenate([pooled.astype(jnp.float32), size_emb], axis=-1)


def sdxl_vector_conditioning(
    pooled: jnp.ndarray,  # (B, 1280)
    width: int,
    height: int,
    crop_w: int = 0,
    crop_h: int = 0,
    target_width: int | None = None,
    target_height: int | None = None,
) -> jnp.ndarray:
    """SDXL ADM vector y (B, 2816): pooled text + fourier size embeddings
    of (orig_h, orig_w, crop_top, crop_left, target_h, target_w)."""
    from ..ops.layers import timestep_embedding

    vals = [
        height, width, crop_h, crop_w,
        target_height or height, target_width or width,
    ]
    embs = [
        timestep_embedding(jnp.asarray([float(v)]), 256) for v in vals
    ]
    size_emb = jnp.concatenate(embs, axis=-1)  # (1, 1536)
    b = pooled.shape[0]
    size_emb = jnp.broadcast_to(size_emb, (b, size_emb.shape[1]))
    return jnp.concatenate([pooled.astype(jnp.float32), size_emb], axis=-1)


# ------------------------------------------------------------------ init ----
def init_clip_params(key, cfg: ClipConfig = SD1_CLIP, dtype=jnp.float32):
    """Random-init parameter pytree (for tests/benchmarks without weights)."""
    ks = jax.random.split(key, 8)
    c, i = cfg.hidden_size, cfg.intermediate_size

    def layer(k):
        kk = jax.random.split(k, 6)
        return {
            "ln1": L.init_norm(c, dtype),
            "ln2": L.init_norm(c, dtype),
            "q": L.init_linear(kk[0], c, c, dtype=dtype),
            "k": L.init_linear(kk[1], c, c, dtype=dtype),
            "v": L.init_linear(kk[2], c, c, dtype=dtype),
            "out": L.init_linear(kk[3], c, c, dtype=dtype),
            "fc1": L.init_linear(kk[4], c, i, dtype=dtype),
            "fc2": L.init_linear(kk[5], i, c, dtype=dtype),
        }

    layer_keys = jax.random.split(ks[0], cfg.num_layers)
    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[layer(k) for k in layer_keys]
    )
    return {
        "token_embedding": jax.random.normal(ks[1], (cfg.vocab_size, c), dtype) * 0.02,
        "position_embedding": jax.random.normal(ks[2], (cfg.max_positions, c), dtype)
        * 0.01,
        "layers": layers,
        "final_ln": L.init_norm(c, dtype),
    }
