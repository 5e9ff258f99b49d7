"""SD1.x diffusion UNet, TPU-native (NHWC, functional, bf16-policy).

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``UNetModel1`` topology            :5294-5767 (input/middle/output blocks)
  - ``ResBlock1``                      :5189-5287
  - ``SpatialTransformer``             :4165-4262 (GN → 1×1 conv → blocks → 1×1)
  - ``BasicTransformerBlock``          :4039-4162 (self-attn, cross-attn, GEGLU FF)
  - ``CrossAttention``                 :3995 (bias-less q/k/v)
  - ``Upsample1``/``Downsample1``      :5114/:5155
  - ``timestep_embedding``             :803-812
  - sm_SD15 config                     :5964-5976 (model_channels 320,
    channel_mult [1,2,4,4], context 768, heads 8, attention at ds 1/2/4)

Architecture: a static *plan* (list of block descriptors) is derived from the
config; ``init_unet_params``, ``apply_unet`` and the checkpoint converter all
walk the same plan, so layouts can never diverge. Activations are NHWC; all
attention runs through ops.attention (Pallas flash kernel on TPU).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..ops.attention import attention_heads_last
from ..ops.ffn import geglu_ffn_block


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: tuple = (2, 2, 2, 2)
    transformer_depth: tuple = (1, 1, 1, 0)  # 0 = no attention at that level
    context_dim: int = 768
    num_heads: int = 8
    num_head_channels: int = -1  # SD2: 64 → heads = C // 64 per level
    use_linear_projections: bool = False  # SD2: linear proj_in/out
    middle_depth: int = 1  # SDXL: 10
    adm_in_channels: int = 0  # SDXL: 2816 (pooled text + size embeddings)
    dropout: float = 0.0
    attn_force: str | None = None  # attention backend override for tests
    # ToDo (arXiv 2402.13573): spatially avg-pool the self-attention K/V by
    # this factor at levels with ≥ todo_min_tokens tokens (0 = off; queries
    # and the output token set stay full-resolution, so there is no
    # merge/unmerge overhead). Superseded ToMe (removed round 4: measured
    # slower than ToDo at every size/topology — NOTES_ROUND3, MIGRATION.md).
    todo_factor: int = 0
    todo_min_tokens: int = 4096
    # FreeU (arXiv 2309.11497): (b1, b2, s1, s2) — backbone amplification +
    # skip low-frequency attenuation at the two deepest decoder widths.
    # () = off. Free quality lever absent in the reference.
    freeu: tuple = ()

    def heads_for(self, channels: int) -> int:
        if self.num_head_channels > 0:
            return channels // self.num_head_channels
        return self.num_heads

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4


SD15_UNET = UNetConfig()
# SD2.x / SDXL (beyond the reference, which registers only sm_SD15 at :6015)
SD21_UNET = UNetConfig(
    context_dim=1024, num_head_channels=64, use_linear_projections=True
)
SDXL_UNET = UNetConfig(
    channel_mult=(1, 2, 4),
    num_res_blocks=(2, 2, 2),
    transformer_depth=(0, 2, 10),
    middle_depth=10,
    context_dim=2048,
    num_head_channels=64,
    use_linear_projections=True,
    adm_in_channels=2816,
)


# ------------------------------------------------------------------ plan ----
@dataclasses.dataclass(frozen=True)
class BlockSpec:
    kind: str  # 'conv_in' | 'res' | 'res_attn' | 'down' | 'up'
    ch_in: int = 0
    ch_out: int = 0
    depth: int = 0  # transformer depth (res_attn)
    skip_ch: int = 0  # concat channels (output blocks)
    upsample: bool = False  # output blocks: trailing upsample


def build_plan(cfg: UNetConfig):
    """Returns (input_plan, middle_depth, output_plan, skip_channels)."""
    ch = cfg.model_channels
    input_plan = [BlockSpec("conv_in", cfg.in_channels, ch)]
    skips = [ch]
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = cfg.model_channels * mult
        for _ in range(cfg.num_res_blocks[level]):
            kind = "res_attn" if cfg.transformer_depth[level] > 0 else "res"
            input_plan.append(
                BlockSpec(kind, ch, out_ch, depth=cfg.transformer_depth[level])
            )
            ch = out_ch
            skips.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_plan.append(BlockSpec("down", ch, ch))
            skips.append(ch)

    output_plan = []
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        out_ch = cfg.model_channels * mult
        for i in range(cfg.num_res_blocks[level] + 1):
            skip_ch = skips.pop()
            kind = "res_attn" if cfg.transformer_depth[level] > 0 else "res"
            up = level != 0 and i == cfg.num_res_blocks[level]
            output_plan.append(
                BlockSpec(
                    kind,
                    ch,
                    out_ch,
                    depth=cfg.transformer_depth[level],
                    skip_ch=skip_ch,
                    upsample=up,
                )
            )
            ch = out_ch
    return input_plan, output_plan


# ------------------------------------------------------------- sub-blocks ---
def resblock_apply(p, x, emb, policy):
    """GN-SiLU-conv / +time-emb / GN-SiLU-conv / +skip (ref :5189-5287)."""
    h = L.group_norm(p["in_norm"], x, eps=1e-5, policy=policy)
    h = L.conv2d(p["in_conv"], L.silu(h), policy=policy)
    emb_out = L.linear(p["emb"], L.silu(emb), policy)
    h = h + emb_out[:, None, None, :]
    h = L.group_norm(p["out_norm"], h, eps=1e-5, policy=policy)
    h = L.conv2d(p["out_conv"], L.silu(h), policy=policy)
    if "skip" in p:
        x = L.conv2d(p["skip"], x, policy=policy)
    return x + h


def cross_attention_apply(p, x, context, num_heads, policy, force=None):
    """x: (B, S, C); context: (B, T, ctx). Bias-less q/k/v (ref :3995)."""
    q = L.linear(p["to_q"], x, policy)
    k = L.linear(p["to_k"], context, policy)
    v = L.linear(p["to_v"], context, policy)
    out = attention_heads_last(q, k, v, num_heads=num_heads, force=force)
    return L.linear(p["to_out"], out, policy)


def transformer_block_apply(p, x, context, num_heads, policy, force=None,
                            spatial_hw=None, todo_factor=0):
    """``todo_factor``: Token Downsampling (arXiv 2402.13573) — self-attention
    K/V are spatially avg-pooled by this factor over the ``spatial_hw``
    token grid (queries stay full-res, so no unmerge pass exists)."""
    x_norm = L.layer_norm(p["ln1"], x, policy=policy)
    if todo_factor > 1 and spatial_hw is not None:
        h, w = spatial_hw
        b, s, c = x_norm.shape
        f = todo_factor
        kv = x_norm.reshape(b, h // f, f, w // f, f, c).mean((2, 4))
        kv = kv.reshape(b, (h // f) * (w // f), c)
        x = x + cross_attention_apply(
            p["attn1"], x_norm, kv, num_heads, policy, force
        )
    else:
        x = x + cross_attention_apply(
            p["attn1"], x_norm, x_norm, num_heads, policy, force
        )
    x = x + cross_attention_apply(
        p["attn2"], L.layer_norm(p["ln2"], x, policy=policy), context,
        num_heads, policy, force,
    )
    x = geglu_ffn_block(p["ln3"], p["ff_in"], p["ff_out"], x, policy,
                        force=force)
    return x


def spatial_transformer_apply(p, x, context, num_heads, policy, force=None,
                              todo_factor=0, todo_min_tokens=4096):
    """GN → proj in → (B,HW,C) blocks → proj out → +residual (ref :4165-4262).
    Projections are 1×1 convs (SD1.x) or linears (SD2.x,
    use_linear_in_transformer) — distinguished by the weight rank.
    ``todo_factor``: ToDo K/V downsampling at levels with
    ≥ todo_min_tokens tokens (arXiv 2402.13573)."""
    b, h, w, c = x.shape
    residual = x
    x = L.group_norm(p["norm"], x, eps=1e-6, policy=policy)
    proj_w = p["proj_in"].get("weight", p["proj_in"].get("weight_q8"))
    linear_proj = proj_w.ndim == 2
    if linear_proj:
        x = x.reshape(b, h * w, c)
        x = L.linear(p["proj_in"], x, policy)
    else:
        x = L.conv2d(p["proj_in"], x, policy=policy)
        x = x.reshape(b, h * w, c)
    todo = (
        todo_factor
        if (todo_factor > 1 and h * w >= todo_min_tokens
            and h % todo_factor == 0 and w % todo_factor == 0)
        else 0
    )
    spatial_hw = (h, w) if todo else None
    for blk in p["blocks"]:
        x = transformer_block_apply(blk, x, context, num_heads, policy, force,
                                    spatial_hw=spatial_hw, todo_factor=todo)
    if linear_proj:
        x = L.linear(p["proj_out"], x, policy)
        x = x.reshape(b, h, w, c)
    else:
        x = x.reshape(b, h, w, c)
        x = L.conv2d(p["proj_out"], x, policy=policy)
    return x + residual


def _fourier_lowfreq_scale(x, threshold: int, scale: float):
    """Scale the lowest spatial frequencies of (B,H,W,C) by ``scale``
    (FreeU's skip-feature filter, arXiv 2309.11497 — fp32 FFT via XLA)."""
    xf = jnp.fft.fftshift(
        jnp.fft.fft2(x.astype(jnp.complex64), axes=(1, 2)), axes=(1, 2)
    )
    b, h, w, c = x.shape
    cr, cc = h // 2, w // 2
    mask = jnp.ones((1, h, w, 1), jnp.float32)
    mask = mask.at[
        :, cr - threshold : cr + threshold, cc - threshold : cc + threshold
    ].set(scale)
    out = jnp.fft.ifft2(
        jnp.fft.ifftshift(xf * mask, axes=(1, 2)), axes=(1, 2)
    ).real
    return out.astype(x.dtype)


def _apply_freeu(h, skip, cfg: UNetConfig):
    """FreeU (arXiv 2309.11497): amplify the first half of the backbone
    channels and low-pass-attenuate the skip at the two deepest decoder
    widths (the official implementation's 1280/640-channel gates,
    generalized to model_channels·mult)."""
    b1, b2, s1, s2 = cfg.freeu
    ch = h.shape[-1]
    mults = sorted(set(cfg.channel_mult), reverse=True)
    if ch == cfg.model_channels * mults[0]:
        b, s = b1, s1
    elif len(mults) > 1 and ch == cfg.model_channels * mults[1]:
        b, s = b2, s2
    else:
        return h, skip
    half = ch // 2
    h = jnp.concatenate([h[..., :half] * b, h[..., half:]], axis=-1)
    skip = _fourier_lowfreq_scale(skip, 1, s)
    return h, skip


def downsample_apply(p, x, policy):
    """Stride-2 3×3 conv, torch padding=1 semantics (ref :5155)."""
    return L.conv2d(p["conv"], x, stride=2, padding=[(1, 1), (1, 1)], policy=policy)


def upsample_apply(p, x, policy, output_shape=None):
    """Nearest ×2 + 3×3 conv (ref :5114)."""
    b, h, w, c = x.shape
    th, tw = (output_shape if output_shape else (h * 2, w * 2))
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)[:, :th, :tw]
    return L.conv2d(p["conv"], x, policy=policy)


# ----------------------------------------------------------------- apply ----
def _block_apply(spec: BlockSpec, p, h, emb, context, cfg, policy):
    if spec.kind == "conv_in":
        return L.conv2d(p["conv"], h, policy=policy)
    if spec.kind == "down":
        return downsample_apply(p, h, policy)
    h = resblock_apply(p["res"], h, emb, policy)
    if spec.kind == "res_attn":
        h = spatial_transformer_apply(
            p["attn"], h, context, cfg.heads_for(spec.ch_out), policy,
            cfg.attn_force,
            todo_factor=cfg.todo_factor,
            todo_min_tokens=cfg.todo_min_tokens,
        )
    return h


def _time_label_emb(params, timesteps, y, cfg, policy):
    """Time embedding MLP (+ SDXL ADM label embedding when y is given)."""
    t_emb = L.timestep_embedding(timesteps, cfg.model_channels)
    emb = L.linear(params["time_fc1"], t_emb.astype(policy.compute_dtype), policy)
    emb = L.linear(params["time_fc2"], L.silu(emb), policy)
    if cfg.adm_in_channels and y is not None:
        lab = L.linear(params["label_fc1"], y.astype(policy.compute_dtype), policy)
        lab = L.linear(params["label_fc2"], L.silu(lab), policy)
        emb = emb + lab
    return emb


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def apply_unet(
    params,
    x: jnp.ndarray,  # (B, H, W, C_in) NHWC latent
    timesteps: jnp.ndarray,  # (B,) float32
    context: jnp.ndarray,  # (B, T, ctx_dim)
    y: jnp.ndarray | None = None,  # (B, adm_in) SDXL vector conditioning
    cfg: UNetConfig = SD15_UNET,
    policy: L.Policy = L.DEFAULT_POLICY,
    control=None,  # (per-input-block residuals, middle residual) — ControlNet
):
    """UNet forward (ref :5688-5767): eps prediction in x's dtype.
    ``control``: ControlNet residuals (models/controlnet.py) added to the
    skip connections and post-middle activation (arXiv 2302.05543)."""
    input_plan, output_plan = build_plan(cfg)
    emb = _time_label_emb(params, timesteps, y, cfg, policy)

    h = x.astype(policy.compute_dtype)
    context = context.astype(policy.compute_dtype)

    hs = []
    for spec, p in zip(input_plan, params["input_blocks"]):
        h = _block_apply(spec, p, h, emb, context, cfg, policy)
        hs.append(h)

    if control is not None:
        ctrl_outs, ctrl_mid = control
        hs = [
            h_i + c.astype(h_i.dtype) for h_i, c in zip(hs, ctrl_outs)
        ]

    mid_ch = cfg.model_channels * cfg.channel_mult[-1]
    h = resblock_apply(params["middle"]["res1"], h, emb, policy)
    h = spatial_transformer_apply(
        params["middle"]["attn"], h, context, cfg.heads_for(mid_ch), policy,
        cfg.attn_force,
        todo_factor=cfg.todo_factor,
        todo_min_tokens=cfg.todo_min_tokens,
    )
    h = resblock_apply(params["middle"]["res2"], h, emb, policy)
    if control is not None:
        h = h + ctrl_mid.astype(h.dtype)

    for spec, p in zip(output_plan, params["output_blocks"]):
        skip = hs.pop()
        if cfg.freeu:
            h, skip = _apply_freeu(h, skip, cfg)
        h = jnp.concatenate([h, skip], axis=-1)
        h = resblock_apply(p["res"], h, emb, policy)
        if spec.kind == "res_attn":
            h = spatial_transformer_apply(
                p["attn"], h, context, cfg.heads_for(spec.ch_out), policy,
                cfg.attn_force,
                todo_factor=cfg.todo_factor,
                todo_min_tokens=cfg.todo_min_tokens,
            )
        if spec.upsample:
            out_hw = None
            if hs:
                out_hw = hs[-1].shape[1:3]
            h = upsample_apply(p["up"], h, policy, output_shape=out_hw)

    h = L.group_norm(params["out_norm"], h, eps=1e-5, policy=policy)
    h = L.conv2d(params["out_conv"], L.silu(h), policy=policy)
    return h.astype(x.dtype)


# ------------------------------------------------------------ deep cache ----
def _split_plans(cfg: UNetConfig, cache_level: int):
    """Split block plans into shallow (levels < cache_level) and deep parts."""
    input_plan, output_plan = build_plan(cfg)
    n_shallow_in = 1  # conv_in
    for level in range(cache_level):
        n_shallow_in += cfg.num_res_blocks[level]
        if level != len(cfg.channel_mult) - 1:
            n_shallow_in += 1  # downsample
    n_deep_out = 0
    for level in reversed(range(len(cfg.channel_mult))):
        if level >= cache_level:
            n_deep_out += cfg.num_res_blocks[level] + 1
    return input_plan, output_plan, n_shallow_in, n_deep_out


def deepcache_shape(cfg: UNetConfig, h: int, w: int, batch: int,
                    cache_level: int = 1):
    """Shape of the cached junction tensor for latents (batch, h, w, 4)."""
    scale = 2 ** (cache_level - 1)
    ch = cfg.model_channels * cfg.channel_mult[cache_level]
    return (batch, h // scale, w // scale, ch)


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "cache_level"))
def apply_unet_cached(
    params,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    cache: jnp.ndarray,
    refresh: jnp.ndarray,  # scalar bool: recompute the deep blocks?
    y: jnp.ndarray | None = None,
    cfg: UNetConfig = SD15_UNET,
    policy: L.Policy = L.DEFAULT_POLICY,
    cache_level: int = 1,
):
    """DeepCache-style forward ("Cache Me if You Can", arXiv 2312.03209;
    PAPERS.md): shallow blocks (levels < cache_level) always run; the deep
    sub-UNet (levels ≥ cache_level + middle) runs only when ``refresh`` and
    its output at the up-path junction is cached otherwise. Opt-in
    accelerator ABSENT in the reference — its stable-fast wrapper (:9673)
    kept numerics; this trades a small quality delta for ~step-rate.

    Returns (eps, new_cache)."""
    input_plan, output_plan, n_si, n_do = _split_plans(cfg, cache_level)
    emb = _time_label_emb(params, timesteps, y, cfg, policy)

    h = x.astype(policy.compute_dtype)
    context = context.astype(policy.compute_dtype)

    hs_shallow = []
    for spec, p in zip(input_plan[:n_si], params["input_blocks"][:n_si]):
        h = _block_apply(spec, p, h, emb, context, cfg, policy)
        hs_shallow.append(h)

    def deep(h):
        # the junction tensor doubles as the last shallow skip (it is the
        # downsample output), consumed by the deepest level-(cache_level)
        # output block
        hs = [h]
        for spec, p in zip(input_plan[n_si:], params["input_blocks"][n_si:]):
            h = _block_apply(spec, p, h, emb, context, cfg, policy)
            hs.append(h)
        mid_ch = cfg.model_channels * cfg.channel_mult[-1]
        h = resblock_apply(params["middle"]["res1"], h, emb, policy)
        h = spatial_transformer_apply(
            params["middle"]["attn"], h, context, cfg.heads_for(mid_ch),
            policy, cfg.attn_force,
            todo_factor=cfg.todo_factor,
            todo_min_tokens=cfg.todo_min_tokens,
        )
        h = resblock_apply(params["middle"]["res2"], h, emb, policy)
        for spec, p in zip(output_plan[:n_do], params["output_blocks"][:n_do]):
            skip = hs.pop()
            if cfg.freeu:
                h, skip = _apply_freeu(h, skip, cfg)
            h = jnp.concatenate([h, skip], axis=-1)
            h = resblock_apply(p["res"], h, emb, policy)
            if spec.kind == "res_attn":
                h = spatial_transformer_apply(
                    p["attn"], h, context, cfg.heads_for(spec.ch_out), policy,
                    cfg.attn_force,
                    todo_factor=cfg.todo_factor,
                    todo_min_tokens=cfg.todo_min_tokens,
                )
            if spec.upsample:
                h = upsample_apply(p["up"], h, policy)
        return h.astype(cache.dtype)

    new_cache = jax.lax.cond(refresh, deep, lambda _: cache, h)

    hs_shallow.pop()  # junction skip: consumed inside deep()
    h = new_cache.astype(policy.compute_dtype)
    for spec, p in zip(output_plan[n_do:], params["output_blocks"][n_do:]):
        skip = hs_shallow.pop()
        if cfg.freeu:
            h, skip = _apply_freeu(h, skip, cfg)
        h = jnp.concatenate([h, skip], axis=-1)
        h = resblock_apply(p["res"], h, emb, policy)
        if spec.kind == "res_attn":
            h = spatial_transformer_apply(
                p["attn"], h, context, cfg.heads_for(spec.ch_out), policy,
                cfg.attn_force,
                todo_factor=cfg.todo_factor,
                todo_min_tokens=cfg.todo_min_tokens,
            )
        if spec.upsample:
            h = upsample_apply(p["up"], h, policy)

    h = L.group_norm(params["out_norm"], h, eps=1e-5, policy=policy)
    h = L.conv2d(params["out_conv"], L.silu(h), policy=policy)
    return h.astype(x.dtype), new_cache


# ------------------------------------------------------------------ init ----
def _init_res(key, ch_in, ch_out, emb_dim, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "in_norm": L.init_norm(ch_in, dtype),
        "in_conv": L.init_conv2d(ks[0], 3, 3, ch_in, ch_out, dtype=dtype),
        "emb": L.init_linear(ks[1], emb_dim, ch_out, dtype=dtype),
        "out_norm": L.init_norm(ch_out, dtype),
        "out_conv": L.init_conv2d(ks[2], 3, 3, ch_out, ch_out, dtype=dtype),
    }
    if ch_in != ch_out:
        p["skip"] = L.init_conv2d(ks[3], 1, 1, ch_in, ch_out, dtype=dtype)
    return p


def _init_xattn(key, c, ctx, dtype):
    ks = jax.random.split(key, 4)
    return {
        "to_q": L.init_linear(ks[0], c, c, bias=False, dtype=dtype),
        "to_k": L.init_linear(ks[1], ctx, c, bias=False, dtype=dtype),
        "to_v": L.init_linear(ks[2], ctx, c, bias=False, dtype=dtype),
        "to_out": L.init_linear(ks[3], c, c, dtype=dtype),
    }


def _init_transformer(key, c, ctx, depth, dtype, linear_proj=False):
    ks = jax.random.split(key, depth + 2)
    blocks = []
    for i in range(depth):
        kk = jax.random.split(ks[i], 4)
        blocks.append(
            {
                "ln1": L.init_norm(c, dtype),
                "ln2": L.init_norm(c, dtype),
                "ln3": L.init_norm(c, dtype),
                "attn1": _init_xattn(kk[0], c, c, dtype),
                "attn2": _init_xattn(kk[1], c, ctx, dtype),
                "ff_in": L.init_linear(kk[2], c, c * 8, dtype=dtype),
                "ff_out": L.init_linear(kk[3], c * 4, c, dtype=dtype),
            }
        )
    if linear_proj:
        proj_in = L.init_linear(ks[-2], c, c, dtype=dtype)
        proj_out = L.init_linear(ks[-1], c, c, dtype=dtype)
    else:
        proj_in = L.init_conv2d(ks[-2], 1, 1, c, c, dtype=dtype)
        proj_out = L.init_conv2d(ks[-1], 1, 1, c, c, dtype=dtype)
    return {
        "norm": L.init_norm(c, dtype),
        "proj_in": proj_in,
        "proj_out": proj_out,
        "blocks": tuple(blocks),
    }


def init_unet_params(key, cfg: UNetConfig = SD15_UNET, dtype=jnp.float32):
    input_plan, output_plan = build_plan(cfg)
    emb_dim = cfg.time_embed_dim
    keys = iter(jax.random.split(key, len(input_plan) + len(output_plan) + 8))

    def init_block(spec: BlockSpec, is_output: bool):
        k = next(keys)
        if spec.kind == "conv_in":
            return {"conv": L.init_conv2d(k, 3, 3, spec.ch_in, spec.ch_out, dtype=dtype)}
        if spec.kind == "down":
            return {"conv": L.init_conv2d(k, 3, 3, spec.ch_in, spec.ch_out, dtype=dtype)}
        kk = jax.random.split(k, 3)
        p = {
            "res": _init_res(
                kk[0], spec.ch_in + spec.skip_ch, spec.ch_out, emb_dim, dtype
            )
        }
        if spec.kind == "res_attn":
            p["attn"] = _init_transformer(
                kk[1], spec.ch_out, cfg.context_dim, spec.depth, dtype,
                cfg.use_linear_projections,
            )
        if spec.upsample:
            p["up"] = {
                "conv": L.init_conv2d(kk[2], 3, 3, spec.ch_out, spec.ch_out, dtype=dtype)
            }
        return p

    mk = jax.random.split(next(keys), 3)
    mid_ch = cfg.model_channels * cfg.channel_mult[-1]
    out = {
        "time_fc1": L.init_linear(next(keys), cfg.model_channels, emb_dim, dtype=dtype),
        "time_fc2": L.init_linear(next(keys), emb_dim, emb_dim, dtype=dtype),
        "input_blocks": tuple(init_block(s, False) for s in input_plan),
        "middle": {
            "res1": _init_res(mk[0], mid_ch, mid_ch, emb_dim, dtype),
            "attn": _init_transformer(
                mk[1], mid_ch, cfg.context_dim, cfg.middle_depth, dtype,
                cfg.use_linear_projections,
            ),
            "res2": _init_res(mk[2], mid_ch, mid_ch, emb_dim, dtype),
        },
        "output_blocks": tuple(init_block(s, True) for s in output_plan),
        "out_norm": L.init_norm(cfg.model_channels, dtype),
        "out_conv": L.init_conv2d(
            next(keys), 3, 3, cfg.model_channels, cfg.out_channels, dtype=dtype
        ),
    }
    if cfg.adm_in_channels:
        out["label_fc1"] = L.init_linear(
            next(keys), cfg.adm_in_channels, emb_dim, dtype=dtype
        )
        out["label_fc2"] = L.init_linear(next(keys), emb_dim, emb_dim, dtype=dtype)
    return out
