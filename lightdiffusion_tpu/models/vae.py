"""AutoencoderKL VAE (SD1.x first-stage model), TPU-native NHWC.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``Encoder``/``Decoder`` conv stacks      :3649/:3761 (ch 128, mult
    [1,2,4,4], 2 res blocks, mid attention)
  - ``ResnetBlock``                          :3531 (GN32 eps1e-6, swish)
  - ``AttnBlock`` single-head spatial attn   :3605-3642 (1×1-conv q/k/v)
  - ``Upsample``/``Downsample`` asymmetric   :3498/:3514 (pad right/bottom)
  - ``DiagonalGaussianDistribution``         :166
  - ``VAE`` wrapper scaling/pixel maps       :6282-6410
  - config hardcoded at                      :6300-6326

Memory heuristics/batch-splitting loops from the reference collapse on TPU:
decode/encode are jit'd whole; spatial tiling (for huge images) is a separate
batched-tiles path shared with ESRGAN (postprocess/tiling.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..ops.attention import attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    in_channels: int = 3
    out_channels: int = 3
    scale_factor: float = 0.18215  # SD15 latent scale (ref :137)

    @property
    def downscale_ratio(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


SD15_VAE = VAEConfig()


def _resnet(p, x, policy):
    h = L.group_norm(p["norm1"], x, eps=1e-6, policy=policy)
    h = L.conv2d(p["conv1"], L.silu(h), policy=policy)
    h = L.group_norm(p["norm2"], h, eps=1e-6, policy=policy)
    h = L.conv2d(p["conv2"], L.silu(h), policy=policy)
    if "nin" in p:
        x = L.conv2d(p["nin"], x, policy=policy)
    return x + h


def _attn_block(p, x, policy):
    """Single-head spatial attention with 1×1-conv q/k/v (ref :3605-3642)."""
    b, h, w, c = x.shape
    n = L.group_norm(p["norm"], x, eps=1e-6, policy=policy)
    q = L.conv2d(p["q"], n, policy=policy).reshape(b, 1, h * w, c)
    k = L.conv2d(p["k"], n, policy=policy).reshape(b, 1, h * w, c)
    v = L.conv2d(p["v"], n, policy=policy).reshape(b, 1, h * w, c)
    o = attention(q, k, v).reshape(b, h, w, c)
    return x + L.conv2d(p["proj_out"], o, policy=policy)


def _downsample(p, x, policy):
    """Stride-2 conv with (0,1,0,1) right/bottom padding (ref :3514)."""
    return L.conv2d(p["conv"], x, stride=2, padding=[(0, 1), (0, 1)], policy=policy)


def _upsample(p, x, policy):
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return L.conv2d(p["conv"], x, policy=policy)


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def encoder_apply(params, x, cfg: VAEConfig = SD15_VAE, policy: L.Policy = L.FP32):
    """Pixels (B,H,W,3) in [-1,1] → moments (B,h,w,2*z)."""
    h = L.conv2d(params["conv_in"], x.astype(policy.compute_dtype), policy=policy)
    for level in range(len(cfg.ch_mult)):
        for b in range(cfg.num_res_blocks):
            h = _resnet(params["down"][level]["block"][b], h, policy)
        if level != len(cfg.ch_mult) - 1:
            h = _downsample(params["down"][level]["downsample"], h, policy)
    h = _resnet(params["mid"]["block_1"], h, policy)
    h = _attn_block(params["mid"]["attn_1"], h, policy)
    h = _resnet(params["mid"]["block_2"], h, policy)
    h = L.group_norm(params["norm_out"], h, eps=1e-6, policy=policy)
    h = L.conv2d(params["conv_out"], L.silu(h), policy=policy)
    return L.conv2d(params["quant_conv"], h, policy=policy)


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def decoder_apply(params, z, cfg: VAEConfig = SD15_VAE, policy: L.Policy = L.FP32):
    """Latent (B,h,w,z) (unscaled) → pixels (B,H,W,3) in [-1,1]."""
    h = L.conv2d(params["post_quant_conv"], z.astype(policy.compute_dtype), policy=policy)
    h = L.conv2d(params["conv_in"], h, policy=policy)
    h = _resnet(params["mid"]["block_1"], h, policy)
    h = _attn_block(params["mid"]["attn_1"], h, policy)
    h = _resnet(params["mid"]["block_2"], h, policy)
    for level in reversed(range(len(cfg.ch_mult))):
        for b in range(cfg.num_res_blocks + 1):
            h = _resnet(params["up"][level]["block"][b], h, policy)
        if level != 0:
            h = _upsample(params["up"][level]["upsample"], h, policy)
    h = L.group_norm(params["norm_out"], h, eps=1e-6, policy=policy)
    h = L.conv2d(params["conv_out"], L.silu(h), policy=policy)
    return h


def sample_diagonal_gaussian(moments, key):
    """moments (B,h,w,2z) → sample (ref DiagonalGaussianDistribution :166)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


class VAE:
    """User-facing wrapper (ref ``VAE`` :6282): pixel-range maps, latent
    scale factor, NHWC in/out, deterministic-key encode."""

    def __init__(self, params, cfg: VAEConfig = SD15_VAE, policy: L.Policy = L.FP32):
        self.params = params
        self.cfg = cfg
        self.policy = policy

    def decode(self, latent):
        """(B,h,w,4) scaled latent → (B,H,W,3) pixels in [0,1]."""
        z = jnp.asarray(latent) / self.cfg.scale_factor
        px = decoder_apply(self.params["decoder"], z, self.cfg, self.policy)
        return jnp.clip(px.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    def encode(self, pixels, key=None):
        """(B,H,W,3) pixels in [0,1] → (B,h,w,4) scaled latent sample."""
        x = jnp.asarray(pixels).astype(jnp.float32) * 2.0 - 1.0
        moments = encoder_apply(self.params["encoder"], x, self.cfg, self.policy)
        key = key if key is not None else jax.random.PRNGKey(0)
        z = sample_diagonal_gaussian(moments.astype(jnp.float32), key)
        return z * self.cfg.scale_factor

    def decode_safe(self, latent, tile: int = 64, overlap: int = 8):
        """decode with an automatic tiled fallback on device OOM — the
        recovery path the reference attempts but crashes on (its
        ``vae.decode_tiled`` at :9338 does not exist; SURVEY §5.3)."""
        try:
            return self.decode(latent)
        except Exception as e:  # jaxlib raises XlaRuntimeError on RESOURCE_EXHAUSTED
            if "RESOURCE_EXHAUSTED" not in str(e) and "memory" not in str(e).lower():
                raise
            import logging

            logging.getLogger(__name__).warning(
                "VAE decode OOM; falling back to tiled decode (%s)", e
            )
            return self.decode_tiled(latent, tile=tile, overlap=overlap)

    def decode_tiled(self, latent, tile: int = 64, overlap: int = 8):
        """Tiled decode for latents too large for one program — the OOM
        fallback the reference CALLS but never defines (``vae.decode_tiled``
        at LightDiffusion.py:9338 is an AttributeError in the reference;
        SURVEY §5.3). Feather-blended latent tiles via postprocess.tiling."""
        import numpy as np

        from ..postprocess.tiling import tiled_apply

        out = tiled_apply(
            lambda t: self.decode(t), np.asarray(latent, np.float32),
            scale=self.cfg.downscale_ratio, tile=tile, overlap=overlap,
            tile_batch=1, out_channels=self.cfg.out_channels,
        )
        return jnp.asarray(out)

    def encode_tiled(self, pixels, tile: int = 512, overlap: int = 64, key=None):
        """Tiled encode (large img2img inputs): pixel tiles → latent tiles at
        1/r scale, feather-blended in latent space."""
        import numpy as np

        from ..postprocess.tiling import tiled_apply

        key = key if key is not None else jax.random.PRNGKey(0)
        r = self.cfg.downscale_ratio
        out = tiled_apply(
            lambda t: self.encode(t, key=key),
            np.asarray(pixels, np.float32), scale=1.0 / r, tile=tile,
            overlap=overlap, tile_batch=1, out_channels=self.cfg.z_channels,
        )
        return jnp.asarray(out)


# ------------------------------------------------------------------ init ----
def _init_resnet(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": L.init_norm(cin, dtype),
        "conv1": L.init_conv2d(ks[0], 3, 3, cin, cout, dtype=dtype),
        "norm2": L.init_norm(cout, dtype),
        "conv2": L.init_conv2d(ks[1], 3, 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p["nin"] = L.init_conv2d(ks[2], 1, 1, cin, cout, dtype=dtype)
    return p


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": L.init_norm(c, dtype),
        "q": L.init_conv2d(ks[0], 1, 1, c, c, dtype=dtype),
        "k": L.init_conv2d(ks[1], 1, 1, c, c, dtype=dtype),
        "v": L.init_conv2d(ks[2], 1, 1, c, c, dtype=dtype),
        "proj_out": L.init_conv2d(ks[3], 1, 1, c, c, dtype=dtype),
    }


def init_vae_params(key, cfg: VAEConfig = SD15_VAE, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    ch = cfg.ch

    # encoder
    down = []
    cin = ch
    for level, mult in enumerate(cfg.ch_mult):
        cout = ch * mult
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_init_resnet(next(keys), cin, cout, dtype))
            cin = cout
        lvl = {"block": tuple(blocks)}
        if level != len(cfg.ch_mult) - 1:
            lvl["downsample"] = {"conv": L.init_conv2d(next(keys), 3, 3, cin, cin, dtype=dtype)}
        down.append(lvl)
    mid_ch = cin
    encoder = {
        "conv_in": L.init_conv2d(next(keys), 3, 3, cfg.in_channels, ch, dtype=dtype),
        "down": tuple(down),
        "mid": {
            "block_1": _init_resnet(next(keys), mid_ch, mid_ch, dtype),
            "attn_1": _init_attn(next(keys), mid_ch, dtype),
            "block_2": _init_resnet(next(keys), mid_ch, mid_ch, dtype),
        },
        "norm_out": L.init_norm(mid_ch, dtype),
        "conv_out": L.init_conv2d(next(keys), 3, 3, mid_ch, 2 * cfg.z_channels, dtype=dtype),
        "quant_conv": L.init_conv2d(next(keys), 1, 1, 2 * cfg.z_channels, 2 * cfg.z_channels, dtype=dtype),
    }

    # decoder
    up = [None] * len(cfg.ch_mult)
    cin = mid_ch
    for level in reversed(range(len(cfg.ch_mult))):
        cout = ch * cfg.ch_mult[level]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_init_resnet(next(keys), cin, cout, dtype))
            cin = cout
        lvl = {"block": tuple(blocks)}
        if level != 0:
            lvl["upsample"] = {"conv": L.init_conv2d(next(keys), 3, 3, cin, cin, dtype=dtype)}
        up[level] = lvl
    decoder = {
        "post_quant_conv": L.init_conv2d(next(keys), 1, 1, cfg.z_channels, cfg.z_channels, dtype=dtype),
        "conv_in": L.init_conv2d(next(keys), 3, 3, cfg.z_channels, mid_ch, dtype=dtype),
        "mid": {
            "block_1": _init_resnet(next(keys), mid_ch, mid_ch, dtype),
            "attn_1": _init_attn(next(keys), mid_ch, dtype),
            "block_2": _init_resnet(next(keys), mid_ch, mid_ch, dtype),
        },
        "up": tuple(up),
        "norm_out": L.init_norm(ch, dtype),
        "conv_out": L.init_conv2d(next(keys), 3, 3, ch, cfg.out_channels, dtype=dtype),
    }
    return {"encoder": encoder, "decoder": decoder}
